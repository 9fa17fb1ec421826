"""SD UNet2DConditionModel in flax (NHWC, bf16-compute, remat-able blocks).

Architectural parity: diffusers ``UNet2DConditionModel`` as configured by
SD-1.4/1.5 (loaded by the reference at ``data_generation/finetune_sd.py:518-520``):
4 down blocks (CrossAttn x3 + plain), mid with one transformer, 4 up blocks
(plain + CrossAttn x3), block channels (320, 640, 1280, 1280), 2 layers per
block, 8 attention heads, cross_attention_dim 768.

TPU-first differences from the torch original:
- NHWC activations / HWIO conv kernels (MXU-native layout).
- The big latent self-attentions run through the Pallas flash kernel.
- DAAM heatmaps are a *fused side output*: ``collect_attn=True`` makes every
  cross-attention layer emit its head-mean probability map, returned as a
  list of (B, tokens, h, w) arrays — replacing the reference's Python
  attention hooks (``data_generation/hook.py``) with zero extra passes.
- ``gradient_checkpointing`` wraps each down/mid/up block in ``jax.checkpoint``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from agenda_tpu.models.layers import (
    Downsample2D,
    GroupNormAct,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Mirrors the diffusers unet/config.json fields we honor."""

    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    attention_head_dim: int = 8  # SD-1.x: number of heads (diffusers naming quirk)
    cross_attention_dim: int = 768
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True

    @classmethod
    def tiny(cls) -> "UNetConfig":
        """A minute config for tests (same topology, ~100k params)."""
        return cls(
            sample_size=8,
            block_out_channels=(32, 64),
            layers_per_block=1,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            attention_head_dim=2,
            cross_attention_dim=32,
        )


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    context_dim: int
    add_downsample: bool
    collect_probs: bool = False
    collect_cross: bool = False
    dtype: jnp.dtype = jnp.float32
    flash_min_dim: int = 65

    @nn.compact
    def __call__(self, x, temb, context, cached_cross=None):
        collect_probs = self.collect_probs
        outputs, maps, cross = [], [], []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            x, m, co = Transformer2D(
                self.out_channels,
                self.heads,
                self.context_dim,
                collect_probs=collect_probs,
                collect_cross=self.collect_cross,
                dtype=self.dtype,
                flash_min_dim=self.flash_min_dim,
                name=f"attentions_{i}",
            )(x, context, None if cached_cross is None else [cached_cross[i]])
            if m is not None:
                maps.append(m)
            if co is not None:
                cross += co
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            outputs.append(x)
        return x, outputs, maps, cross


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        outputs = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            outputs.append(x)
        return x, outputs


class MidBlock(nn.Module):
    channels: int
    heads: int
    context_dim: int
    collect_probs: bool = False
    collect_cross: bool = False
    dtype: jnp.dtype = jnp.float32
    flash_min_dim: int = 65

    @nn.compact
    def __call__(self, x, temb, context, cached_cross=None):
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_0")(x, temb)
        x, m, co = Transformer2D(
            self.channels, self.heads, self.context_dim, collect_probs=self.collect_probs,
            collect_cross=self.collect_cross,
            dtype=self.dtype, flash_min_dim=self.flash_min_dim, name="attentions_0"
        )(x, context, None if cached_cross is None else [cached_cross[0]])
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_1")(x, temb)
        return x, ([m] if m is not None else []), (co if co is not None else [])


class CrossAttnUpBlock(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    context_dim: int
    add_upsample: bool
    collect_probs: bool = False
    collect_cross: bool = False
    dtype: jnp.dtype = jnp.float32
    flash_min_dim: int = 65

    @nn.compact
    def __call__(self, x, res_samples, temb, context, cached_cross=None):
        collect_probs = self.collect_probs
        maps, cross = [], []
        for i in range(self.num_layers):
            x = jnp.concatenate([x, res_samples[-(i + 1)]], axis=-1)
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            x, m, co = Transformer2D(
                self.out_channels,
                self.heads,
                self.context_dim,
                collect_probs=collect_probs,
                collect_cross=self.collect_cross,
                dtype=self.dtype,
                flash_min_dim=self.flash_min_dim,
                name=f"attentions_{i}",
            )(x, context, None if cached_cross is None else [cached_cross[i]])
            if m is not None:
                maps.append(m)
            if co is not None:
                cross += co
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x, maps, cross


class UpBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, res_samples[-(i + 1)]], axis=-1)
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class UNet2DConditionModel(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    gradient_checkpointing: bool = False
    # Pallas flash dispatch cutoff for the latent self-attentions: 65 keeps
    # the measured forward-only policy (generation); the train step sets 40
    # so the D=40 layers use the memory-efficient flash BACKWARD instead of
    # XLA materializing f32 (B,H,4096,4096) probability tensors.
    flash_min_dim: int = 65

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, H, W, C) latents, NHWC
        timesteps: jax.Array,  # (B,) or scalar
        encoder_hidden_states: jax.Array,  # (B, 77, cross_attention_dim)
        collect_attn: bool = False,
        collect_cross: bool = False,
        cached_cross: Optional[List[jax.Array]] = None,
    ):
        """Returns (eps_pred (B,H,W,C), cross_attn_maps list[(B,tokens,h,w)] | None).

        TGATE (opt-in, arXiv:2404.02747): ``collect_cross=True`` additionally
        returns the per-layer cross-attention output contributions (flat list,
        traversal order) as a third element; ``cached_cross=<that list>``
        replays them instead of computing cross-attention (the sampler's
        post-gate phase). Mutually exclusive.
        """
        cfg = self.config
        assert not (collect_cross and cached_cross is not None)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        temb = timestep_embedding(
            timesteps,
            cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(temb)

        sample = sample.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            sample
        )

        heads = cfg.attention_head_dim
        maps: List[jax.Array] = []
        cross_outs: List[jax.Array] = []
        # Per-block slices of the flat cached_cross list (traversal order:
        # down blocks, mid, up blocks — same order collect_cross emits).
        cache_pos = 0

        def take_cache(n: int):
            nonlocal cache_pos
            if cached_cross is None:
                return None
            sl = cached_cross[cache_pos:cache_pos + n]
            cache_pos += n
            return sl

        res_stack: List[jax.Array] = [x]

        remat = nn.remat if self.gradient_checkpointing else (lambda m: m)

        # Down
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_last = i == len(cfg.down_block_types) - 1
            if block_type == "CrossAttnDownBlock2D":
                block = remat(CrossAttnDownBlock)(
                    out_ch,
                    cfg.layers_per_block,
                    heads,
                    cfg.cross_attention_dim,
                    add_downsample=not is_last,
                    collect_probs=collect_attn,
                    collect_cross=collect_cross,
                    dtype=self.dtype,
                    flash_min_dim=self.flash_min_dim,
                    name=f"down_blocks_{i}",
                )
                x, outs, ms, cs = block(x, temb, encoder_hidden_states,
                                        take_cache(cfg.layers_per_block))
                maps += ms
                cross_outs += cs
            elif block_type == "DownBlock2D":
                x, outs = remat(DownBlock)(
                    out_ch,
                    cfg.layers_per_block,
                    add_downsample=not is_last,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, temb)
            else:
                raise ValueError(f"Unknown down block {block_type}")
            res_stack += outs

        # Mid
        x, ms, cs = remat(MidBlock)(
            cfg.block_out_channels[-1],
            heads,
            cfg.cross_attention_dim,
            collect_probs=collect_attn,
            collect_cross=collect_cross,
            dtype=self.dtype,
            flash_min_dim=self.flash_min_dim,
            name="mid_block",
        )(x, temb, encoder_hidden_states, take_cache(1))
        maps += ms
        cross_outs += cs

        # Up
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            is_last = i == len(cfg.up_block_types) - 1
            n_res = cfg.layers_per_block + 1
            res_samples = res_stack[-n_res:]
            res_stack = res_stack[:-n_res]
            if block_type == "CrossAttnUpBlock2D":
                x, ms, cs = remat(CrossAttnUpBlock)(
                    out_ch,
                    n_res,
                    heads,
                    cfg.cross_attention_dim,
                    add_upsample=not is_last,
                    collect_probs=collect_attn,
                    collect_cross=collect_cross,
                    dtype=self.dtype,
                    flash_min_dim=self.flash_min_dim,
                    name=f"up_blocks_{i}",
                )(x, res_samples, temb, encoder_hidden_states, take_cache(n_res))
                maps += ms
                cross_outs += cs
            elif block_type == "UpBlock2D":
                x = remat(UpBlock)(
                    out_ch,
                    n_res,
                    add_upsample=not is_last,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, res_samples, temb)
            else:
                raise ValueError(f"Unknown up block {block_type}")

        x = GroupNormAct(num_groups=min(32, x.shape[-1]), epsilon=1e-5, act="silu",
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        eps = x.astype(jnp.float32)
        if collect_cross:
            return eps, (maps if collect_attn else None), cross_outs
        return eps, (maps if collect_attn else None)
