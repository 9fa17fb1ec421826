"""Shared flax building blocks for the SD UNet / VAE (NHWC, TPU-first).

Structural parity targets the diffusers SD-1.x modules the reference loads
(``data_generation/finetune_sd.py:485-520``): ResnetBlock2D, Transformer2D
with a single BasicTransformerBlock (self-attn, cross-attn, GEGLU FF),
Down/Upsample2D, and sinusoidal timestep embeddings. Everything runs in
``dtype`` (bf16 by default on TPU) with f32 params; convs are NHWC/HWIO so
XLA tiles them straight onto the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from agenda_tpu.kernels.attention import (
    attention,
    attention_reference,
    cross_attention_with_probs,
)
from agenda_tpu.kernels.groupnorm import group_norm_act_auto


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jax.Array:
    """Sinusoidal embeddings, diffusers ``get_timestep_embedding`` semantics.

    SD-1.x config: flip_sin_to_cos=True, downscale_freq_shift=0 -> [cos, sin].
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


def _groups(channels: int) -> int:
    """GroupNorm groups: 32 as in SD configs, reduced for tiny test models."""
    return min(32, channels)


class GroupNormAct(nn.GroupNorm):
    """nn.GroupNorm plus an optional activation, with a Pallas fast path.

    Subclasses ``nn.GroupNorm`` so the default path IS flax's (identical
    params tree and numerics, and the fastest of the three formulations
    measured in-model on v5e: flax 121.8 ms/step UNet fwd, explicit-f32
    reference math 127.3, fused Pallas kernel 129.8 — the custom-call
    boundaries cost more in lost XLA producer/consumer fusion than the
    kernel saves; see kernels/groupnorm.py). The kernel stays available
    behind AGENDA_TPU_FUSED_GN=1.
    """

    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from agenda_tpu.kernels.groupnorm import kernel_wanted

        if kernel_wanted(x.reshape(x.shape[0], -1, x.shape[-1]), self.num_groups):
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
            return group_norm_act_auto(
                x.astype(self.dtype), scale, bias, self.num_groups, self.epsilon,
                self.act,
            )
        y = super().__call__(x)
        if self.act == "silu":
            y = nn.silu(y)
        return y


class TimestepEmbedding(nn.Module):
    """Two-layer MLP lifting the sinusoidal embedding to the time channel dim."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class Attention(nn.Module):
    """Multi-head attention (self or cross) with optional DAAM probs output.

    Matches diffusers ``Attention``: no-bias q/k/v projections, biased output
    projection. ``collect_probs=True`` (cross-attention only) additionally
    returns the head-averaged post-softmax probabilities (B, Sq, Sk) — the
    fused replacement for the reference's hook recompute
    (``data_generation/hook.py:83-122``).
    """

    query_dim: int
    heads: int = 8
    dim_head: Optional[int] = None  # default query_dim // heads
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    # min head_dim for Pallas flash dispatch; 65 = forward-only measured
    # cutoff, training passes 40 (see kernels/attention.py docstring)
    flash_min_dim: int = 65

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        collect_probs: bool = False,
        use_flash: Optional[bool] = None,
    ):
        dim_head = self.dim_head or self.query_dim // self.heads
        inner = dim_head * self.heads
        ctx = x if context is None else context

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, dim_head)
        k = k.reshape(b, sk, self.heads, dim_head)
        v = v.reshape(b, sk, self.heads, dim_head)

        probs = None
        if collect_probs:
            out, probs = cross_attention_with_probs(q, k, v)
        elif mask is not None:
            out = attention_reference(q, k, v, mask)
        else:
            out = attention(q, k, v, use_flash=use_flash,
                            flash_min_dim=self.flash_min_dim)

        out = out.reshape(b, sq, inner)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)
        if collect_probs:
            return out, probs
        return out


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)
        return x


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU FF, all residual.

    TGATE support (opt-in fast generation, arXiv:2404.02747): the
    cross-attention *output* (post-projection residual contribution)
    converges across denoising steps, so the sampler can capture it once at
    a gate step (``collect_cross=True``) and replay it for the remaining
    steps (``cached_cross=...``), which skips the cross-attention entirely
    AND lets CFG collapse to a single batch half (the two halves differ
    only through cross-attention). Never used on the parity path.
    """

    dim: int
    heads: int
    context_dim: int
    collect_probs: bool = False
    collect_cross: bool = False
    dtype: jnp.dtype = jnp.float32
    flash_min_dim: int = 65

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 cached_cross: Optional[jax.Array] = None):
        collect_probs = self.collect_probs
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.heads, dtype=self.dtype,
                          flash_min_dim=self.flash_min_dim, name="attn1")(h)

        probs = None
        if cached_cross is not None:
            # TGATE replay: skip norm2 + cross-attention, add the cached
            # contribution. (norm2 feeds only attn2, so it is skipped too.)
            out = cached_cross.astype(x.dtype)
        else:
            h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
            attn2 = Attention(
                self.dim, self.heads, context_dim=self.context_dim, dtype=self.dtype, name="attn2"
            )
            if collect_probs:
                out, probs = attn2(h, context=context, collect_probs=True)
            else:
                out = attn2(h, context=context)
        x = x + out

        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x, probs, (out if self.collect_cross else None)


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> 1x1 conv in -> transformer block(s) -> 1x1 conv out + residual.

    SD-1.x uses use_linear_projection=False (1x1 convs) and one block.
    """

    channels: int
    heads: int
    context_dim: int
    depth: int = 1
    collect_probs: bool = False
    collect_cross: bool = False
    dtype: jnp.dtype = jnp.float32
    flash_min_dim: int = 65

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 cached_cross: Optional[List[jax.Array]] = None):
        collect_probs = self.collect_probs
        b, h, w, c = x.shape
        residual = x
        x = GroupNormAct(num_groups=_groups(c), epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, self.channels)
        probs = None
        cross_outs: List[jax.Array] = []
        for i in range(self.depth):
            x, probs, co = BasicTransformerBlock(
                self.channels,
                self.heads,
                self.context_dim,
                collect_probs=collect_probs,
                collect_cross=self.collect_cross,
                dtype=self.dtype,
                flash_min_dim=self.flash_min_dim,
                name=f"transformer_blocks_{i}",
            )(x, context, None if cached_cross is None else cached_cross[i])
            if co is not None:
                cross_outs.append(co)
        x = x.reshape(b, h, w, self.channels)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(x)
        x = x + residual
        maps = None
        if collect_probs:
            # (B, HW, tokens) -> (B, tokens, h, w): hook.py:28-56 layout.
            maps = jnp.transpose(probs, (0, 2, 1)).reshape(b, -1, h, w)
        return x, maps, (cross_outs if self.collect_cross else None)


class ResnetBlock2D(nn.Module):
    """GN -> silu -> conv -> (+time) -> GN -> silu -> conv, with 1x1 shortcut."""

    out_channels: int
    use_time_emb: bool = True
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        in_channels = x.shape[-1]
        h = GroupNormAct(num_groups=_groups(in_channels), epsilon=self.eps, act="silu",
                         dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNormAct(num_groups=_groups(self.out_channels), epsilon=self.eps, act="silu",
                         dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    asymmetric_pad: bool = False  # VAE encoder uses pad=((0,1),(0,1))

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = 1
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=pad, dtype=self.dtype, name="conv"
        )(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class VAEAttention(nn.Module):
    """Single-head spatial self-attention used in VAE mid blocks (GN + linear qkv)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=_groups(c), epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        # S = h*w reaches 4096 at 512^2 (latent 64x64): dispatch to the Pallas
        # flash kernel on TPU (D = C = 512 is lane-aligned, no pad cost) so
        # the (B, S, S) probability matrix (537 MB f32 at batch 8) is never
        # materialized. Measured in-model on v5e (512^2 generation, batch 8):
        # 2.85 s/batch flash vs 2.86 XLA — perf-neutral, so the memory win
        # decides. AGENDA_TPU_VAE_FLASH=0 forces plain XLA attention.
        import os as _os
        _no_flash = _os.environ.get("AGENDA_TPU_VAE_FLASH") == "0"
        out = attention(
            q.reshape(b, h * w, 1, c), k.reshape(b, h * w, 1, c), v.reshape(b, h * w, 1, c),
            use_flash=(False if _no_flash else None),
        ).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + residual
