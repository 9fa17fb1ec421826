"""AutoencoderKL (SD VAE) in flax, NHWC.

Parity target: diffusers ``AutoencoderKL`` as loaded by the reference
(``data_generation/finetune_sd.py:514-516``) — encoder/decoder with
block_out_channels (128, 256, 512, 512), 2 layers per encoder block,
3 per decoder block, mid blocks with single-head spatial attention,
latent_channels=4, scaling_factor 0.18215.

Training only calls ``encode`` + latent sampling (``finetune_sd.py:764-765``);
generation calls ``decode``. Both are pure functions of params and jit-able.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from agenda_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    Upsample2D,
    VAEAttention,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(16, 32), layers_per_block=1)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            is_last = i == len(cfg.block_out_channels) - 1
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    ch, use_time_emb=False, eps=1e-6, dtype=self.dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(x)
            if not is_last:
                x = Downsample2D(
                    ch, asymmetric_pad=True, dtype=self.dtype,
                    name=f"down_blocks_{i}_downsamplers_0",
                )(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6, dtype=self.dtype, name="mid_block_resnets_0")(x)
        x = VAEAttention(ch, dtype=self.dtype, name="mid_block_attentions_0")(x)
        x = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6, dtype=self.dtype, name="mid_block_resnets_1")(x)
        x = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6, dtype=self.dtype, name="mid_block_resnets_0")(x)
        x = VAEAttention(ch, dtype=self.dtype, name="mid_block_attentions_0")(x)
        x = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6, dtype=self.dtype, name="mid_block_resnets_1")(x)
        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            is_last = i == len(rev) - 1
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(
                    ch, use_time_emb=False, eps=1e-6, dtype=self.dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(x)
            if not is_last:
                x = Upsample2D(ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0")(x)
        x = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Image (B,H,W,3) in [-1,1] -> (mean, logvar) of the latent distribution."""
        h = self.encoder(x.astype(self.dtype))
        moments = self.quant_conv(h)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean.astype(jnp.float32), logvar.astype(jnp.float32)

    def decode(self, z: jax.Array) -> jax.Array:
        z = self.post_quant_conv(z.astype(self.dtype))
        return self.decoder(z).astype(jnp.float32)

    def __call__(self, x: jax.Array, rng: jax.Array):
        mean, logvar = self.encode(x)
        z = sample_latents(mean, logvar, rng)
        return self.decode(z), mean, logvar


def sample_latents(mean: jax.Array, logvar: jax.Array, rng: jax.Array) -> jax.Array:
    """Reparameterized sample from the diagonal gaussian (latent_dist.sample())."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
