"""Latent-moment caching: hoist the frozen VAE encoder out of the train step.

The reference re-runs ``vae.encode(img).latent_dist.sample()`` inside every
training step (``data_generation/finetune_sd.py:764-765``). Its data
transform is deterministic — resize + [-1,1] normalize, no augmentation
(``data_generation/dataset.py:33-56``) — so the per-image latent
*distribution* (mean, logvar) never changes across epochs; only the
reparameterized SAMPLE must stay fresh per visit. Precomputing the moments
once and sampling in the step is therefore EXACT (bit-identical when the
moments are stored f32: the step draws the same eps from the same key and
computes the same ``mean + std * eps``), while removing the entire 512px
frozen-encoder forward from the hot loop.

Measured motivation (scripts/bench_train.py xprof, v5e, bs 4, 512px): the
VAE encoder's H-major conv machinery (halo copies / GroupNorm stat
broadcasts over f32[512,·,·,128]-family tensors) accounts for ~50-70 ms of
the 297 ms device-busy step — none of it trains anything.

The cache lives in HOST RAM (N x h x w x 2C f32 = 131 KB per 512px image)
and ships ~0.5 MB/step for a batch of 4 — cheaper than the uint8 pixel
tiles it replaces.
"""

from __future__ import annotations

import time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agenda_tpu.models import AutoencoderKL


def make_encode_moments_fn(vae: AutoencoderKL, resize_weights: Optional[Tuple[Any, Any]] = None):
    """Jitted (vae_params, pixels_or_u8) -> (B, h, w, 2C) f32 moments.

    Accepts either f32 pixels in [-1, 1] or uint8 source tiles (resized on
    device with the same PIL-exact filter matmuls as the train step, so the
    cached moments match the pixel path bit-for-bit).
    """

    def encode(vae_params, batch_pixels):
        if batch_pixels.dtype == jnp.uint8:
            from agenda_tpu.data.device_resize import apply_resize

            batch_pixels = apply_resize(batch_pixels, *resize_weights)
        mean, logvar = vae.apply(vae_params, batch_pixels, method="encode")
        return jnp.concatenate([mean, logvar], axis=-1)

    return jax.jit(encode)


def precompute_latent_moments(
    vae: AutoencoderKL,
    vae_params: Any,
    dataset,
    batch_size: int = 8,
    resize_weights: Optional[Tuple[Any, Any]] = None,
    log_fn=None,
) -> np.ndarray:
    """Encode every dataset image once -> host (N, h, w, 2C) f32 array.

    Iterates in index order (the cache is indexed by dataset position), pads
    the trailing batch to keep one compiled program, and pulls results to
    host RAM.
    """
    encode = make_encode_moments_fn(vae, resize_weights)
    n = len(dataset)
    out: Optional[np.ndarray] = None
    t0 = time.time()
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        rows = [dataset[i] for i in idx]
        key = "pixel_u8" if "pixel_u8" in rows[0] else "pixel_values"
        batch = np.stack([r[key] for r in rows])
        if len(idx) < batch_size:  # pad to the compiled batch shape
            pad = np.repeat(batch[-1:], batch_size - len(idx), axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        moments = np.asarray(jax.device_get(encode(vae_params, jnp.asarray(batch))))
        if out is None:
            out = np.empty((n, *moments.shape[1:]), np.float32)
        out[idx] = moments[: len(idx)]
    if log_fn:
        log_fn(
            f"cached latent moments for {n} images in {time.time() - t0:.1f}s "
            f"({out.nbytes / 1e6:.0f} MB host RAM)"
        )
    return out


class LatentMomentsDataset:
    """Dataset adapter: replaces the pixel entry with cached latent moments.

    Keeps every other key (input_ids, token indices, ...) from the wrapped
    dataset so the Token variants work unchanged.
    """

    def __init__(self, dataset, moments: np.ndarray):
        assert len(dataset) == len(moments), (len(dataset), len(moments))
        self.dataset = dataset
        self.moments = moments

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int):
        row = dict(self.dataset[index])
        row.pop("pixel_u8", None)
        row.pop("pixel_values", None)
        row["latent_moments"] = self.moments[index]
        return row
