"""Device-side image resize for the SD training data path.

The reference resizes every training tile on the host (PIL inside the torch
Dataset, ``data_generation/dataset.py:33-56``); at the reference recipe the
112px aerial tiles are upscaled to 512² — 8.5 ms/image of host time and a
3 MB float32 host->device transfer per image. On TPU the right split is the
reverse: ship the 37 KB uint8 source tile and run the resize ON DEVICE as two
separable filter matmuls (MXU work), with PIL-compatible filter weights so
numerics match the host path:

    out = W_h @ img @ W_w^T        (per channel, batched)

``resize_weights`` reproduces PIL's filter construction exactly (support
window, half-pixel centers, per-position normalization — the float path of
``ImagingResampleHorizontal``); PIL additionally rounds the intermediate
horizontal pass to uint8, so outputs agree to ~1 LSB rather than bitwise.
"""

from __future__ import annotations

import numpy as np


def _triangle(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


def _lanczos3(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    out = np.sinc(x) * np.sinc(x / 3.0)
    return np.where(ax < 3.0, out, 0.0)


_FILTERS = {
    "bilinear": (_triangle, 1.0),
    "lanczos": (_lanczos3, 3.0),
}


def resize_weights(src: int, dst: int, filt: str = "lanczos") -> np.ndarray:
    """(dst, src) float32 row-stochastic filter matrix, PIL semantics."""
    kernel, support0 = _FILTERS[filt]
    scale = src / dst
    filterscale = max(scale, 1.0)
    support = support0 * filterscale
    w = np.zeros((dst, src), np.float64)
    for i in range(dst):
        center = (i + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(src, int(center + support + 0.5))
        xs = np.arange(xmin, xmax)
        ww = kernel((xs - center + 0.5) / filterscale)
        s = ww.sum()
        if s != 0:
            w[i, xmin:xmax] = ww / s
    return w.astype(np.float32)


def apply_resize(pixels_u8, wy: np.ndarray, wx: np.ndarray):
    """(B, h, w, 3) uint8 -> (B, H, W, 3) float32 in [-1, 1] on device.

    Two einsum contractions (MXU) + the [-1,1] normalization the host path
    applied (``data/datasets.py:load_image``). Each pass rounds and clamps to
    uint8 range like PIL's 8-bit resample path does — without the clamp a
    lanczos negative lobe overshoots and diverges from the host tensor near
    hard edges.
    """
    import jax.numpy as jnp

    x = pixels_u8.astype(jnp.float32)
    # PIL order: horizontal (width) pass first, then vertical
    x = jnp.einsum("Ww,bhwc->bhWc", jnp.asarray(wx), x)
    x = jnp.round(jnp.clip(x, 0.0, 255.0))
    x = jnp.einsum("Hh,bhwc->bHwc", jnp.asarray(wy), x)
    x = jnp.round(jnp.clip(x, 0.0, 255.0))
    return x / 255.0 * 2.0 - 1.0
