"""Shared backend detection for the Pallas kernel dispatchers."""

from __future__ import annotations

import functools

import jax


@functools.cache
def on_tpu() -> bool:
    """True when the default backend is a TPU (incl. the tunneled 'axon'
    platform, whose devices are real TPU chips). GPU/CPU backends must take
    the XLA fallbacks — the kernels use TPU-only Mosaic params."""
    if jax.default_backend() in ("tpu", "axon"):
        return True
    try:
        d = jax.devices()[0]
        return "tpu" in (getattr(d, "device_kind", "") or "").lower()
    except Exception:
        return False
