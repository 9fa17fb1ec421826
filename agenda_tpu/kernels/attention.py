"""Attention for the SD UNet / CLIP / VAE on TPU.

Two paths:

- ``attention_reference``: plain XLA einsum attention. Used for small
  sequences (text len 77, VAE mid block) and as the correctness oracle.
- ``flash_attention`` (agenda_tpu.kernels.flash): blockwise Pallas kernel for
  the UNet's big self-attention (latent seq 4096/1024 at 512 resolution),
  never materializing the S x S probability matrix in HBM.

DAAM side output: the reference intercepts every cross-attention call with a
Python ``AttnProcessor`` hook that re-runs softmax(QK^T) and stores the
per-token probability maps (``data_generation/hook.py:83-122``). Here
``cross_attention_with_probs`` computes the attention output *and* the
head-averaged probability maps in one fused XLA computation: with only
<=77 key tokens, the (B, S, 77) head-mean probs tensor is tiny, so the
heatmaps come for free alongside the regular output — no hooks, no second
pass, jit/scan-friendly.

Shapes follow the TPU-friendly convention q/k/v: (B, S, H, D) with NHWC-style
trailing feature dims; outputs match q.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain attention. q: (B, Sq, H, D), k/v: (B, Sk, H, D) -> (B, Sq, H, D).

    Softmax accumulates in f32 regardless of input dtype (matches the
    reference's ``attn.get_attention_scores`` upcast behavior).

    AGENDA_TPU_ATTN_LAYOUT=bhsd switches to an explicitly head-major
    formulation (swapaxes around per-head einsums) — a measurement knob for
    the D=40 layout-copy investigation (round-5 profile: the S=4096 layers'
    bracketing transpose fusions cost 7.3 ms/layer/step, 28% of the
    generation step).
    """
    import os

    dtype = q.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    if os.environ.get("AGENDA_TPU_ATTN_LAYOUT") == "bhsd":
        qh = jnp.swapaxes(q, 1, 2)   # (B, H, Sq, D)
        kh = jnp.swapaxes(k, 1, 2)
        vh = jnp.swapaxes(v, 1, 2)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), vh)
        return jnp.swapaxes(out, 1, 2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v)
    return out


def cross_attention_with_probs(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Cross-attention emitting head-averaged probability maps as a side output.

    Returns (out (B, Sq, H, D), probs_mean (B, Sq, Sk) f32).

    probs_mean replicates ``hook.py:28-56`` ``_unravel_attn`` semantics: the
    post-softmax probabilities averaged over heads (the caller reshapes Sq back
    to (h, w) and indexes the text-token axis).
    """
    dtype = q.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v)
    return out, jnp.mean(probs, axis=1)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    use_flash: Optional[bool] = None,
    flash_min_dim: int = 65,
) -> jax.Array:
    """Dispatch: Pallas flash kernel for long self-attention, XLA otherwise.

    ``use_flash=None`` auto-selects: flash when Sq == Sk >= 1024, head_dim >=
    ``flash_min_dim``, no mask, and we're on a TPU backend. The default
    cutoff (flash only above D=64) is measured for the FORWARD-only
    (generation) path: the kernel zero-pads head_dim to the 128 lane width,
    so at SD-1.x's level-0 shape (S=4096, D=40) it burns 3.2x the useful
    FLOPs and loses to XLA's fused attention (14.3 vs 10.3 ms/iter on v5e at
    B*H=128), while at D=80 (S=1024) flash wins (4.1 vs 5.1 ms/iter).

    TRAINING is different: XLA's attention backward materializes the
    f32 (B, H, S, S) probability matrix in HBM (2.1 GB per D=40 layer at
    bs 4), so the train step passes ``flash_min_dim=40`` and takes the
    Pallas fwd+bwd kernels everywhere (see train/finetune_sd.py). The flash
    kernel replaces the reference's xformers memory-efficient attention
    (``finetune_sd.py:539-550``).
    """
    if use_flash is None:
        use_flash = (
            mask is None
            and q.shape[1] == k.shape[1]
            and q.shape[1] >= 1024
            and q.shape[-1] >= flash_min_dim
            and _on_tpu()
        )
    if use_flash:
        from agenda_tpu.kernels.flash import flash_attention

        return flash_attention(q, k, v)
    return attention_reference(q, k, v, mask)


from agenda_tpu.kernels._backend import on_tpu as _on_tpu
