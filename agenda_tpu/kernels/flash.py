"""Blockwise flash attention as a Pallas TPU kernel.

Replaces the reference's xformers CUDA memory-efficient attention
(``data_generation/finetune_sd.py:539-550``) for the UNet's latent
self-attention (seq 4096/1024 at 512 x 512). Non-causal, no mask — exactly the
shape of SD UNet self-attention.

Design (v5e):
- grid = (batch*heads, Sq/block_q); full K/V for one head stay resident in
  VMEM across query blocks (<= 4 MB bf16 at S=4096, D<=256), so each K/V
  element is read from HBM once per head.
- online softmax with f32 running max/sum; P cast to the value dtype for the
  MXU; output accumulated in f32.
- head_dim is zero-padded to a lane multiple (128) outside the kernel; zero
  columns contribute nothing to QK^T and are sliced off the output.

Backward: custom_vjp with an XLA einsum backward (recompute). The S x S
probability matrix is only materialized during training backprop, matching
the memory profile the reference accepts from xformers' bwd; a Pallas bwd
kernel can swap in later without changing the API.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (block_q, Dp)
    block_q, dp = q.shape
    s = k_ref.shape[1]
    n_kb = s // block_k

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        logits = (
            jax.lax.dot_general(
                q,
                kb.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (block_q, block_k)
        new_m = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - new_m)
        p = jnp.exp(logits - new_m)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        pv = jax.lax.dot_general(
            p.astype(vb.dtype),
            vb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return new_m, l, acc

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, dp), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_fwd_impl(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """q/k/v: (B, S, H, D) -> (B, S, H, D). Requires Sq == Sk (self-attention)."""
    b, s, h, d = q.shape
    assert k.shape == v.shape == (b, s, h, d), (q.shape, k.shape, v.shape)
    scale = 1.0 / (d**0.5)

    dp = _round_up(d, 128)
    block_q = min(512, s)
    block_k = min(512, s)
    sp = _round_up(s, max(block_q, block_k))

    def to_g(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, dp - d)))

    qg, kg, vg = to_g(q), to_g(k), to_g(v)
    if sp != s:
        # Padded keys must not receive probability mass: push their logits to
        # -inf by making padded K rows huge-negative? Simpler: mask via V=0 is
        # wrong for softmax; instead bias via an additive trick is complex.
        # UNet sequences (4096/1024) are already block-aligned; guard anyway.
        raise NotImplementedError(
            f"flash_attention requires seq % {max(block_q, block_k)} == 0, got {s}"
        )

    g = b * h
    grid = (g, sp // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, sp, dp), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, sp, dp), lambda gi, qi: (gi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda gi, qi: (gi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((g, sp, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * sp * sp * dp,
            bytes_accessed=3 * g * sp * dp * q.dtype.itemsize + g * sp * dp * q.dtype.itemsize,
            transcendentals=g * sp * sp,
        ),
    )(qg, kg, vg)

    out = out[:, :s, :d].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))


@jax.custom_vjp
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    return _flash_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _flash_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g) -> Tuple[jax.Array, jax.Array, jax.Array]:
    q, k, v = res
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fwd, _bwd)
