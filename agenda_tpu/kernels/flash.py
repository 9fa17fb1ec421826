"""Blockwise flash attention as Pallas TPU kernels (forward + backward).

Replaces the reference's xformers CUDA memory-efficient attention
(``data_generation/finetune_sd.py:539-550``) for the UNet's latent
self-attention (seq 4096/1024 at 512 x 512). Non-causal, no mask — exactly the
shape of SD UNet self-attention.

Design (v5e):
- grid = (batch*heads, S/block); full K/V (bwd: Q/dO) for one head stay
  resident in VMEM across blocks (<= 4 MB bf16 at S=4096, D<=256), so each
  element is read from HBM once per head per kernel;
- online softmax with f32 running max/sum in the forward; the forward also
  emits the per-row logsumexp so the backward recomputes probabilities
  blockwise without ever materializing the S x S matrix;
- backward runs as two kernels: dK/dV (grid over key blocks) and dQ (grid
  over query blocks), both f32 accumulating;
- head_dim is zero-padded to a lane multiple (128) outside the kernels; zero
  columns contribute nothing to QK^T and are sliced off the outputs.

On non-TPU backends all three kernels run in Pallas *interpret mode*
(``pl.pallas_call(..., interpret=True)``): the same kernel code, evaluated
eagerly — slow, but it means the CPU test suite exercises the exact TPU
kernel logic (``tests/test_flash.py``) rather than a separate reference path.
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


from agenda_tpu.kernels._backend import on_tpu as _on_tpu


def _interpret() -> bool:
    """Run the kernels in Pallas interpret mode off-TPU (exact same kernel
    code, eager evaluation) so CPU tests cover the real kernels."""
    return not _on_tpu()


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int, scale: float):
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
        )
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
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


def _flash_fwd_impl(q: jax.Array, k: jax.Array, v: jax.Array):
    """q/k/v: (B, S, H, D) -> (out (B,S,H,D), lse (B*H, S) f32)."""
    b, s, h, d = q.shape
    assert k.shape == v.shape == (b, s, h, d), (q.shape, k.shape, v.shape)
    scale = 1.0 / (d**0.5)

    dp = _round_up(d, 128)
    block_q = min(512, s)
    block_k = min(512, s)
    if s % max(block_q, block_k) != 0:
        raise NotImplementedError(
            f"flash_attention requires seq % {max(block_q, block_k)} == 0, got {s}"
        )

    def to_g(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, 0), (0, dp - d)))

    qg, kg, vg = to_g(q), to_g(k), to_g(v)
    g = b * h
    grid = (g, s // block_q)
    kernel = functools.partial(_flash_fwd_kernel, block_k=block_k, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, s, dp), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, s, dp), lambda gi, qi: (gi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dp), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda gi, qi: (gi, 0, qi)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, s, dp), q.dtype),
            jax.ShapeDtypeStruct((g, 1, s), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * s * s * dp,
            bytes_accessed=4 * g * s * dp * q.dtype.itemsize,
            transcendentals=g * s * s,
        ),
        interpret=_interpret(),
    )(qg, kg, vg)

    out4 = jnp.transpose(out[:, :, :d].reshape(b, h, s, d), (0, 2, 1, 3))
    return out4, (qg, kg, vg, out, lse)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, block_q: int, scale: float):
    """Grid over (head, key block): dK_j, dV_j accumulated over query blocks."""
    kb = k_ref[0].astype(jnp.float32)  # (block_k, Dp)
    vb = v_ref[0].astype(jnp.float32)
    block_k, dp = kb.shape
    s = q_ref.shape[1]
    n_qb = s // block_q

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        dob = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)]
        logits = (
            jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        )  # (bq, bk)
        p = jnp.exp(logits - lse[:, None])
        # dV_j += P^T dO
        dv = dv + jax.lax.dot_general(p, dob, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        # dS = P * (dO V^T - delta)
        dp_ = jax.lax.dot_general(dob, vb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dp_ - delta[:, None])
        # dK_j += dS^T Q * scale
        dk = dk + jax.lax.dot_general(ds, qb, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32) * scale
        return dk, dv

    dk0 = jnp.zeros((block_k, dp), jnp.float32)
    dv0 = jnp.zeros((block_k, dp), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, block_k: int, scale: float):
    """Grid over (head, query block): dQ_i accumulated over key blocks."""
    qb = q_ref[0].astype(jnp.float32)  # (block_q, Dp)
    dob = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    block_q, dp = qb.shape
    s = k_ref.shape[1]
    n_kb = s // block_k

    def body(j, dq):
        kb = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        logits = (
            jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        )
        p = jnp.exp(logits - lse[:, None])
        dp_ = jax.lax.dot_general(dob, vb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dp_ - delta[:, None])
        dq = dq + jax.lax.dot_general(ds, kb, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32) * scale
        return dq

    dq = jax.lax.fori_loop(0, n_kb, body, jnp.zeros((block_q, dp), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_impl(res, g4):
    qg, kg, vg, outg, lse = res
    gnum, s, dp = qg.shape
    b = g4.shape[0]
    h = gnum // b
    d = g4.shape[-1]
    scale = 1.0 / (d**0.5)
    block = min(512, s)

    dog = jnp.pad(
        jnp.transpose(g4, (0, 2, 1, 3)).reshape(gnum, s, d), ((0, 0), (0, 0), (0, dp - d))
    ).astype(jnp.float32)
    # delta_i = rowsum(dO * O) (f32)
    delta = jnp.sum(dog * outg.astype(jnp.float32), axis=-1)[:, None, :]  # (G, 1, S)

    common_in = [qg, kg, vg, dog]

    dkv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block, scale=scale),
        grid=(gnum, s // block),
        in_specs=[
            pl.BlockSpec((1, s, dp), lambda gi, ki: (gi, 0, 0)),      # q (full)
            pl.BlockSpec((1, block, dp), lambda gi, ki: (gi, ki, 0)),  # k block
            pl.BlockSpec((1, block, dp), lambda gi, ki: (gi, ki, 0)),  # v block
            pl.BlockSpec((1, s, dp), lambda gi, ki: (gi, 0, 0)),       # dO (full)
            pl.BlockSpec((1, 1, s), lambda gi, ki: (gi, 0, 0)),        # lse (full)
            pl.BlockSpec((1, 1, s), lambda gi, ki: (gi, 0, 0)),        # delta (full)
        ],
        out_specs=(
            pl.BlockSpec((1, block, dp), lambda gi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, block, dp), lambda gi, ki: (gi, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((gnum, s, dp), jnp.float32),
            jax.ShapeDtypeStruct((gnum, s, dp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(*common_in, lse, delta)
    dkg, dvg = dkv

    dqg = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block, scale=scale),
        grid=(gnum, s // block),
        in_specs=[
            pl.BlockSpec((1, block, dp), lambda gi, qi: (gi, qi, 0)),  # q block
            pl.BlockSpec((1, s, dp), lambda gi, qi: (gi, 0, 0)),       # k (full)
            pl.BlockSpec((1, s, dp), lambda gi, qi: (gi, 0, 0)),       # v (full)
            pl.BlockSpec((1, block, dp), lambda gi, qi: (gi, qi, 0)),  # dO block
            pl.BlockSpec((1, 1, block), lambda gi, qi: (gi, 0, qi)),   # lse block
            pl.BlockSpec((1, 1, block), lambda gi, qi: (gi, 0, qi)),   # delta block
        ],
        out_specs=pl.BlockSpec((1, block, dp), lambda gi, qi: (gi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((gnum, s, dp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(*common_in, lse, delta)

    def from_g(x):
        return jnp.transpose(x[:, :, :d].reshape(b, h, s, d), (0, 2, 1, 3))

    return from_g(dqg), from_g(dkg), from_g(dvg)


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------


@jax.custom_vjp
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    out, _ = _flash_fwd_impl(q, k, v)
    return out


def _fwd(q, k, v):
    out, res = _flash_fwd_impl(q, k, v)
    return out, res


def _bwd(res, g) -> Tuple[jax.Array, jax.Array, jax.Array]:
    in_dtype = res[0].dtype  # qg
    dq, dk, dv = _flash_bwd_impl(res, g)
    return dq.astype(in_dtype), dk.astype(in_dtype), dv.astype(in_dtype)


flash_attention.defvjp(_fwd, _bwd)
