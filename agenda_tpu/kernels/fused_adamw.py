"""Single-pass fused int8-AdamW parameter update as a Pallas TPU kernel.

Role in the reference: bitsandbytes' fused AdamW8bit CUDA kernel
(``data_generation/finetune_sd.py:606-614``) — one kernel that reads
(param, grad, int8 moments), performs the whole AdamW update, and writes
(new param, new int8 moments) in a single HBM pass.

Why it exists here: the optax chain equivalent
(``train/optim.py:scale_by_adam_8bit`` + ``add_decayed_weights`` +
``scale_by_learning_rate`` + ``apply_updates`` + ``clip_by_global_norm``)
is mathematically identical but executes as many separate XLA fusions with
materialized intermediates: measured ~60 ms/step of optimizer elementwise
ops on the 512^2 SD train step at bs 4 on v5e (STATUS.md round-3 notes).
For ~860 M parameters the chain moves ~60 GB/step of HBM traffic; the fused
kernel moves the information-theoretic minimum (~14 GB: read p/g/int8
moments, write p/int8 moments).

Numerics: identical formulas to ``scale_by_adam_8bit`` (same blockwise
absmax int8 log-code with _BLOCK=256, _SPAN=7.0 — see train/optim.py for
why a LINEAR code cannot represent Adam's second moment), same optax
semantics for clip-by-global-norm (scale = 1 if gnorm < max_norm else
max_norm/gnorm), bias correction with count+1, lr from lr_fn(count)
pre-increment, decoupled weight decay p -= lr*(u + wd*p). Transcendentals
(exp/log) may round differently ulp-wise between Mosaic and XLA, so a
re-quantized code value can differ by ±1 on bin boundaries; the tests
assert equality within one quantization bin plus exact structural parity.

Layout: each leaf is processed flat as (rows of 256,) so a quantization
block (256 lanes = 2 vregs) is one kernel row; the per-row absmax is a
lane reduction. Grid = row chunks; scalars (lr, clip scale, bias
corrections) ride in SMEM. ``input_output_aliases`` lets XLA update the
param/moment buffers in place under donation.

Off-TPU the kernel runs in Pallas interpret mode, so the CPU suite
exercises the exact TPU kernel code (same policy as kernels/flash.py).
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agenda_tpu.kernels._backend import on_tpu as _on_tpu

_BLOCK = 256   # quantization block (must match train/optim.py)
_SPAN = 7.0    # log-code decades (must match train/optim.py)
_LN10 = math.log(10.0)
_ROWS = 512    # kernel rows (quant blocks) per grid step


def _interpret() -> bool:
    return not _on_tpu()


def _update_math(sc_ref, p_ref, g_ref, qm_ref, sm_ref, qv_ref, sv_ref,
                 po_ref, qmo_ref, smo_ref, qvo_ref, svo_ref,
                 b1: float, b2: float, eps: float, wd: float):
    """Shared AdamW8bit row math; returns the new params (still in registers)
    so callers can fuse follow-on elementwise work (e.g. the EMA update)."""
    lr = sc_ref[0, 0]
    gscale = sc_ref[0, 1]
    c1 = sc_ref[0, 2]
    c2 = sc_ref[0, 3]

    g = g_ref[...].astype(jnp.float32) * gscale
    p = p_ref[...].astype(jnp.float32)

    def deq(q_i8, s):
        q = q_i8.astype(jnp.float32)
        mag = jnp.abs(q)
        val = jnp.where(
            mag > 0.0,
            jnp.sign(q) * jnp.exp((_LN10 * _SPAN / 126.0) * (mag - 127.0)),
            0.0,
        )
        return val * s

    def quant(x):
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        safe = jnp.maximum(absmax, 1e-30)
        ratio = jnp.abs(x) / safe
        mag = jnp.round(
            127.0 + (126.0 / _SPAN) * (jnp.log(jnp.maximum(ratio, 1e-30)) / _LN10)
        )
        mag = jnp.clip(mag, 0.0, 127.0)
        return (jnp.sign(x) * mag).astype(jnp.int8), absmax

    m = deq(qm_ref[...], sm_ref[...])
    v = deq(qv_ref[...], sv_ref[...])
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    u = (m / c1) / (jnp.sqrt(v / c2) + eps)

    p2 = p - lr * (u + wd * p)
    po_ref[...] = p2
    qm, sm = quant(m)
    qv, sv = quant(v)
    qmo_ref[...] = qm
    smo_ref[...] = sm
    qvo_ref[...] = qv
    svo_ref[...] = sv
    return p2


def _kernel(sc_ref, p_ref, g_ref, qm_ref, sm_ref, qv_ref, sv_ref,
            po_ref, qmo_ref, smo_ref, qvo_ref, svo_ref,
            *, b1: float, b2: float, eps: float, wd: float):
    _update_math(sc_ref, p_ref, g_ref, qm_ref, sm_ref, qv_ref, sv_ref,
                 po_ref, qmo_ref, smo_ref, qvo_ref, svo_ref, b1, b2, eps, wd)


def _kernel_ema(sc_ref, p_ref, g_ref, qm_ref, sm_ref, qv_ref, sv_ref, e_ref,
                po_ref, qmo_ref, smo_ref, qvo_ref, svo_ref, eo_ref,
                *, b1: float, b2: float, eps: float, wd: float):
    """AdamW8bit update + EMA shadow update in the same HBM pass: the new
    params are still in registers when the shadow blend happens, saving the
    separate full-tree read a chained ``ema_update`` would pay.

    Measured on v5e (512^2 full-SD step, bs 4, no remat): 303 vs 301
    ms/step sustained — NEUTRAL vs the separate tree-mapped blend (XLA was
    already overlapping that pass). Kept because it removes a logical full-
    tree pass and the parity is test-locked; revisit if profiles change."""
    p2 = _update_math(sc_ref, p_ref, g_ref, qm_ref, sm_ref, qv_ref, sv_ref,
                      po_ref, qmo_ref, smo_ref, qvo_ref, svo_ref, b1, b2, eps, wd)
    decay = sc_ref[0, 4]
    e = e_ref[...].astype(jnp.float32)
    eo_ref[...] = e * decay + (1.0 - decay) * p2


def fused_adamw8bit_leaf(
    p: jax.Array,
    g: jax.Array,
    qm: jax.Array,
    sm: jax.Array,
    qv: jax.Array,
    sv: jax.Array,
    scalars: jax.Array,  # (1, 4) f32 [lr, clip_scale, c1, c2]; (1, 5) w/ ema
    *,
    b1: float,
    b2: float,
    eps: float,
    weight_decay: float,
    ema: Optional[jax.Array] = None,  # f32 leaf-shaped shadow; scalars[0,4]=decay
):
    """One leaf's full AdamW8bit update. Returns (p', qm', sm', qv', sv')
    — plus ema' appended when ``ema`` is given (fused shadow update).

    ``p``/``g`` in the leaf's original shape; ``qm``/``qv`` int8 in the same
    shape; ``sm``/``sv`` f32 (nblocks,) per-256-block absmax — the exact
    ``train.optim._Quantized`` layout, so optimizer state round-trips.
    """
    shape, n = p.shape, p.size
    nb = (n + _BLOCK - 1) // _BLOCK
    pad = nb * _BLOCK - n
    # The grid's final block may be partial: rows beyond nb read unspecified
    # padding and produce garbage, but every kernel op is row-local (the
    # absmax is a within-row lane reduction), so garbage never contaminates
    # valid rows, and out-of-bounds rows are dropped on write-back. Padding
    # only to the 256-block multiple keeps the common big-leaf case
    # (sizes divisible by 256) a zero-copy reshape.

    def rows_f(x, dtype):
        flat = x.reshape(-1).astype(dtype)
        if pad:
            flat = jnp.pad(flat, (0, pad))
        return flat.reshape(nb, _BLOCK)

    def scale_rows(s):
        return s.astype(jnp.float32).reshape(nb, 1)

    pr = rows_f(p, jnp.float32)
    gr = rows_f(g, jnp.float32)
    qmr = rows_f(qm, jnp.int8)
    qvr = rows_f(qv, jnp.int8)
    smr = scale_rows(sm)
    svr = scale_rows(sv)

    rows = min(_ROWS, nb)
    grid = ((nb + rows - 1) // rows,)
    row_spec = lambda width: pl.BlockSpec((rows, width), lambda i: (i, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        row_spec(_BLOCK),  # p
        row_spec(_BLOCK),  # g
        row_spec(_BLOCK),  # qm
        row_spec(1),       # sm
        row_spec(_BLOCK),  # qv
        row_spec(1),       # sv
    ]
    out_specs = [
        row_spec(_BLOCK),
        row_spec(_BLOCK),
        row_spec(1),
        row_spec(_BLOCK),
        row_spec(1),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, _BLOCK), jnp.float32),
        jax.ShapeDtypeStruct((nb, _BLOCK), jnp.int8),
        jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        jax.ShapeDtypeStruct((nb, _BLOCK), jnp.int8),
        jax.ShapeDtypeStruct((nb, 1), jnp.float32),
    ]
    # Update param/moment (and ema) buffers in place (operand index: 0 is
    # the scalar array, 1 is p, 3 is qm, 4 is sm, 5 is qv, 6 is sv, 7 ema).
    aliases = {1: 0, 3: 1, 4: 2, 5: 3, 6: 4}
    operands = [scalars, pr, gr, qmr, smr, qvr, svr]
    if ema is not None:
        in_specs.append(row_spec(_BLOCK))
        out_specs.append(row_spec(_BLOCK))
        out_shape.append(jax.ShapeDtypeStruct((nb, _BLOCK), jnp.float32))
        aliases[7] = 5
        operands.append(rows_f(ema, jnp.float32))
        kernel = functools.partial(_kernel_ema, b1=b1, b2=b2, eps=eps, wd=weight_decay)
    else:
        kernel = functools.partial(_kernel, b1=b1, b2=b2, eps=eps, wd=weight_decay)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(*operands)

    p2, qm2, sm2, qv2, sv2 = outs[:5]
    unrows = lambda x, dt: x.reshape(-1)[:n].reshape(shape).astype(dt)
    result = (
        unrows(p2, jnp.float32),
        unrows(qm2, jnp.int8),
        sm2.reshape(-1)[:nb],
        unrows(qv2, jnp.int8),
        sv2.reshape(-1)[:nb],
    )
    if ema is not None:
        result = result + (unrows(outs[5], jnp.float32),)
    return result
