"""Fused GroupNorm(+SiLU) as a Pallas TPU kernel.

Motivation (measured on v5e, see STATUS.md "Measured perf notes"): in the
full SD UNet forward, XLA schedules every GroupNorm as a
``convert_reduce_fusion`` (f32 channel statistics + a materialized bf16
passthrough of the producer) costing 1.6-2.5 ms at (16,64,64,320) — ~26% of
the 122 ms step — even though the same GN+conv pattern in isolation fuses to
within ~0.1 ms of the conv alone. This kernel takes the fusion decision away
from the scheduler: one grid step per batch row streams the (HW, C) slab
through VMEM once — chunked f32 sum/sum-of-squares, group segment-sums via a
(C, G) 0/1 mask matmul (the group axis G=32 is far below lane width; a
reshape to (HW, G, C/G) would put C/G=10..40 in the lane dim and relayout),
then the normalize (+ optional SiLU) on a second chunked sweep over the
VMEM-resident slab. HBM traffic: read x once, write y once.

MEASURED OUTCOME (v5e, full UNet CFG forward, batch 8): the kernel itself is
cheap — the three norm custom-calls total 3.5 ms where XLA's stat fusions
cost 31.8 — but the custom-call boundaries break XLA's producer/consumer
fusions around every norm (+18.7 ms %fusion, +9.8 ms %add, +2 ms %copy),
for a NET LOSS: 129.8 ms/step vs 121.8 with flax GroupNorm (an explicit-f32
jnp reference formulation lands between, 127.3). The model therefore
defaults to flax GroupNorm (models/layers.GroupNormAct) and this kernel
stays an opt-in (AGENDA_TPU_FUSED_GN=1) with the measurement recorded here:
beating the XLA scheduler needs whole-block fusion (norm+conv), not a
norm-only kernel.

Numerics match ``flax.linen.GroupNorm(use_fast_variance=True)``: f32 E[x^2] -
E[x]^2 statistics computed from the (bf16) input, per-channel affine, biased
variance, epsilon inside rsqrt.

Gradients: ``group_norm_act`` carries a custom_vjp whose backward evaluates
the jnp reference implementation's VJP (XLA-compiled, numerically identical
math) — training pays one extra GN recompute, generation (the hot path for
this kernel) never differentiates it.

Off-TPU the kernel runs in Pallas interpret mode only inside the dedicated
tests (same policy as kernels/flash.py); the public entry falls back to the
jnp reference so CPU callers keep XLA speed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agenda_tpu.kernels._backend import on_tpu as _on_tpu


# VMEM budget for the resident slab: Mosaic double-buffers the (1, HW, C)
# input AND output blocks (4x the slab) on top of the f32 chunk temps, within
# the 16M scoped-vmem limit — measured: a 3.9M slab (16,1024,1920) OOMs at
# 23.25M requested. 3M slabs keep the total under the cap.
_MAX_SLAB_BYTES = 3 * 1024 * 1024
# f32 working chunk cap (per temp) for the stats/normalize sweeps.
_MAX_CHUNK_BYTES = 1 * 1024 * 1024


def _pick_chunk(hw: int, c: int) -> int:
    chunk = min(512, hw)
    while chunk > 8 and (chunk * c * 4 > _MAX_CHUNK_BYTES or hw % chunk):
        chunk //= 2
    return chunk


def group_norm_act_reference(
    x: jax.Array,  # (B, HW, C) or (B, H, W, C)
    scale: jax.Array,  # (C,)
    bias: jax.Array,  # (C,)
    groups: int,
    eps: float,
    act: Optional[str] = None,
) -> jax.Array:
    """jnp reference, flax GroupNorm(use_fast_variance) semantics."""
    shape = x.shape
    b, c = shape[0], shape[-1]
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(b, -1, groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    meansq = jnp.mean(xf * xf, axis=(1, 3), keepdims=True)
    var = meansq - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd
    y = y.reshape(b, -1, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.reshape(shape).astype(x.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float,
               act: Optional[str], chunk: int):
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cg = c // groups
    n_chunks = hw // chunk

    def stat_body(i, carry):
        s, ss = carry
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return s + jnp.sum(xb, axis=0, keepdims=True), \
               ss + jnp.sum(xb * xb, axis=0, keepdims=True)

    zeros = jnp.zeros((1, c), jnp.float32)
    s, ss = jax.lax.fori_loop(0, n_chunks, stat_body, (zeros, zeros))

    # Group segment sums: (1, C) @ (C, G) one-hot mask (G << lane width, so a
    # reshape-to-groups would relayout; the mask matmul stays lane-friendly).
    cid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    gid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (cid == gid).astype(jnp.float32)  # (C, G)
    n = jnp.float32(hw * cg)
    mean_g = jax.lax.dot_general(s, m, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / n
    meansq_g = jax.lax.dot_general(ss, m, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) / n
    rstd_g = jax.lax.rsqrt(meansq_g - mean_g * mean_g + eps)

    # Broadcast back to channels: (1, G) @ (G, C).
    mt = m.T
    mean_c = jax.lax.dot_general(mean_g, mt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd_g, mt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    gamma = scale_ref[...].astype(jnp.float32)  # (1, C)
    beta = bias_ref[...].astype(jnp.float32)
    mul = rstd_c * gamma
    add = beta - mean_c * mul

    def norm_body(i, _):
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xb * mul + add
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


def _gn_pallas(x3, scale, bias, groups: int, eps: float, act: Optional[str],
               interpret: bool = False) -> jax.Array:
    b, hw, c = x3.shape
    chunk = _pick_chunk(hw, c)
    kernel = functools.partial(_gn_kernel, groups=groups, eps=eps, act=act,
                               chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x3, scale.reshape(1, c), bias.reshape(1, c))


def _supported(x3, groups: int) -> bool:
    b, hw, c = x3.shape
    if c % groups != 0:
        return False
    if hw % _pick_chunk(hw, c) != 0:
        return False
    return x3.size * x3.dtype.itemsize // b <= _MAX_SLAB_BYTES


@functools.cache
def _kernel_enabled() -> bool:
    # Opt-in until the kernel's speedup is confirmed on real hardware
    # (AGENDA_TPU_FUSED_GN=0/1); the fallback is the XLA reference path.
    import os

    return os.environ.get("AGENDA_TPU_FUSED_GN", "0") == "1"


def _impl(x, scale, bias, groups: int, eps: float, act: Optional[str]):
    shape = x.shape
    x3 = x.reshape(shape[0], -1, shape[-1])
    if _kernel_enabled() and _on_tpu() and _supported(x3, groups):
        y = _gn_pallas(x3, scale, bias, groups, eps, act)
        return y.reshape(shape)
    return group_norm_act_reference(x, scale, bias, groups, eps, act)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_act(x, scale, bias, groups: int, eps: float, act: Optional[str] = None):
    """Fused GroupNorm(+act). x: (B, H, W, C) or (B, HW, C).

    Pallas on TPU when the per-batch slab fits VMEM, jnp reference otherwise
    (and everywhere off-TPU). Replaces nn.GroupNorm -> silu pairs in the UNet
    (models/layers.py) without changing the parameter tree.
    """
    return _impl(x, scale, bias, groups, eps, act)


def _fwd(x, scale, bias, groups, eps, act):
    return _impl(x, scale, bias, groups, eps, act), (x, scale, bias)


def _bwd(groups, eps, act, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_act_reference(x_, s_, b_, groups, eps, act),
        x, scale, bias,
    )
    return vjp(g)


group_norm_act.defvjp(_fwd, _bwd)


def kernel_wanted(x3, groups: int) -> bool:
    """Should the model route this GN through the Pallas kernel? (Opt-in,
    TPU, slab fits VMEM.) When False the caller should use flax GroupNorm —
    measured fastest in-model (see models/layers.GroupNormAct)."""
    return _kernel_enabled() and _on_tpu() and _supported(x3, groups)


def group_norm_act_auto(x, scale, bias, groups: int, eps: float,
                        act: Optional[str] = None):
    """Kernel when possible, reference otherwise (the reference's XLA-native
    autodiff path avoids the custom_vjp's forward recompute)."""
    if _kernel_enabled() and _on_tpu():
        return group_norm_act(x, scale, bias, groups, eps, act)
    return group_norm_act_reference(x, scale, bias, groups, eps, act)
