"""kernels/groupnorm: Pallas fused GroupNorm(+SiLU) parity and wiring.

The CPU suite runs the actual kernel code via Pallas interpret mode (same
policy as test_flash.py); the public group_norm_act entry falls back to the
jnp reference off-TPU, which is itself asserted against flax GroupNorm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from agenda_tpu.kernels.groupnorm import (
    _gn_pallas,
    group_norm_act,
    group_norm_act_reference,
)


def _flax_gn(x, scale, bias, groups, eps, act, dtype):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dtype)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    return nn.silu(y) if act == "silu" else y


@pytest.mark.parametrize(
    "b,hw,c,g,act,dt",
    [
        (2, 4096, 320, 32, "silu", jnp.bfloat16),  # SD level-0 shape
        (3, 1024, 640, 32, None, jnp.bfloat16),
        (2, 64, 1280, 32, "silu", jnp.float32),
        (1, 256, 64, 32, None, jnp.float32),
        (2, 512, 256, 8, "silu", jnp.float32),
    ],
)
def test_kernel_parity_interpret(b, hw, c, g, act, dt):
    x = jax.random.normal(jax.random.key(0), (b, hw, c), dt)
    scale = jax.random.normal(jax.random.key(1), (c,), jnp.float32)
    bias = jax.random.normal(jax.random.key(2), (c,), jnp.float32)
    y = _gn_pallas(x, scale, bias, g, 1e-5, act, interpret=True)
    yr = group_norm_act_reference(x, scale, bias, g, 1e-5, act)
    tol = 5e-3 if dt == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32), atol=tol, rtol=tol
    )


def test_reference_matches_flax():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 64), jnp.float32)
    scale = jax.random.normal(jax.random.key(1), (64,), jnp.float32)
    bias = jax.random.normal(jax.random.key(2), (64,), jnp.float32)
    for act in (None, "silu"):
        yr = group_norm_act_reference(x, scale, bias, 32, 1e-5, act)
        yf = _flax_gn(x, scale, bias, 32, 1e-5, act, jnp.float32)
        np.testing.assert_allclose(np.asarray(yr), np.asarray(yf), atol=1e-6, rtol=1e-6)


def test_gradients_match_flax():
    x = jax.random.normal(jax.random.key(0), (2, 64, 32), jnp.float32)
    scale = jnp.ones((32,)) * 1.3
    bias = jnp.zeros((32,)) + 0.1

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_act(x, s, b, 8, 1e-5, "silu") ** 2)

    def loss_flax(x, s, b):
        return jnp.sum(_flax_gn(x, s, b, 8, 1e-5, "silu", jnp.float32) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


def test_module_param_tree_matches_groupnorm():
    """GroupNormAct is checkpoint-compatible with nn.GroupNorm."""
    from agenda_tpu.models.layers import GroupNormAct

    x = jnp.ones((1, 4, 4, 64))
    p1 = GroupNormAct(num_groups=32, act="silu").init(jax.random.key(0), x)
    p2 = nn.GroupNorm(num_groups=32).init(jax.random.key(0), x)
    t1 = jax.tree.map(lambda a: (a.shape, a.dtype), p1)
    t2 = jax.tree.map(lambda a: (a.shape, a.dtype), p2)
    assert t1 == t2

    y1 = GroupNormAct(num_groups=32).apply(p2, x)
    y2 = nn.GroupNorm(num_groups=32).apply(p2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


@pytest.mark.tpu
def test_kernel_parity_on_tpu():
    if jax.default_backend() == "cpu":
        pytest.skip("needs a TPU backend (AGENDA_TPU_TESTS=1 pytest -m tpu)")
    x = jax.random.normal(jax.random.key(0), (4, 4096, 320), jnp.bfloat16)
    scale = jax.random.normal(jax.random.key(1), (320,), jnp.float32)
    bias = jax.random.normal(jax.random.key(2), (320,), jnp.float32)
    y = jax.jit(lambda *a: _gn_pallas(*a, 32, 1e-5, "silu"))(x, scale, bias)
    yr = group_norm_act_reference(x, scale, bias, 32, 1e-5, "silu")
    # Hardware rounding differs from the XLA path by 1-2 bf16 ulps on ~0.2%
    # of elements (measured: max rel 3.2e-2 at bf16 eps 7.8e-3).
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32), atol=2e-2, rtol=5e-2
    )
