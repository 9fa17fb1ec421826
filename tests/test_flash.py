"""Pallas flash-attention kernel regression tests.

Off-TPU the kernels run in Pallas *interpret mode* (see
``agenda_tpu/kernels/flash.py``), so this CPU suite executes the exact same
kernel code that compiles on the chip — forward, dK/dV and dQ backward — and
compares it against the plain-XLA oracle ``attention_reference``. A
TPU-marked strict-tolerance variant runs the compiled kernels when a real
chip is attached (``JAX_PLATFORMS=axon pytest -m tpu``).

Covers the role xformers memory-efficient attention plays in the reference
(``data_generation/finetune_sd.py:539-550``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agenda_tpu.kernels.attention import attention_reference
from agenda_tpu.kernels.flash import flash_attention


def _make_qkv(b, s, h, d, dtype, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h, d), jnp.float32) for kk in ks)
    return q.astype(dtype), k.astype(dtype), v.astype(dtype)


@pytest.mark.parametrize(
    "s,d,dtype,tol",
    [
        (256, 64, jnp.float32, 2e-5),
        (256, 40, jnp.float32, 2e-5),   # head_dim 40 = SD-1.x level-0; pad-to-128 path
        (512, 64, jnp.float32, 2e-5),
        (256, 64, jnp.bfloat16, 2e-2),
    ],
)
def test_flash_forward_matches_reference(s, d, dtype, tol):
    q, k, v = _make_qkv(1, s, 2, d, dtype)
    out = flash_attention(q, k, v)
    ref = attention_reference(q, k, v)
    assert out.shape == q.shape and out.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol, rtol=tol
    )


@pytest.mark.parametrize("d", [64, 40])
def test_flash_backward_matches_xla_vjp(d):
    q, k, v = _make_qkv(1, 256, 2, d, jnp.float32, seed=1)
    w = jax.random.normal(jax.random.key(9), q.shape, jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * w)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_flash_backward_bf16_inputs():
    q, k, v = _make_qkv(1, 256, 2, 64, jnp.bfloat16, seed=2)

    def loss(q, k, v):
        return jnp.mean(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.mean(attention_reference(q, k, v).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for gf, grr in zip(g, gr):
        assert gf.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(grr, np.float32), atol=3e-2, rtol=3e-2
        )


def test_flash_under_jit_and_grad_composition():
    """The custom_vjp must trace cleanly under jit (the train step jits it)."""
    q, k, v = _make_qkv(1, 256, 1, 64, jnp.float32, seed=3)

    @jax.jit
    def f(q, k, v):
        return jax.grad(lambda q: jnp.sum(flash_attention(q, k, v)))(q)

    g = f(q, k, v)
    assert np.isfinite(np.asarray(g)).all()


def test_flash_rejects_ragged_seq():
    # s <= 512 always works (block = s); above that, s must divide into
    # 512-blocks — 576 does not.
    q, k, v = _make_qkv(1, 576, 1, 64, jnp.float32)
    with pytest.raises(NotImplementedError):
        flash_attention(q, k, v)


@pytest.mark.tpu
def test_flash_tpu_strict():
    """Strict-tolerance compiled-kernel parity; runs only with a TPU backend
    (the CPU conftest pins jax to cpu, where this is skipped)."""
    if jax.default_backend() == "cpu":
        pytest.skip("needs a TPU backend (run with JAX_PLATFORMS=axon)")
    q, k, v = _make_qkv(2, 4096, 8, 40, jnp.bfloat16, seed=4)
    out = jax.jit(flash_attention)(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


def test_attention_flash_min_dim_dispatch_parity():
    """The training-mode cutoff (flash_min_dim=40) must route the D=40
    self-attention through the flash kernels with gradients matching the XLA
    path (the train step's memory-efficient backward — see
    kernels/attention.py docstring)."""
    from agenda_tpu.kernels import _backend
    from agenda_tpu.kernels.attention import attention

    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(1, 1024, 2, 40).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1024, 2, 40).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 1024, 2, 40).astype(np.float32))

    orig = _backend.on_tpu
    _backend.on_tpu = lambda: True  # force dispatch; kernels interpret on CPU
    import agenda_tpu.kernels.attention as attn_mod
    attn_mod._on_tpu = lambda: True
    try:
        def f_flash(q):
            return jnp.sum(attention(q, k, v, flash_min_dim=40) ** 2)

        def f_xla(q):
            return jnp.sum(attention(q, k, v, use_flash=False) ** 2)

        gf = jax.grad(f_flash)(q)
        gx = jax.grad(f_xla)(q)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=2e-3, atol=2e-3)
        # default cutoff still excludes D=40 (generation forward policy)
        out_default = attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out_default),
                                   np.asarray(attention(q, k, v, use_flash=False)),
                                   rtol=1e-5, atol=1e-5)
    finally:
        _backend.on_tpu = orig
        attn_mod._on_tpu = orig
