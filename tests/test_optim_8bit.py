"""int8-moment AdamW (the reference's bitsandbytes AdamW8bit role,
finetune_sd.py:606-614): quantization error bounds, optimizer parity with
f32 Adam on a convex problem, int8 state dtypes, jit/MultiSteps composition."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from agenda_tpu.train.optim import (
    _BLOCK,
    _dequantize,
    _quantize,
    adamw_8bit,
    lr_schedule,
    make_optimizer,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    for shape in [(300,), (1000, 7), (5, 5)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32) * rng.rand())
        z = _quantize(x)
        back = np.asarray(_dequantize(z))
        assert back.shape == x.shape
        flat = np.asarray(x).reshape(-1)
        got = back.reshape(-1)
        # log code: relative error <= 10^(SPAN/252)-1 (~6.6%) for values
        # within SPAN decades of the block absmax; smaller ones snap to 0.
        pad = (-len(flat)) % _BLOCK
        absmax = np.abs(np.pad(flat, (0, pad)).reshape(-1, _BLOCK)).max(1)
        absmax = np.repeat(absmax, _BLOCK)[: len(flat)]
        big = np.abs(flat) > absmax * 10 ** (-6.5)
        rel = np.abs(got[big] - flat[big]) / np.abs(flat[big])
        assert rel.max() <= 0.07, rel.max()
        np.testing.assert_array_equal(np.sign(got), np.sign(flat) * (got != 0))
    # exact zeros stay exactly zero; huge dynamic range survives
    z = _quantize(jnp.zeros((512,)))
    assert float(jnp.abs(_dequantize(z)).max()) == 0.0
    wide = jnp.asarray([1.0, 1e-3, 1e-6, 0.0])
    back = np.asarray(_dequantize(_quantize(wide)))
    assert abs(back[1] - 1e-3) / 1e-3 < 0.07
    assert abs(back[2] - 1e-6) / 1e-6 < 0.07


def test_adam8bit_matches_f32_adam_on_convex():
    """Minimize ||Wx - y||^2: int8-moment AdamW must track f32 AdamW and
    converge (params big enough to be quantized)."""
    rng = np.random.RandomState(1)
    W0 = jnp.asarray(rng.randn(64, 80).astype(np.float32))
    X = jnp.asarray(rng.randn(80, 256).astype(np.float32))
    Y = jnp.asarray(rng.randn(64, 256).astype(np.float32))

    def loss(W):
        return jnp.mean((W @ X - Y) ** 2)

    def run(tx, steps=200):
        params = {"w": W0}
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            l, g = jax.value_and_grad(lambda p: loss(p["w"]))(params)
            u, state2 = tx.update(g, state, params)
            return optax.apply_updates(params, u), state2, l

        for _ in range(steps):
            params, state, l = step(params, state)
        return float(l)

    lf = lambda s: 0.05
    l8 = run(adamw_8bit(lf, weight_decay=0.0))
    l32 = run(optax.adamw(lf, weight_decay=0.0))
    base = float(loss(W0))
    assert l8 < 0.15 * base          # converges
    assert l8 < l32 * 1.5 + 1e-3     # and tracks f32 Adam closely


def test_adam8bit_state_is_int8_for_big_leaves():
    tx = adamw_8bit(lambda s: 1e-3)
    params = {"big": jnp.zeros((128, 64)), "small": jnp.zeros((7,))}
    state = tx.init(params)
    adam_state = state[0]  # chain: (ScaleByAdam8bitState, decay, lr)
    assert adam_state.mu["big"].q.dtype == jnp.int8
    assert adam_state.mu["big"].scale.dtype == jnp.float32
    # tiny leaves stay f32
    assert adam_state.mu["small"].dtype == jnp.float32
    # memory: int8 payload + per-256 scales ~ 26% of f32
    big_bytes = adam_state.mu["big"].q.nbytes + adam_state.mu["big"].scale.nbytes
    assert big_bytes < 0.3 * (128 * 64 * 4)


def test_make_optimizer_8bit_with_accum_and_clip():
    tx = make_optimizer(lr_schedule("constant", 1e-2, 0, 100),
                        max_grad_norm=1.0, gradient_accumulation_steps=2,
                        use_8bit_adam=True)
    params = {"w": jnp.ones((4096,))}
    state = tx.init(params)
    g = {"w": jnp.full((4096,), 0.5)}

    @jax.jit
    def step(state, params):
        u, s2 = tx.update(g, state, params)
        return optax.apply_updates(params, u), s2

    p1, state = step(state, params)  # micro-step 1: no update
    np.testing.assert_allclose(np.asarray(p1["w"]), 1.0)
    p2, state = step(state, p1)      # micro-step 2: real update
    assert float(jnp.abs(p2["w"] - 1.0).max()) > 0
    assert np.isfinite(np.asarray(p2["w"])).all()
