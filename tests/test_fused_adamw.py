"""Fused single-pass int8 AdamW (kernels/fused_adamw.py): numeric parity
with the optax chain it replaces (clip_by_global_norm + scale_by_adam_8bit +
add_decayed_weights + scale_by_learning_rate + apply_updates), state-layout
round-trip, pad/small-leaf paths, and train-step integration.

Off-TPU the Pallas kernel runs in interpret mode, so these tests execute the
exact TPU kernel code (same policy as tests/test_flash.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from agenda_tpu.train.optim import (
    FusedAdamW8bit,
    ScaleByAdam8bitState,
    _Quantized,
    lr_schedule,
    make_fused_adamw_8bit,
    make_optimizer,
)


def _chained(lr_fn, wd=1e-2, max_norm=1.0):
    return make_optimizer(lr_fn, adam_weight_decay=wd, max_grad_norm=max_norm,
                          use_8bit_adam=True)


def _fused(lr_fn, wd=1e-2, max_norm=1.0):
    return make_fused_adamw_8bit(lr_fn, weight_decay=wd, max_grad_norm=max_norm)


def _tree(rng, big=(64, 80), small=(7,)):
    return {
        "big": jnp.asarray(rng.randn(*big).astype(np.float32)),
        "small": jnp.asarray(rng.randn(*small).astype(np.float32)),
    }


def _run_chained(tx, params, grads_seq):
    state = tx.init(params)
    for g in grads_seq:
        u, state = jax.jit(tx.update)(g, state, params)
        params = optax.apply_updates(params, u)
    return params, state


def _run_fused(ft, params, grads_seq):
    state = ft.init(params)
    for g in grads_seq:
        params, state, gnorm = jax.jit(ft.apply)(g, state, params)
    return params, state, gnorm


def _adam_states(chained_state):
    # chain = (clip, adamw_8bit=(adam8bit, decay, lr)); optax flattens
    # inner chains into the tuple — find the ScaleByAdam8bitState.
    leaves = []

    def walk(s):
        if isinstance(s, ScaleByAdam8bitState):
            leaves.append(s)
        elif isinstance(s, tuple):
            for x in s:
                walk(x)

    walk(chained_state)
    assert len(leaves) == 1
    return leaves[0]


def test_single_step_matches_chain():
    rng = np.random.RandomState(0)
    params = _tree(rng)
    grads = [jax.tree.map(lambda p: jnp.asarray(
        np.random.RandomState(7).randn(*p.shape).astype(np.float32) * 0.1), params)]
    lr_fn = lr_schedule("constant", 1e-2, 0, 100)

    pc, sc = _run_chained(_chained(lr_fn), dict(params), grads)
    pf, sf, gnorm = _run_fused(_fused(lr_fn), dict(params), grads)

    # Param updates identical up to transcendental rounding (exp vs 10**).
    for k in params:
        np.testing.assert_allclose(np.asarray(pf[k]), np.asarray(pc[k]),
                                   rtol=1e-5, atol=1e-6)
    # grad_norm is the pre-clip global norm.
    ref = optax.global_norm(grads[0])
    np.testing.assert_allclose(float(gnorm), float(ref), rtol=1e-6)

    # Moment codes within one quantization bin; scales close.
    ac = _adam_states(sc)
    assert int(sf.count) == int(ac.count) == 1
    for tree_c, tree_f in [(ac.mu, sf.mu), (ac.nu, sf.nu)]:
        qc, qf = tree_c["big"], tree_f["big"]
        assert isinstance(qc, _Quantized) and isinstance(qf, _Quantized)
        assert qf.q.dtype == jnp.int8 and qf.q.shape == params["big"].shape
        diff = np.abs(np.asarray(qc.q, np.int32) - np.asarray(qf.q, np.int32))
        assert diff.max() <= 1, diff.max()
        np.testing.assert_allclose(np.asarray(qf.scale), np.asarray(qc.scale),
                                   rtol=1e-5)
        # small leaf stays plain f32
        np.testing.assert_allclose(np.asarray(tree_f["small"]),
                                   np.asarray(tree_c["small"]), rtol=1e-5, atol=1e-7)


def test_clipping_active_matches_chain():
    """Gradients above the max norm: the clip scale must match optax's."""
    rng = np.random.RandomState(3)
    params = _tree(rng)
    big_g = jax.tree.map(lambda p: jnp.asarray(
        rng.randn(*p.shape).astype(np.float32) * 50.0), params)
    lr_fn = lr_schedule("constant", 1e-2, 0, 100)

    pc, _ = _run_chained(_chained(lr_fn, max_norm=1.0), dict(params), [big_g])
    pf, _, gnorm = _run_fused(_fused(lr_fn, max_norm=1.0), dict(params), [big_g])
    assert float(gnorm) > 1.0
    for k in params:
        np.testing.assert_allclose(np.asarray(pf[k]), np.asarray(pc[k]),
                                   rtol=1e-5, atol=1e-6)


def test_trajectory_tracks_chain_and_converges():
    """20 steps on ||Wx-y||^2 with a schedule: fused and chained stay close
    through repeated quant/dequant cycles and both converge."""
    rng = np.random.RandomState(1)
    W0 = jnp.asarray(rng.randn(64, 80).astype(np.float32))
    X = jnp.asarray(rng.randn(80, 256).astype(np.float32))
    Y = jnp.asarray(rng.randn(64, 256).astype(np.float32))
    loss = lambda W: jnp.mean((W @ X - Y) ** 2)
    lr_fn = lr_schedule("linear", 0.05, 2, 40)

    def grads_at(params):
        return jax.grad(lambda p: loss(p["w"]))(params)

    tx = _chained(lr_fn, wd=1e-3)
    ft = _fused(lr_fn, wd=1e-3)
    pc = {"w": W0}
    pf = {"w": W0}
    sc = tx.init(pc)
    sf = ft.init(pf)
    for _ in range(20):
        u, sc = jax.jit(tx.update)(grads_at(pc), sc, pc)
        pc = optax.apply_updates(pc, u)
        pf, sf, _ = jax.jit(ft.apply)(grads_at(pf), sf, pf)
    # Trajectories agree to quantization-bin noise: the ±1-code rounding
    # differences (exp vs 10** transcendentals) give per-element drift up to
    # ~0.03 abs over 20 requant cycles (measured), but the losses track to
    # ~1e-5 relative and both converge.
    np.testing.assert_allclose(np.asarray(pf["w"]), np.asarray(pc["w"]),
                               atol=0.05)
    lf, lc = float(loss(pf["w"])), float(loss(pc["w"]))
    np.testing.assert_allclose(lf, lc, rtol=1e-3)
    assert lf < 0.7 * float(loss(W0))


def test_state_roundtrips_between_fused_and_chained():
    """A checkpointed chained ScaleByAdam8bitState drives the fused
    optimizer (and back): resume across the optimizer implementations."""
    rng = np.random.RandomState(5)
    params = _tree(rng)
    g = jax.tree.map(lambda p: jnp.asarray(
        rng.randn(*p.shape).astype(np.float32) * 0.1), params)
    lr_fn = lr_schedule("constant", 1e-2, 0, 100)
    tx, ft = _chained(lr_fn), _fused(lr_fn)

    # two chained steps -> extract adam state -> one fused step
    pc, sc = _run_chained(tx, dict(params), [g, g])
    adam = _adam_states(sc)
    pf, sf, _ = jax.jit(ft.apply)(g, adam, pc)
    assert int(sf.count) == 3
    assert np.isfinite(np.asarray(pf["big"])).all()
    # structural match: fused state re-enters tx.init's layout
    chex_tree = jax.tree_util.tree_structure(
        ft.init(params), is_leaf=lambda x: isinstance(x, _Quantized))
    assert jax.tree_util.tree_structure(
        sf, is_leaf=lambda x: isinstance(x, _Quantized)) == chex_tree


def test_pad_path_nondivisible_leaf():
    """Leaf sizes not divisible by 256 take the padded path; padding must
    not contaminate valid rows and shapes must round-trip."""
    rng = np.random.RandomState(6)
    # 300 elements -> 2 blocks with 212 pad lanes; force quantization via
    # min_quantize_size=1 through a direct make call
    ft = make_fused_adamw_8bit(lambda s: 1e-2, min_quantize_size=1)
    tx = make_optimizer(lr_schedule("constant", 1e-2, 0, 100),
                        use_8bit_adam=True)
    params = {"w": jnp.asarray(rng.randn(300).astype(np.float32))}
    g = {"w": jnp.asarray(rng.randn(300).astype(np.float32))}
    sf = ft.init(params)
    pf, sf, _ = jax.jit(ft.apply)(g, sf, params)
    assert pf["w"].shape == (300,)
    assert sf.mu["w"].q.shape == (300,)
    assert sf.mu["w"].scale.shape == (2,)
    assert np.isfinite(np.asarray(pf["w"])).all()

    # against a pure-numpy oracle of the same math
    gs = np.asarray(g["w"])
    gn = np.linalg.norm(gs)
    sc = 1.0 if gn < 1.0 else 1.0 / gn
    gg = gs * sc
    m = 0.1 * gg
    v = 0.001 * gg * gg
    u = (m / (1 - 0.9)) / (np.sqrt(v / (1 - 0.999)) + 1e-8)
    expect = np.asarray(params["w"]) - 1e-2 * (u + 1e-2 * np.asarray(params["w"]))
    np.testing.assert_allclose(np.asarray(pf["w"]), expect, rtol=1e-4, atol=1e-5)


def test_make_optimizer_fused_validation():
    lr_fn = lr_schedule("constant", 1e-2, 0, 100)
    with pytest.raises(ValueError):
        make_optimizer(lr_fn, use_8bit_adam=False, fused=True)
    with pytest.raises(ValueError):
        make_optimizer(lr_fn, use_8bit_adam=True,
                       gradient_accumulation_steps=2, fused=True)
    ft = make_optimizer(lr_fn, use_8bit_adam=True, fused=True)
    assert isinstance(ft, FusedAdamW8bit)


def test_train_step_with_fused_optimizer():
    """make_train_step consumes the FusedAdamW8bit and produces a step whose
    loss matches the chained optimizer step exactly on the forward and whose
    params match to quantization tolerance on the update.

    min_quantize_size=1 forces even the tiny UNet's leaves through the
    Pallas kernel so the integration path exercises it."""
    import optax as _optax

    from agenda_tpu.core.schedules import make_schedule
    from agenda_tpu.models import (
        AutoencoderKL,
        CLIPTextConfig,
        CLIPTextModel,
        UNet2DConditionModel,
        UNetConfig,
        VAEConfig,
    )
    from agenda_tpu.train.finetune_sd import (
        LossConfig,
        init_train_state,
        make_train_step,
    )
    from agenda_tpu.train.optim import adamw_8bit, scale_by_adam_8bit

    unet_cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(unet_cfg)
    vae = AutoencoderKL(VAEConfig.tiny())
    text = CLIPTextModel(CLIPTextConfig.tiny())
    k = jax.random.key(0)
    s = unet_cfg.sample_size
    unet_params = unet.init(k, jnp.zeros((1, s, s, 4)), jnp.array([1]),
                            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)))
    vae_params = vae.init(k, jnp.zeros((1, 4 * s, 4 * s, 3)), k)
    text_params = text.init(k, jnp.ones((1, 77), jnp.int32))

    schedule = make_schedule()
    lr_fn = lr_schedule("constant", 1e-3, 0, 100)
    loss_cfg = LossConfig()
    b = 2
    batch = {
        "pixel_values": jnp.asarray(
            np.random.RandomState(0).rand(b, 4 * s, 4 * s, 3).astype(np.float32)
            * 2 - 1),
        "input_ids": jnp.ones((b, 77), jnp.int32),
    }
    rng = jax.random.key(0)

    chained_tx = _optax.chain(
        _optax.clip_by_global_norm(1.0),
        scale_by_adam_8bit(min_quantize_size=1),
        _optax.add_decayed_weights(1e-2),
        _optax.scale_by_learning_rate(lr_fn),
    )
    fused_tx = make_fused_adamw_8bit(lr_fn, min_quantize_size=1)

    results = {}
    for name, tx in [("chained", chained_tx), ("fused", fused_tx)]:
        state = init_train_state(unet_params, tx, use_ema=False)
        step = jax.jit(make_train_step(unet, vae, text, schedule, tx, loss_cfg))
        state, metrics = step(state, vae_params, text_params, batch, rng)
        results[name] = (state, metrics)

    mc, mf = results["chained"][1], results["fused"][1]
    np.testing.assert_allclose(float(mf["loss"]), float(mc["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(mf["grad_norm"]), float(mc["grad_norm"]),
                               rtol=1e-5)
    pc = results["chained"][0].params
    pf = results["fused"][0].params
    flat_c = jax.tree_util.tree_leaves(pc)
    flat_f = jax.tree_util.tree_leaves(pf)
    for a, b_ in zip(flat_f, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.tpu
def test_fused_adamw_tpu_strict():
    """Compiled-kernel parity on the real chip (interpret-mode parity is
    covered above; this catches TPU-lowering-specific divergence). Same
    policy as tests/test_flash.py::test_flash_tpu_strict."""
    if jax.default_backend() == "cpu":
        pytest.skip("needs a TPU backend (run with AGENDA_TPU_TESTS=1)")
    rng = np.random.RandomState(3)
    # One quantized leaf (>= min_quantize_size elements) + one small leaf.
    params = {"w": jnp.asarray(rng.randn(128, 40).astype(np.float32)),
              "b": jnp.asarray(rng.randn(40).astype(np.float32))}
    grads_seq = [jax.tree.map(
        lambda p, i=i: jnp.asarray(rng.randn(*p.shape).astype(np.float32)) * 0.1,
        params) for i in range(3)]
    lr_fn = lr_schedule("constant", 1e-3, 0, 100)
    pc, sc = _run_chained(_chained(lr_fn), params, grads_seq)
    pf, sf, _ = _run_fused(_fused(lr_fn), params, grads_seq)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        pc, pf)


def test_fused_ema_matches_separate_ema_update():
    """apply(..., ema=...) must equal apply() followed by the standalone
    ema blend — the kernel-fused shadow update changes traffic, not math."""
    rng = np.random.RandomState(9)
    params = {"w": jnp.asarray(rng.randn(64, 64).astype(np.float32)),
              "b": jnp.asarray(rng.randn(5).astype(np.float32))}
    ema = jax.tree.map(lambda p: p + 0.01, params)
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)) * 0.1, params)
    lr_fn = lr_schedule("constant", 1e-3, 0, 100)
    ft = _fused(lr_fn)
    state = ft.init(params)
    decay = 0.9
    p_ref, s_ref, _ = jax.jit(ft.apply)(grads, state, params)
    e_ref = jax.tree.map(lambda e, p: e * decay + (1 - decay) * p, ema, p_ref)
    p_f, s_f, _, e_f = jax.jit(
        lambda g, s, p, e: ft.apply(g, s, p, ema=e, ema_decay=decay)
    )(grads, state, params, ema)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7), p_ref, p_f)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7), e_ref, e_f)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        jax.tree.leaves(s_ref), jax.tree.leaves(s_f))


def test_train_step_fused_ema_matches_unfused():
    """The full-SD train step with fused EMA must match the chained-optimizer
    + ema_update step on the same inputs (tiny model)."""
    import os
    from agenda_tpu.core.schedules import make_schedule
    from agenda_tpu.models import (AutoencoderKL, CLIPTextConfig, CLIPTextModel,
                                   UNet2DConditionModel, UNetConfig, VAEConfig)
    from agenda_tpu.train.finetune_sd import (LossConfig, init_train_state,
                                              make_train_step)

    unet = UNet2DConditionModel(UNetConfig.tiny())
    vae = AutoencoderKL(VAEConfig.tiny())
    text = CLIPTextModel(CLIPTextConfig.tiny())
    k = jax.random.key(0)
    unet_params = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.array([1]),
                            jnp.zeros((1, 77, 32)))
    vae_params = vae.init(k, jnp.zeros((1, 64, 64, 3)), k)
    text_params = text.init(k, jnp.ones((1, 77), jnp.int32))
    sched = make_schedule()
    batch = {"pixel_values": jax.random.normal(jax.random.key(3), (2, 64, 64, 3)),
             "input_ids": jnp.ones((2, 77), jnp.int32)}
    lr_fn = lr_schedule("constant", 1e-4, 0, 100)

    results = {}
    for name, fused in (("fused", True), ("chain", False)):
        tx = make_optimizer(lr_fn, use_8bit_adam=True, fused=fused)
        state = init_train_state(unet_params, tx, use_ema=True)
        step = jax.jit(make_train_step(unet, vae, text, sched, tx,
                                       LossConfig(), use_ema=True))
        for i in range(2):
            state, m = step(state, vae_params, text_params, batch,
                            jax.random.key(7))
        results[name] = state
    a, b = results["fused"], results["chain"]
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(a.ema.params)[0]),
        np.asarray(jax.tree.leaves(b.ema.params)[0]), rtol=2e-4, atol=2e-6)
    assert int(a.ema.step) == int(b.ema.step) == 2


def test_cross_layout_checkpoint_resume(tmp_path):
    """A train_state saved under one int8-AdamW layout (fused <-> chained)
    must resume under the other: restore_opt_payload retries with the
    alternate layout and grafts the moments + schedule counters."""
    import os

    import orbax.checkpoint as ocp

    from agenda_tpu.train.checkpoint import restore_opt_payload

    rng = np.random.RandomState(5)
    params = {"w": jnp.asarray(rng.randn(128, 40).astype(np.float32)),  # quantized
              "b": jnp.asarray(rng.randn(7).astype(np.float32))}
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)) * 0.1, params)
    lr_fn = lr_schedule("constant", 1e-3, 0, 100)

    for save_fused in (True, False):
        save_tx = (_fused(lr_fn) if save_fused else _chained(lr_fn))
        if save_fused:
            p2, save_state, _ = jax.jit(save_tx.apply)(grads, save_tx.init(params), params)
        else:
            u, save_state = jax.jit(save_tx.update)(grads, save_tx.init(params), params)
            p2 = optax.apply_updates(params, u)
        d = os.path.join(str(tmp_path), f"ck_{save_fused}")
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(d), {"opt_state": save_state, "step": jnp.int32(1)})

        load_tx = (_chained(lr_fn) if save_fused else _fused(lr_fn))
        template = load_tx.init(params)
        restored = restore_opt_payload(
            d, jax.eval_shape(lambda: {"opt_state": template, "step": jnp.int32(0)}),
            template, params)
        a_saved = _adam_states(save_state) if not save_fused else save_state
        a_rest = _adam_states(restored["opt_state"]) \
            if save_fused else restored["opt_state"]
        assert int(a_rest.count) == int(a_saved.count) == 1
        np.testing.assert_array_equal(
            np.asarray(a_rest.mu["w"].q), np.asarray(a_saved.mu["w"].q))
        # One more step from the restored state must run.
        if save_fused:
            u, _ = jax.jit(load_tx.update)(grads, restored["opt_state"], p2)
        else:
            _ = jax.jit(load_tx.apply)(grads, restored["opt_state"], p2)
