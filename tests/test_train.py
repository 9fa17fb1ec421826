"""Training stack tests: loss math, train step, EMA, checkpoints, LR schedules,
and the multi-chip dry run on the virtual 8-device mesh."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    TrainState,
    init_train_state,
    make_train_step,
)
from agenda_tpu.train.optim import lr_schedule, make_optimizer


@pytest.fixture(scope="module")
def tiny_setup():
    unet_cfg = UNetConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    clip_cfg = CLIPTextConfig.tiny()
    unet = UNet2DConditionModel(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextModel(clip_cfg)
    k = jax.random.key(0)
    s = unet_cfg.sample_size
    unet_params = unet.init(k, jnp.zeros((1, s, s, 4)), jnp.array([1]),
                            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)))
    vae_params = vae.init(k, jnp.zeros((1, 4 * s, 4 * s, 3)), k)
    text_params = text.init(k, jnp.ones((1, 77), jnp.int32))
    return dict(unet=unet, vae=vae, text=text, unet_cfg=unet_cfg,
                unet_params=unet_params, vae_params=vae_params, text_params=text_params)


def make_batch(b, s):
    rng = np.random.RandomState(0)
    return {
        "pixel_values": rng.randn(b, 4 * s, 4 * s, 3).astype(np.float32) * 0.1,
        "input_ids": np.ones((b, 77), np.int32),
    }


def test_train_step_updates_and_is_deterministic(tiny_setup):
    t = tiny_setup
    schedule = make_schedule()
    tx = make_optimizer(lr_schedule("constant", 1e-3, 0, 100))
    state = init_train_state(t["unet_params"], tx, use_ema=True)
    step_fn = jax.jit(make_train_step(t["unet"], t["vae"], t["text"], schedule, tx,
                                      LossConfig(snr_gamma=5.0), use_ema=True))
    batch = make_batch(2, t["unet_cfg"].sample_size)
    batch = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.key(7)

    s1, m1 = step_fn(state, t["vae_params"], t["text_params"], batch, rng)
    assert np.isfinite(float(m1["loss"]))
    assert int(s1.step) == 1
    # params changed
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, s1.params)
    assert max(jax.tree.leaves(d)) > 0
    # EMA moved toward new params and its counter advanced
    assert int(s1.ema.step) == 1

    # Determinism: same inputs -> identical loss.
    s2, m2 = step_fn(state, t["vae_params"], t["text_params"], batch, rng)
    assert float(m1["loss"]) == float(m2["loss"])

    # loss decreases over a few steps on a fixed batch
    losses = [float(m1["loss"])]
    st = s1
    for i in range(4):
        st, m = step_fn(st, t["vae_params"], t["text_params"], batch, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))


def test_gradient_accumulation_semantics(tiny_setup):
    """With accumulation N, N micro-steps must yield exactly ONE optimizer
    update and ONE EMA update (reference counts sync_gradients steps,
    finetune_sd.py:761, 830-840)."""
    t = tiny_setup
    schedule = make_schedule()
    accum = 3
    tx = make_optimizer(lr_schedule("constant", 1e-3, 0, 100),
                        gradient_accumulation_steps=accum)
    state = init_train_state(t["unet_params"], tx, use_ema=True)
    step_fn = jax.jit(make_train_step(t["unet"], t["vae"], t["text"], schedule, tx,
                                      LossConfig(), use_ema=True,
                                      gradient_accumulation_steps=accum))
    batch = jax.tree.map(jnp.asarray, make_batch(2, t["unet_cfg"].sample_size))
    rng = jax.random.key(0)

    def max_delta(a, b):
        return max(jax.tree.leaves(
            jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)))

    # Micro-steps 1..N-1: params frozen (MultiSteps emits zero updates), EMA
    # counter must NOT advance.
    st = state
    for i in range(accum - 1):
        st, _ = step_fn(st, t["vae_params"], t["text_params"], batch, rng)
        assert max_delta(st.params, state.params) == 0.0, f"params moved at micro {i+1}"
        assert int(st.ema.step) == 0
    # Micro-step N: one real update.
    st, _ = step_fn(st, t["vae_params"], t["text_params"], batch, rng)
    assert max_delta(st.params, state.params) > 0.0
    assert int(st.ema.step) == 1

    # One more full window -> exactly a second update/EMA step.
    snap = st
    for _ in range(accum - 1):
        st, _ = step_fn(st, t["vae_params"], t["text_params"], batch, rng)
        assert max_delta(st.params, snap.params) == 0.0
    st, _ = step_fn(st, t["vae_params"], t["text_params"], batch, rng)
    assert int(st.ema.step) == 2

    # The lr schedule is driven by UPDATE count: the inner adamw count must
    # equal 2 after 2*accum micro-steps.
    counts = [int(x) for x in jax.tree.leaves(st.opt_state)
              if getattr(x, "shape", None) == () and x.dtype == jnp.int32]
    assert 2 in counts, counts


def test_lr_schedules_golden():
    fn = lr_schedule("constant", 2.0, 0, 100)
    assert float(fn(0)) == 2.0 and float(fn(99)) == 2.0

    fn = lr_schedule("constant_with_warmup", 1.0, 10, 100)
    assert abs(float(fn(5)) - 0.5) < 1e-6
    assert float(fn(50)) == 1.0

    fn = lr_schedule("linear", 1.0, 10, 110)
    assert abs(float(fn(5)) - 0.5) < 1e-6
    assert abs(float(fn(60)) - 0.5) < 1e-6  # halfway through decay
    assert float(fn(110)) == 0.0

    fn = lr_schedule("cosine", 1.0, 0, 100)
    assert abs(float(fn(0)) - 1.0) < 1e-6
    assert abs(float(fn(50)) - 0.5) < 1e-5
    assert float(fn(100)) < 1e-6

    fn = lr_schedule("polynomial", 1.0, 0, 100, power=2.0)
    assert abs(float(fn(50)) - 0.25) < 1e-3


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    from agenda_tpu.train.checkpoint import (
        find_resume_checkpoint,
        list_checkpoints,
        load_checkpoint,
        rotate_checkpoints,
        save_checkpoint,
    )

    t = tiny_setup
    schedule = make_schedule()
    tx = make_optimizer(lr_schedule("constant", 1e-3, 0, 100))
    state = init_train_state(t["unet_params"], tx, use_ema=True)
    step_fn = jax.jit(make_train_step(t["unet"], t["vae"], t["text"], schedule, tx,
                                      LossConfig(), use_ema=True))
    batch = jax.tree.map(jnp.asarray, make_batch(2, t["unet_cfg"].sample_size))
    state, _ = step_fn(state, t["vae_params"], t["text_params"], batch, jax.random.key(0))

    out = str(tmp_path / "run")
    save_checkpoint(out, 1, t["unet_cfg"], state, total_limit=2)
    state2, _ = step_fn(state, t["vae_params"], t["text_params"], batch, jax.random.key(0))
    save_checkpoint(out, 2, t["unet_cfg"], state2, total_limit=2)
    save_checkpoint(out, 3, t["unet_cfg"], state2, total_limit=2)
    ckpts = list_checkpoints(out)
    assert [c[0] for c in ckpts] == [2, 3]  # rotation kept the last two

    found = find_resume_checkpoint(out, "latest")
    assert found[0] == 3

    template = init_train_state(t["unet_params"], tx, use_ema=True)
    restored = load_checkpoint(found[1], template)
    assert int(restored.step) == int(state2.step)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(restored.opt_state), jax.tree.leaves(state2.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_dryrun_multichip_8dev():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_ema_init_does_not_alias_params():
    """ema_init must COPY: an f32 astype is a no-op alias, and a train state
    whose ema subtree aliases params fails any donated step with 'donate the
    same buffer twice' (root cause of round 2's 'axon donated+EMA bug')."""
    from agenda_tpu.core.ema import ema_init, ema_update

    params = {"w": jnp.ones((16, 16), jnp.float32), "b": jnp.zeros((16,))}
    ema = ema_init(params)
    for p, e in zip(jax.tree.leaves(params), jax.tree.leaves(ema.params)):
        assert p.unsafe_buffer_pointer() != e.unsafe_buffer_pointer()

    # A donated step carrying the EMA subtree must execute.
    state = {"params": params, "ema": ema}

    @jax.jit
    def step(state, x):
        g = jax.grad(
            lambda p: jnp.sum(jnp.tanh(x @ p["w"] + p["b"])))(state["params"])
        new_p = jax.tree.map(lambda p, gg: p - 1e-3 * gg, state["params"], g)
        return {"params": new_p, "ema": ema_update(state["ema"], new_p)}

    donated = jax.jit(step, donate_argnums=(0,))
    x = jnp.ones((4, 16))
    for _ in range(2):
        state = donated(state, x)
    assert np.isfinite(np.asarray(jax.tree.leaves(state["params"])[0])).all()


def test_async_checkpointer(tiny_setup, tmp_path):
    """AsyncCheckpointer: background writes land atomically (no .tmp dirs
    visible as checkpoints), serialize one-in-flight, and load back
    identically to the sync path."""
    from agenda_tpu.train.checkpoint import (
        AsyncCheckpointer,
        find_resume_checkpoint,
        list_checkpoints,
        load_checkpoint,
    )

    t = tiny_setup
    schedule = make_schedule()
    tx = make_optimizer(lr_schedule("constant", 1e-3, 0, 100))
    state = init_train_state(t["unet_params"], tx, use_ema=True)
    step_fn = jax.jit(make_train_step(t["unet"], t["vae"], t["text"], schedule, tx,
                                      LossConfig(), use_ema=True))
    batch = jax.tree.map(jnp.asarray, make_batch(2, t["unet_cfg"].sample_size))
    state, _ = step_fn(state, t["vae_params"], t["text_params"], batch, jax.random.key(0))

    out = str(tmp_path / "run")
    w = AsyncCheckpointer()
    w.save(out, 1, t["unet_cfg"], state, total_limit=2)
    # training continues while the write is in flight
    state2, _ = step_fn(state, t["vae_params"], t["text_params"], batch, jax.random.key(0))
    w.save(out, 2, t["unet_cfg"], state2, total_limit=2)  # joins write 1 first
    path = w.wait()
    assert path.endswith("checkpoint-2")
    assert [c[0] for c in list_checkpoints(out)] == [1, 2]
    assert not [d for d in os.listdir(out) if d.startswith(".tmp-")]

    found = find_resume_checkpoint(out, "latest")
    template = init_train_state(t["unet_params"], tx, use_ema=True)
    restored = load_checkpoint(found[1], template)
    assert int(restored.step) == int(state2.step)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # writer errors surface on wait()
    import pytest as _pytest

    w2 = AsyncCheckpointer()
    w2.submit(lambda: (_ for _ in ()).throw(IOError("disk full")))
    with _pytest.raises(IOError):
        w2.wait()


def test_atomic_checkpoint_dir_durability(tmp_path):
    """Crash-safety invariants: stale .tmp orphans are swept, a failed write
    leaves the previous checkpoint-{step} intact, and re-saving a step
    replaces it only after the new payload is fully written."""
    from agenda_tpu.train.checkpoint import atomic_checkpoint_dir, list_checkpoints

    out = str(tmp_path / "run")
    os.makedirs(os.path.join(out, ".tmp-checkpoint-7"))  # crashed-run orphan

    def payload_v1(path):
        with open(os.path.join(path, "w.txt"), "w") as f:
            f.write("v1")

    p = atomic_checkpoint_dir(out, 5, None, payload_v1)
    assert p.endswith("checkpoint-5")
    assert open(os.path.join(p, "w.txt")).read() == "v1"
    assert not [d for d in os.listdir(out) if d.startswith(".tmp-")]  # swept

    # a failing rewrite of the same step must keep the old checkpoint
    def payload_boom(path):
        raise IOError("disk full")

    with pytest.raises(IOError):
        atomic_checkpoint_dir(out, 5, None, payload_boom)
    assert open(os.path.join(out, "checkpoint-5", "w.txt")).read() == "v1"

    # a successful rewrite replaces it
    def payload_v2(path):
        with open(os.path.join(path, "w.txt"), "w") as f:
            f.write("v2")

    atomic_checkpoint_dir(out, 5, None, payload_v2)
    assert open(os.path.join(out, "checkpoint-5", "w.txt")).read() == "v2"
    assert [c[0] for c in list_checkpoints(out)] == [5]
