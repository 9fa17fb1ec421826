"""Golden-value tests for diffusion schedules and samplers.

Goldens are computed with independent numpy re-implementations of the
reference semantics (diffusers DDPM/DDIM/PNDM math and the min-SNR weighting
of data_generation/finetune_sd.py:40-74, 804-811) so the JAX code is checked
against a second, eager implementation rather than against itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agenda_tpu.core import (
    make_schedule,
    add_noise,
    compute_snr,
    min_snr_weights,
    ddim_timesteps,
    ddim_step,
    plms_timesteps,
    plms_init_state,
    plms_step,
    get_velocity,
)


def np_sd_schedule(n=1000, b0=0.00085, b1=0.012):
    betas = np.linspace(b0**0.5, b1**0.5, n, dtype=np.float64) ** 2
    return betas, np.cumprod(1 - betas)


def test_alphas_cumprod_matches_numpy():
    sched = make_schedule()
    betas, abar = np_sd_schedule()
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), abar, rtol=1e-5)


def test_add_noise_golden():
    sched = make_schedule()
    _, abar = np_sd_schedule()
    x = np.random.RandomState(0).randn(2, 4, 8, 8).astype(np.float32)
    eps = np.random.RandomState(1).randn(2, 4, 8, 8).astype(np.float32)
    ts = np.array([10, 900])
    got = np.asarray(add_noise(sched, jnp.asarray(x), jnp.asarray(eps), jnp.asarray(ts)))
    want = (
        np.sqrt(abar[ts])[:, None, None, None] * x
        + np.sqrt(1 - abar[ts])[:, None, None, None] * eps
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_snr_and_min_snr_weights():
    sched = make_schedule()
    _, abar = np_sd_schedule()
    ts = np.array([0, 100, 500, 999])
    snr = np.asarray(compute_snr(sched, jnp.asarray(ts)))
    want_snr = abar[ts] / (1 - abar[ts])
    np.testing.assert_allclose(snr, want_snr, rtol=1e-4)

    w = np.asarray(min_snr_weights(sched, jnp.asarray(ts), snr_gamma=5.0))
    want_w = np.minimum(want_snr, 5.0) / want_snr
    np.testing.assert_allclose(w, want_w, rtol=1e-4)

    # v-prediction variant
    sched_v = make_schedule(prediction_type="v_prediction")
    wv = np.asarray(min_snr_weights(sched_v, jnp.asarray(ts), snr_gamma=5.0))
    np.testing.assert_allclose(wv, np.minimum(want_snr, 5.0) / (want_snr + 1), rtol=1e-4)


def test_velocity_identity():
    # v satisfies: sqrt(abar)*v + (1-abar... ) check x0 reconstruction:
    # x0 = sqrt(abar)*x_t - sqrt(1-abar)*v  where x_t = add_noise(x0).
    sched = make_schedule()
    rng = np.random.RandomState(2)
    x0 = rng.randn(3, 4, 4, 4).astype(np.float32)
    eps = rng.randn(3, 4, 4, 4).astype(np.float32)
    ts = np.array([5, 300, 990])
    xt = add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(ts))
    v = get_velocity(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(ts))
    abar = np.asarray(sched.alphas_cumprod)[ts][:, None, None, None]
    rec = np.sqrt(abar) * np.asarray(xt) - np.sqrt(1 - abar) * np.asarray(v)
    np.testing.assert_allclose(rec, x0, rtol=1e-4, atol=1e-5)


def test_ddim_timesteps_20():
    sched = make_schedule()
    ts = ddim_timesteps(sched, 20)
    # leading spacing, step 50, offset 1: 951, 901, ..., 1
    assert ts[0] == 951 and ts[-1] == 1 and len(ts) == 20
    assert np.all(np.diff(ts) == -50)


def test_plms_timesteps_20():
    sched = make_schedule()
    ts = plms_timesteps(sched, 20)
    # duplicated second entry: [951, 901, 901, 851, ...]
    assert len(ts) == 21
    assert ts[0] == 951 and ts[1] == 901 and ts[2] == 901 and ts[3] == 851
    assert ts[-1] == 1


def np_ddim_step(abar, final_abar, eps, t, prev_t, x):
    a_t = abar[t]
    a_p = abar[prev_t] if prev_t >= 0 else final_abar
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    return np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps


def test_ddim_step_golden():
    sched = make_schedule()
    _, abar = np_sd_schedule()
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    eps = rng.randn(1, 4, 8, 8).astype(np.float32)
    for t, pt in [(951, 901), (51, 1), (1, -49)]:
        got = np.asarray(
            ddim_step(sched, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(pt), jnp.asarray(x))
        )
        want = np_ddim_step(abar, abar[0], eps, t, pt, x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class NumpyPLMS:
    """Eager reference implementation of diffusers PNDMScheduler.step_plms."""

    def __init__(self, abar, final_abar, n_train=1000, n_inf=20):
        self.abar, self.final = abar, final_abar
        self.ratio = n_train // n_inf
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def _prev(self, sample, t, prev_t, out):
        a_t = self.abar[t]
        a_p = self.abar[prev_t] if prev_t >= 0 else self.final
        b_t, b_p = 1 - a_t, 1 - a_p
        coeff = (a_p / a_t) ** 0.5
        denom = a_t * b_p**0.5 + (a_t * b_t * a_p) ** 0.5
        return coeff * sample - (a_p - a_t) * out / denom

    def step(self, out, t, sample):
        prev_t = t - self.ratio
        if self.counter != 1:
            self.ets = self.ets[-3:] + [out]
        else:
            prev_t = t
            t = t + self.ratio
        if len(self.ets) == 1 and self.counter == 0:
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            out = (out + self.ets[-1]) / 2
            sample = self.cur_sample
        elif len(self.ets) == 2:
            out = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            out = (23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]) / 12
        else:
            out = (
                55 * self.ets[-1] - 59 * self.ets[-2] + 37 * self.ets[-3] - 9 * self.ets[-4]
            ) / 24
        self.counter += 1
        return self._prev(sample, t, prev_t, out)


def test_plms_matches_numpy_reference():
    sched = make_schedule()
    _, abar = np_sd_schedule()
    n_inf = 20
    ts = plms_timesteps(sched, n_inf)
    rng = np.random.RandomState(4)
    shape = (1, 8, 8, 4)
    x_np = rng.randn(*shape).astype(np.float32)

    ref = NumpyPLMS(abar, abar[0], n_inf=n_inf)
    state = plms_init_state(shape)
    x_jax = jnp.asarray(x_np)

    for i, t in enumerate(ts):
        # Fake "model output" depending deterministically on x and t.
        eps_np = np.tanh(x_np) * 0.1 + (t / 1000.0)
        x_ref = ref.step(eps_np.astype(np.float32), int(t), x_np)

        state, x_jax = plms_step(
            sched, state, jnp.asarray(eps_np.astype(np.float32)), x_jax, jnp.asarray(int(t)), n_inf
        )
        np.testing.assert_allclose(np.asarray(x_jax), x_ref, rtol=2e-4, atol=2e-5)
        x_np = np.asarray(x_jax)


def test_plms_scan_compatible():
    """The PLMS loop must run under lax.scan (one compiled sampling program)."""
    sched = make_schedule()
    n_inf = 10
    ts = jnp.asarray(plms_timesteps(sched, n_inf))
    shape = (2, 8, 8, 4)
    x0 = jax.random.normal(jax.random.key(0), shape)

    def body(carry, t):
        state, x = carry
        eps = jnp.tanh(x) * 0.1
        state, x = plms_step(sched, state, eps, x, t, n_inf)
        return (state, x), ()

    (state, xT), _ = jax.lax.scan(body, (plms_init_state(shape), x0), ts)
    assert np.all(np.isfinite(np.asarray(xT)))
