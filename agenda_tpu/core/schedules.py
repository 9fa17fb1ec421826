"""Diffusion noise schedules and samplers as pure JAX functions.

TPU-first redesign of the scheduler functionality the reference pulls from
``diffusers`` (``DDPMScheduler`` for training, ``PNDMScheduler``/``DDIMScheduler``
for sampling) plus the in-repo min-SNR loss weighting
(reference: ``data_generation/finetune_sd.py:40-74`` ``compute_snr``).

Everything here is stateless and jit/scan-friendly: the schedule is a small
pytree of precomputed f32 tables, samplers are ``(state, x_t) -> (state, x_{t-1})``
step functions driven by static timestep tables, so a full 20-step sampling loop
compiles to a single ``lax.scan`` with no host round-trips.

Default hyperparameters match Stable Diffusion v1.x
(``scaled_linear`` betas 0.00085 -> 0.012, 1000 train steps, ``steps_offset=1``,
``skip_prk_steps=True`` PLMS, ``clip_sample=False``, epsilon prediction).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed diffusion schedule tables (all f32, length = num_train_timesteps)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    # Static config (aux data, not traced).
    num_train_timesteps: int = dataclasses.field(default=1000, metadata=dict(static=True))
    prediction_type: str = dataclasses.field(default="epsilon", metadata=dict(static=True))
    steps_offset: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def final_alpha_cumprod(self) -> jax.Array:
        # set_alpha_to_one=False in the SD config: clamp to alphas_cumprod[0].
        return self.alphas_cumprod[0]


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    prediction_type: str = "epsilon",
    steps_offset: int = 1,
) -> DiffusionSchedule:
    """Build the beta/alpha tables. Matches diffusers' DDPMScheduler math."""
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif beta_schedule == "squaredcos_cap_v2":
        # Glide cosine schedule.
        t = np.arange(num_train_timesteps + 1, dtype=np.float64) / num_train_timesteps

        def f(u):
            return np.cos((u + 0.008) / 1.008 * np.pi / 2) ** 2

        betas = np.minimum(1.0 - f(t[1:]) / f(t[:-1]), 0.999)
    else:
        raise ValueError(f"Unknown beta_schedule: {beta_schedule}")

    alphas_cumprod = np.cumprod(1.0 - betas)
    return DiffusionSchedule(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
        steps_offset=steps_offset,
    )


def _extract(table: jax.Array, timesteps: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep scalars and reshape to broadcast against an ndim tensor."""
    vals = table[timesteps].astype(jnp.float32)
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def add_noise(
    schedule: DiffusionSchedule,
    samples: jax.Array,
    noise: jax.Array,
    timesteps: jax.Array,
) -> jax.Array:
    """Forward diffusion: x_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps.

    Reference semantics: diffusers ``DDPMScheduler.add_noise`` as used at
    ``data_generation/finetune_sd.py:783-785``.
    """
    abar = _extract(schedule.alphas_cumprod, timesteps, samples.ndim)
    return jnp.sqrt(abar) * samples.astype(jnp.float32) + jnp.sqrt(1.0 - abar) * noise.astype(
        jnp.float32
    )


def get_velocity(
    schedule: DiffusionSchedule,
    samples: jax.Array,
    noise: jax.Array,
    timesteps: jax.Array,
) -> jax.Array:
    """v-prediction target: v = sqrt(abar) eps - sqrt(1-abar) x_0."""
    abar = _extract(schedule.alphas_cumprod, timesteps, samples.ndim)
    return jnp.sqrt(abar) * noise.astype(jnp.float32) - jnp.sqrt(1.0 - abar) * samples.astype(
        jnp.float32
    )


def compute_snr(schedule: DiffusionSchedule, timesteps: jax.Array) -> jax.Array:
    """Per-timestep SNR = abar / (1 - abar).

    Reference: ``data_generation/finetune_sd.py:40-74`` (sqrt-based formulation;
    algebraically identical).
    """
    abar = schedule.alphas_cumprod[timesteps].astype(jnp.float32)
    return abar / (1.0 - abar)


def min_snr_weights(
    schedule: DiffusionSchedule,
    timesteps: jax.Array,
    snr_gamma: float,
) -> jax.Array:
    """Min-SNR-gamma loss weights (https://arxiv.org/abs/2303.09556).

    Reference semantics: ``data_generation/finetune_sd.py:804-811`` —
    min(snr, gamma)/snr for epsilon prediction, min(snr, gamma)/(snr+1) for
    v-prediction.
    """
    snr = compute_snr(schedule, timesteps)
    w = jnp.minimum(snr, jnp.float32(snr_gamma))
    if schedule.prediction_type == "epsilon":
        return w / snr
    elif schedule.prediction_type == "v_prediction":
        return w / (snr + 1.0)
    raise ValueError(f"Unknown prediction_type: {schedule.prediction_type}")


def pred_original_sample(
    schedule: DiffusionSchedule,
    model_output: jax.Array,
    sample: jax.Array,
    timesteps: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Return (pred_x0, pred_epsilon) from a model output under the schedule's prediction type."""
    abar = _extract(schedule.alphas_cumprod, timesteps, sample.ndim)
    sqrt_abar = jnp.sqrt(abar)
    sqrt_1m = jnp.sqrt(1.0 - abar)
    if schedule.prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - sqrt_1m * eps) / sqrt_abar
    elif schedule.prediction_type == "v_prediction":
        x0 = sqrt_abar * sample - sqrt_1m * model_output
        eps = sqrt_abar * model_output + sqrt_1m * sample
    else:
        raise ValueError(f"Unknown prediction_type: {schedule.prediction_type}")
    return x0, eps


# ---------------------------------------------------------------------------
# DDIM sampler
# ---------------------------------------------------------------------------


def ddim_timesteps(schedule: DiffusionSchedule, num_inference_steps: int) -> np.ndarray:
    """Descending timestep table (static numpy, computed at trace time).

    Matches diffusers DDIMScheduler.set_timesteps with 'leading' spacing +
    steps_offset.
    """
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
    ts = ts + schedule.steps_offset
    return ts


def ddim_step(
    schedule: DiffusionSchedule,
    model_output: jax.Array,
    timestep: jax.Array,
    prev_timestep: jax.Array,
    sample: jax.Array,
    eta: float = 0.0,
) -> jax.Array:
    """One deterministic DDIM update x_t -> x_{t_prev} (eta=0 path).

    ``timestep``/``prev_timestep`` are scalars (the whole batch shares one
    timestep during sampling). ``prev_timestep`` may be negative; then
    final_alpha_cumprod is used (set_alpha_to_one=False semantics).
    """
    del eta  # stochastic DDIM not needed by the pipeline; eta=0 always.
    prev_t = jnp.asarray(prev_timestep)
    abar_prev = jnp.where(
        prev_t >= 0,
        schedule.alphas_cumprod[jnp.maximum(prev_t, 0)],
        schedule.final_alpha_cumprod,
    ).astype(jnp.float32)
    x0, eps = pred_original_sample(schedule, model_output, sample, timestep)
    return jnp.sqrt(abar_prev) * x0 + jnp.sqrt(1.0 - abar_prev) * eps


# ---------------------------------------------------------------------------
# PNDM (PLMS, skip_prk_steps=True) sampler — SD-1.x default
# ---------------------------------------------------------------------------
#
# The reference samples via StableDiffusionPipeline's default PNDMScheduler
# (20 steps, data_generation/data_generation.py:59). PLMS keeps a buffer of the
# last 4 epsilon predictions and a step counter; we carry both in a fixed-shape
# state so the whole sampler is one lax.scan.


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PLMSState:
    ets: jax.Array  # (4, *sample_shape) ring buffer of past eps predictions
    n_ets: jax.Array  # () int32, number of valid entries (saturates at 4)
    counter: jax.Array  # () int32, PLMS step counter
    cur_sample: jax.Array  # sample saved at counter==0 for the counter==1 half-step


def plms_timesteps(schedule: DiffusionSchedule, num_inference_steps: int) -> np.ndarray:
    """PLMS timestep table (descending) with the duplicated second step.

    Matches diffusers PNDMScheduler.set_timesteps with skip_prk_steps=True:
    the first model timestep is run twice (counter 0 and 1) to bootstrap the
    multistep buffer.
    """
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * step_ratio).round().astype(np.int64)
    ts = ts + schedule.steps_offset
    # [..., t_{N-2}, t_{N-1}] -> append t_{N-2} then t_{N-1}; reversed.
    plms = np.concatenate([ts[:-1], ts[-2:-1], ts[-1:]])[::-1]
    return plms.copy()


def plms_init_state(sample_shape: Tuple[int, ...], dtype=jnp.float32) -> PLMSState:
    return PLMSState(
        ets=jnp.zeros((4,) + tuple(sample_shape), dtype=dtype),
        n_ets=jnp.zeros((), jnp.int32),
        counter=jnp.zeros((), jnp.int32),
        cur_sample=jnp.zeros(sample_shape, dtype=dtype),
    )


def _plms_prev_sample(
    schedule: DiffusionSchedule,
    sample: jax.Array,
    timestep: jax.Array,
    prev_timestep: jax.Array,
    model_output: jax.Array,
) -> jax.Array:
    """diffusers PNDMScheduler._get_prev_sample (epsilon prediction)."""
    abar_t = _extract(schedule.alphas_cumprod, timestep, sample.ndim)
    abar_prev = jnp.where(
        prev_timestep >= 0,
        schedule.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
        schedule.final_alpha_cumprod,
    ).astype(jnp.float32)
    abar_prev = abar_prev.reshape((1,) * sample.ndim)
    beta_t = 1.0 - abar_t
    beta_prev = 1.0 - abar_prev

    if schedule.prediction_type == "v_prediction":
        model_output = jnp.sqrt(abar_t) * model_output + jnp.sqrt(beta_t) * sample
    elif schedule.prediction_type != "epsilon":
        raise ValueError(f"PLMS supports epsilon/v_prediction, got {schedule.prediction_type}")

    sample_coeff = jnp.sqrt(abar_prev / abar_t)
    denom = abar_t * jnp.sqrt(beta_prev) + jnp.sqrt(abar_t * beta_t * abar_prev)
    return sample_coeff * sample - (abar_prev - abar_t) * model_output / denom


def plms_step(
    schedule: DiffusionSchedule,
    state: PLMSState,
    model_output: jax.Array,
    sample: jax.Array,
    timestep: jax.Array,
    num_inference_steps: int,
) -> Tuple[PLMSState, jax.Array]:
    """Functional port of diffusers PNDMScheduler.step_plms (skip_prk_steps=True).

    All shapes static; branch on the step counter via lax.switch so the whole
    20-step loop scans cleanly.
    """
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    t = timestep.astype(jnp.int32)
    prev_t = t - step_ratio

    counter = state.counter
    is_second = counter == 1  # counter==1: redo first timestep, don't push eps

    # Push model_output into the ring buffer unless counter == 1.
    new_ets = jnp.where(
        is_second,
        state.ets,
        jnp.concatenate([state.ets[1:], model_output[None].astype(state.ets.dtype)], axis=0),
    )
    new_n = jnp.where(is_second, state.n_ets, jnp.minimum(state.n_ets + 1, 4))

    # Timestep juggling: at counter==1, prev_timestep = timestep, timestep += ratio.
    eff_prev_t = jnp.where(is_second, t, prev_t)
    eff_t = jnp.where(is_second, t + step_ratio, t)

    # Effective sample: counter==1 uses the saved cur_sample.
    eff_sample = jnp.where(is_second, state.cur_sample, sample)

    e1 = new_ets[3].astype(jnp.float32)
    e2 = new_ets[2].astype(jnp.float32)
    e3 = new_ets[1].astype(jnp.float32)
    e4 = new_ets[0].astype(jnp.float32)

    def order1(_):
        # counter==0: use raw model_output (and save cur_sample outside).
        return model_output.astype(jnp.float32)

    def order1_5(_):
        # counter==1: average of current output and the buffered one.
        return (model_output.astype(jnp.float32) + e1) / 2.0

    def order2(_):
        return (3.0 * e1 - e2) / 2.0

    def order3(_):
        return (23.0 * e1 - 16.0 * e2 + 5.0 * e3) / 12.0

    def order4(_):
        return (55.0 * e1 - 59.0 * e2 + 37.0 * e3 - 9.0 * e4) / 24.0

    # Select branch: counter 0 -> order1; counter 1 -> order1_5;
    # else by buffer occupancy (2 -> order2, 3 -> order3, >=4 -> order4).
    branch = jnp.where(
        counter == 0,
        0,
        jnp.where(
            counter == 1,
            1,
            jnp.clip(new_n, 2, 4),
        ),
    )
    eff_output = jax.lax.switch(
        branch, [order1, order1_5, order2, order3, order4], operand=None
    )

    prev_sample = _plms_prev_sample(schedule, eff_sample, eff_t, eff_prev_t, eff_output)

    new_state = PLMSState(
        ets=new_ets,
        n_ets=new_n,
        counter=counter + 1,
        # Save the current sample at counter==0 for reuse at counter==1.
        cur_sample=jnp.where(counter == 0, sample, state.cur_sample).astype(
            state.cur_sample.dtype
        ),
    )
    return new_state, prev_sample
