"""Full-UNet SD fine-tuning: pjit train step + epoch loop on a device mesh.

Functional equivalent of the reference trainer's hot loop
(``data_generation/finetune_sd.py:758-894``):

  vae.encode -> sample latents * 0.18215 -> add noise at random timesteps ->
  CLIP text conditioning -> UNet eps prediction -> (min-SNR-weighted) MSE ->
  grad clip 1.0 -> AdamW -> EMA.

TPU-first differences:
- the whole step (including frozen VAE/text-encoder forward) is ONE pjit'd
  program; batch shards over the ``dp`` mesh axis, the gradient all-reduce is
  XLA-inserted (replaces accelerate DDP/NCCL, ``finetune_sd.py:450-455``);
- frozen VAE/text params run in bf16, trainable UNet keeps f32 master params
  with bf16 compute (the fp16/bf16 policy of ``finetune_sd.py:669-681``);
- optional FSDP axis shards UNet params + optimizer state (the DeepSpeed
  ZeRO-3 path the reference stubs at ``finetune_sd.py:491-510``);
- per-step randomness derives from a single fold-in key: no host RNG.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from agenda_tpu.core.ema import EMAState, ema_decay_at, ema_init, ema_update
from agenda_tpu.core.schedules import (
    DiffusionSchedule,
    add_noise,
    get_velocity,
    min_snr_weights,
)
from agenda_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DConditionModel
from agenda_tpu.models.vae import sample_latents
from agenda_tpu.train.optim import FusedAdamW8bit


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    ema: Optional[EMAState]


def init_train_state(unet_params: Any, tx: optax.GradientTransformation, use_ema: bool) -> TrainState:
    params = unet_params["params"] if "params" in unet_params else unet_params
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema=ema_init(params) if use_ema else None,
    )


@dataclasses.dataclass(frozen=True)
class LossConfig:
    snr_gamma: Optional[float] = None
    noise_offset: float = 0.0
    input_perturbation: float = 0.0
    prediction_type: Optional[str] = None  # override schedule's type


def diffusion_loss(
    unet: UNet2DConditionModel,
    schedule: DiffusionSchedule,
    params: Any,
    latents: jax.Array,  # (B, h, w, 4) already scaled by vae scaling_factor
    context: jax.Array,  # (B, 77, C)
    rng: jax.Array,
    cfg: LossConfig,
) -> jax.Array:
    """Min-SNR-weighted epsilon/v MSE (finetune_sd.py:767-815)."""
    b = latents.shape[0]
    k_noise, k_t, k_off, k_pert = jax.random.split(rng, 4)
    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    if cfg.noise_offset:
        noise = noise + cfg.noise_offset * jax.random.normal(
            k_off, (b, 1, 1, latents.shape[-1]), jnp.float32
        )
    timesteps = jax.random.randint(k_t, (b,), 0, schedule.num_train_timesteps)

    if cfg.input_perturbation:
        new_noise = noise + cfg.input_perturbation * jax.random.normal(
            k_pert, noise.shape, jnp.float32
        )
        noisy = add_noise(schedule, latents, new_noise, timesteps)
    else:
        noisy = add_noise(schedule, latents, noise, timesteps)

    pred_type = cfg.prediction_type or schedule.prediction_type
    if pred_type == "epsilon":
        target = noise
    elif pred_type == "v_prediction":
        target = get_velocity(schedule, latents, noise, timesteps)
    else:
        raise ValueError(f"Unknown prediction type {pred_type}")

    model_pred, _ = unet.apply({"params": params}, noisy, timesteps, context)

    if cfg.snr_gamma is None:
        return jnp.mean((model_pred.astype(jnp.float32) - target) ** 2)
    sched = dataclasses.replace(schedule, prediction_type=pred_type)
    w = min_snr_weights(sched, timesteps, cfg.snr_gamma)
    per_sample = jnp.mean(
        (model_pred.astype(jnp.float32) - target) ** 2, axis=(1, 2, 3)
    )
    return jnp.mean(per_sample * w)


def make_train_step(
    unet: UNet2DConditionModel,
    vae: AutoencoderKL,
    text_encoder: CLIPTextModel,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    loss_cfg: LossConfig,
    use_ema: bool = False,
    ema_decay: float = 0.9999,
    gradient_accumulation_steps: int = 1,
    resize_weights: Optional[Tuple[Any, Any]] = None,
) -> Callable:
    """Build the jit-able (state, frozen_params, batch, rng) -> (state, metrics) step.

    With ``gradient_accumulation_steps > 1`` the optimizer is an
    ``optax.MultiSteps`` wrapper: mid-accumulation micro-steps emit zero
    updates, and the EMA shadow is only advanced on real optimizer updates
    (matching diffusers' EMAModel cadence, ``finetune_sd.py:830-836``).
    """
    if isinstance(tx, FusedAdamW8bit) and gradient_accumulation_steps != 1:
        # The fused optimizer applies a full update per call; with
        # accumulation it would update at micro-batch frequency on
        # un-averaged gradients. The CLIs enforce this too, but the shared
        # step builder must not silently accept the invalid combination.
        raise ValueError(
            "FusedAdamW8bit does not support gradient accumulation "
            "(use the chained optimizer: make_optimizer(..., fused=False))"
        )

    scaling = vae.config.scaling_factor

    def step_fn(
        state: TrainState,
        vae_params: Any,
        text_params: Any,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        k_vae, k_loss = jax.random.split(rng)

        if "latent_moments" in batch:
            # Cached latent moments (train/latent_cache.py): the frozen VAE
            # encoder ran ONCE per image at cache build; the step only draws
            # the fresh reparameterized sample — bit-identical to encoding
            # here (same k_vae stream, f32 moments), minus the ~50-70 ms of
            # 512px encoder machinery per step.
            mean, logvar = jnp.split(
                batch["latent_moments"].astype(jnp.float32), 2, axis=-1
            )
        else:
            if "pixel_u8" in batch:
                # uint8 source tiles resized ON DEVICE (data/device_resize.py):
                # 80x less host->device traffic and no host-side PIL resize.
                from agenda_tpu.data.device_resize import apply_resize

                pixels = apply_resize(batch["pixel_u8"], *resize_weights)
            else:
                pixels = batch["pixel_values"]
            # Frozen encoders (finetune_sd.py:763-788).
            mean, logvar = vae.apply(vae_params, pixels, method="encode")
        latents = sample_latents(mean, logvar, k_vae) * scaling
        context, _ = text_encoder.apply(text_params, batch["input_ids"])

        def loss_fn(params):
            return diffusion_loss(unet, schedule, params, latents, context, k_loss, loss_cfg)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        fused = isinstance(tx, FusedAdamW8bit)
        fuse_ema = (fused and use_ema and state.ema is not None
                    and gradient_accumulation_steps == 1)
        if fuse_ema:
            # Single-HBM-pass fused update + EMA shadow blend in the same
            # kernel (kernels/fused_adamw.py): the new params never re-read
            # from HBM for the EMA pass.
            decay = ema_decay_at(state.ema.step, ema_decay)
            new_params, new_opt, grad_norm, new_shadow = tx.apply(
                grads, state.opt_state, state.params,
                ema=state.ema.params, ema_decay=decay,
            )
            new_ema = EMAState(params=new_shadow, step=state.ema.step + 1)
        elif fused:
            # Single-HBM-pass fused update (kernels/fused_adamw.py): the
            # whole clip+Adam+decay+apply runs as one Pallas kernel per leaf.
            new_params, new_opt, grad_norm = tx.apply(
                grads, state.opt_state, state.params
            )
        else:
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            grad_norm = optax.global_norm(grads)
        if not fuse_ema:
            new_ema = state.ema
            if use_ema and state.ema is not None:
                if gradient_accumulation_steps > 1:
                    is_update = ((state.step + 1) % gradient_accumulation_steps) == 0
                    new_ema = jax.lax.cond(
                        is_update,
                        lambda e: ema_update(e, new_params, ema_decay),
                        lambda e: e,
                        state.ema,
                    )
                else:
                    new_ema = ema_update(state.ema, new_params, ema_decay)
        new_state = TrainState(
            params=new_params, opt_state=new_opt, step=state.step + 1, ema=new_ema
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
        }
        return new_state, metrics

    return step_fn
