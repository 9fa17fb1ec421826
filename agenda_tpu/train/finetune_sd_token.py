"""Token + UNet fine-tuning with cross-attention regularization (stage 1/2).

Functional equivalent of the reference's AttnDreamBooth-style trainer
(``data_generation/finetune_sd_token.py``), TPU-first:

- the learnable token embeddings are a (K, C) parameter spliced into the
  batch token embeddings with a vectorized positional mask
  (``splice_token_embeddings`` == the python double loop at 1002-1010);
- the cross-attention regularization loss consumes the UNet's fused heatmap
  side outputs (models/unet.py ``collect_attn``) instead of Python hooks:
  per layer, the fg-token map is pulled (L1) toward the normalized object
  map and the bg-token map toward its inverse (1039-1069), with the same
  /n_valid_samples and /n_layers factors;
- parameter selection (token only / +unet / +cross-attn-only,
  ``--train_token --train_unet --train_cross_attn``) is a pytree split, so
  frozen weights never enter the optimizer;
- grad clipping applies to the UNet subtree only when training tokens,
  matching the quirky reference behavior at 1090-1092.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from agenda_tpu.core.schedules import DiffusionSchedule, add_noise, get_velocity, min_snr_weights
from agenda_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DConditionModel
from agenda_tpu.models.vae import sample_latents
from agenda_tpu.train.optim import FusedAdamW8bit


# ---------------------------------------------------------------------------
# Token embedding splice
# ---------------------------------------------------------------------------


def splice_token_embeddings(
    base_embeds: jax.Array,  # (B, S, C) token-embedding lookups
    starts: jax.Array,  # (B, K) int32 positions, -1/-0 = absent
    training_embedding: jax.Array,  # (K, C)
    n_object_embedding: int = 1,
) -> jax.Array:
    """Write training_embedding[k] at positions [starts[:,k], +n) where starts>0.

    Reference: finetune_sd_token.py:1002-1010 (same >0 guard, same broadcast
    of one row over n_object_embedding positions).
    """
    b, s, c = base_embeds.shape
    k = starts.shape[1]
    pos = jnp.arange(s)[None, :]
    out = base_embeds
    for j in range(k):
        sj = starts[:, j : j + 1]  # (B, 1)
        mask = (pos >= sj) & (pos < sj + n_object_embedding) & (sj > 0)
        out = jnp.where(mask[..., None], training_embedding[j][None, None, :].astype(out.dtype), out)
    return out


# ---------------------------------------------------------------------------
# Cross-attention regularization loss
# ---------------------------------------------------------------------------


def _minmax_sum_norm(m: jax.Array) -> jax.Array:
    """(B, h, w) -> min-max to [0,1] then normalize to sum 1 (per sample)."""
    mn = jnp.min(m, axis=(1, 2), keepdims=True)
    mx = jnp.max(m, axis=(1, 2), keepdims=True)
    n = (m - mn) / (mx - mn + 1e-8)
    return n / jnp.sum(n, axis=(1, 2), keepdims=True)


def _take_token(maps: jax.Array, idx: jax.Array) -> jax.Array:
    """maps (B, T, h, w), idx (B,) -> (B, h, w)."""
    return jnp.take_along_axis(maps, idx[:, None, None, None], axis=1)[:, 0]


def attn_reg_loss(
    maps: List[jax.Array],  # per-layer (B, T, h, w) head-mean cross-attn probs
    starts: jax.Array,  # (B, K)
    n_object_embedding: int,
    reg_weight: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (attn_loss, fg_loss, bg_loss), reference math 1039-1069.

    fg token = starts[:,0]; object word = starts[:,0]+n_object_embedding;
    bg token = last valid start. Samples without the object (starts[:,0]<=0)
    contribute nothing; the per-sample terms divide by the number of valid
    samples, the total by the number of layers.
    """
    t = maps[0].shape[1]
    valid = starts[:, 0] > 0  # (B,)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

    fg_idx = jnp.clip(starts[:, 0], 0, t - 1)
    obj_idx = jnp.clip(starts[:, 0] + n_object_embedding, 0, t - 1)
    # last index j with starts[:, j] > -1
    is_valid = (starts > -1).astype(jnp.int32)  # (B, K)
    k = starts.shape[1]
    rev_arg = jnp.argmax(is_valid[:, ::-1], axis=1)
    bg_col = k - 1 - rev_arg
    bg_idx = jnp.clip(jnp.take_along_axis(starts, bg_col[:, None], axis=1)[:, 0], 0, t - 1)

    fg_total = jnp.float32(0.0)
    bg_total = jnp.float32(0.0)
    for m in maps:
        m = m.astype(jnp.float32)
        obj = _take_token(m, obj_idx)
        mn = jnp.min(obj, axis=(1, 2), keepdims=True)
        mx = jnp.max(obj, axis=(1, 2), keepdims=True)
        norm_obj = (obj - mn) / (mx - mn + 1e-8)
        bg_ref = 1.0 - norm_obj
        bg_ref = bg_ref / jnp.sum(bg_ref, axis=(1, 2), keepdims=True)
        norm_obj = norm_obj / jnp.sum(norm_obj, axis=(1, 2), keepdims=True)

        fg = _minmax_sum_norm(_take_token(m, fg_idx))
        bg = _minmax_sum_norm(_take_token(m, bg_idx))

        fg_term = jnp.mean(jnp.abs(norm_obj - fg), axis=(1, 2))  # (B,)
        bg_term = jnp.mean(jnp.abs(bg_ref - bg), axis=(1, 2))
        w = valid.astype(jnp.float32)
        fg_total = fg_total + reg_weight * jnp.sum(fg_term * w) / n_valid
        bg_total = bg_total + reg_weight * jnp.sum(bg_term * w) / n_valid

    n_layers = jnp.float32(len(maps))
    attn = (fg_total + bg_total) / n_layers
    return attn, fg_total / n_layers, bg_total / n_layers


# ---------------------------------------------------------------------------
# Parameter partitioning
# ---------------------------------------------------------------------------


def split_unet_params(
    unet_params: Dict[str, Any],
    train_unet: bool,
    train_cross_attn: bool,
) -> Tuple[Dict, Dict]:
    """(trainable, frozen) split of the UNet param tree.

    train_cross_attn trains only attn2.* (unfreeze_model(unet, ['attn2']),
    finetune_sd_token.py:738-739).
    """
    params = unet_params["params"] if "params" in unet_params else unet_params
    flat = traverse_util.flatten_dict(params)
    if train_unet:
        return params, {}
    if train_cross_attn:
        train = {k: v for k, v in flat.items() if any("attn2" in p for p in k)}
        frozen = {k: v for k, v in flat.items() if not any("attn2" in p for p in k)}
        return (
            traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frozen),
        )
    return {}, params


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TokenTrainState:
    embedding: Optional[jax.Array]  # (K, C) or None
    unet_trainable: Dict
    unet_frozen: Dict
    opt_state: Any
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class TokenLossConfig:
    snr_gamma: Optional[float] = None
    offset_noise: bool = False
    with_cross_attn_reg: bool = False
    reg_weight: float = 1.0
    n_object_embedding: int = 1
    train_token: bool = False
    max_grad_norm: Optional[float] = 1.0


def init_token_train_state(
    unet_params: Dict,
    tx: optax.GradientTransformation,
    train_token: bool,
    train_unet: bool,
    train_cross_attn: bool,
    n_tokens: int,
    hidden_size: int,
    rng: jax.Array,
    init_embedding: Optional[jax.Array] = None,
) -> TokenTrainState:
    trainable, frozen = split_unet_params(unet_params, train_unet, train_cross_attn)
    trainable = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), trainable)
    if train_token:
        if init_embedding is not None:
            emb = jnp.asarray(init_embedding, jnp.float32)
        else:
            # Random init std 0.02 (finetune_sd_token.py:667-669 — the mean
            # init-word embeds only fix the shape there too).
            emb = 0.02 * jax.random.normal(rng, (n_tokens, hidden_size), jnp.float32)
    else:
        emb = None
    opt_params = {"embedding": emb, "unet": trainable}
    return TokenTrainState(
        embedding=emb,
        unet_trainable=trainable,
        unet_frozen=frozen,
        opt_state=tx.init(opt_params),
        step=jnp.zeros((), jnp.int32),
    )


def make_token_train_step(
    unet: UNet2DConditionModel,
    vae: AutoencoderKL,
    text_encoder: CLIPTextModel,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    cfg: TokenLossConfig,
    resize_weights=None,
) -> Callable:
    scaling = vae.config.scaling_factor

    def step_fn(
        state: TokenTrainState,
        vae_params: Any,
        text_params: Any,
        batch: Dict[str, jax.Array],  # pixel_values, input_ids, new_tokens_start
        rng: jax.Array,
    ) -> Tuple[TokenTrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        k_vae, k_noise, k_t, k_off = jax.random.split(rng, 4)

        if "latent_moments" in batch:
            # Cached latent moments (train/latent_cache.py): bit-identical to
            # encoding here — the data transform is deterministic, only the
            # reparameterized sample must stay fresh per step.
            mean, logvar = jnp.split(
                batch["latent_moments"].astype(jnp.float32), 2, axis=-1
            )
        else:
            if "pixel_u8" in batch:
                # uint8 source tiles resized ON DEVICE (data/device_resize.py)
                from agenda_tpu.data.device_resize import apply_resize

                pixels = apply_resize(batch["pixel_u8"], *resize_weights)
            else:
                pixels = batch["pixel_values"]
            mean, logvar = vae.apply(vae_params, pixels, method="encode")
        latents = sample_latents(mean, logvar, k_vae) * scaling
        b = latents.shape[0]

        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        if cfg.offset_noise:
            noise = noise + 0.1 * jax.random.normal(k_off, (b, 1, 1, latents.shape[-1]), jnp.float32)
        timesteps = jax.random.randint(k_t, (b,), 0, schedule.num_train_timesteps)
        noisy = add_noise(schedule, latents, noise, timesteps)

        if schedule.prediction_type == "epsilon":
            target = noise
        elif schedule.prediction_type == "v_prediction":
            target = get_velocity(schedule, latents, noise, timesteps)
        else:
            raise ValueError(schedule.prediction_type)

        token_table = text_params["params"]["token_embedding"]

        def loss_fn(opt_params):
            emb = opt_params["embedding"]
            unet_params = {"params": merge_params(opt_params["unet"], state.unet_frozen)}

            if cfg.train_token:
                base = jnp.take(token_table, batch["input_ids"], axis=0)
                spliced = splice_token_embeddings(
                    base, batch["new_tokens_start"], emb, cfg.n_object_embedding
                )
                context, _ = text_encoder.apply(
                    text_params, batch["input_ids"], inputs_embeds=spliced
                )
            else:
                context, _ = text_encoder.apply(text_params, batch["input_ids"])

            model_pred, maps = unet.apply(
                unet_params, noisy, timesteps, context,
                collect_attn=cfg.with_cross_attn_reg,
            )

            if cfg.snr_gamma is None:
                mse = jnp.mean((model_pred.astype(jnp.float32) - target) ** 2)
            else:
                w = min_snr_weights(schedule, timesteps, cfg.snr_gamma)
                per = jnp.mean((model_pred.astype(jnp.float32) - target) ** 2, axis=(1, 2, 3))
                mse = jnp.mean(per * w)

            if cfg.with_cross_attn_reg:
                attn, fg, bg = attn_reg_loss(
                    maps, batch["new_tokens_start"], cfg.n_object_embedding, cfg.reg_weight
                )
            else:
                attn = fg = bg = jnp.float32(0.0)
            return mse + attn, (mse, attn, fg, bg)

        opt_params = {"embedding": state.embedding, "unet": state.unet_trainable}
        (loss, (mse, attn, fg, bg)), grads = jax.value_and_grad(loss_fn, has_aux=True)(opt_params)

        # Reference: clip only UNet grads, only when training tokens (1090-1092).
        if cfg.train_token and cfg.max_grad_norm is not None:
            gn = optax.global_norm(grads["unet"])
            scale = jnp.minimum(1.0, cfg.max_grad_norm / (gn + 1e-6))
            grads = {"embedding": grads["embedding"],
                     "unet": jax.tree.map(lambda g: g * scale, grads["unet"])}

        if isinstance(tx, FusedAdamW8bit):
            # Single-pass fused int8 AdamW (kernels/fused_adamw.py); the
            # conditional UNet-only clip above already ran, so the fused
            # optimizer is built with max_grad_norm=None.
            new_params, new_opt, _ = tx.apply(grads, state.opt_state, opt_params)
        else:
            updates, new_opt = tx.update(grads, state.opt_state, opt_params)
            new_params = optax.apply_updates(opt_params, updates)

        new_state = TokenTrainState(
            embedding=new_params["embedding"],
            unet_trainable=new_params["unet"],
            unet_frozen=state.unet_frozen,
            opt_state=new_opt,
            step=state.step + 1,
        )
        metrics = {"loss": loss, "mse": mse, "attn_loss": attn, "fg_loss": fg, "bg_loss": bg}
        return new_state, metrics

    return step_fn
