"""Minimal AutoencoderKL pretraining (recon + KL) for from-scratch domains.

The reference never trains its VAE — SD-1.4's pretrained autoencoder arrives
from the hub (``data_generation/finetune_sd.py:497-503``) and stays frozen.
This zero-egress framework needs the same *capability* from scratch for any
procedural domain (notably the generation-half quality gate, which trains a
tiny SD end-to-end on procedural aerial imagery): a latent space whose
decode(encode(x)) faithfully reconstructs the domain, with a measured
``scaling_factor`` so diffusion sees ~unit-variance latents — the role SD's
magic 0.18215 plays (``vae.config.scaling_factor``).

Pure pjit-able train step: recon MSE + KL against N(0, 1). The KL weight is
small (SD's own KL is famously weak: latents carry structure, the prior term
only bounds the scale); the returned ``scaling_factor`` is measured from the
post-training latent standard deviation rather than assumed.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from agenda_tpu.models import AutoencoderKL


def make_vae_pretrain_step(vae: AutoencoderKL, tx: optax.GradientTransformation,
                           kl_weight: float):
    """(params, opt_state, pixels[-1,1], rng) -> (params, opt_state, metrics)."""

    def loss_fn(params, pixels, rng):
        recon, mean, logvar = vae.apply(params, pixels, rng)
        recon_loss = jnp.mean((recon - pixels) ** 2)
        kl = -0.5 * jnp.mean(1.0 + logvar - mean**2 - jnp.exp(logvar))
        return recon_loss + kl_weight * kl, (recon_loss, kl)

    @jax.jit
    def step(params, opt_state, pixels, rng):
        (_, (recon_loss, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, pixels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"recon": recon_loss, "kl": kl}

    return step


def pretrain_vae(
    vae: AutoencoderKL,
    params: Any,
    images_u8: np.ndarray,  # (N, H, W, 3) uint8
    *,
    steps: int = 400,
    batch_size: int = 8,
    lr: float = 2e-3,
    kl_weight: float = 1e-4,
    seed: int = 0,
    log_fn=None,
) -> Tuple[Any, float, float]:
    """Train; returns (params, measured scaling_factor, final recon MSE).

    ``scaling_factor`` = 1 / std(sampled latents over the train set), the
    measured analogue of SD-1.x's 0.18215 — diffusion then trains on
    ~unit-variance ``latents * scaling_factor`` (train/finetune_sd.py:178).
    """
    pixels_all = images_u8.astype(np.float32) / 127.5 - 1.0
    n = len(pixels_all)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step = make_vae_pretrain_step(vae, tx, kl_weight)
    rng = np.random.RandomState(seed)
    metrics = {}
    for i in range(steps):
        idx = rng.randint(0, n, batch_size)
        batch = jnp.asarray(pixels_all[idx])
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.key(seed * 100_003 + i))
        if log_fn and (i + 1) % 100 == 0:
            m = jax.device_get(metrics)
            log_fn(f"vae pretrain step {i + 1}/{steps}: "
                   f"recon {float(m['recon']):.5f} kl {float(m['kl']):.3f}")

    # measure the latent scale over (a sample of) the train set
    encode = jax.jit(functools.partial(vae.apply, method="encode"))
    samples = []
    for start in range(0, min(n, 64), batch_size):
        mean, logvar = encode(params, jnp.asarray(
            pixels_all[start:start + batch_size]))
        k = jax.random.key(start)
        samples.append(np.asarray(
            mean + jnp.exp(0.5 * logvar)
            * jax.random.normal(k, mean.shape, mean.dtype)))
    std = float(np.concatenate(samples).std())
    recon_mse = float(jax.device_get(metrics["recon"])) if metrics else float("nan")
    return params, 1.0 / max(std, 1e-6), recon_mse
