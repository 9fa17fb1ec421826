"""Optimizer + LR schedule construction.

Mirrors the reference's optimizer surface: AdamW with the same defaults
(``finetune_sd.py:319-323, 616-625``) and the diffusers ``get_scheduler``
LR-schedule family (constant / constant_with_warmup / linear / cosine /
cosine_with_restarts / polynomial — ``finetune_sd.py:651-656``).

The reference's optional bitsandbytes AdamW8bit (``finetune_sd.py:606-614``)
is accepted as a flag but maps to plain optax adamw: SD-1.x optimizer state
fits TPU HBM in f32 (see SURVEY.md §2.2, "8-bit optimizer").
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import optax


def lr_schedule(
    name: str,
    learning_rate: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: int = 1,
    power: float = 1.0,
):
    """diffusers get_scheduler semantics as an optax schedule fn (jit-safe)."""
    w, t = num_warmup_steps, num_training_steps
    lr = learning_rate

    def clip01(x):
        return jnp.clip(x, 0.0, 1.0)

    if name == "constant":
        return lambda step: jnp.full((), lr, jnp.float32)

    if name == "constant_with_warmup":
        return lambda step: lr * jnp.minimum(jnp.float32(step) / max(1, w), 1.0)

    if name == "linear":
        def fn(step):
            s = jnp.float32(step)
            warm = s / max(1, w)
            decay = (t - s) / max(1, t - w)
            return lr * clip01(jnp.where(s < w, warm, decay))
        return fn

    if name == "cosine":
        def fn(step):
            s = jnp.float32(step)
            warm = clip01(s / max(1, w))
            prog = clip01((s - w) / max(1, t - w))
            cos = 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * 0.5 * prog))
            return lr * jnp.where(s < w, warm, jnp.maximum(cos, 0.0))
        return fn

    if name == "cosine_with_restarts":
        def fn(step):
            s = jnp.float32(step)
            warm = clip01(s / max(1, w))
            prog = clip01((s - w) / max(1, t - w))
            cos = 0.5 * (1.0 + jnp.cos(math.pi * ((num_cycles * prog) % 1.0)))
            val = jnp.where(prog >= 1.0, 0.0, jnp.maximum(cos, 0.0))
            return lr * jnp.where(s < w, warm, val)
        return fn

    if name == "polynomial":
        lr_end = 1e-7
        def fn(step):
            s = jnp.float32(step)
            warm = clip01(s / max(1, w))
            prog = clip01((s - w) / max(1, t - w))
            poly = (lr - lr_end) * (1.0 - prog) ** power + lr_end
            return jnp.where(s < w, lr * warm, poly)
        return fn

    raise ValueError(f"Unknown lr_scheduler {name}")


def make_optimizer(
    learning_rate_fn,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_weight_decay: float = 1e-2,
    adam_epsilon: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    gradient_accumulation_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping (finetune_sd.py:823-824) and optional
    gradient accumulation (accelerate's accumulate(), finetune_sd.py:761)."""
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=learning_rate_fn,
            b1=adam_beta1,
            b2=adam_beta2,
            eps=adam_epsilon,
            weight_decay=adam_weight_decay,
        )
    )
    tx = optax.chain(*chain)
    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx
