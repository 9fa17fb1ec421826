"""Exponential moving average over parameter pytrees.

Replaces diffusers ``EMAModel`` as used by the reference full-SD finetuner
(``data_generation/finetune_sd.py:528-537, 831-836``). On TPU the EMA tree
simply lives in HBM next to the params (no CPU offload needed for SD-1.x),
and the update is a fused elementwise pjit-friendly map.

The decay warmup follows diffusers' default: ``decay_t = min(max_decay,
(1 + t) / (10 + t))`` with ``t`` the number of EMA updates so far.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EMAState:
    params: Any  # shadow parameter pytree
    step: jax.Array  # () int32 update counter


def ema_init(params: Any) -> EMAState:
    # copy=True is load-bearing: astype(f32) on f32 params is a no-op that
    # ALIASES the source buffers, and a train state whose ema subtree aliases
    # params fails any donated step with "Attempt to donate the same buffer
    # twice" (on the axon TPU backend the same condition surfaced as an
    # opaque INVALID_ARGUMENT — the round-2 "donated+EMA bug").
    return EMAState(
        params=jax.tree.map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params),
        step=jnp.zeros((), jnp.int32),
    )


def ema_decay_at(step: jax.Array, max_decay: float = 0.9999) -> jax.Array:
    """Warmup decay schedule: min(max_decay, (1+t)/(10+t)) with t = step+1
    (diffusers EMAModel default). Shared by ``ema_update`` and the fused
    AdamW+EMA kernel path so the schedule cannot drift between them."""
    t = step.astype(jnp.float32) + 1.0
    return jnp.minimum(jnp.float32(max_decay), (1.0 + t) / (10.0 + t))


def ema_update(state: EMAState, params: Any, max_decay: float = 0.9999) -> EMAState:
    decay = ema_decay_at(state.step, max_decay)
    new_shadow = jax.tree.map(
        lambda s, p: s * decay + (1.0 - decay) * p.astype(jnp.float32),
        state.params,
        params,
    )
    return EMAState(params=new_shadow, step=state.step + 1)
