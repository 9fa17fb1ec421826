"""Jitted ResNet-50 binary-classifier training for label refinement.

The train/evaluate/test loops of ``refine_label.py:189-235`` as compiled
batch steps: BCE-with-logits on 1-logit outputs, Adam, BatchNorm state
threaded functionally. Batches pad to a static size so one compiled step
serves every batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from agenda_tpu.models.resnet import ResNet50, normalize_imagenet


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ClassifierState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def default_compute_dtype() -> jnp.dtype:
    """bf16 compute on TPU (params/opt state stay f32; logits upcast before
    the BCE) — measured 101 -> ~2-3x faster ResNet-50 step at the refine
    geometry where f32 runs at poor MXU fill. AGENDA_TPU_CLASSIFIER_BF16=0
    opts out; CPU keeps f32 (no MXU to feed, and the suite's goldens are
    f32-calibrated)."""
    import os

    from agenda_tpu.kernels._backend import on_tpu

    if os.environ.get("AGENDA_TPU_CLASSIFIER_BF16", "1") != "1":
        return jnp.float32
    return jnp.bfloat16 if on_tpu() else jnp.float32


def init_classifier(rng: jax.Array, tx: optax.GradientTransformation,
                    num_classes: int = 1, image_size: int = 224,
                    dtype: jnp.dtype = None) -> Tuple[ResNet50, ClassifierState]:
    if dtype is None:
        dtype = default_compute_dtype()
    model = ResNet50(num_classes=num_classes, dtype=dtype)
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)), train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    return model, ClassifierState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_classifier_train_step(model: ResNet50, tx: optax.GradientTransformation):
    def step(state: ClassifierState, images: jax.Array, labels: jax.Array,
             mask: jax.Array) -> Tuple[ClassifierState, jax.Array]:
        """images (B,H,W,3) in [0,1]; labels (B,) {0,1}; mask (B,) for padding."""
        x = normalize_imagenet(images)

        def loss_fn(params):
            logits, new_model_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            logits = logits[:, 0].astype(jnp.float32)  # BCE in f32 always
            per = optax.sigmoid_binary_cross_entropy(logits, labels.astype(jnp.float32))
            loss = jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            return loss, new_model_state["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            ClassifierState(new_params, new_bs, new_opt, state.step + 1),
            loss,
        )

    return jax.jit(step)


def make_classifier_predict(model: ResNet50):
    def predict(state: ClassifierState, images: jax.Array) -> jax.Array:
        x = normalize_imagenet(images)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x, train=False
        )
        return logits[:, 0] > 0  # refine_label.py:216, 232 (logit > 0)

    return jax.jit(predict)


def batches_padded(arr: np.ndarray, labels: np.ndarray, batch_size: int,
                   shuffle: bool, rng: np.random.Generator) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (images, labels, mask, idx) batches padded to batch_size."""
    n = len(arr)
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    for i in range(0, n, batch_size):
        b = idx[i : i + batch_size]
        pad = batch_size - len(b)
        mask = np.concatenate([np.ones(len(b), np.float32), np.zeros(pad, np.float32)])
        bb = np.concatenate([b, np.zeros(pad, np.int64)]) if pad else b
        yield arr[bb], labels[bb], mask, bb
