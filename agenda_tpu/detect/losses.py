"""Detection losses: focal/BCE, smooth-L1, IoU-family (GIoU/CIoU/DIoU), DFL.

Replaces the mmdet loss zoo used by the reference's detector configs
(CrossEntropyLoss/L1 for Faster-RCNN, CIoU + BCE for YOLOv5/v8, DFL for
YOLOv8 — ``data_annotation/configs/Real_Source/*.py``). All functions are
elementwise/jit-friendly and take explicit weight masks so static-shape
padded targets work.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jax.Array, targets: jax.Array, alpha: float = 0.25, gamma: float = 2.0
) -> jax.Array:
    """Per-element focal loss (RetinaNet form)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def _box_wh(b):
    return jnp.clip(b[..., 2] - b[..., 0], 0, None), jnp.clip(b[..., 3] - b[..., 1], 0, None)


def pairwise_iou_terms(pred: jax.Array, target: jax.Array):
    """Elementwise (aligned) IoU pieces for boxes (..., 4) xyxy."""
    pw, ph = _box_wh(pred)
    tw, th = _box_wh(target)
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = pw * ph + tw * th - inter + 1e-7
    iou = inter / union
    return iou, union


def ciou(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Complete IoU (elementwise, aligned boxes)."""
    iou, _ = pairwise_iou_terms(pred, target)
    # enclosing box diagonal
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    cwh = jnp.clip(rb - lt, 0, None)
    c2 = cwh[..., 0] ** 2 + cwh[..., 1] ** 2 + 1e-7
    # center distance
    pc = (pred[..., :2] + pred[..., 2:]) / 2
    tc = (target[..., :2] + target[..., 2:]) / 2
    rho2 = jnp.sum((pc - tc) ** 2, axis=-1)
    # aspect term
    pw, ph = _box_wh(pred)
    tw, th = _box_wh(target)
    v = (4 / math.pi**2) * (
        jnp.arctan(tw / (th + 1e-7)) - jnp.arctan(pw / (ph + 1e-7))
    ) ** 2
    alpha = v / (1 - iou + v + 1e-7)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def giou(pred: jax.Array, target: jax.Array) -> jax.Array:
    iou, union = pairwise_iou_terms(pred, target)
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    cwh = jnp.clip(rb - lt, 0, None)
    area_c = cwh[..., 0] * cwh[..., 1] + 1e-7
    return iou - (area_c - union) / area_c


def dfl_loss(pred_dist: jax.Array, target: jax.Array, reg_max: int) -> jax.Array:
    """Distribution focal loss over (..., reg_max+1) bin logits; target in
    [0, reg_max] continuous (YOLOv8 box regression)."""
    tl = jnp.clip(jnp.floor(target), 0, reg_max - 1)
    tr = tl + 1
    wl = tr - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    # bin picks as one-hot reductions over the small last axis (vectorized
    # multiply-reduce; take_along_axis lowers to scalar-unit gathers on TPU,
    # measured 2 x 10 ms/step at bs 512)
    bins = jnp.arange(pred_dist.shape[-1], dtype=pred_dist.dtype)
    ll = jnp.sum(jnp.where(bins == tl[..., None], logp, 0.0), axis=-1)
    lr = jnp.sum(jnp.where(bins == tr[..., None], logp, 0.0), axis=-1)
    return -(ll * wl + lr * wr)
