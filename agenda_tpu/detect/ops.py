"""Shared detection ops in JAX: IoU, NMS, box codecs, anchors, RoIAlign.

These replace the mmcv CUDA ops the reference's detector stack leans on
(NMS / RoIAlign / box coders — SURVEY.md §2.1 "Native dep to replace").
Everything is static-shape and jit/vmap-friendly:

- ``nms``: O(N^2) mask-based suppression via a fixed-length ``fori_loop`` —
  the XLA-friendly formulation (no data-dependent shapes; suppressed boxes
  get score -inf and padded slots index 0). N is a few hundred to a few
  thousand here (128x128 aerial tiles), so the quadratic IoU matrix is tiny
  and lives comfortably in VMEM.
- ``roi_align``: bilinear sampling with ``sampling_ratio=2`` x ``out x out``
  grid points per RoI, gathered with static shapes (torchvision-aligned
  continuous coordinates, aligned=True halves-offset convention of mmdet).
- ``encode/decode_deltas``: the (dx, dy, dw, dh) parametrization used by
  Faster-RCNN heads, with mmdet's default means/stds and wh clamping.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N,4) x (M,4) xyxy -> (N,M) IoU."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * jnp.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(b[:, 3] - b[:, 1], 0, None)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms(
    boxes: jax.Array,  # (N, 4) xyxy
    scores: jax.Array,  # (N,)
    iou_threshold: float = 0.5,
    max_outputs: Optional[int] = None,
    score_threshold: float = -jnp.inf,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS with static shapes.

    Returns (keep_indices (K,), keep_valid (K,) bool) where K = max_outputs
    (defaults to N). Invalid slots point at index 0 with valid=False.
    """
    n = boxes.shape[0]
    k = max_outputs or n
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    iou = box_iou(boxes_s, boxes_s)

    alive0 = scores_s > score_threshold

    def body(i, alive):
        # If box i is alive, kill every lower-ranked box overlapping it.
        kill = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & alive[i]
        return alive & ~kill

    alive = jax.lax.fori_loop(0, n, body, alive0)

    # Top-k alive, in score order.
    rank_scores = jnp.where(alive, scores_s, -jnp.inf)
    top = jnp.argsort(-rank_scores)[:k]
    keep_valid = rank_scores[top] > -jnp.inf
    keep_idx = jnp.where(keep_valid, order[top], 0)
    return keep_idx, keep_valid


def batched_nms(
    boxes: jax.Array, scores: jax.Array, labels: jax.Array,
    iou_threshold: float, max_outputs: int,
    score_threshold: float = -jnp.inf,
) -> Tuple[jax.Array, jax.Array]:
    """Per-class NMS via the coordinate-offset trick (torchvision batched_nms)."""
    offset = labels.astype(boxes.dtype)[:, None] * (jnp.max(boxes) + 1.0)
    return nms(boxes + offset, scores, iou_threshold, max_outputs, score_threshold)


# ---------------------------------------------------------------------------
# Box codecs (mmdet DeltaXYWHBBoxCoder semantics)
# ---------------------------------------------------------------------------


def encode_deltas(
    anchors: jax.Array, gt: jax.Array,
    means=(0.0, 0.0, 0.0, 0.0), stds=(1.0, 1.0, 1.0, 1.0),
) -> jax.Array:
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    # Clamp to keep padded/degenerate boxes from producing inf/NaN that would
    # survive a downstream 0-weight mask (0 * inf = NaN).
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-4)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-4)
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-4)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-4)
    d = jnp.stack(
        [(gx - ax) / aw, (gy - ay) / ah, jnp.log(gw / aw), jnp.log(gh / ah)], axis=-1
    )
    means = jnp.asarray(means)
    stds = jnp.asarray(stds)
    return (d - means) / stds


def decode_deltas(
    anchors: jax.Array, deltas: jax.Array,
    means=(0.0, 0.0, 0.0, 0.0), stds=(1.0, 1.0, 1.0, 1.0),
    max_shape: Optional[Tuple[int, int]] = None,
    wh_ratio_clip: float = 16 / 1000,
) -> jax.Array:
    means = jnp.asarray(means)
    stds = jnp.asarray(stds)
    d = deltas * stds + means
    max_ratio = abs(math.log(wh_ratio_clip))
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    out = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    if max_shape is not None:
        hmax, wmax = max_shape
        out = jnp.stack(
            [
                jnp.clip(out[..., 0], 0, wmax),
                jnp.clip(out[..., 1], 0, hmax),
                jnp.clip(out[..., 2], 0, wmax),
                jnp.clip(out[..., 3], 0, hmax),
            ],
            axis=-1,
        )
    return out


# ---------------------------------------------------------------------------
# Anchors
# ---------------------------------------------------------------------------


def grid_anchors(
    feat_size: Tuple[int, int],
    stride: int,
    scales: Sequence[float],
    ratios: Sequence[float],
    center_offset: float = 0.0,
    base_size: Optional[float] = None,
) -> np.ndarray:
    """mmdet AnchorGenerator: (H*W*A, 4) xyxy anchors, row-major y,x grid."""
    base = base_size if base_size is not None else stride
    ws, hs = [], []
    for r in ratios:
        for s in scales:
            h_ratio = math.sqrt(r)
            w_ratio = 1.0 / h_ratio
            ws.append(base * s * w_ratio)
            hs.append(base * s * h_ratio)
    ws = np.asarray(ws)
    hs = np.asarray(hs)
    cx = center_offset * stride
    cy = center_offset * stride
    base_anchors = np.stack(
        [cx - 0.5 * ws, cy - 0.5 * hs, cx + 0.5 * ws, cy + 0.5 * hs], axis=1
    )
    fh, fw = feat_size
    shift_x = np.arange(fw) * stride
    shift_y = np.arange(fh) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    out = (shifts[:, None, :] + base_anchors[None, :, :]).reshape(-1, 4)
    return out.astype(np.float32)


def anchor_points(feat_sizes: Sequence[Tuple[int, int]], strides: Sequence[int],
                  offset: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """Anchor-free center points: (sum(HW), 2) xy + (sum(HW),) strides."""
    pts, strs = [], []
    for (fh, fw), s in zip(feat_sizes, strides):
        xs = (np.arange(fw) + offset) * s
        ys = (np.arange(fh) + offset) * s
        gx, gy = np.meshgrid(xs, ys)
        pts.append(np.stack([gx.ravel(), gy.ravel()], axis=1))
        strs.append(np.full(fh * fw, s))
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(strs).astype(np.float32))


# ---------------------------------------------------------------------------
# RoIAlign
# ---------------------------------------------------------------------------


def roi_align(
    features: jax.Array,  # (H, W, C) one level, one image
    rois: jax.Array,  # (R, 4) xyxy in feature-map *input-image* coords / stride applied by caller
    out_size: int = 7,
    sampling_ratio: int = 2,
) -> jax.Array:
    """RoIAlign (aligned=True): bilinear-sample a grid per RoI. Returns (R, out, out, C).

    The caller pre-divides roi coords by the level stride.
    """
    h, w, c = features.shape
    r = rois.shape[0]

    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    roi_w = jnp.clip(x2 - x1, 1e-3, None)
    roi_h = jnp.clip(y2 - y1, 1e-3, None)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    s = sampling_ratio
    # Sample point offsets within each bin: ((i + (j+0.5)/s) * bin) for j in [0,s)
    grid = (jnp.arange(out_size)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    # x coords: (R, out*s)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None] - 0.5
    ys = y1[:, None] + grid[None, :] * bin_h[:, None] - 0.5

    def bilinear(img, yy, xx):
        # img (H, W, C); yy/xx (P,) -> (P, C)
        y0 = jnp.clip(jnp.floor(yy), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xx), 0, w - 1)
        y1i = jnp.clip(y0 + 1, 0, h - 1)
        x1i = jnp.clip(x0 + 1, 0, w - 1)
        wy = jnp.clip(yy - y0, 0.0, 1.0)
        wx = jnp.clip(xx - x0, 0.0, 1.0)
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)
        y1i = y1i.astype(jnp.int32)
        x1i = x1i.astype(jnp.int32)
        v00 = img[y0, x0]
        v01 = img[y0, x1i]
        v10 = img[y1i, x0]
        v11 = img[y1i, x1i]
        return (
            v00 * ((1 - wy) * (1 - wx))[:, None]
            + v01 * ((1 - wy) * wx)[:, None]
            + v10 * (wy * (1 - wx))[:, None]
            + v11 * (wy * wx)[:, None]
        )

    def per_roi(xsr, ysr):
        # all (out*s)^2 sample points
        yy = jnp.repeat(ysr, out_size * s)
        xx = jnp.tile(xsr, out_size * s)
        vals = bilinear(features, yy, xx)  # (P, C)
        vals = vals.reshape(out_size, s, out_size, s, c)
        return vals.mean(axis=(1, 3))

    return jax.vmap(per_roi)(xs, ys)
