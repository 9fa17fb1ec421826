"""Target assigners with static shapes (padded GT arrays).

- ``max_iou_assign``: mmdet MaxIoUAssigner semantics for RPN / RCNN heads —
  background below ``neg_thr``, foreground above ``pos_thr``, plus the
  "each GT grabs its best anchor" rescue (min_pos_iou).
- ``random_sample``: mmdet RandomSampler — fixed-size pos/neg sample with a
  target positive fraction, implemented as randomized top-k so shapes stay
  static under jit.
- ``task_aligned_assign``: YOLOv8's TAL — per-GT top-k candidates by the
  alignment metric s^alpha * iou^beta among points inside the GT box.

GT boxes arrive padded to a fixed ``max_gt`` with a validity mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from agenda_tpu.detect.ops import box_iou


def max_iou_assign(
    anchors: jax.Array,  # (N, 4)
    gt_boxes: jax.Array,  # (G, 4) padded
    gt_valid: jax.Array,  # (G,) bool
    pos_thr: float,
    neg_thr: float,
    min_pos_iou: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (assigned_gt (N,) int32 [-1 = ignore-free bg, >=0 gt index],
    labels (N,) int32 {0 bg, 1 fg, -1 between-thresholds ignore})."""
    iou = box_iou(anchors, gt_boxes)  # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)

    labels = jnp.full(anchors.shape[0], -1, jnp.int32)
    labels = jnp.where(best_iou < neg_thr, 0, labels)
    labels = jnp.where(best_iou >= pos_thr, 1, labels)

    # GT rescue: for each valid gt, its argmax anchor becomes fg if IoU >= min_pos_iou.
    gt_best_iou = jnp.max(iou, axis=0)  # (G,)
    gt_best_anchor = jnp.argmax(iou, axis=0)
    rescue = gt_valid & (gt_best_iou >= min_pos_iou)
    n = anchors.shape[0]
    rescue_mask = jnp.zeros(n, bool)
    rescue_gt = jnp.full(n, -1, jnp.int32)

    def body(g, carry):
        rm, rg = carry
        a = gt_best_anchor[g]
        do = rescue[g]
        rm = rm.at[a].set(jnp.where(do, True, rm[a]))
        rg = rg.at[a].set(jnp.where(do, g, rg[a]))
        return rm, rg

    rescue_mask, rescue_gt = jax.lax.fori_loop(
        0, gt_boxes.shape[0], body, (rescue_mask, rescue_gt)
    )
    labels = jnp.where(rescue_mask, 1, labels)
    assigned = jnp.where(rescue_mask, rescue_gt, best_gt)
    assigned = jnp.where(labels == 1, assigned, -1)
    return assigned, labels


def random_sample(
    labels: jax.Array,  # (N,) {0,1,-1}
    rng: jax.Array,
    num: int,
    pos_fraction: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sample up to num anchors with ~pos_fraction positives.

    Returns (indices (num,), is_pos (num,), valid (num,)). Static shapes:
    if fewer positives exist than the quota, negatives fill the remainder
    (mmdet RandomSampler behavior).
    """
    n = labels.shape[0]
    k_pos, k_neg = jax.random.split(rng)
    pos_quota = int(num * pos_fraction)

    pos_mask = labels == 1
    neg_mask = labels == 0
    n_pos_avail = jnp.sum(pos_mask)

    # Randomized priority: positives first (random order), take top pos_quota.
    pos_rank = jnp.where(pos_mask, jax.random.uniform(k_pos, (n,)), -1.0)
    pos_take = jnp.argsort(-pos_rank)[:pos_quota]
    pos_take_valid = pos_rank[pos_take] >= 0

    del n_pos_avail
    neg_rank = jnp.where(neg_mask, jax.random.uniform(k_neg, (n,)), -1.0)
    neg_take = jnp.argsort(-neg_rank)[:num]  # enough candidates for backfill
    fill_neg = num - pos_quota
    # Unfilled positive-quota slots backfill with extra negatives (mmdet
    # RandomSampler: negatives top up to num when positives are scarce).
    extra_negs = neg_take[fill_neg : fill_neg + pos_quota]
    idx = jnp.concatenate([
        jnp.where(pos_take_valid, pos_take, extra_negs),
        neg_take[:fill_neg],
    ])
    is_pos = jnp.concatenate([pos_take_valid, jnp.zeros(fill_neg, bool)])
    valid = jnp.concatenate([
        pos_take_valid | (neg_rank[extra_negs] >= 0),
        neg_rank[neg_take[:fill_neg]] >= 0,
    ])
    return idx, is_pos, valid


def task_aligned_assign(
    scores: jax.Array,  # (N, C) predicted class probs (sigmoid)
    pred_boxes: jax.Array,  # (N, 4) decoded xyxy
    points: jax.Array,  # (N, 2) anchor centers
    gt_boxes: jax.Array,  # (G, 4) padded
    gt_labels: jax.Array,  # (G,) int32
    gt_valid: jax.Array,  # (G,) bool
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """TAL. Returns (fg_mask (N,), assigned_gt (N,), target_scores (N,),
    assigned_labels (N,))."""
    n = points.shape[0]
    g = gt_boxes.shape[0]

    # Candidates: points inside the gt box.
    inside = (
        (points[:, None, 0] >= gt_boxes[None, :, 0])
        & (points[:, None, 0] <= gt_boxes[None, :, 2])
        & (points[:, None, 1] >= gt_boxes[None, :, 1])
        & (points[:, None, 1] <= gt_boxes[None, :, 3])
        & gt_valid[None, :]
    )  # (N, G)

    iou = box_iou(pred_boxes, gt_boxes)  # (N, G)
    # score of each gt's class at each point, as a one-hot matmul: an (N, G)
    # take_along_axis gather measured 112 ms/step at bs 512 on v5e (TPU
    # gathers run on the scalar unit); the matmul runs on the MXU.
    label_onehot = jax.nn.one_hot(gt_labels, scores.shape[1], dtype=scores.dtype)
    cls_score = scores @ label_onehot.T  # (N, G)
    metric = (cls_score**alpha) * (iou**beta)
    metric = jnp.where(inside, metric, 0.0)

    # Per-GT top-k candidates by metric (only where the metric is positive).
    topk_val, topk_idx = jax.lax.top_k(metric.T, topk)  # (G, k)
    gidx = jnp.broadcast_to(jnp.arange(g)[:, None], (g, topk))
    cand = jnp.zeros((n, g), bool)
    cand = cand.at[topk_idx.reshape(-1), gidx.reshape(-1)].set(
        (topk_val > 0).reshape(-1)
    )
    cand = cand & inside

    # A point claimed by multiple GTs goes to the one with highest IoU.
    claimed = jnp.sum(cand, axis=1)
    best_gt_by_iou = jnp.argmax(jnp.where(cand, iou, -1.0), axis=1)
    fg_mask = claimed > 0
    assigned_gt = jnp.where(fg_mask, best_gt_by_iou, 0)

    # Normalized target scores (align metric scaled by max iou per gt).
    pair_metric = jnp.where(cand, metric, 0.0)
    per_gt_max_metric = jnp.max(pair_metric, axis=0) + 1e-9  # (G,)
    per_gt_max_iou = jnp.max(jnp.where(cand, iou, 0.0), axis=0)  # (G,)
    norm_metric = pair_metric * (per_gt_max_iou / per_gt_max_metric)[None, :]
    # row-select by assigned gt as one-hot reductions (vectorized multiply-
    # reduce instead of scalar-unit gathers)
    assigned_onehot = jax.nn.one_hot(assigned_gt, g, dtype=norm_metric.dtype)
    target_scores = jnp.sum(norm_metric * assigned_onehot, axis=1)
    target_scores = jnp.where(fg_mask, target_scores, 0.0)

    picked_label = jnp.sum(
        assigned_onehot * gt_labels[None, :].astype(assigned_onehot.dtype), axis=1
    ).astype(jnp.int32)
    assigned_labels = jnp.where(fg_mask, picked_label, -1)
    return fg_mask, assigned_gt, target_scores, assigned_labels
