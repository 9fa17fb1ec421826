"""Faster R-CNN (R50-FPN) in flax with static-shape two-stage training.

Capability target: the reference's mmdet Faster-RCNN configs
(``data_annotation/configs/Real_Source/faster-rcnn.py``): R50-FPN backbone,
RPN with scales [8] / ratios [0.5, 1, 2] over strides [4..64], DeltaXYWH box
coding (RCNN stds [0.1, 0.1, 0.2, 0.2]), MaxIoU assignment + random sampling
(RPN 256 @ 0.5, RCNN 512 @ 0.25 with GT-as-proposals), test-time RPN
nms_pre 1000 -> NMS 0.7, RCNN score_thr 0.05 / NMS 0.5 / max 100.

TPU-first: every stage has static shapes — fixed anchor tables, top-k +
masked NMS for proposals, fixed-size sampled RoI batches — so the whole
two-stage train step compiles to one XLA program. RoIAlign samples the P2
level (stride 4): the pipeline's boxes are all ~42 px, which mmdet's
scale-based level mapper would route to the finest level anyway.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from agenda_tpu.detect.assign import max_iou_assign, random_sample
from agenda_tpu.detect.losses import bce_with_logits, smooth_l1
from agenda_tpu.detect.ops import (
    decode_deltas,
    encode_deltas,
    grid_anchors,
    nms,
    roi_align,
)
from agenda_tpu.models.resnet import ResNet50


@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    num_classes: int = 1
    img_size: int = 128
    fpn_channels: int = 256
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_scales: Tuple[float, ...] = (8.0,)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # RPN train
    rpn_pos_thr: float = 0.7
    rpn_neg_thr: float = 0.3
    rpn_min_pos_iou: float = 0.3
    rpn_sample: int = 256
    rpn_pos_fraction: float = 0.5
    # proposals
    nms_pre: int = 1000
    num_proposals: int = 512
    proposal_nms_iou: float = 0.7
    # RCNN train
    rcnn_pos_thr: float = 0.5
    rcnn_neg_thr: float = 0.5
    rcnn_sample: int = 256
    rcnn_pos_fraction: float = 0.25
    rcnn_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    roi_size: int = 7
    # test
    score_thr: float = 0.05
    rcnn_nms_iou: float = 0.5
    max_per_img: int = 100
    max_gt: int = 64


class FPN(nn.Module):
    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        """(C2..C5) -> (P2..P6)."""
        laterals = [
            nn.Conv(self.channels, (1, 1), dtype=self.dtype, name=f"lateral_{i}")(c)
            for i, c in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                laterals[i - 1].shape,
                method="nearest",
            )
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name=f"fpn_{i}")(l)
            for i, l in enumerate(laterals)
        ]
        # P6: stride-2 maxpool of P5 (mmdet FPN num_outs=5 on 4 inputs).
        outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


class RPNHead(nn.Module):
    num_anchors: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="rpn_conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="rpn_cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="rpn_reg")
        outs = []
        for f in feats:
            h = nn.relu(conv(f))
            outs.append((cls(h).astype(jnp.float32), reg(h).astype(jnp.float32)))
        return outs


class BoxHead(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        """(R, 7, 7, C) -> (cls_logits (R, num_classes+1), deltas (R, 4*num_classes))."""
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls")(x)
        reg = nn.Dense(4 * self.num_classes, dtype=self.dtype, name="reg")(x)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


class FasterRCNN(nn.Module):
    config: FasterRCNNConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet50(num_classes=1, dtype=self.dtype)
        self.fpn = FPN(self.config.fpn_channels, dtype=self.dtype)
        na = len(self.config.anchor_scales) * len(self.config.anchor_ratios)
        self.rpn = RPNHead(na, dtype=self.dtype)
        self.box_head = BoxHead(self.config.num_classes, dtype=self.dtype)

    def extract(self, images, train: bool = False):
        feats = self.backbone(images, train=train, features=True)
        pyramid = self.fpn(feats)
        rpn_outs = self.rpn(pyramid)
        return pyramid, rpn_outs

    def roi_forward(self, p2, rois):
        """p2 (B,H,W,C); rois (B,R,4) image coords -> per-roi head outputs."""
        stride = self.config.strides[0]

        def per_image(feat, r):
            rf = roi_align(feat, r / stride, self.config.roi_size)
            return self.box_head(rf)

        return jax.vmap(per_image)(p2, rois)

    def __call__(self, images, train: bool = False):
        # init-path: touch all submodules
        pyramid, rpn_outs = self.extract(images, train=train)
        b = images.shape[0]
        dummy_rois = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (b, 4, 1))
        cls, reg = self.roi_forward(pyramid[0], dummy_rois)
        return rpn_outs, cls, reg


# ---------------------------------------------------------------------------
# Anchors / proposals
# ---------------------------------------------------------------------------


def build_anchors(cfg: FasterRCNNConfig) -> np.ndarray:
    per_level = []
    for s in cfg.strides:
        f = cfg.img_size // s
        per_level.append(
            grid_anchors((f, f), s, cfg.anchor_scales, cfg.anchor_ratios)
        )
    return np.concatenate(per_level, axis=0)


def _flatten_rpn(rpn_outs) -> Tuple[jax.Array, jax.Array]:
    """-> (scores (B, A), deltas (B, A, 4)) matching build_anchors order."""
    scores, deltas = [], []
    for (c, d) in rpn_outs:
        b, h, w, na = c.shape
        scores.append(c.reshape(b, h * w * na))
        deltas.append(d.reshape(b, h * w * na, 4))
    return jnp.concatenate(scores, axis=1), jnp.concatenate(deltas, axis=1)


def rpn_proposals(
    rpn_outs, anchors: jax.Array, cfg: FasterRCNNConfig, num_out: int,
) -> Tuple[jax.Array, jax.Array]:
    """-> (proposals (B, num_out, 4), scores (B, num_out)); masked invalid = 0-size."""
    scores, deltas = _flatten_rpn(rpn_outs)
    probs = jax.nn.sigmoid(scores)

    def per_image(p, d):
        topv, topi = jax.lax.top_k(p, min(cfg.nms_pre, p.shape[0]))
        boxes = decode_deltas(anchors[topi], d[topi],
                              max_shape=(cfg.img_size, cfg.img_size))
        keep, valid = nms(boxes, topv, cfg.proposal_nms_iou, num_out)
        props = jnp.where(valid[:, None], boxes[keep], 0.0)
        return props, jnp.where(valid, topv[keep], 0.0)

    return jax.vmap(per_image)(probs, deltas)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def rpn_loss(rpn_outs, anchors, batch, cfg: FasterRCNNConfig, rng):
    scores, deltas = _flatten_rpn(rpn_outs)

    def per_image(score, delta, gtb, gtv, key):
        assigned, labels = max_iou_assign(
            anchors, gtb, gtv, cfg.rpn_pos_thr, cfg.rpn_neg_thr, cfg.rpn_min_pos_iou
        )
        idx, is_pos, valid = random_sample(labels, key, cfg.rpn_sample, cfg.rpn_pos_fraction)
        s = score[idx]
        tgt = is_pos.astype(jnp.float32)
        w = valid.astype(jnp.float32)
        cls_l = jnp.sum(bce_with_logits(s, tgt) * w) / jnp.maximum(jnp.sum(w), 1.0)

        pos_anchor = anchors[idx]
        pos_gt = gtb[jnp.clip(assigned[idx], 0, None)]
        t = encode_deltas(pos_anchor, pos_gt)
        reg_w = (is_pos & valid).astype(jnp.float32)
        reg_l = jnp.sum(
            smooth_l1(delta[idx], t, beta=1.0 / 9.0).sum(-1) * reg_w
        ) / jnp.maximum(jnp.sum(w), 1.0)
        return cls_l, reg_l

    keys = jax.random.split(rng, batch["gt_boxes"].shape[0])
    cls_l, reg_l = jax.vmap(per_image)(
        scores, deltas, batch["gt_boxes"], batch["gt_valid"], keys
    )
    return jnp.mean(cls_l), jnp.mean(reg_l)


def rcnn_targets(proposals, prop_scores, batch, cfg: FasterRCNNConfig, rng):
    """Assign + sample RoIs (with GT appended). Returns per-image sampled rois,
    labels (0 bg / 1 fg), target deltas, weights."""

    def per_image(props, pscore, gtb, gtv, key):
        # Append GT boxes as proposals (mmdet add_gt_as_proposals=True).
        all_props = jnp.concatenate([props, gtb], axis=0)
        assigned, labels = max_iou_assign(
            all_props, gtb, gtv, cfg.rcnn_pos_thr, cfg.rcnn_neg_thr, min_pos_iou=1.1
        )
        # Invalid (zero-size) proposals and padded GT must be background-only.
        prop_valid = jnp.concatenate(
            [(props[:, 2] > props[:, 0]), gtv], axis=0
        )
        labels = jnp.where(prop_valid, labels, -1)
        idx, is_pos, valid = random_sample(labels, key, cfg.rcnn_sample, cfg.rcnn_pos_fraction)
        rois = all_props[idx]
        gt_for_roi = gtb[jnp.clip(assigned[idx], 0, None)]
        t = encode_deltas(rois, gt_for_roi, stds=cfg.rcnn_stds)
        return rois, is_pos, t, valid

    keys = jax.random.split(rng, proposals.shape[0])
    return jax.vmap(per_image)(proposals, prop_scores, batch["gt_boxes"],
                               batch["gt_valid"], keys)


def rcnn_loss(cls_logits, reg, rois_meta, cfg: FasterRCNNConfig):
    rois, is_pos, tgt_deltas, valid = rois_meta
    w = valid.astype(jnp.float32)
    fg = (is_pos & valid).astype(jnp.float32)
    # Softmax CE over (num_classes+1); single class: fg label 0, bg label 1.
    labels = jnp.where(is_pos, 0, cfg.num_classes).astype(jnp.int32)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    cls_l = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
    reg4 = reg.reshape(reg.shape[:-1] + (cfg.num_classes, 4))[..., 0, :]
    reg_l = jnp.sum(smooth_l1(reg4, tgt_deltas, beta=1.0).sum(-1) * fg) / jnp.maximum(
        jnp.sum(w), 1.0
    )
    return cls_l, reg_l


# ---------------------------------------------------------------------------
# Family adapter
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FasterRCNNFamily:
    config: FasterRCNNConfig = dataclasses.field(default_factory=FasterRCNNConfig)

    def __post_init__(self):
        self.model = FasterRCNN(self.config)
        self.anchors = jnp.asarray(build_anchors(self.config))

    def init_variables(self, rng) -> Dict[str, Any]:
        s = self.config.img_size
        return self.model.init(rng, jnp.zeros((1, s, s, 3)), train=True)

    def loss_fn(self, variables, batch, rng):
        cfg = self.config
        k_rpn, k_rcnn = jax.random.split(rng)

        (pyramid, rpn_outs), new_state = self.model.apply(
            variables, batch["image"], train=True,
            method=FasterRCNN.extract, mutable=["batch_stats"],
        )
        rpn_cls_l, rpn_reg_l = rpn_loss(rpn_outs, self.anchors, batch, cfg, k_rpn)

        proposals, pscores = rpn_proposals(
            jax.tree.map(jax.lax.stop_gradient, rpn_outs),
            self.anchors, cfg, cfg.num_proposals,
        )
        rois, is_pos, tgt, valid = rcnn_targets(proposals, pscores, batch, cfg, k_rcnn)
        cls_logits, reg = self.model.apply(
            {"params": variables["params"], "batch_stats": new_state["batch_stats"]},
            pyramid[0], rois, method=FasterRCNN.roi_forward,
        )
        rcnn_cls_l, rcnn_reg_l = rcnn_loss(cls_logits, reg, (rois, is_pos, tgt, valid), cfg)

        loss = rpn_cls_l + rpn_reg_l + rcnn_cls_l + rcnn_reg_l
        metrics = {
            "rpn_cls": rpn_cls_l, "rpn_reg": rpn_reg_l,
            "rcnn_cls": rcnn_cls_l, "rcnn_reg": rcnn_reg_l,
        }
        return loss, (metrics, new_state["batch_stats"])

    def predict_fn(self, variables, images):
        cfg = self.config
        pyramid, rpn_outs = self.model.apply(
            variables, images, train=False, method=FasterRCNN.extract
        )
        proposals, pscores = rpn_proposals(rpn_outs, self.anchors, cfg, cfg.nms_pre // 2)
        cls_logits, reg = self.model.apply(
            variables, pyramid[0], proposals, method=FasterRCNN.roi_forward
        )
        probs = jax.nn.softmax(cls_logits, axis=-1)[..., 0]  # fg prob
        reg4 = reg.reshape(reg.shape[:-1] + (cfg.num_classes, 4))[..., 0, :]

        def per_image(props, p, d):
            boxes = decode_deltas(props, d, stds=cfg.rcnn_stds,
                                  max_shape=(cfg.img_size, cfg.img_size))
            valid_prop = props[:, 2] > props[:, 0]
            scores = jnp.where(valid_prop, p, 0.0)
            keep, valid = nms(boxes, scores, cfg.rcnn_nms_iou, cfg.max_per_img,
                              score_threshold=cfg.score_thr)
            return boxes[keep], jnp.where(valid, scores[keep], 0.0), valid

        return jax.vmap(per_image)(proposals, probs, reg4)
