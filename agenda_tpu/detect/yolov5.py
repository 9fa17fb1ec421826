"""YOLOv5-family detector in flax (anchor-based, v6.1 architecture).

Capability target: the reference's mmyolo YOLOv5-m config
(``data_annotation/configs/Real_Source/yolov5.py``): deepen 0.67 / widen
0.75, custom ~27-49 px anchors tuned for the 42.36-px vehicles, 128x128
inputs, lr 0.01. TPU-first reimplementation of the public v5 design:

- CSPDarknet C3 backbone + SPPF, PAN neck, coupled head
  (na * (5 + nc) per cell);
- v5 box decode: xy = (2*sig - 0.5 + grid) * stride, wh = (2*sig)^2 * anchor;
- shape-ratio anchor matching (max ratio < 4) with the 3-cell cross-grid
  assignment, built as vectorized scatters into static per-level target
  grids — the whole loss is one XLA program;
- objectness target = detached CIoU (gr=1), per-level balance (4, 1, 0.4);
  class loss skipped for the single-class task (ultralytics behavior).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from agenda_tpu.detect.losses import bce_with_logits, ciou
from agenda_tpu.detect.ops import nms
from agenda_tpu.detect.yolov8 import ConvBNAct  # conv+BN+SiLU, shared


DEFAULT_ANCHORS = (  # reference Real_Source/yolov5.py:26 (42px vehicles)
    ((31, 28), (32, 37), (27, 48)),
    ((48, 27), (47, 34), (34, 48)),
    ((41, 48), (49, 41), (48, 48)),
)


@dataclasses.dataclass(frozen=True)
class YOLOv5Config:
    num_classes: int = 1
    depth: float = 0.67  # m
    width: float = 0.75
    img_size: int = 128
    strides: Tuple[int, ...] = (8, 16, 32)
    anchors: Tuple = DEFAULT_ANCHORS
    max_gt: int = 64
    box_weight: float = 0.05
    obj_weight: float = 1.0
    cls_weight: float = 0.5
    obj_balance: Tuple[float, ...] = (4.0, 1.0, 0.4)
    anchor_ratio_thr: float = 4.0

    def ch(self, c: int) -> int:
        return max(8, int(round(c * self.width / 8)) * 8)

    def n(self, x: int) -> int:
        return max(1, round(x * self.depth))


class C3(nn.Module):
    out_ch: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.out_ch // 2
        a = ConvBNAct(c, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBNAct(c, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            h = ConvBNAct(c, 1, dtype=self.dtype, name=f"m_{i}_cv1")(a, train)
            h = ConvBNAct(c, 3, dtype=self.dtype, name=f"m_{i}_cv2")(h, train)
            a = a + h if self.shortcut else h
        return ConvBNAct(self.out_ch, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class SPPFv5(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        x = ConvBNAct(c, 1, dtype=self.dtype, name="cv1")(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
        return ConvBNAct(self.out_ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, p1, p2, p3], axis=-1), train
        )


def _head_bias_init(cfg: YOLOv5Config, level: int):
    """ultralytics ``Detect.bias_init`` priors (mirrored by mmyolo's
    YOLOv5Head init): objectness bias log(8 objects / cells-at-this-level),
    class bias log(0.6/(nc-0.99999)). Without the obj prior the head spends
    its first epochs suppressing objectness on ~99% negative cells — a
    measured multi-point mAP cost at short schedules."""
    import math

    na = len(cfg.anchors[0])
    stride = cfg.strides[level]
    obj_b = math.log(8.0 / (cfg.img_size / stride) ** 2)
    cls_b = math.log(0.6 / (cfg.num_classes - 0.99999)) \
        if cfg.num_classes > 1 else math.log(0.6 / 1e-5)

    def init(key, shape, dtype=jnp.float32):
        b = jnp.zeros((na, 5 + cfg.num_classes), jnp.float32)
        b = b.at[:, 4].set(obj_b)
        b = b.at[:, 5:].set(cls_b)
        return b.reshape(shape).astype(dtype)

    return init


class YOLOv5(nn.Module):
    config: YOLOv5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        na = len(cfg.anchors[0])
        no = na * (5 + cfg.num_classes)
        c1, c2, c3c, c4, c5 = (cfg.ch(64), cfg.ch(128), cfg.ch(256),
                               cfg.ch(512), cfg.ch(1024))

        x = ConvBNAct(c1, 6, 2, dtype=self.dtype, name="stem")(x, train)
        x = ConvBNAct(c2, 3, 2, dtype=self.dtype, name="down1")(x, train)
        x = C3(c2, cfg.n(3), dtype=self.dtype, name="c3_1")(x, train)
        x = ConvBNAct(c3c, 3, 2, dtype=self.dtype, name="down2")(x, train)
        p3 = C3(c3c, cfg.n(6), dtype=self.dtype, name="c3_2")(x, train)
        x = ConvBNAct(c4, 3, 2, dtype=self.dtype, name="down3")(p3, train)
        p4 = C3(c4, cfg.n(9), dtype=self.dtype, name="c3_3")(x, train)
        x = ConvBNAct(c5, 3, 2, dtype=self.dtype, name="down4")(p4, train)
        x = C3(c5, cfg.n(3), dtype=self.dtype, name="c3_4")(x, train)
        p5 = SPPFv5(c5, dtype=self.dtype, name="sppf")(x, train)

        up = lambda t: jax.image.resize(
            t, (t.shape[0], t.shape[1] * 2, t.shape[2] * 2, t.shape[3]), "nearest"
        )
        r5 = ConvBNAct(c4, 1, dtype=self.dtype, name="reduce5")(p5, train)
        x4 = C3(c4, cfg.n(3), shortcut=False, dtype=self.dtype, name="neck_c3_1")(
            jnp.concatenate([up(r5), p4], axis=-1), train
        )
        r4 = ConvBNAct(c3c, 1, dtype=self.dtype, name="reduce4")(x4, train)
        out3 = C3(c3c, cfg.n(3), shortcut=False, dtype=self.dtype, name="neck_c3_2")(
            jnp.concatenate([up(r4), p3], axis=-1), train
        )
        d3 = ConvBNAct(c3c, 3, 2, dtype=self.dtype, name="neck_down3")(out3, train)
        out4 = C3(c4, cfg.n(3), shortcut=False, dtype=self.dtype, name="neck_c3_3")(
            jnp.concatenate([d3, r4], axis=-1), train
        )
        d4 = ConvBNAct(c4, 3, 2, dtype=self.dtype, name="neck_down4")(out4, train)
        out5 = C3(c5, cfg.n(3), shortcut=False, dtype=self.dtype, name="neck_c3_4")(
            jnp.concatenate([d4, r5], axis=-1), train
        )

        heads = []
        for li, f in enumerate((out3, out4, out5)):
            h = nn.Conv(no, (1, 1), dtype=self.dtype, name=f"head_{li}",
                        bias_init=_head_bias_init(cfg, li))(f)
            b, hh, ww, _ = h.shape
            heads.append(h.reshape(b, hh, ww, na, 5 + cfg.num_classes).astype(jnp.float32))
        return heads


# ---------------------------------------------------------------------------
# Targets / loss
# ---------------------------------------------------------------------------


def _level_targets(gt_boxes, gt_valid, anchors_lvl, stride, fsize, ratio_thr):
    """Vectorized v5 assignment for one image, one level.

    Returns (tmask (H,W,A), tbox (H,W,A,4) gt xyxy, tanchor (H,W,A,2)).
    """
    g = gt_boxes.shape[0]
    a = anchors_lvl.shape[0]
    h = w = fsize
    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2 / stride
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2 / stride
    gw = (gt_boxes[:, 2] - gt_boxes[:, 0]) / stride
    gh = (gt_boxes[:, 3] - gt_boxes[:, 1]) / stride

    r_w = gw[:, None] / (anchors_lvl[None, :, 0] / stride)
    r_h = gh[:, None] / (anchors_lvl[None, :, 1] / stride)
    ratio = jnp.maximum(
        jnp.maximum(r_w, 1.0 / jnp.maximum(r_w, 1e-9)),
        jnp.maximum(r_h, 1.0 / jnp.maximum(r_h, 1e-9)),
    )
    match = (ratio < ratio_thr) & gt_valid[:, None] & (gw[:, None] > 1e-6)  # (G, A)

    # 3 cells: own + up-to-2 neighbors by fractional offset (v5 0.5 rule).
    fx = cx % 1.0
    fy = cy % 1.0
    c0x = jnp.floor(cx)
    c0y = jnp.floor(cy)
    offx = jnp.where(fx < 0.5, -1.0, 1.0)
    offy = jnp.where(fy < 0.5, -1.0, 1.0)
    cand_x = jnp.stack([c0x, c0x + offx, c0x], axis=1)  # (G, 3)
    cand_y = jnp.stack([c0y, c0y, c0y + offy], axis=1)
    cand_ok = jnp.stack(
        [
            jnp.ones_like(cx, bool),
            (cand_x[:, 1] >= 0) & (cand_x[:, 1] < w),
            (cand_y[:, 2] >= 0) & (cand_y[:, 2] < h),
        ],
        axis=1,
    )
    cand_x = jnp.clip(cand_x, 0, w - 1).astype(jnp.int32)
    cand_y = jnp.clip(cand_y, 0, h - 1).astype(jnp.int32)

    # Scatter: (G, 3 cells, A) updates into (H, W, A).
    gi = jnp.broadcast_to(jnp.arange(g)[:, None, None], (g, 3, a))
    ci = jnp.broadcast_to(jnp.arange(3)[None, :, None], (g, 3, a))
    ai = jnp.broadcast_to(jnp.arange(a)[None, None, :], (g, 3, a))
    upd_ok = match[gi, ai] & cand_ok[gi, ci]
    ys = cand_y[gi, ci]
    xs = cand_x[gi, ci]

    tmask = jnp.zeros((h, w, a), bool)
    tgt_idx = jnp.full((h, w, a), -1, jnp.int32)
    # max-scatter: non-matching updates contribute -1 (no effect); on conflict
    # the highest gt index wins (deterministic, order-free).
    tmask = tmask.at[ys, xs, ai].max(upd_ok)
    tgt_idx = tgt_idx.at[ys, xs, ai].max(jnp.where(upd_ok, gi, -1))
    tgt_idx = jnp.where(tmask, tgt_idx, -1)
    return tmask, tgt_idx


def _decode_level(pred, anchors_lvl, stride):
    """pred (H,W,A,5+nc) -> boxes (H,W,A,4) xyxy, obj_logits, cls_logits."""
    h, w, a, _ = pred.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    gy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    sxy = jax.nn.sigmoid(pred[..., 0:2])
    swh = jax.nn.sigmoid(pred[..., 2:4])
    px = (2 * sxy[..., 0] - 0.5 + gx) * stride
    py = (2 * sxy[..., 1] - 0.5 + gy) * stride
    pw = (2 * swh[..., 0]) ** 2 * anchors_lvl[None, None, :, 0]
    ph = (2 * swh[..., 1]) ** 2 * anchors_lvl[None, None, :, 1]
    boxes = jnp.stack([px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], axis=-1)
    return boxes, pred[..., 4], pred[..., 5:]


def yolov5_loss(heads, batch, cfg: YOLOv5Config):
    anchors = jnp.asarray(cfg.anchors, jnp.float32)  # (L, A, 2)

    def per_image(preds, gtb, gtv):
        lbox = jnp.float32(0.0)
        lobj = jnp.float32(0.0)
        n_match = jnp.float32(0.0)
        for li, pred in enumerate(preds):
            stride = cfg.strides[li]
            fsize = cfg.img_size // stride
            boxes, obj_logit, _ = _decode_level(pred, anchors[li], stride)
            tmask, tgt_idx = _level_targets(
                gtb, gtv, anchors[li], stride, fsize, cfg.anchor_ratio_thr
            )
            tgt_boxes = gtb[jnp.clip(tgt_idx, 0, None)]  # (H,W,A,4)
            iou = ciou(boxes, tgt_boxes)
            m = tmask.astype(jnp.float32)
            lbox = lbox + jnp.sum((1.0 - iou) * m)
            n_match = n_match + jnp.sum(m)
            tobj = jnp.where(tmask, jax.lax.stop_gradient(jnp.clip(iou, 0.0, 1.0)), 0.0)
            lobj = lobj + cfg.obj_balance[li] * jnp.mean(bce_with_logits(obj_logit, tobj))
        lbox = lbox / jnp.maximum(n_match, 1.0)
        return lbox, lobj, n_match

    lbox, lobj, n_match = jax.vmap(per_image)(
        heads, batch["gt_boxes"], batch["gt_valid"]
    )
    lbox = jnp.mean(lbox)
    lobj = jnp.mean(lobj)
    loss = cfg.box_weight * lbox + cfg.obj_weight * lobj
    # mmyolo/ultralytics convention: loss x global batch size (ultralytics
    # compute_loss returns (lbox+lobj+lcls)*bs; mmyolo YOLOv5Head scales by
    # batch_size x world_size). The reference lr presets assume this
    # gradient scale — its absence was the measured root cause of the v5
    # convergence gap (box CIoU stuck at 0.27 after 100 steps at lr 0.01;
    # overfit probe with Adam reached mAP75=1.0, proving loss/assignment
    # correct and optimization scale wrong).
    loss = loss * batch["gt_boxes"].shape[0]
    return loss, {"box": lbox, "obj": lobj, "n_match": jnp.mean(n_match)}


def yolov5_predict(heads, cfg: YOLOv5Config, score_thr=0.001, iou_thr=0.65, max_dets=300):
    anchors = jnp.asarray(cfg.anchors, jnp.float32)

    def per_image(preds):
        all_boxes, all_scores = [], []
        for li, pred in enumerate(preds):
            boxes, obj_logit, cls_logit = _decode_level(pred, anchors[li], cfg.strides[li])
            obj = jax.nn.sigmoid(obj_logit)
            cls = jax.nn.sigmoid(cls_logit[..., 0]) if cfg.num_classes == 1 else 1.0
            score = obj * cls
            all_boxes.append(boxes.reshape(-1, 4))
            all_scores.append(score.reshape(-1))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        boxes = jnp.clip(boxes, 0, cfg.img_size)
        keep, valid = nms(boxes, scores, iou_thr, max_dets, score_thr)
        return boxes[keep], jnp.where(valid, scores[keep], 0.0), valid

    return jax.vmap(per_image)(heads)


@dataclasses.dataclass
class YOLOv5Family:
    config: YOLOv5Config = dataclasses.field(default_factory=YOLOv5Config)
    score_thr: float = 0.001
    iou_thr: float = 0.65
    max_dets: int = 300

    def __post_init__(self):
        self.model = YOLOv5(self.config)

    def init_variables(self, rng) -> Dict[str, Any]:
        s = self.config.img_size
        return self.model.init(rng, jnp.zeros((1, s, s, 3)), train=True)

    def loss_fn(self, variables, batch, rng):
        del rng
        heads, new_state = self.model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            batch["image"], train=True, mutable=["batch_stats"],
        )
        loss, metrics = yolov5_loss(heads, batch, self.config)
        return loss, (metrics, new_state["batch_stats"])

    def predict_fn(self, variables, images):
        heads = self.model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            images, train=False,
        )
        return yolov5_predict(heads, self.config, self.score_thr, self.iou_thr, self.max_dets)
