"""ViTDet-family detector: ViT backbone + SimpleFPN + two-stage box head.

Capability target: the reference's mmdet ViTDet configs
(``data_annotation/configs/Real_Source/vitdet.py``): ViT-B/16 backbone
(embed 768, depth 12, heads 12) at 128x128, SimpleFPN, Mask-RCNN-style
RPN + Shared4Conv1FC box head (mask branch unused — the task is boxes only).

Reuses the Faster R-CNN machinery (anchors, RPN/RoI losses, static-shape
proposals) with the ViT pyramid swapped in. At 128px the ViT sees 8x8
patches, so no windowed attention is needed (the reference's 1024px-oriented
window machinery is a no-op at this scale); stochastic depth is omitted.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from agenda_tpu.detect.faster_rcnn import (
    FasterRCNNConfig,
    RPNHead,
    build_anchors,
    rcnn_loss,
    rcnn_targets,
    rpn_loss,
    rpn_proposals,
)
from agenda_tpu.detect.ops import decode_deltas, nms, roi_align
from agenda_tpu.kernels.attention import attention_reference


@dataclasses.dataclass(frozen=True)
class ViTDetConfig(FasterRCNNConfig):
    patch_size: int = 16
    embed_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12


class ViTBlock(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, C)
        c = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        b, n, _ = h.shape
        hd = c // self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = attention_reference(
            q.reshape(b, n, self.heads, hd),
            k.reshape(b, n, self.heads, hd),
            v.reshape(b, n, self.heads, hd),
        ).reshape(b, n, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="proj")(out)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        return x + h


class ViTBackbone(nn.Module):
    config: ViTDetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x)
        b, h, w, c = x.shape
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, h, w, c), jnp.float32)
        x = (x + pos).reshape(b, h * w, c)
        for i in range(cfg.vit_depth):
            x = ViTBlock(cfg.vit_heads, dtype=self.dtype, name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x.reshape(b, h, w, c)


class SimpleFPN(nn.Module):
    """Single-scale ViT map -> strides (4, 8, 16, 32, 64) pyramid."""

    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H/16, W/16, C)
        def ln(name):
            return nn.LayerNorm(dtype=self.dtype, name=name)

        up2 = lambda t: jax.image.resize(
            t, (t.shape[0], t.shape[1] * 2, t.shape[2] * 2, t.shape[3]), "nearest"
        )
        # stride 4: two 2x deconv-ish ups with convs between
        s4 = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="s4_lat")(up2(up2(x)))
        s8 = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="s8_lat")(up2(x))
        s16 = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="s16_lat")(x)
        s32 = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="s32_lat")(
            nn.max_pool(x, (2, 2), strides=(2, 2))
        )
        outs = []
        for i, f in enumerate((s4, s8, s16, s32)):
            f = ln(f"ln_a_{i}")(f)
            f = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name=f"out_{i}")(f)
            outs.append(ln(f"ln_b_{i}")(f))
        outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))  # stride 64
        return outs


class Conv4FC1BoxHead(nn.Module):
    """Shared4Conv1FCBBoxHead (vitdet.py:100)."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):  # (R, 7, 7, C)
        x = roi_feats
        for i in range(4):
            x = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls")(x)
        reg = nn.Dense(4 * self.num_classes, dtype=self.dtype, name="reg")(x)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


class ViTDet(nn.Module):
    config: ViTDetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = ViTBackbone(self.config, dtype=self.dtype)
        self.fpn = SimpleFPN(self.config.fpn_channels, dtype=self.dtype)
        na = len(self.config.anchor_scales) * len(self.config.anchor_ratios)
        self.rpn = RPNHead(na, dtype=self.dtype)
        self.box_head = Conv4FC1BoxHead(self.config.num_classes, dtype=self.dtype)

    def extract(self, images, train: bool = False):
        feat = self.backbone(images, train=train)
        pyramid = self.fpn(feat)
        rpn_outs = self.rpn(pyramid)
        return pyramid, rpn_outs

    def roi_forward(self, p2, rois):
        stride = self.config.strides[0]

        def per_image(feat, r):
            rf = roi_align(feat, r / stride, self.config.roi_size)
            return self.box_head(rf)

        return jax.vmap(per_image)(p2, rois)

    def __call__(self, images, train: bool = False):
        pyramid, rpn_outs = self.extract(images, train=train)
        b = images.shape[0]
        dummy_rois = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (b, 4, 1))
        cls, reg = self.roi_forward(pyramid[0], dummy_rois)
        return rpn_outs, cls, reg


@dataclasses.dataclass
class ViTDetFamily:
    config: ViTDetConfig = dataclasses.field(default_factory=ViTDetConfig)

    def __post_init__(self):
        self.model = ViTDet(self.config)
        self.anchors = jnp.asarray(build_anchors(self.config))

    def init_variables(self, rng) -> Dict[str, Any]:
        s = self.config.img_size
        v = self.model.init(rng, jnp.zeros((1, s, s, 3)), train=True)
        if "batch_stats" not in v:
            v = dict(v)
            v["batch_stats"] = {}
        return v

    def loss_fn(self, variables, batch, rng):
        cfg = self.config
        k_rpn, k_rcnn = jax.random.split(rng)
        pyramid, rpn_outs = self.model.apply(
            {"params": variables["params"]}, batch["image"], train=True,
            method=ViTDet.extract,
        )
        rpn_cls_l, rpn_reg_l = rpn_loss(rpn_outs, self.anchors, batch, cfg, k_rpn)
        proposals, pscores = rpn_proposals(
            jax.tree.map(jax.lax.stop_gradient, rpn_outs),
            self.anchors, cfg, cfg.num_proposals,
        )
        rois, is_pos, tgt, valid = rcnn_targets(proposals, pscores, batch, cfg, k_rcnn)
        cls_logits, reg = self.model.apply(
            {"params": variables["params"]}, pyramid[0], rois, method=ViTDet.roi_forward
        )
        rcnn_cls_l, rcnn_reg_l = rcnn_loss(cls_logits, reg, (rois, is_pos, tgt, valid), cfg)
        loss = rpn_cls_l + rpn_reg_l + rcnn_cls_l + rcnn_reg_l
        metrics = {"rpn_cls": rpn_cls_l, "rpn_reg": rpn_reg_l,
                   "rcnn_cls": rcnn_cls_l, "rcnn_reg": rcnn_reg_l}
        return loss, (metrics, variables.get("batch_stats", {}))

    def predict_fn(self, variables, images):
        cfg = self.config
        pyramid, rpn_outs = self.model.apply(
            {"params": variables["params"]}, images, train=False, method=ViTDet.extract
        )
        proposals, pscores = rpn_proposals(rpn_outs, self.anchors, cfg, cfg.nms_pre // 2)
        cls_logits, reg = self.model.apply(
            {"params": variables["params"]}, pyramid[0], proposals, method=ViTDet.roi_forward
        )
        probs = jax.nn.softmax(cls_logits, axis=-1)[..., 0]
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
