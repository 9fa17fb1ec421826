"""ViTDet-family detector: ViT backbone + SimpleFPN + two-stage box head.

Capability target: the reference's mmdet ViTDet configs
(``data_annotation/configs/Real_Source/vitdet.py``): ViT-B/16 backbone
(embed 768, depth 12, heads 12) at 128x128, SimpleFPN, Mask-RCNN-style
RPN + Shared4Conv1FC box head (mask branch unused — the task is boxes only).

Reuses the Faster R-CNN machinery (anchors, RPN/RoI losses, static-shape
proposals) with the ViT pyramid swapped in. The backbone carries the
reference's full regularization/attention scheme
(``Real_Source/vitdet.py:66-80``): window attention (size 14) on blocks
[0,1,3,4,6,7,9,10] with global attention on the rest, decomposed relative
position embeddings (detectron2-style ``rel_pos_h/w``, interpolated to the
query/key extent), and stochastic depth with a linearly-scaled
``drop_path_rate`` (0.1). Windows pad up with zeros, unmasked — detectron2
semantics, so imported checkpoints see the computation they were trained
with. All window ops are static-shape reshapes (jit/TPU-friendly).
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
    # Real_Source/vitdet.py:66-80
    window_size: int = 14
    window_block_indexes: Tuple[int, ...] = (0, 1, 3, 4, 6, 7, 9, 10)
    drop_path_rate: float = 0.1
    use_rel_pos: bool = True


def _window_partition(x: jax.Array, ws: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """(B, H, W, C) -> (B * nWh * nWw, ws, ws, C), zero-padding up
    (detectron2 window_partition: pads, does not mask)."""
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def _window_unpartition(x: jax.Array, ws: int, pad_hw: Tuple[int, int],
                        hw: Tuple[int, int]) -> jax.Array:
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _interp_rel_pos(table: jax.Array, target_len: int) -> jax.Array:
    """Linear-interpolate a (L, C) rel-pos table to (target_len, C)."""
    if table.shape[0] == target_len:
        return table
    return jax.image.resize(table, (target_len, table.shape[1]), "linear")


def _decomposed_rel_pos_bias(q: jax.Array, rel_h: jax.Array, rel_w: jax.Array,
                             qh: int, qw: int) -> jax.Array:
    """detectron2 add_decomposed_rel_pos: additive (B, 1, N, N) attention
    bias from per-axis relative position tables (shared across heads).
    q: (B, N, heads, hd); square q/k extent (qh, qw)."""
    hd = q.shape[-1]
    rh = _interp_rel_pos(rel_h, 2 * qh - 1)
    rw = _interp_rel_pos(rel_w, 2 * qw - 1)
    coords_h = jnp.arange(qh)[:, None] - jnp.arange(qh)[None, :] + (qh - 1)
    coords_w = jnp.arange(qw)[:, None] - jnp.arange(qw)[None, :] + (qw - 1)
    Rh = rh[coords_h]  # (qh, qh, hd)
    Rw = rw[coords_w]  # (qw, qw, hd)
    # head-mean query (bias is shared across heads in detectron2's math when
    # heads fold into batch; here we fold heads into the bias per head)
    b = q.shape[0]
    rq = q.reshape(b, qh, qw, q.shape[2], hd)
    rel_h_term = jnp.einsum("bhwnc,hkc->bnhwk", rq, Rh)
    rel_w_term = jnp.einsum("bhwnc,wkc->bnhwk", rq, Rw)
    bias = rel_h_term[..., :, None] + rel_w_term[..., None, :]  # (B,n,qh,qw,kh,kw)
    n = q.shape[2]
    return bias.reshape(b, n, qh * qw, qh * qw)


class ViTBlock(nn.Module):
    heads: int
    window_size: int = 0  # 0 = global attention
    drop_path: float = 0.0
    use_rel_pos: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, C)
        c = x.shape[-1]
        grid_h, grid_w = x.shape[1], x.shape[2]
        shortcut = x
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            h, pad_hw = _window_partition(h, ws)
        qh, qw = h.shape[1], h.shape[2]
        n = qh * qw
        bw = h.shape[0]
        hd = c // self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h.reshape(bw, n, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bw, n, self.heads, hd)
        k = k.reshape(bw, n, self.heads, hd)
        v = v.reshape(bw, n, self.heads, hd)
        mask = None
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * qh - 1, hd),
                               jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * qw - 1, hd),
                               jnp.float32)
            # detectron2 computes the bias from the UNSCALED q and adds it to
            # the scaled logits — attention_reference adds mask after its own
            # 1/sqrt(hd) scaling, so this matches exactly.
            mask = _decomposed_rel_pos_bias(
                q.astype(jnp.float32), rel_h, rel_w, qh, qw)
        out = attention_reference(q, k, v, mask=mask).reshape(bw, qh, qw, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        if ws > 0:
            out = _window_unpartition(out, ws, pad_hw, (grid_h, grid_w))

        def droppath(t):
            if self.drop_path <= 0.0 or not train:
                return t
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            m = jax.random.bernoulli(rng, keep, (t.shape[0], 1, 1, 1))
            return t * m.astype(t.dtype) / keep

        x = shortcut + droppath(out)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        return x + droppath(h)


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
        x = x + pos
        for i in range(cfg.vit_depth):
            # stochastic depth rate scales linearly with depth (detectron2)
            dpr = cfg.drop_path_rate * i / max(1, cfg.vit_depth - 1)
            ws = cfg.window_size if i in cfg.window_block_indexes else 0
            x = ViTBlock(cfg.vit_heads, window_size=ws, drop_path=dpr,
                         use_rel_pos=cfg.use_rel_pos, dtype=self.dtype,
                         name=f"block_{i}")(x, train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


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
        # train=False at init: drop-path draws no rng, params are identical
        v = self.model.init(rng, jnp.zeros((1, s, s, 3)), train=False)
        if "batch_stats" not in v:
            v = dict(v)
            v["batch_stats"] = {}
        return v

    def loss_fn(self, variables, batch, rng):
        cfg = self.config
        k_rpn, k_rcnn, k_dp = jax.random.split(rng, 3)
        pyramid, rpn_outs = self.model.apply(
            {"params": variables["params"]}, batch["image"], train=True,
            method=ViTDet.extract, rngs={"dropout": k_dp},
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
