"""torch-checkpoint -> flax importers for the detector zoo.

The reference initializes every Real_Source detector from a COCO-pretrained
mm checkpoint via ``load_from``
(``/root/reference/data_annotation/configs/Real_Source/faster-rcnn.py:37``,
``yolov5.py:40``, ``yolov8.py:57``, ``vitdet.py:43``) — load-bearing for the
published AP50. This module maps those torch state dicts (mmdet / mmyolo /
mmdet-ViTDet naming; torchvision for bare ResNet) onto our flax detector
variable trees:

- conv ``weight`` OIHW -> ``kernel`` HWIO; linear ``weight`` (out,in) ->
  ``kernel`` (in,out); BN ``weight/bias/running_*`` ->
  ``scale/bias`` + batch_stats ``mean/var``; LN ``weight`` -> ``scale``;
- the Shared2FC box head's first fc is flattened NCHW in torch and NHWC
  here, so its weight is channel-permuted, not just transposed;
- ViT ``pos_embed`` grids are resized (bilinear) and a leading cls token is
  dropped when present;
- class-count-dependent heads (80-class COCO vs our 1 class) shape-mismatch
  and are skipped, exactly like mmengine's non-strict ``load_from``.

Zero-egress: the checkpoint file must already be on disk (.pth via torch CPU
load, or .safetensors). Key-schema golden tests live in
``tests/test_torch_import.py``.
"""

from __future__ import annotations

import dataclasses
import logging
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from agenda_tpu.io.diffusers_io import _flatten, _nest, _read_tensor_file

logger = logging.getLogger("agenda_tpu.torch_import")

Path = Tuple[str, ...]


# ---------------------------------------------------------------------------
# checkpoint file loading
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth / .pt / .safetensors checkpoint into {key: np.ndarray},
    unwrapping mm-style {'state_dict': ...} / {'model': ...} containers and
    stripping 'module.' DDP prefixes."""
    if path.endswith(".safetensors"):
        sd = _read_tensor_file(path[: -len(".safetensors")])
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        for container in ("state_dict", "model", "ema_state_dict"):
            if isinstance(obj, dict) and container in obj and isinstance(obj[container], dict):
                obj = obj[container]
                break
        sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
              for k, v in obj.items() if hasattr(v, "shape")}
    return {k[len("module."):] if k.startswith("module.") else k: np.asarray(v)
            for k, v in sd.items()}


# ---------------------------------------------------------------------------
# per-family torch-key -> flax-module-path mappers
# ---------------------------------------------------------------------------


def _resnet_path(mods: List[str]) -> Path:
    """torchvision/mmdet ResNet module list -> our backbone path
    (layer1.0 -> layer1_0, downsample.0 -> downsample_0)."""
    out: List[str] = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if m.startswith("layer") and i + 1 < len(mods) and mods[i + 1].isdigit():
            out.append(f"{m}_{mods[i + 1]}")
            i += 2
        elif m == "downsample" and i + 1 < len(mods):
            out.append(f"downsample_{mods[i + 1]}")
            i += 2
        else:
            out.append(m)
            i += 1
    return tuple(out)


def _rpn_roi_path(mods: List[str]) -> Optional[Path]:
    """mmdet RPN + Shared2FC box head names -> our rpn/box_head paths."""
    key = ".".join(mods)
    flat = {
        "rpn_head.rpn_conv": ("rpn", "rpn_conv"),
        "rpn_head.rpn_cls": ("rpn", "rpn_cls"),
        "rpn_head.rpn_reg": ("rpn", "rpn_reg"),
        "roi_head.bbox_head.shared_fcs.0": ("box_head", "fc1"),
        "roi_head.bbox_head.shared_fcs.1": ("box_head", "fc2"),
        "roi_head.bbox_head.fc_cls": ("box_head", "cls"),
        "roi_head.bbox_head.fc_reg": ("box_head", "reg"),
    }
    return flat.get(key)


def _map_faster_rcnn(mods: List[str]) -> Optional[Path]:
    """mmdet FasterRCNN R50-FPN checkpoint schema."""
    if mods[0] == "backbone":
        return ("backbone",) + _resnet_path(mods[1:])
    m = re.fullmatch(r"neck\.lateral_convs\.(\d+)\.conv", ".".join(mods))
    if m:
        return ("fpn", f"lateral_{m.group(1)}")
    m = re.fullmatch(r"neck\.fpn_convs\.(\d+)\.conv", ".".join(mods))
    if m:
        return ("fpn", f"fpn_{m.group(1)}")
    return _rpn_roi_path(mods)


def _csp_inner(rest: List[str], style: str) -> Optional[Path]:
    """mmyolo CSPLayer / CSPLayerWithTwoConv internals -> our C3/C2f names.

    v5 C3:  main_conv->cv1 short_conv->cv2 final_conv->cv3
            blocks.n.conv1/conv2 -> m_{n}_cv1/m_{n}_cv2
    v8 C2f: main_conv->cv1 final_conv->cv2
            blocks.n.conv1/conv2 -> m_{n}/cv1|cv2
    """
    key = ".".join(rest)
    if style == "v5":
        table = {"main_conv": ("cv1",), "short_conv": ("cv2",), "final_conv": ("cv3",)}
    else:
        table = {"main_conv": ("cv1",), "final_conv": ("cv2",)}
    m = re.fullmatch(r"(main_conv|short_conv|final_conv)\.(conv|bn)", key)
    if m and m.group(1) in table:
        return table[m.group(1)] + (m.group(2),)
    m = re.fullmatch(r"blocks\.(\d+)\.(conv1|conv2)\.(conv|bn)", key)
    if m:
        n, cv, sub = m.group(1), "cv1" if m.group(2) == "conv1" else "cv2", m.group(3)
        if style == "v5":
            return (f"m_{n}_{cv}", sub)
        return (f"m_{n}", cv, sub)
    return None


def _map_yolo_backbone(mods: List[str], style: str, csp_name: str) -> Optional[Path]:
    key = ".".join(mods)
    m = re.fullmatch(r"backbone\.stem\.(conv|bn)", key)
    if m:
        return ("stem", m.group(1))
    m = re.fullmatch(r"backbone\.stage(\d)\.0\.(conv|bn)", key)
    if m:
        return (f"down{m.group(1)}", m.group(2))
    m = re.match(r"backbone\.stage(\d)\.1\.(.*)", key)
    if m:
        inner = _csp_inner(m.group(2).split("."), style)
        return (f"{csp_name}_{m.group(1)}",) + inner if inner else None
    m = re.fullmatch(r"backbone\.stage4\.2\.(conv1|conv2)\.(conv|bn)", key)
    if m:
        return ("sppf", "cv1" if m.group(1) == "conv1" else "cv2", m.group(2))
    return None


def _map_yolov5(mods: List[str]) -> Optional[Path]:
    """mmyolo YOLOv5 (CSPDarknet + YOLOv5PAFPN + YOLOv5Head) schema."""
    p = _map_yolo_backbone(mods, "v5", "c3")
    if p:
        return p
    key = ".".join(mods)
    m = re.fullmatch(r"neck\.reduce_layers\.2\.(conv|bn)", key)
    if m:
        return ("reduce5", m.group(1))
    m = re.match(r"neck\.top_down_layers\.0\.0\.(.*)", key)
    if m:
        inner = _csp_inner(m.group(1).split("."), "v5")
        return ("neck_c3_1",) + inner if inner else None
    m = re.fullmatch(r"neck\.top_down_layers\.0\.1\.(conv|bn)", key)
    if m:
        return ("reduce4", m.group(1))
    m = re.match(r"neck\.top_down_layers\.1\.(.*)", key)
    if m:
        inner = _csp_inner(m.group(1).split("."), "v5")
        return ("neck_c3_2",) + inner if inner else None
    m = re.fullmatch(r"neck\.downsample_layers\.(\d)\.(conv|bn)", key)
    if m:
        return (f"neck_down{3 + int(m.group(1))}", m.group(2))
    m = re.match(r"neck\.bottom_up_layers\.(\d)\.(.*)", key)
    if m:
        inner = _csp_inner(m.group(2).split("."), "v5")
        return (f"neck_c3_{3 + int(m.group(1))}",) + inner if inner else None
    m = re.fullmatch(r"bbox_head\.head_module\.convs_pred\.(\d)", key)
    if m:
        return (f"head_{m.group(1)}",)
    return None


def _map_yolov8(mods: List[str]) -> Optional[Path]:
    """mmyolo YOLOv8 (CSPDarknet-C2f + YOLOv8PAFPN + YOLOv8Head) schema."""
    p = _map_yolo_backbone(mods, "v8", "c2f")
    if p:
        return p
    key = ".".join(mods)
    td = {"0": "neck_p4", "1": "neck_p3"}
    bu = {"0": "neck_p4b", "1": "neck_p5"}
    m = re.match(r"neck\.top_down_layers\.(\d)\.(.*)", key)
    if m and m.group(1) in td:
        inner = _csp_inner(m.group(2).split("."), "v8")
        return (td[m.group(1)],) + inner if inner else None
    m = re.fullmatch(r"neck\.downsample_layers\.(\d)\.(conv|bn)", key)
    if m:
        return (f"neck_down{3 + int(m.group(1))}", m.group(2))
    m = re.match(r"neck\.bottom_up_layers\.(\d)\.(.*)", key)
    if m and m.group(1) in bu:
        inner = _csp_inner(m.group(2).split("."), "v8")
        return (bu[m.group(1)],) + inner if inner else None
    # head towers: cls_preds.i.{0,1} ConvModules, .2 plain conv (same for reg)
    m = re.fullmatch(r"bbox_head\.head_module\.(cls|reg)_preds\.(\d)\.([012])(?:\.(conv|bn))?", key)
    if m:
        kind = "cls" if m.group(1) == "cls" else "box"
        stage = int(m.group(3)) + 1
        base = (f"head_{kind}{stage}_{m.group(2)}",)
        return base + ((m.group(4),) if m.group(4) else ())
    return None


def _map_vitdet(mods: List[str]) -> Optional[Path]:
    """mmdet ViTDet (ViT-B MAE mask-rcnn) schema: ViT blocks + RPN/ROI heads.

    Accepts the block-internal naming variants seen across mmdet/timm/
    detectron2 ports (ln1|norm1, mlp.fc1|mlp.lin1|ffn.layers.0.0, ...).
    """
    key = ".".join(mods)
    if key == "backbone.patch_embed.projection" or key == "backbone.patch_embed.proj":
        return ("backbone", "patch_embed")
    if key == "backbone.pos_embed":
        return ("backbone", "pos_embed")
    if key in ("backbone.ln1", "backbone.norm", "backbone.last_norm"):
        return ("backbone", "norm")
    m = re.match(r"backbone\.(?:blocks|layers)\.(\d+)\.(.*)", key)
    if m:
        blk = (f"block_{m.group(1)}",)
        rest = m.group(2)
        table = {
            "ln1": "norm1", "norm1": "norm1",
            "ln2": "norm2", "norm2": "norm2",
            "attn.qkv": "qkv", "attn.proj": "proj",
            "attn.rel_pos_h": "rel_pos_h", "attn.rel_pos_w": "rel_pos_w",
            "mlp.fc1": "fc1", "mlp.lin1": "fc1", "ffn.layers.0.0": "fc1",
            "mlp.fc2": "fc2", "mlp.lin2": "fc2", "ffn.layers.1": "fc2",
        }
        if rest in table:
            return ("backbone",) + blk + (table[rest],)
        return None
    return _rpn_roi_path(mods)


_MAPPERS: Dict[str, Callable[[List[str]], Optional[Path]]] = {
    "faster-rcnn": _map_faster_rcnn,
    "yolov5": _map_yolov5,
    "yolov8": _map_yolov8,
    "vitdet": _map_vitdet,
}


# ---------------------------------------------------------------------------
# tensor conversion + tree application
# ---------------------------------------------------------------------------


def _resize_pos_embed(arr: np.ndarray, target_shape: Tuple[int, ...]) -> np.ndarray:
    """(1, N(+1), C) or (1, h, w, C) torch pos_embed -> our (1, g, g, C),
    dropping a leading cls token and bilinearly resizing the grid."""
    if arr.ndim == 3:
        n = arr.shape[1]
        g = int(round(n ** 0.5))
        if g * g != n and int(round((n - 1) ** 0.5)) ** 2 == n - 1:
            arr = arr[:, 1:]  # drop cls token
            g = int(round((n - 1) ** 0.5))
        arr = arr.reshape(1, g, g, arr.shape[-1])
    tg = target_shape[1]
    if arr.shape[1] != tg:
        from PIL import Image

        c = arr.shape[-1]
        out = np.zeros((1, tg, tg, c), np.float32)
        # per-channel bilinear resize (PIL handles f32 single-channel)
        for ch in range(c):
            out[0, :, :, ch] = np.asarray(
                Image.fromarray(arr[0, :, :, ch].astype(np.float32)).resize(
                    (tg, tg), Image.BILINEAR)
            )
        arr = out
    return arr.astype(np.float32)


# target flax leaves whose torch source is flattened NCHW: (C, H, W) to unpermute
_NCHW_FLATTEN_FC = {("box_head", "fc1", "kernel"): (256, 7, 7)}


@dataclasses.dataclass
class ImportReport:
    imported: List[str] = dataclasses.field(default_factory=list)
    skipped_shape: List[Tuple[str, tuple, tuple]] = dataclasses.field(default_factory=list)
    unmatched: List[str] = dataclasses.field(default_factory=list)
    missing_target: List[str] = dataclasses.field(default_factory=list)
    filled: set = dataclasses.field(default_factory=set)

    def coverage(self, variables: Dict[str, Any], prefix: Path) -> float:
        """Fraction of params leaves under `prefix` that were filled."""
        flat = _flatten(variables["params"])
        under = [k for k in flat if k[: len(prefix)] == prefix]
        if not under:
            return 0.0
        hit = sum(1 for k in under if ("params",) + k in self.filled)
        return hit / len(under)


def import_detector_weights(
    variables: Dict[str, Any],
    state_dict: Dict[str, np.ndarray],
    family: str,
) -> Tuple[Dict[str, Any], ImportReport]:
    """Map a torch checkpoint onto a detector's variables
    ({"params", "batch_stats"}). Non-strict: unmatched keys and
    shape-mismatched heads are reported, not fatal (mmengine load_from
    semantics). Returns (new_variables, report)."""
    if family not in _MAPPERS:
        raise ValueError(f"No importer for family '{family}' "
                         f"(have {sorted(_MAPPERS)})")
    mapper = _MAPPERS[family]
    flat = {col: dict(_flatten(tree)) for col, tree in variables.items()}
    report = ImportReport()

    for key, arr in state_dict.items():
        arr = np.asarray(arr)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        special = key.endswith("pos_embed") or leaf in ("rel_pos_h", "rel_pos_w")
        if leaf not in ("weight", "bias", "running_mean", "running_var") \
                and not special:
            report.unmatched.append(key)
            continue
        mods = parts[:-1] if leaf in ("weight", "bias", "running_mean",
                                      "running_var") else parts
        path = mapper(mods)
        if path is None:
            report.unmatched.append(key)
            continue

        if special:
            col, tpath = "params", path
            tgt = flat.get(col, {}).get(tpath)
            if tgt is None:
                report.missing_target.append(key)
                continue
            if key.endswith("pos_embed"):
                val = _resize_pos_embed(arr, tgt.shape)
            else:  # rel_pos tables: linear-interp along the length axis
                val = arr.astype(np.float32)
                if val.shape[0] != tgt.shape[0]:
                    xs = np.linspace(0, val.shape[0] - 1, tgt.shape[0])
                    val = np.stack(
                        [np.interp(xs, np.arange(val.shape[0]), val[:, c])
                         for c in range(val.shape[1])], axis=1)
            if tuple(val.shape) != tuple(tgt.shape):
                report.skipped_shape.append((key, tuple(val.shape), tuple(tgt.shape)))
                continue
            flat[col][tpath] = val
            report.imported.append(key)
            report.filled.add((col,) + tpath)
            continue

        if leaf == "weight":
            if arr.ndim == 4:
                col, sub, val = "params", "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                col, sub = "params", "kernel"
                spec = _NCHW_FLATTEN_FC.get(path + ("kernel",))
                if spec is not None and arr.shape[1] == int(np.prod(spec)):
                    c, fh, fw = spec
                    val = arr.reshape(-1, c, fh, fw).transpose(0, 2, 3, 1) \
                             .reshape(arr.shape[0], -1).T
                else:
                    val = arr.T
            else:  # 1D: BN/LN gamma
                col, sub, val = "params", "scale", arr
        elif leaf == "bias":
            col, sub, val = "params", "bias", arr
        elif leaf == "running_mean":
            col, sub, val = "batch_stats", "mean", arr
        else:  # running_var
            col, sub, val = "batch_stats", "var", arr

        tpath = path + (sub,)
        tgt = flat.get(col, {}).get(tpath)
        if tgt is None:
            report.missing_target.append(key)
            continue
        if tuple(tgt.shape) != tuple(val.shape):
            report.skipped_shape.append((key, tuple(val.shape), tuple(tgt.shape)))
            continue
        flat[col][tpath] = np.asarray(val, np.float32)
        report.imported.append(key)
        report.filled.add((col,) + tpath)

    new_vars = {col: _nest(d) for col, d in flat.items()}
    logger.info(
        "torch import (%s): %d imported, %d shape-skipped, %d unmatched, "
        "%d missing-target",
        family, len(report.imported), len(report.skipped_shape),
        len(report.unmatched), len(report.missing_target),
    )
    for k, src, dst in report.skipped_shape[:8]:
        logger.info("  shape-skip %s: ckpt %s vs model %s", k, src, dst)
    return new_vars, report
