"""COCO detection dataset + augmentation for the detector trainers.

Replaces mmdet's ``CocoDataset`` + train pipeline for the reference's
configs (``configs/Real_Source/faster-rcnn.py``): images resized to
``img_scale`` (128x128 over the 112x112 aerial tiles), random flip, and —
for the Real_Source stage — Mosaic / RandomAffine / MixUp / HSV / blur-style
photometric aug done host-side in numpy (the Synthetic stages use only
resize+flip, matching the config diffs in SURVEY.md §2.1).

Batches carry GT padded to ``max_gt`` with a validity mask so the jitted
train step sees static shapes. ``ConcatDataset`` mirrors the final stage's
with-cars + without-cars concatenation
(``configs/Synthetic_Target/faster-rcnn.py`` dataset_A/B).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


class CocoDetDataset:
    def __init__(
        self,
        data_root: str,
        ann_file: str,
        data_prefix: str = "images/",
        img_scale: Tuple[int, int] = (128, 128),
        max_gt: int = 64,
        flip_prob: float = 0.5,
        train: bool = True,
        mosaic_prob: float = 0.0,
        affine_scale: Tuple[float, float] = (0.5, 1.5),
        mixup_prob: float = 0.0,
        hsv_prob: float = 0.0,
    ):
        self.data_root = data_root
        self.img_dir = os.path.join(data_root, data_prefix)
        with open(ann_file if os.path.isabs(ann_file) else os.path.join(data_root, ann_file)) as f:
            coco = json.load(f)
        self.images = coco["images"]
        anns_by_img: Dict[int, List[dict]] = {im["id"]: [] for im in self.images}
        for a in coco.get("annotations", []):
            anns_by_img.setdefault(a["image_id"], []).append(a)
        self.anns_by_img = anns_by_img
        self.img_scale = img_scale
        self.max_gt = max_gt
        self.flip_prob = flip_prob if train else 0.0
        self.train = train
        self.mosaic_prob = mosaic_prob if train else 0.0
        self.affine_scale = affine_scale
        self.mixup_prob = mixup_prob if train else 0.0
        self.hsv_prob = hsv_prob if train else 0.0
        # Per-call augmentation entropy: a counter mixed into the seed so the
        # same index gets DIFFERENT augmentations each epoch (train only).
        self._aug_calls = 0

    def __len__(self):
        return len(self.images)

    def _load_raw(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        info = self.images[index]
        path = os.path.join(self.img_dir, info["file_name"])
        img = np.asarray(Image.open(path).convert("RGB"), np.float32)
        boxes = []
        for a in self.anns_by_img.get(info["id"], []):
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        return img, boxes

    def _resize(self, img, boxes, out_w, out_h):
        h, w = img.shape[:2]
        img = np.asarray(
            Image.fromarray(img.astype(np.uint8)).resize((out_w, out_h), Image.BILINEAR),
            np.float32,
        )
        sx, sy = out_w / w, out_h / h
        if len(boxes):
            boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
        return img, boxes

    def _hsv_jitter(self, img, rng):
        # YOLOXHSVRandomAug-style gains.
        import colorsys  # noqa: F401  (documentation only; vector math below)

        dh = rng.uniform(-5, 5)
        ds = rng.uniform(-30, 30)
        dv = rng.uniform(-30, 30)
        x = img / 255.0
        mx = x.max(-1)
        mn = x.min(-1)
        # cheap HSV-ish jitter in RGB space: scale value + saturation.
        v = np.clip(mx * 255 + dv, 0, 255) / 255.0
        scale_s = np.clip((mx - mn) * 255 + ds, 0, 255) / np.maximum((mx - mn) * 255, 1)
        mean = x.mean(-1, keepdims=True)
        x = np.clip((x - mean) * scale_s[..., None] + mean, 0, 1)
        x = x * np.where(mx[..., None] > 0, (v / np.maximum(mx, 1e-6))[..., None], 1.0)
        del dh
        return np.clip(x * 255.0, 0, 255)

    def _mosaic(self, index: int, rng) -> Tuple[np.ndarray, np.ndarray]:
        """4-image mosaic at 2x scale then random-crop back (Mosaic+Affine-lite)."""
        out_w, out_h = self.img_scale
        canvas = np.zeros((out_h * 2, out_w * 2, 3), np.float32)
        all_boxes = []
        idxs = [index] + [int(rng.integers(len(self))) for _ in range(3)]
        for k, (ox, oy) in enumerate([(0, 0), (out_w, 0), (0, out_h), (out_w, out_h)]):
            img, boxes = self._load_raw(idxs[k])
            img, boxes = self._resize(img, boxes, out_w, out_h)
            canvas[oy : oy + out_h, ox : ox + out_w] = img
            if len(boxes):
                all_boxes.append(boxes + np.array([ox, oy, ox, oy], np.float32))
        boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4), np.float32)
        # Random scale + crop back to img_scale (RandomAffine-lite).
        s = rng.uniform(*self.affine_scale)
        cw, ch = int(out_w * 2 * s), int(out_h * 2 * s)
        canvas, boxes = self._resize(canvas, boxes, cw, ch)
        x0 = int(rng.integers(0, max(1, cw - out_w)))
        y0 = int(rng.integers(0, max(1, ch - out_h)))
        img = canvas[y0 : y0 + out_h, x0 : x0 + out_w]
        if img.shape[0] != out_h or img.shape[1] != out_w:
            img, boxes = self._resize(img, boxes, out_w, out_h)
            x0 = y0 = 0
        if len(boxes):
            boxes = boxes - np.array([x0, y0, x0, y0], np.float32)
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, out_w)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, out_h)
            keep = (boxes[:, 2] - boxes[:, 0] > 2) & (boxes[:, 3] - boxes[:, 1] > 2)
            boxes = boxes[keep]
        return img, boxes

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        if self.train:
            self._aug_calls += 1
            rng = np.random.default_rng((self._aug_calls * 2654435761 + index) % (2**31))
        else:
            rng = np.random.default_rng(index)
        out_w, out_h = self.img_scale
        if self.train and rng.random() < self.mosaic_prob:
            img, boxes = self._mosaic(index, rng)
            if rng.random() < self.mixup_prob:
                img2, boxes2 = self._mosaic(int(rng.integers(len(self))), rng)
                r = 0.5
                img = img * r + img2 * (1 - r)
                boxes = np.concatenate([boxes, boxes2])
        else:
            img, boxes = self._load_raw(index)
            img, boxes = self._resize(img, boxes, out_w, out_h)

        if self.train and self.hsv_prob > 0 and rng.random() < self.hsv_prob:
            img = self._hsv_jitter(img, rng)

        if self.train and rng.random() < self.flip_prob:
            img = img[:, ::-1]
            if len(boxes):
                x1 = out_w - boxes[:, 2]
                x2 = out_w - boxes[:, 0]
                boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=1)

        gt = np.zeros((self.max_gt, 4), np.float32)
        valid = np.zeros(self.max_gt, bool)
        nb = min(len(boxes), self.max_gt)
        if nb:
            gt[:nb] = boxes[:nb]
            valid[:nb] = True

        info = self.images[index]
        # Scale back to original-image coords for test-time records
        # (mmdet rescale=True semantics: predictions in ori_shape space).
        sx = info.get("width", out_w) / out_w
        sy = info.get("height", out_h) / out_h
        return {
            "image": (img / 255.0).astype(np.float32),
            "gt_boxes": gt,
            "gt_valid": valid,
            "image_id": np.int32(info["id"]),
            "scale_back": np.asarray([sx, sy, sx, sy], np.float32),
        }

    def file_name(self, image_id: int) -> str:
        for im in self.images:
            if im["id"] == image_id:
                return im["file_name"]
        raise KeyError(image_id)


class ConcatDataset:
    """Concatenation of datasets with identical output schema
    (Synthetic_Target stage: with-cars + without-cars)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, index: int):
        di = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[di][index - int(self._offsets[di])]
