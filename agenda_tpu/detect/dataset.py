"""COCO detection dataset + augmentation for the detector trainers.

Replaces mmdet's ``CocoDataset`` + train pipelines for the reference's
configs: images resized to ``img_scale`` (128x128 over the 112x112 aerial
tiles), and a per-stage ``AugConfig`` recipe (``agenda_tpu/detect/augment.py``)
reproducing the mm transforms host-side in numpy —
Mosaic / RandomAffine / MixUp / Albu-photometric / HSV / flip for the heavy
stages, LSJ for the ViTDet heatmap stage, plain resize+flip otherwise
(stage->recipe matrix in ``configs.py``, mirroring the reference config
diffs: ``Real_Source/faster-rcnn.py:170-233``,
``Synthetic_Heatmap/001_lsj-100e_LINZ-heatmap.py:36-57``).

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

from agenda_tpu.detect.augment import (
    AugConfig,
    blur,
    clahe,
    flip_horizontal,
    hsv_jitter,
    lsj,
    median_blur,
    mixup,
    mosaic,
    random_affine,
    to_gray,
)


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
        aug: Optional[AugConfig] = None,
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
        self.train = train
        self.aug = (aug if aug is not None else AugConfig(flip_prob=flip_prob)) if train \
            else AugConfig(flip_prob=0.0)
        # Per-call augmentation entropy: a counter mixed into the seed so the
        # same index gets DIFFERENT augmentations each epoch (train only).
        self._aug_calls = 0
        # In-RAM cache of decoded+resized tiles (uint8 + scaled boxes).
        # Mosaic+MixUp read 4-8 source images per training sample, so at the
        # reference's 112px tiles (10k-image sets ~= 470 MB at img_scale 128)
        # caching removes the decode+resize from every epoch after the first.
        # Capped by AGENDA_TPU_IMG_CACHE_MB (0 disables).
        cache_mb = float(os.environ.get("AGENDA_TPU_IMG_CACHE_MB", "2048"))
        est_mb = len(self.images) * img_scale[0] * img_scale[1] * 3 / 1e6
        self._scaled_cache: Optional[Dict[int, tuple]] = (
            {} if 0 < est_mb <= cache_mb else None)

    def __len__(self):
        return len(self.images)

    def _load_raw(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        from agenda_tpu.data.native_image import load_rgb

        info = self.images[index]
        path = os.path.join(self.img_dir, info["file_name"])
        # native PNG/JPEG decode (C++, libpng/libjpeg) with PIL fallback
        img = load_rgb(path).astype(np.float32)
        boxes = []
        for a in self.anns_by_img.get(info["id"], []):
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        return img, boxes

    def _resize(self, img, boxes, out_w, out_h):
        from agenda_tpu.data.native_image import available, resize_bilinear

        h, w = img.shape[:2]
        u8 = img.astype(np.uint8)
        if available():
            img = resize_bilinear(u8, out_w, out_h).astype(np.float32)
        else:
            img = np.asarray(
                Image.fromarray(u8).resize((out_w, out_h), Image.BILINEAR), np.float32
            )
        sx, sy = out_w / w, out_h / h
        if len(boxes):
            boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
        return img, boxes

    def scaled_boxes(self, index: int) -> np.ndarray:
        """Boxes at img_scale WITHOUT materializing the f32 image copy.

        The device-aug planner reads 4-8 tiles' boxes per sample
        (mosaic + mixup); going through ``_load_scaled`` would pay a
        ~200 KB uint8->f32 image conversion per read — ~250 ms per
        512-batch of pure waste on the plan-building critical path."""
        if self._scaled_cache is not None:
            hit = self._scaled_cache.get(index)
            if hit is None:
                self._load_scaled(index)  # fills the cache
                hit = self._scaled_cache[index]
            return hit[1].copy()
        return self._load_scaled(index)[1]

    def _load_scaled(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._scaled_cache is not None:
            hit = self._scaled_cache.get(index)
            if hit is None:
                img, boxes = self._load_raw(index)
                img, boxes = self._resize(img, boxes, *self.img_scale)
                # uint8 round-trips exactly: _resize outputs integral values
                # (native resize emits uint8; PIL likewise).
                hit = (img.astype(np.uint8), boxes)
                self._scaled_cache[index] = hit
            img_u8, boxes = hit
            # fresh arrays: downstream aug must never mutate the cache
            return img_u8.astype(np.float32), boxes.copy()
        img, boxes = self._load_raw(index)
        return self._resize(img, boxes, *self.img_scale)

    def _mosaic_affine(self, index: int, rng) -> Tuple[np.ndarray, np.ndarray]:
        a = self.aug
        img, boxes = mosaic(self._load_scaled, index, len(self), rng, self.img_scale)
        return random_affine(
            img, boxes, rng, self.img_scale,
            max_rotate_degree=a.max_rotate_degree,
            max_shear_degree=a.max_shear_degree,
            scaling_ratio_range=(1 - a.affine_scale, 1 + a.affine_scale),
            max_translate_ratio=a.max_translate_ratio,
        )

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        if self.train:
            self._aug_calls += 1
            rng = np.random.default_rng((self._aug_calls * 2654435761 + index) % (2**31))
        else:
            rng = np.random.default_rng(index)
        a = self.aug
        out_w, out_h = self.img_scale
        skip_tail_flip = False

        if self.train and a.mosaic:
            img, boxes = self._mosaic_affine(index, rng)
            if rng.random() < a.mixup_prob:
                j = int(rng.integers(len(self)))
                if a.mixup_mosaic_pre:  # YOLOv5MixUp: retrieved sample is mosaic'd
                    img2, boxes2 = self._mosaic_affine(j, rng)
                else:  # mmdet MixUp: raw retrieved sample
                    img2, boxes2 = self._load_scaled(j)
                img, boxes = mixup(img, boxes, img2, boxes2, rng)
        elif self.train and a.standalone_affine:
            # Mosaic-close stage 2: affine on the single resized image, no
            # mosaic border (Real_Source/yolov8.py:116-134, max_aspect_ratio
            # 100 there — effectively unfiltered at these box sizes).
            img, boxes = self._load_scaled(index)
            img, boxes = random_affine(
                img, boxes, rng, self.img_scale,
                max_rotate_degree=a.max_rotate_degree,
                max_shear_degree=a.max_shear_degree,
                scaling_ratio_range=(1 - a.affine_scale, 1 + a.affine_scale),
                max_translate_ratio=a.max_translate_ratio,
                max_aspect_ratio=100.0,
            )
        elif self.train and a.lsj:
            # LSJ pipeline order: flip BEFORE resize/crop
            # (001_lsj-100e_LINZ-heatmap.py:42-57).
            img, boxes = self._load_raw(index)
            if rng.random() < a.flip_prob:
                img, boxes = flip_horizontal(img, boxes)
            img, boxes = lsj(img, boxes, rng, self.img_scale,
                             ratio_range=a.lsj_ratio_range)
            skip_tail_flip = True
        else:
            img, boxes = self._load_scaled(index)

        if self.train:
            # Albu photometric block, then HSV — last_transform order
            # (Real_Source/faster-rcnn.py:181-195).
            if a.blur_prob > 0 and rng.random() < a.blur_prob:
                img = blur(img, rng)
            if a.median_blur_prob > 0 and rng.random() < a.median_blur_prob:
                img = median_blur(img, rng)
            if a.to_gray_prob > 0 and rng.random() < a.to_gray_prob:
                img = to_gray(img)
            if a.clahe_prob > 0 and rng.random() < a.clahe_prob:
                img = clahe(img)
            if a.hsv:
                img = hsv_jitter(img, rng, a.hue_delta, a.saturation_delta,
                                 a.value_delta)
            if not skip_tail_flip and rng.random() < a.flip_prob:
                img, boxes = flip_horizontal(img, boxes)

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
            "image": (np.ascontiguousarray(img) / 255.0).astype(np.float32),
            "gt_boxes": gt,
            "gt_valid": valid,
            "image_id": np.int32(info["id"]),
            "scale_back": np.asarray([sx, sy, sx, sy], np.float32),
        }

    def source_size(self) -> Optional[Tuple[int, int]]:
        """(w, h) when every image shares one size (COCO metadata), else
        None — gates the eval-time device-resize fast path."""
        if not self.images:
            return None
        w0 = self.images[0].get("width")
        h0 = self.images[0].get("height")
        if not w0 or not h0:
            return None
        for im in self.images:
            if im.get("width") != w0 or im.get("height") != h0:
                return None
        return int(w0), int(h0)

    def item_u8(self, index: int,
                expect_size: Optional[Tuple[int, int]] = None) -> Dict[str, np.ndarray]:
        """Eval-time fast path: decoded uint8 at SOURCE size + boxes scaled
        to img_scale — the device resizes pixels (runner._predict_batches),
        the host only decodes. Matches ``__getitem__``'s eval output after
        the device resize to ~1 LSB. ``expect_size`` (w, h) guards against
        COCO metadata lying about a file's real size: a mismatching tile is
        host-resized to the expected size so the batch still stacks (boxes
        always scale by the ACTUAL decoded dims, like the host path)."""
        from agenda_tpu.data.native_image import load_rgb

        info = self.images[index]
        img = load_rgb(os.path.join(self.img_dir, info["file_name"]))
        out_w, out_h = self.img_scale
        h, w = img.shape[:2]
        if expect_size is not None and (w, h) != tuple(expect_size):
            from agenda_tpu.data.native_image import available, resize_bilinear

            ew, eh = expect_size
            if available():
                img = resize_bilinear(img, ew, eh)
            else:
                img = np.asarray(Image.fromarray(img).resize((ew, eh),
                                                             Image.BILINEAR))
        boxes = []
        for a in self.anns_by_img.get(info["id"], []):
            x, y, bw, bh = a["bbox"]
            boxes.append([x, y, x + bw, y + bh])
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        if len(boxes):
            boxes = boxes * np.array([out_w / w, out_h / h] * 2, np.float32)
        gt = np.zeros((self.max_gt, 4), np.float32)
        valid = np.zeros(self.max_gt, bool)
        nb = min(len(boxes), self.max_gt)
        if nb:
            gt[:nb] = boxes[:nb]
            valid[:nb] = True
        sx = info.get("width", out_w) / out_w
        sy = info.get("height", out_h) / out_h
        return {
            "image_u8": img,
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

    @property
    def max_gt(self) -> int:
        return max(getattr(d, "max_gt", 0) for d in self.datasets)

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, index: int):
        di = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[di][index - int(self._offsets[di])]
