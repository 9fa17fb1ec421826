"""Pseudo-label refinement with a binary crop classifier.

Functional equivalent of ``data_annotation/refine_label.py``:

1. ``construct_data``: bucket detections per image — the image's top-1
   detection and anything with score >= pos_thresh become positive training
   crops (and immediate COCO annotations), score < neg_thresh negative crops,
   the in-between band unlabeled test crops; score < hard_neg_thresh is
   dropped entirely. Boxes are edge-completed 42.36-px squares
   (refine_label.py:17-159).
2. Train a ResNet-50 (1-logit head, BCE) on 224x224 crops; track best
   accuracy and best macro-F1 (refine_label.py:326-348).
3. Classify the unlabeled crops; positives are appended to the COCO
   annotations with label -1, annotations re-sorted by image_id and re-id'd
   (refine_label.py:353-373).

TPU-first: the classifier train/eval/test loops are jit'd batch steps over a
dp mesh; crops are decoded host-side into dense arrays once.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from agenda_tpu.annotate.boxes import complete_edge_boxes

DEFAULT_CATEGORIES = [{"id": 1, "name": "small"}]


@dataclasses.dataclass
class RefineData:
    train_crops: List[Image.Image]
    train_labels: List[int]
    test_crops: List[Image.Image]
    test_anns: List[dict]  # COCO-style dicts for unlabeled crops (id-indexed)
    annotations_coco: dict


def construct_data(
    detection_results: List[dict],
    pos_thresh: float,
    neg_thresh: float,
    hard_neg_thresh: float,
    bboxes_size_px: float = 42.36,
    image_size: Tuple[int, int] = (112, 112),
    rgb_image_base_path: Optional[str] = None,
) -> RefineData:
    categories = DEFAULT_CATEGORIES
    coco = {"categories": categories, "images": [], "annotations": []}
    train_crops: List[Image.Image] = []
    train_labels: List[int] = []
    test_crops: List[Image.Image] = []
    test_anns: List[dict] = []

    for i_im, rec in enumerate(detection_results):
        file_name = os.path.basename(rec["img_path"])
        rgb = Image.open(os.path.join(rgb_image_base_path, file_name)).convert("RGB")
        coco["images"].append(
            {"id": i_im, "file_name": file_name,
             "width": rgb.size[0], "height": rgb.size[1]}
        )
        pred = rec.get("pred_instances")
        if pred is None or len(pred["scores"]) == 0:
            continue
        scores = np.asarray(pred["scores"], np.float64)
        labels = np.asarray(pred["labels"], np.int64)
        boxes = np.asarray(pred["bboxes"], np.float64).reshape(-1, 4)

        keep = scores >= hard_neg_thresh
        scores, labels, boxes = scores[keep], labels[keep], boxes[keep]
        full = complete_edge_boxes(boxes, (rgb.size[0], rgb.size[1]),
                                   bboxes_size_px, mode="extend")
        # NOTE: the reference clips against its (112,112) image_size default;
        # rgb.size is (112,112) in the pipeline, identical numbers.
        for i in range(len(scores)):
            l, t, r, b = (float(v) for v in full[i])
            w_bbox, h_bbox = r - l, b - t
            crop = rgb.crop((l, t, r, b))
            s = scores[i]
            if i == 0 or s >= pos_thresh:  # top-1 + confident -> positive
                train_crops.append(crop)
                train_labels.append(1)
                coco["annotations"].append(
                    {
                        "iscrowd": 0,
                        "category_id": categories[int(labels[i])]["id"],
                        "image_id": i_im,
                        "bbox": [l, t, w_bbox, h_bbox],
                        "area": w_bbox * h_bbox,
                        "label": 1,
                    }
                )
            elif s < neg_thresh:
                train_crops.append(crop)
                train_labels.append(0)
            else:
                test_anns.append(
                    {
                        "iscrowd": 0,
                        "category_id": categories[int(labels[i])]["id"],
                        "image_id": i_im,
                        "bbox": [l, t, w_bbox, h_bbox],
                        "area": w_bbox * h_bbox,
                        "id": len(test_anns),
                        "label": -1,
                    }
                )
                test_crops.append(crop)

    return RefineData(train_crops, train_labels, test_crops, test_anns, coco)


def crops_to_array(crops: List[Image.Image], size: int = 224,
                   hflip_rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Crops -> (N, size, size, 3) f32 in [0,1] (optionally random-hflipped)."""
    out = np.zeros((len(crops), size, size, 3), np.float32)
    for i, c in enumerate(crops):
        arr = np.asarray(c.resize((size, size)), np.float32) / 255.0
        if hflip_rng is not None and hflip_rng.random() < 0.5:
            arr = arr[:, ::-1]
        out[i] = arr
    return out


def macro_f1_binary(preds: np.ndarray, labels: np.ndarray) -> float:
    """Macro F1 over {0,1} (torchmetrics F1Score(multiclass, 2, macro))."""
    f1s = []
    for cls in (0, 1):
        tp = np.sum((preds == cls) & (labels == cls))
        fp = np.sum((preds == cls) & (labels != cls))
        fn = np.sum((preds != cls) & (labels == cls))
        denom = 2 * tp + fp + fn
        f1s.append(2 * tp / denom if denom > 0 else 0.0)
    return float(np.mean(f1s))


def append_positive_test_annotations(
    coco: dict, test_anns: List[dict], pos_ids: List[int]
) -> dict:
    """Append classifier-positive unlabeled crops, re-sort + re-id
    (refine_label.py:355-373)."""
    by_id = {a["id"]: a for a in test_anns}
    for pid in pos_ids:
        a = by_id[pid]
        coco["annotations"].append(
            {
                "iscrowd": a["iscrowd"],
                "category_id": a["category_id"],
                "image_id": a["image_id"],
                "bbox": a["bbox"],
                "area": a["area"],
                "label": -1,
            }
        )
    coco["annotations"] = sorted(coco["annotations"], key=lambda x: x["image_id"])
    for i, ann in enumerate(coco["annotations"]):
        ann["id"] = i
    return coco
