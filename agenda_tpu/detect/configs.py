"""Detector stage configurations (the reference's mm-config matrix as dataclasses).

The reference drives 4 detector families through 3 pipeline stages with
mm-style ``_base_``-inherited python configs (``data_annotation/configs/
{Real_Source,Synthetic_Heatmap,Synthetic_Target}/*.py``). Here each stage is
an explicit dataclass preset (SURVEY.md §7 "configs become dataclasses"):

- ``real_source``: train on real source tiles with the heavy aug pipeline
  (Mosaic/MixUp/flip — faster-rcnn.py:170-233), COCO-pretrained init when
  weights are supplied, SGD lr 0.2, bs 64, 1000 epochs;
- ``synthetic_heatmap``: train on synthetic heatmap stacks with pseudo
  annotations, plain resize+flip, lr 0.02, 500 epochs;
- ``synthetic_target``: final model on synthetic-target RGB (refined
  pseudo-ann) + without-cars negatives, val/test on real target, bs 256,
  1000 epochs.

Everything serializes to/from JSON so runs are reproducible from a single
file (``det_train.py --config run.json``).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Tuple

from agenda_tpu.detect.runner import RunnerConfig


@dataclasses.dataclass
class DatasetSpec:
    data_root: str
    ann_file: str
    data_prefix: str = "images/"


@dataclasses.dataclass
class DetectionConfig:
    detector: str = "yolov8"  # yolov8 | yolov8s | faster-rcnn
    model: Dict[str, Any] = dataclasses.field(default_factory=dict)
    predict: Dict[str, Any] = dataclasses.field(default_factory=dict)
    train_datasets: List[DatasetSpec] = dataclasses.field(default_factory=list)
    val_dataset: Optional[DatasetSpec] = None
    test_dataset: Optional[DatasetSpec] = None
    img_scale: Tuple[int, int] = (128, 128)
    max_gt: int = 64
    # augmentation (Real_Source stage turns these on)
    mosaic_prob: float = 0.0
    mixup_prob: float = 0.0
    hsv_prob: float = 0.0
    flip_prob: float = 0.5
    runner: RunnerConfig = dataclasses.field(default_factory=RunnerConfig)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def from_json(cls, path: str) -> "DetectionConfig":
        with open(path) as f:
            d = json.load(f)
        d["runner"] = RunnerConfig(**d.get("runner", {}))
        d["train_datasets"] = [DatasetSpec(**x) for x in d.get("train_datasets", [])]
        for k in ("val_dataset", "test_dataset"):
            if d.get(k):
                d[k] = DatasetSpec(**d[k])
        d["img_scale"] = tuple(d.get("img_scale", (128, 128)))
        return cls(**d)

    # -- dataset/famiy builders --------------------------------------------

    def build_family(self):
        from agenda_tpu.detect.families import build_family

        model = dict(self.model)
        model.setdefault("img_size", self.img_scale[0])
        model.setdefault("max_gt", self.max_gt)
        return build_family(self.detector, model=model, predict=self.predict)

    def build_train_dataset(self):
        from agenda_tpu.detect.dataset import CocoDetDataset, ConcatDataset

        parts = [
            CocoDetDataset(
                s.data_root, s.ann_file, s.data_prefix, self.img_scale, self.max_gt,
                flip_prob=self.flip_prob, train=True,
                mosaic_prob=self.mosaic_prob, mixup_prob=self.mixup_prob,
                hsv_prob=self.hsv_prob,
            )
            for s in self.train_datasets
        ]
        return parts[0] if len(parts) == 1 else ConcatDataset(parts)

    def build_eval_dataset(self, spec: DatasetSpec):
        from agenda_tpu.detect.dataset import CocoDetDataset

        return CocoDetDataset(
            spec.data_root, spec.ann_file, spec.data_prefix, self.img_scale,
            self.max_gt, train=False,
        )


def preset(
    stage: str,
    detector: str,
    train: List[DatasetSpec],
    val: Optional[DatasetSpec] = None,
    test: Optional[DatasetSpec] = None,
    output_dir: str = "work_dirs/run",
    **overrides,
) -> DetectionConfig:
    """Stage presets mirroring the reference's per-stage hyperparameters."""
    if stage == "real_source":
        runner = RunnerConfig(output_dir=output_dir, max_epochs=1000, batch_size=8,
                              lr=0.2, optimizer="sgd", val_interval=5)
        aug = dict(mosaic_prob=0.8, mixup_prob=0.3, hsv_prob=0.5)
    elif stage == "synthetic_heatmap":
        runner = RunnerConfig(output_dir=output_dir, max_epochs=500, batch_size=8,
                              lr=0.02, optimizer="sgd", val_interval=5)
        aug = dict()
    elif stage == "synthetic_target":
        runner = RunnerConfig(output_dir=output_dir, max_epochs=1000, batch_size=32,
                              lr=0.02, optimizer="sgd", val_interval=5)
        aug = dict()
    else:
        raise ValueError(f"Unknown stage {stage}")
    if detector.startswith("yolo"):
        runner.ema_decay = 0.9998  # mmyolo ExpMomentumEMA momentum=0.0002
    cfg = DetectionConfig(
        detector=detector, train_datasets=train, val_dataset=val,
        test_dataset=test, runner=runner, **aug,
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg
