"""Detector family adapters for the DetectorRunner.

Each family packages (model, init, loss, predict) behind the runner's
interface. Families mirror the reference's 4-detector zoo (SURVEY.md §2.1
detector configs): YOLOv8 (anchor-free), Faster R-CNN (two-stage), YOLOv5
(anchor-based), ViTDet — implemented progressively, YOLOv8 + Faster R-CNN
first (they anchor the published pipeline: FasterRCNN drives the pseudo-label
chain, YOLOv8 posts the best LINZ->UGRC AP50).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from agenda_tpu.detect.yolov8 import (
    YOLOv8,
    YOLOv8Config,
    yolov8_loss,
    yolov8_predict,
)


@dataclasses.dataclass
class YOLOv8Family:
    config: YOLOv8Config = dataclasses.field(default_factory=YOLOv8Config)
    score_thr: float = 0.001
    iou_thr: float = 0.7
    max_dets: int = 300

    def __post_init__(self):
        self.model = YOLOv8(self.config)

    def init_variables(self, rng) -> Dict[str, Any]:
        s = self.config.img_size
        return self.model.init(rng, jnp.zeros((1, s, s, 3)), train=True)

    def loss_fn(self, variables, batch, rng):
        del rng
        outs, new_state = self.model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            batch["image"],
            train=True,
            mutable=["batch_stats"],
        )
        loss, metrics = yolov8_loss(outs, batch, self.config)
        return loss, (metrics, new_state["batch_stats"])

    def predict_fn(self, variables, images):
        outs = self.model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            images,
            train=False,
        )
        return yolov8_predict(outs, self.config, self.score_thr, self.iou_thr, self.max_dets)


def build_family(name: str, **kw):
    if name in ("yolov8", "yolov8n"):
        return YOLOv8Family(YOLOv8Config(**kw.get("model", {})), **kw.get("predict", {}))
    if name == "yolov8s":
        mk = dict(depth=0.33, width=0.5, ratio=2.0)
        mk.update(kw.get("model", {}))
        return YOLOv8Family(YOLOv8Config(**mk), **kw.get("predict", {}))
    if name in ("faster-rcnn", "faster_rcnn"):
        from agenda_tpu.detect.faster_rcnn import FasterRCNNFamily, FasterRCNNConfig

        return FasterRCNNFamily(FasterRCNNConfig(**kw.get("model", {})), **kw.get("predict", {}))
    if name in ("yolov5", "yolov5m"):
        from agenda_tpu.detect.yolov5 import YOLOv5Config, YOLOv5Family

        return YOLOv5Family(YOLOv5Config(**kw.get("model", {})), **kw.get("predict", {}))
    if name == "yolov5s":
        from agenda_tpu.detect.yolov5 import YOLOv5Config, YOLOv5Family

        mk = dict(depth=0.33, width=0.5)
        mk.update(kw.get("model", {}))
        return YOLOv5Family(YOLOv5Config(**mk), **kw.get("predict", {}))
    if name == "vitdet":
        from agenda_tpu.detect.vitdet import ViTDetConfig, ViTDetFamily

        return ViTDetFamily(ViTDetConfig(**kw.get("model", {})), **kw.get("predict", {}))
    raise ValueError(f"Unknown detector family: {name}")
