"""Experiment tracking: scalar/image logging with the reference's surface.

The reference logs through accelerate trackers (tensorboard or wandb chosen
by ``--report_to``, ``finetune_sd.py:358-366, 696-701, 839``). Here:

- scalars always append to ``<logging_dir>/metrics.jsonl`` (durable, greppable);
- ``--report_to tensorboard`` additionally writes TB event files when a
  tensorboard writer is importable (torch.utils.tensorboard or tensorboardX);
- validation image grids are saved as PNGs under ``<logging_dir>/images/``
  (and to TB when available) — replacing ``tracker.writer.add_images``
  (``finetune_sd.py:116-127``).

wandb is not available in this environment; ``--report_to wandb`` degrades to
the JSONL tracker with a warning.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import numpy as np

# orbax/absl INFO logs flood training output; keep warnings and errors.
logging.getLogger("absl").setLevel(logging.WARNING)


class Tracker:
    def __init__(self, logging_dir: str, report_to: str = "tensorboard", config: Optional[dict] = None):
        self.logging_dir = logging_dir
        os.makedirs(logging_dir, exist_ok=True)
        self.jsonl = open(os.path.join(logging_dir, "metrics.jsonl"), "a")
        self.tb = None
        if report_to in ("tensorboard", "all"):
            for mod in ("torch.utils.tensorboard", "tensorboardX"):
                try:
                    import importlib

                    tb_mod = importlib.import_module(mod)
                    self.tb = tb_mod.SummaryWriter(logging_dir)
                    break
                except Exception:
                    continue
        if config is not None:
            with open(os.path.join(logging_dir, "config.json"), "w") as f:
                json.dump({k: _jsonable(v) for k, v in config.items()}, f, indent=2)

    def log(self, scalars: Dict[str, float], step: int) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), int(step))

    def log_images(self, tag: str, images: np.ndarray, step: int) -> None:
        """images: (N, H, W, 3) uint8."""
        from PIL import Image

        img_dir = os.path.join(self.logging_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in tag)[:80]
        for i, im in enumerate(images):
            Image.fromarray(im).save(os.path.join(img_dir, f"{safe}_step{step}_{i}.png"))
        if self.tb is not None:
            self.tb.add_images(tag, images, step, dataformats="NHWC")

    def close(self) -> None:
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)
