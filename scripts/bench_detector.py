"""Detector throughput benchmark (train steps/sec + labeling img/sec).

The annotation pipeline trains 4 detector families x 3 stages (up to 1000
epochs, global batch 64-1024 — SURVEY.md §6.3) and labels 10k-image synthetic
sets twice; this measures both phases at the production geometry (112px
images, img_scale 128, reference per-stage batch size) on whatever backend is
attached. Synthetic random data — throughput is content-independent.

Usage:
  python scripts/bench_detector.py --family yolov8 --stage real_source \
      [--steps 60] [--label-images 1024] [--batch-size N] [--plain-aug]

Prints one JSON line per phase:
  {"metric": "yolov8/Real_Source train", "value": ..., "unit": "img/s", ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:  # runnable without an editable install
    sys.path.insert(0, _REPO_ROOT)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO_ROOT, ".jax_cache"),
)


def make_noise_dataset(root: str, n_images: int, size: int = 112, seed: int = 0,
                       box_px: float = 42.36) -> None:
    """images/ + ann.json of random noise with 1-4 fixed-size boxes each."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        arr = rng.randint(0, 255, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.png"))
        images.append({"id": i, "file_name": f"{i}.png", "width": size, "height": size})
        for _ in range(rng.randint(1, 5)):
            cx, cy = rng.uniform(0, size, 2)
            x, y = cx - box_px / 2, cy - box_px / 2
            annotations.append({
                "id": aid, "image_id": i, "category_id": 1,
                "bbox": [float(x), float(y), box_px, box_px],
                "area": box_px * box_px, "iscrowd": 0,
            })
            aid += 1
    with open(os.path.join(root, "ann.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "small"}]}, f)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="yolov8")
    p.add_argument("--stage", default="Real_Source")
    p.add_argument("--steps", type=int, default=60, help="train steps to run")
    p.add_argument("--batch-size", type=int, default=None,
                   help="override the preset's (global) batch size")
    p.add_argument("--label-images", type=int, default=1024)
    p.add_argument("--plain-aug", action="store_true",
                   help="flip+resize only: isolates device step time from the "
                        "host-side mosaic/mixup cost on small-host machines")
    p.add_argument("--device-aug", action="store_true",
                   help="render the aug on the accelerator (detect/device_aug)")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--skip-label", action="store_true")
    args = p.parse_args(argv)

    import jax

    # sitecustomize on this image ignores the JAX_PLATFORMS env var; honor it
    # explicitly so `JAX_PLATFORMS=cpu` smoke runs never touch the TPU tunnel.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from agenda_tpu.detect.configs import DatasetSpec, plain_aug, preset
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.runner import DetectorRunner

    tmp = tempfile.mkdtemp(prefix="bench_det_")
    data_root = os.path.join(tmp, "data")
    os.makedirs(data_root)

    cfg = preset(args.stage.lower(), args.family,
                 train=[DatasetSpec(data_root, "ann.json")],
                 output_dir=os.path.join(tmp, "work"))
    if args.batch_size:
        cfg.runner.batch_size = args.batch_size
    bs = cfg.runner.batch_size
    n_images = max(2 * bs, 256)
    make_noise_dataset(data_root, n_images)
    if args.plain_aug:
        cfg.aug = plain_aug()
    if args.device_aug:
        cfg.runner.device_aug = True

    # enough epochs for ~args.steps optimizer steps, no val/mosaic-close
    steps_per_epoch = (n_images + bs - 1) // bs
    cfg.runner.max_epochs = max(2, (args.steps + steps_per_epoch - 1) // steps_per_epoch)
    cfg.runner.val_interval = 10_000
    cfg.runner.close_mosaic_epochs = 0
    cfg.runner.log_interval = max(10, steps_per_epoch)
    os.makedirs(cfg.runner.output_dir, exist_ok=True)

    family = cfg.build_family()
    runner = DetectorRunner(family, cfg.runner)
    train_ds = cfg.build_train_dataset()

    ndev = len(jax.devices())

    if not args.skip_train:
        t0 = time.time()
        variables = runner.train(train_ds)
        wall = time.time() - t0
        # steady state: sps entries from metrics.jsonl after the compile step
        sps = []
        with open(os.path.join(cfg.runner.output_dir, "metrics.jsonl")) as f:
            for line in f:
                m = json.loads(line)
                if "sps" in m and m.get("step", 0) > 2:
                    sps.append(m["sps"])
        steady = max(sps) if sps else (cfg.runner.max_epochs * steps_per_epoch) / wall
        print(json.dumps({
            "metric": f"{args.family}/{args.stage} train"
                      + (" [plain-aug]" if args.plain_aug else "")
                      + (" [device-aug]" if args.device_aug else ""),
            "value": round(steady * bs, 2), "unit": "img/s",
            "steps_per_sec": round(steady, 3), "global_batch": bs,
            "devices": ndev, "wall_s": round(wall, 1),
        }))
        sys.stdout.flush()
    else:
        variables = runner.family.init_variables(jax.random.key(0))

    if not args.skip_label:
        label_root = os.path.join(tmp, "label")
        os.makedirs(label_root)
        make_noise_dataset(label_root, args.label_images, seed=7)
        eval_ds = CocoDetDataset(label_root, "ann.json",
                                 img_scale=cfg.img_scale, train=False)
        # warmup batch compiles predict
        runner.test(variables, eval_ds if len(eval_ds) <= bs else
                    _Slice(eval_ds, bs))
        t0 = time.time()
        recs = runner.test(variables, eval_ds)
        wall = time.time() - t0
        print(json.dumps({
            "metric": f"{args.family}/{args.stage} labeling",
            "value": round(len(recs) / wall, 2), "unit": "img/s",
            "images": len(recs), "wall_s": round(wall, 2), "devices": ndev,
        }))


class _Slice:
    """First-n view of a dataset; forwards everything else (train,
    source_size, item_u8, img_scale, ...) so the warmup compiles the SAME
    predict program (host or device-resize) as the timed run."""

    def __init__(self, ds, n):
        self.ds, self.n = ds, min(n, len(ds))

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.ds[i]

    def __getattr__(self, name):
        return getattr(self.ds, name)


if __name__ == "__main__":
    main()
