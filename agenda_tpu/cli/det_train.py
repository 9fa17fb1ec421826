"""CLI: detector training (== ``mmdetection/tools/train.py <config>``).

Usage mirrors the reference's invocation shape (SURVEY.md §3.4):

    python -m agenda_tpu.cli.det_train --config run.json
    python -m agenda_tpu.cli.det_train --preset real_source --detector yolov8 \
        --train-root Data/Real/LINZ/train --train-ann annotations.json \
        --val-root Data/Real/LINZ/val --val-ann annotations.json \
        --work-dir work_dirs/yolov8_real_linz

A JSON config (DetectionConfig) is the canonical reproducible artifact; the
preset flags generate one and save it next to the checkpoints.
"""

from __future__ import annotations

import argparse
import logging
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Detector training (TPU).")
    p.add_argument("--config", type=str, default=None, help="DetectionConfig JSON.")
    p.add_argument("--preset", type=str, default=None,
                   choices=["real_source", "synthetic_heatmap", "synthetic_target"])
    p.add_argument("--detector", type=str, default="yolov8")
    p.add_argument("--train-root", type=str, action="append", default=None)
    p.add_argument("--train-ann", type=str, action="append", default=None)
    p.add_argument("--train-prefix", type=str, action="append", default=None)
    p.add_argument("--val-root", type=str, default=None)
    p.add_argument("--val-ann", type=str, default=None)
    p.add_argument("--val-prefix", type=str, default="images/")
    p.add_argument("--work-dir", type=str, default="work_dirs/run")
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--pretrained", type=str, default=None,
                   help="torch checkpoint (.pth/.safetensors) to initialize "
                        "from — the reference's load_from COCO init "
                        "(Real_Source/faster-rcnn.py:37).")
    p.add_argument("--auto-scale-lr", action="store_true",
                   help="Enable the linear lr scaling rule against the "
                        "config's base_batch_size — mmengine's opt-in "
                        "--auto-scale-lr (Real_Source/vitdet.py:431).")
    p.add_argument("--device-aug", action="store_true",
                   help="Render the train augmentations on the accelerator "
                        "from an HBM-resident dataset tensor (the host only "
                        "draws random numbers + box math); falls back to the "
                        "host pipeline for unsupported recipes (LSJ/concat).")
    p.add_argument("--device-aug-workers", type=int, default=0,
                   help="Worker processes that pre-build future epochs' "
                        "device-aug plans (bit-identical to serial; raises "
                        "the single-core plan-feed ceiling). 0 = serial.")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    from agenda_tpu.detect.configs import DatasetSpec, DetectionConfig, preset
    from agenda_tpu.detect.runner import DetectorRunner

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s")
    args = parse_args(argv)

    if args.config:
        cfg = DetectionConfig.from_json(args.config)
    else:
        if not (args.preset and args.train_root and args.train_ann):
            raise ValueError("Provide --config or (--preset --train-root --train-ann)")
        prefixes = args.train_prefix or ["images/"] * len(args.train_root)
        train = [
            DatasetSpec(r, a, pf)
            for r, a, pf in zip(args.train_root, args.train_ann, prefixes)
        ]
        val = (DatasetSpec(args.val_root, args.val_ann, args.val_prefix)
               if args.val_root else None)
        cfg = preset(args.preset, args.detector, train, val=val,
                     output_dir=args.work_dir)
    if args.pretrained is not None:
        cfg.pretrained = args.pretrained
    if args.max_epochs is not None:
        cfg.runner.max_epochs = args.max_epochs
    if args.batch_size is not None:
        cfg.runner.batch_size = args.batch_size
    if args.lr is not None:
        cfg.runner.lr = args.lr
    if args.auto_scale_lr:
        cfg.runner.auto_scale_lr = True
    if args.device_aug:
        cfg.runner.device_aug = True
    if args.device_aug_workers:
        cfg.runner.device_aug_workers = args.device_aug_workers
    cfg.runner.seed = args.seed
    cfg.runner.output_dir = args.work_dir if args.work_dir else cfg.runner.output_dir

    os.makedirs(cfg.runner.output_dir, exist_ok=True)
    cfg.to_json(os.path.join(cfg.runner.output_dir, "config.json"))

    family = cfg.build_family()
    runner = DetectorRunner(family, cfg.runner)
    train_ds = cfg.build_train_dataset()
    val_ds = cfg.build_eval_dataset(cfg.val_dataset) if cfg.val_dataset else None
    runner.train(train_ds, val_ds, resume=args.resume, pretrained=cfg.pretrained)


if __name__ == "__main__":
    main()
