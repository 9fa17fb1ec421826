"""CLI: detector inference -> prediction records
(== ``mmdetection/tools/test.py <config> <ckpt> --out prediction.pkl``).

Labels a dataset with a trained detector, writing the pickled per-image
record list the annotation stage consumes (threshold selection, pseudo-COCO
conversion, refine_label — SURVEY.md §3.4). Also prints bbox mAP/mAP50 when
the dataset has annotations.
"""

from __future__ import annotations

import argparse
import logging


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Detector test / labeling (TPU).")
    p.add_argument("--config", type=str, required=True, help="DetectionConfig JSON.")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="variables .safetensors (latest/best_* from det_train).")
    p.add_argument("--out", type=str, default=None, help="prediction.pkl output path.")
    p.add_argument("--test-root", type=str, default=None,
                   help="Override the config's test dataset root.")
    p.add_argument("--test-ann", type=str, default=None)
    p.add_argument("--test-prefix", type=str, default="images/")
    return p.parse_args(argv)


def main(argv=None):
    import jax

    from agenda_tpu.detect.configs import DatasetSpec, DetectionConfig
    from agenda_tpu.detect.coco_eval import evaluate_records
    from agenda_tpu.detect.runner import DetectorRunner, load_variables

    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    cfg = DetectionConfig.from_json(args.config)
    spec = cfg.test_dataset
    if args.test_root:
        spec = DatasetSpec(args.test_root, args.test_ann, args.test_prefix)
    if spec is None:
        raise ValueError("No test dataset in config; pass --test-root/--test-ann")

    family = cfg.build_family()
    runner = DetectorRunner(family, cfg.runner)
    dataset = cfg.build_eval_dataset(spec)
    variables = load_variables(args.checkpoint)
    variables = jax.tree.map(lambda x: x, variables)
    records = runner.test(variables, dataset, out_pkl=args.out)

    if any(len(r["gt_instances"]["bboxes"]) for r in records):
        res = evaluate_records(records)
        print({k: round(v, 4) for k, v in res.items()})
    if args.out:
        print(f"wrote {len(records)} records to {args.out}")
    return records


if __name__ == "__main__":
    main()
