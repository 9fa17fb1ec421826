"""Convergence-gate recalibration queue (VERDICT r4 #5/#6 + ADVICE r4).

Round-4 found the vitdet gate calibration stale (0.71 -> 0.804 after the
round-3 eval-path rework) and flagged two follow-ups:

- faster-rcnn / yolo gates still carry 2026-08-16 calibrations taken on the
  OLD eval path; re-measure everything on the current tree.
- the 16-image val set quantizes mAP coarsely ("a handful of boxes moves
  mAP50 several points") — grow val to 64 images and use multi-seed spread
  to justify gate margins instead of single-point measurements.
- the vitdet head-vs-backbone attribution (TINY_RCNN controls, vit4deep,
  data128, lr sweep — scripts/ablate_vitdet.py:60-80) had no recorded
  numbers.

This script runs a named queue of (ablation, train seed) jobs serially on
the 8-virtual-device CPU mesh — single-core host, so runs are sequential by
construction — and appends one JSON line per finished run to --out. Training
seed enters through RunnerConfig.seed (weight init + aug/shuffle streams);
the procedural dataset itself is fixed (train seed 0 / val seed 99 images),
matching how the gate tests build their data.

Reference semantics being checked: mmdet save_best selection on the val
mAP, /root/reference/data_annotation/configs/Real_Source/faster-rcnn.py:392-397.

    nice -n 10 python scripts/calibrate_gates.py --queue recal --out CALIB.jsonl

Queues:
    recal   gate configs for all 4 families at val_n=64, plus extra vitdet /
            faster-rcnn seeds for spread
    ablate  the vitdet head-vs-backbone matrix at val_n=64

Results land in the module docstring of tests/test_convergence.py and
scripts/ablate_vitdet.py once measured.
"""

import argparse
import json
import os
import sys
import tempfile
import time

# Hard override: the image pins JAX_PLATFORMS=axon for every process; this
# harness is defined to run on the virtual CPU mesh (same as the gate tests).
os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from ablate_vitdet import ABLATIONS  # noqa: E402
from convergence_data import make_hard_dataset  # noqa: E402

# gate configs exactly as tests/test_convergence.py builds them
GATES = {
    "gate_yolov8": dict(family="yolov8", model=dict(img_size=64, max_gt=8),
                        lr=0.01, epochs=30, optimizer="sgd"),
    "gate_yolov5": dict(family="yolov5", model=dict(img_size=64, max_gt=8),
                        lr=0.01, epochs=30, optimizer="sgd"),
    "gate_frcnn": ABLATIONS["baseline_frcnn"] if "baseline_frcnn" in ABLATIONS
    else dict(family="faster-rcnn",
              model=dict(img_size=64, max_gt=8, nms_pre=256, num_proposals=64,
                         rpn_sample=64, rcnn_sample=64),
              lr=0.005, epochs=30, optimizer="sgd"),
    "gate_vitdet": ABLATIONS["baseline"],
}

QUEUES = {
    # recalibration: every family's exact gate config on the 64-image val
    # set, with extra seeds where the gate margin needs a measured spread
    "recal": [
        ("gate_yolov8", 0), ("gate_yolov5", 0),
        ("gate_vitdet", 0), ("gate_frcnn", 0),
        ("gate_vitdet", 1), ("gate_frcnn", 1),
        ("gate_vitdet", 2), ("gate_yolov8", 1), ("gate_yolov5", 1),
    ],
    # vitdet head-vs-backbone attribution (ablate_vitdet.py matrix) on the
    # same 64-image val set so the numbers are comparable to the recal runs
    "ablate": [
        ("data128", 0), ("vit4deep", 0), ("lr6e4", 0), ("lr1e3", 0),
        ("frcnn_data128", 0), ("frcnn60", 0), ("epochs60", 0),
    ],
}


def run_one(name, seed, val_n, workdir):
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig

    spec = GATES.get(name) or ABLATIONS[name]
    tr = os.path.join(workdir, "train")
    va = os.path.join(workdir, "val")
    os.makedirs(tr, exist_ok=True), os.makedirs(va, exist_ok=True)
    make_hard_dataset(tr, spec.get("n_train", 64), seed=0)
    make_hard_dataset(va, val_n, seed=99)
    train_ds = CocoDetDataset(tr, "ann.json", img_scale=(64, 64), max_gt=8,
                              train=True)
    val_ds = CocoDetDataset(va, "ann.json", img_scale=(64, 64), max_gt=8,
                            train=False)
    fam = build_family(spec["family"], model=spec["model"])
    cfg = RunnerConfig(output_dir=os.path.join(workdir, "work"),
                       max_epochs=spec["epochs"], batch_size=2, lr=spec["lr"],
                       val_interval=1000, warmup_iters=20, log_interval=100,
                       lr_milestones=(0.7,), optimizer=spec["optimizer"],
                       seed=seed)
    runner = DetectorRunner(fam, cfg)
    t0 = time.time()
    variables = runner.train(train_ds, val_ds)
    res = runner.evaluate(variables, val_ds)
    return {"run": name, "seed": seed, "val_n": val_n,
            "minutes": round((time.time() - t0) / 60, 1),
            **{k: float(v) for k, v in res.items()}}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--queue", choices=sorted(QUEUES), default="recal")
    p.add_argument("--val-n", type=int, default=64)
    p.add_argument("--out", default="CALIB.jsonl")
    p.add_argument("--only", nargs="*", default=None,
                   help="restrict to these run names")
    args = p.parse_args()

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done.add((r["run"], r["seed"], r["val_n"]))
                except (KeyError, ValueError):
                    pass

    for name, seed in QUEUES[args.queue]:
        if args.only and name not in args.only:
            continue
        if (name, seed, args.val_n) in done:
            print(f"skip {name} seed={seed} (already in {args.out})", flush=True)
            continue
        print(f"=== {name} seed={seed} val_n={args.val_n} ===", flush=True)
        with tempfile.TemporaryDirectory() as d:
            rec = run_one(name, seed, args.val_n, d)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
