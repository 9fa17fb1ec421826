"""Round-5 convergence-gate recalibration driver (VERDICT r4 #5/#6 +
ADVICE r4 #2).

Re-measures all four detector families at their exact gate configs
(tests/test_convergence.py) on the CURRENT eval path with

- a 64-image val set (the old 16-image set quantizes mAP50 coarsely:
  "a handful of boxes moves mAP50 several points"), and
- 3 training seeds per family, so the gates carry a measured spread
  instead of a single-seed point estimate;

then runs the vitdet head-vs-backbone ablation controls that
scripts/ablate_vitdet.py defines but round 4 never recorded (TINY_RCNN
controls at matched schedule/data, vit4deep, data128, lr sweep).

Serial on this single-core host; results append to
scripts/calibration_r5.jsonl as each run finishes so a partial sweep is
still harvestable. Re-running skips jobs already present in the JSONL.

    JAX_PLATFORMS=cpu python scripts/recalibrate_gates.py [--only PREFIX]

Reference roles being calibrated against: mmengine save_best semantics
(/root/reference/data_annotation/configs/Real_Source/faster-rcnn.py:392-397)
and the ViTDet LSJ base
(/root/reference/data_annotation/configs/Synthetic_Heatmap/vitdet.py:1-75).
"""

import argparse
import json
import os
import sys
import tempfile
import time

# AGENDA_CALIB_TPU=1 runs on the attached chip instead (ablation
# CONTROLS only — the gate numbers themselves stay CPU-calibrated to
# match the CI platform; rows record "platform").
_USE_TPU = bool(int(os.environ.get("AGENDA_CALIB_TPU", "0")))
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from convergence_data import make_hard_dataset  # noqa: E402

RESULTS = os.path.join(os.path.dirname(__file__), "calibration_r5.jsonl")

TINY_VIT = dict(img_size=64, max_gt=8, embed_dim=64, vit_depth=2, vit_heads=2,
                window_size=2, window_block_indexes=(0,), drop_path_rate=0.0,
                nms_pre=256, num_proposals=64, rpn_sample=64, rcnn_sample=64)
TINY_RCNN = dict(img_size=64, max_gt=8, nms_pre=256, num_proposals=64,
                 rpn_sample=64, rcnn_sample=64)
TINY_YOLO = dict(img_size=64, max_gt=8)


def _jobs():
    jobs = []
    # -- gate configs, 3 seeds each, ordered by how stale their calibration is
    for seed in (0, 1, 2):
        jobs.append((f"vitdet_s{seed}", dict(
            family="vitdet", model=TINY_VIT, lr=3e-4, epochs=30,
            optimizer="adamw", seed=seed)))
    for seed in (0, 1, 2):
        jobs.append((f"frcnn_s{seed}", dict(
            family="faster-rcnn", model=TINY_RCNN, lr=0.005, epochs=30,
            optimizer="sgd", seed=seed)))
    for seed in (0, 1, 2):
        jobs.append((f"yolov8_s{seed}", dict(
            family="yolov8", model=TINY_YOLO, lr=0.01, epochs=30,
            optimizer="sgd", seed=seed)))
    for seed in (0, 1, 2):
        jobs.append((f"yolov5_s{seed}", dict(
            family="yolov5", model=TINY_YOLO, lr=0.01, epochs=30,
            optimizer="sgd", seed=seed)))
    # -- vitdet head-vs-backbone ablation grid (scripts/ablate_vitdet.py)
    jobs += [
        ("vitdet_nowindow", dict(
            family="vitdet", model={**TINY_VIT, "window_block_indexes": ()},
            lr=3e-4, epochs=30, optimizer="adamw")),
        ("vitdet_epochs60", dict(
            family="vitdet", model=TINY_VIT, lr=3e-4, epochs=60,
            optimizer="adamw")),
        ("vitdet_lr6e4", dict(
            family="vitdet", model=TINY_VIT, lr=6e-4, epochs=30,
            optimizer="adamw")),
        ("vitdet_lr1e3", dict(
            family="vitdet", model=TINY_VIT, lr=1e-3, epochs=30,
            optimizer="adamw")),
        ("vitdet_data128", dict(
            family="vitdet", model=TINY_VIT, lr=3e-4, epochs=30,
            optimizer="adamw", n_train=128)),
        ("vitdet_vit4deep", dict(
            family="vitdet",
            model={**TINY_VIT, "vit_depth": 4,
                   "window_block_indexes": (0, 1, 2)},
            lr=3e-4, epochs=30, optimizer="adamw")),
        # shared-head controls: if frcnn tracks vitdet under the same
        # schedule/data levers, the limiter is the shared two-stage head
        ("frcnn_epochs60", dict(
            family="faster-rcnn", model=TINY_RCNN, lr=0.005, epochs=60,
            optimizer="sgd")),
        ("frcnn_data128", dict(
            family="faster-rcnn", model=TINY_RCNN, lr=0.005, epochs=30,
            optimizer="sgd", n_train=128)),
    ]
    return jobs


def run_one(name, spec, n_val=64):
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig

    t0 = time.time()
    with tempfile.TemporaryDirectory() as workdir:
        tr = os.path.join(workdir, "train")
        va = os.path.join(workdir, "val")
        os.makedirs(tr), os.makedirs(va)
        make_hard_dataset(tr, spec.get("n_train", 64), seed=0)
        make_hard_dataset(va, n_val, seed=99)
        train_ds = CocoDetDataset(tr, "ann.json", img_scale=(64, 64),
                                  max_gt=8, train=True)
        val_ds = CocoDetDataset(va, "ann.json", img_scale=(64, 64),
                                max_gt=8, train=False)
        fam = build_family(spec["family"], model=spec["model"])
        cfg = RunnerConfig(output_dir=os.path.join(workdir, "work"),
                           max_epochs=spec["epochs"], batch_size=2,
                           lr=spec["lr"], val_interval=1000, warmup_iters=20,
                           log_interval=100, lr_milestones=(0.7,),
                           optimizer=spec["optimizer"],
                           seed=spec.get("seed", 0))
        runner = DetectorRunner(fam, cfg)
        variables = runner.train(train_ds, val_ds)
        res = runner.evaluate(variables, val_ds)
    return {"job": name, "n_val": n_val,
            **{k: float(v) for k, v in res.items()},
            "wall_s": round(time.time() - t0, 1),
            "platform": "tpu" if _USE_TPU else "cpu"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None,
                   help="run only jobs whose name starts with one of these "
                        "comma-separated prefixes")
    p.add_argument("--n-val", type=int, default=64)
    args = p.parse_args()

    platform = "tpu" if _USE_TPU else "cpu"
    done = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            done = {(r["job"], r.get("n_val"), r.get("platform", "cpu"))
                    for r in map(json.loads,
                                 (l for l in f if l.strip()))}

    prefixes = args.only.split(",") if args.only else None
    for name, spec in _jobs():
        if (name, args.n_val, platform) in done or (prefixes and not any(
                name.startswith(p) for p in prefixes)):
            continue
        print(f"[recalibrate] {name} ...", flush=True)
        rec = run_one(name, spec, n_val=args.n_val)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[recalibrate] {json.dumps(rec)}", flush=True)


if __name__ == "__main__":
    main()
