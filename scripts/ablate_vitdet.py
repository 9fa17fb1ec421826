"""Root-cause ablation for the vitdet convergence plateau (VERDICT r3 #6).

The tiny-ViT convergence gate calibrates at mAP50 0.71 while yolov8 reaches
0.91 on the same procedural set (tests/test_convergence.py). faster-rcnn —
which shares the RPN+RCNN two-stage head but uses a ResNet backbone — sits
at 0.73, so the first question is whether the limiter is the ViT backbone
(rel-pos, patch embed, window attention) or the shared two-stage head, and
the second is whether either is optimization-limited (epochs/lr) or
data-limited (64 train images).

Run one named ablation per invocation (single-core host; runs are serial):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/ablate_vitdet.py <name>

Reference semantics being checked: mmdet ViTDet LSJ base
(/root/reference/data_annotation/configs/Synthetic_Heatmap/vitdet.py:1-75).

Measured 2026-08-20 (8-virtual-device CPU mesh, this suite):

    baseline  mAP50 0.804  (mAP 0.378, mAP75 0.317)
    nowindow  mAP50 0.796  (mAP 0.400, mAP75 0.401)

The gate config now measures 0.804, not the 0.71 recorded 2026-08-16: the
old calibration predates the round-3 eval-path rework (device-side
PIL-exact eval resize, 9c0e1f4), and on a 16-image val set a handful of
boxes moves mAP50 several points. nowindow ~= baseline rules out window
attention as the limiter; vitdet now sits at/above faster-rcnn (0.73-0.77),
so the residual gap to yolov8 (0.91) tracks the shared two-stage head at
this tiny geometry, not the ViT backbone. tests/test_convergence.py gate
raised 0.40 -> 0.55 accordingly.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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

from convergence_data import make_hard_dataset  # noqa: E402

TINY_VIT = dict(img_size=64, max_gt=8, embed_dim=64, vit_depth=2, vit_heads=2,
                window_size=2, window_block_indexes=(0,), drop_path_rate=0.0,
                nms_pre=256, num_proposals=64, rpn_sample=64, rcnn_sample=64)
TINY_RCNN = dict(img_size=64, max_gt=8, nms_pre=256, num_proposals=64,
                 rpn_sample=64, rcnn_sample=64)

ABLATIONS = {
    # reproduce the calibration number
    "baseline": dict(family="vitdet", model=TINY_VIT, lr=3e-4, epochs=30,
                     optimizer="adamw"),
    # optimization-limited? double the schedule
    "epochs60": dict(family="vitdet", model=TINY_VIT, lr=3e-4, epochs=60,
                     optimizer="adamw"),
    # lr sensitivity
    "lr6e4": dict(family="vitdet", model=TINY_VIT, lr=6e-4, epochs=30,
                  optimizer="adamw"),
    "lr1e3": dict(family="vitdet", model=TINY_VIT, lr=1e-3, epochs=30,
                  optimizer="adamw"),
    # data-limited? 128 train images instead of 64
    "data128": dict(family="vitdet", model=TINY_VIT, lr=3e-4, epochs=30,
                    optimizer="adamw", n_train=128),
    # backbone vs shared-head: deeper/wider tiny ViT
    "vit4deep": dict(family="vitdet", model={**TINY_VIT, "vit_depth": 4,
                                             "window_block_indexes": (0, 1, 2)},
                     lr=3e-4, epochs=30, optimizer="adamw"),
    # global attention everywhere (no windows) — isolates window attention
    "nowindow": dict(family="vitdet", model={**TINY_VIT,
                                             "window_block_indexes": ()},
                     lr=3e-4, epochs=30, optimizer="adamw"),
    # shared-head control at the same schedule
    "frcnn60": dict(family="faster-rcnn", model=TINY_RCNN, lr=0.005,
                    epochs=60, optimizer="sgd"),
    "frcnn_data128": dict(family="faster-rcnn", model=TINY_RCNN, lr=0.005,
                          epochs=30, optimizer="sgd", n_train=128),
}


def run(name, workdir):
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig

    spec = ABLATIONS[name]
    tr = os.path.join(workdir, "train")
    va = os.path.join(workdir, "val")
    os.makedirs(tr, exist_ok=True), os.makedirs(va, exist_ok=True)
    make_hard_dataset(tr, spec.get("n_train", 64), seed=0)
    make_hard_dataset(va, 16, seed=99)
    train_ds = CocoDetDataset(tr, "ann.json", img_scale=(64, 64), max_gt=8,
                              train=True)
    val_ds = CocoDetDataset(va, "ann.json", img_scale=(64, 64), max_gt=8,
                            train=False)
    fam = build_family(spec["family"], model=spec["model"])
    cfg = RunnerConfig(output_dir=os.path.join(workdir, "work"),
                       max_epochs=spec["epochs"], batch_size=2, lr=spec["lr"],
                       val_interval=1000, warmup_iters=20, log_interval=100,
                       lr_milestones=(0.7,), optimizer=spec["optimizer"])
    runner = DetectorRunner(fam, cfg)
    variables = runner.train(train_ds, val_ds)
    res = runner.evaluate(variables, val_ds)
    print(json.dumps({"ablation": name, **{k: float(v) for k, v in res.items()}}))


if __name__ == "__main__":
    import tempfile

    name = sys.argv[1]
    with tempfile.TemporaryDirectory() as d:
        run(name, d)
