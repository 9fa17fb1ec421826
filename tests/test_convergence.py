"""Convergence gate: detectors must actually LEARN on a hard procedural
benchmark, not just produce finite losses (VERDICT round 1, weak #5).

The dataset (tests/convergence_data.py) has cluttered backgrounds with
object-like distractors, scale/aspect/color-jittered ~42px targets, and up
to 4 objects per image. Thresholds are calibrated measurements minus margin
(calibrated on the 8-virtual-device CPU mesh, 2026-08-16):

- yolov8:      mAP50 0.877-0.918 over 3 seeds (lr 0.01) -> gate 0.60
  (round-5 recalibration on the 64-image val; 16-val 2026-08-17: 0.91)
- yolov5:      mAP50 0.746-0.803 over 3 seeds (64-img val, r5; 16-val
  2026-08-17: 0.82) -> gate 0.45
- faster-rcnn: mAP50 0.735 (seed 0, 64-img val, r5; 16-val 2026-08-16:
  0.73) -> gate 0.40
  (at the stage lr 0.02 with this tiny global batch the RCNN head DIVERGES,
  loss 1.7 -> 30 — which is exactly the class of failure this gate catches)
- vitdet:      mAP50 0.62-0.77 over 3 seeds (tiny ViT, adamw 3e-4)
  -> gate 0.45 (round-5 recalibration on the 64-image val — see below)

Round-3 recalibration (2026-08-17): the yolo losses now carry the
mmyolo/ultralytics global-batch scale (loss x bs — see yolov5.py loss
docstring for the root-cause evidence). That raised yolov5 0.45 -> 0.82
(sloppy-localization mAP75 0.007 -> 0.23) and yolov8 0.88 -> 0.91 at the
same lr, so the yolo gates tightened accordingly; yolov5's published-paper
deficit vs yolov8 (68.8 vs 75.4 AP50) is now roughly the gap seen here.

Round-4 vitdet recalibration (2026-08-20, scripts/ablate_vitdet.py): the
exact gate config measured mAP50 0.804 on the then-16-image val (the
2026-08-16 value 0.71 predated the round-3 eval-path rework). Ablation:
no-window 0.796 (window attention is NOT the limiter).

Round-5 recalibration (2026-08-21, scripts/recalibrate_gates.py,
scripts/calibration_r5.jsonl): val grown 16 -> 64 images (16 quantized
mAP coarsely — the 0.804 was quantized UP), 3 training seeds per family.
vitdet: 0.652 / 0.624 / 0.768 -> gate 0.45 (measured min - 0.17).
Further rows land in calibration_r5.jsonl as the sweep completes; gates
are updated family-by-family from the measured minima.

A subtly broken assigner, box loss, or decoder plateaus near zero here, so
these gates fail on real regressions, not just NaNs.
"""

import os

import pytest

from convergence_data import make_hard_dataset


def _train_and_eval(tmp_path, name, model_kw, lr, epochs, optimizer="sgd",
                    device_aug=False, aug=None):
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig

    tr = os.path.join(str(tmp_path), "train")
    va = os.path.join(str(tmp_path), "val")
    os.makedirs(tr), os.makedirs(va)
    make_hard_dataset(tr, 64, seed=0)
    # 64 val images (round 5, was 16): on 16 images a handful of boxes
    # moves mAP50 several points — the r4 vitdet "0.804" was such an
    # artifact (0.62-0.77 across seeds on this 64-image set).
    make_hard_dataset(va, 64, seed=99)
    train_ds = CocoDetDataset(tr, "ann.json", img_scale=(64, 64), max_gt=8,
                              train=True, aug=aug)
    val_ds = CocoDetDataset(va, "ann.json", img_scale=(64, 64), max_gt=8, train=False)
    fam = build_family(name, model=model_kw)
    cfg = RunnerConfig(output_dir=os.path.join(str(tmp_path), "work"),
                       max_epochs=epochs, batch_size=2, lr=lr, val_interval=1000,
                       warmup_iters=20, log_interval=100, lr_milestones=(0.7,),
                       optimizer=optimizer, device_aug=device_aug)
    runner = DetectorRunner(fam, cfg)
    variables = runner.train(train_ds, val_ds)
    return runner.evaluate(variables, val_ds)


@pytest.mark.slow
def test_yolov8_convergence_gate(tmp_path):
    res = _train_and_eval(tmp_path, "yolov8", dict(img_size=64, max_gt=8),
                          lr=0.01, epochs=30)
    # r5 recalibration, 64-image val, 3 seeds: 0.903 / 0.877 / 0.918
    assert res["bbox_mAP_50"] >= 0.60, res


@pytest.mark.slow
def test_yolov5_convergence_gate(tmp_path):
    res = _train_and_eval(tmp_path, "yolov5", dict(img_size=64, max_gt=8),
                          lr=0.01, epochs=30)
    # r5 recalibration, 64-image val, 3 seeds: 0.781 / 0.746 / 0.803
    assert res["bbox_mAP_50"] >= 0.45, res


# The two-stage families need 10-45 min each on this single-core host
# (dominated by XLA compile + the 8-virtual-device collectives), so their
# gates run when AGENDA_FULL_CONVERGENCE=1 (calibration evidence in the
# module docstring; both measured green on 2026-08-16).
_full = pytest.mark.skipif(
    not os.environ.get("AGENDA_FULL_CONVERGENCE"),
    reason="set AGENDA_FULL_CONVERGENCE=1 (15-60 min/family on 1 CPU core); "
           "calibrated: faster-rcnn 0.73-0.77 (2026-08-16, 16-img val), "
           "vitdet 0.624-0.768 x3 seeds (2026-08-21, 64-img val, "
           "scripts/calibration_r5.jsonl)",
)


@_full
@pytest.mark.slow
def test_yolov8_convergence_gate_device_aug(tmp_path):
    """The device-rendered data path must reach the same gate as the host
    path (identical recipe; pixels rendered on the accelerator from the
    HBM-resident dataset tensor). Calibrated 2026-08-18: 0.91 host / 0.90
    device at 30 epochs — same training outcome."""
    res = _train_and_eval(tmp_path, "yolov8", dict(img_size=64, max_gt=8),
                          lr=0.01, epochs=30, device_aug=True)
    assert res["bbox_mAP_50"] >= 0.60, res


@_full
@pytest.mark.slow
def test_faster_rcnn_convergence_gate(tmp_path):
    res = _train_and_eval(
        tmp_path, "faster-rcnn",
        dict(img_size=64, max_gt=8, nms_pre=256, num_proposals=64,
             rpn_sample=64, rcnn_sample=64),
        lr=0.005, epochs=30)
    # r5 recalibration on the 64-image val (seed 0): 0.735 — the
    # 2026-08-16 0.73-0.77 was NOT stale, unlike vitdet's
    assert res["bbox_mAP_50"] >= 0.40, res


@_full
@pytest.mark.slow
def test_vitdet_convergence_gate(tmp_path):
    res = _train_and_eval(
        tmp_path, "vitdet",
        dict(img_size=64, max_gt=8, embed_dim=64, vit_depth=2, vit_heads=2,
             window_size=2, window_block_indexes=(0,), drop_path_rate=0.0,
             nms_pre=256, num_proposals=64, rpn_sample=64, rcnn_sample=64),
        lr=3e-4, epochs=30, optimizer="adamw")
    # round-5 recalibration on the 64-image val set, 3 training seeds
    # (scripts/recalibrate_gates.py -> scripts/calibration_r5.jsonl):
    # mAP50 0.652 / 0.624 / 0.768 (the r4 single-seed 0.804 was quantized
    # up by the 16-image val). Gate = measured min 0.624 - 0.17 margin.
    assert res["bbox_mAP_50"] >= 0.45, res
