"""Annotation-chain QUALITY gate (VERDICT round-2 item 1 — the box-quality
north star's only CI evidence path).

Exercises the paper's core mechanism end-to-end with *quality* assertions on
a procedural domain pair (tests/annotation_quality_data.py): heatmap stacks
synthesized from known GT -> Synthetic_Heatmap-stage detector trained on the
source stacks -> F1-max threshold selected on source-val
(VisualizeTestResults.ipynb role) -> pseudo-COCO emitted on the SHIFTED
target domain (ConvertPredToCOCOPseudoAnnotations.ipynb role) -> refine_label
classifier rescue (refine_label.py role) — asserting calibrated
precision/recall floors at each hop and that refinement IMPROVES pseudo-label
F1. A change that transposes heatmaps, breaks threshold selection, or
degrades refine bucketing/classification fails these gates, not just NaNs
(matches the role of /root/reference/data_annotation/README.md:8-61 +
Data/utils/EvaluatePseudoAnn.py:5-46).

Calibrated on the 8-virtual-device CPU mesh (2026-08-17, seeds fixed,
after the yolo loss adopted the mmyolo global-batch scale; repeated runs are
bit-identical on this host):
  src-val mAP50 1.00; selected threshold 0.87 (selected on clean source)
  pseudo  on target: P=1.000 R=0.485 F1=0.653 (14 refine-bucket dets)
  refined on target: P=0.833 R=0.985 F1=0.903 (classifier kept 11/14)
  refined-minus-pseudo F1 margin: +0.25
Gates are the calibrated values minus safety margin.
"""

import glob
import json
import os
import pickle

import numpy as np
import pytest

from annotation_quality_data import make_heatmap_domain


@pytest.mark.slow
def test_annotation_chain_quality_gate(tmp_path):
    root = str(tmp_path)
    src_tr = os.path.join(root, "src_tr")
    src_val = os.path.join(root, "src_val")
    tgt = os.path.join(root, "tgt")
    # source: mild corruption; target: gain/bias shift + noise + dimmed true
    # blobs (recall pressure) + spurious blobs (precision pressure), both
    # tuned to land in the refine stage's unlabeled score bucket.
    make_heatmap_domain(src_tr, 48, seed=0, noise=10, p_dim=0.05,
                        p_spurious=0.1)
    make_heatmap_domain(src_val, 16, seed=7, noise=10, p_dim=0.05,
                        p_spurious=0.1)
    make_heatmap_domain(tgt, 32, seed=42, noise=18, gain=0.9, bias=8,
                        p_dim=0.5, p_spurious=0.5)

    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig

    train_ds = CocoDetDataset(src_tr, "ann.json", "daam_stack_heatmaps/",
                              img_scale=(64, 64), max_gt=8, train=True)
    val_ds = CocoDetDataset(src_val, "ann.json", "daam_stack_heatmaps/",
                            img_scale=(64, 64), max_gt=8, train=False)
    tgt_ds = CocoDetDataset(tgt, "ann.json", "daam_stack_heatmaps/",
                            img_scale=(64, 64), max_gt=8, train=False)

    fam = build_family("yolov8", model=dict(img_size=64, max_gt=8))
    cfg = RunnerConfig(output_dir=os.path.join(root, "work"), max_epochs=40,
                       batch_size=2, lr=0.01, val_interval=1000,
                       warmup_iters=20, log_interval=100, lr_milestones=(0.7,))
    runner = DetectorRunner(fam, cfg)
    variables = runner.train(train_ds)

    # -- hop 1: the detector must actually learn the heatmap->box mapping
    src_map = runner.evaluate(variables, val_ds)
    assert src_map["bbox_mAP_50"] >= 0.80, src_map  # calibrated 0.95-1.00

    val_pkl = os.path.join(root, "val_pred.pkl")
    tgt_pkl = os.path.join(root, "tgt_pred.pkl")
    runner.test(variables, val_ds, out_pkl=val_pkl)
    runner.test(variables, tgt_ds, out_pkl=tgt_pkl)

    # -- hop 2: F1-max threshold selection on labeled source-val
    from agenda_tpu.cli import select_threshold

    res = select_threshold.main(["--prediction_pkl", val_pkl])
    assert res["ap"] >= 0.85, res           # calibrated 0.95-1.00
    thr = res["threshold"]
    assert 0.3 <= thr <= 0.97, res

    # -- hop 3: pseudo-COCO on the shifted target at the selected threshold
    select_threshold.main(["--prediction_pkl", tgt_pkl, "--emit-pseudo-coco",
                           "--thresh-conf", str(thr), "--out-dir", root])
    pseudo_path = glob.glob(
        os.path.join(root, "annotations_coco_FakeBBoxes*.json"))[0]

    from agenda_tpu.annotate.coco import evaluate_pseudo_annotations, load_coco

    gt = load_coco(os.path.join(tgt, "ann.json"))
    p, r = evaluate_pseudo_annotations(gt, load_coco(pseudo_path))
    f1_pseudo = 2 * p * r / max(p + r, 1e-9)
    assert p >= 0.88, (p, r)                # calibrated 1.000
    assert r >= 0.35, (p, r)                # calibrated 0.485
    assert f1_pseudo >= 0.50, f1_pseudo     # calibrated 0.653

    # the target really has intermediate-score detections for refine to judge
    records = pickle.load(open(tgt_pkl, "rb"))
    scores = np.concatenate([rec["pred_instances"]["scores"]
                             for rec in records])
    n_unlabeled = int(((scores >= 0.35) & (scores < 0.75)).sum())
    assert n_unlabeled >= 6, n_unlabeled    # calibrated 14

    # -- hop 4: refine_label must IMPROVE pseudo-label quality
    from agenda_tpu.cli import refine_label

    refined_path = os.path.join(root, "refined.json")
    refine_label.main([
        "--prediction_pkl", tgt_pkl,
        "--synthetic_image_base_path", os.path.join(tgt, "images"),
        "--json_save_path", refined_path,
        "--checkpoint_save_path", os.path.join(root, "clf"),
        "--num_epochs", "16", "--train_batch_size", "16",
        "--test_batch_size", "32", "--crop_size", "64", "--seed", "0",
        "--lr", "3e-3",
    ])
    rp, rr = evaluate_pseudo_annotations(gt, load_coco(refined_path))
    f1_refined = 2 * rp * rr / max(rp + rr, 1e-9)
    # refined replaces the thresholded pseudo anns in the pipeline
    # (data_annotation/README.md:8-61) — it must be better, with margin
    assert f1_refined >= f1_pseudo + 0.05, (f1_refined, f1_pseudo)  # calibrated +0.25
    # precision floor: the rescue must not buy recall with junk boxes
    # (classifier discrimination has its own controlled gate below)
    assert rp >= 0.75, (rp, rr)             # calibrated 0.833
    assert rr >= 0.90, (rp, rr)             # calibrated 0.985


@pytest.mark.slow
def test_refine_classifier_discriminates(tmp_path):
    """Controlled refine gate: with unambiguous car/background crops, the
    crop classifier must accept unlabeled detections that sit on cars and
    reject those on background (refine_label.py:117-157 bucket semantics).
    """
    from PIL import Image, ImageDraw

    root = str(tmp_path)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir)
    rng = np.random.RandomState(3)

    n = 16
    records = []
    car_boxes = {}
    for i in range(n):
        base = rng.rand(14, 14, 3) * 90
        bg = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
            (112, 112), Image.BILINEAR), np.float32)
        bg += rng.rand(112, 112, 3) * 40
        im = Image.fromarray(np.clip(bg, 0, 255).astype(np.uint8))
        draw = ImageDraw.Draw(im)
        # one car top-left quadrant, background-only bottom-right
        cx, cy = rng.randint(20, 40), rng.randint(20, 40)
        draw.rectangle([cx - 14, cy - 14, cx + 14, cy + 14],
                       fill=(230, 40, 40))
        im.save(os.path.join(img_dir, f"{i}.png"))
        car_boxes[i] = (cx, cy)
        bx, by = rng.randint(75, 95), rng.randint(75, 95)
        records.append({
            "img_path": os.path.join(img_dir, f"{i}.png"),
            "gt_instances": {"bboxes": np.zeros((0, 4), np.float32),
                             "labels": np.zeros(0, np.int64)},
            "pred_instances": {
                # [car det 0.9 -> pos train] [bg det 0.2 -> neg train]
                # [car det 0.55 -> unlabeled, MUST keep]
                # [bg det 0.55 -> unlabeled, MUST reject]
                "bboxes": np.array(
                    [[cx - 21, cy - 21, cx + 21, cy + 21],
                     [bx - 21, by - 21, bx + 21, by + 21],
                     [cx - 20, cy - 20, cx + 22, cy + 22],
                     [bx - 20, by - 20, bx + 22, by + 22]], np.float32),
                "scores": np.array([0.9, 0.2, 0.55, 0.55], np.float32),
                "labels": np.zeros(4, np.int64),
            },
        })

    pkl = os.path.join(root, "pred.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(records, f)

    from agenda_tpu.cli import refine_label

    refined_path = os.path.join(root, "refined.json")
    refine_label.main([
        "--prediction_pkl", pkl,
        "--synthetic_image_base_path", img_dir,
        "--json_save_path", refined_path,
        "--checkpoint_save_path", os.path.join(root, "clf"),
        "--num_epochs", "16", "--train_batch_size", "16",
        "--test_batch_size", "32", "--crop_size", "64", "--seed", "0",
        "--lr", "3e-3",
    ])

    refined = json.load(open(refined_path))
    # map refined annotations back to car/bg unlabeled candidates by center
    kept_car = kept_bg = 0
    by_img = {}
    for im in refined["images"]:
        by_img[im["id"]] = int(im["file_name"].split(".")[0])
    for ann in refined["annotations"]:
        x, y, w, h = ann["bbox"]
        ccx, ccy = x + w / 2, y + h / 2
        i = by_img[ann["image_id"]]
        cx, cy = car_boxes[i]
        on_car = abs(ccx - cx) < 12 and abs(ccy - cy) < 12
        if ann.get("score", 1.0) == 1.0:
            pass
        if on_car:
            kept_car += 1
        else:
            kept_bg += 1
    # every image contributes its pos-bucket car det; the unlabeled car det
    # may merge with it after refine's re-id, so gate on the bg side and on
    # total car coverage instead of exact counts
    assert kept_car >= n, (kept_car, kept_bg)     # all cars present
    assert kept_bg <= max(2, n // 5), (kept_car, kept_bg)  # bg crops rejected
