"""Detection subsystem tests: ops goldens, assigners, coco mAP, and a tiny
end-to-end YOLOv8 train->eval->test run on synthetic bright-square data."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from agenda_tpu.detect.ops import (
    anchor_points,
    box_iou,
    decode_deltas,
    encode_deltas,
    grid_anchors,
    nms,
    roi_align,
)
from agenda_tpu.detect.assign import max_iou_assign, task_aligned_assign
from agenda_tpu.detect.coco_eval import coco_map


def test_nms_golden():
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],    # overlaps box 0 heavily
        [20, 20, 30, 30],
        [21, 21, 31, 31],  # overlaps box 2
        [50, 50, 60, 60],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.95, 0.3, 0.5])
    keep, valid = nms(boxes, scores, iou_threshold=0.5)
    kept = set(np.asarray(keep)[np.asarray(valid)].tolist())
    assert kept == {0, 2, 4}

    # max_outputs truncation
    keep, valid = nms(boxes, scores, 0.5, max_outputs=2)
    kept = np.asarray(keep)[np.asarray(valid)]
    assert list(kept) == [2, 0]  # score order

    # score_threshold
    keep, valid = nms(boxes, scores, 0.5, score_threshold=0.6)
    kept = set(np.asarray(keep)[np.asarray(valid)].tolist())
    assert kept == {0, 2}


def test_delta_codec_roundtrip():
    anchors = jnp.asarray([[10, 10, 30, 40], [0, 0, 16, 16]], jnp.float32)
    gt = jnp.asarray([[12, 8, 33, 44], [2, 1, 13, 18]], jnp.float32)
    d = encode_deltas(anchors, gt)
    back = decode_deltas(anchors, d)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4, atol=1e-3)
    # stds/means round-trip too
    stds = (0.1, 0.1, 0.2, 0.2)
    d2 = encode_deltas(anchors, gt, stds=stds)
    back2 = decode_deltas(anchors, d2, stds=stds)
    np.testing.assert_allclose(np.asarray(back2), np.asarray(gt), rtol=1e-4, atol=1e-3)


def test_grid_anchors_and_points():
    a = grid_anchors((2, 3), stride=16, scales=[8], ratios=[1.0])
    assert a.shape == (6, 4)
    # first anchor centered at (0,0) with size 128
    np.testing.assert_allclose(a[0], [-64, -64, 64, 64])
    np.testing.assert_allclose(a[1], [16 - 64, -64, 16 + 64, 64])

    pts, strs = anchor_points([(2, 2), (1, 1)], [8, 16])
    assert pts.shape == (5, 2)
    np.testing.assert_allclose(pts[0], [4, 4])
    np.testing.assert_allclose(pts[-1], [8, 8])
    np.testing.assert_allclose(strs, [8, 8, 8, 8, 16])


def test_roi_align_constant_and_gradient():
    # Constant feature map -> every RoI bin equals the constant.
    feat = jnp.full((16, 16, 3), 2.5)
    rois = jnp.asarray([[2, 2, 10, 10], [0, 0, 15, 15]], jnp.float32)
    out = roi_align(feat, rois, out_size=4)
    assert out.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-6)

    # Linear ramp in x -> bin means increase monotonically along x.
    ramp = jnp.broadcast_to(jnp.arange(16.0)[None, :, None], (16, 16, 1))
    out = roi_align(ramp, jnp.asarray([[0, 0, 16, 16]], jnp.float32), out_size=4)
    vals = np.asarray(out)[0, 0, :, 0]
    assert np.all(np.diff(vals) > 0)


def test_max_iou_assign():
    anchors = jnp.asarray([
        [0, 0, 10, 10],
        [100, 100, 110, 110],
        [0, 0, 9, 9],
        [50, 50, 52, 52],  # tiny, low IoU with everything
    ], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10], [48, 48, 56, 56], [0, 0, 0, 0]], jnp.float32)
    valid = jnp.asarray([True, True, False])
    assigned, labels = max_iou_assign(anchors, gt, valid, pos_thr=0.7, neg_thr=0.3,
                                      min_pos_iou=0.05)
    labels = np.asarray(labels)
    assigned = np.asarray(assigned)
    assert labels[0] == 1 and assigned[0] == 0       # exact match
    assert labels[1] == 0                             # far from everything
    assert labels[3] == 1 and assigned[3] == 1        # GT-rescue for gt 1
    # padded gt never assigned
    assert not np.any(assigned == 2)


def test_task_aligned_assign_basic():
    pts, strs = anchor_points([(4, 4)], [8])
    points = jnp.asarray(pts)
    n = points.shape[0]
    gt = jnp.asarray([[4, 4, 20, 20], [0, 0, 0, 0]], jnp.float32)
    gt_valid = jnp.asarray([True, False])
    gt_labels = jnp.zeros(2, jnp.int32)
    # Pretend predictions: boxes centered at the points, high score near gt.
    boxes = jnp.concatenate([points - 8, points + 8], axis=1)
    scores = jnp.full((n, 1), 0.9)
    fg, agt, tsc, albl = task_aligned_assign(scores, boxes, points, gt, gt_labels, gt_valid)
    fg = np.asarray(fg)
    # Only points inside the gt box can be foreground.
    inside = (pts[:, 0] >= 4) & (pts[:, 0] <= 20) & (pts[:, 1] >= 4) & (pts[:, 1] <= 20)
    assert fg.any()
    assert not np.any(fg & ~inside)
    assert np.all(np.asarray(tsc)[fg] > 0)


def test_coco_map_perfect_and_empty():
    gt = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]])]
    det = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]])]
    scores = [np.array([0.9, 0.8])]
    res = coco_map(gt, det, scores)
    assert res["bbox_mAP"] == 1.0 and res["bbox_mAP_50"] == 1.0

    # Half the detections off target.
    det2 = [np.array([[0, 0, 10, 10], [50, 50, 60, 60]])]
    res2 = coco_map(gt, det2, scores)
    assert 0 < res2["bbox_mAP_50"] < 1.0

    res3 = coco_map([np.zeros((0, 4))], [np.zeros((0, 4))], [np.zeros(0)])
    assert res3["bbox_mAP"] == -1.0  # CocoMetric convention for no GT


def _make_square_dataset(root, n_images=16, size=112, box=40, seed=0):
    """Bright squares on dark noise; COCO annotations. Default geometry
    mirrors the real task (42.36px vehicles on 112px tiles)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    for i in range(n_images):
        img = (rng.rand(size, size, 3) * 40).astype(np.uint8)
        n_obj = rng.randint(1, 3)
        for j in range(n_obj):
            x = rng.randint(0, size - box)
            y = rng.randint(0, size - box)
            img[y : y + box, x : x + box] = [220, 40, 40]
            annotations.append({
                "id": len(annotations), "image_id": i, "category_id": 1,
                "bbox": [float(x), float(y), float(box), float(box)], "area": float(box * box),
                "iscrowd": 0,
            })
        Image.fromarray(img).save(os.path.join(img_dir, f"{i}.png"))
        images.append({"id": i, "file_name": f"{i}.png", "width": size, "height": size})
    coco = {"categories": [{"id": 1, "name": "small"}],
            "images": images, "annotations": annotations}
    ann = os.path.join(root, "ann.json")
    with open(ann, "w") as f:
        json.dump(coco, f)
    return ann


@pytest.mark.slow
def test_yolov8_end_to_end_tiny(tmp_path):
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig
    from agenda_tpu.detect.yolov8 import YOLOv8Config

    root = str(tmp_path)
    _make_square_dataset(root, n_images=12)
    train_ds = CocoDetDataset(root, "ann.json", img_scale=(64, 64), max_gt=8, train=True)
    val_ds = CocoDetDataset(root, "ann.json", img_scale=(64, 64), max_gt=8, train=False)

    fam = build_family("yolov8", model=dict(img_size=64, max_gt=8))
    cfg = RunnerConfig(output_dir=os.path.join(root, "work"), max_epochs=2,
                       batch_size=2, lr=0.01, val_interval=2, warmup_iters=5,
                       log_interval=5)
    runner = DetectorRunner(fam, cfg)
    variables = runner.train(train_ds, val_ds)

    # loss must be finite and logged
    lines = open(os.path.join(root, "work", "metrics.jsonl")).read().splitlines()
    assert lines
    first = json.loads(lines[0])
    assert np.isfinite(first["loss"])

    # test() emits reference-format prediction records in 112px coords
    recs = runner.test(variables, val_ds, out_pkl=os.path.join(root, "pred.pkl"))
    assert len(recs) == 12
    r = recs[0]
    assert set(r["pred_instances"]) == {"bboxes", "scores", "labels"}
    assert r["gt_instances"]["bboxes"].max() <= 112.01
    from agenda_tpu.annotate.records import load_predictions

    back = load_predictions(os.path.join(root, "pred.pkl"))
    assert len(back) == 12
    # checkpoints written
    assert os.path.exists(os.path.join(root, "work", "latest.safetensors"))


@pytest.mark.slow
def test_faster_rcnn_end_to_end_tiny(tmp_path):
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig

    root = str(tmp_path)
    _make_square_dataset(root, n_images=8)
    train_ds = CocoDetDataset(root, "ann.json", img_scale=(64, 64), max_gt=8, train=True)
    val_ds = CocoDetDataset(root, "ann.json", img_scale=(64, 64), max_gt=8, train=False)

    fam = build_family(
        "faster-rcnn",
        model=dict(img_size=64, max_gt=8, nms_pre=256, num_proposals=64,
                   rpn_sample=64, rcnn_sample=64),
    )
    cfg = RunnerConfig(output_dir=os.path.join(root, "work"), max_epochs=1,
                       batch_size=2, lr=0.01, val_interval=1, warmup_iters=5,
                       log_interval=2)
    runner = DetectorRunner(fam, cfg)
    variables = runner.train(train_ds, val_ds)
    lines = open(os.path.join(root, "work", "metrics.jsonl")).read().splitlines()
    m0 = json.loads(lines[0])
    assert np.isfinite(m0["loss"])
    assert {"rpn_cls", "rpn_reg", "rcnn_cls", "rcnn_reg"} <= set(m0)

    recs = runner.test(variables, val_ds, out_pkl=os.path.join(root, "frcnn_pred.pkl"))
    assert len(recs) == 8
    assert recs[0]["pred_instances"]["bboxes"].shape[1] == 4


@pytest.mark.slow
def test_yolov5_and_vitdet_smoke(tmp_path):
    """Both remaining families: loss step runs, finite, and predict emits
    static-shape outputs."""
    import optax

    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family

    root = str(tmp_path)
    _make_square_dataset(root, n_images=4)
    ds = CocoDetDataset(root, "ann.json", img_scale=(64, 64), max_gt=8, train=False)
    batch = {k: jnp.asarray(np.stack([ds[i][k] for i in range(2)]))
             for k in ("image", "gt_boxes", "gt_valid")}

    for name, model_kw in [
        ("yolov5s", dict(img_size=64, max_gt=8)),
        # window 2 on the 4x4 tiny grid: exercises partition/unpartition +
        # rel-pos without padding a 4x4 grid up to the full 14px window
        ("vitdet", dict(img_size=64, max_gt=8, embed_dim=64, vit_depth=2, vit_heads=2,
                        window_size=2, window_block_indexes=(0,), drop_path_rate=0.1,
                        nms_pre=128, num_proposals=32, rpn_sample=32, rcnn_sample=32)),
    ]:
        fam = build_family(name, model=model_kw)
        variables = fam.init_variables(jax.random.key(0))

        def lf(p):
            loss, (m, bs) = fam.loss_fn(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                batch, jax.random.key(1))
            return loss

        loss, grads = jax.value_and_grad(lf)(variables["params"])
        assert np.isfinite(float(loss)), name
        gn = float(optax.global_norm(grads))
        assert np.isfinite(gn) and gn > 0, name

        boxes, scores, valid = jax.jit(fam.predict_fn)(variables, batch["image"])
        assert boxes.shape[0] == 2 and boxes.shape[2] == 4, name
        assert np.all(np.isfinite(np.asarray(boxes))), name


def test_native_matching_parity():
    """Native C++ kernels must be bit-identical to the numpy references."""
    from agenda_tpu.detect import native
    from agenda_tpu.detect.coco_eval import _match_image, IOU_THRS

    assert native.available(), "native lib failed to build"
    rng = np.random.RandomState(0)
    for trial in range(20):
        n_det = rng.randint(0, 30)
        n_gt = rng.randint(0, 10)
        dets = np.sort(rng.rand(n_det, 2, 2) * 100, axis=1).reshape(-1, 4)
        dets = dets[:, [0, 2, 1, 3]]  # x1,x2,y1,y2 -> x1,y1,x2,y2 ordering fix
        dets = np.stack([dets[:, 0], dets[:, 2], dets[:, 1], dets[:, 3]], 1) if n_det else dets
        gts = np.sort(rng.rand(n_gt, 2, 2) * 100, axis=1).reshape(-1, 4)
        gts = np.stack([gts[:, 0], gts[:, 2], gts[:, 1], gts[:, 3]], 1) if n_gt else gts
        scores = -np.arange(n_det, dtype=np.float64)

        ref = _match_image(dets, scores, gts, IOU_THRS, 100)
        got = native.match_image_greedy(dets, gts, IOU_THRS)
        np.testing.assert_array_equal(got, ref, err_msg=f"trial {trial}")

        got_gt = native.match_per_gt_greedy(dets, gts, 0.5)
        from agenda_tpu.annotate.boxes import iou_matrix_xyxy
        ious = iou_matrix_xyxy(gts, dets)
        want = np.zeros(n_det, bool)
        for gi in range(n_gt):
            cand = (ious[gi] >= 0.5) & ~want
            if cand.any():
                want[int(np.argmax(cand))] = True
        np.testing.assert_array_equal(got_gt, want)


def test_native_nms_parity():
    from agenda_tpu.detect import native
    from agenda_tpu.detect.ops import nms as jnms

    rng = np.random.RandomState(1)
    pts = rng.rand(40, 2) * 80
    boxes = np.concatenate([pts, pts + 10 + rng.rand(40, 2) * 10], axis=1)
    scores = rng.rand(40)
    order = np.argsort(-scores)
    keep_mask = native.nms_sorted(boxes[order], 0.5, 40)
    native_kept = set(order[keep_mask].tolist())

    keep, valid = jnms(jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32), 0.5)
    jax_kept = set(np.asarray(keep)[np.asarray(valid)].tolist())
    assert native_kept == jax_kept


@pytest.mark.slow
def test_runner_resume_restores_full_state(tmp_path):
    """Kill-and-resume: optimizer moments, epoch/step counters and the EMA
    shadow all restore (mmengine resume=True parity,
    Real_Source/faster-rcnn.py:375-397)."""
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig, load_variables

    root = str(tmp_path)
    _make_square_dataset(root, n_images=8)
    train_ds = CocoDetDataset(root, "ann.json", img_scale=(64, 64), max_gt=8, train=True)
    work = os.path.join(root, "work")

    def make_runner(max_epochs):
        fam = build_family("yolov8", model=dict(img_size=64, max_gt=8))
        cfg = RunnerConfig(output_dir=work, max_epochs=max_epochs, batch_size=2,
                           lr=0.01, val_interval=100, warmup_iters=2,
                           log_interval=1, ema_decay=0.999)
        return DetectorRunner(fam, cfg)

    make_runner(2).train(train_ds)  # "killed" after 2 epochs
    assert os.path.exists(os.path.join(work, "train_state.safetensors"))
    latest = load_variables(os.path.join(work, "latest.safetensors"))
    assert "ema_params" in latest

    from agenda_tpu.io.diffusers_io import _read_tensor_file
    raw = _read_tensor_file(os.path.join(work, "train_state"))
    # global batch = per-device bs x n_devices (8-device CPU mesh in tests)
    steps_per_epoch = max(1, 8 // (2 * jax.device_count()))
    assert int(raw["epoch"]) == 1
    assert int(raw["gstep"]) == 2 * steps_per_epoch
    # optimizer moments are real (nonzero) arrays
    moments = [v for k, v in raw.items() if k.startswith("opt.") and v.ndim > 0]
    assert any(np.abs(m).sum() > 0 for m in moments)

    # resume for 2 more epochs: training continues from epoch 2
    make_runner(4).train(train_ds, resume=os.path.join(work, "latest.safetensors"))
    epochs_logged = [json.loads(l)["epoch"]
                     for l in open(os.path.join(work, "metrics.jsonl"))
                     if "epoch" in json.loads(l) and "step" in json.loads(l)]
    assert 2 in epochs_logged and 3 in epochs_logged
    assert 0 in epochs_logged  # first run's logs kept (append mode)
    raw2 = _read_tensor_file(os.path.join(work, "train_state"))
    assert int(raw2["epoch"]) == 3
    assert int(raw2["gstep"]) == 4 * steps_per_epoch


def test_config_aug_flip_prob_not_clobbered(tmp_path):
    """aug.flip_prob is authoritative; the legacy top-level flip_prob only
    applies when explicitly set, and a serialized legacy value never
    overrides a JSON's AugConfig (code-review regression)."""
    from agenda_tpu.detect.augment import AugConfig
    from agenda_tpu.detect.configs import DatasetSpec, DetectionConfig

    root = str(tmp_path)
    _make_square_dataset(root, n_images=1)
    spec = DatasetSpec(root, "ann.json", "images/")

    cfg = DetectionConfig(train_datasets=[spec],
                          aug=AugConfig(flip_prob=0.0))
    assert cfg.build_train_dataset().aug.flip_prob == 0.0

    # explicit legacy override still works
    cfg2 = DetectionConfig(train_datasets=[spec], flip_prob=0.25)
    assert cfg2.build_train_dataset().aug.flip_prob == 0.25

    # JSON roundtrip: the serialized legacy field must not clobber aug
    p = os.path.join(root, "cfg.json")
    cfg.to_json(p)
    loaded = DetectionConfig.from_json(p)
    assert loaded.build_train_dataset().aug.flip_prob == 0.0


def test_sharded_labeling_matches_unsharded(tmp_path):
    """_predict_batches shards the image batch over the dp mesh when the
    batch size divides the device count (the multi-chip labeling path,
    mmdet dist tools/test.py role); records must be identical to the
    single-device path."""
    import jax

    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig

    root = str(tmp_path)
    _make_square_dataset(root, n_images=9)
    ds = CocoDetDataset(root, "ann.json", img_scale=(64, 64), max_gt=8,
                        train=False)
    fam = build_family("yolov8", model=dict(img_size=64, max_gt=8))
    variables = fam.init_variables(jax.random.key(0))
    runner = DetectorRunner(fam, RunnerConfig(output_dir=os.path.join(root, "w")))

    ndev = jax.device_count()
    assert ndev > 1, "suite runs on the forced 8-device CPU mesh"
    sharded = runner.test(variables, ds, batch_size=ndev)
    plain = runner.test(variables, ds, batch_size=3)  # 3 % 8 != 0 -> no mesh
    assert len(sharded) == len(plain) == 9
    for a, b in zip(sharded, plain):
        np.testing.assert_allclose(a["pred_instances"]["bboxes"],
                                   b["pred_instances"]["bboxes"],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(a["pred_instances"]["scores"],
                                   b["pred_instances"]["scores"],
                                   rtol=1e-5, atol=1e-5)
