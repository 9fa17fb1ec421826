"""Augmentation parity tests: box-transform goldens + photometric behavior
for the mm-pipeline equivalents in agenda_tpu/detect/augment.py
(Mosaic/RandomAffine/MixUp/Albu/HSV/LSJ — Real_Source/faster-rcnn.py:170-233,
Synthetic_Heatmap/001_lsj-100e_LINZ-heatmap.py:36-57)."""

import numpy as np
import pytest

from agenda_tpu.detect.augment import (
    AugConfig,
    blur,
    clahe,
    flip_horizontal,
    hsv_jitter,
    lsj,
    median_blur,
    mix_stage_aug,
    mixup,
    mosaic,
    random_affine,
    to_gray,
    _hsv_cv_to_rgb,
    _rgb_to_hsv_cv,
)


class MidRng:
    """Deterministic stand-in for np.random.Generator: uniform -> midpoint,
    random -> fixed, integers -> low. Makes affine/LSJ parameters exact."""

    def __init__(self, random_val=0.0):
        self._r = random_val

    def uniform(self, lo, hi, size=None):
        mid = (np.asarray(lo) + np.asarray(hi)) / 2.0
        if size is None:
            return float(mid)
        return np.full(size, mid, np.float64)

    def random(self):
        return self._r

    def integers(self, lo, hi=None):
        return int(lo if hi is not None else 0)


def rand_img(h=32, w=32, seed=0):
    return np.random.RandomState(seed).uniform(0, 255, (h, w, 3)).astype(np.float32)


# -- color ------------------------------------------------------------------


def test_hsv_roundtrip_identity():
    img = rand_img()
    h, s, v = _rgb_to_hsv_cv(img)
    back = _hsv_cv_to_rgb(h, s, v)
    np.testing.assert_allclose(back, img, atol=1e-3)


def test_hsv_jitter_zero_delta_is_identity():
    img = rand_img(seed=1)
    out = hsv_jitter(img, MidRng(), hue_delta=0, saturation_delta=0, value_delta=0)
    np.testing.assert_allclose(out, img, atol=1e-2)


def test_hsv_jitter_changes_hue_not_structure():
    img = rand_img(seed=2)
    rng = np.random.default_rng(0)
    out = hsv_jitter(img, rng)
    assert out.shape == img.shape
    assert np.abs(out - img).max() > 0.5      # something moved
    # value channel change bounded by value_delta + interpolation slop
    _, _, v_in = _rgb_to_hsv_cv(img)
    _, _, v_out = _rgb_to_hsv_cv(out)
    assert np.abs(v_out - v_in).max() <= 31.0


def test_to_gray_channels_equal():
    g = to_gray(rand_img(seed=3))
    np.testing.assert_allclose(g[..., 0], g[..., 1])
    np.testing.assert_allclose(g[..., 1], g[..., 2])
    # golden: pure red -> 0.299*255
    red = np.zeros((2, 2, 3), np.float32); red[..., 0] = 255
    np.testing.assert_allclose(to_gray(red)[..., 0], 0.299 * 255, rtol=1e-6)


def test_blur_preserves_constant_and_smooths():
    const = np.full((16, 16, 3), 77.0, np.float32)
    np.testing.assert_allclose(blur(const, MidRng()), const, atol=1e-4)
    noisy = rand_img(seed=4)
    assert blur(noisy, np.random.default_rng(0)).std() < noisy.std()


def test_median_blur_removes_impulse():
    img = np.full((9, 9, 3), 100.0, np.float32)
    img[4, 4] = 255.0
    out = median_blur(img, MidRng())  # MidRng integers -> smallest kernel (3)
    np.testing.assert_allclose(out[4, 4], 100.0)


def test_clahe_uniform_near_identity_and_boosts_contrast():
    flat = np.full((32, 32, 3), 128.0, np.float32)
    out = clahe(flat)
    assert np.abs(out - flat).max() < 16.0  # histogram spread slop only
    low = 110.0 + rand_img(seed=5) * (20.0 / 255.0)  # low-contrast image
    boosted = clahe(low)
    assert boosted.std() > low.std() * 1.5


# -- geometry ---------------------------------------------------------------


def test_flip_box_golden():
    img = rand_img(8, 10)
    boxes = np.array([[1.0, 2.0, 4.0, 5.0]], np.float32)
    out, b = flip_horizontal(img, boxes)
    np.testing.assert_allclose(b, [[10 - 4, 2, 10 - 1, 5]])
    np.testing.assert_allclose(out, img[:, ::-1])


def test_random_affine_identity():
    img = rand_img(32, 32, seed=6)
    boxes = np.array([[4.0, 6.0, 14.0, 18.0]], np.float32)
    out, b = random_affine(img, boxes, MidRng(), (32, 32),
                           scaling_ratio_range=(1.0, 1.0))
    np.testing.assert_allclose(b, boxes, atol=1e-5)
    np.testing.assert_allclose(out, img, atol=1.0)  # uint8 round-trip


def test_random_affine_scale_golden():
    """scale 0.5 about the input center: a centered box halves about center."""
    img = np.full((64, 64, 3), 200.0, np.float32)
    boxes = np.array([[16.0, 16.0, 48.0, 48.0]], np.float32)  # centered 32x32
    out, b = random_affine(img, boxes, MidRng(), (64, 64),
                           scaling_ratio_range=(0.5, 0.5))
    np.testing.assert_allclose(b, [[24, 24, 40, 40]], atol=1e-4)
    # corners now show the 114 fill
    assert abs(out[0, 0, 0] - 114.0) < 2.0
    assert abs(out[32, 32, 0] - 200.0) < 2.0


def test_random_affine_mosaic_canvas_center_crop():
    """2x canvas -> out size at scale 1: output is the canvas center crop
    (what the mm border=(-s/2,-s/2) composition produces at zero jitter)."""
    canvas = np.zeros((64, 64, 3), np.float32)
    canvas[16:48, 16:48] = 255.0  # center 32x32 block
    boxes = np.array([[16.0, 16.0, 48.0, 48.0]], np.float32)
    out, b = random_affine(canvas, boxes, MidRng(), (32, 32),
                           scaling_ratio_range=(1.0, 1.0))
    np.testing.assert_allclose(b, [[0, 0, 32, 32]], atol=1e-4)
    assert out.mean() > 250.0


def test_random_affine_rotation_90deg_box():
    class Rot90Rng(MidRng):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def uniform(self, lo, hi, size=None):
            self.calls += 1
            if self.calls == 1:       # rotation draw
                return 90.0
            return super().uniform(lo, hi, size)

    img = np.zeros((32, 32, 3), np.float32)
    boxes = np.array([[12.0, 8.0, 20.0, 24.0]], np.float32)  # 8x16 centered
    _, b = random_affine(img, boxes, Rot90Rng(), (32, 32),
                         max_rotate_degree=90.0, scaling_ratio_range=(1.0, 1.0))
    # 90-degree rotation about center swaps width/height of the box
    np.testing.assert_allclose(b, [[8, 12, 24, 20]], atol=1e-4)


def test_random_affine_filters_degenerate_boxes():
    img = np.zeros((32, 32, 3), np.float32)
    boxes = np.array([[0.0, 0.0, 3.0, 3.0],      # pushed out by translation? no — tiny after scale
                      [10.0, 10.0, 30.0, 30.0]], np.float32)
    _, b = random_affine(img, boxes, MidRng(), (32, 32),
                         scaling_ratio_range=(0.2, 0.2))
    # first box: 3px * 0.2 < 2px min size -> dropped; second survives
    assert len(b) == 1


def test_mosaic_packs_four_images():
    imgs = {i: (np.full((16, 16, 3), float(50 * (i + 1)), np.float32),
                np.array([[2.0, 2.0, 10.0, 10.0]], np.float32)) for i in range(4)}

    def load(i):
        return imgs[i % 4]

    rng = np.random.default_rng(0)
    canvas, boxes = mosaic(load, 0, 4, rng, (16, 16))
    assert canvas.shape == (32, 32, 3)
    assert len(boxes) >= 1
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 32).all()
    assert (boxes[:, 2] > boxes[:, 0]).all()


def test_mixup_blends_and_concats():
    a = np.full((16, 16, 3), 100.0, np.float32)
    ba = np.array([[1.0, 1.0, 5.0, 5.0]], np.float32)
    b = np.full((16, 16, 3), 200.0, np.float32)
    bb = np.array([[8.0, 8.0, 14.0, 14.0]], np.float32)
    out, boxes = mixup(a, ba, b, bb, MidRng(random_val=0.9))  # no flip
    # jit ratio = 1.0 -> same size paste; blend = (100+200)/2
    np.testing.assert_allclose(out, 150.0, atol=1e-4)
    assert len(boxes) == 2
    np.testing.assert_allclose(boxes[0], ba[0])


def test_lsj_downscale_pads_114():
    img = np.full((32, 32, 3), 240.0, np.float32)
    boxes = np.array([[8.0, 8.0, 24.0, 24.0]], np.float32)
    out, b = lsj(img, boxes, MidRng(), (32, 32), ratio_range=(0.5, 0.5))
    assert out.shape == (32, 32, 3)
    np.testing.assert_allclose(b, [[4, 4, 12, 12]], atol=1e-4)
    assert abs(out[0, 0, 0] - 240.0) < 1e-4      # content top-left
    assert abs(out[20, 20, 0] - 114.0) < 1e-4    # 114 pad beyond 16px


def test_lsj_upscale_crops_to_size():
    img = rand_img(32, 32, seed=7)
    boxes = np.array([[0.0, 0.0, 32.0, 32.0]], np.float32)
    out, b = lsj(img, boxes, np.random.default_rng(3), (32, 32),
                 ratio_range=(2.0, 2.0))
    assert out.shape == (32, 32, 3)
    if len(b):
        assert (b[:, 2] <= 32).all() and (b[:, 3] <= 32).all()


# -- dataset integration ----------------------------------------------------


def test_dataset_with_mix_stage_aug(tmp_path):
    import json
    from PIL import Image

    from agenda_tpu.detect.dataset import CocoDetDataset

    root = tmp_path
    (root / "images").mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (112, 112, 3), np.uint8)).save(
            root / "images" / f"{i}.png")
        images.append({"id": i, "file_name": f"{i}.png", "width": 112, "height": 112})
        anns.append({"id": i, "image_id": i, "bbox": [30, 30, 42, 42],
                     "category_id": 1, "area": 42 * 42, "iscrowd": 0})
    with open(root / "ann.json", "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "small"}]}, f)

    ds = CocoDetDataset(str(root), "ann.json", img_scale=(64, 64), max_gt=16,
                        train=True, aug=mix_stage_aug(mixup_prob=1.0))
    for i in range(4):
        s = ds[i]
        assert s["image"].shape == (64, 64, 3)
        assert s["image"].min() >= 0.0 and s["image"].max() <= 1.0
        gb = s["gt_boxes"][s["gt_valid"]]
        if len(gb):
            assert (gb[:, 0] >= 0).all() and (gb[:, 2] <= 64).all()
            assert (gb[:, 2] > gb[:, 0]).all() and (gb[:, 3] > gb[:, 1]).all()

    # LSJ path
    ds_lsj = CocoDetDataset(str(root), "ann.json", img_scale=(64, 64), max_gt=16,
                            train=True,
                            aug=AugConfig(lsj=True, flip_prob=0.5))
    s = ds_lsj[0]
    assert s["image"].shape == (64, 64, 3)


def test_preset_matrix_and_json_roundtrip(tmp_path):
    from agenda_tpu.detect.configs import HYPERPARAMS, DatasetSpec, DetectionConfig, preset

    spec = [DatasetSpec("root", "ann.json")]
    # every (stage, family) cell resolves and carries the reference numbers
    for (stage, fam), hp in HYPERPARAMS.items():
        cfg = preset(stage, fam, spec)
        assert cfg.runner.batch_size == hp["bs"]
        assert cfg.runner.lr == hp["lr"]
        assert cfg.runner.max_epochs == hp["epochs"]
        assert cfg.runner.optimizer == hp["opt"]
        if hp["aug"] == "mix":
            assert cfg.aug.mosaic and cfg.aug.hsv and cfg.aug.clahe_prob == 0.01
        elif hp["aug"] == "lsj":
            assert cfg.aug.lsj and not cfg.aug.mosaic
        else:
            assert not cfg.aug.mosaic and not cfg.aug.lsj

    cfg = preset("real_source", "yolov5", spec, pretrained="/ckpt/yolov5m.pth")
    assert cfg.aug.mixup_mosaic_pre and cfg.aug.mixup_prob == 0.1
    assert cfg.pretrained == "/ckpt/yolov5m.pth"
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    cfg2 = DetectionConfig.from_json(path)
    assert cfg2.aug == cfg.aug
    assert cfg2.runner.batch_size == 200  # Real_Source/yolov5.py:29
    assert cfg2.pretrained == cfg.pretrained
