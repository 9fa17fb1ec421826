"""Device-side resize tests: PIL-exact weights, dataset u8 path, fallbacks."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from agenda_tpu.data.device_resize import apply_resize, resize_weights
from agenda_tpu.data.datasets import BaseDataset, TokenDataset, load_image


class _Tok:
    def __call__(self, prompt):
        return np.zeros(77, np.int32)


def _write_set(root, sizes):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    prompts = {}
    for i, s in enumerate(sizes):
        name = f"img{i}.png"
        Image.fromarray(rng.randint(0, 256, (s, s, 3), np.uint8)).save(
            os.path.join(root, name))
        prompts[name] = "an aerial view image with cars"
    with open(os.path.join(root, "data.json"), "w") as f:
        json.dump(prompts, f)


@pytest.mark.parametrize("src,dst,filt,pilf", [
    (112, 512, "lanczos", Image.LANCZOS),
    (112, 512, "bilinear", Image.BILINEAR),
    (256, 128, "lanczos", Image.LANCZOS),
    (100, 64, "bilinear", Image.BILINEAR),
])
def test_weights_match_pil(src, dst, filt, pilf):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (src, src, 3), np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((dst, dst), pilf),
                     np.float32) / 255.0 * 2 - 1
    w = resize_weights(src, dst, filt)
    got = np.asarray(apply_resize(np.asarray(img)[None], w, w))[0]
    # both paths quantize each pass to uint8 -> agree to 1 LSB, mostly 0
    lsb = np.abs(got - ref) * 127.5
    assert lsb.max() <= 1.01
    assert lsb.mean() < 0.05


def test_base_dataset_u8_path_matches_host(tmp_path):
    root = str(tmp_path / "ds")
    _write_set(root, [112, 112, 112])
    ds = BaseDataset(root, "data.json", 64, _Tok(), device_resize=True)
    assert ds.source_size == (112, 112)
    item = ds[0]
    assert item["pixel_u8"].dtype == np.uint8
    w = resize_weights(112, 64, "lanczos")
    got = np.asarray(apply_resize(item["pixel_u8"][None], w, w))[0]
    ref = load_image(os.path.join(root, "img0.png"), 64)
    lsb = np.abs(got - ref) * 127.5
    assert lsb.max() <= 1.01


def test_token_dataset_u8_bilinear(tmp_path):
    root = str(tmp_path / "ds")
    _write_set(root, [96, 96])
    ds = TokenDataset(root, "data.json", 48, _Tok(), device_resize=True)
    assert ds.source_size == (96, 96)
    item = ds[1]
    w = resize_weights(96, 48, "bilinear")
    got = np.asarray(apply_resize(item["pixel_u8"][None], w, w))[0]
    ref = load_image(os.path.join(root, "img1.png"), 48, Image.BILINEAR)
    lsb = np.abs(got - ref) * 127.5
    assert lsb.max() <= 1.01


def test_mixed_sizes_fall_back_to_host(tmp_path):
    root = str(tmp_path / "ds")
    _write_set(root, [112, 96])
    ds = BaseDataset(root, "data.json", 64, _Tok(), device_resize=True)
    assert ds.source_size is None
    assert "pixel_values" in ds[0]


def test_env_opt_out(tmp_path):
    root = str(tmp_path / "ds")
    _write_set(root, [112, 112])
    os.environ["AGENDA_TPU_NO_DEVICE_RESIZE"] = "1"
    try:
        ds = BaseDataset(root, "data.json", 64, _Tok(), device_resize=True)
        assert ds.source_size is None
    finally:
        del os.environ["AGENDA_TPU_NO_DEVICE_RESIZE"]


def test_detector_eval_u8_fast_path(tmp_path):
    """runner._predict_batches' device-resize path must produce the same
    records as the host path (inputs agree to 1 LSB)."""
    import jax
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from bench_detector import make_noise_dataset
    from agenda_tpu.detect.configs import DatasetSpec, preset
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.runner import DetectorRunner

    root = str(tmp_path / "data")
    os.makedirs(root)
    make_noise_dataset(root, 10)
    cfg = preset("real_source", "yolov8", train=[DatasetSpec(root, "ann.json")],
                 output_dir=str(tmp_path / "wd"))
    cfg.runner.batch_size = 4
    family = cfg.build_family()
    runner = DetectorRunner(family, cfg.runner)
    variables = family.init_variables(jax.random.key(0))
    ds = CocoDetDataset(root, "ann.json", img_scale=cfg.img_scale, train=False)
    assert ds.source_size() == (112, 112)

    # item_u8 metadata matches the host item exactly
    a, b = ds.item_u8(3), ds[3]
    np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])
    np.testing.assert_array_equal(a["scale_back"], b["scale_back"])
    assert a["image_id"] == b["image_id"]

    recs_dev = runner.test(variables, ds)
    os.environ["AGENDA_TPU_NO_DEVICE_RESIZE"] = "1"
    try:
        recs_host = runner.test(variables, ds)
    finally:
        del os.environ["AGENDA_TPU_NO_DEVICE_RESIZE"]
    assert len(recs_dev) == len(recs_host) == 10
    for rd, rh in zip(recs_dev, recs_host):
        assert rd["img_path"] == rh["img_path"]
        nd, nh = len(rd["pred_instances"]["scores"]), len(rh["pred_instances"]["scores"])
        # inputs differ by <=1 LSB; the detection sets must agree
        assert abs(nd - nh) <= max(1, int(0.1 * max(nd, nh)))
        k = min(nd, nh)
        if k:
            np.testing.assert_allclose(rd["pred_instances"]["scores"][:k],
                                       rh["pred_instances"]["scores"][:k],
                                       atol=2e-2)
