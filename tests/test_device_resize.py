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
