"""Native image decode/resize parity vs PIL (native/image_ops.cc)."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from agenda_tpu.data import native_image as ni


pytestmark = pytest.mark.skipif(not ni.available(), reason="native lib unavailable")


def _png_bytes(arr, mode="RGB"):
    im = Image.fromarray(arr, mode)
    b = io.BytesIO()
    im.save(b, "PNG")
    return b.getvalue()


def test_header_and_decode_png_rgb():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (37, 53, 3), np.uint8)
    data = _png_bytes(arr)
    assert ni.read_header(data) == (53, 37)
    out = ni.decode(data)
    np.testing.assert_array_equal(out, arr)  # PNG is lossless: exact


def test_decode_png_palette_gray_rgba():
    rng = np.random.RandomState(1)
    gray = rng.randint(0, 256, (16, 16), np.uint8)
    out = ni.decode(_png_bytes(gray, "L"))
    np.testing.assert_array_equal(out, np.repeat(gray[..., None], 3, -1))

    rgba = rng.randint(0, 256, (12, 20, 4), np.uint8)
    out = ni.decode(_png_bytes(rgba, "RGBA"))
    np.testing.assert_array_equal(out, rgba[..., :3])  # alpha stripped

    pal = Image.fromarray(rng.randint(0, 256, (10, 10, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE)
    b = io.BytesIO(); pal.save(b, "PNG")
    out = ni.decode(b.getvalue())
    np.testing.assert_array_equal(out, np.asarray(pal.convert("RGB")))


def test_decode_jpeg_close_to_pil():
    rng = np.random.RandomState(2)
    arr = (rng.rand(32, 48, 3) * 128 + 64).astype(np.uint8)
    im = Image.fromarray(arr)
    b = io.BytesIO(); im.save(b, "JPEG", quality=95)
    data = b.getvalue()
    assert ni.read_header(data) == (48, 32)
    ours = ni.decode(data).astype(np.int32)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(np.int32)
    # same libjpeg underneath -> identical, but tolerate 1 LSB
    assert np.abs(ours - pil).max() <= 1


@pytest.mark.parametrize("src,dst", [((112, 112), (64, 64)),   # downscale (task shape)
                                     ((112, 112), (128, 128)),  # upscale
                                     ((37, 53), (64, 64)),      # uneven
                                     ((64, 64), (64, 64))])     # identity
def test_resize_matches_pil_bilinear(src, dst):
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (*src, 3), np.uint8)
    ours = ni.resize_bilinear(arr, dst[1], dst[0]).astype(np.int32)
    pil = np.asarray(Image.fromarray(arr).resize((dst[1], dst[0]), Image.BILINEAR),
                     np.int32)
    diff = np.abs(ours - pil)
    # PIL quantizes filter coefficients to fixed point; float coefficients
    # land within 1 LSB everywhere (and exactly for identity).
    if src == dst:
        assert diff.max() == 0
    else:
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.25  # PIL's fixed-point rounding noise


def test_load_rgb_oneshot(tmp_path):
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 256, (112, 112, 3), np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    out = ni.load_rgb(p, out_size=(64, 64))
    pil = np.asarray(Image.fromarray(arr).resize((64, 64), Image.BILINEAR), np.int32)
    assert out.shape == (64, 64, 3)
    assert np.abs(out.astype(np.int32) - pil).max() <= 1
    # no-resize path is exact
    np.testing.assert_array_equal(ni.load_rgb(p), arr)


def test_dataset_uses_native_path(tmp_path):
    import json

    from agenda_tpu.detect.dataset import CocoDetDataset

    rng = np.random.RandomState(5)
    (tmp_path / "images").mkdir()
    Image.fromarray(rng.randint(0, 256, (112, 112, 3), np.uint8)).save(
        tmp_path / "images" / "0.png")
    with open(tmp_path / "ann.json", "w") as f:
        json.dump({"images": [{"id": 0, "file_name": "0.png", "width": 112,
                               "height": 112}],
                   "annotations": [{"id": 0, "image_id": 0, "bbox": [10, 10, 42, 42],
                                    "category_id": 1, "area": 1764, "iscrowd": 0}],
                   "categories": [{"id": 1, "name": "small"}]}, f)
    ds = CocoDetDataset(str(tmp_path), "ann.json", img_scale=(64, 64), max_gt=4,
                        train=False)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0


def test_decode_speed_vs_pil(tmp_path):
    """Not a perf gate, just evidence the native path isn't slower."""
    import time

    rng = np.random.RandomState(6)
    arr = rng.randint(0, 256, (112, 112, 3), np.uint8)
    p = str(tmp_path / "t.png")
    Image.fromarray(arr).save(p)
    n = 50
    t0 = time.time()
    for _ in range(n):
        ni.load_rgb(p, out_size=(128, 128))
    t_native = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        np.asarray(Image.open(p).convert("RGB").resize((128, 128), Image.BILINEAR))
    t_pil = time.time() - t0
    print(f"native {t_native*1000/n:.2f} ms vs PIL {t_pil*1000/n:.2f} ms per image")
    assert t_native < t_pil * 2.0  # sanity: same order or faster


def test_hsv_jitter_native_matches_numpy():
    """The fused C++ HSV pass (native/image_ops.cc:hsv_jitter_f32) must match
    the numpy reference formulas (augment._rgb_to_hsv_cv round trip) to
    sub-LSB — including grays (diff==0), saturated channels, and hue wrap."""
    if not ni.available():
        import pytest
        pytest.skip("native image library unavailable")
    from agenda_tpu.detect import augment as A

    rng = np.random.RandomState(3)
    img = rng.uniform(0, 255, (37, 41, 3)).astype(np.float32)
    # edge cases: exact grays, pure channels, zeros, 255s
    img[0, :5] = 128.0
    img[1, 0] = [255, 0, 0]; img[1, 1] = [0, 255, 0]; img[1, 2] = [0, 0, 255]
    img[2, 0] = 0.0; img[2, 1] = 255.0
    img[3, 0] = [200, 200, 10]; img[3, 1] = [10, 200, 200]

    for gains in [(3.0, 20.0, -15.0), (-4.9, -29.0, 29.0), (0.0, 0.0, 0.0),
                  (179.0, 255.0, -255.0)]:
        # numpy reference path
        h, s, v = A._rgb_to_hsv_cv(img)
        h = (h + gains[0]) % 180.0
        s = np.clip(s + gains[1], 0, 255)
        v = np.clip(v + gains[2], 0, 255)
        ref = np.clip(A._hsv_cv_to_rgb(h, s, v), 0, 255).astype(np.float32)
        got = np.ascontiguousarray(img.copy())
        assert ni.hsv_jitter_inplace(got, *gains)
        np.testing.assert_allclose(got, ref, atol=0.51, rtol=0)
        assert float(np.abs(got - ref).mean()) < 0.01


def test_hsv_jitter_dispatch_does_not_mutate_input():
    from agenda_tpu.detect import augment as A

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    before = img.copy()
    out = A.hsv_jitter(img, np.random.default_rng(1))
    assert out is not img
    np.testing.assert_array_equal(img, before)


def test_scaled_cache_hit_is_identical(tmp_path):
    """CocoDetDataset's in-RAM tile cache must return bit-identical
    (image, boxes) on hit vs miss, and never let aug mutate the cache."""
    import json
    from agenda_tpu.detect.dataset import CocoDetDataset

    rng = np.random.RandomState(11)
    (tmp_path / "images").mkdir()
    Image.fromarray(rng.randint(0, 256, (112, 112, 3), np.uint8)).save(
        tmp_path / "images" / "0.png")
    with open(tmp_path / "ann.json", "w") as f:
        json.dump({"images": [{"id": 0, "file_name": "0.png", "width": 112,
                               "height": 112}],
                   "annotations": [{"id": 0, "image_id": 0,
                                    "bbox": [10, 10, 42, 42],
                                    "category_id": 1, "area": 1764,
                                    "iscrowd": 0}],
                   "categories": [{"id": 1, "name": "small"}]}, f)
    ds = CocoDetDataset(str(tmp_path), "ann.json", img_scale=(128, 128),
                        max_gt=4, train=True)
    assert ds._scaled_cache is not None
    img1, boxes1 = ds._load_scaled(0)   # miss: fills cache
    img2, boxes2 = ds._load_scaled(0)   # hit
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(boxes1, boxes2)
    img2 += 7.0
    boxes2 += 1.0
    img3, boxes3 = ds._load_scaled(0)
    np.testing.assert_array_equal(img1, img3)
    np.testing.assert_array_equal(boxes1, boxes3)
    # disabled path (cap 0) matches the cached path bit-for-bit
    import os
    os.environ["AGENDA_TPU_IMG_CACHE_MB"] = "0"
    try:
        ds_nc = CocoDetDataset(str(tmp_path), "ann.json", img_scale=(128, 128),
                               max_gt=4, train=True)
        assert ds_nc._scaled_cache is None
        img4, boxes4 = ds_nc._load_scaled(0)
        np.testing.assert_array_equal(img1, img4)
        np.testing.assert_array_equal(boxes1, boxes4)
    finally:
        del os.environ["AGENDA_TPU_IMG_CACHE_MB"]


def test_median_blur_u8_matches_numpy_windows():
    """Huang sliding-histogram median (native/image_ops.cc:median_blur_u8)
    vs the np.median-over-windows oracle, bit-exact (k*k odd -> the median
    is the sorted middle element, which the cum-count >= mid+1 histogram
    scan also returns)."""
    import agenda_tpu.data.native_image as ni

    if not ni.available():
        pytest.skip("native image library unavailable")
    rng = np.random.default_rng(3)
    for k in (3, 5, 7, 9):
        for hw in ((33, 41), (7, 5), (1, 1), (1, 9), (9, 1), (16, 16)):
            q = rng.integers(0, 256, (hw[0], hw[1], 3)).astype(np.uint8)
            p = k // 2
            padded = np.pad(q, ((p, p), (p, p), (0, 0)), mode="reflect")
            windows = np.stack(
                [padded[dy:dy + q.shape[0], dx:dx + q.shape[1]]
                 for dy in range(k) for dx in range(k)], axis=0)
            ref = np.median(windows, axis=0)
            got = ni.median_blur_u8(q, k)
            assert got is not None
            np.testing.assert_array_equal(got.astype(np.float64), ref, err_msg=f"k={k} hw={hw}")


def test_median_blur_k_uint8_semantics_and_fallback_parity():
    """augment.median_blur_k quantizes to uint8 first (the reference's Albu
    MedianBlur runs cv2 on the uint8 image — reference semantics), and the
    native and numpy-fallback paths agree bit-for-bit."""
    import agenda_tpu.data.native_image as ni
    from agenda_tpu.detect import augment as A

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    for k in (3, 5, 7):
        out = A.median_blur_k(img, k)
        assert out.dtype == np.float32
        # output values are quantized medians
        assert np.array_equal(out, np.rint(out))
        if ni.available():
            os.environ["AGENDA_TPU_NO_NATIVE"] = "1"
            ni._load.cache_clear()
            try:
                fallback = A.median_blur_k(img, k)
            finally:
                del os.environ["AGENDA_TPU_NO_NATIVE"]
                ni._load.cache_clear()
            np.testing.assert_array_equal(out, fallback, err_msg=f"k={k}")
