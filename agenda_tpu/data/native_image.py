"""ctypes bindings for the native image decode/resize kernels
(``native/image_ops.cc``).

Replaces PIL on the detector data path's hot loop (the reference leans on
torch DataLoader workers + PIL/cv2 for LoadImageFromFile + Resize; this
single-core host makes Python-side decode the training bottleneck at the
reference's 64-1024-image batches). Falls back to PIL transparently when the
toolchain/library is unavailable; tests assert PIL parity (exact decode,
resize within 1 LSB — PIL quantizes its triangle-filter coefficients to
fixed point, the native path keeps them in float).
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libagenda_image.so")


@functools.cache
def _load() -> Optional[ctypes.CDLL]:
    # Own .so (needs libpng/libjpeg/zlib); built separately from the
    # dependency-free eval kernels so either can exist without the other.
    if os.environ.get("AGENDA_TPU_NO_NATIVE"):
        return None
    try:
        import subprocess

        src = os.path.join(_NATIVE_DIR, "image_ops.cc")
        # In an installed tree that ships only the prebuilt .so, the source
        # is absent — use the existing library as-is rather than rebuilding.
        if os.path.exists(src) and (
            not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
        ):
            subprocess.run(["make", "-C", _NATIVE_DIR, "libagenda_image.so"],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        return None
    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    try:
        lib.read_image_header.argtypes = [u8, i64, i32p, i32p]
        lib.read_image_header.restype = ctypes.c_int
        lib.decode_rgb8.argtypes = [u8, i64, u8, i32, i32]
        lib.decode_rgb8.restype = ctypes.c_int
        lib.resize_bilinear_rgb8.argtypes = [u8, i32, i32, u8, i32, i32]
        lib.resize_bilinear_rgb8.restype = ctypes.c_int
        lib.decode_resize_rgb8.argtypes = [u8, i64, i32, i32, u8, f32]
        lib.decode_resize_rgb8.restype = ctypes.c_int
        lib.hsv_jitter_f32.argtypes = [f32, i64, ctypes.c_float,
                                       ctypes.c_float, ctypes.c_float]
        lib.hsv_jitter_f32.restype = ctypes.c_int
    except AttributeError:
        return None
    return lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _lib_or_raise() -> ctypes.CDLL:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native image library unavailable (toolchain or libpng/libjpeg "
            "missing); use load_rgb() for the PIL-fallback path"
        )
    return lib


def read_header(data: bytes) -> Tuple[int, int]:
    """(width, height) from PNG/JPEG bytes."""
    lib = _lib_or_raise()
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    rc = lib.read_image_header(_u8p(buf), len(data), ctypes.byref(w), ctypes.byref(h))
    if rc:
        raise ValueError(f"read_image_header failed rc={rc}")
    return int(w.value), int(h.value)


def decode(data: bytes) -> np.ndarray:
    """PNG/JPEG bytes -> (H, W, 3) uint8 RGB."""
    lib = _lib_or_raise()
    w, h = read_header(data)
    out = np.empty((h, w, 3), np.uint8)
    buf = np.frombuffer(data, np.uint8)
    rc = lib.decode_rgb8(_u8p(buf), len(data), _u8p(out), w, h)
    if rc:
        raise ValueError(f"decode_rgb8 failed rc={rc}")
    return out


def resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """(H, W, 3) uint8 -> (out_h, out_w, 3) uint8, PIL BILINEAR semantics."""
    lib = _lib_or_raise()
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.resize_bilinear_rgb8(_u8p(img), img.shape[0], img.shape[1],
                                  _u8p(out), out_h, out_w)
    if rc:
        raise ValueError(f"resize_bilinear_rgb8 failed rc={rc}")
    return out


def hsv_jitter_inplace(img: np.ndarray, hue_gain: float, sat_gain: float,
                       val_gain: float) -> bool:
    """Fused RGB->HSV->jitter->RGB pass over a contiguous (H, W, 3) float32
    image in 0..255, in place. Returns False when the native library is
    unavailable (caller falls back to the numpy path)."""
    lib = _load()
    if lib is None:
        return False
    assert img.dtype == np.float32 and img.flags["C_CONTIGUOUS"]
    n = img.shape[0] * img.shape[1] if img.ndim == 3 else len(img) // 3
    rc = lib.hsv_jitter_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        float(hue_gain), float(sat_gain), float(val_gain))
    return rc == 0


def median_blur_u8(img: np.ndarray, k: int) -> Optional[np.ndarray]:
    """uint8 median filter with a fixed odd kernel, numpy pad(mode="reflect")
    borders — Huang sliding-histogram (the cv2::medianBlur family), ~2 ms per
    128px tile vs ~130 ms for the strided-axis numpy median this replaces.
    Bit-identical to np.median over the same uint8 windows (k*k odd).
    Returns None when the native library (or an older .so without the
    symbol) is unavailable; the caller falls back to numpy."""
    lib = _load()
    if lib is None:
        return None
    try:
        fn = lib.median_blur_u8
    except AttributeError:  # prebuilt .so predating the symbol
        return None
    u8 = ctypes.POINTER(ctypes.c_uint8)
    fn.argtypes = [u8, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8]
    fn.restype = ctypes.c_int
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty_like(img)
    rc = fn(_u8p(img), img.shape[0], img.shape[1], int(k), _u8p(out))
    return out if rc == 0 else None


def load_rgb(path: str, out_size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Read + decode (+ optional resize to (w, h)) a PNG/JPEG as uint8 RGB.

    The one-shot native path: file bytes -> decoded, resized pixels without
    touching Python between steps. Falls back to PIL when native is
    unavailable or the format is unsupported.
    """
    with open(path, "rb") as f:
        data = f.read()
    lib = _load()
    if lib is not None:
        try:
            if out_size is None:
                return decode(data)
            ow, oh = out_size
            out = np.empty((oh, ow, 3), np.uint8)
            buf = np.frombuffer(data, np.uint8)
            rc = lib.decode_resize_rgb8(_u8p(buf), len(data), oh, ow, _u8p(out),
                                        ctypes.cast(None, ctypes.POINTER(ctypes.c_float)))
            if rc == 0:
                return out
        except ValueError:
            pass
    from PIL import Image
    import io

    im = Image.open(io.BytesIO(data)).convert("RGB")
    if out_size is not None:
        im = im.resize(out_size, Image.BILINEAR)
    return np.asarray(im)
