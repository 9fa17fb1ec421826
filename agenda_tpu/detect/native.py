"""ctypes bindings for the native matching kernels (native/coco_eval.cc).

Auto-builds ``native/libagenda_native.so`` on first use (g++ is in the
image); every entry point transparently falls back to the numpy reference
implementations when the toolchain or library is unavailable, and the test
suite asserts bit-identical results between the two.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libagenda_native.so")


@functools.cache
def _load() -> Optional[ctypes.CDLL]:
    if os.environ.get("AGENDA_TPU_NO_NATIVE"):
        return None
    try:
        # Build only our own target: the image lib needs libpng/libjpeg and
        # must not take the dependency-free eval kernels down with it.
        src = os.path.join(_NATIVE_DIR, "coco_eval.cc")
        # In an installed tree that ships only the prebuilt .so, the source
        # is absent — use the existing library as-is rather than rebuilding.
        if os.path.exists(src) and (
            not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
        ):
            subprocess.run(["make", "-C", _NATIVE_DIR, "libagenda_native.so"],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        return None

    d = ctypes.POINTER(ctypes.c_double)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64
    lib.match_image_greedy.argtypes = [d, i64, d, i64, d, i64, u8]
    lib.match_image_greedy.restype = None
    lib.match_first_greedy.argtypes = [d, i64, d, i64, ctypes.c_double, u8]
    lib.match_first_greedy.restype = i64
    lib.match_per_gt_greedy.argtypes = [d, i64, d, i64, ctypes.c_double, u8]
    lib.match_per_gt_greedy.restype = None
    lib.nms_sorted.argtypes = [d, i64, ctypes.c_double, i64, u8]
    lib.nms_sorted.restype = i64
    return lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _up(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def available() -> bool:
    return _load() is not None


def match_image_greedy(dets: np.ndarray, gts: np.ndarray, iou_thrs: np.ndarray) -> np.ndarray:
    """(D,4), (G,4), (T,) -> tp (T, D) bool. Dets pre-sorted by score desc."""
    lib = _load()
    dets = np.ascontiguousarray(dets, np.float64).reshape(-1, 4)
    gts = np.ascontiguousarray(gts, np.float64).reshape(-1, 4)
    iou_thrs = np.ascontiguousarray(iou_thrs, np.float64)
    t, dn = len(iou_thrs), len(dets)
    out = np.zeros((t, dn), np.uint8)
    if lib is None:
        from agenda_tpu.detect.coco_eval import _match_image

        scores = -np.arange(dn, dtype=np.float64)  # already sorted
        return _match_image(dets, scores, gts, iou_thrs, dn)
    lib.match_image_greedy(_dp(dets), dn, _dp(gts), len(gts), _dp(iou_thrs), t, _up(out))
    return out.astype(bool)


def match_first_greedy(preds: np.ndarray, gts: np.ndarray, iou_thr: float) -> np.ndarray:
    lib = _load()
    preds = np.ascontiguousarray(preds, np.float64).reshape(-1, 4)
    gts = np.ascontiguousarray(gts, np.float64).reshape(-1, 4)
    out = np.zeros(len(preds), np.uint8)
    if lib is None:
        from agenda_tpu.annotate.boxes import iou_xyxy

        used = set()
        for p in range(len(preds)):
            for g in range(len(gts)):
                if g in used:
                    continue
                if iou_xyxy(preds[p], gts[g]) >= iou_thr:
                    used.add(g)
                    out[p] = 1
                    break
        return out.astype(bool)
    lib.match_first_greedy(_dp(preds), len(preds), _dp(gts), len(gts),
                           float(iou_thr), _up(out))
    return out.astype(bool)


def match_per_gt_greedy(preds: np.ndarray, gts: np.ndarray, iou_thr: float) -> np.ndarray:
    lib = _load()
    preds = np.ascontiguousarray(preds, np.float64).reshape(-1, 4)
    gts = np.ascontiguousarray(gts, np.float64).reshape(-1, 4)
    out = np.zeros(len(preds), np.uint8)
    if lib is None:
        from agenda_tpu.annotate.boxes import iou_matrix_xyxy

        ious = iou_matrix_xyxy(gts, preds)
        matched = np.zeros(len(preds), bool)
        for gi in range(len(gts)):
            cand = (ious[gi] >= iou_thr) & ~matched
            if cand.any():
                matched[int(np.argmax(cand))] = True
        return matched
    lib.match_per_gt_greedy(_dp(preds), len(preds), _dp(gts), len(gts),
                            float(iou_thr), _up(out))
    return out.astype(bool)


def nms_sorted(boxes: np.ndarray, iou_thr: float, max_keep: int) -> np.ndarray:
    """Score-sorted (N,4) -> keep mask (N,) bool."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float64).reshape(-1, 4)
    out = np.zeros(len(boxes), np.uint8)
    if lib is None:
        from agenda_tpu.annotate.boxes import iou_matrix_xyxy

        kept = []
        for i in range(len(boxes)):
            if len(kept) >= max_keep:
                break
            if all(iou_matrix_xyxy(boxes[i : i + 1], boxes[j : j + 1])[0, 0] <= iou_thr
                   for j in kept):
                kept.append(i)
                out[i] = 1
        return out.astype(bool)
    lib.nms_sorted(_dp(boxes), len(boxes), float(iou_thr), int(max_keep), _up(out))
    return out.astype(bool)
