"""Detection train-time augmentation: numpy implementations of the reference's
mm pipeline transforms.

The reference composes, host-side, per stage (SURVEY.md §2.1; exact recipe in
``/root/reference/data_annotation/configs/Real_Source/faster-rcnn.py:170-233``
and the yolo/vitdet variants):

  Mosaic(pad 114) -> RandomAffine(rotate 0, shear 0, scale 1±0.9,
  translate ±0.1, border -scale/2, fill 114) -> MixUp ->
  Albu[Blur p=.01, MedianBlur p=.01, ToGray p=.01, CLAHE p=.01] ->
  (YOLOX|YOLOv5)HSVRandomAug -> RandomFlip(0.5)

plus, for the ViTDet heatmap stage, LSJ: RandomResize(ratio 0.1-2.0,
keep-ratio) + RandomCrop(absolute 128) + pad 114
(``Synthetic_Heatmap/001_lsj-100e_LINZ-heatmap.py:36-57``).

All transforms operate on (img float32 HxWx3 in 0..255, boxes (N,4) xyxy
float32) and take a ``numpy.random.Generator``; they run on the host data
path (TPU-side work stays pure jit). The geometric transforms carry boxes
through exactly (corner projection for the affine), so GT stays aligned.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image

PAD_VAL = 114.0


@dataclasses.dataclass
class AugConfig:
    """One stage's train-time augmentation recipe (serializes via asdict)."""

    # mosaic + affine + mixup block (MultiImageMixDataset pipelines)
    mosaic: bool = False
    affine_scale: float = 0.9        # scaling_ratio_range = 1 +- affine_scale
    max_rotate_degree: float = 0.0
    max_shear_degree: float = 0.0
    max_translate_ratio: float = 0.1  # mm RandomAffine default
    mixup_prob: float = 0.0           # yolo: 0.1; mmdet MixUp: 1.0 when present
    mixup_mosaic_pre: bool = False    # YOLOv5MixUp mixes in a mosaic'd sample
    # photometric block
    blur_prob: float = 0.0            # Albu Blur / MedianBlur / ToGray / CLAHE
    median_blur_prob: float = 0.0     # each p=0.01 in the reference
    to_gray_prob: float = 0.0
    clahe_prob: float = 0.0
    hsv: bool = False                 # (YOLOX|YOLOv5)HSVRandomAug: no prob gate
    hue_delta: int = 5
    saturation_delta: int = 30
    value_delta: int = 30
    # geometric tail
    flip_prob: float = 0.5
    # LSJ (ViTDet heatmap stage) — mutually exclusive with mosaic in practice
    lsj: bool = False
    lsj_ratio_range: Tuple[float, float] = (0.1, 2.0)
    # Stage-2 ("close mosaic") recipe: RandomAffine applied to the single
    # resized image with no mosaic border
    # (``Real_Source/yolov8.py:116-134`` train_pipeline_stage2).
    standalone_affine: bool = False


def mix_stage_aug(mixup_prob: float = 1.0, mixup_mosaic_pre: bool = False) -> AugConfig:
    """The heavy mosaic pipeline (Real_Source all families; Synthetic stages
    for the yolo families and Synthetic_Target faster-rcnn/vitdet)."""
    return AugConfig(
        mosaic=True, affine_scale=0.9, mixup_prob=mixup_prob,
        mixup_mosaic_pre=mixup_mosaic_pre,
        blur_prob=0.01, median_blur_prob=0.01, to_gray_prob=0.01,
        clahe_prob=0.01, hsv=True, flip_prob=0.5,
    )


def plain_aug() -> AugConfig:
    """resize + flip only (Synthetic_Heatmap faster-rcnn)."""
    return AugConfig(flip_prob=0.5)


def lsj_aug() -> AugConfig:
    """Large-scale jitter (Synthetic_Heatmap ViTDet LSJ base)."""
    return AugConfig(lsj=True, flip_prob=0.5)


def stage2_aug(a: AugConfig) -> AugConfig:
    """The mosaic-close recipe derived from a stage's mix recipe.

    The reference's yolov8 configs switch to ``train_pipeline_stage2`` for
    the final ``close_mosaic_epochs``: Mosaic and MixUp drop out, the
    RandomAffine stays (applied to the letterboxed single image, no mosaic
    border), and the Albu/HSV/flip tail is unchanged
    (``Real_Source/yolov8.py:34,116-134,215-216``).
    """
    return dataclasses.replace(
        a, mosaic=False, mixup_prob=0.0, lsj=False, standalone_affine=True)


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------


def _rgb_to_hsv_cv(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RGB (0..255 float) -> OpenCV-convention HSV: h in [0,180), s/v in [0,255]."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = img.max(-1)
    mn = img.min(-1)
    diff = mx - mn
    safe = np.where(diff > 0, diff, 1.0)
    h = np.zeros_like(mx)
    h = np.where(mx == r, (g - b) / safe % 6.0, h)
    h = np.where(mx == g, (b - r) / safe + 2.0, h)
    h = np.where(mx == b, (r - g) / safe + 4.0, h)
    h = (h * 30.0) % 180.0
    s = np.where(mx > 0, diff / np.maximum(mx, 1e-9) * 255.0, 0.0)
    return h, s, mx


def _hsv_cv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    h6 = (h / 30.0) % 6.0
    s1 = s / 255.0
    c = v * s1
    x = c * (1.0 - np.abs(h6 % 2.0 - 1.0))
    m = v - c
    z = np.zeros_like(c)
    i = h6.astype(np.int32)
    r = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [c, x, z, z, x], c)
    g = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [x, c, c, x, z], z)
    b = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [z, z, x, c, c], x)
    return np.stack([r + m, g + m, b + m], axis=-1)


def hsv_apply(img: np.ndarray, gains) -> np.ndarray:
    """Apply FIXED hsv gains (h wraps mod 180, s/v clip 0..255) via the fused
    C++ pass (native/image_ops.cc:hsv_jitter_f32) with numpy fallback —
    shared by the host pipeline and the device-aug passthrough renderer."""
    from agenda_tpu.data.native_image import hsv_jitter_inplace

    out = np.ascontiguousarray(img, np.float32)
    if out is img:  # never mutate the caller's array
        out = img.copy()
    if hsv_jitter_inplace(out, gains[0], gains[1], gains[2]):
        # same formulas as below, verified bit-close in tests/test_native_image.py
        return out
    h, s, v = _rgb_to_hsv_cv(img)
    h = (h + gains[0]) % 180.0
    s = np.clip(s + gains[1], 0, 255)
    v = np.clip(v + gains[2], 0, 255)
    return np.clip(_hsv_cv_to_rgb(h, s, v), 0, 255).astype(np.float32)


def hsv_jitter(img: np.ndarray, rng: np.random.Generator,
               hue_delta: int = 5, saturation_delta: int = 30,
               value_delta: int = 30) -> np.ndarray:
    """YOLOXHSVRandomAug: uniform gains on cv2-convention HSV channels, hue
    wraps mod 180, s/v clip to 0..255 (mmdet YOLOXHSVRandomAug semantics)."""
    gains = rng.uniform(-1, 1, 3) * np.array(
        [hue_delta, saturation_delta, value_delta], np.float32
    )
    return hsv_apply(img, gains)


def to_gray(img: np.ndarray) -> np.ndarray:
    """Albu ToGray: ITU-R 601 luma replicated to 3 channels."""
    y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    return np.repeat(y[..., None], 3, axis=-1).astype(np.float32)


def _odd_kernel(rng: np.random.Generator, lo: int = 3, hi: int = 7) -> int:
    return int(rng.integers(lo // 2, hi // 2 + 1)) * 2 + 1


def box_blur_k(img: np.ndarray, k: int) -> np.ndarray:
    """Box filter with a FIXED odd kernel, reflect borders (shared by the
    host pipeline and the device-aug passthrough renderer)."""
    p = k // 2
    padded = np.pad(img, ((p, p), (p, p), (0, 0)), mode="reflect")
    out = np.zeros_like(img)
    for dy in range(k):
        for dx in range(k):
            out += padded[dy : dy + img.shape[0], dx : dx + img.shape[1]]
    return (out / (k * k)).astype(np.float32)


def median_blur_k(img: np.ndarray, k: int) -> np.ndarray:
    """Median filter with a FIXED odd kernel, reflect borders, in uint8.

    The reference's Albu MedianBlur runs cv2.medianBlur on the *uint8*
    image (mm pipelines apply Albu before normalization), so the median is
    taken over quantized values — this quantizes the f32 working image the
    same way, medians in uint8 (native Huang sliding-histogram kernel,
    ``native/image_ops.cc:median_blur_u8``, ~60x the old strided-axis
    float median on this host; numpy fallback below is the oracle), and
    returns f32."""
    from agenda_tpu.data import native_image

    q = np.clip(np.rint(np.asarray(img, np.float32)), 0, 255).astype(np.uint8)
    out = native_image.median_blur_u8(q, k)
    if out is None:
        p = k // 2
        padded = np.pad(q, ((p, p), (p, p), (0, 0)), mode="reflect")
        windows = np.stack(
            [padded[dy : dy + img.shape[0], dx : dx + img.shape[1]]
             for dy in range(k) for dx in range(k)],
            axis=0,
        )
        out = np.median(windows, axis=0)
    return out.astype(np.float32)


def blur(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Albu Blur: box filter, odd kernel in [3,7], reflect-101 borders."""
    return box_blur_k(img, _odd_kernel(rng))


def median_blur(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Albu MedianBlur: odd kernel in [3,7]."""
    return median_blur_k(img, _odd_kernel(rng))


def clahe(img: np.ndarray, clip_limit: float = 4.0,
          grid: Tuple[int, int] = (8, 8)) -> np.ndarray:
    """CLAHE on the luminance channel, RGB rescaled by the luma gain.

    The reference's Albu CLAHE (p=0.01) runs cv2 CLAHE on LAB-L; this is the
    same clipped tile-histogram equalization applied in luma space (a
    documented approximation — identical contrast behavior, marginally
    different chroma handling at this low probability).
    """
    h, w = img.shape[:2]
    y = np.clip(0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2], 0, 255)
    yi = y.astype(np.uint8)
    gh, gw = grid
    # tile edges (cv2 pads to multiples; we use uneven integer tiles)
    ys = np.linspace(0, h, gh + 1).astype(int)
    xs = np.linspace(0, w, gw + 1).astype(int)
    luts = np.zeros((gh, gw, 256), np.float32)
    for i in range(gh):
        for j in range(gw):
            tile = yi[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            hist = np.bincount(tile.ravel(), minlength=256).astype(np.float32)
            n = tile.size
            clip = max(1.0, clip_limit * n / 256.0)
            excess = np.maximum(hist - clip, 0).sum()
            hist = np.minimum(hist, clip) + excess / 256.0
            cdf = np.cumsum(hist)
            luts[i, j] = cdf / max(cdf[-1], 1.0) * 255.0
    # bilinear interpolation between the 4 surrounding tile LUTs
    cy = (ys[:-1] + ys[1:]) / 2.0
    cx = (xs[:-1] + xs[1:]) / 2.0
    py = np.interp(np.arange(h), cy, np.arange(gh))
    px = np.interp(np.arange(w), cx, np.arange(gw))
    y0 = np.floor(py).astype(int)
    x0 = np.floor(px).astype(int)
    y1 = np.minimum(y0 + 1, gh - 1)
    x1 = np.minimum(x0 + 1, gw - 1)
    fy = (py - y0)[:, None]
    fx = (px - x0)[None, :]
    idx = yi
    v00 = luts[y0[:, None], x0[None, :], idx]
    v01 = luts[y0[:, None], x1[None, :], idx]
    v10 = luts[y1[:, None], x0[None, :], idx]
    v11 = luts[y1[:, None], x1[None, :], idx]
    y_eq = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)
    gain = y_eq / np.maximum(y, 1e-3)
    return np.clip(img * gain[..., None], 0, 255).astype(np.float32)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def random_affine(
    img: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    out_size: Tuple[int, int],
    max_rotate_degree: float = 0.0,
    max_shear_degree: float = 0.0,
    scaling_ratio_range: Tuple[float, float] = (0.1, 1.9),
    max_translate_ratio: float = 0.1,
    border_val: float = PAD_VAL,
    min_bbox_size: float = 2.0,
    max_aspect_ratio: float = 20.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """mm RandomAffine: rotate/shear about the input center, uniform scale,
    translation jitter of ±max_translate_ratio x output size; boxes projected
    by their 4 corners, clipped, then filtered by min size and aspect ratio
    (``Real_Source/faster-rcnn.py:215-222`` parameters).

    The input is typically the 2x mosaic canvas; ``out_size`` = img_scale, so
    the border term of the mm config (-scale/2) is implied by the center
    mapping.
    """
    out_w, out_h = out_size
    in_h, in_w = img.shape[:2]
    m = affine_matrix(rng, (in_w, in_h), out_size,
                      max_rotate_degree=max_rotate_degree,
                      max_shear_degree=max_shear_degree,
                      scaling_ratio_range=scaling_ratio_range,
                      max_translate_ratio=max_translate_ratio)

    inv = affine_inverse(m)
    pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
    warped = pil.transform(
        (out_w, out_h), Image.AFFINE,
        data=tuple(inv[:2].ravel()),
        resample=Image.BILINEAR,
        fillcolor=(int(border_val),) * 3,
    )
    out = np.asarray(warped, np.float32)
    return out, affine_boxes(boxes, m, out_size, min_bbox_size, max_aspect_ratio)


def affine_matrix(rng, in_size, out_size, max_rotate_degree=0.0,
                  max_shear_degree=0.0, scaling_ratio_range=(0.1, 1.9),
                  max_translate_ratio=0.1) -> np.ndarray:
    """Draw the mm RandomAffine input->output matrix (random draws in the
    reference's order: rotate, scale, shear x/y, translate x/y)."""
    in_w, in_h = in_size
    out_w, out_h = out_size
    theta = math.radians(rng.uniform(-max_rotate_degree, max_rotate_degree))
    scale = rng.uniform(*scaling_ratio_range)
    shear_x = math.tan(math.radians(rng.uniform(-max_shear_degree, max_shear_degree)))
    shear_y = math.tan(math.radians(rng.uniform(-max_shear_degree, max_shear_degree)))
    tx = rng.uniform(-max_translate_ratio, max_translate_ratio) * out_w
    ty = rng.uniform(-max_translate_ratio, max_translate_ratio) * out_h

    # Closed-form center_out @ sh @ rot @ sc @ center_in (the five-matmul
    # chain costs ~0.2 ms/call in numpy machinery — this runs ~10k times per
    # device-aug 512-batch across mosaic+mixup branches).
    ct, st = math.cos(theta) * scale, math.sin(theta) * scale
    b00, b01 = ct + shear_x * st, -st + shear_x * ct
    b10, b11 = shear_y * ct + st, -shear_y * st + ct
    cx_i, cy_i = in_w / 2.0, in_h / 2.0
    ox, oy = out_w / 2.0 + tx, out_h / 2.0 + ty
    return np.array([
        [b00, b01, -b00 * cx_i - b01 * cy_i + ox],
        [b10, b11, -b10 * cx_i - b11 * cy_i + oy],
        [0.0, 0.0, 1.0],
    ], np.float64)  # input -> output


def affine_inverse(m: np.ndarray) -> np.ndarray:
    """Closed-form inverse of a 2D affine [[a,b,c],[d,e,f],[0,0,1]]
    (np.linalg.inv costs ~60 us of LAPACK dispatch per 3x3)."""
    a, b, c = float(m[0, 0]), float(m[0, 1]), float(m[0, 2])
    d, e, f = float(m[1, 0]), float(m[1, 1]), float(m[1, 2])
    det = a * e - b * d
    return np.array([
        [e / det, -b / det, (b * f - c * e) / det],
        [-d / det, a / det, (c * d - a * f) / det],
        [0.0, 0.0, 1.0],
    ], np.float64)


def affine_boxes(boxes: np.ndarray, m: np.ndarray, out_size,
                 min_bbox_size: float = 2.0,
                 max_aspect_ratio: float = 20.0) -> np.ndarray:
    """Project boxes by their 4 corners through ``m``, clip to the output,
    filter by min size and aspect ratio (the mm RandomAffine box path)."""
    out_w, out_h = out_size
    if len(boxes) == 0:
        return boxes
    corners = np.stack([
        boxes[:, [0, 1]], boxes[:, [2, 1]], boxes[:, [0, 3]], boxes[:, [2, 3]]
    ], axis=1)  # (N, 4, 2)
    # homogeneous row [x, y, 1] @ m.T == [x, y] @ m[:2,:2].T + m[:2,2] —
    # same accumulation order, without materializing the ones column
    pts = corners @ m[:2, :2].T + m[:2, 2]
    new = np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=-1).astype(np.float32)
    new = new.clip(np.zeros(4, np.float32),
                   np.array([out_w, out_h, out_w, out_h], np.float32))
    w = new[:, 2] - new[:, 0]
    h = new[:, 3] - new[:, 1]
    ar = np.maximum(w / np.maximum(h, 1e-6), h / np.maximum(w, 1e-6))
    keep = (w > min_bbox_size) & (h > min_bbox_size) & (ar <= max_aspect_ratio)
    return new[keep]


def mosaic(
    load_fn,
    index: int,
    n_total: int,
    rng: np.random.Generator,
    img_scale: Tuple[int, int],
    pad_val: float = PAD_VAL,
) -> Tuple[np.ndarray, np.ndarray]:
    """mm Mosaic: 2x canvas filled with pad_val, random center in
    [0.5, 1.5] x img_scale, 4 resized images packed against the center
    (``Real_Source/faster-rcnn.py:209-213``). ``load_fn(i)`` -> (img, boxes)
    at img_scale resolution."""
    out_w, out_h = img_scale
    canvas = np.full((out_h * 2, out_w * 2, 3), pad_val, np.float32)
    cx = int(rng.uniform(0.5 * out_w, 1.5 * out_w))
    cy = int(rng.uniform(0.5 * out_h, 1.5 * out_h))
    idxs = [index] + [int(rng.integers(n_total)) for _ in range(3)]
    regions, anchors = mosaic_regions(cx, cy, out_w, out_h)
    all_boxes = []
    for k, ((x1, y1, x2, y2), (ax, ay)) in enumerate(zip(regions, anchors)):
        img, boxes = load_fn(idxs[k])
        rw, rh = x2 - x1, y2 - y1
        if rw <= 0 or rh <= 0:
            continue
        # crop the image region adjacent to the center anchor
        sx = out_w - rw if ax else 0
        sy = out_h - rh if ay else 0
        canvas[y1:y2, x1:x2] = img[sy : sy + rh, sx : sx + rw]
        b = mosaic_region_boxes(boxes, (x1, y1, x2, y2), (sx, sy))
        if len(b):
            all_boxes.append(b)
    boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4), np.float32)
    return canvas, boxes


def mosaic_regions(cx, cy, out_w, out_h):
    """Canvas extents + image-corner anchors for the 4 mosaic quadrants,
    anchored at the random center (TL, TR, BL, BR)."""
    regions = [
        (max(cx - out_w, 0), max(cy - out_h, 0), cx, cy),
        (cx, max(cy - out_h, 0), min(cx + out_w, out_w * 2), cy),
        (max(cx - out_w, 0), cy, cx, min(cy + out_h, out_h * 2)),
        (cx, cy, min(cx + out_w, out_w * 2), min(cy + out_h, out_h * 2)),
    ]
    anchors = [(1, 1), (0, 1), (1, 0), (0, 0)]
    return regions, anchors


def mosaic_region_boxes(boxes: np.ndarray, region, src_offset) -> np.ndarray:
    """Shift one tile's boxes onto the canvas, clip to the region, drop
    slivers (<=1px) — the per-quadrant box path of ``mosaic``."""
    if not len(boxes):
        return np.zeros((0, 4), np.float32)
    x1, y1, x2, y2 = region
    sx, sy = src_offset
    b = boxes + np.array([x1 - sx, y1 - sy, x1 - sx, y1 - sy], np.float32)
    b = b.clip(np.array([x1, y1, x1, y1], np.float32),
               np.array([x2, y2, x2, y2], np.float32))
    ok = (b[:, 2] - b[:, 0] > 1) & (b[:, 3] - b[:, 1] > 1)
    return b[ok]


def mixup(
    img: np.ndarray,
    boxes: np.ndarray,
    img2: np.ndarray,
    boxes2: np.ndarray,
    rng: np.random.Generator,
    ratio_range: Tuple[float, float] = (0.5, 1.5),
    flip_ratio: float = 0.5,
    pad_val: float = PAD_VAL,
) -> Tuple[np.ndarray, np.ndarray]:
    """YOLOX-style MixUp: the retrieved image is jitter-resized, optionally
    flipped, pasted on a pad_val canvas of the primary size, then blended
    0.5/0.5 and the GT sets concatenated (mmdet MixUp semantics)."""
    h, w = img.shape[:2]
    jit = rng.uniform(*ratio_range)
    scale = min(h / img2.shape[0], w / img2.shape[1]) * jit
    nw, nh = max(1, int(img2.shape[1] * scale)), max(1, int(img2.shape[0] * scale))
    resized = np.asarray(
        Image.fromarray(np.clip(img2, 0, 255).astype(np.uint8)).resize(
            (nw, nh), Image.BILINEAR),
        np.float32,
    )
    flipped = rng.random() < flip_ratio
    if flipped:
        resized = resized[:, ::-1]
    canvas = np.full((h, w, 3), pad_val, np.float32)
    ch, cw = min(nh, h), min(nw, w)
    canvas[:ch, :cw] = resized[:ch, :cw]
    b2 = mixup_boxes(boxes2, scale, nw, flipped, cw, ch)
    mixed = (img * 0.5 + canvas * 0.5).astype(np.float32)
    out_boxes = np.concatenate([boxes, b2]) if len(b2) else boxes
    return mixed, out_boxes


def mixup_boxes(boxes2: np.ndarray, scale: float, nw: int, flipped: bool,
                cw: int, ch: int) -> np.ndarray:
    """The retrieved sample's box path through MixUp: jitter-scale, optional
    flip within the resized width, clip to the pasted region, drop slivers."""
    if not len(boxes2):
        return np.zeros((0, 4), np.float32)
    b2 = boxes2 * scale
    if flipped:
        b2 = np.stack([nw - b2[:, 2], b2[:, 1], nw - b2[:, 0], b2[:, 3]], axis=1)
    b2 = b2.copy()
    b2[:, 0::2] = b2[:, 0::2].clip(0, cw)
    b2[:, 1::2] = b2[:, 1::2].clip(0, ch)
    ok = (b2[:, 2] - b2[:, 0] > 1) & (b2[:, 3] - b2[:, 1] > 1)
    return b2[ok]


def lsj_params(
    rng: np.random.Generator,
    in_hw: Tuple[int, int],
    out_size: Tuple[int, int],
    ratio_range: Tuple[float, float] = (0.1, 2.0),
) -> Tuple[float, int, int, int, int]:
    """LSJ random draws + derived geometry: (scale, nw, nh, x0, y0).

    Shared between the host render (:func:`lsj`) and the device-aug LSJ
    planner so the draw STREAM and geometry are identical by construction."""
    out_w, out_h = out_size
    h, w = in_hw
    ratio = rng.uniform(*ratio_range)
    scale = min(out_h / h, out_w / w) * ratio
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    x0 = int(rng.integers(0, max(1, nw - out_w + 1)))
    y0 = int(rng.integers(0, max(1, nh - out_h + 1)))
    return scale, nw, nh, x0, y0


def lsj_boxes(
    boxes: np.ndarray,
    scale: float,
    nw: int,
    nh: int,
    x0: int,
    y0: int,
    out_size: Tuple[int, int],
) -> np.ndarray:
    """Box side of LSJ: scale, crop-shift, clip to the cropped extent,
    FilterAnnotations(min 1e-2) — exactly the host render's arithmetic."""
    out_w, out_h = out_size
    if not len(boxes):
        return boxes
    boxes = boxes * scale
    boxes = boxes - np.array([x0, y0, x0, y0], np.float32)
    cw, ch = min(nw - x0, out_w), min(nh - y0, out_h)
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, cw)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, ch)
    keep = (boxes[:, 2] - boxes[:, 0] > 1e-2) & (boxes[:, 3] - boxes[:, 1] > 1e-2)
    return boxes[keep]


def lsj(
    img: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    out_size: Tuple[int, int],
    ratio_range: Tuple[float, float] = (0.1, 2.0),
    pad_val: float = PAD_VAL,
) -> Tuple[np.ndarray, np.ndarray]:
    """Large-scale jitter: RandomResize(keep-ratio, ratio 0.1-2.0) +
    RandomCrop(absolute out_size, negative allowed) + FilterAnnotations +
    Pad(114) (``Synthetic_Heatmap/001_lsj-100e_LINZ-heatmap.py:36-57``)."""
    out_w, out_h = out_size
    h, w = img.shape[:2]
    scale, nw, nh, x0, y0 = lsj_params(rng, (h, w), out_size, ratio_range)
    img = np.asarray(
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).resize(
            (nw, nh), Image.BILINEAR),
        np.float32,
    )
    boxes = lsj_boxes(boxes, scale, nw, nh, x0, y0, out_size)
    img = img[y0 : y0 + out_h, x0 : x0 + out_w]
    # pad bottom-right to out_size
    if img.shape[0] != out_h or img.shape[1] != out_w:
        canvas = np.full((out_h, out_w, 3), pad_val, np.float32)
        canvas[: img.shape[0], : img.shape[1]] = img
        img = canvas
    return img, boxes


def flip_horizontal(img: np.ndarray, boxes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    w = img.shape[1]
    img = img[:, ::-1]
    if len(boxes):
        boxes = np.stack([w - boxes[:, 2], boxes[:, 1], w - boxes[:, 0], boxes[:, 3]], axis=1)
    return np.ascontiguousarray(img), boxes
