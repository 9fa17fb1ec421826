"""Procedural domain-pair benchmark data (annotation-chain QUALITY gate +
composed-bench detector quick-train).

Lives in the package (not tests/) so bench.py can train the composed bench's
stage-3 labeler on it without a tests/ dependency (VERDICT r4 #4).

Synthesizes what the generation stage produces — per-image RGB "synthetic
aerial" images plus 3-channel DAAM heatmap stacks (R=object word, G=fg
token, B=inverted bg token; ``cli/postprocess_heatmap.py`` layout, reference
``postprocess_heatmap.py:44-46``) — from KNOWN ground-truth boxes with
controlled corruption, so the heatmap->detector->threshold->refine chain can
be gated on measurable precision/recall instead of file existence.

Two "domains": the *source* domain is clean-ish; the *target* domain adds
gain/bias shift, more noise, dimmed object blobs (missed-detection pressure)
and spurious blobs (false-positive pressure) — the same failure modes real
cross-domain DAAM stacks have.
"""

import json
import os

import numpy as np
from PIL import Image, ImageDraw

SIZE = 112
BOX = 42.36


def _blob(canvas: np.ndarray, cx: float, cy: float, sigma: float, peak: float):
    """Additive gaussian blob, clipped into the canvas."""
    h, w = canvas.shape
    y = np.arange(h, dtype=np.float32)[:, None]
    x = np.arange(w, dtype=np.float32)[None, :]
    canvas += peak * np.exp(-(((x - cx) ** 2) + ((y - cy) ** 2)) / (2 * sigma**2))


def make_heatmap_domain(
    root: str,
    n_images: int,
    seed: int = 0,
    *,
    noise: float = 12.0,
    gain: float = 1.0,
    bias: float = 0.0,
    p_dim: float = 0.0,       # prob an object blob is dimmed into dim_range
    dim_range=(55.0, 95.0),   # straddles the score transition band
    p_spurious: float = 0.0,  # prob of an extra object-free blob per image
    spur_range=(55.0, 95.0),
) -> str:
    """Write images/ + daam_stack_heatmaps/ + ann.json under root.

    Returns the ann.json path. Image ids are ordered by numeric filename
    (the empty-annotation builder convention, reference
    ``build_empty_annotation.py:16``).
    """
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    stack_dir = os.path.join(root, "daam_stack_heatmaps")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(stack_dir, exist_ok=True)

    images, annotations = [], []
    for i in range(n_images):
        # ---- GT: 1-3 cars, 42.36px fake boxes, loosely non-overlapping ----
        centers = []
        for _ in range(rng.randint(1, 4)):
            for _attempt in range(8):
                cx = rng.uniform(10, SIZE - 10)
                cy = rng.uniform(10, SIZE - 10)
                if all((cx - a) ** 2 + (cy - b) ** 2 > 34**2 for a, b in centers):
                    centers.append((cx, cy))
                    break

        # ---- RGB image: textured bg + distractors + red-ish cars ---------
        base = rng.rand(SIZE // 8, SIZE // 8, 3) * 90
        bg = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
            (SIZE, SIZE), Image.BILINEAR), np.float32)
        bg += rng.rand(SIZE, SIZE, 3) * 40
        im = Image.fromarray(np.clip(bg, 0, 255).astype(np.uint8))
        draw = ImageDraw.Draw(im)
        for _ in range(rng.randint(1, 4)):  # distractor circles (not cars)
            dx, dy, r = rng.randint(0, SIZE), rng.randint(0, SIZE), rng.randint(5, 12)
            col = tuple(int(c) for c in rng.randint(90, 180, 3))
            draw.ellipse([dx - r, dy - r, dx + r, dy + r], fill=col)
        for cx, cy in centers:
            w = rng.randint(26, 36)
            h = int(w * rng.uniform(0.85, 1.2))
            col = (int(rng.randint(190, 255)), int(rng.randint(20, 70)),
                   int(rng.randint(20, 70)))
            draw.rectangle([cx - w // 2, cy - h // 2, cx + w // 2, cy + h // 2],
                           fill=col)
        im.save(os.path.join(img_dir, f"{i}.png"))

        # ---- heatmap stack ------------------------------------------------
        obj = np.zeros((SIZE, SIZE), np.float32)
        fg = np.zeros((SIZE, SIZE), np.float32)
        for cx, cy in centers:
            peak = 200.0 * rng.uniform(0.85, 1.15)
            if rng.rand() < p_dim:
                # the range straddles the trained detector's sharp
                # score-vs-peak transition (~0.1 below peak 60, ~0.85 above
                # peak 80), so dims split into misses, refine-bucket
                # intermediates, and confident hits
                peak = rng.uniform(*dim_range)
            _blob(obj, cx + rng.normal(0, 1.5), cy + rng.normal(0, 1.5),
                  sigma=9.0 * rng.uniform(0.8, 1.2), peak=peak)
            _blob(fg, cx, cy, sigma=13.0, peak=peak * 0.9)
        if rng.rand() < p_spurious:
            _blob(obj, rng.uniform(8, SIZE - 8), rng.uniform(8, SIZE - 8),
                  sigma=8.0, peak=rng.uniform(*spur_range))
        bg_map = 220.0 - np.maximum(obj, fg)  # bg token fires away from cars
        stack = np.stack([obj, fg, 255.0 - bg_map], axis=-1)
        stack = stack * gain + bias + rng.normal(0, noise, stack.shape)
        Image.fromarray(np.clip(stack, 0, 255).astype(np.uint8)).save(
            os.path.join(stack_dir, f"{i}.png"))

        # ---- COCO GT (42.36px fake boxes, the Data/README.md:7 recipe) ----
        images.append({"id": i, "file_name": f"{i}.png",
                       "width": SIZE, "height": SIZE})
        for cx, cy in centers:
            x = float(np.clip(cx - BOX / 2, 0, SIZE - 1))
            y = float(np.clip(cy - BOX / 2, 0, SIZE - 1))
            w = float(min(BOX, SIZE - x))
            h = float(min(BOX, SIZE - y))
            annotations.append({"id": len(annotations), "image_id": i,
                                "category_id": 1, "bbox": [x, y, w, h],
                                "area": w * h, "iscrowd": 0})

    ann = os.path.join(root, "ann.json")
    with open(ann, "w") as f:
        json.dump({"categories": [{"id": 1, "name": "small"}],
                   "images": images, "annotations": annotations}, f)
    return ann
