"""Procedural mini-AGenDA domain pair for the GENERATION-half quality gate
(VERDICT r4 #1).

Unlike tests/annotation_quality_data.py — which synthesizes the heatmap
stacks procedurally — this builder only makes the *real training images*;
the stacks under test come from an actually-trained tiny SD's fused DAAM
side output. The domain is designed so that

- the image distribution is learnable by a tiny from-scratch diffusion
  model in a few thousand CPU steps: low-frequency textured background plus
  a few saturated-red rectangular "cars";
- cars in GENERATED images are recoverable by color thresholding (redness
  margin >> background/distractor palette), giving ground-truth locations
  against which the DAAM heatmap mass and the pseudo-label chain can be
  scored without human labels;
- the source->target shift reproduces the paper's failure mode: the target
  background palette shifts (brown vs green-gray) and carries *car-colored
  round distractors*, so an RGB detector trained on source degrades on
  target while the heatmap-stack chain — the paper's mechanism
  (/root/reference/data_generation/README.md:34-66) — survives.

Prompt schema follows the reference convention
("An aerial view image with {} cars in {} <domain>",
 /root/reference/data_generation/README.md:39): images with cars get
"an aerial view image with cars in <domain>", empties get
"an aerial view image in <domain>" so the 'cars' token carries the
object-presence signal the cross-attention must localize.
"""

import json
import os

import numpy as np
from PIL import Image

SIZE = 112          # chain-standard tile size (Data/README.md)
BOX = 42.36         # fixed-box convention
DOMAIN_WORDS = {"source": "linz", "target": "utah"}


def _texture(rng, size, palette_lo, palette_hi, cell):
    """Low-frequency RGB texture: coarse noise upsampled bilinearly."""
    base = rng.uniform(palette_lo, palette_hi, (size // cell, size // cell, 3))
    img = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
        (size, size), Image.BILINEAR), np.float32)
    img += rng.rand(size, size, 3) * 12.0
    return img


def _draw_car(img, cx, cy, w, h, rng):
    """Saturated red rectangle; the redness margin (R - max(G,B) > 80) is the
    recoverable-GT invariant that generated-image scoring relies on."""
    x0, y0 = int(round(cx - w / 2)), int(round(cy - h / 2))
    x1, y1 = int(round(cx + w / 2)), int(round(cy + h / 2))
    x0, y0 = max(x0, 0), max(y0, 0)
    x1, y1 = min(x1, img.shape[1]), min(y1, img.shape[0])
    col = np.array([rng.uniform(200, 255), rng.uniform(10, 55),
                    rng.uniform(10, 55)], np.float32)
    img[y0:y1, x0:x1] = col


def _draw_disc(img, cx, cy, r, col):
    h, w = img.shape[:2]
    y = np.arange(h, dtype=np.float32)[:, None]
    x = np.arange(w, dtype=np.float32)[None, :]
    mask = ((x - cx) ** 2 + (y - cy) ** 2) <= r * r
    img[mask] = col


def make_aerial_set(
    root: str,
    n_images: int,
    *,
    domain: str = "source",
    seed: int = 0,
    p_empty: float = 0.3,
    size: int = SIZE,
):
    """Write images/ + data.json (prompt map) + ann.json (COCO GT).

    Returns (json_path, ann_path). data.json maps file name -> prompt
    (reference dataset schema, data_generation/dataset.py:19-22).
    """
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    word = DOMAIN_WORDS[domain]

    prompts, images, annotations = {}, [], []
    for i in range(n_images):
        if domain == "source":
            img = _texture(rng, size, (55, 75, 50), (95, 115, 85), cell=14)
        else:
            img = _texture(rng, size, (105, 75, 50), (150, 115, 85), cell=8)
            # car-colored round distractors: the RGB-domain trap. Radii are
            # capped (area <= ~154 px²) well below the car band (>= ~575 px²)
            # so the redness-extraction GT on GENERATED images separates the
            # classes by area even after generative blur (cut at 300 px²).
            for _ in range(rng.randint(1, 4)):
                _draw_disc(img, rng.uniform(8, size - 8), rng.uniform(8, size - 8),
                           rng.uniform(4.5, 7),
                           np.array([rng.uniform(190, 240), rng.uniform(30, 70),
                                     rng.uniform(30, 70)], np.float32))

        centers = []
        if rng.rand() >= p_empty:
            for _ in range(rng.randint(1, 4)):
                for _attempt in range(8):
                    cx = rng.uniform(14, size - 14)
                    cy = rng.uniform(14, size - 14)
                    if all((cx - a) ** 2 + (cy - b) ** 2 > 36**2 for a, b in centers):
                        centers.append((cx, cy))
                        break
            for cx, cy in centers:
                w = rng.uniform(26, 34)
                h = w * rng.uniform(0.85, 1.2)
                _draw_car(img, cx, cy, w, h, rng)

        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{i}.png"))
        prompts[f"images/{i}.png"] = (
            f"an aerial view image with cars in {word}" if centers
            else f"an aerial view image in {word}")

        images.append({"id": i, "file_name": f"{i}.png",
                       "width": size, "height": size})
        for cx, cy in centers:
            x = float(np.clip(cx - BOX / 2, 0, size - 1))
            y = float(np.clip(cy - BOX / 2, 0, size - 1))
            w = float(min(BOX, size - x))
            h = float(min(BOX, size - y))
            annotations.append({"id": len(annotations), "image_id": i,
                                "category_id": 1, "bbox": [x, y, w, h],
                                "area": w * h, "iscrowd": 0})

    json_path = os.path.join(root, "data.json")
    with open(json_path, "w") as f:
        json.dump(prompts, f)
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as f:
        json.dump({"categories": [{"id": 1, "name": "small"}],
                   "images": images, "annotations": annotations}, f)
    return json_path, ann_path


def find_generated_cars(img_u8: np.ndarray, *, red_margin: float = 60.0,
                        min_area: int = 40, max_area: int = 2500):
    """Recover car centers from a GENERATED image by the redness invariant.

    Connected components of (R - max(G, B) > red_margin); returns a list of
    (cx, cy, area) for components within the plausible car-area band. Pure
    numpy 4-connectivity flood fill (images are 112px; n_components is tiny).
    """
    img = img_u8.astype(np.float32)
    red = img[..., 0] - np.maximum(img[..., 1], img[..., 2])
    mask = red > red_margin
    h, w = mask.shape
    seen = np.zeros_like(mask, bool)
    out = []
    for sy in range(h):
        for sx in range(w):
            if not mask[sy, sx] or seen[sy, sx]:
                continue
            stack = [(sy, sx)]
            seen[sy, sx] = True
            ys, xs = [], []
            while stack:
                y, x = stack.pop()
                ys.append(y), xs.append(x)
                for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not seen[ny, nx]:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            area = len(ys)
            if min_area <= area <= max_area:
                out.append((float(np.mean(xs)), float(np.mean(ys)), area))
    return out


def build_mini_sd_pipeline(out_dir: str, images_u8: np.ndarray, *,
                           resolution: int = 64, vae_steps: int = 500,
                           seed: int = 0, log_fn=None):
    """Write a diffusers-layout mini SD pipeline with a PRETRAINED VAE.

    Unlike io/tiny_fixture.make_tiny_pipeline_dir (random weights, layout
    coverage only), this builds the starting point for the generation-half
    quality gate: the tiny VAE is pretrained on the procedural domain so
    decode(encode(x)) preserves the redness invariant, and its measured
    scaling_factor replaces SD's 0.18215. The VAE downsamples f=4 (latent
    16 at 64 px) so the UNet's level-0 self-attention runs at S=256 — the
    f=2 variant's S=1024 attention measured ~24 s/step on the CPU gate
    host — and the attention heads are 4×D=8 rather than tiny()'s 16×D=2
    (same reason). The fused DAAM side output aggregates at full latent
    resolution (generate/pipeline.py:69).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from agenda_tpu.io.diffusers_io import save_pipeline
    from agenda_tpu.io.tiny_fixture import write_tiny_tokenizer
    from agenda_tpu.models import (
        AutoencoderKL,
        CLIPTextConfig,
        CLIPTextModel,
        UNet2DConditionModel,
        UNetConfig,
        VAEConfig,
    )
    from agenda_tpu.train.vae_pretrain import pretrain_vae

    tok_dir = os.path.join(out_dir, "tokenizer")
    vocab_size = write_tiny_tokenizer(tok_dir)

    latent = resolution // 4
    unet_cfg = dataclasses.replace(UNetConfig.tiny(), sample_size=latent,
                                   attention_head_dim=8)
    vae_cfg = VAEConfig(block_out_channels=(16, 32, 32), layers_per_block=1)
    clip_cfg = CLIPTextConfig(
        vocab_size=vocab_size,
        hidden_size=unet_cfg.cross_attention_dim,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
    )

    unet = UNet2DConditionModel(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    clip = CLIPTextModel(clip_cfg)

    k1, k2, k3, k4 = jax.random.split(jax.random.key(seed), 4)
    unet_params = unet.init(
        k1, jnp.zeros((1, latent, latent, 4)), jnp.array([1]),
        jnp.zeros((1, 77, unet_cfg.cross_attention_dim)))
    vae_params = vae.init(k2, jnp.zeros((1, resolution, resolution, 3)), k4)
    clip_params = clip.init(k3, jnp.ones((1, 77), jnp.int32))

    # pretrain the VAE on the domain at the SD training resolution
    small = np.stack([
        np.asarray(Image.fromarray(im).resize((resolution, resolution),
                                              Image.LANCZOS))
        for im in images_u8])
    vae_params, scaling, recon_mse = pretrain_vae(
        vae, vae_params, small, steps=vae_steps, seed=seed, log_fn=log_fn)
    vae_cfg = dataclasses.replace(vae_cfg, scaling_factor=scaling)

    save_pipeline(
        out_dir, unet_cfg, jax.tree.map(np.asarray, unet_params),
        vae_cfg, jax.tree.map(np.asarray, vae_params),
        clip_cfg, jax.tree.map(np.asarray, clip_params),
        tokenizer_dir=tok_dir)
    return {"scaling_factor": scaling, "vae_recon_mse": recon_mse}


def heatmap_mass_in_boxes(heat: np.ndarray, centers, *, half: float = 18.0):
    """Fraction of heatmap mass inside +-half boxes around car centers, and
    the uniform-baseline fraction (box area / image area) for the same boxes.
    """
    h, w = heat.shape
    total = float(heat.sum()) + 1e-9
    mask = np.zeros((h, w), bool)
    for cx, cy, *_ in centers:
        x0, x1 = int(max(cx - half, 0)), int(min(cx + half, w))
        y0, y1 = int(max(cy - half, 0)), int(min(cy + half, h))
        mask[y0:y1, x0:x1] = True
    frac = float(heat[mask].sum()) / total
    base = float(mask.mean())
    return frac, base


def make_domain_pair(root: str, n_src: int, n_tgt: int, *, seed: int = 0,
                     size: int = SIZE):
    """Source + target sets plus a COMBINED train folder (the reference
    fine-tunes one SD on LINZ+UGRC together with per-domain template
    prompts — train_data.json, data_generation/README.md:5). Returns
    (src_dir, tgt_dir, combined_dir)."""
    import shutil

    src = os.path.join(root, "src")
    tgt = os.path.join(root, "tgt")
    comb = os.path.join(root, "combined")
    make_aerial_set(src, n_src, domain="source", seed=seed)
    make_aerial_set(tgt, n_tgt, domain="target", seed=seed + 1)
    img_dir = os.path.join(comb, "images")
    os.makedirs(img_dir, exist_ok=True)
    prompts = {}
    for name, d in (("src", src), ("tgt", tgt)):
        dom_prompts = json.load(open(os.path.join(d, "data.json")))
        for rel, prompt in dom_prompts.items():
            base = os.path.basename(rel)
            new_rel = f"images/{name}_{base}"
            shutil.copyfile(os.path.join(d, rel),
                            os.path.join(comb, new_rel))
            prompts[new_rel] = prompt
    with open(os.path.join(comb, "data.json"), "w") as f:
        json.dump(prompts, f)
    return src, tgt, comb


def extraction_coco(img_dir: str, out_path: str, *, n: int,
                    box: float = BOX, min_area: int = 40):
    """COCO GT for GENERATED images from the redness invariant — the role
    the real-source-trained detector's labels play for synthetic images in
    the reference chain (data_annotation/README.md:16-24), except here the
    procedural domain makes object locations directly recoverable. Boxes
    use the fixed-size convention (Data/README.md). Returns #annotations."""
    images, annotations = [], []
    for i in range(n):
        p = os.path.join(img_dir, f"{i}.png")
        im = np.asarray(Image.open(p).convert("RGB"))
        size = im.shape[0]
        images.append({"id": i, "file_name": f"{i}.png",
                       "width": size, "height": size})
        for cx, cy, _area in find_generated_cars(im, min_area=min_area):
            x = float(np.clip(cx - box / 2, 0, size - 1))
            y = float(np.clip(cy - box / 2, 0, size - 1))
            w = float(min(box, size - x))
            h = float(min(box, size - y))
            annotations.append({"id": len(annotations) + 1, "image_id": i,
                                "category_id": 1, "bbox": [x, y, w, h],
                                "area": w * h, "iscrowd": 0})
    with open(out_path, "w") as f:
        json.dump({"categories": [{"id": 1, "name": "small"}],
                   "images": images, "annotations": annotations}, f)
    return len(annotations)
