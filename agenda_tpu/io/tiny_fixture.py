"""Tiny synthetic SD pipeline + CLIP vocab writers.

Used by the test suite, bench.py, and __graft_entry__.dryrun_multichip: the
environment has zero egress, so nothing ever touches the HF hub; instead we
write tiny diffusers-layout checkpoints (exercising the exporter) and read
them back (exercising the importer), plus a minimal but *valid* CLIP BPE
vocab/merges pair. Lives in the package (not tests/) so an installed tree
without tests/ can still run the dryrun and bench entry points.
"""


import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from agenda_tpu.models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    UNet2DConditionModel,
    UNetConfig,
    VAEConfig,
)
from agenda_tpu.io.diffusers_io import save_pipeline


def bytes_to_unicode():
    """GPT-2/CLIP byte<->unicode table (standard public algorithm)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def write_tiny_tokenizer(d: str) -> int:
    """Write a CLIP-format vocab.json/merges.txt. Returns vocab size."""
    os.makedirs(d, exist_ok=True)
    chars = list(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = [
        "c a", "ca r", "car s</w>",         # cars -> single token
        "a e", "ae r", "aer i", "aeri al</w>",  # partial merges for 'aerial'
        "a l</w>",
        "u t", "ut a", "uta h</w>",          # utah -> single token
        "l i", "li n", "lin z</w>",          # linz -> single token (mini-AGenDA
                                             # source-domain word)
    ]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "model_max_length": 77,
                "bos_token": "<|startoftext|>",
                "eos_token": "<|endoftext|>",
                "unk_token": "<|endoftext|>",
                "pad_token": "<|endoftext|>",
                "tokenizer_class": "CLIPTokenizer",
            },
            f,
        )
    return len(vocab)


def make_tiny_pipeline_dir(out_dir: str, seed: int = 0):
    """Write a complete tiny diffusers-layout pipeline. Returns the configs."""
    tok_dir = os.path.join(out_dir, "tokenizer")
    vocab_size = write_tiny_tokenizer(tok_dir)

    unet_cfg = UNetConfig.tiny()
    vae_cfg = VAEConfig.tiny()
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

    k = jax.random.key(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    s = unet_cfg.sample_size
    unet_params = unet.init(
        k1, jnp.zeros((1, s, s, 4)), jnp.array([1]), jnp.zeros((1, 77, unet_cfg.cross_attention_dim))
    )
    vae_params = vae.init(k2, jnp.zeros((1, 4 * s, 4 * s, 3)), k4)
    clip_params = clip.init(k3, jnp.ones((1, 77), jnp.int32))

    save_pipeline(
        out_dir,
        unet_cfg,
        jax.tree.map(np.asarray, unet_params),
        vae_cfg,
        jax.tree.map(np.asarray, vae_params),
        clip_cfg,
        jax.tree.map(np.asarray, clip_params),
        tokenizer_dir=tok_dir,
    )
    return unet_cfg, vae_cfg, clip_cfg


def make_tiny_coco_det_dir(root: str, n_images: int = 16, size: int = 112,
                           seed: int = 0) -> str:
    """Tiny COCO detection fixture: n_images PNGs with red squares on noise
    plus a reference-convention ann.json (1 category 'small', 42.36-px
    boxes — Data/README.md box recipe). Returns the annotation filename.

    Used by dryrun_multichip's detector sub-runs; mirrors the shape of the
    LINZ/UGRC tiles the reference detectors consume
    (data_annotation/configs/Real_Source/faster-rcnn.py:11-19).
    """
    from PIL import Image

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        img = rng.randint(0, 80, (size, size, 3)).astype(np.uint8)
        for _ in range(rng.randint(1, 3)):
            box = 20
            x, y = rng.randint(0, size - box, 2)
            img[y:y + box, x:x + box] = [220, 40, 40]
            cx, cy = x + box / 2.0, y + box / 2.0
            annotations.append({
                "id": aid, "image_id": i, "category_id": 1,
                "bbox": [cx - 21.18, cy - 21.18, 42.36, 42.36],
                "area": 42.36 ** 2, "iscrowd": 0,
            })
            aid += 1
        Image.fromarray(img).save(os.path.join(img_dir, f"{i}.png"))
        images.append({"id": i, "file_name": f"{i}.png",
                       "width": size, "height": size})
    with open(os.path.join(root, "ann.json"), "w") as f:
        json.dump({"categories": [{"id": 1, "name": "small"}],
                   "images": images, "annotations": annotations}, f)
    return "ann.json"


def write_tiny_vlm(out_dir: str, seed: int = 0) -> str:
    """Fabricated minute LLaVA checkpoint dir for the transformers VLM
    backend (cli/vlm_baseline.py --backend transformers): random weights,
    GPT2-style byte tokenizer with an ``<image>`` token, CLIP image
    processor. Stands in for the reference's local InternVL3/DeepSeek-VL2
    checkpoints (Data/inference/test_internvl.py:48-49) in the zero-egress
    test environment. Requires torch + transformers (test extras)."""
    import torch  # noqa: F401  (transformers model init needs it)
    from transformers import (
        CLIPImageProcessor,
        CLIPVisionConfig,
        GPT2Tokenizer,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
        LlavaProcessor,
    )

    tok_dir = os.path.join(out_dir, "_tok_src")
    os.makedirs(tok_dir, exist_ok=True)
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2, "<image>": 3}
    for ch in "abcdefghijklmnopqrstuvwxyz0123456789[],. \n":
        vocab.setdefault(ch, len(vocab))
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tokenizer = GPT2Tokenizer(
        os.path.join(tok_dir, "vocab.json"),
        os.path.join(tok_dir, "merges.txt"),
        unk_token="<unk>", bos_token="<s>", eos_token="</s>",
    )
    tokenizer.add_special_tokens({"additional_special_tokens": ["<image>"]})

    vision = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=2,
                              image_size=32, patch_size=8)
    text = LlamaConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=2,
                       vocab_size=len(vocab), max_position_embeddings=256)
    cfg = LlavaConfig(vision_config=vision, text_config=text,
                      image_token_index=vocab["<image>"],
                      vision_feature_layer=-1,
                      vision_feature_select_strategy="default")
    import transformers

    transformers.set_seed(seed)
    model = LlavaForConditionalGeneration(cfg)
    image_processor = CLIPImageProcessor(size={"shortest_edge": 32},
                                         crop_size={"height": 32, "width": 32})
    processor = LlavaProcessor(image_processor=image_processor,
                               tokenizer=tokenizer, patch_size=8,
                               vision_feature_select_strategy="default",
                               num_additional_image_tokens=1)
    model_dir = os.path.join(out_dir, "tiny_vlm")
    model.save_pretrained(model_dir)
    processor.save_pretrained(model_dir)
    return model_dir
