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
