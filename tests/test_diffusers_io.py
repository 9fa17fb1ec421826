"""Diffusers checkpoint import/export: structure parity + roundtrips + goldens.

The golden key/shape tables below are the well-known SD-1.x state-dict entries
(diffusers UNet2DConditionModel / AutoencoderKL, HF CLIPTextModel) — checked
against the exporter so our on-disk layout is loadable by torch diffusers.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agenda_tpu.models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    UNet2DConditionModel,
    UNetConfig,
    VAEConfig,
)
from agenda_tpu.io.diffusers_io import (
    clip_flax_to_torch,
    clip_torch_to_flax,
    load_pipeline,
    unet_flax_to_torch,
    unet_torch_to_flax,
    vae_flax_to_torch,
    vae_torch_to_flax,
)
from fixtures import make_tiny_pipeline_dir


def tree_paths(tree):
    return {"/".join(str(k.key) for k in path) for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_unet_roundtrip_tiny():
    cfg = UNetConfig.tiny()
    m = UNet2DConditionModel(cfg)
    params = m.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 77, 32))
    )
    sd = unet_flax_to_torch(jax.tree.map(np.asarray, params))
    back = unet_torch_to_flax(sd)
    assert tree_paths(back) == tree_paths(params)
    for (pa, va), (pb, vb) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(params)[0], key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_flatten_with_path(back)[0], key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_array_equal(np.asarray(va), vb, err_msg=str(pa))


def test_vae_roundtrip_tiny():
    cfg = VAEConfig.tiny()
    m = AutoencoderKL(cfg)
    params = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jax.random.key(1))
    sd = vae_flax_to_torch(jax.tree.map(np.asarray, params))
    back = vae_torch_to_flax(sd)
    assert tree_paths(back) == tree_paths(params)


def test_clip_roundtrip_tiny():
    cfg = CLIPTextConfig.tiny()
    m = CLIPTextModel(cfg)
    params = m.init(jax.random.key(0), jnp.ones((1, 77), jnp.int32))
    sd = clip_flax_to_torch(jax.tree.map(np.asarray, params))
    back = clip_torch_to_flax(sd)
    assert tree_paths(back) == tree_paths(params)


# Known SD-1.x torch state-dict entries: (key, shape).
UNET_GOLDEN_KEYS = [
    ("conv_in.weight", (320, 4, 3, 3)),
    ("conv_in.bias", (320,)),
    ("time_embedding.linear_1.weight", (1280, 320)),
    ("time_embedding.linear_2.weight", (1280, 1280)),
    ("down_blocks.0.resnets.0.norm1.weight", (320,)),
    ("down_blocks.0.resnets.0.conv1.weight", (320, 320, 3, 3)),
    ("down_blocks.0.resnets.0.time_emb_proj.weight", (320, 1280)),
    ("down_blocks.0.attentions.0.proj_in.weight", (320, 320, 1, 1)),
    ("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight", (320, 320)),
    ("down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight", (320, 768)),
    ("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight", (320, 320)),
    ("down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight", (2560, 320)),
    ("down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight", (320, 1280)),
    ("down_blocks.0.downsamplers.0.conv.weight", (320, 320, 3, 3)),
    ("down_blocks.1.resnets.0.conv_shortcut.weight", (640, 320, 1, 1)),
    ("down_blocks.3.resnets.0.conv1.weight", (1280, 1280, 3, 3)),
    ("mid_block.attentions.0.transformer_blocks.0.ff.net.0.proj.weight", (10240, 1280)),
    ("mid_block.resnets.1.norm2.weight", (1280,)),
    ("up_blocks.0.resnets.0.conv_shortcut.weight", (1280, 2560, 1, 1)),
    ("up_blocks.1.upsamplers.0.conv.weight", (1280, 1280, 3, 3)),
    ("up_blocks.3.attentions.2.transformer_blocks.0.attn2.to_v.weight", (320, 768)),
    ("conv_norm_out.weight", (320,)),
    ("conv_out.weight", (4, 320, 3, 3)),
]

VAE_GOLDEN_KEYS = [
    ("encoder.conv_in.weight", (128, 3, 3, 3)),
    ("encoder.down_blocks.0.resnets.0.conv1.weight", (128, 128, 3, 3)),
    ("encoder.down_blocks.0.downsamplers.0.conv.weight", (128, 128, 3, 3)),
    ("encoder.down_blocks.1.resnets.0.conv_shortcut.weight", (256, 128, 1, 1)),
    ("encoder.mid_block.attentions.0.to_q.weight", (512, 512)),
    ("encoder.mid_block.attentions.0.group_norm.weight", (512,)),
    ("encoder.mid_block.resnets.0.conv1.weight", (512, 512, 3, 3)),
    ("encoder.conv_out.weight", (8, 512, 3, 3)),
    ("quant_conv.weight", (8, 8, 1, 1)),
    ("post_quant_conv.weight", (4, 4, 1, 1)),
    ("decoder.conv_in.weight", (512, 4, 3, 3)),
    ("decoder.up_blocks.0.resnets.0.conv1.weight", (512, 512, 3, 3)),
    ("decoder.up_blocks.0.upsamplers.0.conv.weight", (512, 512, 3, 3)),
    ("decoder.conv_out.weight", (3, 128, 3, 3)),
]

CLIP_GOLDEN_KEYS = [
    ("text_model.embeddings.token_embedding.weight", (49408, 768)),
    ("text_model.embeddings.position_embedding.weight", (77, 768)),
    ("text_model.encoder.layers.0.self_attn.q_proj.weight", (768, 768)),
    ("text_model.encoder.layers.0.self_attn.out_proj.bias", (768,)),
    ("text_model.encoder.layers.0.layer_norm1.weight", (768,)),
    ("text_model.encoder.layers.11.mlp.fc1.weight", (3072, 768)),
    ("text_model.encoder.layers.11.mlp.fc2.weight", (768, 3072)),
    ("text_model.final_layer_norm.weight", (768,)),
]


@pytest.mark.slow
def test_unet_fullsize_golden_keys():
    m = UNet2DConditionModel(UNetConfig())
    params = jax.eval_shape(
        lambda: m.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 4)), jnp.array([1]), jnp.zeros((1, 77, 768))
        )
    )
    shapes = jax.tree.map(lambda x: np.zeros(x.shape, np.float32), params)
    sd = unet_flax_to_torch(shapes)
    for key, shape in UNET_GOLDEN_KEYS:
        assert key in sd, f"missing {key}; sample: {sorted(sd)[:5]}"
        assert sd[key].shape == shape, f"{key}: {sd[key].shape} != {shape}"


@pytest.mark.slow
def test_vae_fullsize_golden_keys():
    m = AutoencoderKL(VAEConfig())
    params = jax.eval_shape(
        lambda: m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jax.random.key(1))
    )
    shapes = jax.tree.map(lambda x: np.zeros(x.shape, np.float32), params)
    sd = vae_flax_to_torch(shapes)
    for key, shape in VAE_GOLDEN_KEYS:
        assert key in sd, f"missing {key}"
        assert sd[key].shape == shape, f"{key}: {sd[key].shape} != {shape}"


@pytest.mark.slow
def test_clip_fullsize_golden_keys():
    m = CLIPTextModel(CLIPTextConfig())
    params = jax.eval_shape(lambda: m.init(jax.random.key(0), jnp.ones((1, 77), jnp.int32)))
    shapes = jax.tree.map(lambda x: np.zeros(x.shape, np.float32), params)
    sd = clip_flax_to_torch(shapes)
    for key, shape in CLIP_GOLDEN_KEYS:
        assert key in sd, f"missing {key}"
        assert sd[key].shape == shape, f"{key}: {sd[key].shape} != {shape}"


def test_pipeline_dir_roundtrip(tmp_path):
    d = str(tmp_path / "pipe")
    unet_cfg, vae_cfg, clip_cfg = make_tiny_pipeline_dir(d)
    assert os.path.exists(os.path.join(d, "model_index.json"))
    bundle = load_pipeline(d)
    assert bundle.unet_config == unet_cfg
    assert bundle.vae_config == vae_cfg
    assert bundle.text_config == clip_cfg

    # Loaded params must drive the models directly.
    m = UNet2DConditionModel(bundle.unet_config)
    out, _ = m.apply(
        bundle.unet_params, jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 77, 32))
    )
    assert out.shape == (1, 8, 8, 4)
    clip = CLIPTextModel(bundle.text_config)
    hs, _ = clip.apply(bundle.text_params, jnp.ones((2, 77), jnp.int32))
    assert hs.shape == (2, 77, 32)
    vae = AutoencoderKL(bundle.vae_config)
    mean, logvar = vae.apply(bundle.vae_params, jnp.zeros((1, 16, 16, 3)), method="encode")
    assert mean.shape == (1, 8, 8, 4)


def test_torch_bin_fallback(tmp_path):
    """Legacy .bin checkpoints load through the torch CPU fallback."""
    import torch

    cfg = CLIPTextConfig.tiny()
    m = CLIPTextModel(cfg)
    params = m.init(jax.random.key(0), jnp.ones((1, 77), jnp.int32))
    sd = clip_flax_to_torch(jax.tree.map(np.asarray, params))
    d = tmp_path / "text_encoder"
    d.mkdir()
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, d / "model.bin")
    import json

    from agenda_tpu.io.diffusers_io import clip_config_to_json, load_text_encoder

    with open(d / "config.json", "w") as f:
        json.dump(clip_config_to_json(cfg), f)
    cfg2, params2 = load_text_encoder(str(tmp_path))
    assert cfg2 == cfg
    hs1, _ = m.apply(params, jnp.ones((1, 77), jnp.int32))
    hs2, _ = m.apply(params2, jnp.ones((1, 77), jnp.int32))
    np.testing.assert_allclose(np.asarray(hs1), np.asarray(hs2), rtol=1e-6)


def test_torchvision_resnet50_import_structure():
    """A synthetic torchvision-layout resnet50 state dict must map exactly
    onto our flax ResNet50 variables (structure + shapes)."""
    from agenda_tpu.models.resnet import ResNet50
    from agenda_tpu.io.resnet_import import torchvision_resnet50_to_flax

    m = ResNet50(num_classes=1)
    var = jax.eval_shape(lambda: m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), False))

    # Construct a torchvision-style state dict with correct shapes.
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = np.zeros((o, i, k, k), np.float32)

    def bn(name, c):
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{leaf}"] = np.zeros((c,), np.float32)
        sd[f"{name}.num_batches_tracked"] = np.zeros((), np.int64)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cfgs = [(3, 64, 256), (4, 128, 512), (6, 256, 1024), (3, 512, 2048)]
    in_ch = 64
    for li, (n, planes, out_ch) in enumerate(cfgs, start=1):
        for bi in range(n):
            base = f"layer{li}.{bi}"
            conv(f"{base}.conv1", planes, in_ch if bi == 0 else out_ch, 1)
            bn(f"{base}.bn1", planes)
            conv(f"{base}.conv2", planes, planes, 3)
            bn(f"{base}.bn2", planes)
            conv(f"{base}.conv3", out_ch, planes, 1)
            bn(f"{base}.bn3", out_ch)
            if bi == 0:
                conv(f"{base}.downsample.0", out_ch, in_ch, 1)
                bn(f"{base}.downsample.1", out_ch)
        in_ch = out_ch
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)  # mismatched head: skipped
    sd["fc.bias"] = np.zeros((1000,), np.float32)

    params, batch_stats = torchvision_resnet50_to_flax(sd, num_classes=1)

    want_p = var["params"]
    want_b = var["batch_stats"]
    got_paths = {tuple(k) for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]}

    def paths(tree):
        return {
            tuple(p.key for p in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    # All mapped params must exist in the model with matching shapes (fc skipped).
    from flax import traverse_util

    got_flat = traverse_util.flatten_dict(params)
    want_flat = traverse_util.flatten_dict(want_p)
    for k, v in got_flat.items():
        assert k in want_flat, k
        assert tuple(v.shape) == tuple(want_flat[k].shape), (k, v.shape, want_flat[k].shape)
    missing = set(want_flat) - set(got_flat)
    assert missing == {("fc", "kernel"), ("fc", "bias")}, missing

    got_bs = traverse_util.flatten_dict(batch_stats)
    want_bs = traverse_util.flatten_dict(want_b)
    assert set(got_bs) == set(want_bs)
    for k, v in got_bs.items():
        assert tuple(v.shape) == tuple(want_bs[k].shape), k
