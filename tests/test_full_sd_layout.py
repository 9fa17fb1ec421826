"""Full-size SD-1.x checkpoint-layout coverage (fabricated, zero-egress).

The reference's entire generation stage starts from SD-1.4 weights in the
HF-diffusers directory layout (``data_generation/finetune_sd.py:485-520``,
``data_generation/README.md:19,26``). Real weights are absent in this
deployment, so this module proves the import/export path at PRODUCTION scale
with an *independently derived* manifest: the expected torch state-dict
key -> shape map is generated here from the public diffusers naming rules and
the SD-1.x architecture alone (never from our converters), then compared
exactly against ``unet_flax_to_torch``/``vae_flax_to_torch``/
``clip_flax_to_torch`` run on full-size parameter trees.

What this catches that the tiny-config tests cannot: every block-boundary
channel count (the up-block skip-concat widths 2560/1920/960/640), the
full key census (686 unet / 248 vae / 196 text tensors — the real SD-1.x
file sizes), and transposition mistakes on square full-size matrices via
positional fingerprints.
"""

import numpy as np
import pytest

import jax

from agenda_tpu.io.diffusers_io import (
    clip_flax_to_torch,
    clip_torch_to_flax,
    unet_flax_to_torch,
    unet_torch_to_flax,
    vae_flax_to_torch,
    vae_torch_to_flax,
)
from agenda_tpu.models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    UNet2DConditionModel,
    UNetConfig,
    VAEConfig,
)

# ---------------------------------------------------------------------------
# Independent manifests (diffusers SD-1.x naming rules, derived from the
# architecture — NOT from our converters)
# ---------------------------------------------------------------------------


class _Manifest(dict):
    def norm(self, p, c):
        self[p + ".weight"] = (c,)
        self[p + ".bias"] = (c,)

    def conv(self, p, o, i, k):
        self[p + ".weight"] = (o, i, k, k)
        self[p + ".bias"] = (o,)

    def lin(self, p, o, i, bias=True):
        self[p + ".weight"] = (o, i)
        if bias:
            self[p + ".bias"] = (o,)


def expected_unet_manifest(block_out=(320, 640, 1280, 1280), layers=2,
                           cross=768, in_ch=4, out_ch=4):
    """SD-1.x UNet2DConditionModel state-dict keys+shapes (diffusers layout)."""
    m = _Manifest()
    temb = block_out[0] * 4

    def resnet(p, i, o):
        m.norm(p + ".norm1", i)
        m.conv(p + ".conv1", o, i, 3)
        m.lin(p + ".time_emb_proj", o, temb)
        m.norm(p + ".norm2", o)
        m.conv(p + ".conv2", o, o, 3)
        if i != o:
            m.conv(p + ".conv_shortcut", o, i, 1)

    def attn(p, c):
        m.norm(p + ".norm", c)
        m.conv(p + ".proj_in", c, c, 1)
        tb = p + ".transformer_blocks.0"
        m.norm(tb + ".norm1", c)
        for n in ("to_q", "to_k", "to_v"):
            m.lin(f"{tb}.attn1.{n}", c, c, bias=False)
        m.lin(tb + ".attn1.to_out.0", c, c)
        m.norm(tb + ".norm2", c)
        m.lin(tb + ".attn2.to_q", c, c, bias=False)
        m.lin(tb + ".attn2.to_k", c, cross, bias=False)
        m.lin(tb + ".attn2.to_v", c, cross, bias=False)
        m.lin(tb + ".attn2.to_out.0", c, c)
        m.norm(tb + ".norm3", c)
        m.lin(tb + ".ff.net.0.proj", c * 8, c)  # GEGLU: 2x the 4x-mult inner
        m.lin(tb + ".ff.net.2", c, c * 4)
        m.conv(p + ".proj_out", c, c, 1)

    m.conv("conv_in", block_out[0], in_ch, 3)
    m.lin("time_embedding.linear_1", temb, block_out[0])
    m.lin("time_embedding.linear_2", temb, temb)

    skips = [block_out[0]]
    ch = block_out[0]
    n_blocks = len(block_out)
    for bi, out in enumerate(block_out):
        cross_block = bi < n_blocks - 1  # CrossAttn x3 + plain DownBlock2D
        for li in range(layers):
            resnet(f"down_blocks.{bi}.resnets.{li}", ch, out)
            ch = out
            if cross_block:
                attn(f"down_blocks.{bi}.attentions.{li}", out)
            skips.append(out)
        if bi < n_blocks - 1:
            m.conv(f"down_blocks.{bi}.downsamplers.0.conv", out, out, 3)
            skips.append(out)

    resnet("mid_block.resnets.0", ch, ch)
    attn("mid_block.attentions.0", ch)
    resnet("mid_block.resnets.1", ch, ch)

    for bi, out in enumerate(reversed(block_out)):
        cross_block = bi > 0  # plain UpBlock2D + CrossAttn x3
        for li in range(layers + 1):
            resnet(f"up_blocks.{bi}.resnets.{li}", ch + skips.pop(), out)
            ch = out
            if cross_block:
                attn(f"up_blocks.{bi}.attentions.{li}", out)
        if bi < n_blocks - 1:
            m.conv(f"up_blocks.{bi}.upsamplers.0.conv", out, out, 3)
    assert not skips

    m.norm("conv_norm_out", block_out[0])
    m.conv("conv_out", out_ch, block_out[0], 3)
    return dict(m)


def expected_vae_manifest(block_out=(128, 256, 512, 512), layers=2,
                          latent=4, img_ch=3):
    """SD-1.x AutoencoderKL state-dict keys+shapes (modern diffusers naming:
    mid attention as to_q/to_k/to_v/to_out.0 + group_norm)."""
    m = _Manifest()

    def resnet(p, i, o):
        m.norm(p + ".norm1", i)
        m.conv(p + ".conv1", o, i, 3)
        m.norm(p + ".norm2", o)
        m.conv(p + ".conv2", o, o, 3)
        if i != o:
            m.conv(p + ".conv_shortcut", o, i, 1)

    def mid(scope, c):
        resnet(f"{scope}.mid_block.resnets.0", c, c)
        a = f"{scope}.mid_block.attentions.0"
        m.norm(a + ".group_norm", c)
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            m.lin(f"{a}.{n}", c, c)
        resnet(f"{scope}.mid_block.resnets.1", c, c)

    # encoder
    m.conv("encoder.conv_in", block_out[0], img_ch, 3)
    ch = block_out[0]
    for bi, out in enumerate(block_out):
        for li in range(layers):
            resnet(f"encoder.down_blocks.{bi}.resnets.{li}", ch, out)
            ch = out
        if bi < len(block_out) - 1:
            m.conv(f"encoder.down_blocks.{bi}.downsamplers.0.conv", out, out, 3)
    mid("encoder", ch)
    m.norm("encoder.conv_norm_out", ch)
    m.conv("encoder.conv_out", 2 * latent, ch, 3)

    # decoder
    m.conv("decoder.conv_in", block_out[-1], latent, 3)
    mid("decoder", block_out[-1])
    ch = block_out[-1]
    for bi, out in enumerate(reversed(block_out)):
        for li in range(layers + 1):
            resnet(f"decoder.up_blocks.{bi}.resnets.{li}", ch, out)
            ch = out
        if bi < len(block_out) - 1:
            m.conv(f"decoder.up_blocks.{bi}.upsamplers.0.conv", out, out, 3)
    m.norm("decoder.conv_norm_out", ch)
    m.conv("decoder.conv_out", img_ch, ch, 3)

    m.conv("quant_conv", 2 * latent, 2 * latent, 1)
    m.conv("post_quant_conv", latent, latent, 1)
    return dict(m)


def expected_clip_manifest(hidden=768, layers=12, inter=3072, vocab=49408,
                           max_pos=77):
    """SD-1.x CLIPTextModel (ViT-L/14 text tower) state-dict keys+shapes."""
    m = _Manifest()
    m["text_model.embeddings.token_embedding.weight"] = (vocab, hidden)
    m["text_model.embeddings.position_embedding.weight"] = (max_pos, hidden)
    for i in range(layers):
        p = f"text_model.encoder.layers.{i}"
        m.norm(p + ".layer_norm1", hidden)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m.lin(f"{p}.self_attn.{n}", hidden, hidden)
        m.norm(p + ".layer_norm2", hidden)
        m.lin(p + ".mlp.fc1", inter, hidden)
        m.lin(p + ".mlp.fc2", hidden, inter)
    m.norm("text_model.final_layer_norm", hidden)
    return dict(m)


# ---------------------------------------------------------------------------
# Full-size param materialization with positional fingerprints
# ---------------------------------------------------------------------------


def _fingerprint_tree(shape_tree, seed=0):
    """Fill every leaf with a distinct positional ramp: catches transposition
    bugs even on square matrices (where shapes alone cannot)."""
    leaves, treedef = jax.tree_util.tree_flatten(shape_tree)
    out = []
    for idx, leaf in enumerate(leaves):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        v = ((np.arange(n, dtype=np.int64) * 7 + idx * 131) % 509).astype(
            np.float32).reshape(leaf.shape)
        out.append(v)
    return jax.tree_util.tree_unflatten(treedef, out)


def _shapes(model_init):
    return jax.eval_shape(model_init)


@pytest.fixture(scope="module")
def full_unet_params():
    unet = UNet2DConditionModel(UNetConfig())
    shapes = _shapes(lambda: unet.init(
        jax.random.key(0), np.zeros((1, 64, 64, 4), np.float32),
        np.array([1]), np.zeros((1, 77, 768), np.float32)))
    return _fingerprint_tree(shapes)


@pytest.mark.slow
def test_unet_full_layout_matches_sd1x(full_unet_params):
    manifest = expected_unet_manifest()
    assert len(manifest) == 686  # the real SD-1.x unet tensor census
    sd = unet_flax_to_torch(full_unet_params)
    assert set(sd) == set(manifest)
    for k, shape in manifest.items():
        assert sd[k].shape == shape, (k, sd[k].shape, shape)


@pytest.mark.slow
def test_unet_full_roundtrip_bit_exact(full_unet_params):
    sd = unet_flax_to_torch(full_unet_params)
    back = unet_torch_to_flax(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(full_unet_params["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    assert len(flat_a) == len(flat_b) == 686
    for path, v in flat_a:
        w = flat_b[path]
        assert v.shape == w.shape and np.array_equal(v, w), path


@pytest.mark.slow
def test_vae_full_layout_matches_sd1x():
    vae = AutoencoderKL(VAEConfig())
    shapes = _shapes(lambda: vae.init(
        jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32),
        jax.random.key(0)))
    params = _fingerprint_tree(shapes)
    manifest = expected_vae_manifest()
    assert len(manifest) == 248  # the real SD-1.x vae tensor census
    sd = vae_flax_to_torch(params)
    assert set(sd) == set(manifest)
    for k, shape in manifest.items():
        assert sd[k].shape == shape, (k, sd[k].shape, shape)
    back = vae_torch_to_flax(sd)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    for path, v in jax.tree_util.tree_leaves_with_path(params["params"]):
        assert np.array_equal(v, flat_b[path]), path


@pytest.mark.slow
def test_clip_full_layout_matches_sd1x():
    text = CLIPTextModel(CLIPTextConfig())
    shapes = _shapes(lambda: text.init(
        jax.random.key(0), np.ones((1, 77), np.int32)))
    params = _fingerprint_tree(shapes)
    manifest = expected_clip_manifest()
    assert len(manifest) == 196  # the real SD-1.x text-encoder tensor census
    sd = clip_flax_to_torch(params)
    assert set(sd) == set(manifest)
    for k, shape in manifest.items():
        assert sd[k].shape == shape, (k, sd[k].shape, shape)
    back = clip_torch_to_flax(sd)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    for path, v in jax.tree_util.tree_leaves_with_path(params["params"]):
        assert np.array_equal(v, flat_b[path]), path


@pytest.mark.tpu
def test_fabricated_full_checkpoint_generates_512(tmp_path):
    """Production-scale importer exercise on the chip: write a FULL-size
    fabricated SD-1.x pipeline directory (real shapes, diffusers layout),
    re-import it through ``StableDiffusionPipeline.from_pretrained``, and run
    one 512x512 sampling step batch — the path real SD-1.4 weights take
    (``data_generation/data_generation.py:30-31``), minus the weights."""
    if jax.default_backend() == "cpu":
        pytest.skip("needs a TPU backend (run with AGENDA_TPU_TESTS=1)")
    import jax.numpy as jnp

    from agenda_tpu.generate.pipeline import StableDiffusionPipeline
    from agenda_tpu.io.diffusers_io import save_pipeline
    from agenda_tpu.io.tiny_fixture import write_tiny_tokenizer

    def small(shape_tree, seed):
        leaves, treedef = jax.tree_util.tree_flatten(shape_tree)
        rng = np.random.RandomState(seed)
        return jax.tree_util.tree_unflatten(
            treedef,
            [rng.normal(0, 0.02, l.shape).astype(np.float32) for l in leaves])

    unet_cfg, vae_cfg, text_cfg = UNetConfig(), VAEConfig(), CLIPTextConfig()
    unet = UNet2DConditionModel(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextModel(text_cfg)
    unet_params = small(_shapes(lambda: unet.init(
        jax.random.key(0), np.zeros((1, 64, 64, 4), np.float32),
        np.array([1]), np.zeros((1, 77, 768), np.float32))), 1)
    vae_params = small(_shapes(lambda: vae.init(
        jax.random.key(0), np.zeros((1, 512, 512, 3), np.float32),
        jax.random.key(0))), 2)
    text_params = small(_shapes(lambda: text.init(
        jax.random.key(0), np.ones((1, 77), np.int32))), 3)

    d = str(tmp_path / "full_pipe")
    tok_dir = str(tmp_path / "tok")
    write_tiny_tokenizer(tok_dir)
    save_pipeline(d, unet_cfg, unet_params, vae_cfg, vae_params,
                  text_cfg, text_params, tokenizer_dir=tok_dir)

    pipe = StableDiffusionPipeline.from_pretrained(d, dtype=jnp.bfloat16)
    # Tiny tokenizer vocab < full CLIP vocab: ids still index validly.
    imgs, maps = pipe("an aerial view image with cars in utah",
                      seeds=[0, 1], num_inference_steps=2, words=["cars"],
                      height=512, width=512, out_size=112)
    assert imgs.shape == (2, 112, 112, 3) and imgs.dtype == np.uint8
    assert maps["cars"].shape == (2, 64, 64) and maps["cars"].dtype == np.uint8


def test_vae_legacy_attention_naming_imports():
    """Old SD-1.4 vae checkpoints spell the mid attention query/key/value/
    proj_attn (pre-0.13 diffusers); the importer must accept both."""
    vae = AutoencoderKL(VAEConfig())
    shapes = _shapes(lambda: vae.init(
        jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32),
        jax.random.key(0)))
    params = _fingerprint_tree(shapes)
    sd = vae_flax_to_torch(params)
    legacy = {}
    for k, v in sd.items():
        k = k.replace(".to_q.", ".query.").replace(".to_k.", ".key.")
        k = k.replace(".to_v.", ".value.").replace(".to_out.0.", ".proj_attn.")
        legacy[k] = v
    back = vae_torch_to_flax(legacy)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    for path, v in jax.tree_util.tree_leaves_with_path(params["params"]):
        assert np.array_equal(v, flat_b[path]), path
