"""End-to-end generation pipeline tests on the tiny fixture checkpoint."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agenda_tpu.generate.pipeline import (
    StableDiffusionPipeline,
    heatmap_to_uint8,
    images_to_uint8,
)
from agenda_tpu.kernels.attention import cross_attention_with_probs
from fixtures import make_tiny_pipeline_dir


@pytest.fixture(scope="module")
def tiny_pipe(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pipe"))
    make_tiny_pipeline_dir(d)
    return StableDiffusionPipeline.from_pretrained(d, dtype=jnp.float32)


def test_cross_attention_probs_match_numpy():
    """The fused DAAM side output must equal explicit softmax(QK^T/sqrt(d))
    head-averaged — the quantity hook.py:108-111 recomputes via hooks."""
    rng = np.random.RandomState(0)
    b, sq, sk, h, d = 2, 16, 7, 3, 8
    q = rng.randn(b, sq, h, d).astype(np.float32)
    k = rng.randn(b, sk, h, d).astype(np.float32)
    v = rng.randn(b, sk, h, d).astype(np.float32)
    out, probs = cross_attention_with_probs(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(probs), p.mean(axis=1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out), np.einsum("bhqk,bkhd->bqhd", p, v), rtol=1e-4, atol=1e-5
    )


def test_generate_shapes_and_determinism(tiny_pipe):
    prompt = "an aerial view image with cars in utah"
    imgs1, heat1 = tiny_pipe(prompt, seeds=[0, 1], num_inference_steps=4,
                             collect_heatmaps=True, height=64, width=64)
    assert imgs1.shape == (2, 64, 64, 3)
    assert imgs1.dtype == np.uint8
    assert heat1.shape == (2, 77, tiny_pipe.latent_hw, tiny_pipe.latent_hw)
    assert np.all(np.isfinite(heat1))
    assert np.all(heat1 >= 0)  # clamped post-softmax probabilities

    imgs2, heat2 = tiny_pipe(prompt, seeds=[0, 1], num_inference_steps=4,
                             collect_heatmaps=True, height=64, width=64)
    np.testing.assert_array_equal(imgs1, imgs2)
    np.testing.assert_array_equal(heat1, heat2)

    # Different seeds give different images.
    imgs3, _ = tiny_pipe(prompt, seeds=[2, 3], num_inference_steps=4,
                         collect_heatmaps=True, height=64, width=64)
    assert np.abs(imgs3.astype(int) - imgs1.astype(int)).max() > 0


def test_guidance_scale_changes_output(tiny_pipe):
    prompt = "cars"
    a, _ = tiny_pipe(prompt, seeds=[0], num_inference_steps=2, guidance_scale=1.0,
                     height=64, width=64)
    b, _ = tiny_pipe(prompt, seeds=[0], num_inference_steps=2, guidance_scale=9.0,
                     height=64, width=64)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_word_heatmap_and_uint8(tiny_pipe):
    prompt = "an aerial view image with cars in utah"
    _, heat = tiny_pipe(prompt, seeds=[0], num_inference_steps=2,
                        collect_heatmaps=True, height=64, width=64)
    wh = tiny_pipe.word_heatmap(heat, prompt, "cars")
    assert wh.shape == (1, tiny_pipe.latent_hw, tiny_pipe.latent_hw)
    u8 = heatmap_to_uint8(wh[0], 112)
    assert u8.shape == (112, 112) and u8.dtype == np.uint8
    # Min-max normalization happens BEFORE the resize (data_generation.py:82-85),
    # so the pre-resize map spans exactly [0, 255]; interpolation may smooth the
    # extremes slightly.
    # astype truncation makes the top value 254 (reference does the same).
    pre = heatmap_to_uint8(wh[0], wh.shape[-1])
    assert pre.max() >= 254 and pre.min() == 0


def test_learned_token_injection(tiny_pipe):
    emb_dim = tiny_pipe.text_encoder.config.hidden_size
    tok_embed = np.full((emb_dim,), 0.25, np.float32)
    ids = tiny_pipe.add_learned_tokens({"newtok_v0": tok_embed})
    table = np.asarray(tiny_pipe.text_params["params"]["token_embedding"])
    np.testing.assert_allclose(table[ids[0]], tok_embed)
    # The token must tokenize to exactly one id and be usable in a prompt.
    enc = tiny_pipe.tokenizer.encode("newtok_v0 cars")
    assert enc[1] == ids[0]
    imgs, _ = tiny_pipe("newtok_v0 cars", seeds=[0], num_inference_steps=2,
                        height=64, width=64)
    assert np.all(np.isfinite(imgs))


def test_images_to_uint8():
    x = np.array([[[[0.0, 0.5, 1.0]]]])
    out = images_to_uint8(x)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[0, 0, 0], [0, 128, 255])


def test_sharded_generation_8dev(tiny_pipe):
    """Seed batch sharded over an 8-device dp mesh must produce the same
    images as the unsharded path."""
    from agenda_tpu.parallel.mesh import make_mesh

    prompt = "cars in utah"
    ref_imgs, ref_heat = tiny_pipe(prompt, seeds=list(range(8)), num_inference_steps=2,
                                   collect_heatmaps=True, height=64, width=64)
    tiny_pipe.mesh = make_mesh()
    try:
        imgs, heat = tiny_pipe(prompt, seeds=list(range(8)), num_inference_steps=2,
                               collect_heatmaps=True, height=64, width=64)
    finally:
        tiny_pipe.mesh = None
    np.testing.assert_allclose(imgs, ref_imgs, atol=2e-5)
    np.testing.assert_allclose(heat, ref_heat, atol=2e-5)


def test_device_side_word_heatmaps_match_host_path(tiny_pipe):
    """words=... (on-device normalize+uint8) must match the f32 host path
    (word_heatmap + heatmap_to_uint8) up to uint8 rounding."""
    prompt = "an aerial view image with cars in utah"
    imgs, word_maps = tiny_pipe(prompt, seeds=[0, 1], num_inference_steps=2,
                                height=64, width=64, words=["cars", "utah"])
    assert imgs.dtype == np.uint8
    assert set(word_maps) == {"cars", "utah"}
    assert word_maps["cars"].dtype == np.uint8

    _, heat = tiny_pipe(prompt, seeds=[0, 1], num_inference_steps=2,
                        collect_heatmaps=True, height=64, width=64)
    for w in ("cars", "utah"):
        ref = tiny_pipe.word_heatmap(heat, prompt, w)  # (B, hw, hw) f32
        for j in range(2):
            ref_u8 = heatmap_to_uint8(ref[j], ref.shape[-1])
            got = word_maps[w][j]
            assert np.abs(got.astype(int) - ref_u8.astype(int)).max() <= 1
