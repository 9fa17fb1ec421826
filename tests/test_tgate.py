"""TGATE opt-in fast sampling (arXiv:2404.02747 — PAPERS.md item 2).

The sampler freezes each cross-attention layer's output contribution at a
gate step m and replays it for the remaining steps; since the two CFG halves
share x_t and differ only through cross-attention, the post-gate UNet runs at
batch B instead of 2B. Strictly opt-in (approximate sampling): the default
``tgate_step=0`` keeps the exact reference-parity path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agenda_tpu.generate.pipeline import StableDiffusionPipeline
from agenda_tpu.models import UNet2DConditionModel, UNetConfig
from fixtures import make_tiny_pipeline_dir


@pytest.fixture(scope="module")
def tiny_pipeline(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pipe"))
    make_tiny_pipeline_dir(d)
    return StableDiffusionPipeline.from_pretrained(d, dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    k = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    t = jnp.array([5, 5])
    ctx = jax.random.normal(jax.random.key(2), (2, 7, cfg.cross_attention_dim))
    params = unet.init(k, x, t, ctx)
    return unet, params, x, t, ctx


def test_cached_cross_replay_is_identity(tiny_unet):
    """Replaying a forward's own cross-attn cache must reproduce that forward
    exactly — validates the collect/consume threading order."""
    unet, params, x, t, ctx = tiny_unet
    eps_ref, _ = unet.apply(params, x, t, ctx)
    eps_col, _, cross = unet.apply(params, x, t, ctx, collect_cross=True)
    assert len(cross) == 4  # tiny config: 1 down + 1 mid + 2 up cross layers
    np.testing.assert_allclose(np.asarray(eps_col), np.asarray(eps_ref), rtol=0, atol=0)
    eps_replay, _ = unet.apply(params, x, t, ctx, cached_cross=cross)
    np.testing.assert_allclose(
        np.asarray(eps_replay), np.asarray(eps_col), rtol=1e-6, atol=1e-6
    )


def test_cached_cross_layer_count_full_topology():
    """SD-1.x topology: 6 down + 1 mid + 9 up = 16 cross-attn layers."""
    cfg = UNetConfig(
        sample_size=8,
        block_out_channels=(8, 8, 8, 8),
        layers_per_block=2,
        attention_head_dim=1,
        cross_attention_dim=8,
    )
    unet = UNet2DConditionModel(cfg)
    k = jax.random.key(0)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([1])
    ctx = jnp.zeros((1, 7, 8))
    params = unet.init(k, x, t, ctx)
    _, _, cross = unet.apply(params, x, t, ctx, collect_cross=True)
    assert len(cross) == 16


def test_cached_cross_wrong_half_changes_output(tiny_unet):
    """A perturbed cache must change eps (i.e. the cache is actually used)."""
    unet, params, x, t, ctx = tiny_unet
    _, _, cross = unet.apply(params, x, t, ctx, collect_cross=True)
    bad = [c + 1.0 for c in cross]
    eps_a, _ = unet.apply(params, x, t, ctx, cached_cross=cross)
    eps_b, _ = unet.apply(params, x, t, ctx, cached_cross=bad)
    assert not np.allclose(np.asarray(eps_a), np.asarray(eps_b))


@pytest.mark.parametrize("scheduler", ["pndm", "ddim"])
def test_pipeline_tgate_runs(tiny_pipeline, scheduler):
    """TGATE sampling produces valid outputs for both schedulers, with and
    without heatmaps, and differs from the exact path (it is approximate)."""
    pipe = tiny_pipeline
    pipe.scheduler_type = scheduler
    images, hm = pipe(
        "a photo of cars", seeds=[0, 1], num_inference_steps=4,
        collect_heatmaps=True, height=16, width=16, tgate_step=2,
    )
    assert images.shape[0] == 2 and images.dtype == np.uint8
    assert np.isfinite(hm).all()
    images_exact, _ = pipe(
        "a photo of cars", seeds=[0, 1], num_inference_steps=4,
        collect_heatmaps=True, height=16, width=16,
    )
    assert images_exact.shape == images.shape
    # Same seeds, same prompt: the only difference is the gate. (uint8
    # quantization could mask tiny diffs on a tiny model; don't assert
    # inequality, just that both paths are deterministic.)
    images2, _ = pipe(
        "a photo of cars", seeds=[0, 1], num_inference_steps=4,
        collect_heatmaps=True, height=16, width=16, tgate_step=2,
    )
    np.testing.assert_array_equal(images, images2)


def test_cli_accepts_tgate_flag():
    from agenda_tpu.cli.data_generation import parse_args

    a = parse_args([
        "--save-dir", "/tmp/x", "--pretrained-model-path", "p",
        "--learnable-tokens-embedding-path", "e", "--prompt", "cars",
        "--initialize_token", "cars", "--tgate-step", "10",
    ])
    assert a.tgate_step == 10


def test_tgate_sharded_matches_unsharded(tiny_pipeline):
    """TGATE sampling under an 8-device dp mesh must equal the unsharded
    TGATE path (the post-gate half-batch phase keeps the same dp sharding)."""
    from agenda_tpu.parallel.mesh import make_mesh

    pipe = tiny_pipeline
    pipe.scheduler_type = "pndm"
    kw = dict(seeds=list(range(8)), num_inference_steps=4,
              collect_heatmaps=True, height=16, width=16, tgate_step=2)
    ref_imgs, ref_heat = pipe("a photo of cars", **kw)
    pipe.mesh = make_mesh()
    try:
        imgs, heat = pipe("a photo of cars", **kw)
    finally:
        pipe.mesh = None
    np.testing.assert_allclose(imgs, ref_imgs, atol=2e-5)
    np.testing.assert_allclose(heat, ref_heat, atol=2e-5)
