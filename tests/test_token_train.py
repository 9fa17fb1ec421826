"""Token trainer tests: splice semantics, attn-reg loss vs an eager numpy
reimplementation of the reference loop (finetune_sd_token.py:1039-1069), and
parameter-selection splits."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agenda_tpu.train.finetune_sd_token import (
    attn_reg_loss,
    merge_params,
    splice_token_embeddings,
    split_unet_params,
)


def test_splice_token_embeddings_matches_loops():
    rng = np.random.RandomState(0)
    b, s, c, k, n = 3, 12, 4, 2, 1
    base = rng.randn(b, s, c).astype(np.float32)
    emb = rng.randn(k, c).astype(np.float32)
    starts = np.array([[2, 7], [-1, 5], [0, -1]], np.int32)  # 0 is NOT spliced (>0 guard)

    got = np.asarray(
        splice_token_embeddings(jnp.asarray(base), jnp.asarray(starts), jnp.asarray(emb), n)
    )

    want = base.copy()
    for i in range(b):
        for j, start in enumerate(starts[i]):
            if start > 0:
                want[i, start : start + n] = emb[j]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_splice_multi_embedding_width():
    b, s, c = 1, 10, 3
    base = np.zeros((b, s, c), np.float32)
    emb = np.ones((1, c), np.float32) * 5
    starts = np.array([[4]], np.int32)
    got = np.asarray(
        splice_token_embeddings(jnp.asarray(base), jnp.asarray(starts), jnp.asarray(emb), 3)
    )
    assert np.all(got[0, 4:7] == 5) and np.all(got[0, :4] == 0) and np.all(got[0, 7:] == 0)


def numpy_attn_reg(maps, starts, n_obj, reg_weight):
    """Eager reimplementation of the reference loop (per layer, per sample)."""
    n_valid = max(int((starts[:, 0] > 0).sum()), 1)
    fg_total = 0.0
    bg_total = 0.0
    for m in maps:  # (B, T, h, w)
        for i in range(m.shape[0]):
            if starts[i, 0] > 0:
                obj = m[i, starts[i, 0] + n_obj]
                norm_obj = (obj - obj.min()) / (obj.max() - obj.min() + 1e-8)
                bg_ref = 1 - norm_obj
                bg_ref = bg_ref / bg_ref.sum()
                norm_obj = norm_obj / norm_obj.sum()

                fg = m[i, starts[i, 0]]
                fg = (fg - fg.min()) / (fg.max() - fg.min() + 1e-8)
                fg = fg / fg.sum()

                valid_idx = starts[i][starts[i] > -1]
                bg = m[i, valid_idx[-1]]
                bg = (bg - bg.min()) / (bg.max() - bg.min() + 1e-8)
                bg = bg / bg.sum()

                bg_total += reg_weight * np.abs(bg_ref - bg).mean() / n_valid
                fg_total += reg_weight * np.abs(norm_obj - fg).mean() / n_valid
    n_layers = len(maps)
    return (fg_total + bg_total) / n_layers, fg_total / n_layers, bg_total / n_layers


def test_attn_reg_loss_matches_reference_math():
    rng = np.random.RandomState(1)
    b, t = 3, 16
    maps = [np.abs(rng.rand(b, t, h, h)).astype(np.float32) for h in (8, 4)]
    starts = np.array([[2, 9], [-1, 5], [3, 11]], np.int32)
    attn, fg, bg = attn_reg_loss([jnp.asarray(m) for m in maps], jnp.asarray(starts), 1, 0.5)
    ref_attn, ref_fg, ref_bg = numpy_attn_reg(maps, starts, 1, 0.5)
    np.testing.assert_allclose(float(attn), ref_attn, rtol=1e-4)
    np.testing.assert_allclose(float(fg), ref_fg, rtol=1e-4)
    np.testing.assert_allclose(float(bg), ref_bg, rtol=1e-4)


def test_attn_reg_loss_no_valid_samples():
    maps = [jnp.asarray(np.random.rand(2, 8, 4, 4).astype(np.float32))]
    starts = jnp.asarray(np.array([[-1, -1], [0, -1]], np.int32))
    attn, fg, bg = attn_reg_loss(maps, starts, 1, 0.5)
    assert float(attn) == 0.0


def test_split_unet_params_cross_attn():
    from agenda_tpu.models import UNet2DConditionModel, UNetConfig

    m = UNet2DConditionModel(UNetConfig.tiny())
    params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.array([1]),
                    jnp.zeros((1, 77, 32)))

    # full unet trainable
    train, frozen = split_unet_params(params, train_unet=True, train_cross_attn=False)
    assert frozen == {}

    # cross-attn only
    train, frozen = split_unet_params(params, train_unet=False, train_cross_attn=True)
    from flax import traverse_util

    t_flat = traverse_util.flatten_dict(train)
    f_flat = traverse_util.flatten_dict(frozen)
    assert t_flat and f_flat
    assert all(any("attn2" in p for p in k) for k in t_flat)
    assert not any(any("attn2" in p for p in k) for k in f_flat)

    # merge restores the full tree
    merged = merge_params(train, frozen)
    orig = params["params"]
    assert set(traverse_util.flatten_dict(merged)) == set(traverse_util.flatten_dict(orig))

    # frozen-everything (token-only mode)
    train, frozen = split_unet_params(params, train_unet=False, train_cross_attn=False)
    assert train == {}


def test_token_train_step_runs_and_updates_embedding():
    from agenda_tpu.core.schedules import make_schedule
    from agenda_tpu.models import (
        AutoencoderKL, CLIPTextConfig, CLIPTextModel, UNet2DConditionModel,
        UNetConfig, VAEConfig,
    )
    from agenda_tpu.train.finetune_sd_token import (
        TokenLossConfig, init_token_train_state, make_token_train_step,
    )
    from agenda_tpu.train.optim import lr_schedule, make_optimizer

    unet_cfg = UNetConfig.tiny()
    clip_cfg = CLIPTextConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    unet = UNet2DConditionModel(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextModel(clip_cfg)
    k = jax.random.key(0)
    s = unet_cfg.sample_size
    unet_params = unet.init(k, jnp.zeros((1, s, s, 4)), jnp.array([1]),
                            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)))
    vae_params = vae.init(k, jnp.zeros((1, 2 * s, 2 * s, 3)), k)
    text_params = text.init(k, jnp.ones((1, 77), jnp.int32))

    tx = make_optimizer(lr_schedule("constant", 1e-3, 0, 10), max_grad_norm=None)
    state = init_token_train_state(unet_params, tx, train_token=True, train_unet=True,
                                   train_cross_attn=False, n_tokens=2,
                                   hidden_size=clip_cfg.hidden_size, rng=jax.random.key(1))
    cfg = TokenLossConfig(snr_gamma=5.0, with_cross_attn_reg=True, reg_weight=0.5,
                          train_token=True)
    schedule = make_schedule()
    step = jax.jit(make_token_train_step(unet, vae, text, schedule, tx, cfg))

    batch = {
        "pixel_values": jnp.asarray(np.random.RandomState(0).randn(2, 2 * s, 2 * s, 3), jnp.float32) * 0.1,
        "input_ids": jnp.ones((2, 77), jnp.int32),
        "new_tokens_start": jnp.asarray(np.array([[2, 9], [-1, -1]], np.int32)),
    }
    emb0 = np.asarray(state.embedding)
    state2, metrics = step(state, vae_params, text_params, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["attn_loss"]) > 0
    assert np.abs(np.asarray(state2.embedding) - emb0).max() > 0  # tokens learned
    # unet params moved too (train_unet)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.unet_trainable, state2.unet_trainable)
    assert max(jax.tree.leaves(d)) > 0


def test_get_token_embeds():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from fixtures import write_tiny_tokenizer
    import tempfile

    from agenda_tpu.data.tokenizer import CLIPTokenizer
    from agenda_tpu.data.tokens import get_token_embeds

    d = tempfile.mkdtemp()
    vocab = write_tiny_tokenizer(d)
    tok = CLIPTokenizer.from_pretrained(d)
    table = np.arange(vocab * 4, dtype=np.float32).reshape(vocab, 4)
    out = get_token_embeds("cars", tok, table)
    # 'cars' is one merged token in the fixture vocab -> exactly one row,
    # equal to its table entry (no BOS/EOS rows included).
    ids = [tok._token_to_id(t) for t in tok.tokenize("cars")]
    assert out.shape == (1, 4)
    np.testing.assert_array_equal(out[0], table[ids[0]])


def test_gradient_checkpointing_train_step():
    """remat-wrapped UNet must train identically-shaped and finite."""
    from agenda_tpu.core.schedules import make_schedule
    from agenda_tpu.models import (
        AutoencoderKL, CLIPTextConfig, CLIPTextModel, UNet2DConditionModel,
        UNetConfig, VAEConfig,
    )
    from agenda_tpu.train.finetune_sd import LossConfig, init_train_state, make_train_step
    from agenda_tpu.train.optim import lr_schedule, make_optimizer

    unet_cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(unet_cfg, gradient_checkpointing=True)
    vae = AutoencoderKL(VAEConfig.tiny())
    text = CLIPTextModel(CLIPTextConfig.tiny())
    k = jax.random.key(0)
    s = unet_cfg.sample_size
    unet_params = unet.init(k, jnp.zeros((1, s, s, 4)), jnp.array([1]),
                            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)))
    vae_params = vae.init(k, jnp.zeros((1, 2 * s, 2 * s, 3)), k)
    text_params = text.init(k, jnp.ones((1, 77), jnp.int32))

    tx = make_optimizer(lr_schedule("constant", 1e-4, 0, 10))
    state = init_train_state(unet_params, tx, use_ema=False)
    step = jax.jit(make_train_step(unet, vae, text, make_schedule(), tx, LossConfig()))
    batch = {
        "pixel_values": jnp.zeros((2, 2 * s, 2 * s, 3)),
        "input_ids": jnp.ones((2, 77), jnp.int32),
    }
    state2, metrics = step(state, vae_params, text_params, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
