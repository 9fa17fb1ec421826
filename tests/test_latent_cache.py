"""Latent-moment caching (train/latent_cache.py): the cached path must be
BIT-IDENTICAL to encoding inside the step — the data transform is
deterministic (resize + normalize, dataset.py:33-56), so hoisting the frozen
VAE encoder out of the hot loop may not change a single ULP of training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agenda_tpu.core.schedules import make_schedule
from agenda_tpu.train.finetune_sd import LossConfig, init_train_state, make_train_step
from agenda_tpu.train.latent_cache import (
    LatentMomentsDataset,
    make_encode_moments_fn,
    precompute_latent_moments,
)
from agenda_tpu.train.optim import lr_schedule, make_optimizer

from test_train import make_batch, tiny_setup  # noqa: F401  (fixture)


class _RowsDataset:
    def __init__(self, rows):
        self.rows = rows

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        return dict(self.rows[i])


def test_cached_step_bit_identical_to_pixel_step(tiny_setup):  # noqa: F811
    t = tiny_setup
    schedule = make_schedule()
    tx = make_optimizer(lr_schedule("constant", 1e-3, 0, 100))
    state = init_train_state(t["unet_params"], tx, use_ema=True)
    step_fn = jax.jit(make_train_step(t["unet"], t["vae"], t["text"], schedule, tx,
                                      LossConfig(snr_gamma=5.0), use_ema=True))
    batch = jax.tree.map(jnp.asarray, make_batch(2, t["unet_cfg"].sample_size))
    rng = jax.random.key(7)

    s_pix, m_pix = step_fn(state, t["vae_params"], t["text_params"], batch, rng)

    moments = make_encode_moments_fn(t["vae"])(t["vae_params"], batch["pixel_values"])
    cached = {"latent_moments": moments, "input_ids": batch["input_ids"]}
    s_cache, m_cache = step_fn(state, t["vae_params"], t["text_params"], cached, rng)

    assert float(m_pix["loss"]) == float(m_cache["loss"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_pix.params, s_cache.params,
    )


def test_token_cached_step_bit_identical(tiny_setup):  # noqa: F811
    from agenda_tpu.models import CLIPTextConfig
    from agenda_tpu.train.finetune_sd_token import (
        TokenLossConfig,
        init_token_train_state,
        make_token_train_step,
    )

    t = tiny_setup
    clip_cfg = CLIPTextConfig.tiny()
    schedule = make_schedule()
    tx = make_optimizer(lr_schedule("constant", 1e-3, 0, 10), max_grad_norm=None)
    state = init_token_train_state(
        t["unet_params"], tx, train_token=True, train_unet=True,
        train_cross_attn=False, n_tokens=2, hidden_size=clip_cfg.hidden_size,
        rng=jax.random.key(1))
    cfg = TokenLossConfig(snr_gamma=5.0, with_cross_attn_reg=True,
                          reg_weight=0.5, train_token=True)
    step = jax.jit(make_token_train_step(t["unet"], t["vae"], t["text"],
                                         schedule, tx, cfg))
    batch = jax.tree.map(jnp.asarray, make_batch(2, t["unet_cfg"].sample_size))
    batch["new_tokens_start"] = jnp.asarray(np.array([[2, 9], [-1, -1]], np.int32))
    rng = jax.random.key(3)

    s_pix, m_pix = step(state, t["vae_params"], t["text_params"], batch, rng)
    moments = make_encode_moments_fn(t["vae"])(t["vae_params"], batch["pixel_values"])
    cached = {"latent_moments": moments, "input_ids": batch["input_ids"],
              "new_tokens_start": batch["new_tokens_start"]}
    s_cache, m_cache = step(state, t["vae_params"], t["text_params"], cached, rng)

    assert float(m_pix["loss"]) == float(m_cache["loss"])
    np.testing.assert_array_equal(np.asarray(s_pix.embedding),
                                  np.asarray(s_cache.embedding))


@pytest.mark.parametrize("n,bs", [(4, 2), (5, 2)])  # even + padded tail batch
def test_precompute_matches_direct_encode(tiny_setup, n, bs):  # noqa: F811
    t = tiny_setup
    s = t["unet_cfg"].sample_size
    host = np.random.RandomState(3)
    rows = [
        {"pixel_values": host.randn(4 * s, 4 * s, 3).astype(np.float32) * 0.1,
         "input_ids": np.full((77,), i, np.int32)}
        for i in range(n)
    ]
    ds = _RowsDataset(rows)
    moments = precompute_latent_moments(t["vae"], t["vae_params"], ds, batch_size=bs)
    assert moments.shape[0] == n and moments.dtype == np.float32

    encode = make_encode_moments_fn(t["vae"])
    for i in range(n):
        direct = np.asarray(encode(t["vae_params"], rows[i]["pixel_values"][None]))[0]
        np.testing.assert_array_equal(moments[i], direct)

    wrapped = LatentMomentsDataset(ds, moments)
    row = wrapped[1]
    assert "pixel_values" not in row and "pixel_u8" not in row
    np.testing.assert_array_equal(row["latent_moments"], moments[1])
    np.testing.assert_array_equal(row["input_ids"], rows[1]["input_ids"])
