"""ViTDet backbone machinery: window partition/unpartition, decomposed
relative-position bias (vs a naive loop oracle), drop-path semantics
(Real_Source/vitdet.py:66-80 feature set)."""

import jax
import jax.numpy as jnp
import numpy as np

from agenda_tpu.detect.vitdet import (
    _decomposed_rel_pos_bias,
    _interp_rel_pos,
    _window_partition,
    _window_unpartition,
)


def test_window_roundtrip_with_padding():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 5, 7, 3), jnp.float32)
    wins, pad_hw = _window_partition(x, 4)
    assert wins.shape == (2 * 2 * 2, 4, 4, 3)  # 5->8, 7->8 padded
    assert pad_hw == (8, 8)
    back = _window_unpartition(wins, 4, pad_hw, (5, 7))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
    # padding area is zeros (detectron2 pads, doesn't mask)
    assert float(jnp.abs(wins[1, :, 3:]).sum()) == 0.0  # top-right window edge


def test_window_partition_exact_grid():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 4, 4, 2), jnp.float32)
    wins, pad_hw = _window_partition(x, 2)
    assert wins.shape == (4, 2, 2, 2) and pad_hw == (4, 4)
    # window 0 is the top-left 2x2 block
    np.testing.assert_allclose(np.asarray(wins[0]), np.asarray(x[0, :2, :2]))


def test_interp_rel_pos():
    t = jnp.asarray(np.linspace(0, 10, 11)[:, None].repeat(3, 1), jnp.float32)
    out = _interp_rel_pos(t, 21)
    assert out.shape == (21, 3)
    np.testing.assert_allclose(float(out[0, 0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(out[-1, 0]), 10.0, atol=1e-5)
    # identity when lengths match
    assert _interp_rel_pos(t, 11) is t


def test_decomposed_rel_pos_bias_vs_loop():
    rng = np.random.RandomState(2)
    b, qh, qw, heads, hd = 2, 3, 3, 2, 4
    n = qh * qw
    q = jnp.asarray(rng.rand(b, n, heads, hd), jnp.float32)
    rel_h = jnp.asarray(rng.rand(2 * qh - 1, hd), jnp.float32)
    rel_w = jnp.asarray(rng.rand(2 * qw - 1, hd), jnp.float32)
    bias = np.asarray(_decomposed_rel_pos_bias(q, rel_h, rel_w, qh, qw))
    assert bias.shape == (b, heads, n, n)

    # naive oracle: bias[b,h,(i,j),(k,l)] = q.(rel_h[i-k]) + q.(rel_w[j-l])
    qg = np.asarray(q).reshape(b, qh, qw, heads, hd)
    for bi in range(b):
        for h in range(heads):
            for i in range(qh):
                for j in range(qw):
                    for k in range(qh):
                        for l in range(qw):
                            want = (qg[bi, i, j, h] @ np.asarray(rel_h)[i - k + qh - 1]
                                    + qg[bi, i, j, h] @ np.asarray(rel_w)[j - l + qw - 1])
                            got = bias[bi, h, i * qw + j, k * qw + l]
                            np.testing.assert_allclose(got, want, rtol=1e-5)


def test_vitblock_droppath_and_window_forward():
    from agenda_tpu.detect.vitdet import ViTBlock

    x = jnp.asarray(np.random.RandomState(3).rand(2, 4, 4, 8), jnp.float32)
    blk = ViTBlock(heads=2, window_size=2, drop_path=0.5, use_rel_pos=True)
    v = blk.init(jax.random.key(0), x, train=False)
    assert "rel_pos_h" in v["params"] and v["params"]["rel_pos_h"].shape == (3, 4)

    out_eval = blk.apply(v, x, train=False)
    assert out_eval.shape == x.shape and np.isfinite(np.asarray(out_eval)).all()
    # eval is deterministic regardless of drop_path
    out_eval2 = blk.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_eval2))

    # train draws the dropout rng; different keys -> different residual drops
    o1 = blk.apply(v, x, train=True, rngs={"dropout": jax.random.key(1)})
    o2 = blk.apply(v, x, train=True, rngs={"dropout": jax.random.key(4)})
    assert np.isfinite(np.asarray(o1)).all()
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 0
