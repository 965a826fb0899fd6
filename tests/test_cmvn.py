"""Online CMVN tests vs a naive per-frame loop."""

import numpy as np

import jax.numpy as jnp

from rhasspy_speech_tpu.ops.cmvn import (
    CmvnConfig,
    matrix_from_stats,
    online_cmvn,
    stats_from_matrix,
)


def _naive(feats, g_sum, g_count, cfg: CmvnConfig):
    T, D = feats.shape
    out = np.zeros_like(feats)
    for t in range(T):
        lo = max(t + 1 - cfg.cmn_window, 0)
        window = feats[lo : t + 1]
        s = window.sum(axis=0)
        c = float(window.shape[0])
        if g_count > 0 and c < cfg.cmn_window:
            take = min(cfg.cmn_window - c, min(g_count, cfg.global_frames))
            s = s + (take / g_count) * g_sum
            c += take
        out[t] = feats[t] - s / c
    return out


def test_stats_matrix_roundtrip():
    total = np.array([1.0, 2.0, 3.0])
    total_sq = np.array([4.0, 5.0, 6.0])
    m = matrix_from_stats(total, total_sq, 42.0)
    s, sq, c = stats_from_matrix(m)
    np.testing.assert_array_equal(s, total)
    np.testing.assert_array_equal(sq, total_sq)
    assert c == 42.0


def test_online_cmvn_matches_naive():
    rng = np.random.RandomState(0)
    cfg = CmvnConfig(cmn_window=20, global_frames=10)
    feats = rng.randn(2, 50, 4).astype(np.float32) + 3.0
    g_mean_frames = rng.randn(100, 4) + 3.0
    g_stats = matrix_from_stats(
        g_mean_frames.sum(axis=0), (g_mean_frames**2).sum(axis=0), 100.0
    )

    got = np.asarray(online_cmvn(jnp.asarray(feats), g_stats, cfg))
    for b in range(2):
        want = _naive(feats[b].astype(np.float64), g_stats[0, :-1], 100.0, cfg)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_online_cmvn_no_global():
    rng = np.random.RandomState(1)
    cfg = CmvnConfig(cmn_window=10)
    feats = rng.randn(1, 30, 3).astype(np.float32) + 5.0
    got = np.asarray(online_cmvn(jnp.asarray(feats), None, cfg))
    # after the window fills, output means hover near zero
    assert abs(got[0, 15:].mean()) < 0.6
    # frame 0 normalizes against itself -> exactly zero
    np.testing.assert_allclose(got[0, 0], 0.0, atol=1e-5)


def test_online_cmvn_passthrough():
    cfg = CmvnConfig(norm_mean=False, norm_var=False)
    feats = jnp.ones((1, 5, 2))
    out = online_cmvn(feats, None, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))
