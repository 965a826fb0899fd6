"""Fused Pallas MFCC kernel vs the XLA reference path."""

import numpy as np

import jax.numpy as jnp

from rhasspy_speech_tpu.ops.frontend import (
    FrontendConfig,
    make_frontend_params,
    mfcc_batch,
)
from rhasspy_speech_tpu.ops.pallas_mfcc import mfcc_pallas


def _speech(rng, n):
    t = np.arange(n) / 16000.0
    return (
        4000 * np.sin(2 * np.pi * 300 * t)
        + 1500 * np.sin(2 * np.pi * 1200 * t)
        + 300 * rng.randn(n)
    ).astype(np.float32)


def test_pallas_matches_xla_hires():
    cfg = FrontendConfig()  # 40 mel / 40 ceps hires
    rng = np.random.RandomState(0)
    batch = np.stack([_speech(rng, 8000) for _ in range(2)])
    want = np.asarray(mfcc_batch(make_frontend_params(cfg), jnp.asarray(batch)))
    got = np.asarray(mfcc_pallas(cfg, jnp.asarray(batch)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=3e-2)


def test_pallas_matches_xla_small():
    cfg = FrontendConfig(num_mel_bins=20, num_ceps=20)
    rng = np.random.RandomState(1)
    batch = np.stack([_speech(rng, 5000) for _ in range(3)])
    want = np.asarray(mfcc_batch(make_frontend_params(cfg), jnp.asarray(batch)))
    got = np.asarray(mfcc_pallas(cfg, jnp.asarray(batch)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=3e-2)
