"""StreamFeaturizer framing parity, including snip_edges=false.

The streaming featurizer must reproduce the batch path's rows
bit-for-bit for any chunking of the input — snip=true via plain
tail-carry, snip=false via the virtual-signal prefix/suffix reflections
(feature-window.cc FirstSampleOfFrame:30-41, ExtractWindow:199-216).
"""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from rhasspy_speech_tpu.ops.frontend import (
    FrontendConfig,
    make_frontend_params,
    mfcc_batch,
    num_frames,
)
from rhasspy_speech_tpu.pipeline.streaming_features import StreamFeaturizer


def _fake_am(cfg: FrontendConfig):
    return types.SimpleNamespace(
        frontend_config=cfg,
        frontend_params=make_frontend_params(cfg),
        pitch_config=None,
    )


def _stream_rows(fz, pcm, chunks):
    state = fz.new_state()
    rows = []
    off = 0
    for c in chunks:
        rows.append(fz.push(state, pcm[off : off + c]))
        off += c
    rows.append(fz.push(state, pcm[off:], flush=True))
    return np.concatenate([r for r in rows if r.shape[0]], axis=0) if any(
        r.shape[0] for r in rows
    ) else np.zeros((0, fz.num_ceps), np.float32)


@pytest.mark.parametrize("snip", [True, False])
@pytest.mark.parametrize(
    "n_samples,chunks",
    [
        (16000, [1024] * 10),
        (16000, [160, 3360, 7, 4000, 1]),
        (4321, [4321]),
        (399, [399]),  # under one frame window
        (100, [100]),  # shorter than the reflection prefix
        (80, [80]),  # exactly one centered frame (snip=false)
        (16013, [16013]),
    ],
)
def test_featurizer_matches_batch(snip, n_samples, chunks):
    cfg = FrontendConfig(snip_edges=snip, num_mel_bins=23, num_ceps=13)
    am = _fake_am(cfg)
    fz = StreamFeaturizer(am)
    rng = np.random.RandomState(7)
    pcm = (1000.0 * rng.randn(n_samples)).astype(np.float32)

    want_T = num_frames(cfg, n_samples)
    want = (
        np.asarray(mfcc_batch(am.frontend_params, jnp.asarray(pcm[None])))[0]
        if want_T
        else np.zeros((0, cfg.num_ceps), np.float32)
    )
    got = _stream_rows(fz, pcm, chunks)
    assert got.shape == want.shape, (snip, n_samples, got.shape, want.shape)
    # frame CONTENT is what's pinned here (a framing bug shifts whole
    # windows -> huge diffs); XLA's MFCC numerics vary ~1e-3 relative
    # with buffer shape (same tolerance as tests/test_frontend.py)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_snip_false_prepare_commit_contract():
    """The scheduler's prepare/commit path (batched host MFCC) must see
    virtual-space buffers and land the same rows."""
    cfg = FrontendConfig(snip_edges=False, num_mel_bins=23, num_ceps=13)
    am = _fake_am(cfg)
    fz = StreamFeaturizer(am)
    rng = np.random.RandomState(3)
    pcm = (1000.0 * rng.randn(9000)).astype(np.float32)
    state = fz.new_state()
    rows = []
    for off in range(0, 9000, 2048):
        r = fz.prepare_mfcc_buf(state, pcm[off : off + 2048])
        if r is None:
            continue
        buf, n = r
        feats = np.asarray(
            mfcc_batch(fz.stream_params, jnp.asarray(buf[None]))
        )[0][:n]
        fz.commit_mfcc(state, buf, n)
        rows.append(feats)
    rows.append(fz.push(state, np.zeros(0, np.float32), flush=True))
    got = np.concatenate([r for r in rows if r.shape[0]], axis=0)
    want = np.asarray(
        mfcc_batch(am.frontend_params, jnp.asarray(pcm[None]))
    )[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_snip_false_pitch_refused():
    cfg = FrontendConfig(snip_edges=False)
    am = _fake_am(cfg)
    am.pitch_config = object()
    with pytest.raises(NotImplementedError):
        StreamFeaturizer(am)
