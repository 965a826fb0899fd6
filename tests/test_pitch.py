"""Kaldi pitch feature tests: f0 accuracy, voicing, pipeline wiring."""

import numpy as np

import jax.numpy as jnp

from rhasspy_speech_tpu.ops.pitch import (
    PitchConfig,
    num_pitch_frames,
    pitch_batch,
    pitch_config_from_conf,
    pitch_track,
)

SR = 16000


def _tone(f0, secs=1.0, amp=0.5):
    t = np.arange(int(secs * SR)) / SR
    return (amp * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


def test_pitch_tracks_tone_frequencies():
    cfg = PitchConfig()
    for f0 in (80.0, 120.0, 200.0, 333.0):
        pitch, nccf = (
            np.asarray(v) for v in pitch_track(cfg, jnp.asarray(_tone(f0)[None]))
        )
        mid = pitch[0, 5:-5]
        assert np.abs(mid - f0).max() / f0 < 0.02, (f0, np.median(mid))
        assert nccf[0, 5:-5].min() > 0.8  # strongly voiced


def test_pitch_pov_separates_voiced_unvoiced():
    cfg = PitchConfig()
    rng = np.random.RandomState(0)
    noise = (0.1 * rng.randn(SR)).astype(np.float32)
    batch = jnp.asarray(np.stack([_tone(200.0), noise]))
    feats = np.asarray(pitch_batch(cfg, batch))
    assert feats.shape == (2, num_pitch_frames(cfg, SR), 3)
    # POV feature: monotone-decreasing in NCCF (voiced -> more negative)
    assert feats[0, :, 0].mean() < feats[1, :, 0].mean() - 0.3
    # constant-pitch tone: normalized log pitch ~ 0, delta ~ 0
    assert np.abs(feats[0, 5:-5, 1]).max() < 0.2
    assert np.abs(feats[0, 5:-5, 2]).max() < 0.5


def test_pitch_follows_a_sweep():
    """Normalized log pitch rises through an f0 sweep."""
    cfg = PitchConfig()
    t = np.arange(SR) / SR
    f0 = 100.0 * np.exp(np.log(3.0) * t)  # 100 -> 300 Hz exponential sweep
    phase = 2 * np.pi * np.cumsum(f0) / SR
    sweep = (0.5 * np.sin(phase)).astype(np.float32)
    pitch, _ = (np.asarray(v) for v in pitch_track(cfg, jnp.asarray(sweep[None])))
    p = pitch[0, 5:-5]
    # monotone-ish rise over the sweep, endpoints near 100/300
    assert p[0] < 130 and p[-1] > 240, (p[0], p[-1])
    assert np.mean(np.diff(p) >= -1.0) > 0.95


def test_pitch_conf_parsing(tmp_path):
    conf = tmp_path / "pitch.conf"
    conf.write_text("--min-f0=60\n--max-f0=300\n--penalty-factor=0.2\n"
                    "--unknown-key=whatever\n")
    cfg = pitch_config_from_conf(conf, samp_freq=8000.0)
    assert cfg.min_f0 == 60 and cfg.max_f0 == 300
    assert cfg.penalty_factor == 0.2 and cfg.samp_freq == 8000.0


def test_acoustic_model_appends_pitch(tmp_path):
    """--add-pitch=true in online.conf appends 3 pitch dims to features."""
    from rhasspy_speech_tpu.pipeline.transcribe import AcousticModel
    from rhasspy_speech_tpu.testing import build_synthetic_profile

    lexicon = {"yes": ["y", "eh", "s"]}
    profile = build_synthetic_profile(tmp_path / "m", lexicon)
    conf_dir = tmp_path / "m" / "model" / "conf"
    conf_dir.mkdir()
    (conf_dir / "online.conf").write_text("--add-pitch=true\n")

    am = AcousticModel(tmp_path / "m")
    assert am.pitch_config is not None
    pcm = _tone(150.0, secs=0.5)[None]
    feats = np.asarray(am.features(pcm))
    assert feats.shape[-1] == am.frontend_config.num_ceps + 3
    # pitch block is populated (not all zeros) and aligned to MFCC frames
    assert np.abs(feats[:, :, -3:]).max() > 0.01


def test_pitch_and_ivector_coexist(tmp_path):
    """With both --add-pitch and an extractor, the i-vector branch taps the
    base MFCC while the nnet input gets MFCC+pitch — transcripts stay exact
    on a profile whose AM consumes both inputs (zero-weight extras)."""
    import numpy as np

    from rhasspy_speech_tpu.pipeline.transcribe import AcousticModel
    from rhasspy_speech_tpu.testing import build_synthetic_profile

    lexicon = {"yes": ["y", "eh", "s"], "no": ["n", "ow"]}
    profile = build_synthetic_profile(
        tmp_path / "m", lexicon, with_ivector=True, with_pitch=True
    )

    am = AcousticModel(tmp_path / "m")
    assert am.pitch_config is not None and am.ivector_params is not None
    pcm = _tone(150.0, secs=0.5)[None]
    feats = am.features(pcm)
    assert feats.shape[-1] == am.frontend_config.num_ceps + 3
    out = np.asarray(am.log_probs(feats, num_out_frames=8))
    assert np.isfinite(out).all()


def test_pitch_ivector_and_global_cmvn(tmp_path):
    """--add-pitch plus extractor/global_cmvn.stats: the online CMVN must be
    applied to the base-MFCC tap, not the MFCC+pitch features — [2, D+1]
    stats would otherwise fail to broadcast and crash decode."""
    import numpy as np

    from rhasspy_speech_tpu.pipeline.transcribe import AcousticModel
    from rhasspy_speech_tpu.testing import build_synthetic_profile

    lexicon = {"yes": ["y", "eh", "s"], "no": ["n", "ow"]}
    build_synthetic_profile(
        tmp_path / "m",
        lexicon,
        with_ivector=True,
        with_pitch=True,
        with_ivector_cmvn=True,
    )

    am = AcousticModel(tmp_path / "m")
    assert am.pitch_config is not None and am.ivector_params is not None
    assert am.ivector_cmvn_stats is not None
    pcm = _tone(150.0, secs=0.5)[None]
    feats = am.features(pcm)
    out = np.asarray(am.log_probs(feats, num_out_frames=8))
    assert np.isfinite(out).all()
