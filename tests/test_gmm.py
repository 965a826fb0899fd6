"""Diagonal-GMM acoustic model path (ModelType.gmm — VERDICT r2 item 9).

The reference carries the gmm enum value with Kaldi's gmm/ C++ tree behind
it (its Python decode path is commented out, transcribe_wav.py:238-484);
here a synthetic AmDiagGmm profile trains and decodes end-to-end through
the real serving stack: final.mdl round-trip, MFCC + delta-deltas, batched
per-pdf log-likelihoods, dense Viterbi.
"""

import numpy as np
import pytest

from rhasspy_speech_tpu.const import LangSuffix
from rhasspy_speech_tpu.pipeline import Nnet3WavTranscriber, lang_dir_name
from rhasspy_speech_tpu.pipeline.train import train_model_sync
from rhasspy_speech_tpu.testing.synthetic import (
    build_synthetic_gmm_profile,
    synthesize_sentence,
)

LEXICON = {
    "turn": ["t", "er", "n"],
    "on": ["aa", "n"],
    "off": ["ao", "f"],
    "the": ["dh", "ah"],
    "light": ["l", "ay", "t"],
    "fan": ["f", "ae", "n"],
}


@pytest.fixture(scope="module")
def gmm_trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("gmm")
    profile = build_synthetic_gmm_profile(root / "model", LEXICON)
    train_dir = root / "train"
    train_model_sync(
        "en",
        {
            "language": "en",
            "intents": {
                "M": {"data": [{"sentences": ["turn (on|off) [the] (light|fan)"]}]}
            },
        },
        train_dir,
        profile.model_dir,
        lang_suffixes=[LangSuffix.GRAMMAR],
    )
    return profile, train_dir / lang_dir_name(LangSuffix.GRAMMAR)


def test_gmm_model_file_roundtrip(gmm_trained):
    from rhasspy_speech_tpu.io.gmm_am import is_gmm_model, read_am_diag_gmm

    profile, _ = gmm_trained
    mdl = profile.model_dir / "model" / "final.mdl"
    assert is_gmm_model(str(mdl))
    tm, gmms = read_am_diag_gmm(str(mdl))
    assert tm.num_pdfs == len(gmms)
    assert all(g.dim == 3 * profile.frontend.num_ceps for g in gmms)


def test_gmm_log_likes_match_numpy(gmm_trained):
    from rhasspy_speech_tpu.io.gmm_am import read_am_diag_gmm
    from rhasspy_speech_tpu.models.gmm import GmmAm

    profile, _ = gmm_trained
    _tm, gmms = read_am_diag_gmm(
        str(profile.model_dir / "model" / "final.mdl")
    )
    am = GmmAm.from_diag_gmms(gmms)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, am.dim).astype(np.float32)
    got = np.asarray(am.log_likes(x))
    # reference: per-pdf logsumexp over explicit Gaussian densities
    for p, g in enumerate(gmms[:8]):
        means = g.means()
        var = 1.0 / g.inv_vars
        ll = (
            np.log(g.weights)[None, None, :]
            - 0.5
            * (
                am.dim * np.log(2 * np.pi)
                + np.sum(np.log(var), axis=1)[None, None, :]
                + np.sum(
                    (x[:, :, None, :] - means[None, None]) ** 2
                    * g.inv_vars[None, None],
                    axis=-1,
                )
            )
        )
        want = np.log(np.sum(np.exp(ll), axis=-1))
        np.testing.assert_allclose(got[:, :, p], want, rtol=2e-4, atol=2e-4)


def test_gmm_transcribes_end_to_end(gmm_trained):
    profile, lang_dir = gmm_trained
    t = Nnet3WavTranscriber(profile.model_dir, lang_dir)
    assert t.am.gmm is not None and t.am.subsampling == 1
    sentences = ["turn on the light", "turn off the fan", "turn on fan"]
    pcms = [
        synthesize_sentence(profile, s, seed=60 + i)
        for i, s in enumerate(sentences)
    ]
    assert t.transcribe_pcm_batch(pcms) == [[s] for s in sentences]


def test_gmm_nbest_and_fuzzy(gmm_trained):
    profile, lang_dir = gmm_trained
    t = Nnet3WavTranscriber(profile.model_dir, lang_dir)
    pcm = synthesize_sentence(profile, "turn off the light", seed=99)
    out = t.transcribe_pcm_batch(
        [pcm], lang_dir=lang_dir, nbest=3, max_fuzzy_cost=1.0
    )
    assert out == [["turn off the light"]]


def test_gmm_streaming_matches_batch(gmm_trained):
    """GMM models ride the streaming scheduler too (deltas over the
    chunk window, per-pdf log-likes — beyond the reference, whose GMM
    streaming is dead code): chunked transcripts equal the batch path."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, lang_dir = gmm_trained
    batch_t = Nnet3WavTranscriber(profile.model_dir, lang_dir)
    sched = StreamScheduler(profile.model_dir, lang_dir, max_streams=2)
    assert sched.am.subsampling == 1 and not sched._recurrent
    sentences = ["turn on the light", "turn off the fan"]
    for i, s in enumerate(sentences):
        pcm = synthesize_sentence(profile, s, seed=70 + i)
        assert batch_t.transcribe_pcm_batch([pcm]) == [[s]]
        sid = sched.open_stream()
        for start in range(0, pcm.shape[0], 1024):
            sched.feed(sid, pcm[start : start + 1024])
            sched.step()
        sched.finish(sid)
        sched.run_until_idle()
        assert sched.poll(sid) == [s]
        sched.close(sid)


def test_gmm_stream_transcriber_matches_batch(gmm_trained):
    """Single-stream Nnet3StreamTranscriber drives GMM models as well."""
    from rhasspy_speech_tpu.pipeline.stream import Nnet3StreamTranscriber

    profile, lang_dir = gmm_trained
    t = Nnet3StreamTranscriber(profile.model_dir, lang_dir)
    pcm = synthesize_sentence(profile, "turn on fan", seed=81)
    assert t.transcribe_pcm(pcm, chunk_samples=1024) == ["turn on fan"]
