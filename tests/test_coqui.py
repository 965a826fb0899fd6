"""Coqui STT (CTC) backend tests: trainer cascade + transcriber decode."""

import io

import numpy as np
import pytest

from rhasspy_speech_tpu.grammar import Intents, compile_intents
from rhasspy_speech_tpu.lexicon import LexiconDatabase
from rhasspy_speech_tpu.pipeline.coqui import (
    BLANK,
    SPACE,
    CoquiSttTrainer,
    CoquiSttTranscriber,
    load_alphabet,
)
from rhasspy_speech_tpu.testing.synthetic import (
    build_synthetic_ctc_profile,
    synthesize_ctc_text,
)

SENTENCES = ["turn (on|off) light", "stop"]
CHARS = sorted(set("turnonofflightstop"))


@pytest.fixture(scope="module")
def coqui_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("coqui")
    model_dir = root / "model"
    train_dir = root / "train"
    profile = build_synthetic_ctc_profile(model_dir, CHARS)

    intents = Intents.from_dict(
        {
            "language": "en",
            "intents": {"Main": {"data": [{"sentences": SENTENCES}]}},
        }
    )
    ctx = compile_intents(intents, io.StringIO(), LexiconDatabase(),
                          number_language="en")
    trainer = CoquiSttTrainer(model_dir)
    trainer.train(ctx, train_dir)
    return profile, model_dir, train_dir


def test_alphabet_loading(coqui_setup):
    _profile, model_dir, _train_dir = coqui_setup
    idx2char = load_alphabet(model_dir / "alphabet.txt")
    assert idx2char[1] == SPACE  # space first in our synthetic alphabet
    assert idx2char[max(idx2char)] == BLANK


def test_train_artifacts(coqui_setup):
    _profile, _model_dir, train_dir = coqui_setup
    assert (train_dir / "tokens_with_blank.txt").exists()
    assert (train_dir / "output.txt").exists()
    assert (train_dir / "token2sen.fst").exists()


def test_decode_oracle_probs(coqui_setup):
    """Feed hand-built CTC posteriors: chars of 'stop' with blanks."""
    _profile, model_dir, train_dir = coqui_setup
    t = CoquiSttTranscriber(model_dir, train_dir)
    num_labels = len(t.idx2char)
    char2idx = {c: i for i, c in t.idx2char.items()}

    rows = []

    def push_char(c, n=3):
        for _ in range(n):
            row = np.full(num_labels, 1e-4)
            row[char2idx[c] - 1] = 1.0 - 1e-4 * (num_labels - 1)
            rows.append(row)

    push_char(BLANK)
    for c in "stop":
        push_char(c)
        push_char(BLANK, 1)
    probs = np.stack(rows)
    text = t.decode_probs(probs)
    assert text == "stop"


def test_ctc_end_to_end_audio(coqui_setup):
    """Synthesized char audio -> JAX CTC AM -> FST cascade -> text."""
    profile, model_dir, train_dir = coqui_setup
    t = CoquiSttTranscriber(model_dir, train_dir)
    for i, text in enumerate(["turn on light", "stop", "turn off light"]):
        pcm = synthesize_ctc_text(profile, text, seed=i)
        # Synthetic char boundaries are harsher than real speech; widen the
        # lattice prune beam (reference default 10, coqui_stt.py:127).
        got = t.transcribe_pcm(pcm, prune_threshold=30.0)
        assert got == text, (got, text)


def test_ctc_streaming_matches_batch(coqui_setup):
    """The streaming API (reference parity: coqui_stt.py:70-113
    StreamingState) transcribes chunked PCM to the same text as the
    whole-utterance path."""
    profile, model_dir, train_dir = coqui_setup
    t = CoquiSttTranscriber(model_dir, train_dir)
    for i, text in enumerate(["turn on light", "stop"]):
        pcm = synthesize_ctc_text(profile, text, seed=10 + i)
        want = t.transcribe_pcm(pcm, prune_threshold=30.0)
        state = t.start_stream()
        for off in range(0, pcm.shape[0], 1024):
            t.process_chunk(state, pcm[off : off + 1024])
        got = t.finish_stream(state, prune_threshold=30.0)
        assert got == want == text, (got, want, text)


def test_ctc_forward_stream_lstm_context_parity():
    """forward_stream over windows with LSTM carry + pre-spliced context
    reproduces the batch forward() for a synthetic recurrent model."""
    import jax.numpy as jnp

    from rhasspy_speech_tpu.models.ctc import CtcModel

    rng = np.random.RandomState(7)
    D, H, L, ctx = 12, 10, 8, 2
    Ds = D * (2 * ctx + 1)
    params = {
        "dense1_w": jnp.asarray(rng.randn(Ds, 16) * 0.3, jnp.float32),
        "dense1_b": jnp.asarray(rng.randn(16) * 0.1, jnp.float32),
        "lstm_kernel": jnp.asarray(rng.randn(16 + H, 4 * H) * 0.2, jnp.float32),
        "lstm_bias": jnp.asarray(rng.randn(4 * H) * 0.1, jnp.float32),
        "post1_w": jnp.asarray(rng.randn(H, 14) * 0.3, jnp.float32),
        "post1_b": jnp.asarray(rng.randn(14) * 0.1, jnp.float32),
        "out_w": jnp.asarray(rng.randn(14, L) * 0.3, jnp.float32),
        "out_b": jnp.asarray(rng.randn(L) * 0.1, jnp.float32),
    }
    model = CtcModel(params=params, num_labels=L, context=ctx, has_lstm=True)
    T = 23
    feats = rng.randn(1, T, D).astype(np.float32)
    want = np.asarray(model.forward(jnp.asarray(feats)))[0]

    # stream in windows of 5 emitted frames, splicing with true
    # neighbors and batch-identical edge clamping
    state = model.init_state(1)
    got = []
    emitted = 0
    W = 5
    while emitted < T:
        take = min(W, T - emitted)
        base = np.arange(emitted, emitted + take)
        idx = np.clip(
            base[:, None] + np.arange(-ctx, ctx + 1)[None, :], 0, T - 1
        )
        spliced = feats[0][idx].reshape(take, -1)
        if take < W:
            spliced = np.pad(spliced, ((0, W - take), (0, 0)))
        probs, state = model.forward_stream(
            jnp.asarray(spliced[None]), state
        )
        got.append(np.asarray(probs)[0, :take])
        emitted += take
    got = np.concatenate(got, axis=0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_ctc_async_stream_reference_contract(coqui_setup):
    """The reference-signature async wrappers: one implicit stream,
    int16-bytes chunks, finish returns per-frame prob rows, and the
    error classes fire exactly as in coqui_stt.py:70-113."""
    import asyncio

    from rhasspy_speech_tpu.pipeline.coqui import (
        StreamAlreadyStartedError,
        StreamNotStartedError,
    )

    profile, model_dir, train_dir = coqui_setup
    t = CoquiSttTranscriber(model_dir, train_dir)
    pcm = synthesize_ctc_text(profile, "stop", seed=21)
    chunk_bytes = pcm.astype(np.int16).tobytes()

    async def drive():
        with pytest.raises(StreamNotStartedError):
            await t.async_process_chunk(b"\x00\x00")
        await t.async_start_stream()
        with pytest.raises(StreamAlreadyStartedError):
            await t.async_start_stream()
        for off in range(0, len(chunk_bytes), 2048):
            await t.async_process_chunk(chunk_bytes[off : off + 2048])
        probs = await t.async_finish_stream()
        with pytest.raises(StreamNotStartedError):
            await t.async_finish_stream()
        return probs

    probs = asyncio.run(drive())
    assert probs and len(probs[0]) == t.model.num_labels
    got = t.decode_probs(np.asarray(probs), prune_threshold=30.0)
    assert got == "stop", got
