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
