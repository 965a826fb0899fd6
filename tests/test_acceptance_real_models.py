"""Env-gated real-model acceptance suite (reference tests/test_*.py).

The reference's end-to-end bar is exact transcripts per fixture WAV across
nine language sets (test_en_US-zamia.py:16-59) plus the rescore/OOV flow
over tests/wav (test_en.py:40-65: oov_*.wav must transcribe to "", fuzzy
normalized match score <= 0.15 against the sentences DB). Real acoustic
models are not downloadable in the build environment, so this module runs
only when the models are provided:

    export RSTPU_MODEL_DIR=/path/to/models
    python -m pytest tests/test_acceptance_real_models.py -v

where RSTPU_MODEL_DIR contains the reference's exported model dirs —
``en_US-zamia/``, ``en_US-rhasspy/``, ``de_DE-zamia/``, ... — each holding
``config.json``, ``lexicon.db``, ``g2p.fst`` and ``model/`` exactly as
produced by the reference's script/export_voice2json_profile.py (the
published dirs on huggingface.co/rhasspy, README.md:23,36, work as-is;
only the models named in the fixture sets are exercised — absent ones
skip individually). Fixture WAVs and transcripts come from the reference
checkout (override with RSTPU_FIXTURES_DIR).

Without RSTPU_MODEL_DIR every test here collects and skips.
"""

import os
from pathlib import Path

import pytest

from rhasspy_speech_tpu.const import LangSuffix
from rhasspy_speech_tpu.pipeline import Nnet3WavTranscriber, lang_dir_name
from rhasspy_speech_tpu.pipeline.train import train_model_sync

MODEL_ROOT = os.environ.get("RSTPU_MODEL_DIR")
FIXTURES = Path(
    os.environ.get("RSTPU_FIXTURES_DIR", "/root/reference/tests")
)

pytestmark = pytest.mark.skipif(
    not MODEL_ROOT,
    reason="RSTPU_MODEL_DIR not set — see module docstring for what to download",
)

# The nine reference language fixture sets (tests/<set>/ = wav+txt pairs)
LANGUAGE_SETS = [
    "cs_CZ-rhasspy",
    "de_DE-zamia",
    "en_US-zamia",
    "es_ES-rhasspy",
    "fr_FR-guyot",
    "fr_FR-rhasspy",
    "it_IT-rhasspy",
    "nl_NL-cgn",
    "ru_RU-rhasspy",
]


def _language_of(model_name: str) -> str:
    # "en_US-zamia" -> "en" (reference test_en_US-zamia.py:36)
    return model_name.split("-", maxsplit=1)[0].split("_", maxsplit=1)[0]


def _wavs(set_name: str):
    wav_dir = FIXTURES / set_name
    if not wav_dir.is_dir():
        return []
    return sorted(wav_dir.glob("*.wav"))


_transcribers = {}


def _grammar_transcriber(model_name: str, tmp_root: Path) -> Nnet3WavTranscriber:
    """Train the grammar graph from the fixture transcripts, once per model."""
    cached = _transcribers.get(model_name)
    if cached is not None:
        return cached

    model_dir = Path(MODEL_ROOT) / model_name
    if not model_dir.is_dir():
        pytest.skip(f"{model_dir} not present under RSTPU_MODEL_DIR")

    sentences = [
        txt.read_text(encoding="utf-8").strip()
        for txt in sorted((FIXTURES / model_name).glob("*.txt"))
    ]
    assert sentences, f"no .txt transcripts in {FIXTURES / model_name}"

    train_dir = tmp_root / "train" / model_name
    train_model_sync(
        _language_of(model_name),
        {
            "language": _language_of(model_name),
            "intents": {"Fixtures": {"data": [{"sentences": sentences}]}},
        },
        train_dir,
        model_dir,
        lang_suffixes=[LangSuffix.GRAMMAR],
    )
    t = Nnet3WavTranscriber(
        model_dir, train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    )
    _transcribers[model_name] = t
    return t


@pytest.mark.parametrize("set_name", LANGUAGE_SETS)
def test_language_set_exact_match(set_name, tmp_path_factory):
    """Every fixture WAV must transcribe to its exact transcript
    (test_en_US-zamia.py:53-59: expected = wav stem with '_' -> ' ')."""
    wavs = _wavs(set_name)
    if not wavs:
        pytest.skip(f"no fixture WAVs for {set_name} under {FIXTURES}")

    t = _grammar_transcriber(
        set_name, tmp_path_factory.getbasetemp()
    )
    failures = []
    for wav_path in wavs:
        expected = wav_path.stem.replace("_", " ")
        got = t.transcribe(wav_path)
        actual = got[0] if got else ""
        if actual != expected:
            failures.append(f"{wav_path.name}: expected {expected!r} got {actual!r}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def en_rescore_setup(tmp_path_factory):
    """train_en equivalent: test_en.yaml -> ARPA + order-5 rescore graphs
    + sentences.db (test_en.py:24-37,56)."""
    import yaml

    from rhasspy_speech_tpu.grammar.sentences_db import build_sentences_db

    model_dir = Path(MODEL_ROOT) / "en_US-rhasspy"
    if not model_dir.is_dir():
        pytest.skip(f"{model_dir} not present under RSTPU_MODEL_DIR")

    yaml_path = FIXTURES / "test_en.yaml"
    if not yaml_path.exists():
        pytest.skip(f"{yaml_path} missing")
    raw = yaml.safe_load(yaml_path.read_text(encoding="utf-8"))

    train_dir = tmp_path_factory.mktemp("train_en")
    train_model_sync(
        "en",
        {
            "language": raw.get("language", "en"),
            "intents": {"All": {"data": [{"sentences": raw["sentences"]}]}},
            "lists": raw.get("lists", {}),
        },
        train_dir,
        model_dir,
        lang_suffixes=[LangSuffix.ARPA, LangSuffix.ARPA_RESCORE],
        rescore_order=5,
    )
    db_path = train_dir / "sentences.db"
    build_sentences_db(raw, db_path, number_language="en")

    t = Nnet3WavTranscriber(
        model_dir, train_dir / lang_dir_name(LangSuffix.ARPA)
    )
    return t, train_dir, db_path


@pytest.mark.parametrize(
    "wav_path", sorted((FIXTURES / "wav").glob("*.wav")) or [None]
)
def test_en_rescore_and_oov(wav_path, en_rescore_setup):
    """Rescore flow with OOV rejection (test_en.py:40-65): decode with the
    ARPA graph, rescore against the order-5 lang, score the n-best against
    sentences.db; accept at norm score <= 0.15, else "" — and oov_*.wav
    must come back empty."""
    if wav_path is None:
        pytest.skip(f"no WAVs under {FIXTURES / 'wav'}")

    from rhasspy_speech_tpu.grammar.sentences_db import (
        get_matching_scores,
        load_sentences,
    )

    t, train_dir, db_path = en_rescore_setup

    expected = wav_path.stem.replace("-", " ")
    if expected.startswith("oov_"):
        expected = ""  # out-of-vocabulary: must be rejected (test_en.py:46-48)

    nbest = t.transcribe_rescore(
        wav_path,
        old_lang_dir=train_dir / lang_dir_name(LangSuffix.ARPA),
        new_lang_dir=train_dir / lang_dir_name(LangSuffix.ARPA_RESCORE),
        nbest=5,
    )
    sentences = load_sentences(db_path)
    actual = ""
    if nbest:
        scores = get_matching_scores(nbest[0], sentences)
        if scores:
            norm_score, _inp, out = scores[0]
            if norm_score <= 0.15:
                actual = out
    assert actual == expected, (
        f"Expected {expected!r}, got {actual!r} for {wav_path.name} "
        f"(nbest={nbest})"
    )
