"""Multilingual sweep: train on every reference language fixture dir.

Mirrors the reference's per-language suites (tests/test_de_DE-zamia.py etc.:
build a sentences YAML from each dir's .txt transcripts, train, decode).
Real acoustic models aren't available here, so each language gets a
synthetic profile built from its own transcript vocabulary — the full
train() path (lexicon, prepare_lang, G/ARPA, HCLG, dense graphs) plus
audio decode then run per language.
"""

import os

import numpy as np
from pathlib import Path

import pytest

from rhasspy_speech_tpu.const import LangSuffix
from rhasspy_speech_tpu.pipeline import Nnet3WavTranscriber, lang_dir_name
from rhasspy_speech_tpu.pipeline.train import train_model_sync
from rhasspy_speech_tpu.testing import build_synthetic_profile, synthesize_sentence

REFERENCE_TESTS = Path("/root/reference/tests")

LANG_DIRS = [
    d for d in (
        "cs_CZ-rhasspy", "de_DE-zamia", "en_US-zamia", "es_ES-rhasspy",
        "fr_FR-guyot", "fr_FR-rhasspy", "it_IT-rhasspy", "nl_NL-cgn",
        "ru_RU-rhasspy",
    )
    if (REFERENCE_TESTS / d).is_dir()
]


def _transcripts(lang_dir: Path):
    return sorted(
        t.read_text(encoding="utf-8").strip().lower()
        for t in lang_dir.glob("*.txt")
    )


def _spelled_lexicon(sentences):
    words = sorted({w for s in sentences for w in s.split()})
    # letter phones; every unicode letter becomes its own phone symbol
    return {w: [f"p{ord(c)}" for c in w] for w in words}


@pytest.mark.skipif(not LANG_DIRS, reason="reference fixtures unavailable")
@pytest.mark.parametrize("lang_name", LANG_DIRS)
def test_language_train_and_decode(lang_name, tmp_path):
    fixture_dir = REFERENCE_TESTS / lang_name
    sentences = _transcripts(fixture_dir)
    assert sentences, lang_name
    language = lang_name.split("-")[0].split("_")[0]

    lexicon = _spelled_lexicon(sentences)
    profile = build_synthetic_profile(tmp_path / "model", lexicon)
    train_dir = tmp_path / "train"
    train_model_sync(
        language,
        {
            "language": language,
            "intents": {"All": {"data": [{"sentences": sentences}]}},
        },
        train_dir,
        profile.model_dir,
        lang_suffixes=[LangSuffix.GRAMMAR],
    )
    graph_dir = train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    assert (graph_dir / "graph.npz").exists()

    t = Nnet3WavTranscriber(profile.model_dir, graph_dir)
    # decode the first three transcripts via synthesized audio: exact match
    for i, text in enumerate(sentences[:3]):
        pcm = synthesize_sentence(profile, text, seed=i)
        got = t.transcribe_pcm_batch([pcm])[0]
        assert got == [text], (lang_name, text, got)


@pytest.mark.skipif(not LANG_DIRS, reason="reference fixtures unavailable")
@pytest.mark.parametrize("lang_name", [
    d for d in ("de_DE-zamia", "ru_RU-rhasspy") if d in LANG_DIRS
])
def test_language_full_flow(lang_name, tmp_path):
    """ARPA decode + grammar fuzzy + order-5 rescore per language (incl.
    Cyrillic vocabulary for ru_RU)."""
    fixture_dir = REFERENCE_TESTS / lang_name
    sentences = _transcripts(fixture_dir)[:6]
    language = lang_name.split("-")[0].split("_")[0]
    lexicon = _spelled_lexicon(sentences)
    profile = build_synthetic_profile(tmp_path / "model", lexicon)
    train_dir = tmp_path / "train"
    train_model_sync(
        language,
        {"language": language,
         "intents": {"All": {"data": [{"sentences": sentences}]}}},
        train_dir,
        profile.model_dir,
        lang_suffixes=[LangSuffix.GRAMMAR, LangSuffix.ARPA,
                       LangSuffix.ARPA_RESCORE],
    )
    t = Nnet3WavTranscriber(
        profile.model_dir, train_dir / lang_dir_name(LangSuffix.ARPA)
    )
    grammar_lang = train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    text = sentences[0]
    pcm = synthesize_sentence(profile, text, seed=5)
    # dual-model accept
    got = t.transcribe_pcm_batch(
        [pcm], lang_dir=grammar_lang, nbest=3, max_fuzzy_cost=1.5,
        require_fuzzy=True,
    )[0]
    assert got == [text], (lang_name, got, text)
    # rescore flow
    import wave

    wav = tmp_path / "u.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.astype(np.int16).tobytes())
    got = t.transcribe_rescore(
        wav,
        old_lang_dir=train_dir / lang_dir_name(LangSuffix.ARPA),
        new_lang_dir=train_dir / lang_dir_name(LangSuffix.ARPA_RESCORE),
        nbest=4,
    )
    assert got and got[0] == text, (lang_name, got)
