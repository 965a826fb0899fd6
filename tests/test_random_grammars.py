"""Property-style test: random template grammars decode their own sentences.

For several seeded random grammars over a fixed word pool: build a synthetic
profile, train, pick random sentences from the grammar's language, synthesize
audio, decode, require exact transcripts. Stresses arbitrary
alternation/optional shapes through the whole stack.
"""

import io
import random

import pytest

from rhasspy_speech_tpu.const import LangSuffix
from rhasspy_speech_tpu.grammar import Intents, intents_to_fst
from rhasspy_speech_tpu.pipeline import Nnet3WavTranscriber, lang_dir_name
from rhasspy_speech_tpu.pipeline.train import train_model_sync
from rhasspy_speech_tpu.testing import build_synthetic_profile, synthesize_sentence

WORD_POOL = {
    "alpha": ["aa", "l", "f"], "bravo": ["b", "r", "v"],
    "charlie": ["ch", "aa", "r"], "delta": ["d", "eh", "l"],
    "echo": ["eh", "k", "ow"], "foxtrot": ["f", "aa", "t"],
    "golf": ["g", "ow", "f"], "hotel": ["hh", "ow", "l"],
}


def _random_template(rng: random.Random) -> str:
    words = list(WORD_POOL)

    def atom():
        r = rng.random()
        if r < 0.5:
            return rng.choice(words)
        if r < 0.75:
            return "(" + "|".join(rng.sample(words, rng.randint(2, 3))) + ")"
        return "[" + rng.choice(words) + "]"

    n = rng.randint(2, 4)
    return " ".join(atom() for _ in range(n))


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_random_grammar_roundtrip(seed, tmp_path):
    rng = random.Random(seed)
    sentences = [_random_template(rng) for _ in range(3)]
    intents_dict = {
        "language": "en",
        "intents": {"R": {"data": [{"sentences": sentences}]}},
    }

    intents = Intents.from_dict(intents_dict)
    fst = intents_to_fst(intents, number_language="en").remove_spaces()
    fst.prune()
    language = [s for s in fst.to_strings(True) if s]
    if not language:
        pytest.skip("degenerate grammar (all-optional)")

    profile = build_synthetic_profile(tmp_path / "model", WORD_POOL)
    train_dir = tmp_path / "train"
    train_model_sync("en", intents_dict, train_dir, profile.model_dir,
                     lang_suffixes=[LangSuffix.GRAMMAR])
    t = Nnet3WavTranscriber(
        profile.model_dir, train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    )
    picks = rng.sample(language, min(3, len(language)))
    pcms = [synthesize_sentence(profile, s, seed=seed + i)
            for i, s in enumerate(picks)]
    got = t.transcribe_pcm_batch(pcms)
    assert [g[0] if g else None for g in got] == picks
