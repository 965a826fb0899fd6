"""Lattice-level ARPA rescore (reference transcribe_wav.py:107-231).

The decisive property: the rescore remaps the decode LATTICE through the
new lang dir's lexicon and LM, so it can produce hypotheses that are NOT
in the first pass's n-best — including words absent from the decode
graph's vocabulary. An n-best-list LM swap provably cannot do that.
"""

import wave

import numpy as np
import pytest

from rhasspy_speech_tpu.const import LangSuffix
from rhasspy_speech_tpu.fst.core import Fst
from rhasspy_speech_tpu.fst.ops import compose, rmepsilon, shortest_path
from rhasspy_speech_tpu.lang.graphs import make_ldet
from rhasspy_speech_tpu.lang.lexicon_fst import prepare_lang
from rhasspy_speech_tpu.pipeline import Nnet3WavTranscriber, lang_dir_name
from rhasspy_speech_tpu.pipeline.train import train_model_sync
from rhasspy_speech_tpu.testing import build_synthetic_profile, synthesize_sentence

LEXICON = {
    "turn": ["t", "er", "n"],
    "red": ["r", "eh", "d"],
    "read": ["r", "eh", "d"],  # homophone of "red"
    "on": ["aa", "n"],
}


def _write_wav(path, pcm):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.astype(np.int16).tobytes())


def _intents(sentence):
    return {
        "language": "en",
        "intents": {"M": {"data": [{"sentences": [sentence]}]}},
    }


def test_make_ldet_maps_homophone_phones_to_both_words():
    """Ldet is a deterministic phones→words map; homophones survive as
    alternative outputs (disambig symbols keep determinization exact)."""
    lang = prepare_lang(
        [(w, p) for w, p in LEXICON.items()], silence_phones=["SIL", "SPN"]
    )
    ldet = make_ldet(lang)

    acc = Fst()
    state = acc.add_state()
    acc.start = state
    for name in ("r_B", "eh_I", "d_E"):
        pid = lang.phones.find(name)
        assert pid is not None
        nxt = acc.add_state()
        acc.add_arc(state, pid, pid, 0.0, nxt)
        state = nxt
    acc.set_final(state, 0.0)

    words_side = rmepsilon(compose(acc, ldet).project("output"))
    best = shortest_path(words_side, nshortest=4, unique=True)
    texts = {
        " ".join(lang.words.find_id(o) for o in opath if o)
        for _i, opath, _w in best.paths()
    }
    assert texts == {"red", "read"}


def test_remap_symbols_drops_unmappable_arcs():
    """Phones with no counterpart in the target table must KILL the path,
    not be elided to epsilon — an elided phone would let a hypothesis
    match a wrong (shorter) word during the Ldet composition."""
    from rhasspy_speech_tpu.fst.core import SymbolTable
    from rhasspy_speech_tpu.pipeline.rescore import remap_symbols

    old = SymbolTable()
    new = SymbolTable()
    for name in ("<eps>", "a", "b", "c"):
        old.add(name)
    for name in ("<eps>", "b", "a"):  # 'c' missing; a/b ids swapped
        new.add(name)

    fst = Fst()
    s0, s1, s2 = (fst.add_state() for _ in range(3))
    fst.start = s0
    fst.set_final(s2, 0.0)
    a, b, c = old.find("a"), old.find("b"), old.find("c")
    fst.add_arc(s0, a, a, 0.0, s1)  # survives, remapped
    fst.add_arc(s1, b, b, 0.0, s2)  # survives, remapped
    fst.add_arc(s0, c, c, 0.0, s2)  # unmappable: must be dropped

    out = remap_symbols(fst, old, new, "both")
    labels = {arc[0] for arcs in out.arcs for arc in arcs}
    assert labels == {new.find("a"), new.find("b")}
    # The c-arc is gone entirely (not an epsilon arc)
    assert all(arc[0] != 0 and arc[1] != 0 for arcs in out.arcs for arc in arcs)
    assert sum(len(arcs) for arcs in out.arcs) == 2


@pytest.fixture(scope="module")
def rescore_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("rescore_oov")
    profile = build_synthetic_profile(root / "model", LEXICON)
    old_train = root / "train_old"
    new_train = root / "train_new"
    # First pass knows only "turn red"; the rescore lang only "turn read".
    train_model_sync(
        "en", _intents("turn red"), old_train, profile.model_dir,
        lang_suffixes=[LangSuffix.GRAMMAR],
    )
    train_model_sync(
        "en", _intents("turn read"), new_train, profile.model_dir,
        lang_suffixes=[LangSuffix.ARPA, LangSuffix.ARPA_RESCORE],
    )
    t = Nnet3WavTranscriber(
        profile.model_dir, old_train / lang_dir_name(LangSuffix.GRAMMAR)
    )
    pcm = synthesize_sentence(profile, "turn red", seed=7)
    wav_path = root / "utt.wav"
    _write_wav(wav_path, pcm)
    return profile, t, old_train, new_train, wav_path, pcm


def test_rescore_recovers_hypothesis_outside_first_pass(rescore_setup):
    profile, t, old_train, new_train, wav_path, pcm = rescore_setup

    # "read" does not exist in the decode graph's vocabulary, so NO
    # first-pass n-best (at any n) can contain it.
    assert t.artifacts.words.find("read") is None
    first_pass = t.transcribe_pcm_batch([pcm], nbest=5)[0]
    assert first_pass and all("read" not in text.split() for text in first_pass)

    got = t.transcribe_rescore(
        wav_path,
        old_lang_dir=old_train / lang_dir_name(LangSuffix.GRAMMAR),
        new_lang_dir=new_train / lang_dir_name(LangSuffix.ARPA_RESCORE),
        nbest=5,
    )
    assert got, "rescore produced no hypotheses"
    assert got[0] == "turn read"


def test_rescore_require_fuzzy_rejects_without_match(rescore_setup):
    """require_fuzzy=True returns [] when no fuzzy match clears the bar
    (the old grammar lang's fuzzy FST can't produce 'turn read')."""
    profile, t, old_train, new_train, wav_path, pcm = rescore_setup
    got = t.transcribe_rescore(
        wav_path,
        old_lang_dir=old_train / lang_dir_name(LangSuffix.GRAMMAR),
        new_lang_dir=new_train / lang_dir_name(LangSuffix.ARPA_RESCORE),
        nbest=5,
        max_fuzzy_cost=-1.0,  # impossible bar
        require_fuzzy=True,
    )
    assert got == []


def test_rescore_fuzzy_accept_path(rescore_setup):
    """With a permissive fuzzy bar, the fuzzy tail (old lang's G.fuzzy)
    produces the single accepted text, like transcribe_wav.py:215-223."""
    profile, _t, old_train, new_train, wav_path, pcm = rescore_setup
    t = Nnet3WavTranscriber(
        profile.model_dir, new_train / lang_dir_name(LangSuffix.ARPA)
    )
    pcm2 = synthesize_sentence(profile, "turn read", seed=5)
    wav2 = wav_path.parent / "utt_fuzzy.wav"
    _write_wav(wav2, pcm2)
    got = t.transcribe_rescore(
        wav2,
        old_lang_dir=new_train / lang_dir_name(LangSuffix.ARPA),
        new_lang_dir=new_train / lang_dir_name(LangSuffix.ARPA_RESCORE),
        nbest=5,
        max_fuzzy_cost=5.0,
    )
    assert got == ["turn read"]


def test_rescore_same_lang_matches_plain_transcription(rescore_setup):
    """Rescoring ARPA→order-5 ARPA over the same vocabulary keeps the
    correct transcript on top (the reference's standard flow)."""
    profile, _t, old_train, new_train, wav_path, pcm = rescore_setup
    t = Nnet3WavTranscriber(
        profile.model_dir, new_train / lang_dir_name(LangSuffix.ARPA)
    )
    pcm2 = synthesize_sentence(profile, "turn read", seed=3)
    wav2 = wav_path.parent / "utt2.wav"
    _write_wav(wav2, pcm2)
    got = t.transcribe_rescore(
        wav2,
        old_lang_dir=new_train / lang_dir_name(LangSuffix.ARPA),
        new_lang_dir=new_train / lang_dir_name(LangSuffix.ARPA_RESCORE),
        nbest=5,
    )
    assert got and got[0] == "turn read"


def test_stream_rescore_recovers_outside_first_pass(rescore_setup):
    """The streaming rescore rebuilds the utterance lattice after EOF and
    remaps it, so it recovers out-of-first-pass hypotheses too
    (transcribe_stream.py:131-274)."""
    from rhasspy_speech_tpu.pipeline.stream import Nnet3StreamTranscriber

    profile, _t, old_train, new_train, wav_path, pcm = rescore_setup
    st = Nnet3StreamTranscriber(
        profile.model_dir, old_train / lang_dir_name(LangSuffix.GRAMMAR)
    )
    state = st.start_stream()
    for off in range(0, pcm.shape[0], 1024):
        st.process_chunk(state, pcm[off : off + 1024])
    got = st.finish_stream_rescore(
        state,
        old_train / lang_dir_name(LangSuffix.GRAMMAR),
        new_train / lang_dir_name(LangSuffix.ARPA_RESCORE),
        nbest=5,
    )
    assert got and got[0] == "turn read"
