"""OpenFST binary I/O + G2P decoder tests."""

import io

import numpy as np

from rhasspy_speech_tpu.fst.core import EPS_ID, Fst, SymbolTable
from rhasspy_speech_tpu.io.openfst import (
    read_openfst,
    read_symbol_table,
    write_openfst,
    write_symbol_table,
)
from rhasspy_speech_tpu.lexicon.g2p_decoder import (
    G2PModel,
    guess_pronunciations,
)


def test_symbol_table_roundtrip():
    table = SymbolTable()
    table.add("a")
    table.add("b|c")
    buf = io.BytesIO()
    write_symbol_table(buf, table, "isyms")
    buf.seek(0)
    table2 = read_symbol_table(buf)
    assert dict(table2) == dict(table)


def test_openfst_roundtrip():
    isyms = SymbolTable()
    for s in ("a", "b"):
        isyms.add(s)
    fst = Fst(isymbols=isyms, osymbols=isyms)
    s0, s1 = fst.add_state(), fst.add_state()
    fst.start = s0
    fst.add_arc(s0, 1, 2, 0.5, s1)
    fst.add_arc(s0, 2, 1, 1.5, s1)
    fst.set_final(s1, 0.25)

    buf = io.BytesIO()
    write_openfst(buf, fst)
    buf.seek(0)
    fst2 = read_openfst(buf)
    assert fst2.start == 0
    assert fst2.num_states == 2
    assert fst2.arcs[0] == [(1, 2, 0.5, 1), (2, 1, 1.5, 1)]
    assert fst2.finals[1] == 0.25
    assert dict(fst2.isymbols) == dict(isyms)


def _toy_g2p_model() -> G2PModel:
    """Letter->phone joint model: c->k, a->ae, t->t, s->s or z (z cheaper
    after t), 'ch'->ch cluster, silent 'e' via '_' skip output."""
    isyms = SymbolTable()
    osyms = SymbolTable()
    for s in ("_", "a", "c", "e", "h", "s", "t", "c|h"):
        isyms.add(s)
    for s in ("_", "ae", "ch", "k", "s", "t", "z"):
        osyms.add(s)

    fst = Fst(isymbols=isyms, osymbols=osyms)
    loop = fst.add_state()
    fst.start = loop
    fst.set_final(loop, 0.0)

    def arc(i, o, w):
        fst.add_arc(loop, isyms.find(i), osyms.find(o), w, loop)

    arc("a", "ae", 0.1)
    arc("c", "k", 0.2)
    arc("c|h", "ch", 0.1)
    arc("h", "_", 0.8)  # standalone h usually silent here
    arc("t", "t", 0.1)
    arc("s", "s", 0.3)
    arc("s", "z", 0.4)
    arc("e", "_", 0.2)  # silent e
    fst.arcsort("ilabel")
    return G2PModel(fst=fst, isymbols=isyms, osymbols=osyms)


def test_phoneticize_basic():
    model = _toy_g2p_model()
    prons = model.phoneticize("cat", nbest=1)
    assert prons
    assert prons[0][0] == ["k", "ae", "t"]


def test_phoneticize_cluster_and_skip():
    model = _toy_g2p_model()
    # 'ch' should use the cluster arc (cost 0.1 < c->k + h->_ = 1.0)
    prons = model.phoneticize("chat", nbest=1)
    assert prons[0][0] == ["ch", "ae", "t"]
    # silent e drops out
    prons = model.phoneticize("case", nbest=2)
    assert prons[0][0] == ["k", "ae", "s"]
    # second-best uses the z variant
    assert prons[1][0] == ["k", "ae", "z"]


def test_phoneticize_unknown_char():
    model = _toy_g2p_model()
    assert model.phoneticize("dog") == []


def test_guess_pronunciations_contract():
    model = _toy_g2p_model()
    out = guess_pronunciations(["cat", "dog", "tea"], model)
    assert out["cat"] == [["k", "ae", "t"]]
    assert "dog" not in out  # no pronunciation
    assert out["tea"] == [["t", "ae"]]


def test_model_load_from_binary(tmp_path):
    model = _toy_g2p_model()
    path = str(tmp_path / "g2p.fst")
    with open(path, "wb") as f:
        write_openfst(f, model.fst)
    model2 = G2PModel.load(path)
    assert model2.phoneticize("cat")[0][0] == ["k", "ae", "t"]
    assert model2.max_cluster == 2
