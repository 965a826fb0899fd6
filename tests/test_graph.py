"""Graph layer tests: HCLG expansion, dense conversion, reference Viterbi."""

import io

import numpy as np
import pytest

from rhasspy_speech_tpu.fst import EPS_ID
from rhasspy_speech_tpu.grammar import Intents, compile_intents, decode_meta
from rhasspy_speech_tpu.graph import (
    Topology,
    TransitionModel,
    dense_from_hclg,
    make_hclg,
    viterbi_numpy,
)
from rhasspy_speech_tpu.lang import make_grammar_g, make_lg, prepare_lang
from rhasspy_speech_tpu.lexicon import LexiconDatabase

LEXICON = [
    ("red", ["r", "eh", "d"]),
    ("alert", ["ah", "l", "er", "t"]),
    ("never", ["n", "eh", "v", "er"]),
    ("mind", ["m", "ay", "n", "d"]),
]


@pytest.fixture
def setup():
    intents = Intents.from_dict(
        {
            "language": "en",
            "intents": {
                "Main": {"data": [{"sentences": ["red alert", "never mind"]}]}
            },
        }
    )
    lexicon = LexiconDatabase()
    for word, phones in LEXICON:
        lexicon.add(word, [phones])

    ctx = compile_intents(intents, io.StringIO(), lexicon, number_language="en")
    lang = prepare_lang(LEXICON, silence_phones=["SIL", "SPN"])
    g = make_grammar_g(ctx.fst_file, lang.words)
    lg = make_lg(lang, g)

    phone_ids = sorted(
        pid for (_p, pid) in lang.phones if pid != 0 and not _p.startswith("#")
    )
    topo = Topology.chain(phone_ids)
    tm = TransitionModel.monophone(topo)
    hclg = make_hclg(lang, lg, tm)
    graph = dense_from_hclg(hclg, tm.num_pdfs)
    return lang, tm, graph


def _phone_frames(lang, tm, phone_names, frames_per_phone=3):
    """Synthesize per-frame pdf log-probs realizing a phone sequence:
    first frame of each phone boosts the forward pdf, the rest the
    self-loop pdf."""
    rows = []
    for name in phone_names:
        pid = lang.phones.find(name)
        assert pid is not None, name
        fwd, self_pdf = tm.pdf_map[pid][0]
        for i in range(frames_per_phone):
            row = np.full(tm.num_pdfs, -10.0, dtype=np.float32)
            row[fwd if i == 0 else self_pdf] = -0.1
            rows.append(row)
    return np.stack(rows)


def test_dense_graph_structure(setup):
    _lang, tm, graph = setup
    assert graph.num_arcs > 0
    # Every arc emits a real pdf
    assert (graph.arc_pdf >= 0).all()
    assert (graph.arc_pdf < tm.num_pdfs).all()
    # Start distribution must be non-empty
    assert (graph.init_weight < 1e29).any()
    # At least one final state
    assert (graph.final_weight < 1e29).any()


def test_viterbi_decodes_correct_sentence(setup):
    lang, tm, graph = setup

    # "red alert" with position-dependent monophones + optional silence
    phones = ["SIL", "r_B", "eh_I", "d_E", "ah_B", "l_I", "er_I", "t_E", "SIL"]
    log_probs = _phone_frames(lang, tm, phones)
    words, cost = viterbi_numpy(graph, log_probs)
    assert words is not None
    texts = [lang.words.find_id(w) for w in words]
    assert texts == ["red", "alert"], (texts, cost)

    # "never mind"
    phones = ["n_B", "eh_I", "v_I", "er_E", "m_B", "ay_I", "n_I", "d_E"]
    log_probs = _phone_frames(lang, tm, phones)
    words, _ = viterbi_numpy(graph, log_probs)
    texts = [lang.words.find_id(w) for w in words]
    assert texts == ["never", "mind"]


def test_viterbi_prefers_acoustics(setup):
    """With clear acoustics for one sentence, the other must lose."""
    lang, tm, graph = setup
    phones = ["r_B", "eh_I", "d_E", "ah_B", "l_I", "er_I", "t_E"]
    log_probs = _phone_frames(lang, tm, phones, frames_per_phone=2)
    words, cost_red = viterbi_numpy(graph, log_probs)
    assert [lang.words.find_id(w) for w in words] == ["red", "alert"]

    # Garbage acoustics: still decodes *something* in-grammar (rigid graph)
    rng = np.random.default_rng(0)
    noise = rng.normal(-5.0, 0.1, size=log_probs.shape).astype(np.float32)
    words, _ = viterbi_numpy(graph, noise)
    assert words is not None
    texts = [lang.words.find_id(w) for w in words]
    assert texts in (["red", "alert"], ["never", "mind"])


def test_dense_graph_save_load(tmp_path, setup):
    lang, tm, graph = setup
    path = str(tmp_path / "graph.npz")
    graph.save(path)
    from rhasspy_speech_tpu.graph import DenseGraph

    loaded = DenseGraph.load(path)
    assert loaded.num_states == graph.num_states
    np.testing.assert_array_equal(loaded.arc_pdf, graph.arc_pdf)
    np.testing.assert_array_equal(loaded.arc_weight, graph.arc_weight)
    assert loaded.word_seqs == graph.word_seqs

    phones = ["r_B", "eh_I", "d_E", "ah_B", "l_I", "er_I", "t_E"]
    log_probs = _phone_frames(lang, tm, phones)
    w1, c1 = viterbi_numpy(graph, log_probs)
    w2, c2 = viterbi_numpy(loaded, log_probs)
    assert w1 == w2 and c1 == c2


def test_chain_reorder_preserves_decode():
    """chain_reorder is a pure state relabeling: language, costs, and
    decoded words are unchanged; chains become consecutive ids."""
    import numpy as np

    import jax.numpy as jnp

    from rhasspy_speech_tpu.graph.dense import chain_reorder
    from rhasspy_speech_tpu.ops.decoder import (
        DeviceGraph,
        trace_to_words,
        viterbi_decode,
    )

    from tests.test_decoder import _random_graph

    rng = np.random.RandomState(71)
    g = _random_graph(rng, num_states=25, extra_arcs=60)
    g2 = chain_reorder(g)
    assert g2.num_states == g.num_states
    assert g2.num_arcs == g.num_arcs
    # permutation sanity: arc multiset preserved under some bijection
    assert sorted(np.bincount(g.arc_dst, minlength=25)) == sorted(
        np.bincount(g2.arc_dst, minlength=25)
    )

    lp = np.log(rng.dirichlet(np.ones(g.num_pdfs), size=(2, 9))).astype(
        np.float32
    )
    r1 = [np.asarray(x) for x in viterbi_decode(DeviceGraph.from_dense(g), jnp.asarray(lp))]
    r2 = [np.asarray(x) for x in viterbi_decode(DeviceGraph.from_dense(g2), jnp.asarray(lp))]
    np.testing.assert_allclose(r1[2], r2[2], rtol=1e-6)  # identical costs
    for b in range(2):
        assert (
            trace_to_words(g, *r1, b)[0] == trace_to_words(g2, *r2, b)[0]
        ), b
