"""Sparse top-K frontier decoder tests vs the dense decoder."""

import numpy as np

import jax.numpy as jnp

from rhasspy_speech_tpu.ops.decoder import DeviceGraph, viterbi_decode, trace_to_words
from rhasspy_speech_tpu.ops.frontier import (
    FrontierGraph,
    topk_backtrace,
    viterbi_topk,
)

from tests.test_decoder import _random_graph


def test_topk_exact_when_k_covers_states():
    """With K >= num_states the frontier decode equals dense decode."""
    rng = np.random.RandomState(51)
    graph = _random_graph(rng, num_states=14, extra_arcs=40)
    dense_dev = DeviceGraph.from_dense(graph)
    frontier = FrontierGraph.from_dense(graph)

    B, T = 3, 12
    lp = np.log(rng.dirichlet(np.ones(graph.num_pdfs), size=(B, T))).astype(
        np.float32
    )

    plain = [np.asarray(v) for v in viterbi_decode(dense_dev, jnp.asarray(lp))]
    states_t, alphas_t, arcs_t = (
        np.asarray(v)
        for v in viterbi_topk(frontier, jnp.asarray(lp), k=graph.num_states)
    )

    for b in range(B):
        want = trace_to_words(graph, plain[0], plain[1], plain[2], b)
        got = topk_backtrace(graph, states_t, alphas_t, arcs_t, b)
        assert got[0] == want[0], b
        np.testing.assert_allclose(got[1], want[1], rtol=1e-5)


def test_topk_narrow_beam_still_decodes():
    """A narrow beam (K=4) still produces a complete (possibly suboptimal)
    hypothesis whose cost is >= the exact best cost."""
    rng = np.random.RandomState(52)
    graph = _random_graph(rng, num_states=14, extra_arcs=40)
    dense_dev = DeviceGraph.from_dense(graph)
    frontier = FrontierGraph.from_dense(graph)
    lp = np.log(rng.dirichlet(np.ones(graph.num_pdfs), size=(1, 10))).astype(
        np.float32
    )

    plain = [np.asarray(v) for v in viterbi_decode(dense_dev, jnp.asarray(lp))]
    exact = trace_to_words(graph, plain[0], plain[1], plain[2], 0)

    states_t, alphas_t, arcs_t = (
        np.asarray(v) for v in viterbi_topk(frontier, jnp.asarray(lp), k=8)
    )
    got = topk_backtrace(graph, states_t, alphas_t, arcs_t, 0)
    # A beam may legitimately prune every final-reachable state; when a
    # hypothesis survives, it can't beat the exact best.
    if got[0] is not None:
        assert got[1] >= exact[1] - 1e-5


def test_topk_on_grammar_graph():
    """Frontier decode of the real grammar graph recovers the oracle
    sentence with a modest beam."""
    import io as _io

    from tests.test_graph import LEXICON, _phone_frames
    from rhasspy_speech_tpu.grammar import Intents, compile_intents
    from rhasspy_speech_tpu.graph import (
        Topology,
        TransitionModel,
        dense_from_hclg,
        make_hclg,
    )
    from rhasspy_speech_tpu.lang import make_grammar_g, make_lg, prepare_lang
    from rhasspy_speech_tpu.lexicon import LexiconDatabase

    intents = Intents.from_dict(
        {"language": "en",
         "intents": {"Main": {"data": [{"sentences": ["red alert", "never mind"]}]}}}
    )
    lexicon = LexiconDatabase()
    for word, phones in LEXICON:
        lexicon.add(word, [phones])
    ctx = compile_intents(intents, _io.StringIO(), lexicon, number_language="en")
    lang = prepare_lang(LEXICON, silence_phones=["SIL", "SPN"])
    g = make_grammar_g(ctx.fst_file, lang.words)
    lg = make_lg(lang, g)
    pids = sorted(
        pid for (p, pid) in lang.phones if pid != 0 and not p.startswith("#")
    )
    tm = TransitionModel.monophone(Topology.chain(pids))
    graph = dense_from_hclg(make_hclg(lang, lg, tm), tm.num_pdfs)
    frontier = FrontierGraph.from_dense(graph)

    lp = _phone_frames(
        lang, tm, ["SIL", "r_B", "eh_I", "d_E", "ah_B", "l_I", "er_I", "t_E", "SIL"]
    )[None]
    states_t, alphas_t, arcs_t = (
        np.asarray(v) for v in viterbi_topk(frontier, jnp.asarray(lp), k=32)
    )
    words, _cost = topk_backtrace(graph, states_t, alphas_t, arcs_t, 0)
    assert [lang.words.find_id(w) for w in words] == ["red", "alert"]


def test_dedup_strategies_agree(monkeypatch):
    """Scatter-min dedup and sort dedup produce identical decodes in the
    exact regime (K >= reachable states)."""
    import rhasspy_speech_tpu.ops.frontier as fr

    rng = np.random.RandomState(23)
    graph = _random_graph(rng, num_states=30, extra_arcs=120)
    fg = fr.FrontierGraph.from_dense(graph)
    lp = jnp.asarray(
        np.log(rng.dirichlet(np.ones(graph.num_pdfs), size=(2, 10))).astype(
            np.float32
        )
    )
    K = graph.num_states  # exact regime

    monkeypatch.setattr(fr, "DEFAULT_DEDUP_SCRATCH_BYTES", 0)  # force sort path
    s1, a1, r1 = [np.asarray(x) for x in fr.viterbi_topk(fg, lp, K)]
    monkeypatch.setattr(fr, "DEFAULT_DEDUP_SCRATCH_BYTES", 2 << 30)
    s2, a2, r2 = [np.asarray(x) for x in fr.viterbi_topk(fg, lp, K)]

    # same (state, cost) sets per frame/stream; slot order may differ
    for t in range(s1.shape[0]):
        for b in range(s1.shape[1]):
            m1 = {int(s): float(a) for s, a in zip(s1[t, b], a1[t, b]) if s >= 0}
            m2 = {int(s): float(a) for s, a in zip(s2[t, b], a2[t, b]) if s >= 0}
            assert set(m1) == set(m2), (t, b)
            for st in m1:
                assert abs(m1[st] - m2[st]) < 1e-4, (t, b, st)


def test_frontier_src_pdf_fold_matches_dense():
    """With the pdf-per-source fold active (Kaldi HMM property), the
    frontier decode in the exact regime matches the dense decoder's
    transcript and cost, and matches an unfolded frontier decode."""
    from dataclasses import replace

    import rhasspy_speech_tpu.ops.frontier as fr
    from rhasspy_speech_tpu.ops.decoder import DeviceGraph, viterbi_decode
    from rhasspy_speech_tpu.ops.decoder import trace_to_words

    rng = np.random.RandomState(29)
    graph = _random_graph(rng, num_states=24, extra_arcs=90)
    state_pdf = rng.randint(graph.num_pdfs, size=graph.num_states).astype(
        np.int32
    )
    graph.arc_pdf = state_pdf[graph.arc_src]

    fg = fr.FrontierGraph.from_dense(graph)
    assert fg.base.src_pdf is not None
    lp = jnp.asarray(
        np.log(rng.dirichlet(np.ones(graph.num_pdfs), size=(2, 9))).astype(
            np.float32
        )
    )
    K = graph.num_states
    s, a, r = [np.asarray(x) for x in fr.viterbi_topk(fg, lp, K)]
    words, cost = fr.topk_backtrace(graph, s, a, r, 0)

    dev = DeviceGraph.from_dense(graph)
    dres = [np.asarray(x) for x in viterbi_decode(dev, lp)]
    dwords, dcost = trace_to_words(graph, *dres, 0)
    assert words == dwords
    assert abs(cost - dcost) < 1e-3

    fg_unfolded = replace(fg, base=replace(fg.base, src_pdf=None))
    s2, a2, r2 = [np.asarray(x) for x in fr.viterbi_topk(fg_unfolded, lp, K)]
    words2, cost2 = fr.topk_backtrace(graph, s2, a2, r2, 0)
    assert words == words2
    assert abs(cost - cost2) < 1e-3
