"""Lattice generation tests: pruning semantics + best-path consistency."""

import numpy as np

import jax.numpy as jnp

from rhasspy_speech_tpu.ops.decoder import DeviceGraph, viterbi_decode, trace_to_words
from rhasspy_speech_tpu.ops.lattice import (
    arc_posteriors,
    build_lattice,
    forward_backward,
    forward_backward_log,
)

from tests.test_decoder import _random_graph


def _setup(seed=61, B=2, T=10):
    rng = np.random.RandomState(seed)
    graph = _random_graph(rng)
    dev = DeviceGraph.from_dense(graph)
    lp = np.log(rng.dirichlet(np.ones(graph.num_pdfs), size=(B, T))).astype(
        np.float32
    )
    return graph, dev, lp


def test_forward_backward_consistency():
    """min over states of alpha[t] + beta[t] equals the best total cost at
    every frame boundary."""
    graph, dev, lp = _setup()
    alphas, betas = (np.asarray(v) for v in forward_backward(dev, jnp.asarray(lp)))
    totals = (alphas + betas).min(axis=-1)  # [T+1, B]
    for b in range(lp.shape[0]):
        np.testing.assert_allclose(
            totals[:, b], totals[0, b] * np.ones(lp.shape[1] + 1), rtol=1e-4
        )


def test_lattice_best_path_matches_viterbi():
    graph, dev, lp = _setup()
    alphas, betas = (np.asarray(v) for v in forward_backward(dev, jnp.asarray(lp)))
    plain = [np.asarray(v) for v in viterbi_decode(dev, jnp.asarray(lp))]
    for b in range(lp.shape[0]):
        lat = build_lattice(graph, alphas, betas, lp, b, lattice_beam=8.0)
        assert lat is not None
        want = trace_to_words(graph, plain[0], plain[1], plain[2], b)
        got_words, got_cost = lat.shortest_path_words(graph)
        assert got_words == want[0], b
        np.testing.assert_allclose(got_cost, want[1], rtol=1e-4)
        np.testing.assert_allclose(lat.best_cost, want[1], rtol=1e-4)


def test_lattice_beam_monotonic():
    """Wider beams keep at least as many arcs; zero beam keeps ~best path."""
    graph, dev, lp = _setup()
    alphas, betas = (np.asarray(v) for v in forward_backward(dev, jnp.asarray(lp)))
    lat_narrow = build_lattice(graph, alphas, betas, lp, 0, lattice_beam=0.01)
    lat_wide = build_lattice(graph, alphas, betas, lp, 0, lattice_beam=20.0)
    assert lat_narrow.num_arcs() <= lat_wide.num_arcs()
    assert lat_narrow.num_arcs() >= lp.shape[1]  # at least the best path
    # every narrow-beam path cost is within the wide beam too
    got_words, got_cost = lat_narrow.shortest_path_words(graph)
    np.testing.assert_allclose(got_cost, lat_narrow.best_cost, rtol=1e-4)


def test_forward_backward_log_vs_brute_force():
    """Sum-over-paths total matches explicit path enumeration on a tiny
    graph, and the log-semiring total cost is <= the tropical (best-path)
    total."""
    graph, dev, lp = _setup(seed=63, B=1, T=5)
    la, lb = (np.asarray(v) for v in forward_backward_log(dev, jnp.asarray(lp)))
    ta, tb = (np.asarray(v) for v in forward_backward(dev, jnp.asarray(lp)))

    # -logsumexp over start states = -log(total path probability)
    x = la[0, 0] + lb[0, 0]
    m = x.min()
    log_total = m - np.log(np.exp(-(x - m)).sum())
    trop_total = float((ta[0, 0] + tb[0, 0]).min())
    assert log_total <= trop_total + 1e-4

    # brute force: enumerate all arc paths of length T
    T = lp.shape[1]
    am = -lp[0]  # [T, P] costs
    total_prob = 0.0
    starts = np.where(graph.init_weight < 1e29)[0]
    arcs_from = {}
    for a in range(graph.num_arcs):
        arcs_from.setdefault(int(graph.arc_src[a]), []).append(a)

    def walk(state, t, cost):
        nonlocal total_prob
        if t == T:
            f = graph.final_weight[state]
            if f < 1e29:
                total_prob += np.exp(-(cost + f))
            return
        for a in arcs_from.get(state, []):
            c = cost + graph.arc_weight[a] + am[t, graph.arc_pdf[a]]
            if c < 60.0:  # prune hopeless paths to bound runtime
                walk(int(graph.arc_dst[a]), t + 1, c)

    for s in starts:
        walk(int(s), 0, float(graph.init_weight[s]))
    assert total_prob > 0
    np.testing.assert_allclose(np.exp(-log_total), total_prob, rtol=1e-3)


def test_arc_posteriors_sum_to_one():
    """Per-frame arc occupancies sum to 1 — the basis for confidences."""
    graph, dev, lp = _setup(seed=64, B=2, T=8)
    la, lb = (np.asarray(v) for v in forward_backward_log(dev, jnp.asarray(lp)))
    for b in range(lp.shape[0]):
        post = arc_posteriors(graph, la, lb, lp, b)
        assert post.shape == (lp.shape[1], graph.num_arcs)
        np.testing.assert_allclose(post.sum(axis=1), 1.0, rtol=1e-3)
        assert (post >= -1e-6).all()


def test_lattice_nbest_matches_kbest_decoder():
    """lattice-to-nbest equals the K-best decoder's hypotheses."""
    from rhasspy_speech_tpu.ops.decoder import backtrace_nbest, viterbi_kbest

    graph, dev, lp = _setup(seed=62, B=1, T=8)
    alphas, betas = (np.asarray(v) for v in forward_backward(dev, jnp.asarray(lp)))
    lat = build_lattice(graph, alphas, betas, lp, 0, lattice_beam=30.0)

    alphak, bpk = viterbi_kbest(dev, jnp.asarray(lp), k=4)
    want = backtrace_nbest(graph, np.asarray(alphak), np.asarray(bpk), 0, n=3)
    got = lat.nbest(graph, 3)

    assert [w for w, _ in got] == [w for w, _ in want]
    np.testing.assert_allclose(
        [c for _, c in got], [c for _, c in want], rtol=1e-4
    )
