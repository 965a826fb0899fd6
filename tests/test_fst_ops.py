"""WFST library tests: compose/determinize/minimize/shortest/push/prune.

Correctness strategy: small hand-built FSTs with known languages, plus
randomized acyclic FSTs whose weighted languages are checked for exact
equality before/after each transformation.
"""

import io
import random

import pytest

from rhasspy_speech_tpu.fst import (
    EPS_ID,
    INF,
    Fst,
    SymbolTable,
    compose,
    determinize,
    determinize_star,
    minimize,
    minimize_encoded,
    prune,
    push,
    rmepsilon,
    shortest_distance,
    shortest_path,
    weighted_language,
)


def linear_fst(labels, weight=0.0):
    """Acceptor for one string."""
    fst = Fst()
    state = fst.add_state()
    for label in labels:
        nxt = fst.add_state()
        fst.add_arc(state, label, label, 0.0, nxt)
        state = nxt
    fst.set_final(state, weight)
    return fst


def random_acyclic_fst(rng, num_states=8, num_arcs=16, num_labels=4,
                       with_eps=True, transducer=False):
    fst = Fst()
    fst.add_states(num_states)
    fst.start = 0
    for _ in range(num_arcs):
        src = rng.randrange(0, num_states - 1)
        dst = rng.randrange(src + 1, num_states)  # forward arcs only: acyclic
        low = 0 if with_eps else 1
        il = rng.randint(low, num_labels)
        ol = rng.randint(low, num_labels) if transducer else il
        w = round(rng.uniform(0, 2), 3)
        fst.add_arc(src, il, ol, w, dst)
    fst.set_final(num_states - 1, round(rng.uniform(0, 1), 3))
    if rng.random() < 0.5:
        fst.set_final(rng.randrange(1, num_states), 0.0)
    return fst


def full_language(fst, max_paths=200000):
    """(input tuple, output tuple) -> min weight."""
    lang = {}
    for ipath, opath, w in fst.paths(max_paths):
        key = (tuple(ipath), tuple(opath))
        if key not in lang or w < lang[key] - 1e-9:
            lang[key] = w
    return {k: round(v, 6) for k, v in lang.items()}


# ---------------------------------------------------------------------------
# Compose
# ---------------------------------------------------------------------------


def test_compose_simple():
    # a:b on the left, b:c on the right -> a:c
    f1 = Fst()
    f1.add_states(2)
    f1.add_arc(0, 1, 2, 0.5, 1)
    f1.set_final(1)
    f2 = Fst()
    f2.add_states(2)
    f2.add_arc(0, 2, 3, 0.25, 1)
    f2.set_final(1)

    result = compose(f1, f2)
    lang = full_language(result)
    assert lang == {((1,), (3,)): 0.75}


def test_compose_no_match():
    f1 = linear_fst([1])
    f2 = linear_fst([2])
    assert compose(f1, f2).num_states == 0


def test_compose_with_epsilons():
    # f1: 1 -> eps output then 2
    f1 = Fst()
    f1.add_states(3)
    f1.add_arc(0, 1, EPS_ID, 0.0, 1)
    f1.add_arc(1, 2, 2, 0.0, 2)
    f1.set_final(2)
    # f2: eps input arc then 2:5
    f2 = Fst()
    f2.add_states(3)
    f2.add_arc(0, EPS_ID, 4, 0.0, 1)
    f2.add_arc(1, 2, 5, 0.0, 2)
    f2.set_final(2)

    result = compose(f1, f2)
    lang = full_language(result)
    # input 1,2 -> output 4,5
    assert lang == {((1, 2), (4, 5)): 0.0}


def test_compose_randomized_against_bruteforce():
    rng = random.Random(42)
    for trial in range(25):
        f1 = random_acyclic_fst(rng, transducer=True)
        f2 = random_acyclic_fst(rng, transducer=True)

        got = full_language(compose(f1, f2))

        # Brute force: match every f1 path output to every f2 path input
        expected = {}
        for i1, o1, w1 in f1.paths():
            for i2, o2, w2 in f2.paths():
                if tuple(o1) == tuple(i2):
                    key = (tuple(i1), tuple(o2))
                    w = round(w1 + w2, 6)
                    if key not in expected or w < expected[key]:
                        expected[key] = w

        # Compare min weights per (input, output) pair
        assert set(got) == set(expected), f"trial {trial}"
        for key in expected:
            assert abs(got[key] - expected[key]) < 1e-6, f"trial {trial} {key}"


def test_compose_phi_backoff():
    """Phi arcs act as failure transitions (ARPA backoff semantics)."""
    # f2 (the LM): state 0 has arc for label 1; phi(=99) to state 1 which
    # accepts label 2.
    f2 = Fst()
    f2.add_states(3)
    f2.add_arc(0, 1, 1, 0.1, 2)
    f2.add_arc(0, 99, 99, 0.5, 1)  # backoff with cost 0.5
    f2.add_arc(1, 2, 2, 0.2, 2)
    f2.set_final(2)

    # Input "1": matches directly, cost 0.1
    lang = full_language(compose(linear_fst([1]), f2, phi_label=99))
    assert lang == {((1,), (1,)): 0.1}

    # Input "2": must back off first: cost 0.5 + 0.2
    lang = full_language(compose(linear_fst([2]), f2, phi_label=99))
    assert lang == {((2,), (2,)): 0.7}


# ---------------------------------------------------------------------------
# rmepsilon
# ---------------------------------------------------------------------------


def test_rmepsilon_simple():
    fst = Fst()
    fst.add_states(4)
    fst.add_arc(0, EPS_ID, EPS_ID, 0.5, 1)
    fst.add_arc(1, 1, 1, 0.25, 2)
    fst.add_arc(2, EPS_ID, EPS_ID, 0.125, 3)
    fst.set_final(3)

    result = rmepsilon(fst)
    assert all(
        il != EPS_ID or ol != EPS_ID
        for arcs in result.arcs
        for (il, ol, _, _) in arcs
    )
    lang = full_language(result)
    assert lang == {((1,), (1,)): 0.875}


def test_rmepsilon_randomized():
    rng = random.Random(7)
    for _ in range(20):
        fst = random_acyclic_fst(rng, with_eps=True, transducer=False)
        expected = full_language(fst)
        got = full_language(rmepsilon(fst))
        assert got == expected


# ---------------------------------------------------------------------------
# Determinize / minimize
# ---------------------------------------------------------------------------


def is_deterministic(fst, ignore_eps=False):
    for arcs in fst.arcs:
        seen = set()
        for il, _, _, _ in arcs:
            if ignore_eps and il == EPS_ID:
                continue
            if il in seen:
                return False
            seen.add(il)
    return True


def test_determinize_acceptor():
    # Two paths spelling "1 2" with different weights: keep the min
    fst = Fst()
    fst.add_states(5)
    fst.add_arc(0, 1, 1, 1.0, 1)
    fst.add_arc(1, 2, 2, 0.5, 2)
    fst.add_arc(0, 1, 1, 0.25, 3)
    fst.add_arc(3, 2, 2, 2.0, 4)
    fst.set_final(2)
    fst.set_final(4)

    result = determinize(fst)
    assert is_deterministic(result)
    lang = full_language(result)
    assert lang == {((1, 2), (1, 2)): 1.5}


def test_determinize_transducer_outputs():
    # Same input, diverging outputs resolved after more input
    fst = Fst()
    fst.add_states(5)
    fst.add_arc(0, 1, 5, 0.0, 1)
    fst.add_arc(1, 2, 6, 0.0, 2)
    fst.add_arc(0, 1, 7, 0.0, 3)
    fst.add_arc(3, 3, 8, 0.0, 4)
    fst.set_final(2)
    fst.set_final(4)

    result = determinize(fst)
    assert is_deterministic(result, ignore_eps=True)
    lang = full_language(result)
    assert lang == {((1, 2), (5, 6)): 0.0, ((1, 3), (7, 8)): 0.0}


def test_determinize_randomized():
    rng = random.Random(13)
    for trial in range(20):
        fst = random_acyclic_fst(rng, with_eps=False, transducer=False)
        expected = full_language(fst)
        result = determinize(fst)
        assert is_deterministic(result), f"trial {trial}"
        assert full_language(result) == expected, f"trial {trial}"


def test_determinize_star_removes_input_eps():
    fst = Fst()
    fst.add_states(4)
    fst.add_arc(0, EPS_ID, 5, 0.5, 1)  # input-eps with an output
    fst.add_arc(1, 1, 6, 0.0, 2)
    fst.add_arc(0, 1, 7, 2.0, 3)
    fst.set_final(2)
    fst.set_final(3)

    result = determinize_star(fst)
    # No input epsilons except factored output chains
    lang = full_language(result)
    assert lang == {((1,), (5, 6)): 0.5, ((1,), (7,)): 2.0} or lang == {
        ((1,), (5, 6)): 0.5
    }
    # Kaldi keeps both because outputs differ -> two members in subset;
    # min weight per input seq: the (5,6) path
    assert ((1,), (5, 6)) in lang and lang[((1,), (5, 6))] == 0.5


def test_minimize_preserves_language():
    rng = random.Random(99)
    for _ in range(15):
        fst = determinize(random_acyclic_fst(rng, with_eps=False))
        expected = full_language(fst)
        smaller = minimize(fst)
        assert full_language(smaller) == expected
        assert smaller.num_states <= fst.num_states


def test_minimize_merges_equivalent_states():
    # Two identical suffix branches must merge
    fst = Fst()
    fst.add_states(5)
    fst.add_arc(0, 1, 1, 0.0, 1)
    fst.add_arc(0, 2, 2, 0.0, 2)
    fst.add_arc(1, 3, 3, 0.0, 3)
    fst.add_arc(2, 3, 3, 0.0, 4)
    fst.set_final(3)
    fst.set_final(4)

    result = minimize_encoded(fst)
    assert result.num_states == 3  # start, middle (merged), final (merged)


# ---------------------------------------------------------------------------
# Shortest path / distance, push, prune
# ---------------------------------------------------------------------------


def test_shortest_distance():
    fst = Fst()
    fst.add_states(3)
    fst.add_arc(0, 1, 1, 1.0, 1)
    fst.add_arc(0, 2, 2, 5.0, 2)
    fst.add_arc(1, 3, 3, 1.0, 2)
    fst.set_final(2, 0.5)

    dist = shortest_distance(fst)
    assert dist == [0.0, 1.0, 2.0]
    rdist = shortest_distance(fst, reverse=True)
    assert rdist == [2.5, 1.5, 0.5]


def test_shortest_path_nbest():
    fst = Fst()
    fst.add_states(3)
    fst.add_arc(0, 1, 1, 1.0, 1)
    fst.add_arc(0, 2, 2, 2.0, 1)
    fst.add_arc(0, 3, 3, 4.0, 1)
    fst.add_arc(1, 4, 4, 0.0, 2)
    fst.set_final(2)

    best = shortest_path(fst, nshortest=1)
    assert full_language(best) == {((1, 4), (1, 4)): 1.0}

    best2 = shortest_path(fst, nshortest=2)
    assert full_language(best2) == {
        ((1, 4), (1, 4)): 1.0,
        ((2, 4), (2, 4)): 2.0,
    }


def test_shortest_path_randomized():
    rng = random.Random(5)
    for _ in range(20):
        fst = random_acyclic_fst(rng, with_eps=False)
        paths = fst.paths()
        if not paths:
            continue
        true_best = min(round(w, 6) for _, _, w in paths)
        got = shortest_path(fst, nshortest=1)
        got_weight = round(min(w for _, _, w in got.paths()), 6)
        assert abs(got_weight - true_best) < 1e-6


def test_shortest_path_stop_vs_continue():
    """A final state whose continuation is cheaper than stopping: the
    costly "stop here" path must not displace cheaper longer paths in the
    n-best (completion competes in the heap, not at pop time)."""
    fst = Fst()
    fst.add_states(3)
    fst.add_arc(0, 1, 1, 1.0, 1)
    fst.set_final(1, 10.0)  # stopping at 1 costs 11.0 total
    fst.add_arc(1, 2, 2, 1.0, 2)  # continuing costs 2.0 total
    fst.add_arc(0, 3, 3, 5.0, 2)  # a middle path at 5.0
    fst.set_final(2, 0.0)

    got = sorted(w for _, _, w in shortest_path(fst, nshortest=3).paths())
    assert [round(w, 6) for w in got] == [2.0, 5.0, 11.0]


def test_shortest_path_nbest_randomized_exhaustive():
    """n-shortest equals exhaustive enumeration for n in 1..5, including
    FSTs where intermediate states are final (stop-vs-continue)."""
    rng = random.Random(17)
    for _ in range(25):
        fst = random_acyclic_fst(rng, with_eps=False)
        # make extra states final so stopping competes with continuing
        for s in range(fst.num_states):
            if rng.random() < 0.4:
                fst.set_final(s, rng.random() * 6)
        all_w = sorted(round(w, 6) for _, _, w in fst.paths())
        if not all_w:
            continue
        for n in (1, 2, 3, 5):
            got = shortest_path(fst, nshortest=n)
            got_w = sorted(round(w, 6) for _, _, w in got.paths())
            assert got_w == all_w[: len(got_w)]
            assert len(got_w) == min(n, len(all_w))


def test_push_preserves_path_weights():
    rng = random.Random(21)
    for _ in range(15):
        fst = random_acyclic_fst(rng, with_eps=False)
        expected = full_language(fst)
        pushed = push(fst)
        assert full_language(pushed) == expected


def test_prune_keeps_near_best_paths():
    fst = Fst()
    fst.add_states(2)
    fst.add_arc(0, 1, 1, 1.0, 1)
    fst.add_arc(0, 2, 2, 1.5, 1)
    fst.add_arc(0, 3, 3, 5.0, 1)
    fst.set_final(1)

    pruned = prune(fst, 1.0)
    lang = full_language(pruned)
    assert set(lang) == {((1,), (1,)), ((2,), (2,))}


# ---------------------------------------------------------------------------
# Text I/O and structural ops
# ---------------------------------------------------------------------------


def test_text_roundtrip():
    syms = SymbolTable()
    text = "0 1 a b 0.5\n1 2 c d\n2 0.25\n"
    fst = Fst.from_text(io.StringIO(text), isymbols=syms, osymbols=syms)
    assert fst.num_states == 3
    assert fst.start == 0

    out = io.StringIO()
    fst.to_text(out)
    reparsed = Fst.from_text(io.StringIO(out.getvalue()), isymbols=syms, osymbols=syms)
    assert full_language(reparsed) == full_language(fst)


def test_topsort_and_connect():
    fst = Fst()
    fst.add_states(4)
    fst.add_arc(0, 1, 1, 0.0, 2)
    fst.add_arc(2, 2, 2, 0.0, 1)
    fst.set_final(1)
    # State 3 is unreachable garbage
    fst.add_arc(3, 5, 5, 0.0, 3)

    fst.connect()
    assert fst.num_states == 3

    fst.topsort()
    for state, arcs in enumerate(fst.arcs):
        for _, _, _, ns in arcs:
            assert ns > state


def test_project_invert_relabel():
    fst = Fst()
    fst.add_states(2)
    fst.add_arc(0, 1, 2, 0.0, 1)
    fst.set_final(1)

    proj = fst.copy().project("output")
    assert proj.arcs[0][0][:2] == (2, 2)

    inv = fst.copy().invert()
    assert inv.arcs[0][0][:2] == (2, 1)

    rel = fst.copy().relabel(ipairs={1: 9})
    assert rel.arcs[0][0][:2] == (9, 2)

    rm = fst.copy().rm_symbols([2], side="output")
    assert rm.arcs[0][0][:2] == (1, EPS_ID)
