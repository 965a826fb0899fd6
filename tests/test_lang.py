"""Lang layer tests: prepare_lang, L.fst semantics, n-gram LM, G graphs."""

import io
import math

import pytest

from rhasspy_speech_tpu.fst import EPS_ID, INF, Fst, compose, shortest_path
from rhasspy_speech_tpu.grammar import Intents, compile_intents
from rhasspy_speech_tpu.lexicon import LexiconDatabase
from rhasspy_speech_tpu.lang import (
    add_lex_disambig,
    apply_position_markers,
    arpa_to_fst,
    count_ngrams,
    make_arpa_from_fst,
    make_fuzzy_g,
    make_grammar_g,
    make_lg,
    prepare_lang,
    witten_bell,
)

LEXICON = [
    ("red", ["r", "eh", "d"]),
    ("read", ["r", "eh", "d"]),  # homophone -> needs disambig
    ("reader", ["r", "eh", "d", "er"]),  # prefix relationship
    ("alert", ["ah", "l", "er", "t"]),
    ("a", ["ah"]),
]


def test_position_markers():
    marked = apply_position_markers([("a", ["ah"]), ("red", ["r", "eh", "d"])])
    assert marked == [
        ("a", ["ah_S"]),
        ("red", ["r_B", "eh_I", "d_E"]),
    ]


def test_add_lex_disambig():
    entries, ndisambig = add_lex_disambig(LEXICON)
    by_word = {}
    for word, phones, disambig in entries:
        by_word.setdefault(word, []).append((phones, disambig))

    # Homophones get #1 and #2; their shared pron is also a prefix of reader
    red = by_word["red"][0][1]
    read = by_word["read"][0][1]
    assert {red, read} == {1, 2}
    # reader is unique and not a prefix -> no disambig
    assert by_word["reader"][0][1] is None
    # 'a' ("ah") is a prefix of alert's pron -> gets its own #1
    assert by_word["a"][0][1] == 1
    assert ndisambig == 2


def test_prepare_lang_structure():
    lang = prepare_lang(LEXICON, silence_phones=["SIL", "SPN"])

    # words.txt conventions
    assert lang.words.find("<eps>") == 0
    word_ids = [lang.words.find(w) for w in sorted({w for w, _ in LEXICON})]
    assert word_ids == sorted(word_ids)
    assert lang.words.find("#0") == max(word_ids) + 1
    assert lang.words.find("<s>") == lang.words.find("#0") + 1
    assert lang.words.find("</s>") == lang.words.find("#0") + 2

    # phones.txt: eps, silence variants first
    assert lang.phones.find("<eps>") == 0
    assert lang.phones.find("SIL") == 1
    assert lang.phones.find("#0") is not None

    # L_disambig must pass #0 through
    has_passthrough = any(
        il == lang.wdisambig_phone and ol == lang.wdisambig_word and ns == s
        for s in range(lang.L_disambig.num_states)
        for (il, ol, w, ns) in lang.L_disambig.arcs[s]
    )
    assert has_passthrough


def _word_acceptor(words, lang):
    fst = Fst()
    state = fst.add_state()
    for w in words:
        nxt = fst.add_state()
        wid = lang.words.find(w)
        assert wid is not None
        fst.add_arc(state, wid, wid, 0.0, nxt)
        state = nxt
    fst.set_final(state)
    return fst


def test_l_fst_spells_words():
    lang = prepare_lang(LEXICON, silence_phones=["SIL", "SPN"])
    # Compose L with a word acceptor "red alert" and check the phone path
    sentence = _word_acceptor(["red", "alert"], lang)
    lp = compose(lang.L, sentence)
    best = shortest_path(lp, nshortest=1)
    paths = best.paths()
    assert paths
    iphones, owords, _ = paths[0]
    phone_names = [lang.phones.find_id(p) for p in iphones]
    # Silence optional on the best path; strip optional SILs
    non_sil = [p for p in phone_names if not p.startswith("SIL")]
    assert non_sil == ["r_B", "eh_I", "d_E", "ah_B", "l_I", "er_I", "t_E"]
    word_names = [lang.words.find_id(w) for w in owords]
    assert word_names == ["red", "alert"]


# ---------------------------------------------------------------------------
# N-gram LM
# ---------------------------------------------------------------------------


def _sentence_fst(sentences, table):
    """Union acceptor of word sequences (equal weight 0)."""
    fst = Fst()
    start = fst.add_state()
    final = fst.add_state()
    fst.set_final(final)
    for sent in sentences:
        state = start
        for word in sent.split():
            wid = table.find(word) or table.add(word)
            nxt = fst.add_state()
            fst.add_arc(state, wid, wid, 0.0, nxt)
            state = nxt
        fst.add_arc(state, EPS_ID, EPS_ID, 0.0, final)
    return fst


def test_count_ngrams():
    from rhasspy_speech_tpu.fst import SymbolTable

    table = SymbolTable()
    fst = _sentence_fst(["a b", "a c"], table)
    fst.isymbols = table
    counts = count_ngrams(fst, order=2, symbols=table)

    assert counts[("a",)] == pytest.approx(2.0)
    assert counts[("b",)] == pytest.approx(1.0)
    assert counts[("<s>", "a")] == pytest.approx(2.0)
    assert counts[("a", "b")] == pytest.approx(1.0)
    assert counts[("b", "</s>")] == pytest.approx(1.0)
    assert counts[("</s>",)] == pytest.approx(2.0)


def test_witten_bell_probabilities_sum_to_one():
    from rhasspy_speech_tpu.fst import SymbolTable

    table = SymbolTable()
    fst = _sentence_fst(["a b", "a c", "b c a"], table)
    fst.isymbols = table
    counts = count_ngrams(fst, order=2, symbols=table)
    arpa = witten_bell(counts, order=2)

    # For each bigram history, sum of explicit probs + alpha * lower-order
    # mass of unseen words must be ~1
    unigrams = {
        ng[0]: 10 ** logp
        for ng, (logp, _b) in arpa.ngrams[0].items()
        if ng[0] != "<s>"
    }
    for hist_tuple, (_p, backoff) in arpa.ngrams[0].items():
        if backoff is None:
            continue
        hist = hist_tuple[0]
        seen = {
            ng[1]: 10 ** logp
            for ng, (logp, _) in arpa.ngrams[1].items()
            if ng[0] == hist
        }
        alpha = 10 ** backoff
        unseen_mass = sum(p for w, p in unigrams.items() if w not in seen)
        total = sum(seen.values()) + alpha * unseen_mass
        assert total == pytest.approx(1.0, abs=0.02), hist


def test_arpa_to_fst_scores():
    """G.fst must score an in-grammar sentence with finite cost and use
    backoff (#0) for unseen combinations."""
    lang = prepare_lang(LEXICON, silence_phones=["SIL", "SPN"])
    sentences = ["red alert", "read a", "a reader"]
    g_input = _sentence_fst(sentences, lang.words)
    g_input.isymbols = lang.words
    arpa = make_arpa_from_fst(g_input, order=2, symbols=lang.words)
    g = arpa_to_fst(arpa, lang.words)

    # In-grammar sentence: compose a plain acceptor (treat #0 as phi)
    phi = lang.words.find("#0")
    seen_cost = _score(g, _word_acceptor(["red", "alert"], lang), phi)
    assert seen_cost < 10

    # Unseen-but-backed-off: "alert red" goes through backoff arcs
    unseen_cost = _score(g, _word_acceptor(["alert", "red"], lang), phi)
    assert INF > unseen_cost > seen_cost


def _score(g, acceptor, phi):
    composed = compose(acceptor, g, phi_label=phi)
    best = shortest_path(composed, nshortest=1)
    paths = best.paths()
    if not paths:
        return INF
    return min(w for _, _, w in paths)


# ---------------------------------------------------------------------------
# Grammar G + fuzzy + LG end-to-end over a real template grammar
# ---------------------------------------------------------------------------


@pytest.fixture
def grammar_ctx():
    intents = Intents.from_dict(
        {
            "language": "en",
            "intents": {
                "Main": {
                    "data": [
                        {"sentences": ["red alert", "read a [reader]"]}
                    ]
                }
            },
        }
    )
    lexicon = LexiconDatabase()
    for word, phones in LEXICON:
        lexicon.add(word, [phones])
    return compile_intents(intents, io.StringIO(), lexicon, number_language="en")


def test_make_grammar_g(grammar_ctx):
    lang = prepare_lang(LEXICON, silence_phones=["SIL", "SPN"])
    g = make_grammar_g(grammar_ctx.fst_file, lang.words)

    langs = set()
    for ipath, _opath, _w in g.paths():
        langs.add(" ".join(lang.words.find_id(i) for i in ipath))
    assert langs == {"red alert", "read a", "read a reader"}


def test_fuzzy_g_deletion(grammar_ctx):
    lang = prepare_lang(LEXICON, silence_phones=["SIL", "SPN"])
    grammar_ctx.fst_file.seek(0)
    g = make_grammar_g(grammar_ctx.fst_file, lang.words)
    fuzzy = make_fuzzy_g(g, grammar_ctx.vocab, lang.words)

    # Input with an inserted word still matches, at cost ~1 per deletion
    noisy = _word_acceptor(["red", "red", "alert"], lang)
    composed = compose(noisy, fuzzy)
    best = shortest_path(composed, nshortest=1)
    paths = best.paths()
    assert paths
    cost = min(w for _, _, w in paths)
    assert 0.9 < cost < 1.5


def test_make_lg(grammar_ctx):
    lang = prepare_lang(LEXICON, silence_phones=["SIL", "SPN"])
    grammar_ctx.fst_file.seek(0)
    g = make_grammar_g(grammar_ctx.fst_file, lang.words)
    lg = make_lg(lang, g)

    # LG maps phone sequences to word sequences: best path for the phones
    # of "red alert" must output those words
    assert lg.num_states > 0
    best = shortest_path(lg, nshortest=1)
    paths = best.paths()
    assert paths
    _, owords, _ = paths[0]
    out = [lang.words.find_id(w) for w in owords if w != EPS_ID]
    assert out in (["red", "alert"], ["read", "a"], ["read", "a", "reader"])


def test_lm_score_matches_phi_composition():
    """The rescorer's backoff walk (pipeline/fuzzy.py lm_score) must agree
    with full phi-composition + shortest path through the same G."""
    from rhasspy_speech_tpu.fst.core import EPS_ID, Fst, INF
    from rhasspy_speech_tpu.fst.ops import compose, shortest_path
    from rhasspy_speech_tpu.lang import arpa_to_fst, count_ngrams, witten_bell
    from rhasspy_speech_tpu.pipeline.fuzzy import lm_score

    # corpus FST: weighted union of sentences
    from rhasspy_speech_tpu.fst.core import SymbolTable

    words = SymbolTable()
    for w in ["a", "b", "c"]:
        words.add(w)
    phi = words.add("#0")
    words.add("<s>")
    words.add("</s>")

    corpus = Fst(isymbols=words, osymbols=words)
    start = corpus.add_state()
    corpus.start = start
    for sentence in (["a", "b"], ["a", "c"], ["b", "c", "a"], ["a", "b"]):
        cur = start
        for w in sentence:
            nxt = corpus.add_state()
            corpus.add_arc(cur, words.find(w), words.find(w), 0.0, nxt)
            cur = nxt
        corpus.set_final(cur, 0.0)

    arpa = witten_bell(count_ngrams(corpus, 2, symbols=words), 2)
    g = arpa_to_fst(arpa, words)

    import itertools

    for seq_words in itertools.product(["a", "b", "c"], repeat=2):
        seq = [words.find(w) for w in seq_words]
        walk = lm_score(g, seq, phi)

        # reference: compose a linear acceptor with G treating #0 as an
        # epsilon-like backoff that must only fire when no match exists.
        # Build the linear FST allowing free #0 self-loops on the G side by
        # adding #0:eps loops to the input automaton and composing.
        lin = Fst(isymbols=words, osymbols=words)
        s0 = lin.add_state()
        lin.start = s0
        cur = s0
        for wid in seq:
            nxt = lin.add_state()
            lin.add_arc(cur, wid, wid, 0.0, nxt)
            cur = nxt
        lin.set_final(cur, 0.0)
        for s in range(lin.num_states):
            lin.add_arc(s, phi, phi, 0.0, s)  # allow G's backoff arcs
        lin.arcsort("olabel")
        composed = compose(lin, g)
        best = shortest_path(composed, nshortest=1)
        total = INF
        if best.start >= 0 and best.num_states:
            # sum the single path
            cost, state = 0.0, best.start
            while best.finals[state] == INF and best.arcs[state]:
                _il, _ol, w, state = (
                    best.arcs[state][0][0], best.arcs[state][0][1],
                    best.arcs[state][0][2], best.arcs[state][0][3],
                )
                cost += w
            if best.finals[state] != INF:
                total = cost + best.finals[state]
        # The phi walk is at least as costly as the unconstrained-backoff
        # shortest path, and equal when backoff is forced (no double match)
        if walk != float("inf") and total != INF:
            assert walk >= total - 1e-4, (seq_words, walk, total)


def test_kneser_ney_probabilities_sum_to_one():
    """Interpolated KN in backoff form: per-history total mass ~= 1."""
    from rhasspy_speech_tpu.fst import SymbolTable
    from rhasspy_speech_tpu.lang.ngram import kneser_ney

    table = SymbolTable()
    fst = _sentence_fst(
        ["a b", "a c", "b c a", "a b c", "c a"], table
    )
    fst.isymbols = table
    counts = count_ngrams(fst, order=2, symbols=table)
    arpa = kneser_ney(counts, order=2)

    unigrams = {
        ng[0]: 10 ** logp
        for ng, (logp, _b) in arpa.ngrams[0].items()
        if ng[0] != "<s>"
    }
    assert sum(unigrams.values()) == pytest.approx(1.0, abs=0.02)
    for hist_tuple, (_p, backoff) in arpa.ngrams[0].items():
        if backoff is None:
            continue
        hist = hist_tuple[0]
        seen = {
            ng[1]: 10 ** logp
            for ng, (logp, _) in arpa.ngrams[1].items()
            if ng[0] == hist
        }
        alpha = 10 ** backoff
        unseen_mass = sum(p for w, p in unigrams.items() if w not in seen)
        total = sum(seen.values()) + alpha * unseen_mass
        assert total == pytest.approx(1.0, abs=0.02), hist


def test_kneser_ney_continuation_effect():
    """KN's signature: a word frequent in ONE context only gets a smaller
    unigram (continuation) probability than a word of equal raw frequency
    spread over many contexts."""
    from rhasspy_speech_tpu.fst import SymbolTable
    from rhasspy_speech_tpu.lang.ngram import kneser_ney

    table = SymbolTable()
    # 'x' appears 4x but ALWAYS after 'q'; 'y' appears 4x after 4 contexts
    sents = ["q x", "q x", "q x", "q x",
             "a y", "b y", "c y", "d y"]
    fst = _sentence_fst(sents, table)
    fst.isymbols = table
    counts = count_ngrams(fst, order=2, symbols=table)
    arpa = kneser_ney(counts, order=2)
    p_x = 10 ** arpa.ngrams[0][("x",)][0]
    p_y = 10 ** arpa.ngrams[0][("y",)][0]
    assert p_y > 2.0 * p_x, (p_x, p_y)


def test_kneser_ney_arpa_roundtrip_and_g_fst():
    """KN ARPA survives write/read and compiles into a scoring G.fst."""
    import io as _io

    from rhasspy_speech_tpu.fst import SymbolTable
    from rhasspy_speech_tpu.lang.ngram import ArpaModel, arpa_to_fst, kneser_ney

    table = SymbolTable()
    fst = _sentence_fst(["a b c", "a c", "b a"], table)
    fst.isymbols = table
    counts = count_ngrams(fst, order=3, symbols=table)
    arpa = kneser_ney(counts, order=3)

    buf = _io.StringIO()
    arpa.write(buf)
    buf.seek(0)
    arpa2 = ArpaModel.read(buf)
    assert arpa2.order == 3
    for lvl_a, lvl_b in zip(arpa.ngrams, arpa2.ngrams):
        assert set(lvl_a) == set(lvl_b)

    words = SymbolTable()
    words.add("<eps>", 0)
    for w, _ in sorted(table, key=lambda kv: kv[1]):
        if w not in ("<eps>",):
            words.add(w)
    words.add("#0")
    g = arpa_to_fst(arpa, words)
    assert g.num_states > 0 and g.num_arcs > 0


def test_absolute_discounting_probabilities_sum_to_one():
    """Interpolated absolute discounting: per-history total mass ~= 1."""
    from rhasspy_speech_tpu.fst import SymbolTable
    from rhasspy_speech_tpu.lang.ngram import absolute_discounting

    table = SymbolTable()
    fst = _sentence_fst(
        ["a b", "a c", "b c a", "a b c", "c a"], table
    )
    fst.isymbols = table
    counts = count_ngrams(fst, order=2, symbols=table)
    arpa = absolute_discounting(counts, order=2)

    unigrams = {
        ng[0]: 10 ** logp
        for ng, (logp, _b) in arpa.ngrams[0].items()
        if ng[0] != "<s>"
    }
    assert sum(unigrams.values()) == pytest.approx(1.0, abs=0.02)
    for hist_tuple, (_p, backoff) in arpa.ngrams[0].items():
        if backoff is None:
            continue
        hist = hist_tuple[0]
        seen = {
            ng[1]: 10 ** logp
            for ng, (logp, _) in arpa.ngrams[1].items()
            if ng[0] == hist
        }
        alpha = 10 ** backoff
        unseen_mass = sum(p for w, p in unigrams.items() if w not in seen)
        total = sum(seen.values()) + alpha * unseen_mass
        assert total == pytest.approx(1.0, abs=0.02), hist


def test_katz_probabilities_sum_to_one():
    """Katz backoff: explicit + alpha-weighted backoff mass ~= 1 per
    history (singleton-rich corpus so Good-Turing bins are populated)."""
    from rhasspy_speech_tpu.fst import SymbolTable
    from rhasspy_speech_tpu.lang.ngram import katz

    table = SymbolTable()
    sents = (
        ["a b"] * 3 + ["a c", "b c", "c a", "b a", "c b a", "a b c"]
    )
    fst = _sentence_fst(sents, table)
    fst.isymbols = table
    counts = count_ngrams(fst, order=2, symbols=table)
    arpa = katz(counts, order=2)

    unigrams = {
        ng[0]: 10 ** logp
        for ng, (logp, _b) in arpa.ngrams[0].items()
        if ng[0] != "<s>"
    }
    assert sum(unigrams.values()) == pytest.approx(1.0, abs=0.02)
    for hist_tuple, (_p, backoff) in arpa.ngrams[0].items():
        if backoff is None or backoff <= -99.0:
            continue
        hist = hist_tuple[0]
        seen = {
            ng[1]: 10 ** logp
            for ng, (logp, _) in arpa.ngrams[1].items()
            if ng[0] == hist
        }
        alpha = 10 ** backoff
        unseen_mass = sum(p for w, p in unigrams.items() if w not in seen)
        total = sum(seen.values()) + alpha * unseen_mass
        assert total == pytest.approx(1.0, abs=0.03), hist


def test_katz_backoff_never_positive_when_lower_mass_covered():
    """With fractional expected counts, sum of lower-order probs over the
    seen continuations can reach/exceed 1.0; the backoff weight must then
    be 'no backoff mass' (very negative), never a positive log10 weight
    from dividing by an epsilon-floored denominator."""
    from rhasspy_speech_tpu.lang.ngram import katz

    # One history whose single continuation carries all unigram mass:
    # lower_seen == P_uni(b) ~ 1.0 after leftover spreading.
    counts = {
        ("<s>",): 2.0,
        ("b",): 2.0,
        ("</s>",): 2.0,
        ("<s>", "b"): 2.0,
        ("b", "</s>"): 2.0,
    }
    arpa = katz(counts, order=2)
    for _ng, (_logp, backoff) in arpa.ngrams[0].items():
        if backoff is not None:
            assert backoff <= 0.0


def test_katz_discounts_singletons():
    """Good-Turing shifts mass off singleton bigrams: a once-seen bigram
    must cost more than its ML estimate, a frequent one stays near ML."""
    from rhasspy_speech_tpu.fst import SymbolTable
    from rhasspy_speech_tpu.lang.ngram import katz

    table = SymbolTable()
    sents = ["q x"] * 8 + ["q y", "q z", "q w", "y z", "z w", "w y"]
    fst = _sentence_fst(sents, table)
    fst.isymbols = table
    counts = count_ngrams(fst, order=2, symbols=table)
    arpa = katz(counts, order=2)

    p_qx = 10 ** arpa.ngrams[1][("q", "x")][0]  # seen 8x of 11 from q
    p_qy = 10 ** arpa.ngrams[1][("q", "y")][0]  # singleton
    ml_qx = 8.0 / 11.0
    ml_qy = 1.0 / 11.0
    assert p_qy < ml_qy  # singleton discounted below ML
    assert p_qx == pytest.approx(ml_qx, rel=0.15)  # big count ~undisturbed


def test_all_smoothing_methods_build_decodable_g():
    """Every ngrammake method produces an ARPA that compiles to a G.fst
    scoring in-grammar sentences finitely."""
    from rhasspy_speech_tpu.fst import SymbolTable
    from rhasspy_speech_tpu.lang.ngram import arpa_to_fst, make_arpa_from_fst
    from rhasspy_speech_tpu.pipeline.fuzzy import lm_score

    table = SymbolTable()
    fst = _sentence_fst(["a b", "a c", "b c a"], table)
    fst.isymbols = table
    words = SymbolTable()
    words.add("<eps>", 0)
    for w, _ in sorted(table, key=lambda kv: kv[1]):
        if w not in ("<eps>",):
            words.add(w)
    words.add("#0")
    for method in ("witten_bell", "kneser_ney", "absolute", "katz"):
        arpa = make_arpa_from_fst(fst, order=2, symbols=table, method=method)
        g = arpa_to_fst(arpa, words)
        phi = words.find("#0")
        ids = [words.find(w) for w in ("a", "b")]
        cost = lm_score(g, ids, phi)
        assert cost < 50.0, method


def test_fractional_counts_stay_normalized():
    """Expected counts from a weighted grammar can sit below the discount
    D; the interpolation weight sum(min(c, D))/c(h) must keep every
    history's mass at ~1 (the D*T/c formula overshoots to ~3 here)."""
    import math

    from rhasspy_speech_tpu.fst import SymbolTable
    from rhasspy_speech_tpu.lang.ngram import absolute_discounting, kneser_ney

    table = SymbolTable()
    # 4-way alternation: each path weight 0.25 -> fractional counts << 0.75
    fst = _sentence_fst(["go a", "go b", "go c", "go d"], table)
    for arcs in fst.arcs:
        for i, (il, ol, w, ns) in enumerate(arcs):
            arcs[i] = (il, ol, w + math.log(4.0) / 2, ns)  # spread mass
    fst.isymbols = table
    counts = count_ngrams(fst, order=2, symbols=table)

    for builder in (absolute_discounting, kneser_ney):
        arpa = builder(counts, order=2)
        unigrams = {
            ng[0]: 10 ** logp
            for ng, (logp, _b) in arpa.ngrams[0].items()
            if ng[0] != "<s>"
        }
        assert sum(unigrams.values()) == pytest.approx(1.0, abs=0.05), builder
        for hist_tuple, (_p, backoff) in arpa.ngrams[0].items():
            if backoff is None:
                continue
            hist = hist_tuple[0]
            seen = {
                ng[1]: 10 ** logp
                for ng, (logp, _) in arpa.ngrams[1].items()
                if ng[0] == hist
            }
            alpha = 10 ** backoff
            unseen = sum(p for w, p in unigrams.items() if w not in seen)
            total = sum(seen.values()) + alpha * unseen
            assert total == pytest.approx(1.0, abs=0.05), (builder, hist)
