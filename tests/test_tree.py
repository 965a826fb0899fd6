"""ContextDependency tree tests: parsing, lookup, triphone HCLG expansion."""

import io

import numpy as np

import jax.numpy as jnp

from rhasspy_speech_tpu.io.kaldi_io import KaldiReader, KaldiWriter
from rhasspy_speech_tpu.io.tree import (
    PDF_CLASS_KEY,
    ContextDependencyTree,
    read_event_map,
    write_event_map,
)


def test_event_map_roundtrip():
    node = (
        "se", 1, frozenset({2, 3}),
        ("ce", 7),
        ("te", PDF_CLASS_KEY, [("ce", 1), None, ("ce", 2)]),
    )
    tree = ContextDependencyTree(N=3, P=1, root=node)
    buf = io.BytesIO()
    tree.write(KaldiWriter(buf))
    buf.seek(0)
    tree2 = ContextDependencyTree.read(KaldiReader(buf))
    assert tree2.N == 3 and tree2.P == 1
    assert tree2.root == node


def test_tree_compute_split_on_left_context():
    # pdf depends on whether the LEFT phone is in {2, 3}
    root = (
        "te", 1,  # split on center phone
        [
            None,
            ("se", 0, frozenset({2, 3}), ("ce", 10), ("ce", 11)),  # phone 1
            ("ce", 20),  # phone 2
        ],
    )
    tree = ContextDependencyTree(N=3, P=1, root=root)
    assert tree.compute((2, 1, 0), 0) == 10  # left in yes-set
    assert tree.compute((5, 1, 0), 0) == 11
    assert tree.compute((0, 2, 1), 0) == 20
    assert tree.compute((0, 3, 1), 0) is None  # phone 3 unmapped


def test_monophone_tree_matches_tuples():
    from rhasspy_speech_tpu.io.transition_model import KaldiTransitionModel

    ktm = KaldiTransitionModel.from_monophone_chain(4)
    tree = ContextDependencyTree.monophone_from_tuples(
        ktm.tuples, max_phone=4
    )
    for row in ktm.tuples:
        phone, _s, fwd, slf = (int(x) for x in row)
        assert tree.compute((phone,), 0) == fwd
        assert tree.compute((phone,), 1) == slf


def test_triphone_hclg_decodes(tmp_path):
    """Tree-based expansion on a synthetic profile decodes exactly like the
    monophone path when the tree is context-independent."""
    from rhasspy_speech_tpu.graph.context import make_hclg_from_tree
    from rhasspy_speech_tpu.graph.dense import dense_from_hclg
    from rhasspy_speech_tpu.io.nnet3_file import read_am_nnet3
    from rhasspy_speech_tpu.fst.core import SymbolTable
    from rhasspy_speech_tpu.ops.decoder import (
        DeviceGraph,
        trace_to_words,
        viterbi_decode,
    )
    from rhasspy_speech_tpu.pipeline import lang_dir_name
    from rhasspy_speech_tpu.pipeline.transcribe import AcousticModel
    from rhasspy_speech_tpu.const import LangSuffix
    from rhasspy_speech_tpu.pipeline.train import train_model_sync
    from rhasspy_speech_tpu.testing import build_synthetic_profile, synthesize_sentence
    from rhasspy_speech_tpu.grammar import Intents, compile_intents
    from rhasspy_speech_tpu.lang import make_grammar_g, make_lg, prepare_lang
    from rhasspy_speech_tpu.lexicon.g2p import LexiconDatabase

    lexicon = {"yes": ["y", "eh", "s"], "no": ["n", "ow"]}
    profile = build_synthetic_profile(tmp_path / "model", lexicon)

    # tree equivalent to the profile's transition model, as a real N=3 tree
    # that ignores context (TE on center position only)
    ktm, _spec = read_am_nnet3(str(tmp_path / "model" / "model" / "final.mdl"))
    with open(tmp_path / "model" / "model" / "phones.txt", encoding="utf-8") as f:
        model_phones = SymbolTable.read_text(f)
    tree = ContextDependencyTree.monophone_from_tuples(
        ktm.tuples, max_phone=int(ktm.tuples[:, 0].max()), n=3, p=1
    )

    # build LG for the grammar
    import io as _io

    intents = Intents.from_dict(
        {"language": "en",
         "intents": {"M": {"data": [{"sentences": ["yes", "no"]}]}}}
    )
    lex = LexiconDatabase()
    for w, p in lexicon.items():
        lex.add(w, [p])
    ctx = compile_intents(intents, _io.StringIO(), lex, number_language="en")
    entries = [(w, p) for w, p in sorted(lexicon.items())]
    entries.append(("<unk>", ["SPN"]))
    lang = prepare_lang(entries, silence_phones=["SIL", "SPN"])
    g = make_grammar_g(ctx.fst_file, lang.words)
    lg = make_lg(lang, g)

    hclg, num_pdfs = make_hclg_from_tree(lang, lg, tree, ktm, model_phones)
    graph = dense_from_hclg(hclg, num_pdfs)
    dev = DeviceGraph.from_dense(graph)

    am = AcousticModel(tmp_path / "model")
    for i, text in enumerate(["yes", "no"]):
        pcm = synthesize_sentence(profile, text, seed=i)
        feats = am.features(pcm[None])
        n_out = feats.shape[1] // 3
        lp = am.log_probs(feats, n_out)
        trace, fstate, cost = viterbi_decode(dev, lp)
        words, _ = trace_to_words(
            graph, np.asarray(trace), np.asarray(fstate), np.asarray(cost), 0
        )
        assert words is not None
        got = " ".join(
            lang.words.find_id(w) for w in words
            if lang.words.find_id(w) not in ("<eps>",)
        )
        assert got == text, (got, text)


def test_train_model_uses_tree(tmp_path):
    """train_model picks up model/tree and produces a working graph."""
    from rhasspy_speech_tpu.const import LangSuffix
    from rhasspy_speech_tpu.io.nnet3_file import read_am_nnet3
    from rhasspy_speech_tpu.pipeline import Nnet3WavTranscriber, lang_dir_name
    from rhasspy_speech_tpu.pipeline.train import train_model_sync
    from rhasspy_speech_tpu.testing import (
        build_synthetic_profile,
        synthesize_sentence,
    )

    lexicon = {"open": ["ow", "p"], "close": ["k", "l", "z"]}
    profile = build_synthetic_profile(tmp_path / "model", lexicon)
    ktm, _ = read_am_nnet3(str(tmp_path / "model" / "model" / "final.mdl"))
    tree = ContextDependencyTree.monophone_from_tuples(
        ktm.tuples, max_phone=int(ktm.tuples[:, 0].max()), n=3, p=1
    )
    tree.save(str(tmp_path / "model" / "model" / "tree"))

    train_dir = tmp_path / "train"
    train_model_sync(
        "en",
        {"language": "en",
         "intents": {"M": {"data": [{"sentences": ["(open|close)"]}]}}},
        train_dir,
        profile.model_dir,
        lang_suffixes=[LangSuffix.GRAMMAR],
    )
    t = Nnet3WavTranscriber(
        profile.model_dir, train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    )
    for i, text in enumerate(["open", "close"]):
        pcm = synthesize_sentence(profile, text, seed=i)
        assert t.transcribe_pcm_batch([pcm])[0] == [text]


def test_biphone_hclg_decodes(tmp_path):
    """Left-biphone (N=2,P=1) and right-biphone (N=2,P=0) windows expand
    and decode exactly (context-independent tree == monophone answers)."""
    import io as _io

    from rhasspy_speech_tpu.fst.core import SymbolTable
    from rhasspy_speech_tpu.graph.context import make_hclg_from_tree
    from rhasspy_speech_tpu.graph.dense import dense_from_hclg
    from rhasspy_speech_tpu.grammar import Intents, compile_intents
    from rhasspy_speech_tpu.io.nnet3_file import read_am_nnet3
    from rhasspy_speech_tpu.lang import make_grammar_g, make_lg, prepare_lang
    from rhasspy_speech_tpu.lexicon.g2p import LexiconDatabase
    from rhasspy_speech_tpu.ops.decoder import (
        DeviceGraph,
        trace_to_words,
        viterbi_decode,
    )
    from rhasspy_speech_tpu.pipeline.transcribe import AcousticModel
    from rhasspy_speech_tpu.testing import (
        build_synthetic_profile,
        synthesize_sentence,
    )

    lexicon = {"yes": ["y", "eh", "s"], "no": ["n", "ow"]}
    profile = build_synthetic_profile(tmp_path / "model", lexicon)
    ktm, _spec = read_am_nnet3(str(tmp_path / "model" / "model" / "final.mdl"))
    with open(tmp_path / "model" / "model" / "phones.txt", encoding="utf-8") as f:
        model_phones = SymbolTable.read_text(f)

    intents = Intents.from_dict(
        {"language": "en",
         "intents": {"M": {"data": [{"sentences": ["yes", "no"]}]}}}
    )
    lex = LexiconDatabase()
    for w, p in lexicon.items():
        lex.add(w, [p])
    ctx = compile_intents(intents, _io.StringIO(), lex, number_language="en")
    entries = [(w, p) for w, p in sorted(lexicon.items())]
    entries.append(("<unk>", ["SPN"]))
    lang = prepare_lang(entries, silence_phones=["SIL", "SPN"])
    g = make_grammar_g(ctx.fst_file, lang.words)
    lg = make_lg(lang, g)
    am = AcousticModel(tmp_path / "model")

    for n, p in ((2, 1), (2, 0)):
        tree = ContextDependencyTree.monophone_from_tuples(
            ktm.tuples, max_phone=int(ktm.tuples[:, 0].max()), n=n, p=p
        )
        hclg, num_pdfs = make_hclg_from_tree(lang, lg, tree, ktm, model_phones)
        graph = dense_from_hclg(hclg, num_pdfs)
        dev = DeviceGraph.from_dense(graph)
        for i, text in enumerate(["yes", "no"]):
            pcm = synthesize_sentence(profile, text, seed=i)
            feats = am.features(pcm[None])
            lp = am.log_probs(feats, feats.shape[1] // 3)
            trace, fstate, cost = viterbi_decode(dev, lp)
            words, _ = trace_to_words(
                graph, np.asarray(trace), np.asarray(fstate),
                np.asarray(cost), 0,
            )
            assert words is not None, (n, p, text)
            got = " ".join(
                lang.words.find_id(w) for w in words
                if lang.words.find_id(w) not in ("<eps>",)
            )
            assert got == text, (n, p, got, text)


def test_biphone_expansion_uses_true_left_context(tmp_path):
    """With an N=2/P=1 tree that splits on the left phone, the expansion
    must query the REAL predecessor: 'eh' only ever follows 'y' in this
    grammar, so the left=y pdfs appear and the fallback pdf never does."""
    import io as _io

    from rhasspy_speech_tpu.fst.core import SymbolTable
    from rhasspy_speech_tpu.graph.context import make_hclg_from_tree
    from rhasspy_speech_tpu.grammar import Intents, compile_intents
    from rhasspy_speech_tpu.io.nnet3_file import read_am_nnet3
    from rhasspy_speech_tpu.lang import make_grammar_g, make_lg, prepare_lang
    from rhasspy_speech_tpu.lexicon.g2p import LexiconDatabase
    from rhasspy_speech_tpu.testing import build_synthetic_profile

    lexicon = {"yes": ["y", "eh", "s"], "no": ["n", "ow"]}
    profile = build_synthetic_profile(tmp_path / "model", lexicon)
    ktm, _ = read_am_nnet3(str(tmp_path / "model" / "model" / "final.mdl"))
    with open(tmp_path / "model" / "model" / "phones.txt", encoding="utf-8") as f:
        model_phones = SymbolTable.read_text(f)

    base = ContextDependencyTree.monophone_from_tuples(
        ktm.tuples, max_phone=int(ktm.tuples[:, 0].max()), n=2, p=1
    )
    m_eh = model_phones.find("eh_I")
    m_y = model_phones.find("y_B")
    assert m_eh is not None and m_y is not None
    FAKE = 9999
    _, key, table = base.root
    table = list(table)
    # eh_I: keep real pdfs when left == y_B, else a sentinel pdf
    table[m_eh] = ("se", 0, frozenset({m_y}), table[m_eh], ("ce", FAKE))
    tree = ContextDependencyTree(N=2, P=1, root=("te", key, table))

    intents = Intents.from_dict(
        {"language": "en",
         "intents": {"M": {"data": [{"sentences": ["yes", "no"]}]}}}
    )
    lex = LexiconDatabase()
    for w, p in lexicon.items():
        lex.add(w, [p])
    ctx = compile_intents(intents, _io.StringIO(), lex, number_language="en")
    entries = [(w, p) for w, p in sorted(lexicon.items())]
    entries.append(("<unk>", ["SPN"]))
    lang = prepare_lang(entries, silence_phones=["SIL", "SPN"])
    lg = make_lg(lang, make_grammar_g(ctx.fst_file, lang.words))

    hclg, _num = make_hclg_from_tree(lang, lg, tree, ktm, model_phones)
    ilabels = {il for arcs in hclg.arcs for il, _, _, _ in arcs}
    # the real eh pdfs (left=y path) must be present...
    real_eh = base.compute((0, m_eh), 0)
    assert real_eh + 1 in ilabels
    # ...and the wrong-left sentinel must never have been queried
    assert FAKE + 1 not in ilabels


def test_quinphone_hclg_decodes(tmp_path):
    """Wide context windows (N=5/P=2 quinphone, N=4/P=1) expand via the
    general pending-FIFO construction and decode exactly when the tree is
    context-independent."""
    import io as _io

    from rhasspy_speech_tpu.fst.core import SymbolTable
    from rhasspy_speech_tpu.graph.context import make_hclg_from_tree
    from rhasspy_speech_tpu.graph.dense import dense_from_hclg
    from rhasspy_speech_tpu.grammar import Intents, compile_intents
    from rhasspy_speech_tpu.io.nnet3_file import read_am_nnet3
    from rhasspy_speech_tpu.lang import make_grammar_g, make_lg, prepare_lang
    from rhasspy_speech_tpu.lexicon.g2p import LexiconDatabase
    from rhasspy_speech_tpu.ops.decoder import (
        DeviceGraph,
        trace_to_words,
        viterbi_decode,
    )
    from rhasspy_speech_tpu.pipeline.transcribe import AcousticModel
    from rhasspy_speech_tpu.testing import (
        build_synthetic_profile,
        synthesize_sentence,
    )

    lexicon = {"yes": ["y", "eh", "s"], "no": ["n", "ow"]}
    profile = build_synthetic_profile(tmp_path / "model", lexicon)
    ktm, _spec = read_am_nnet3(str(tmp_path / "model" / "model" / "final.mdl"))
    with open(tmp_path / "model" / "model" / "phones.txt", encoding="utf-8") as f:
        model_phones = SymbolTable.read_text(f)

    intents = Intents.from_dict(
        {"language": "en",
         "intents": {"M": {"data": [{"sentences": ["yes", "no"]}]}}}
    )
    lex = LexiconDatabase()
    for w, p in lexicon.items():
        lex.add(w, [p])
    ctx = compile_intents(intents, _io.StringIO(), lex, number_language="en")
    entries = [(w, p) for w, p in sorted(lexicon.items())]
    entries.append(("<unk>", ["SPN"]))
    lang = prepare_lang(entries, silence_phones=["SIL", "SPN"])
    g = make_grammar_g(ctx.fst_file, lang.words)
    lg = make_lg(lang, g)
    am = AcousticModel(tmp_path / "model")

    for n, p in ((5, 2), (4, 1)):
        tree = ContextDependencyTree.monophone_from_tuples(
            ktm.tuples, max_phone=int(ktm.tuples[:, 0].max()), n=n, p=p
        )
        hclg, num_pdfs = make_hclg_from_tree(lang, lg, tree, ktm, model_phones)
        graph = dense_from_hclg(hclg, num_pdfs)
        dev = DeviceGraph.from_dense(graph)
        for i, text in enumerate(["yes", "no"]):
            pcm = synthesize_sentence(profile, text, seed=i)
            feats = am.features(pcm[None])
            lp = am.log_probs(feats, feats.shape[1] // 3)
            trace, fstate, cost = viterbi_decode(dev, lp)
            words, _ = trace_to_words(
                graph, np.asarray(trace), np.asarray(fstate),
                np.asarray(cost), 0,
            )
            assert words is not None, (n, p, text)
            got = " ".join(
                lang.words.find_id(w) for w in words
                if lang.words.find_id(w) not in ("<eps>",)
            )
            assert got == text, (n, p, got, text)


def test_quinphone_expansion_uses_true_wide_context(tmp_path):
    """N=5/P=2 expansion must query the REAL phones two positions away:
    in 'yes' (y eh s), s's left-2 phone is always y and y's right-2 phone
    is always s, so trees splitting on window positions 0 and 4 must emit
    the real pdfs and never the wrong-context sentinel."""
    import io as _io

    from rhasspy_speech_tpu.fst.core import SymbolTable
    from rhasspy_speech_tpu.graph.context import make_hclg_from_tree
    from rhasspy_speech_tpu.grammar import Intents, compile_intents
    from rhasspy_speech_tpu.io.nnet3_file import read_am_nnet3
    from rhasspy_speech_tpu.lang import make_grammar_g, make_lg, prepare_lang
    from rhasspy_speech_tpu.lexicon.g2p import LexiconDatabase
    from rhasspy_speech_tpu.testing import build_synthetic_profile

    lexicon = {"yes": ["y", "eh", "s"], "no": ["n", "ow"]}
    profile = build_synthetic_profile(tmp_path / "model", lexicon)
    ktm, _ = read_am_nnet3(str(tmp_path / "model" / "model" / "final.mdl"))
    with open(tmp_path / "model" / "model" / "phones.txt", encoding="utf-8") as f:
        model_phones = SymbolTable.read_text(f)

    base = ContextDependencyTree.monophone_from_tuples(
        ktm.tuples, max_phone=int(ktm.tuples[:, 0].max()), n=5, p=2
    )
    m_y = model_phones.find("y_B")
    m_s = model_phones.find("s_E")
    assert m_y is not None and m_s is not None
    FAKE = 9999
    _, key, table = base.root
    table = list(table)
    # s_E: real pdfs only when window[0] (left-2) == y_B
    table[m_s] = ("se", 0, frozenset({m_y}), table[m_s], ("ce", FAKE))
    # y_B: real pdfs only when window[4] (right-2) == s_E
    table[m_y] = ("se", 4, frozenset({m_s}), table[m_y], ("ce", FAKE))
    tree = ContextDependencyTree(N=5, P=2, root=("te", key, table))

    intents = Intents.from_dict(
        {"language": "en",
         "intents": {"M": {"data": [{"sentences": ["yes", "no"]}]}}}
    )
    lex = LexiconDatabase()
    for w, p in lexicon.items():
        lex.add(w, [p])
    ctx = compile_intents(intents, _io.StringIO(), lex, number_language="en")
    entries = [(w, p) for w, p in sorted(lexicon.items())]
    entries.append(("<unk>", ["SPN"]))
    lang = prepare_lang(entries, silence_phones=["SIL", "SPN"])
    lg = make_lg(lang, make_grammar_g(ctx.fst_file, lang.words))

    hclg, _num = make_hclg_from_tree(lang, lg, tree, ktm, model_phones)
    ilabels = {il for arcs in hclg.arcs for il, _, _, _ in arcs}
    real_s = base.compute((0, 0, m_s, 0, 0), 0)
    real_y = base.compute((0, 0, m_y, 0, 0), 0)
    assert real_s + 1 in ilabels
    assert real_y + 1 in ilabels
    assert FAKE + 1 not in ilabels
