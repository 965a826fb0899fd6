"""Frontier accuracy-vs-K on the genuinely-truncating rescore graph.

Builds the full test_en grammar's order-N ARPA decode graph through the
triphone machinery (the graph class VERDICT r2 flagged as uncharacterized
under pruning), then decodes random acoustics with the exact dense kernel
and the top-K frontier across K, reporting per-K cost regret and
best-path agreement — the documented accuracy-vs-K curve.

Run (CPU is fine; graph build is host-side):
    JAX_PLATFORMS=cpu python examples/frontier_curve.py [order] [T] [B]
"""

import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    try:
        import os

        if os.environ.get("JAX_PLATFORMS", "") == "cpu":
            # the TPU plugin rewrites the selection at startup; re-pin so
            # jax.devices() never touches the tunnel backend
            jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass

    import yaml

    from rhasspy_speech_tpu.grammar import Intents, compile_intents
    from rhasspy_speech_tpu.graph.context import make_hclg_from_tree
    from rhasspy_speech_tpu.graph.dense import dense_from_hclg
    from rhasspy_speech_tpu.io.transition_model import KaldiTransitionModel
    from rhasspy_speech_tpu.io.tree import ContextDependencyTree
    from rhasspy_speech_tpu.lang import make_grammar_g, make_lg, prepare_lang
    from rhasspy_speech_tpu.lang.ngram import arpa_to_fst, make_arpa_from_fst
    from rhasspy_speech_tpu.lexicon import LexiconDatabase
    from rhasspy_speech_tpu.ops.decoder import make_decode_graph, viterbi_decode
    from rhasspy_speech_tpu.ops.frontier import FrontierGraph, viterbi_topk

    yaml_path = "/root/reference/tests/test_en.yaml"
    raw = yaml.safe_load(open(yaml_path, encoding="utf-8"))
    intents = Intents.from_dict(
        {
            "language": "en",
            "intents": {"All": {"data": [{"sentences": raw["sentences"]}]}},
            "lists": raw.get("lists", {}),
        }
    )
    ctx = compile_intents(
        intents, io.StringIO(), LexiconDatabase(), number_language="en"
    )

    def pron(w):
        return [c for c in re.sub(r"[^a-z0-9]", "", w.lower())] or ["x"]

    entries = [(w, pron(w)) for w in sorted(ctx.vocab)]
    lang = prepare_lang(entries, silence_phones=["SIL", "SPN"])
    ctx.fst_file.seek(0)
    g_grammar = make_grammar_g(ctx.fst_file, lang.words)
    arpa = make_arpa_from_fst(g_grammar, order=order, symbols=lang.words)
    g = arpa_to_fst(arpa, lang.words)
    lg = make_lg(lang, g)
    max_phone = max(
        pid for (p, pid) in lang.phones if pid != 0 and not p.startswith("#")
    )
    ktm = KaldiTransitionModel.from_monophone_chain(max_phone)
    tree = ContextDependencyTree.monophone_from_tuples(
        ktm.tuples, max_phone=max_phone, n=3, p=1
    )
    hclg, num_pdfs = make_hclg_from_tree(lang, lg, tree, ktm, lang.phones)
    graph = dense_from_hclg(hclg, num_pdfs)
    print(
        f"order-{order} graph: {graph.num_states} states / "
        f"{graph.num_arcs} arcs / {graph.num_pdfs} pdfs"
    )

    rng = np.random.RandomState(0)
    import jax.numpy as jnp

    lp = jnp.asarray(rng.randn(B, T, graph.num_pdfs).astype(np.float32))

    trace, fstate, exact_cost = viterbi_decode(make_decode_graph(graph), lp)
    exact_cost = np.asarray(exact_cost)
    exact_trace = np.asarray(trace)

    fg = FrontierGraph.from_dense(graph)
    from rhasspy_speech_tpu.graph.dense import NEG_INF_F32

    print(f"{'K':>7} {'max regret':>12} {'mean regret':>12} {'path match':>11}")
    for k in (64, 256, 1024, 4096, 7000, min(graph.num_states, 20000)):
        states_t, alphas_t, arcs_t = viterbi_topk(
            fg, lp, k, beam=24.0, min_active=200
        )
        states_np = np.asarray(states_t)
        alphas_np = np.asarray(alphas_t)
        arcs_np = np.asarray(arcs_t)
        last = states_np[-1]
        totals = np.where(
            last >= 0,
            alphas_np[-1] + graph.final_weight[np.maximum(last, 0)],
            NEG_INF_F32,
        )
        cost_k = totals.min(axis=1)
        regret = cost_k - exact_cost
        # optimal-path recovery rate: frontier cost == exact cost
        agree = float((regret <= 1e-3).mean())
        print(
            f"{k:>7} {regret.max():>12.4f} {regret.mean():>12.4f} "
            f"{agree:>10.0%}"
        )


if __name__ == "__main__":
    main()
