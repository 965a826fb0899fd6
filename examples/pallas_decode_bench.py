"""A/B the fused Pallas decode kernel vs the dense XLA scan at flagship scale.

Builds the bench flagship graph (full test_en 3-gram ARPA triphone-expanded,
14k states / 38k arcs / 3072 pdfs) and times viterbi_pallas against
viterbi (dense scan) at serving batch sizes, plus verifies transcript-level
equality of the argmin/backtrace inputs on the first batch.

NOTE: on real TPUs the full-width tier kernel is gated to single-vreg
graphs (S_pad <= 128, see ops/pallas_decoder.py docstring); at flagship
scale this script reports the gate and times the dense XLA scan alone.
The multi-vreg windowed decomposition's measured cost model lives in
examples/pallas_windowed_cost.py (176 ms vs 198 ms at B=512).

Usage: python examples/pallas_decode_bench.py [B ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import NUM_PDFS, build_graph_and_fuzzy
from rhasspy_speech_tpu.ops.decoder import make_decode_graph, viterbi
from rhasspy_speech_tpu.ops.pallas_decoder import (
    PallasDecodeGraph,
    viterbi_pallas,
)
from rhasspy_speech_tpu.utils.compile_cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    batches = [int(x) for x in sys.argv[1:]] or [128, 512]
    T = 116  # bench n_out for 10s audio at subsampling 3

    graph, _, _, tree_pdfs = build_graph_and_fuzzy()
    graph.num_pdfs = max(NUM_PDFS, tree_pdfs)
    print(
        f"graph: {graph.num_states} states, {graph.num_arcs} arcs, "
        f"{graph.num_pdfs} pdfs"
    )

    dev = make_decode_graph(graph)
    pg = PallasDecodeGraph.from_dense(graph)
    print(
        f"pallas layout: S_pad={pg.s_pad} width={pg.width} "
        f"hub_passes={pg.n_hub_passes} h_pad={pg.h_pad}"
    )

    interp = jax.default_backend() != "tpu"
    rng = np.random.RandomState(0)

    jit_dense = jax.jit(
        lambda lp: viterbi(dev, lp, 1.0, compact_bp=True)
    )
    jit_pallas = jax.jit(
        lambda lp: viterbi_pallas(pg, lp, 1.0, compact_bp=True,
                                  interpret=interp)
    )

    for B in batches:
        lp = jnp.asarray(
            rng.randn(B, T, graph.num_pdfs).astype(np.float32)
        )

        t0 = time.time()
        a_d, b_d = jit_dense(lp)
        jax.block_until_ready((a_d, b_d))
        c_dense = time.time() - t0
        lanes = [("dense", jit_dense)]
        try:
            t0 = time.time()
            a_p, b_p = jit_pallas(lp)
            jax.block_until_ready((a_p, b_p))
            c_pal = time.time() - t0
        except ValueError as e:
            print(f"B={B}: pallas gated ({e}); timing dense only "
                  f"(compile dense {c_dense:.1f}s)")
        else:
            S = graph.num_states
            eq_a = bool(jnp.array_equal(a_p[:, :S], a_d))
            eq_b = bool(jnp.array_equal(b_p[:, :, :S], b_d))
            print(f"B={B}: equal alpha={eq_a} bp={eq_b} "
                  f"(compile dense {c_dense:.1f}s pallas {c_pal:.1f}s)")
            lanes.append(("pallas", jit_pallas))

        for name, fn in lanes:
            times = []
            for _ in range(5):
                t1 = time.time()
                out = fn(lp)
                jax.block_until_ready(out)
                times.append(time.time() - t1)
            print(f"  {name:7s} B={B}: {min(times)*1000:8.1f} ms (min of 5)")


if __name__ == "__main__":
    main()
