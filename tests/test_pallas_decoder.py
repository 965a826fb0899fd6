"""Fused Pallas decode kernel vs the XLA decode layouts.

Interpret mode on CPU pins the kernel's semantics (bit-exact alpha,
backpointers, and tie-breaks vs ops/decoder.viterbi); the same tests run
compiled on a real chip under RSTPU_TPU_TESTS=1.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from rhasspy_speech_tpu.graph.dense import NEG_INF_F32
from rhasspy_speech_tpu.ops.decoder import (
    STAY,
    make_decode_graph,
    viterbi,
)
from rhasspy_speech_tpu.ops.pallas_decoder import (
    PallasDecodeGraph,
    viterbi_pallas,
)

from test_decoder import _hubby_graph, _make_src_pdf_graph, _random_graph

INTERPRET = not bool(os.environ.get("RSTPU_TPU_TESTS"))


def _compare(dense, B=16, T=9, lengths=None, compact=False, width=2, seed=0,
             interpret=None):
    rng = np.random.RandomState(seed + 100)
    log_probs = jnp.asarray(
        rng.randn(B, T, dense.num_pdfs).astype(np.float32)
    )
    lens = None if lengths is None else jnp.asarray(lengths, jnp.int32)

    ref_graph = make_decode_graph(dense)
    ref_alpha, ref_bps = viterbi(
        ref_graph, log_probs, 0.7, lengths=lens, compact_bp=compact
    )

    pg = PallasDecodeGraph.from_dense(dense, width=width)
    alpha, bps = viterbi_pallas(
        pg, log_probs, 0.7, lengths=lens, compact_bp=compact,
        interpret=INTERPRET if interpret is None else interpret,
    )
    S = dense.num_states
    np.testing.assert_array_equal(
        np.asarray(alpha)[:, :S], np.asarray(ref_alpha)
    )
    np.testing.assert_array_equal(
        np.asarray(bps)[:, :, :S], np.asarray(ref_bps)
    )
    # pad states stay dead
    pad = np.asarray(alpha)[:, S:]
    assert (pad >= NEG_INF_F32).all()
    return np.asarray(bps)


def test_matches_xla_layout_exactly():
    rng = np.random.RandomState(7)
    dense = _make_src_pdf_graph(rng, num_states=23, extra_arcs=70)
    _compare(dense, seed=1)


def test_hub_rounds_and_inverse_gather():
    rng = np.random.RandomState(11)
    dense = _hubby_graph(rng, num_states=40)
    pg = PallasDecodeGraph.from_dense(dense, width=2)
    assert pg.n_hub_passes >= 1  # hubs actually packed
    _compare(dense, width=2, seed=2)


def test_lengths_masking_and_compact_bp():
    rng = np.random.RandomState(13)
    dense = _hubby_graph(rng, num_states=31)
    lengths = [9, 0, 4, 7, 1, 9, 3, 5, 2, 8, 6, 9, 4, 0, 7, 5]
    bps = _compare(dense, lengths=lengths, compact=True, seed=3)
    # masked frames encode STAY (=0 compact) exactly
    assert (bps[5, 2, :] == 0).all()  # lane 2 ended at t=4
    assert (bps[0, 1, :] == 0).all()  # lane 1 never active


def test_lengths_masking_int32_bp():
    rng = np.random.RandomState(17)
    dense = _make_src_pdf_graph(rng, num_states=19, extra_arcs=40)
    lengths = [5, 3, 7, 1] * 4
    bps = _compare(dense, lengths=lengths, compact=False, seed=4)
    assert (bps[6, 1, :] == STAY).all()


def test_tie_break_is_min_arc_id():
    """Equal-cost parallel arcs: the kernel must pick the minimum arc id,
    matching the XLA layouts' global tie-break."""
    rng = np.random.RandomState(19)
    dense = _make_src_pdf_graph(rng, num_states=12, extra_arcs=20)
    # duplicate several arcs verbatim (same src/dst/pdf/weight, higher id)
    dense.arc_src = np.concatenate([dense.arc_src, dense.arc_src[:8]])
    dense.arc_dst = np.concatenate([dense.arc_dst, dense.arc_dst[:8]])
    dense.arc_pdf = np.concatenate([dense.arc_pdf, dense.arc_pdf[:8]])
    dense.arc_weight = np.concatenate([dense.arc_weight, dense.arc_weight[:8]])
    dense.arc_wseq = np.concatenate([dense.arc_wseq, dense.arc_wseq[:8]])
    _compare(dense, seed=5)
    _compare(dense, compact=True, seed=6)


def test_rejects_unfolded_graph():
    rng = np.random.RandomState(23)
    dense = _random_graph(rng, num_states=10, extra_arcs=25)
    dense.arc_pdf = dense.arc_pdf.copy()
    dense.arc_pdf[0] = 1
    dense.arc_pdf[1] = 2
    dense.arc_src[1] = dense.arc_src[0]
    with pytest.raises(ValueError, match="pdf-per-source"):
        PallasDecodeGraph.from_dense(dense)


def test_compiled_mode_gated_to_single_vreg():
    """Multi-vreg graphs (S_pad > 128) must raise loudly in compiled mode:
    Mosaic's dynamic_gather cannot lower them (see module docstring)."""
    rng = np.random.RandomState(31)
    dense = _make_src_pdf_graph(rng, num_states=150, extra_arcs=60)
    pg = PallasDecodeGraph.from_dense(dense)
    assert pg.s_pad > 128
    log_probs = jnp.zeros((16, 4, dense.num_pdfs), jnp.float32)
    with pytest.raises(ValueError, match="single-vreg"):
        viterbi_pallas(pg, log_probs, interpret=False)
    # interpret mode stays exact at any width
    _compare(dense, seed=7, interpret=True)


def test_rejects_bad_batch():
    rng = np.random.RandomState(29)
    dense = _make_src_pdf_graph(rng, num_states=10, extra_arcs=20)
    pg = PallasDecodeGraph.from_dense(dense)
    log_probs = jnp.zeros((10, 4, dense.num_pdfs), jnp.float32)
    with pytest.raises(ValueError, match="B % 16"):
        viterbi_pallas(pg, log_probs, interpret=INTERPRET)
