"""Fused Pallas decode-relaxation kernel: VMEM-resident alpha.

The XLA decode layouts (ops/decoder.py) relax one frame per ``lax.scan``
step; alpha [B, S] and every tier intermediate round-trips HBM each frame —
~68% of the batch step at B=512 on the flagship graph (VERDICT r3 item 3).
Measured roofline (examples/decode_roofline.py on a v5e, B=512/T=298,
XLA cost_analysis bytes + wall time): the decode scan achieves **87.5 GB/s
= 10.7% of HBM peak** (alpha-only forward: 7.8%), so it is NOT
bandwidth-bound — it is overhead/latency-bound in the per-frame scan step
(the AM forward on the same step runs at 79% of HBM peak for contrast).
This kernel keeps alpha resident in
VMEM across ALL frames of a stream block: per frame the only HBM traffic
is the [16, P] acoustic row in (auto-pipelined by Pallas through the grid)
and the [16, S] backpointer row out — ~0.7 MB/frame at the flagship sizes
vs the hundreds of MB the scan version streams.

Replaces the hot loop of Kaldi's LatticeFasterDecoder
(kaldi/src/decoder/lattice-faster-decoder.cc:714-820, ProcessEmitting's
per-token arc relaxation) — redesigned as a dense min-plus relaxation over
static-index in-VMEM gathers (``tpu.dynamic_gather`` via
``jnp.take_along_axis``), not a port of the token list machinery.

Tier layout (PallasDecodeGraph.from_dense), mirroring the candidate set of
the XLA layouts exactly (every in-arc of every state appears in exactly one
tier slot, merges carry (cost, arc id) lexicographically, so the winner is
the global (cost, min-arc-id) — bit-identical to viterbi_step_selfloop /
viterbi_step_hybrid including the tie-break):

- **self lane**: each state's self-loop arc relaxes elementwise (no gather);
- **slot tiers** (width W, default 4): the k-th remaining in-arc of every
  state, one [16, S_pad] gather per tier;
- **hub rounds**: states with more than W remaining in-arcs (the LM
  word-boundary hubs; 594 states / max in-degree 100 on the flagship
  graph) pack their overflow arcs into dense rounds of H_pad columns,
  ``rounds_per_pass = S_pad // H_pad`` rounds riding each [16, S_pad]
  gather pass; round results merge into the first H_pad columns of a
  scratch and re-enter the per-state merge through one inverse gather
  (hubpos[s] = the hub's column, or an always-INF pad column).

Requires the pdf-per-source fold (decoder._state_pdf) — true for Kaldi HMM
graphs — so the acoustic gather is one [16, S_pad] pass per frame.

**Status: experimental, single-vreg graphs only on real TPUs.** Mosaic's
``tpu.dynamic_gather`` lowers in-VMEM gathers only when the source spans a
single vreg along the gather axis ("Not implemented: Multiple source vregs
along gather dimension"), i.e. S_pad <= 128. The flagship graph is
S_pad=14208, so this kernel raises on real hardware there (and is exact but
slow in interpret mode). The multi-vreg decomposition WAS prototyped and
measured on a v5e chip at flagship scale (examples/pallas_windowed_cost.py):
windowed relaxation — arcs bucketed into (dest 128-block, source 128-window)
steps, 128-aligned slices + within-vreg gathers, register-carried running
min — runs the realistic ~1280 steps/frame at **176 ms** per B=512/T=116
decode vs the XLA dense scan's **198 ms**: an ~11% win, bounded by ~70
cycles/step of loop/index overhead rather than bandwidth, and an 8-wide
unrolled variant blew Mosaic compile time past 9 minutes. The honest
conclusion recorded here: at current Mosaic capabilities the fused-VMEM
decode kernel does not beat XLA's scan by enough to carry its complexity;
the dense XLA layouts (ops/decoder.py, five A/B'd variants) remain the
production path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph.dense import NEG_INF_F32, DenseGraph
from .decoder import _COMPACT_BP_MAX_ARC, STAY, DeviceGraph, _state_pdf

INF = np.float32(NEG_INF_F32)
LANE = 128
SUBLANE = 16  # B-block rows: 16 satisfies f32/i32 (8) and uint16 (16) tiles


def _pad128(n: int) -> int:
    return max(((n + LANE - 1) // LANE) * LANE, LANE)


@dataclass(frozen=True)
class PallasDecodeGraph:
    """Decode layout for the fused Pallas kernel.

    ``base`` is a DeviceGraph whose init/final tensors are padded to S_pad
    (pad states carry INF weights), so every downstream consumer of
    ``viterbi`` outputs (argmin over states, on-device backtrace, host word
    assembly) works unchanged on the padded width.
    """

    base: DeviceGraph
    num_real_states: int
    s_pad: int
    width: int
    n_hub_passes: int
    h_pad: int
    # host-side tables, shipped to the kernel per call (jnp conversion is
    # cached on first use)
    self_weight: np.ndarray  # f32 [1, S_pad]
    self_arc: np.ndarray  # i32 [1, S_pad] (A where none)
    slot_src: np.ndarray  # i32 [W, S_pad]
    slot_weight: np.ndarray  # f32 [W, S_pad]
    slot_arc: np.ndarray  # i32 [W, S_pad]
    pack_src: np.ndarray  # i32 [HP, S_pad]
    pack_weight: np.ndarray  # f32 [HP, S_pad]
    pack_arc: np.ndarray  # i32 [HP, S_pad]
    hubpos: np.ndarray  # i32 [1, S_pad]
    src_pdf: np.ndarray  # i32 [1, S_pad]
    init_w: np.ndarray  # f32 [1, S_pad]

    @staticmethod
    def from_dense(g: DenseGraph, width: int = 4) -> "PallasDecodeGraph":
        sp = _state_pdf(g)
        if sp is None:
            raise ValueError(
                "PallasDecodeGraph requires the pdf-per-source fold "
                "(arc pdfs must be a function of the source state)"
            )
        S, A = g.num_states, g.num_arcs
        S_pad = _pad128(S)

        # per-state in-arc lists in ascending arc-id order
        order = np.argsort(g.arc_dst, kind="stable")
        dst_sorted = g.arc_dst[order].astype(np.int64)
        indeg = np.bincount(dst_sorted, minlength=S)
        starts = np.concatenate([[0], np.cumsum(indeg)[:-1]])

        self_w = np.full(S_pad, INF, np.float32)
        self_a = np.full(S_pad, A, np.int32)
        slot_src = np.zeros((width, S_pad), np.int32)
        slot_w = np.full((width, S_pad), INF, np.float32)
        slot_a = np.full((width, S_pad), A, np.int32)

        # residual (non-self-lane) arcs per state, ascending arc id
        resid_lists = []
        max_resid = 0
        for s in range(S):
            arcs = order[starts[s] : starts[s] + indeg[s]]
            rem = []
            took_self = False
            for a in arcs:
                if not took_self and g.arc_src[a] == s:
                    self_w[s] = g.arc_weight[a]
                    self_a[s] = a
                    took_self = True
                else:
                    rem.append(int(a))
            for k, a in enumerate(rem[:width]):
                slot_src[k, s] = g.arc_src[a]
                slot_w[k, s] = g.arc_weight[a]
                slot_a[k, s] = a
            over = rem[width:]
            resid_lists.append(over)
            max_resid = max(max_resid, len(over))

        hubs = [s for s in range(S) if resid_lists[s]]
        H = len(hubs)
        hubpos = np.full(S_pad, 0, np.int32)
        if H:
            h_pad = _pad128(H + 1)  # column H stays INF for non-hub states
            hubpos[:] = H
            for h, s in enumerate(hubs):
                hubpos[s] = h
            rounds_per_pass = max(S_pad // h_pad, 1)
            n_passes = -(-max_resid // rounds_per_pass)
            pack_src = np.zeros((n_passes, S_pad), np.int32)
            pack_w = np.full((n_passes, S_pad), INF, np.float32)
            pack_a = np.full((n_passes, S_pad), A, np.int32)
            for h, s in enumerate(hubs):
                for j, a in enumerate(resid_lists[s]):
                    p, r = divmod(j, rounds_per_pass)
                    c = r * h_pad + h
                    pack_src[p, c] = g.arc_src[a]
                    pack_w[p, c] = g.arc_weight[a]
                    pack_a[p, c] = a
        else:
            h_pad = LANE
            n_passes = 0
            pack_src = np.zeros((1, S_pad), np.int32)
            pack_w = np.full((1, S_pad), INF, np.float32)
            pack_a = np.full((1, S_pad), A, np.int32)

        src_pdf = np.zeros(S_pad, np.int32)
        src_pdf[:S] = sp
        init_w = np.full(S_pad, INF, np.float32)
        init_w[:S] = g.init_weight
        final_w = np.full(S_pad, INF, np.float32)
        final_w[:S] = g.final_weight

        base = DeviceGraph(
            num_states=S_pad,
            num_pdfs=g.num_pdfs,
            arc_src=jnp.asarray(g.arc_src),
            arc_dst=jnp.asarray(g.arc_dst),
            arc_pdf=jnp.asarray(g.arc_pdf),
            arc_weight=jnp.asarray(g.arc_weight),
            init_weight=jnp.asarray(init_w),
            final_weight=jnp.asarray(final_w),
            src_pdf=jnp.asarray(src_pdf),
        )
        return PallasDecodeGraph(
            base=base,
            num_real_states=S,
            s_pad=S_pad,
            width=width,
            n_hub_passes=n_passes,
            h_pad=h_pad,
            self_weight=self_w[None, :],
            self_arc=self_a[None, :],
            slot_src=slot_src,
            slot_weight=slot_w,
            slot_arc=slot_a,
            pack_src=pack_src,
            pack_weight=pack_w,
            pack_arc=pack_a,
            hubpos=hubpos[None, :],
            src_pdf=src_pdf[None, :],
            init_w=init_w[None, :],
        )

    @property
    def num_arcs(self) -> int:
        return int(self.base.arc_src.shape[0])

    def _tables(self):
        cached = getattr(self, "_dev_tables", None)
        if cached is None:
            cached = tuple(
                jnp.asarray(t)
                for t in (
                    self.self_weight,
                    self.self_arc,
                    self.slot_src,
                    self.slot_weight,
                    self.slot_arc,
                    self.pack_src,
                    self.pack_weight,
                    self.pack_arc,
                    self.hubpos,
                    self.src_pdf,
                    self.init_w,
                )
            )
            object.__setattr__(self, "_dev_tables", cached)
        return cached


def _merge(cost_a, id_a, cost_b, id_b):
    """(cost, id) lexicographic min."""
    take_a = (cost_a < cost_b) | ((cost_a == cost_b) & (id_a <= id_b))
    return jnp.where(take_a, cost_a, cost_b), jnp.where(take_a, id_a, id_b)


def _make_kernel(
    graph: PallasDecodeGraph, P: int, compact_bp: bool, has_lengths: bool
):
    S_pad = graph.s_pad
    W = graph.width
    HP = graph.n_hub_passes
    h_pad = graph.h_pad
    A = graph.num_arcs
    rounds = max(S_pad // h_pad, 1)
    inf = float(NEG_INF_F32)  # python literal: traced constants can't be
    # closed over by a pallas kernel

    def kernel(
        lengths_ref,  # i32 [16, 1]
        am_ref,  # f32 [1, 16, P] — this frame's acoustic costs
        selfw_ref,
        selfa_ref,
        slotsrc_ref,
        slotw_ref,
        slota_ref,
        packsrc_ref,
        packw_ref,
        packa_ref,
        hubpos_ref,
        srcpdf_ref,
        init_ref,
        alpha_ref,  # f32 [16, S_pad] out — the running alpha, VMEM-resident
        bp_ref,  # [1, 16, S_pad] out — this frame's backpointer row
        ampad_ref,  # f32 [16, S_pad] scratch; reused as hub-cost staging
        hubc_ref,  # f32 [16, S_pad] scratch (first h_pad cols used)
        hubi_ref,  # i32 [16, S_pad] scratch
        idstage_ref,  # i32 [16, S_pad] scratch: hub-id staging
    ):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            alpha_ref[:] = jnp.broadcast_to(init_ref[:], (SUBLANE, S_pad))

        alpha0 = alpha_ref[:]

        # acoustic fold: alpha_e[b, s] = alpha[b, s] + am[b, src_pdf[s]]
        ampad_ref[:, :P] = am_ref[0]
        pdf_idx = jnp.broadcast_to(srcpdf_ref[:], (SUBLANE, S_pad))
        am_g = jnp.take_along_axis(ampad_ref[:], pdf_idx, axis=1)
        alpha_e = alpha0 + am_g

        # self lane
        best_c = jnp.minimum(alpha_e + selfw_ref[:], inf)
        best_i = jnp.broadcast_to(selfa_ref[:], (SUBLANE, S_pad))

        # slot tiers
        for w in range(W):
            idx = jnp.broadcast_to(slotsrc_ref[w][None, :], (SUBLANE, S_pad))
            c = jnp.take_along_axis(alpha_e, idx, axis=1)
            c = jnp.minimum(c + slotw_ref[w][None, :], inf)
            i = jnp.broadcast_to(slota_ref[w][None, :], (SUBLANE, S_pad))
            best_c, best_i = _merge(best_c, best_i, c, i)

        # hub rounds
        if HP:
            hubc_ref[:] = jnp.full((SUBLANE, S_pad), inf)
            hubi_ref[:] = jnp.full((SUBLANE, S_pad), A, jnp.int32)
            for p in range(HP):
                idx = jnp.broadcast_to(
                    packsrc_ref[p][None, :], (SUBLANE, S_pad)
                )
                c = jnp.take_along_axis(alpha_e, idx, axis=1)
                # stage candidates in refs: slicing a lazily-broadcast
                # vector trips a Mosaic layout error, slicing a ref load
                # doesn't (ampad is free once alpha_e exists)
                ampad_ref[:] = jnp.minimum(c + packw_ref[p][None, :], inf)
                idstage_ref[:] = jnp.broadcast_to(
                    packa_ref[p][None, :], (SUBLANE, S_pad)
                )
                for r in range(rounds):
                    lo = r * h_pad
                    hc, hi = _merge(
                        hubc_ref[:, :h_pad],
                        hubi_ref[:, :h_pad],
                        ampad_ref[:, lo : lo + h_pad],
                        idstage_ref[:, lo : lo + h_pad],
                    )
                    hubc_ref[:, :h_pad] = hc
                    hubi_ref[:, :h_pad] = hi
            pos = jnp.broadcast_to(hubpos_ref[:], (SUBLANE, S_pad))
            hub_c = jnp.take_along_axis(hubc_ref[:], pos, axis=1)
            hub_i = jnp.take_along_axis(hubi_ref[:], pos, axis=1)
            best_c, best_i = _merge(best_c, best_i, hub_c, hub_i)

        dead = (best_c >= inf) | (best_i >= A)
        if has_lengths:
            active = lengths_ref[:] > t  # [16, 1]
            alpha_ref[:] = jnp.where(active, best_c, alpha0)
            if compact_bp:
                enc = jnp.where(dead, 1, best_i + 2)
                enc = jnp.where(active, enc, 0)
                bp_ref[0] = enc.astype(jnp.uint16)
            else:
                enc = jnp.where(dead, -1, best_i)
                bp_ref[0] = jnp.where(active, enc, STAY).astype(jnp.int32)
        else:
            alpha_ref[:] = best_c
            if compact_bp:
                bp_ref[0] = jnp.where(dead, 1, best_i + 2).astype(jnp.uint16)
            else:
                bp_ref[0] = jnp.where(dead, -1, best_i).astype(jnp.int32)

    return kernel


def viterbi_pallas(
    graph: PallasDecodeGraph,
    log_probs: jnp.ndarray,
    acoustic_scale: float = 1.0,
    lengths: Optional[jnp.ndarray] = None,
    compact_bp: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-kernel drop-in for decoder.viterbi.

    Returns (alpha_final [B, S_pad], bps [T, B, S_pad]) — padded-width
    outputs whose real-state prefix is bit-identical to the XLA layouts'
    (pad states decode to dead / INF). B must be a multiple of 16.
    """
    if compact_bp and graph.num_arcs > _COMPACT_BP_MAX_ARC:
        raise ValueError(
            f"compact_bp needs <= {_COMPACT_BP_MAX_ARC} arcs, "
            f"got {graph.num_arcs}"
        )
    B, T, P = log_probs.shape
    if B % SUBLANE:
        raise ValueError(f"Pallas decode needs B % {SUBLANE} == 0, got {B}")
    S_pad = graph.s_pad
    if P > S_pad:
        raise ValueError(f"num_pdfs {P} exceeds padded state width {S_pad}")
    if not interpret and S_pad > LANE:
        # Mosaic's dynamic_gather requires the gather source to fit one
        # vreg (128 lanes) along the gather axis; larger graphs fail to
        # compile ("Multiple source vregs along gather dimension"). See
        # the module docstring for the measured multi-vreg prototype.
        raise ValueError(
            f"viterbi_pallas compiled mode supports S_pad <= {LANE} "
            f"(single-vreg in-VMEM gathers); got S_pad={S_pad}. Use the "
            "XLA decode layouts (ops.decoder.viterbi) for larger graphs, "
            "or interpret=True for semantics checks."
        )

    am_costs = (
        -jnp.float32(acoustic_scale) * jnp.swapaxes(log_probs, 0, 1)
    ).astype(jnp.float32)  # [T, B, P]
    has_lengths = lengths is not None
    if has_lengths:
        len_col = lengths.astype(jnp.int32)[:, None]  # [B, 1]
    else:
        len_col = jnp.zeros((B, 1), jnp.int32)

    tables = graph._tables()
    W = graph.width
    HP = graph.n_hub_passes
    bp_dtype = jnp.uint16 if compact_bp else jnp.int32

    kernel = _make_kernel(graph, P, compact_bp, has_lengths)

    def table_spec(nrows):
        return pl.BlockSpec(
            (nrows, S_pad), lambda b, t: (0, 0), memory_space=pltpu.VMEM
        )

    grid = (B // SUBLANE, T)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (SUBLANE, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, SUBLANE, P),
                lambda b, t: (t, b, 0),
                memory_space=pltpu.VMEM,
            ),
            table_spec(1),
            table_spec(1),
            table_spec(W),
            table_spec(W),
            table_spec(W),
            table_spec(max(HP, 1)),
            table_spec(max(HP, 1)),
            table_spec(max(HP, 1)),
            table_spec(1),
            table_spec(1),
            table_spec(1),
        ],
        out_specs=[
            pl.BlockSpec(
                (SUBLANE, S_pad), lambda b, t: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, SUBLANE, S_pad),
                lambda b, t: (t, b, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((T, B, S_pad), bp_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUBLANE, S_pad), jnp.float32),
            pltpu.VMEM((SUBLANE, S_pad), jnp.float32),
            pltpu.VMEM((SUBLANE, S_pad), jnp.int32),
            pltpu.VMEM((SUBLANE, S_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(len_col, am_costs, *tables)
    return out[0], out[1]
