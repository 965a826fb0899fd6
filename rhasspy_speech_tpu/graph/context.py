"""Context-dependent HCLG expansion (triphone models).

Covers mkgraph.sh:113-151 for context-size N trees: instead of
materializing C (fstcomposecontext) and Ha then composing, LG phone arcs are
expanded in place while tracking the phone context window — the composed
result is identical, and the delayed-context trick (a phone's HMM is emitted
once its right neighbor is known) falls out of the traversal state:

  expansion state = (LG state, left phone, pending phone)

When an arc introduces phone p, the pending phone c (with left l) gains its
right context p, so c's HMM chain (pdfs from the ContextDependency tree,
transition costs from the HmmTopology) is emitted, and p becomes pending.
Word labels/weights ride the arc that introduces the phone, as graph-only
epsilon arcs; the dense builder folds them (graph/dense.py).

Supports N=3/P=1 (triphone), N=2/P=1 (left biphone, common for chain
models), N=2/P=0 (right biphone), and N=1 (monophone). Windows with right
context use one phone of lookahead (the pending mechanism); left-only
windows expand arcs immediately. Output convention matches graph/hclg.py:
ilabel = pdf + 1, olabel = word id.
"""

from __future__ import annotations

from typing import Dict, Optional, Set, Tuple

import math

from ..fst.core import EPS_ID, INF, Fst, SymbolTable
from ..io.transition_model import K_NO_PDF, KaldiTransitionModel
from ..io.tree import ContextDependencyTree
from ..lang.lexicon_fst import Lang
from .transitions import Transition, TransitionTable


def make_hclg_from_tree(
    lang: Lang,
    lg: Fst,
    tree: ContextDependencyTree,
    ktm: KaldiTransitionModel,
    model_phones: SymbolTable,
    transition_scale: float = 1.0,
    self_loop_scale: float = 1.0,
    transitions: Optional[TransitionTable] = None,
) -> Tuple[Fst, int]:
    """Expand LG (lang-phone ilabels -> words) into HCLG (pdf+1 -> words)
    using a real decision tree. Returns (hclg, num_pdfs)."""
    # Windows needing at most one phone of lookahead (right context <= 1)
    # and one phone of memory (left context <= 1).
    if (tree.N, tree.P) not in {(1, 0), (2, 0), (2, 1), (3, 1)}:
        raise NotImplementedError(f"tree N={tree.N} P={tree.P}")
    lookahead = tree.N - 1 - tree.P > 0  # right context present
    track_left = tree.P > 0

    def context_window(left: int, phone: int, right: int):
        if tree.N == 3:
            return (left, phone, right)
        if tree.N == 2:
            return (left, phone) if tree.P == 1 else (phone, right)
        return (phone,)

    disambig: Set[int] = set(lang.disambig_phone_ids)

    # lang phone id -> model phone id (names must agree)
    lang_to_model: Dict[int, int] = {}
    for name, pid in lang.phones:
        if pid == 0 or name.startswith("#"):
            continue
        mid = model_phones.find(name)
        if mid is None:
            raise KeyError(f"phone {name!r} missing from model phones.txt")
        lang_to_model[pid] = mid

    def topo_entry(model_phone: int):
        return ktm.topology.entry_for_phone(model_phone)

    hclg = Fst()
    # expansion states: (lg_state, left_model_phone, pending_model_phone)
    state_ids: Dict[Tuple[int, int, Optional[int]], int] = {}

    def get_state(key) -> int:
        sid = state_ids.get(key)
        if sid is None:
            sid = hclg.add_state()
            state_ids[key] = sid
        return sid

    def expand_phone(
        src: int, left: int, phone: int, right: int, dst: int, lang_phone: int = 0
    ) -> None:
        """Emit phone's HMM chain from hclg state src to dst with context
        (left, phone, right); model phone ids, 0 = eps padding.
        ``lang_phone`` tags the chain for transition-table metadata."""
        entry = topo_entry(phone)
        window = context_window(left, phone, right)
        current = src
        emitted_entry = False
        for j, st in enumerate(entry):
            if st.forward_pdf_class == K_NO_PDF:
                continue  # final non-emitting state
            fwd_pdf = tree.compute(window, st.forward_pdf_class)
            self_class = (
                st.self_loop_pdf_class
                if st.self_loop_pdf_class != K_NO_PDF
                else st.forward_pdf_class
            )
            self_pdf = tree.compute(window, self_class)
            if fwd_pdf is None or self_pdf is None:
                raise ValueError(
                    f"tree has no pdf for phone {phone} window {window}"
                )
            fwd_prob = sum(p for d, p in st.transitions if d != j) or 1.0
            self_prob = sum(p for d, p in st.transitions if d == j)
            fwd_cost = -transition_scale * math.log(fwd_prob)
            self_cost = (
                -self_loop_scale * math.log(self_prob) if self_prob > 0 else 0.0
            )
            fwd_il = fwd_pdf + 1
            self_il = self_pdf + 1
            if transitions is not None:
                fwd_il = transitions.ilabel(
                    Transition(
                        pdf=fwd_pdf,
                        phone=lang_phone,
                        is_self_loop=False,
                        is_entry=not emitted_entry,
                        trans_cost=-math.log(fwd_prob),
                    )
                )
                self_il = transitions.ilabel(
                    Transition(
                        pdf=self_pdf,
                        phone=lang_phone,
                        is_self_loop=True,
                        is_entry=False,
                        trans_cost=(
                            -math.log(self_prob) if self_prob > 0 else 0.0
                        ),
                    )
                )
            emitted_entry = True
            loop_state = hclg.add_state()
            hclg.add_arc(current, fwd_il, EPS_ID, fwd_cost, loop_state)
            hclg.add_arc(loop_state, self_il, EPS_ID, self_cost, loop_state)
            current = loop_state
        hclg.add_arc(current, EPS_ID, EPS_ID, 0.0, dst)

    # pending = (model phone, lang phone) awaiting its right context
    start_key = (lg.start, 0, None)
    hclg.start = get_state(start_key)

    # worklist traversal
    stack = [start_key]
    seen = {start_key}
    num_pdfs = ktm.num_pdfs
    while stack:
        key = stack.pop()
        lg_state, left, pending = key
        src = state_ids[key]

        # finality: flush the pending phone with eps right context
        if lg.finals[lg_state] != INF:
            if pending is None:
                hclg.set_final(src, lg.finals[lg_state])
            else:
                end = hclg.add_state()
                expand_phone(src, left, pending[0], 0, end, lang_phone=pending[1])
                hclg.set_final(end, lg.finals[lg_state])

        for ilabel, olabel, weight, ns in lg.arcs[lg_state]:
            if ilabel == EPS_ID or ilabel in disambig:
                new_key = (ns, left, pending)
                dst = get_state(new_key)
                hclg.add_arc(src, EPS_ID, olabel, weight, dst)
            elif not lookahead:
                # no right context: expand the phone on its own arc
                p_model = lang_to_model[ilabel]
                new_key = (ns, p_model if track_left else 0, None)
                dst = get_state(new_key)
                mid = hclg.add_state()
                expand_phone(src, left, p_model, 0, mid, lang_phone=ilabel)
                hclg.add_arc(mid, EPS_ID, olabel, weight, dst)
            else:
                p_model = lang_to_model[ilabel]
                if pending is None:
                    new_key = (ns, left, (p_model, ilabel))
                    dst = get_state(new_key)
                    hclg.add_arc(src, EPS_ID, olabel, weight, dst)
                else:
                    new_key = (ns, pending[0], (p_model, ilabel))
                    dst = get_state(new_key)
                    mid = hclg.add_state()
                    expand_phone(
                        src, left, pending[0], p_model, mid, lang_phone=pending[1]
                    )
                    hclg.add_arc(mid, EPS_ID, olabel, weight, dst)
            if new_key not in seen:
                seen.add(new_key)
                stack.append(new_key)

    return hclg.connect(), num_pdfs
