"""In-memory textual FST used by the grammar compiler.

Behavioral contract mirrors the reference's template-FST layer
(/root/reference/rhasspy_speech/hassil_fst.py:45-352): word arcs carry a
per-word penalty, ``<space>`` tokens mark word boundaries, and output-side
metadata is carried as base32-encoded ``__output:``/``__sentence_output:``
labels that survive decoding and are resolved by :func:`decode_meta`. This is
the public output format of the whole system, so the encode/decode scheme is
kept bit-identical. Implementation is our own (iterative traversals instead
of recursion, reverse-reachability pruning).
"""

from __future__ import annotations

import base64
import json
import re
from collections import defaultdict
from dataclasses import dataclass, field
from enum import Enum, auto
from typing import Dict, List, Optional, Set, TextIO, Tuple

EPS = "<eps>"
SPACE = "<space>"
BEGIN_OUTPUT = "__begin_output:"
END_OUTPUT = "__end_output"
SENTENCE_OUTPUT = "__sentence_output:"
OUTPUT_PREFIX = "__output:"
WORD_PENALTY = 0.03


class SuppressOutput(Enum):
    """Output-suppression mode while merging char/word chunks."""

    DISABLED = auto()
    UNTIL_END = auto()
    UNTIL_SPACE = auto()


@dataclass
class FstArc:
    to_state: int
    in_label: str = EPS
    out_label: str = EPS
    log_prob: Optional[float] = None


@dataclass
class Fst:
    arcs: Dict[int, List[FstArc]] = field(default_factory=lambda: defaultdict(list))
    states: Set[int] = field(default_factory=lambda: {0})
    final_states: Set[int] = field(default_factory=set)
    words: Set[str] = field(default_factory=set)
    output_words: Set[str] = field(default_factory=set)
    start: int = 0
    current_state: int = 0

    # -- construction -------------------------------------------------------

    def next_state(self) -> int:
        self.states.add(self.current_state)
        self.current_state += 1
        return self.current_state

    def add_edge(
        self,
        from_state: int,
        to_state: int,
        in_label: Optional[str] = None,
        out_label: Optional[str] = None,
        log_prob: Optional[float] = None,
    ) -> None:
        in_label = EPS if in_label is None else in_label
        out_label = in_label if out_label is None else out_label

        if (" " in in_label) or (" " in out_label):
            raise ValueError(
                f"Cannot have white space in labels: from={in_label}, to={out_label}"
            )
        if (not in_label) or (not out_label):
            raise ValueError(f"Labels cannot be empty: from={in_label}, to={out_label}")

        if in_label != EPS:
            self.words.add(in_label)
        if out_label != EPS:
            self.output_words.add(out_label)

        self.states.add(from_state)
        self.states.add(to_state)
        self.arcs[from_state].append(FstArc(to_state, in_label, out_label, log_prob))

    def next_edge(
        self,
        from_state: int,
        in_label: Optional[str] = None,
        out_label: Optional[str] = None,
        log_prob: Optional[float] = None,
    ) -> int:
        to_state = self.next_state()
        self.add_edge(from_state, to_state, in_label, out_label, log_prob)
        return to_state

    def accept(self, state: int) -> None:
        self.states.add(state)
        self.final_states.add(state)

    # -- serialization ------------------------------------------------------

    def write(self, fst_file: TextIO, symbols_file: Optional[TextIO] = None) -> None:
        """Write AT&T-style text FST lines (and optionally a symbol table)."""
        symbols: Dict[str, int] = {EPS: 0}

        for state, state_arcs in self.arcs.items():
            for arc in state_arcs:
                symbols.setdefault(arc.in_label, len(symbols))
                symbols.setdefault(arc.out_label, len(symbols))

                fields: Tuple = (state, arc.to_state, arc.in_label, arc.out_label)
                if arc.log_prob is not None:
                    fields = fields + (arc.log_prob,)
                print(*fields, file=fst_file)

        for state in self.final_states:
            print(state, file=fst_file)

        if symbols_file is not None:
            for symbol, symbol_id in symbols.items():
                print(symbol, symbol_id, file=symbols_file)

    # -- space removal ------------------------------------------------------

    def remove_spaces(self) -> "Fst":
        """Merge ``<space>``-separated character/word chunks into word arcs.

        Every produced word arc gets WORD_PENALTY; output-metadata markers
        (``__begin_output``/``__end_output``/``__output:``/
        ``__sentence_output:``) control which output labels survive.
        """
        merged = Fst()
        # (src_state, dst_state, arc_index) of a <space> arc -> merged state
        visited: Dict[Tuple[int, int, int], int] = {}

        # Work item: traversal of `arc` (the arc_idx'th arc of `state`) with
        # the word/output accumulators and current merged-FST write position.
        stack: List[Tuple[int, FstArc, int, str, Optional[str], int, SuppressOutput]] = []

        for intent_arc in self.arcs[self.start]:
            # Per-sentence start arc keeps its weight (if any)
            merged_state = merged.next_edge(merged.start, log_prob=intent_arc.log_prob)
            for arc_idx in reversed(range(len(self.arcs[intent_arc.to_state]))):
                arc = self.arcs[intent_arc.to_state][arc_idx]
                stack.append(
                    (
                        intent_arc.to_state,
                        arc,
                        arc_idx,
                        "",
                        None,
                        merged_state,
                        SuppressOutput.DISABLED,
                    )
                )

        while stack:
            state, arc, arc_idx, word, output_word, out_state, suppress = stack.pop()

            if arc.in_label == SPACE:
                key = (state, arc.to_state, arc_idx)
                input_symbol = word or EPS
                output_symbol = input_symbol

                if suppress in (SuppressOutput.UNTIL_END, SuppressOutput.UNTIL_SPACE):
                    output_symbol = output_word or EPS
                    output_word = None  # consumed

                penalty = WORD_PENALTY if input_symbol != EPS else None
                cached_state = visited.get(key)
                if cached_state is not None:
                    merged.add_edge(
                        out_state, cached_state, input_symbol, output_symbol, penalty
                    )
                    continue

                out_state = merged.next_edge(
                    out_state, input_symbol, output_symbol, penalty
                )
                visited[key] = out_state

                if arc.to_state in self.final_states:
                    merged.final_states.add(out_state)

                word = ""
                if suppress == SuppressOutput.UNTIL_SPACE:
                    suppress = SuppressOutput.DISABLED
            elif arc.in_label != EPS:
                word += arc.in_label
                if (
                    (suppress == SuppressOutput.DISABLED)
                    and (arc.out_label != EPS)
                    and (arc.out_label != arc.in_label)
                ):
                    # Word-level output override (e.g. number words -> digits)
                    suppress = SuppressOutput.UNTIL_SPACE
                    output_word = arc.out_label

            if arc.out_label.startswith(BEGIN_OUTPUT):
                suppress = SuppressOutput.UNTIL_END
            elif arc.out_label.startswith(END_OUTPUT):
                suppress = SuppressOutput.UNTIL_SPACE
            elif arc.out_label.startswith(SENTENCE_OUTPUT):
                out_state = merged.next_edge(out_state, EPS, arc.out_label)
            elif arc.out_label.startswith(OUTPUT_PREFIX):
                output_word = arc.out_label

            next_arcs = self.arcs[arc.to_state]
            for next_idx in reversed(range(len(next_arcs))):
                stack.append(
                    (
                        arc.to_state,
                        next_arcs[next_idx],
                        next_idx,
                        word,
                        output_word,
                        out_state,
                        suppress,
                    )
                )

        return merged

    # -- pruning ------------------------------------------------------------

    def prune(self) -> None:
        """Drop states that cannot reach any final state (dead branches)."""
        # Reverse adjacency
        incoming: Dict[int, List[int]] = defaultdict(list)
        for state, state_arcs in self.arcs.items():
            for arc in state_arcs:
                incoming[arc.to_state].append(state)

        alive: Set[int] = set(self.final_states)
        frontier = list(self.final_states)
        while frontier:
            state = frontier.pop()
            for pred in incoming[state]:
                if pred not in alive:
                    alive.add(pred)
                    frontier.append(pred)

        dead = self.states - alive
        if not dead:
            return

        self.states = alive
        for state in dead:
            self.arcs.pop(state, None)

        for state in self.states:
            state_arcs = self.arcs[state]
            if any(arc.to_state in dead for arc in state_arcs):
                self.arcs[state] = [a for a in state_arcs if a.to_state not in dead]

    # -- enumeration --------------------------------------------------------

    def to_strings(self, add_spaces: bool) -> List[str]:
        """Enumerate the input language (normalized text strings)."""
        strings: List[str] = []
        stack: List[Tuple[int, str]] = [(self.start, "")]
        while stack:
            state, text = stack.pop()
            if state in self.final_states:
                text_norm = " ".join(text.strip().split())
                if text_norm:
                    strings.append(text_norm)

            for arc in reversed(self.arcs[state]):
                if arc.in_label == SPACE:
                    arc_text = text + " "
                elif arc.in_label != EPS:
                    arc_text = (text + " " + arc.in_label) if add_spaces else (
                        text + arc.in_label
                    )
                else:
                    arc_text = text
                stack.append((arc.to_state, arc_text))

        return strings

    def to_tokens(self, only_connected: bool = True) -> List[List[str]]:
        """Enumerate input token paths; dead paths included when requested."""
        tokens: List[List[str]] = []
        self._collect_tokens([], tokens, self.start, only_connected)

        for path in tokens:
            if path and path[-1] == SPACE:
                path.pop()

        return tokens

    def _collect_tokens(
        self,
        path: List[str],
        tokens: List[List[str]],
        state: int,
        only_connected: bool,
    ) -> None:
        if (state in self.final_states) and path:
            tokens.append(path)

        state_arcs = self.arcs[state]
        for arc in state_arcs:
            if (arc.in_label == EPS) or (arc.in_label == SPACE and not path):
                arc_path = path
            else:
                arc_path = path + [arc.in_label.strip()]
            self._collect_tokens(arc_path, tokens, arc.to_state, only_connected)

        if path and (not state_arcs) and (not only_connected):
            tokens.append(path)  # dead-end path


# ---------------------------------------------------------------------------
# Metadata labels: base32 payloads on the FST output side
# ---------------------------------------------------------------------------

_META_B32 = "([0-9A-Z=]+)"


def encode_meta(text: str, prefix: str = OUTPUT_PREFIX) -> str:
    """Encode output metadata as a single FST-safe label."""
    return prefix + base64.b32encode(text.encode("utf-8")).strip().decode("utf-8")


def decode_meta_single(text: str) -> str:
    return base64.b32decode(text.encode("utf-8")).strip().decode("utf-8")


def decode_meta(text: str) -> str:
    """Resolve metadata labels in decoded text to the final output string.

    ``__output:<b32 json>`` labels substitute their slot text (recording slot
    values); a trailing ``__sentence_output:<b32>`` label replaces the whole
    sentence, with ``{slot}`` placeholders filled from the recorded slots.
    """
    slots: Dict[str, str] = {}

    def handle_output(match: re.Match) -> str:
        data = json.loads(decode_meta_single(match.group(1)))
        slot_value = data["text"]
        slot_name = data.get("list")
        if slot_name:
            slots[slot_name] = slot_value
        return slot_value

    text = re.sub(re.escape(OUTPUT_PREFIX) + _META_B32, handle_output, text)

    sentence_match = re.search(re.escape(SENTENCE_OUTPUT) + _META_B32, text)
    if sentence_match is None:
        return text

    return decode_meta_single(sentence_match.group(1)).format(**slots)
