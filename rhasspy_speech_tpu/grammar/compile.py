"""Template → FST compiler.

Lowers parsed intent templates into the textual grammar FST, with the same
surface behavior as the reference compiler
(/root/reference/rhasspy_speech/hassil_fst.py:374-846 and intent_fst.py:26-47):

- alternatives/optionals become branch/merge states,
- text slot lists expand with context filtering and output-value metadata,
- range lists expand through the number engine (all ruleset variants),
- output overrides ride the FST output side as base32 meta labels,
- wildcard lists produce dead branches that :meth:`Fst.prune` removes.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from functools import reduce
from typing import Callable, Dict, List, Optional, Set, TextIO, Union

from ..const import WordCasing
from ..lexicon.g2p import LexiconDatabase, split_words
from .expression import (
    Expression,
    ListReference,
    RangeSlotList,
    RuleReference,
    Sentence,
    Sequence,
    SequenceType,
    SlotList,
    TextChunk,
    TextSlotList,
)
from .fst import (
    BEGIN_OUTPUT,
    END_OUTPUT,
    EPS,
    SENTENCE_OUTPUT,
    SPACE,
    Fst,
    encode_meta,
)
from .intents import (
    IntentData,
    Intents,
    check_excluded_context,
    check_required_context,
)
from .numbers import NumberEngine

_LOGGER = logging.getLogger(__name__)


@dataclass
class NumToWords:
    engine: NumberEngine
    cache: Dict[tuple, Sequence] = field(default_factory=dict)


@dataclass
class G2PInfo:
    lexicon: LexiconDatabase
    casing_func: Callable[[str], str] = field(default=lambda s: s)


@dataclass
class ExpressionWithOutput:
    """An expression whose decoded output text differs from its spoken text."""

    expression: Expression
    output_text: str
    list_name: Optional[str] = None


def expression_to_fst(
    expression: Union[Expression, ExpressionWithOutput],
    state: int,
    fst: Fst,
    intent_data: IntentData,
    intents: Intents,
    slot_lists: Optional[Dict[str, SlotList]] = None,
    num_to_words: Optional[NumToWords] = None,
    g2p_info: Optional[G2PInfo] = None,
    suppress_output: bool = False,
) -> Optional[int]:
    """Lower one expression; returns the end state or None for dead branches."""

    if isinstance(expression, ExpressionWithOutput):
        output_data = {"text": expression.output_text}
        if expression.list_name:
            output_data["list"] = expression.list_name

        state = fst.next_edge(state, EPS, BEGIN_OUTPUT)
        state = fst.next_edge(state, EPS, encode_meta(json.dumps(output_data)))
        state = expression_to_fst(
            expression.expression,
            state,
            fst,
            intent_data,
            intents,
            slot_lists,
            num_to_words,
            g2p_info,
            suppress_output=suppress_output,
        )
        if state is None:
            return None
        return fst.next_edge(state, EPS, END_OUTPUT)

    if isinstance(expression, TextChunk):
        return _text_chunk_to_fst(
            expression, state, fst, num_to_words, g2p_info, suppress_output
        )

    if isinstance(expression, Sequence):
        if expression.type == SequenceType.ALTERNATIVE:
            start = state
            end = fst.next_state()

            for item in expression.items:
                item_end = expression_to_fst(
                    item,
                    start,
                    fst,
                    intent_data,
                    intents,
                    slot_lists,
                    num_to_words,
                    g2p_info,
                )
                if item_end is None:  # dead branch
                    continue
                if item_end == start:  # empty item
                    continue
                fst.add_edge(item_end, end)

            if expression.is_optional:
                fst.add_edge(start, end)

            return end

        # GROUP: sequential composition
        for item in expression.items:
            state = expression_to_fst(
                item,
                state,
                fst,
                intent_data,
                intents,
                slot_lists,
                num_to_words,
                g2p_info,
            )
            if state is None:
                return None
        return state

    if isinstance(expression, ListReference):
        return _list_reference_to_fst(
            expression,
            state,
            fst,
            intent_data,
            intents,
            slot_lists,
            num_to_words,
            g2p_info,
        )

    if isinstance(expression, RuleReference):
        rule_body = intent_data.expansion_rules.get(expression.rule_name)
        if rule_body is None:
            rule_body = intents.expansion_rules.get(expression.rule_name)
        if rule_body is None:
            raise ValueError(f"Missing expansion rule <{expression.rule_name}>")

        return expression_to_fst(
            rule_body,
            state,
            fst,
            intent_data,
            intents,
            slot_lists,
            num_to_words,
            g2p_info,
        )

    return state


def _text_chunk_to_fst(
    chunk: TextChunk,
    state: int,
    fst: Fst,
    num_to_words: Optional[NumToWords],
    g2p_info: Optional[G2PInfo],
    suppress_output: bool,
) -> int:
    original = chunk.original_text or ""

    if original == " ":
        return fst.next_edge(state, SPACE)

    word = original.strip()
    if not word:
        return state

    if original.startswith(" "):
        state = fst.next_edge(state, SPACE)

    if g2p_info is not None:
        sub_words = split_words(
            word,
            g2p_info.lexicon,
            num_to_words.engine if num_to_words is not None else None,
        )
    else:
        sub_words = word.split()

    last_idx = len(sub_words) - 1
    for idx, sub_word in enumerate(sub_words):
        if isinstance(sub_word, str):
            sub_output: Optional[str] = sub_word
        else:
            sub_word, sub_output = sub_word
            sub_output = sub_output or EPS

        if g2p_info is not None:
            sub_word = g2p_info.casing_func(sub_word)

        state = fst.next_edge(state, sub_word, EPS if suppress_output else sub_output)
        if idx != last_idx:
            state = fst.next_edge(state, SPACE)

    if original.endswith(" "):
        state = fst.next_edge(state, SPACE)

    return state


def _list_reference_to_fst(
    list_ref: ListReference,
    state: int,
    fst: Fst,
    intent_data: IntentData,
    intents: Intents,
    slot_lists: Optional[Dict[str, SlotList]],
    num_to_words: Optional[NumToWords],
    g2p_info: Optional[G2PInfo],
) -> Optional[int]:
    slot_list: Optional[SlotList] = None
    if slot_lists is not None:
        slot_list = slot_lists.get(list_ref.list_name)
    if slot_list is None:
        slot_list = intent_data.slot_lists.get(list_ref.list_name)
    if slot_list is None:
        slot_list = intents.slot_lists.get(list_ref.list_name)

    if isinstance(slot_list, TextSlotList):
        values: List[Union[Expression, ExpressionWithOutput]] = []
        for value in slot_list.values:
            if (intent_data.requires_context is not None) and (
                not check_required_context(
                    intent_data.requires_context,
                    value.context,
                    allow_missing_keys=True,
                )
            ):
                continue
            if (intent_data.excludes_context is not None) and (
                not check_excluded_context(
                    intent_data.excludes_context, value.context
                )
            ):
                continue

            output_text: Optional[str] = None
            if isinstance(value.text_in, TextChunk):
                output_text = value.text_in.text
            elif value.value_out is not None:
                output_text = str(value.value_out)

            if output_text:
                values.append(
                    ExpressionWithOutput(
                        value.text_in,
                        output_text=output_text,
                        list_name=list_ref.slot_name,
                    )
                )
            else:
                values.append(value.text_in)

        if not values:
            return None

        return expression_to_fst(
            Sequence(items=values, type=SequenceType.ALTERNATIVE),
            state,
            fst,
            intent_data,
            intents,
            slot_lists,
            num_to_words,
            g2p_info,
        )

    if isinstance(slot_list, RangeSlotList):
        if num_to_words is None:
            return None

        cache_key = (slot_list.start, slot_list.stop + 1, slot_list.step)
        number_sequence = num_to_words.cache.get(cache_key)

        if number_sequence is None:
            values = []
            for number in range(slot_list.start, slot_list.stop + 1, slot_list.step):
                number_str = str(number)
                result = num_to_words.engine.format_number(number)
                number_words = {
                    w.replace("-", " ") for w in result.text_by_ruleset.values()
                }
                values.extend(
                    ExpressionWithOutput(
                        TextChunk(text=w),
                        output_text=number_str,
                        list_name=list_ref.slot_name,
                    )
                    for w in number_words
                )

            number_sequence = Sequence(items=values, type=SequenceType.ALTERNATIVE)
            num_to_words.cache[cache_key] = number_sequence

            if not values:
                return None

        return expression_to_fst(
            number_sequence,
            state,
            fst,
            intent_data,
            intents,
            slot_lists,
            num_to_words,
            g2p_info,
        )

    # Wildcard/unknown list: emit a marker arc; prune() removes the branch.
    marker = f"{{{list_ref.list_name}}}"
    fst.next_edge(state, marker, marker)
    return None


# ---------------------------------------------------------------------------


def get_count(e: Expression, intents: Intents, intent_data: IntentData) -> int:
    """Number of sentences the expression expands to."""
    if isinstance(e, Sequence):
        counts = [get_count(item, intents, intent_data) for item in e.items]
        if e.type == SequenceType.ALTERNATIVE:
            return sum(counts)
        return reduce(lambda x, y: x * y, counts, 1)

    if isinstance(e, ListReference):
        slot_list = intent_data.slot_lists.get(e.list_name) or intents.slot_lists.get(
            e.list_name
        )
        if isinstance(slot_list, TextSlotList):
            return sum(
                get_count(v.text_in, intents, intent_data) for v in slot_list.values
            )
        if isinstance(slot_list, RangeSlotList):
            if slot_list.step == 1:
                return slot_list.stop - slot_list.start + 1
            return len(range(slot_list.start, slot_list.stop + 1, slot_list.step))

    if isinstance(e, RuleReference):
        rule_body = intent_data.expansion_rules.get(
            e.rule_name
        ) or intents.expansion_rules.get(e.rule_name)
        if rule_body:
            return get_count(rule_body, intents, intent_data)

    return 1


def intents_to_fst(
    intents: Intents,
    slot_lists: Optional[Dict[str, SlotList]] = None,
    number_language: Optional[str] = None,
    exclude_intents: Optional[Set[str]] = None,
    include_intents: Optional[Set[str]] = None,
    g2p_info: Optional[G2PInfo] = None,
) -> Fst:
    """Compile all (selected) intents into one grammar FST with spaces."""
    num_to_words: Optional[NumToWords] = None
    if number_language:
        try:
            num_to_words = NumToWords(engine=NumberEngine.for_language(number_language))
        except ValueError:
            _LOGGER.exception("Unable to convert numbers to words")

    filtered_intents = []
    total_sentences = 0
    for intent in intents.intents.values():
        if (exclude_intents is not None) and (intent.name in exclude_intents):
            continue
        if (include_intents is not None) and (intent.name not in include_intents):
            continue

        for data in intent.data:
            for sentence in data.sentences:
                total_sentences += get_count(sentence, intents, data)

        filtered_intents.append(intent)

    _LOGGER.debug("Total sentences: %s", total_sentences)

    fst_with_spaces = Fst()
    final = fst_with_spaces.next_state()

    for intent in filtered_intents:
        for data in intent.data:
            sentence_output: Optional[str] = None
            if data.metadata is not None:
                sentence_output = data.metadata.get("output")

            for sentence in data.sentences:
                sentence_state = fst_with_spaces.next_edge(
                    fst_with_spaces.start, SPACE, SPACE
                )

                if sentence_output:
                    sentence_state = fst_with_spaces.next_edge(
                        sentence_state,
                        EPS,
                        encode_meta(sentence_output, SENTENCE_OUTPUT),
                    )

                end_state = expression_to_fst(
                    sentence,
                    sentence_state,
                    fst_with_spaces,
                    data,
                    intents,
                    slot_lists,
                    num_to_words,
                    g2p_info,
                    suppress_output=(sentence_output is not None),
                )
                if end_state is None:
                    continue

                fst_with_spaces.add_edge(end_state, final, SPACE, SPACE)

    fst_with_spaces.accept(final)
    return fst_with_spaces


# ---------------------------------------------------------------------------
# Context wrapper (reference: intent_fst.py:17-47)
# ---------------------------------------------------------------------------


@dataclass
class IntentsToFstContext:
    """Compiled grammar: text FST stream + vocab + output-only meta labels."""

    fst_file: TextIO
    lexicon: LexiconDatabase
    vocab: Set[str] = field(default_factory=set)
    meta_labels: Set[str] = field(default_factory=set)
    word_casing: WordCasing = WordCasing.LOWER


def compile_intents(
    intents: Intents,
    fst_file: TextIO,
    lexicon: LexiconDatabase,
    number_language: Optional[str] = None,
    word_casing: WordCasing = WordCasing.LOWER,
) -> IntentsToFstContext:
    """Compile templates to a written text FST plus vocab/meta-label sets."""
    context = IntentsToFstContext(
        fst_file=fst_file, lexicon=lexicon, word_casing=word_casing
    )

    fst = intents_to_fst(
        intents,
        number_language=number_language,
        g2p_info=G2PInfo(lexicon, WordCasing.get_function(word_casing)),
    ).remove_spaces()
    fst.prune()

    fst.write(context.fst_file)
    context.fst_file.seek(0)
    context.vocab = fst.words
    context.meta_labels = fst.output_words - fst.words

    return context
