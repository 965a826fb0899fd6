"""Sentence sampler: YAML templates → (input text, output text) pairs.

Same capability as the reference sampler
(/root/reference/rhasspy_speech/sentences.py:29-337): expands ``sentences``
with ``lists`` (including ``range`` via the number engine) and
``expansion_rules`` into every possible (spoken, output) pair, carrying slot
values for ``{slot}`` substitution in output templates and honoring
requires/excludes context filters. Feeds the sentences DB used for
transcript scoring.
"""

from __future__ import annotations

import itertools
import logging
import time
from collections.abc import Sequence as ABCSequence
from typing import Any, Dict, Iterable, List, Optional, Tuple

from .expression import (
    Expression,
    ListReference,
    RuleReference,
    Sentence,
    Sequence,
    SequenceType,
    SlotList,
    TextChunk,
    TextSlotList,
    TextSlotValue,
)
from .intents import check_excluded_context, check_required_context
from .numbers import NumberEngine
from .parser import is_template, parse_sentence

_LOGGER = logging.getLogger(__name__)


class MissingListError(Exception):
    pass


class MissingRuleError(Exception):
    pass


def _normalize_whitespace(text: str) -> str:
    """Collapse runs and strip edges (skipped optionals at sentence edges
    otherwise leave dangling spaces)."""
    import re

    return re.sub(r"\s+", " ", text).strip()


def generate_sentences(
    sentences_yaml: Dict[str, Any], number_engine: Optional[NumberEngine] = None
) -> Iterable[Tuple[str, str]]:
    """Yield every (input text, output text) pair from a sentences YAML dict.

    YAML shape::

        sentences:
          - same text in and out
          - in: text in
            out: different text out
          - in: [multiple, templates]
            out: shared out
        lists:
          <name>: {values: [...] | range: {from,to,step}}
        expansion_rules:
          <name>: template
    """
    start_time = time.monotonic()
    templates = sentences_yaml["sentences"]

    slot_lists: Dict[str, SlotList] = {}
    for slot_name, slot_info in sentences_yaml.get("lists", {}).items():
        slot_list = _load_slot_list(slot_name, slot_info, number_engine)
        if slot_list is not None:
            slot_lists[slot_name] = slot_list

    expansion_rules: Dict[str, Sentence] = {
        rule_name: parse_sentence(rule_text)
        for rule_name, rule_text in sentences_yaml.get(
            "expansion_rules", {}
        ).items()
    }

    num_sentences = 0
    for template in templates:
        requires_context: Optional[Dict[str, Any]] = None
        excludes_context: Optional[Dict[str, Any]] = None

        if isinstance(template, str):
            input_templates: List[str] = [template]
            output_text: Optional[str] = None
        else:
            input_value = template["in"]
            input_templates = (
                [input_value] if isinstance(input_value, str) else input_value
            )
            output_text = template.get("out")
            requires_context = template.get("requires_context")
            excludes_context = template.get("excludes_context")

        for input_template in input_templates:
            if is_template(input_template):
                input_expression = parse_sentence(input_template)
                for (
                    input_text,
                    maybe_output_text,
                    list_values,
                ) in sample_expression_with_output(
                    input_expression,
                    slot_lists=slot_lists,
                    expansion_rules=expansion_rules,
                    requires_context=requires_context,
                    excludes_context=excludes_context,
                ):
                    if output_text is None:
                        final_output_text = maybe_output_text or input_text
                    else:
                        final_output_text = output_text  # may be empty

                    if list_values:
                        final_output_text = final_output_text.format(**list_values)

                    yield (input_text, final_output_text)
                    num_sentences += 1
            else:
                final_output_text = (
                    input_template if output_text is None else output_text
                )
                yield (input_template, final_output_text)
                num_sentences += 1

    _LOGGER.info(
        "Generated %s sentence(s) in %0.2f second(s)",
        num_sentences,
        time.monotonic() - start_time,
    )


def _load_slot_list(
    slot_name: str, slot_info: Any, number_engine: Optional[NumberEngine]
) -> Optional[TextSlotList]:
    if isinstance(slot_info, ABCSequence) and not isinstance(slot_info, str):
        slot_info = {"values": slot_info}

    values: List[TextSlotValue] = []

    slot_range = slot_info.get("range")
    if slot_range:
        assert number_engine is not None, "Can't expand ranges without a number engine"
        slot_from = int(slot_range["from"])
        slot_to = int(slot_range["to"])
        slot_step = int(slot_range.get("step", 1))
        for i in range(slot_from, slot_to + 1, slot_step):
            result = number_engine.format_number(i)
            number_strs = {
                s.replace("-", " ") for s in result.text_by_ruleset.values()
            }
            values.extend(
                TextSlotValue(text_in=TextChunk(text=s), value_out=i)
                for s in number_strs
            )
        return TextSlotList(name=slot_name, values=values)

    slot_values = slot_info.get("values")
    if not slot_values:
        _LOGGER.warning("No values for list %s, skipping", slot_name)
        return None

    for slot_value in slot_values:
        if isinstance(slot_value, str):
            slot_value = {"in": slot_value}

        value_in = str(slot_value["in"])
        if not value_in:
            continue

        value_out = slot_value.get("out")
        value_context = slot_value.get("context")

        if is_template(value_in):
            input_expression = parse_sentence(value_in)
            for input_text, _out, _lists in sample_expression_with_output(
                input_expression
            ):
                values.append(
                    TextSlotValue(
                        text_in=TextChunk(text=input_text),
                        value_out=value_out or input_text,
                        context=value_context,
                    )
                )
        else:
            values.append(
                TextSlotValue(
                    text_in=TextChunk(text=value_in),
                    value_out=value_out or value_in,
                    context=value_context,
                )
            )

    return TextSlotList(name=slot_name, values=values)


def sample_expression_with_output(
    expression: Expression,
    slot_lists: Optional[Dict[str, SlotList]] = None,
    expansion_rules: Optional[Dict[str, Sentence]] = None,
    list_values: Optional[Dict[str, Any]] = None,
    requires_context: Optional[Dict[str, Any]] = None,
    excludes_context: Optional[Dict[str, Any]] = None,
) -> Iterable[Tuple[str, Optional[str], Dict[str, Any]]]:
    """Yield (input text, output text, slot values) for every expansion."""
    if list_values is None:
        list_values = {}

    if isinstance(expression, TextChunk):
        yield (expression.original_text, expression.original_text, list_values)

    elif isinstance(expression, Sequence):
        if expression.type == SequenceType.ALTERNATIVE:
            for item in expression.items:
                yield from sample_expression_with_output(
                    item,
                    slot_lists,
                    expansion_rules,
                    list_values,
                    requires_context,
                    excludes_context,
                )
        elif expression.type == SequenceType.GROUP:
            item_expansions = [
                sample_expression_with_output(
                    item,
                    slot_lists,
                    expansion_rules,
                    list_values,
                    requires_context,
                    excludes_context,
                )
                for item in expression.items
            ]
            for combo in itertools.product(*item_expansions):
                combo_list_values = dict(list_values)
                for part in combo:
                    combo_list_values.update(part[2])

                yield (
                    _normalize_whitespace("".join(part[0] for part in combo)),
                    _normalize_whitespace(
                        "".join(str(part[1]) for part in combo if part[1] is not None)
                    ),
                    combo_list_values,
                )
        else:
            raise ValueError(f"Unexpected sequence type: {expression}")

    elif isinstance(expression, ListReference):
        if (not slot_lists) or (expression.list_name not in slot_lists):
            raise MissingListError(f"Missing slot list {{{expression.list_name}}}")

        slot_list = slot_lists[expression.list_name]
        if not isinstance(slot_list, TextSlotList):
            raise ValueError(f"Unexpected slot list type: {slot_list}")

        if requires_context or excludes_context:
            filtered_values = [
                v
                for v in slot_list.values
                if (
                    (not requires_context)
                    or check_required_context(
                        requires_context, v.context, allow_missing_keys=True
                    )
                )
                and (
                    (not excludes_context)
                    or check_excluded_context(excludes_context, v.context)
                )
            ]
        else:
            filtered_values = slot_list.values

        if not filtered_values:
            _LOGGER.warning("No values for list: %s", expression.list_name)

        for text_value in filtered_values:
            for (
                value_input_text,
                value_output_text,
                value_list_values,
            ) in sample_expression_with_output(
                text_value.text_in,
                slot_lists,
                expansion_rules,
                list_values,
                requires_context,
                excludes_context,
            ):
                value_output_text = text_value.value_out or value_output_text
                yield (
                    value_input_text,
                    value_output_text,
                    {
                        **value_list_values,
                        expression.list_name: value_output_text,
                    },
                )

    elif isinstance(expression, RuleReference):
        if (not expansion_rules) or (expression.rule_name not in expansion_rules):
            raise MissingRuleError(f"Missing expansion rule <{expression.rule_name}>")

        yield from sample_expression_with_output(
            expansion_rules[expression.rule_name],
            slot_lists,
            expansion_rules,
            list_values,
            requires_context,
            excludes_context,
        )

    else:
        raise ValueError(f"Unexpected expression: {expression}")
