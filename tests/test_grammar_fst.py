"""Grammar-compiler tests.

Pins the same behavioral contract as the reference's hermetic FST tests
(/root/reference/tests/test_hassil_fst.py): language enumeration, space
removal, wildcard pruning, range expansion, and G2P-aware word splitting.
"""

import io

from rhasspy_speech_tpu.const import WordCasing
from rhasspy_speech_tpu.grammar import (
    SPACE,
    G2PInfo,
    Intents,
    decode_meta,
    intents_to_fst,
)
from rhasspy_speech_tpu.lexicon import LexiconDatabase

INTENTS_YAML = """
language: en
intents:
  GetTime:
    data:
      - sentences:
          - "what time is it"
          - "what is the time"
  TurnOn:
    data:
      - sentences:
          - "turn on [the] {name}"

  GetState:
    data:
      - sentences:
          - "what is the {name}'s state"

  Todo:
    data:
      - sentences:
          - "add {item} to todo"

  SetBrightness:
    data:
      - sentences:
          - "set brightness to {brightness} percent"

  ShoppingList:
    data:
      - sentences:
          - "add {food} to shopping list"

lists:
  name:
    values:
      - tv
      - light
  item:
    wildcard: true
  brightness:
    range:
      from: 20
      to: 22
  food:
    values:
      - A1 Steak Sauce
      - NASA Moon Cake[s]
      - 0 A.D. DVD
"""


def _load_intents() -> Intents:
    with io.StringIO(INTENTS_YAML) as intents_file:
        return Intents.from_yaml(intents_file)


def test_text_only() -> None:
    intents = _load_intents()

    fst = intents_to_fst(intents, include_intents={"GetTime"})
    assert fst.words == {SPACE, "what", "time", "is", "it", "the"}

    assert set(tuple(t) for t in fst.to_tokens()) == {
        ("what", SPACE, "time", SPACE, "is", SPACE, "it"),
        ("what", SPACE, "is", SPACE, "the", SPACE, "time"),
    }
    assert set(fst.to_strings(False)) == {"what time is it", "what is the time"}

    fst_without_spaces = fst.remove_spaces()
    assert fst_without_spaces.words == {"what", "time", "is", "it", "the"}
    assert set(tuple(t) for t in fst_without_spaces.to_tokens()) == {
        ("what", "time", "is", "it"),
        ("what", "is", "the", "time"),
    }
    assert set(fst_without_spaces.to_strings(True)) == {
        "what time is it",
        "what is the time",
    }


def test_lists() -> None:
    intents = _load_intents()

    fst = intents_to_fst(intents, include_intents={"TurnOn"})
    assert set(fst.to_strings(False)) == {
        "turn on tv",
        "turn on light",
        "turn on the tv",
        "turn on the light",
    }

    fst = intents_to_fst(intents, include_intents={"GetState"}).remove_spaces()
    assert set(fst.to_strings(True)) == {
        "what is the tv's state",
        "what is the light's state",
    }

    fst = intents_to_fst(
        intents, number_language="en", include_intents={"SetBrightness"}
    ).remove_spaces()
    assert set(fst.to_strings(True)) == {
        "set brightness to twenty percent",
        "set brightness to twenty one percent",
        "set brightness to twenty two percent",
    }


def test_prune() -> None:
    intents = _load_intents()

    fst = intents_to_fst(intents, include_intents={"Todo"})

    # Wildcard branch is dead
    assert not fst.to_strings(False)
    assert not fst.to_tokens(only_connected=True)

    # Branch is still in FST
    assert fst.to_tokens(only_connected=False) == [["add", SPACE, "{item}"]]

    # Branch is pruned
    fst.prune()
    assert not fst.to_tokens(only_connected=False)


def test_g2p_splitting() -> None:
    intents = _load_intents()

    lexicon = LexiconDatabase()
    lexicon.add("NASA", [["nah", "suh"]])

    fst = intents_to_fst(
        intents,
        include_intents={"ShoppingList"},
        number_language="en",
        g2p_info=G2PInfo(lexicon, WordCasing.get_function(WordCasing.LOWER)),
    ).remove_spaces()
    assert set(fst.to_strings(True)) == {
        "add a one steak sauce to shopping list",
        "add nasa moon cake to shopping list",
        "add nasa moon cakes to shopping list",
        "add zero a d d v d to shopping list",
    }


def test_decode_meta_output_values() -> None:
    """Slot output values ride through remove_spaces as meta labels and are
    resolved by decode_meta.

    Reference parity (hassil_fst.py:554-559): for a plain-text slot value the
    spoken chunk text is recorded as the slot value; ``out:`` only applies
    when the input is a template expression.
    """
    def build(color_values):
        intents = Intents.from_dict(
            {
                "language": "en",
                "intents": {
                    "SetColor": {
                        "data": [
                            {
                                "sentences": ["make it {color}"],
                                "metadata": {"output": "color={color}"},
                            }
                        ]
                    }
                },
                "lists": {"color": {"values": color_values}},
            }
        )
        fst = intents_to_fst(intents).remove_spaces()
        fst.prune()
        return fst

    # Plain text value: spoken text wins
    paths = _output_paths(build([{"in": "crimson", "out": "red"}]))
    assert len(paths) == 1
    assert decode_meta(" ".join(paths[0])) == "color=crimson"

    # Template value: out wins
    paths = _output_paths(build([{"in": "crimson (red|colour)", "out": "red"}]))
    assert len(paths) == 2
    assert {decode_meta(" ".join(p)) for p in paths} == {"color=red"}


def _output_paths(fst):
    """All output-label paths through the FST (eps skipped)."""
    results = []
    stack = [(fst.start, [])]
    while stack:
        state, path = stack.pop()
        if state in fst.final_states and path:
            results.append(path)
        for arc in fst.arcs[state]:
            new_path = path if arc.out_label == "<eps>" else path + [arc.out_label]
            stack.append((arc.to_state, new_path))
    return results


def test_full_reference_template_coverage():
    """The real test_en.yaml expands to exactly its reference sentence count
    (template-coverage parity guard; SURVEY §7 'bit-identical coverage')."""
    import os

    import yaml

    from rhasspy_speech_tpu.grammar import Intents, intents_to_fst

    path = "/root/reference/tests/test_en.yaml"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference fixture unavailable")
    raw = yaml.safe_load(open(path, encoding="utf-8"))
    intents = Intents.from_dict(
        {
            "language": raw["language"],
            "intents": {"All": {"data": [{"sentences": raw["sentences"]}]}},
            "lists": raw.get("lists", {}),
        }
    )
    fst = intents_to_fst(intents, number_language="en").remove_spaces()
    fst.prune()
    assert len(fst.to_strings(True)) == 3763


def test_fst_language_equals_sampler():
    """The FST's language must equal the sentence sampler's input texts —
    two independent expansions of the same templates."""
    import io as _io

    from rhasspy_speech_tpu.grammar import Intents, compile_intents
    from rhasspy_speech_tpu.grammar.sentences import generate_sentences
    from rhasspy_speech_tpu.grammar.numbers import NumberEngine
    from rhasspy_speech_tpu.lexicon import LexiconDatabase

    yaml_dict = {
        "sentences": [
            "turn (on|off) [the] (light|fan) [in the (kitchen|bedroom)]",
            "set brightness to {level}",
            "never mind",
            {"in": "good (morning|night)", "out": "greeting"},
        ],
        "lists": {
            "level": {"range": {"from": 1, "to": 4}},
        },
    }
    sampler_inputs = {
        inp
        for inp, _out in generate_sentences(
            yaml_dict, number_engine=NumberEngine("en")
        )
    }

    intents = Intents.from_dict(
        {
            "language": "en",
            "intents": {"All": {"data": [{"sentences": yaml_dict["sentences"]}]}},
            "lists": yaml_dict["lists"],
        }
    )
    ctx = compile_intents(intents, _io.StringIO(), LexiconDatabase(),
                          number_language="en")
    from rhasspy_speech_tpu.grammar import intents_to_fst

    fst = intents_to_fst(intents, number_language="en").remove_spaces()
    fst.prune()
    fst_language = set(fst.to_strings(True))

    assert fst_language == sampler_inputs, (
        fst_language - sampler_inputs, sampler_inputs - fst_language
    )
