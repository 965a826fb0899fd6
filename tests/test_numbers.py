"""Number-to-words engine tests across all supported languages."""

import pytest

from rhasspy_speech_tpu.grammar.numbers import NumberEngine


def words(lang: str, n) -> str:
    return NumberEngine.for_language(lang).format_number(n).text.replace("-", " ")


def test_english() -> None:
    assert words("en", 0) == "zero"
    assert words("en", 13) == "thirteen"
    assert words("en", 21) == "twenty one"
    assert words("en", 40) == "forty"
    assert words("en", 100) == "one hundred"
    assert words("en", 123) == "one hundred twenty three"
    assert words("en", 1000) == "one thousand"
    assert words("en", 1234) == "one thousand two hundred thirty four"
    assert words("en", 1000000) == "one million"
    assert words("en", -5) == "minus five"
    assert words("en", "2.5") == "two point five"


def test_german() -> None:
    assert words("de", 1) == "eins"
    assert words("de", 21) == "einundzwanzig"
    assert words("de", 30) == "dreißig"
    assert words("de", 17) == "siebzehn"
    assert words("de", 100) == "einhundert"
    assert words("de", 121) == "einhunderteinundzwanzig"
    assert words("de", 1000) == "eintausend"


def test_french() -> None:
    assert words("fr", 21) == "vingt et un"
    assert words("fr", 71) == "soixante et onze"
    assert words("fr", 75) == "soixante quinze"
    assert words("fr", 80) == "quatre vingts"
    assert words("fr", 81) == "quatre vingt un"
    assert words("fr", 91) == "quatre vingt onze"
    assert words("fr", 100) == "cent"
    assert words("fr", 200) == "deux cents"
    assert words("fr", 201) == "deux cent un"
    assert words("fr", 1000) == "mille"


def test_spanish() -> None:
    assert words("es", 21) == "veintiuno"
    assert words("es", 31) == "treinta y uno"
    assert words("es", 100) == "cien"
    assert words("es", 101) == "ciento uno"
    assert words("es", 500) == "quinientos"
    assert words("es", 1000) == "mil"


def test_italian() -> None:
    assert words("it", 21) == "ventuno"
    assert words("it", 28) == "ventotto"
    assert words("it", 23) == "ventitré"
    assert words("it", 100) == "cento"
    assert words("it", 180) == "centottanta"
    assert words("it", 1000) == "mille"
    assert words("it", 2000) == "duemila"


def test_dutch() -> None:
    assert words("nl", 21) == "eenentwintig"
    assert words("nl", 22) == "tweeëntwintig"
    assert words("nl", 33) == "drieëndertig"
    assert words("nl", 100) == "honderd"
    assert words("nl", 1000) == "duizend"


def test_russian() -> None:
    engine = NumberEngine.for_language("ru")
    result = engine.format_number(1)
    variants = set(result.text_by_ruleset.values())
    assert variants == {"один", "одна", "одно"}
    assert words("ru", 21) == "двадцать один"
    assert words("ru", 100) == "сто"
    assert words("ru", 1000) == "одна тысяча"
    assert words("ru", 2000) == "две тысячи"
    assert words("ru", 5000) == "пять тысяч"


def test_czech() -> None:
    engine = NumberEngine.for_language("cs")
    result = engine.format_number(2)
    variants = set(result.text_by_ruleset.values())
    assert variants == {"dva", "dvě"}
    assert words("cs", 21) == "dvacet jedna"
    assert words("cs", 100) == "sto"
    assert words("cs", 200) == "dvě stě"


def test_language_codes() -> None:
    assert NumberEngine.for_language("en_US").language == "en"
    assert NumberEngine.for_language("fr-FR").language == "fr"
    with pytest.raises(ValueError):
        NumberEngine.for_language("xx")
