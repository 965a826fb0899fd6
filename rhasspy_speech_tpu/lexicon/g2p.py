"""Lexicon database and grapheme→phoneme helpers.

Same capabilities as the reference's g2p layer
(/root/reference/rhasspy_speech/g2p.py:23-290): a SQLite-backed pronunciation
lexicon (tables ``word_phonemes(word, phonemes, pron_order)`` and
``g2p_alignments(word, alignment)``) with case-variation lookup and an
in-memory overlay, plus "sounds like" pronunciation synthesis from word
references, literal ``/phoneme/`` strings, and ``[part]ial`` word segments via
stored g2p alignments. Pronunciation *guessing* for unknown words is served by
our own FST shortest-path G2P decoder (lexicon/guess.py) instead of a
Phonetisaurus subprocess.
"""

from __future__ import annotations

import itertools
import sqlite3
from collections.abc import Iterable
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import regex as re

_SOUNDS_LIKE_PARTIAL = re.compile(r"^([^[]*)\[([^]]+)].*$")
_INITIALISM_NO_DOTS = re.compile(r"^(?:\p{Lu}){2,}$")
_INITIALISM_DOTS = re.compile(r"^(?:\p{L}\.){2,}$")
_NUMBER_SPLIT = re.compile(r"(\d+(?:\.\d+)?)")
_NUMBER = re.compile(r"^\d+(\.\d+)?$")


class LexiconDatabase:
    """Pronunciation lexicon over SQLite with an in-memory overlay cache."""

    def __init__(self, db_path: Optional[Union[str, Path]] = None) -> None:
        self.db_path = Path(db_path) if db_path else None
        self._conn = sqlite3.Connection(str(self.db_path)) if self.db_path else None
        self._cache: Dict[str, Optional[List[List[str]]]] = {}

    def add(self, word: str, pronunciations: List[List[str]]) -> None:
        cached = self._cache.get(word)
        if cached is None:
            self._cache[word] = pronunciations
        else:
            cached.extend(pronunciations)

    def exists(self, word: str) -> bool:
        if (not self._cache) and (self._conn is not None):
            # Preload the word list as placeholders for fast membership checks
            for row in self._conn.execute("SELECT DISTINCT word FROM word_phonemes"):
                self._cache[row[0]] = None

        return any(variant in self._cache for variant in self._word_variations(word))

    def lookup(self, word: str) -> List[List[str]]:
        variants = list(self._word_variations(word))
        for variant in variants:
            cached = self._cache.get(variant)
            if cached is not None:
                return cached

        if self._conn is None:
            return []

        prons: List[List[str]] = []
        for variant in variants:
            rows = self._conn.execute(
                "SELECT phonemes FROM word_phonemes WHERE word = ? ORDER by pron_order",
                (variant,),
            )
            prons.extend(row[0].split() for row in rows)
            if prons:
                # First matching variation wins
                self._cache[variant] = prons
                break

        self._cache[word] = prons
        return prons

    def alignments(self, word: str) -> List[str]:
        if self._conn is None:
            return []

        for variant in self._word_variations(word):
            rows = self._conn.execute(
                "SELECT alignment FROM g2p_alignments WHERE word = ?", (variant,)
            )
            found = [row[0] for row in rows]
            if found:
                return found

        return []

    @staticmethod
    def _word_variations(word: str) -> Iterable[str]:
        yield word
        word_lower = word.lower()
        if word_lower != word:
            yield word_lower
        word_casefold = word.casefold()
        if word_casefold != word_lower:
            yield word_casefold
        word_upper = word.upper()
        if word_upper != word:
            yield word_upper


# ---------------------------------------------------------------------------


def split_words(
    text: str, lexicon: LexiconDatabase, number_engine=None
) -> List[Union[str, Tuple[str, Optional[str]]]]:
    """Split template text into speakable words for the lexicon.

    Unknown tokens get digit/letter expansion: ``abc123`` → ``abc 123``,
    ``NASA``/``A.B.C.`` → letters, numbers → words (tagged with the original
    digit string as the output label, reference g2p.py:140-148).
    """
    words: List[Union[str, Tuple[str, Optional[str]]]] = []
    for word in text.split():
        if lexicon.exists(word):
            words.append(word)
            continue

        for sub_word in _NUMBER_SPLIT.split(word):
            if not sub_word:
                continue

            if lexicon.exists(sub_word):
                words.append(sub_word)
            elif _INITIALISM_NO_DOTS.match(sub_word):
                words.extend(list(sub_word))
            elif _INITIALISM_DOTS.match(sub_word):
                words.extend(c for c in sub_word if c != ".")
            elif _NUMBER.match(sub_word) and (number_engine is not None):
                number_words = (
                    number_engine.format_number(sub_word)
                    .text.replace("-", " ")
                    .split()
                )
                for idx, number_word in enumerate(number_words):
                    # First word carries the digits as its output label
                    words.append((number_word, sub_word if idx == 0 else None))
            else:
                words.append(sub_word)  # pronunciation guessed later

    return words


# ---------------------------------------------------------------------------


def get_sounds_like(
    sounds_like: Iterable[str], lexicon: LexiconDatabase
) -> List[List[str]]:
    """Build pronunciations from a "sounds like" description.

    Tokens may be known words, ``/P1 P2/`` literal phoneme strings, or
    ``[seg]ment`` partial-word references resolved via g2p alignments.
    Returns the cartesian product of all alternatives.
    """
    in_phoneme = False
    known_phonemes: List[List[List[str]]] = []
    current_phonemes: List[str] = []

    for token in sounds_like:
        if token.startswith("/"):
            in_phoneme = True
            token = token[1:]
            current_phonemes = []

        end_slash = token.endswith("/")
        if end_slash:
            token = token[:-1]

        if in_phoneme:
            current_phonemes.append(token)
        else:
            partial = _SOUNDS_LIKE_PARTIAL.match(token)
            if partial:
                word = re.sub(r"[\[\]]", "", token)
                known_phonemes.append(
                    list(
                        get_aligned_phonemes(
                            lexicon, word, partial.group(1), partial.group(2)
                        )
                    )
                )
            else:
                known_phonemes.append(lexicon.lookup(token))

        if end_slash:
            in_phoneme = False
            if current_phonemes:
                known_phonemes.append([current_phonemes])

    return [
        list(itertools.chain(*combo)) for combo in itertools.product(*known_phonemes)
    ]


def get_aligned_phonemes(
    lexicon: LexiconDatabase, word: str, prefix: str, body: str
) -> Iterable[List[str]]:
    """Yield phoneme sequences for the ``body`` segment of ``word``.

    Alignment format (one g2p joint-model alignment per line):
    ``t}t e}ˈɛ s}s t}t`` where ``}`` separates graphemes}phonemes, ``|``
    separates multiple tokens, and ``_`` marks an empty output.
    """
    for alignment in lexicon.alignments(word):
        pairs: List[Tuple[List[str], List[str]]] = []
        for part in alignment.split():
            part_in, part_out = part.split("}")
            graphemes = part_in.split("|")
            phonemes = [] if part_out == "_" else part_out.split("|")
            pairs.append((graphemes, phonemes))

        can_match = True
        prefix_chars = list(prefix)
        body_chars = list(body)
        collected: List[str] = []

        for graphemes, phonemes in pairs:
            graphemes = list(graphemes)
            phonemes = list(phonemes)

            while prefix_chars and graphemes:
                if graphemes[0] != prefix_chars[0]:
                    can_match = False
                    break
                prefix_chars.pop(0)
                graphemes.pop(0)

            while body_chars and graphemes:
                if graphemes[0] != body_chars[0]:
                    can_match = False
                    break
                body_chars.pop(0)
                graphemes.pop(0)
                if phonemes:
                    collected.append(phonemes.pop(0))

            if (not can_match) or (not body_chars):
                break

        if can_match and collected:
            yield collected
