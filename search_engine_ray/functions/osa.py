"""Spellcheck scalar engine: OSA edit distance, popularity score, correction
acceptance — reference semantics from /root/reference/app/spellcheck/engine.py.

OSA = optimal string alignment (Levenshtein + adjacent transposition), with a
max-distance band and early abort when a whole row exceeds the cap
(:54-101).  Correction choice ranks candidates by
(distance, -popularity, -doc_freq, -total_freq, word) and applies the
reference's acceptance thresholds (:110-162): known-word multiplier 1.8 @d=1 /
4.0 @d=2; unknown-word minimum popularity 0.5 / 2.5; words of length <= 3 only
accept distance 1.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterable

MAX_EDIT_DISTANCE = 2


@dataclass(frozen=True)
class LexiconEntry:
    word: str
    doc_frequency: int = 0
    total_frequency: int = 0
    external_frequency: int = 0
    popularity_score: float = 0.0


def normalize_word(word: str) -> str:
    return (word or "").strip().lower()


def osa_distance(source: str, target: str,
                 max_distance: int = MAX_EDIT_DISTANCE) -> int | None:
    source = normalize_word(source)
    target = normalize_word(target)
    if source == target:
        return 0
    if not source or not target:
        d = max(len(source), len(target))
        return d if d <= max_distance else None
    if abs(len(source) - len(target)) > max_distance:
        return None

    rows, cols = len(source) + 1, len(target) + 1
    dp = [[0] * cols for _ in range(rows)]
    for i in range(rows):
        dp[i][0] = i
    for j in range(cols):
        dp[0][j] = j

    for i in range(1, rows):
        row_min = max_distance + 1
        for j in range(1, cols):
            cost = 0 if source[i - 1] == target[j - 1] else 1
            value = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                        dp[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and source[i - 1] == target[j - 2]
                    and source[i - 2] == target[j - 1]):
                value = min(value, dp[i - 2][j - 2] + 1)
            dp[i][j] = value
            if value < row_min:
                row_min = value
        if row_min > max_distance:
            return None

    d = dp[-1][-1]
    return d if d <= max_distance else None


def popularity_score(doc_frequency: int, total_frequency: int,
                     external_frequency: int) -> float:
    """4*log1p(df) + 2*log1p(tf) + 3*log1p(ext)
    (/root/reference/app/spellcheck/engine.py:103-108)."""
    return (math.log1p(max(doc_frequency, 0)) * 4.0
            + math.log1p(max(total_frequency, 0)) * 2.0
            + math.log1p(max(external_frequency, 0)) * 3.0)


def choose_correction(*, word: str, known: LexiconEntry | None,
                      candidates: Iterable[LexiconEntry],
                      max_distance: int = MAX_EDIT_DISTANCE) -> str | None:
    normalized = normalize_word(word)
    if not normalized:
        return None
    known_popularity = known.popularity_score if known else 0.0

    best: LexiconEntry | None = None
    best_distance: int | None = None
    best_rank: tuple | None = None
    for cand in candidates:
        if cand.word == normalized:
            continue
        distance = osa_distance(normalized, cand.word, max_distance=max_distance)
        if distance is None:
            continue
        if len(normalized) <= 3 and distance > 1:
            continue
        rank = (distance, -cand.popularity_score, -cand.doc_frequency,
                -cand.total_frequency, cand.word)
        if best_rank is None or rank < best_rank:
            best_rank, best, best_distance = rank, cand, distance

    if best is None or best_distance is None:
        return None
    if known_popularity > 0.0:
        required = 1.8 if best_distance == 1 else 4.0
        if best.popularity_score < known_popularity * required:
            return None
    else:
        minimum = 0.5 if best_distance == 1 else 2.5
        if best.popularity_score < minimum:
            return None
    return best.word


def apply_case(original: str, replacement: str) -> str:
    """Case-preserving substitution (/root/reference/app/spellcheck/engine.py:164-169)."""
    if original.isupper():
        return replacement.upper()
    if original[:1].isupper() and original[1:].islower():
        return replacement.capitalize()
    return replacement
