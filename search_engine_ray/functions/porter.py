"""Classic Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980) — pure-Python, dependency-free.

The reference engine stems with ``nltk.stem.PorterStemmer``
(/root/reference/app/crawler/tokenizer.py:33).  NLTK is not available in this
environment, so the published 1980 algorithm is pinned as THE stemmer for both
the Ray engine and the in-repo oracle; rank-identity tests compare engine vs
oracle under this single implementation (SURVEY.md §5 float/stemmer pinning
rule).

Implementation notes (all from the public algorithm definition):
  * a letter is a consonant when it is not a,e,i,o,u and not a 'y' preceded by
    a consonant ('y' at position 0 is a consonant);
  * m() is the measure of the [C](VC)^m[V] decomposition of the stem;
  * each step applies only the longest matching suffix rule; if its condition
    fails, no other rule in that step fires;
  * words of length 1-2 are returned unchanged.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in [C](VC)^m[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_cons(stem, len(stem) - 1)
    )


def _ends_cvc(stem: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(stem) < 3:
        return False
    return (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
        and stem[-1] not in "wxy"
    )


# (suffix, replacement, min_measure) tables for steps 2-4; longest match wins.
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _longest_rule(word: str, rules) -> tuple[str, str] | None:
    best = None
    for suffix, repl in rules:
        if word.endswith(suffix) and (best is None or len(suffix) > len(best[0])):
            best = (suffix, repl)
    return best


def stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        fired = False
        if w.endswith("ed") and _contains_vowel(w[:-2]):
            w = w[:-2]
            fired = True
        elif w.endswith("ing") and _contains_vowel(w[:-3]):
            w = w[:-3]
            fired = True
        if fired:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    # Step 1c
    if w.endswith("y") and _contains_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    rule = _longest_rule(w, _STEP2)
    if rule is not None:
        suffix, repl = rule
        if _measure(w[: -len(suffix)]) > 0:
            w = w[: -len(suffix)] + repl

    # Step 3
    rule = _longest_rule(w, _STEP3)
    if rule is not None:
        suffix, repl = rule
        if _measure(w[: -len(suffix)]) > 0:
            w = w[: -len(suffix)] + repl

    # Step 4
    best = None
    for suffix in _STEP4:
        if w.endswith(suffix) and (best is None or len(suffix) > len(best)):
            best = suffix
    if best is not None:
        stem_part = w[: -len(best)]
        if _measure(stem_part) > 1 and (
            best != "ion" or (stem_part and stem_part[-1] in "st")
        ):
            w = stem_part

    # Step 5a
    if w.endswith("e"):
        base = w[:-1]
        m = _measure(base)
        if m > 1 or (m == 1 and not _ends_cvc(base)):
            w = base

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


class PorterStemmer:
    """Drop-in object API mirroring the reference's stemmer usage
    (``stemmer.stem(t)``, /root/reference/app/crawler/tokenizer.py:39)."""

    def stem(self, word: str) -> str:
        return stem(word)
