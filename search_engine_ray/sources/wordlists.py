"""Offline external word-frequency sources (FIXTURES.md F3).

The reference streams two public frequency lists over HTTP
(/root/reference/app/batch/spellcheck_dictionary.py:28-110): a "counted"
format (``word count`` per line) and a "ranked" format (one word per line).
No network here, so deterministic local fixtures stand in; parsing + scoring
semantics are the reference's exactly:

  counted: score = int(log1p(count) * 6.0 * weight)        (:93)
  ranked:  score = int(log1p(max(1, limit-rank+1)) * 5.0 * weight)  (:98)

Malformed lines (missing/non-digit count, <2 chars, non-alpha) are skipped
(:62-75).
"""

from __future__ import annotations

import math
import os
from collections import Counter

from ..functions.osa import normalize_word


def _parse_counted_line(line: str) -> tuple[str, int] | None:
    parts = line.split()
    if len(parts) < 2:
        return None
    word = normalize_word(parts[0])
    if not word.isalpha() or len(word) < 2:
        return None
    count_token = parts[1].replace(",", "")
    if not count_token.isdigit():
        return None
    return word, int(count_token)


def collect_external_frequencies(sources: list[tuple[str, str, int, float]]
                                 ) -> Counter:
    """sources: (path, mode, limit, weight). Returns word -> score counter."""
    external: Counter = Counter()
    for path, mode, limit, weight in sources:
        loaded = 0
        with open(path, encoding="utf-8", errors="ignore") as f:
            # blank lines are filtered BEFORE rank assignment (reference
            # _fetch_lines yields only non-empty stripped lines,
            # spellcheck_dictionary.py:55-59) — counting them would shift
            # every later word's rank and thus its log-rank score
            nonblank = (l for l in (l.strip() for l in f) if l)
            for rank, raw in enumerate(nonblank, start=1):
                if loaded >= limit:
                    break
                if mode == "counted":
                    parsed = _parse_counted_line(raw)
                    if parsed is None:
                        continue
                    word, raw_count = parsed
                    score = int(math.log1p(raw_count) * 6.0 * weight)
                else:
                    word = normalize_word(raw.split()[0])
                    if not word.isalpha() or len(word) < 2:
                        continue
                    score = int(math.log1p(max(1, limit - rank + 1)) * 5.0 * weight)
                if score <= 0:
                    continue
                external[word] += score
                loaded += 1
    return external


def write_fixture_wordlists(dir_path: str, *, seed: int = 42
                            ) -> list[tuple[str, str, int, float]]:
    """Deterministic counted + ranked fixture lists with malformed lines."""
    import numpy as np
    rng = np.random.default_rng(seed)
    os.makedirs(dir_path, exist_ok=True)

    def alpha_suffix(i: int) -> str:
        # base-26 letters so fixture words stay purely alphabetic (the
        # parser rejects non-alpha words, spellcheck_dictionary.py:69)
        s = ""
        for _ in range(3):
            s = chr(97 + i % 26) + s
            i //= 26
        return s

    counted = os.path.join(dir_path, "freq_counted.txt")
    with open(counted, "w") as f:
        for i in range(2000):
            f.write(f"extword{alpha_suffix(i)} "
                    f"{int(rng.integers(10, 1_000_000))}\n")
        f.write("nocount\n")            # missing count
        f.write("badcount xyz\n")       # non-digit count
        f.write("a 500\n")              # 1-char word
        f.write("num3ric 500\n")        # non-alpha word

    ranked = os.path.join(dir_path, "freq_ranked.txt")
    with open(ranked, "w") as f:
        for i in range(1000):
            f.write(f"rankword{alpha_suffix(i)}\n")
        f.write("x\n")                  # 1-char
        f.write("w0rd\n")               # non-alpha

    return [(counted, "counted", 50_000, 1.0),
            (ranked, "ranked", 20_000, 1.0)]
