"""pg_trgm-compatible trigram similarity (public PostgreSQL pg_trgm
semantics: lowercase the word, pad with two leading and one trailing space,
take all 3-grams, similarity = |A∩B| / |A∪B|).

The reference's spellcheck candidate generation is a pg_trgm ``word %
input`` lateral join (/root/reference/app/api/main.py:36-56); this module
lets the engine reproduce that candidate set without Postgres.
"""

from __future__ import annotations

# pg_trgm's default similarity_threshold (the `%` operator cutoff)
SIMILARITY_THRESHOLD = 0.3


def trigrams(word: str) -> frozenset[str]:
    """Trigram set of one lowercase word, pg_trgm padding ('  w' + ' ')."""
    w = f"  {word.lower()} "
    return frozenset(w[i:i + 3] for i in range(len(w) - 2))


def similarity(a: str, b: str) -> float:
    """pg_trgm similarity(a, b): trigram-set Jaccard."""
    ta, tb = trigrams(a), trigrams(b)
    if not ta or not tb:
        return 0.0
    inter = len(ta & tb)
    union = len(ta | tb)
    return inter / union if union else 0.0
