"""Tokenization + query-side text functions.

Reproduces the reference semantics bit-for-bit (they feed scoring, so rank
identity depends on them):

  * token regex ``\\b[a-zA-Z0-9]{2,}\\b`` on lowercased text
    (/root/reference/app/crawler/tokenizer.py:32)
  * stopword removal — the reference falls back to its hard-coded
    DEFAULT_STOPWORDS set when NLTK data is unavailable
    (/root/reference/app/crawler/tokenizer.py:6-28); NLTK is absent in this
    environment, so that set IS the pinned contract
  * Porter stemming (/root/reference/app/crawler/tokenizer.py:33,39) via the
    in-repo classic Porter implementation (functions/porter.py)
  * query normalizers + intent-score constant table
    (/root/reference/app/api/search_service.py:150-222)
"""

from __future__ import annotations

import math
import re
from collections import Counter

from .porter import stem as porter_stem

STOPWORDS = frozenset({
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if", "in",
    "into", "is", "it", "no", "not", "of", "on", "or", "such", "that", "the",
    "their", "then", "there", "these", "they", "this", "to", "was", "will",
    "with",
})

TOKEN_RE = re.compile(r"\b[a-zA-Z0-9]{2,}\b")
# the oracle-pinned word tokenizer shared by the spellcheck / BPE / LM /
# DSIR / embedding stages (the _WORDS DuckDB fragment mirrors it) — ONE
# definition so engine/oracle parity can't drift per stage
WORD_RE = re.compile(r"[a-z]{2,32}")
_NORMALIZE_RE = re.compile(r"[^a-z0-9]+")

# Field weights (/root/reference/app/api/search_service.py:22-26); transcript
# turns are single-field bodies (field 4, weight 1.0) — SURVEY.md §1.4.
FIELD_WEIGHTS = {1: 3.2, 2: 1.7}
DEFAULT_FIELD_WEIGHT = 1.0


class StemCache:
    """Memoizing wrapper around the Porter stemmer.

    Term distributions are Zipfian, so a per-worker cache turns stemming into
    a dict lookup for the hot head of the vocabulary.  Built once per actor /
    worker process (SURVEY.md §2.3 T1)."""

    __slots__ = ("_cache",)

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def stem(self, token: str) -> str:
        s = self._cache.get(token)
        if s is None:
            s = porter_stem(token)
            self._cache[token] = s
        return s


def tokenize(text: str, *, stemmer: StemCache | None = None,
             do_stem: bool = True, drop_stopwords: bool = True) -> Counter:
    """term -> tf Counter, reference tokenize() semantics
    (/root/reference/app/crawler/tokenizer.py:36-40).

    ``do_stem=False`` / ``drop_stopwords=False`` expose the unstemmed variants
    used by SQL-checkable pipelines and by the spellcheck word extractor."""
    tokens = TOKEN_RE.findall((text or "").lower())
    if drop_stopwords:
        tokens = [t for t in tokens if t not in STOPWORDS]
    if do_stem:
        if stemmer is None:
            stemmer = _MODULE_STEMMER
        tokens = [stemmer.stem(t) for t in tokens]
    return Counter(tokens)


_MODULE_STEMMER = StemCache()


def normalize_text(text: str) -> str:
    """Non-alnum runs -> single space, lowercased, stripped
    (/root/reference/app/api/search_service.py:150-151)."""
    return _NORMALIZE_RE.sub(" ", (text or "").lower()).strip()


def compact_text(text: str) -> str:
    """All non-alnum removed (/root/reference/app/api/search_service.py:197)."""
    return _NORMALIZE_RE.sub("", (text or "").lower())


def extract_query_words(text: str) -> list[str]:
    """Unstemmed, stopword-filtered, order-preserving-deduped query words
    (/root/reference/app/api/search_service.py:153-161)."""
    words: list[str] = []
    seen: set[str] = set()
    for term in TOKEN_RE.findall(text.lower()):
        if term in STOPWORDS or term in seen:
            continue
        words.append(term)
        seen.add(term)
    return words


def count_hits(text: str, query_words: list[str]) -> int:
    """(/root/reference/app/api/search_service.py:163-167)"""
    if not query_words:
        return 0
    word_set = set(TOKEN_RE.findall((text or "").lower()))
    return sum(1 for w in query_words if w in word_set)


def compact_word_hits(compact: str, query_words: list[str]) -> int:
    """(/root/reference/app/api/search_service.py:169-172)"""
    if not query_words or not compact:
        return 0
    return sum(1 for w in query_words if w in compact)


def intent_score(*, token_score: float, matched_terms: int, total_terms: int,
                 query_phrase: str, query_compact: str,
                 query_words: list[str], title: str, description: str,
                 url: str) -> float:
    """Stage-2 re-rank score — exact constant table from
    /root/reference/app/api/search_service.py:174-222."""
    score = math.log1p(max(float(token_score), 0.0)) * 12.0
    if total_terms:
        coverage = matched_terms / total_terms
        score += coverage * 25.0
        if matched_terms == total_terms:
            score += 40.0

    normalized_title = normalize_text(title)
    normalized_description = normalize_text(description)
    normalized_url = normalize_text(url)
    compact_url = compact_text(url)

    if query_phrase and query_phrase in normalized_title:
        score += 140.0
    if query_phrase and query_phrase in normalized_url:
        score += 70.0
    if query_phrase and query_phrase in normalized_description:
        score += 25.0
    if query_compact and query_compact in compact_url:
        score += 90.0

    title_hits = count_hits(title, query_words)
    url_hits = count_hits(url, query_words)
    c_url_hits = compact_word_hits(compact_url, query_words)
    score += title_hits * 22.0
    score += url_hits * 16.0
    score += c_url_hits * 12.0

    if query_words and title_hits == len(query_words):
        score += 80.0
    if query_words and url_hits == len(query_words):
        score += 55.0
    if query_words and c_url_hits == len(query_words):
        score += 45.0

    return score


def fallback_score(*, token_score: float, matched_terms: int,
                   total_terms: int) -> float:
    """Degraded-mode score used when stage-2 document text cannot be
    decoded: token features only, no title/description/url bonuses —
    exact formula from the reference's encoding-error retry
    (/root/reference/app/api/search_service.py:328-334)."""
    score = math.log1p(max(float(token_score), 0.0)) * 12.0
    if total_terms:
        score += (matched_terms / total_terms) * 25.0
        if matched_terms == total_terms:
            score += 40.0
    return score


CANDIDATE_BUFFER = 200
MAX_CANDIDATES = 2000


def candidate_limit(limit: int, offset: int) -> int:
    """(/root/reference/app/api/search_service.py:236-239)"""
    return min(MAX_CANDIDATES, max(offset + limit + CANDIDATE_BUFFER, limit * 10))


def search_context(q: str, limit: int, offset: int) -> dict | None:
    """Query-side context (/root/reference/app/api/search_service.py:224-240).
    Returns None for empty/all-stopword queries -> empty response."""
    query_terms = list(tokenize(q).keys())
    if not query_terms:
        return None
    query_words = extract_query_words(q)
    return {
        "query_terms": query_terms,
        "query_phrase": normalize_text(q),
        "query_compact": "".join(query_words),
        "query_words": query_words,
        "total_terms": len(query_terms),
        "candidate_limit": candidate_limit(limit, offset),
    }


def idf(doc_total: int, df: int) -> float:
    """BM25+ idf, always > 0 (/root/reference/app/batch/bm25_stats.py:21)."""
    return math.log((doc_total - df + 0.5) / (df + 0.5) + 1.0)


def bm25_score(tf: float, idf_value: float, doc_len: float, avgdl: float,
               k1: float = 1.2, b: float = 0.75) -> float:
    """True BM25 with k1/b saturation + length normalization — the engine's
    native scorer (SURVEY.md §1.3: the reference stores avg_doc_len but never
    uses it; we expose both modes)."""
    denom = tf + k1 * (1.0 - b + b * (doc_len / avgdl if avgdl > 0 else 1.0))
    return idf_value * tf * (k1 + 1.0) / denom if denom > 0 else 0.0


def quality_score(word_count: int, outbound_link_count: int) -> float:
    """(/root/reference/app/crawler/worker.py:146-152)"""
    if word_count == 0:
        return 0.0
    density = min(1.0, word_count / 300)
    link_penalty = min(0.4, outbound_link_count / word_count)
    return max(0.0, density - link_penalty)


def freshness_score(age_days: int | None) -> float:
    """(/root/reference/app/crawler/worker.py:154-159); age computed against a
    pinned build timestamp for determinism (SURVEY.md §2.2 M7)."""
    if age_days is None:
        return 0.1
    return max(0.0, 1.0 - min(365, age_days) / 365)
