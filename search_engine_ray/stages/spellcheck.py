"""Spellcheck dictionary build + suggestion engine (SURVEY.md §2.4 A4/A5,
§2.5 J4).

Reference pipeline (/root/reference/app/batch/spellcheck_dictionary.py):
``[a-z]{2,32}`` regex word counts over the corpus (SQL LATERAL
regexp_matches, :125-147) merged with external frequency lists, popularity =
4*log1p(df) + 2*log1p(tf) + 3*log1p(ext) (engine.py:103-108), filtered to
alpha words of 2-32 chars with any nonzero count, sorted desc, top-120k meta
artifact (:280-297).

Ours: map_batches regex explode with in-batch partial counts ->
groupby(word).sum() (the A4 shuffle), vectorized scoring, Dataset
sort + limit for the top-N artifact.  The suggestion lookup replaces pg_trgm
candidate generation (J4) with length-banded buckets + OSA verification — the
acceptance contract (engine.py:110-162) is unchanged.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.osa import (LexiconEntry, apply_case, choose_correction,
                             normalize_word, osa_distance, popularity_score)

from ..functions.text import WORD_RE  # noqa: E402 — the
# oracle-pinned word tokenizer, one shared definition


def word_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(word, total_frequency) over the corpus — A4 semantics
    (spellcheck_dictionary.py:125-147: [a-z]{2,32} over lowered text,
    occurrence counts)."""
    def explode(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counts.update(WORD_RE.findall((t or "").lower()))
        return pa.table({
            "word": pa.array(list(counts.keys()), pa.string()),
            "freq": pa.array(list(counts.values()), pa.int64()),
        })
    agg = docs.select_columns(["text"]).map_batches(
        explode, batch_format="pyarrow").groupby("word").aggregate(Sum("freq"))
    return agg.map_batches(
        lambda b: pa.table({"word": b.column("word"),
                            "total_frequency": b.column("sum(freq)")}),
        batch_format="pyarrow")


def doc_frequencies(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(word, doc_frequency) — distinct docs containing each word."""
    def explode(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counts.update(set(WORD_RE.findall((t or "").lower())))
        return pa.table({
            "word": pa.array(list(counts.keys()), pa.string()),
            "freq": pa.array(list(counts.values()), pa.int64()),
        })
    agg = docs.select_columns(["text"]).map_batches(
        explode, batch_format="pyarrow").groupby("word").aggregate(Sum("freq"))
    return agg.map_batches(
        lambda b: pa.table({"word": b.column("word"),
                            "doc_frequency": b.column("sum(freq)")}),
        batch_format="pyarrow")


def build_dictionary(docs: "ray.data.Dataset",
                     external_frequency: dict[str, int] | None = None,
                     *, top_n: int = 120_000) -> pa.Table:
    """Full dictionary: outer-merge of doc_freq / total_freq / external
    (A5), popularity-scored, filtered, sorted desc, top-N.

    Note: the reference's run() feeds doc_frequency as an EMPTY counter (its
    _collect_word_stats returns doc_frequency untouched,
    spellcheck_dictionary.py:157-171) — we compute real doc frequencies, the
    strictly more useful behavior, and the popularity formula is unchanged."""
    ext = external_frequency or {}
    tf = word_counts(docs)
    df = doc_frequencies(docs)

    # outer merge via union + groupby (D3 pattern); the external wordlist
    # joins as a third tagged branch so no driver-side word-set union exists
    tagged_tf = tf.map_batches(
        lambda b: pa.table({"word": b.column("word"),
                            "tf": b.column("total_frequency"),
                            "df": pa.array([0] * len(b), pa.int64()),
                            "ext": pa.array([0] * len(b), pa.int64())}),
        batch_format="pyarrow")
    tagged_df = df.map_batches(
        lambda b: pa.table({"word": b.column("word"),
                            "tf": pa.array([0] * len(b), pa.int64()),
                            "df": b.column("doc_frequency"),
                            "ext": pa.array([0] * len(b), pa.int64())}),
        batch_format="pyarrow")
    merged = tagged_tf.union(tagged_df)
    if ext:
        ext_words = sorted(ext)
        merged = merged.union(ray.data.from_arrow(pa.table({
            "word": pa.array(ext_words, pa.string()),
            "tf": pa.array([0] * len(ext_words), pa.int64()),
            "df": pa.array([0] * len(ext_words), pa.int64()),
            "ext": pa.array([int(ext[w]) for w in ext_words], pa.int64()),
        })))
    merged = merged.groupby("word").aggregate(Sum("tf"), Sum("df"),
                                              Sum("ext"))

    def score(b: pa.Table) -> pa.Table:
        import numpy as _np
        words_col = b.column("word").to_pylist()
        d = b.column("sum(df)").to_numpy(zero_copy_only=False)
        t = b.column("sum(tf)").to_numpy(zero_copy_only=False)
        e = b.column("sum(ext)").to_numpy(zero_copy_only=False)
        keep = _np.array([2 <= len(w) <= 32 and w.isalpha()
                          for w in words_col], dtype=bool)
        keep &= (d > 0) | (t > 0) | (e > 0)
        idx = _np.flatnonzero(keep)
        # vectorized popularity: same log1p kernel as the scalar formula
        pop = (_np.log1p(_np.maximum(d[idx], 0)) * 4.0
               + _np.log1p(_np.maximum(t[idx], 0)) * 2.0
               + _np.log1p(_np.maximum(e[idx], 0)) * 3.0)
        return pa.table({
            "word": pa.array([words_col[i] for i in idx], pa.string()),
            "doc_frequency": pa.array(d[idx], pa.int64()),
            "total_frequency": pa.array(t[idx], pa.int64()),
            "external_frequency": pa.array(e[idx], pa.int64()),
            "popularity_score": pa.array(pop, pa.float64()),
        })

    # distributed deterministic top-N: (popularity DESC, word ASC); only the
    # <= top_n surviving rows ever reach the driver
    top = merged.map_batches(score, batch_format="pyarrow").sort(
        ["popularity_score", "word"], descending=[True, False]).limit(top_n)
    tables = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
              else b for b in ray.get(top.to_arrow_refs())]
    tables = [t_ for t_ in tables if t_.num_rows] or tables[:1]
    return pa.concat_tables(tables, promote_options="default")


def write_meta_file(dictionary: pa.Table, path: str, *,
                    max_words: int = 120_000,
                    generated_at: str = "1970-01-01T00:00:00Z") -> str:
    """Top-N lexicon JSON artifact for query-side warm cache (reference S7,
    spellcheck_dictionary.py:280-297; timestamp pinned for determinism)."""
    import json
    import os
    top = dictionary.slice(0, max_words)
    payload = {
        "generated_at": generated_at,
        "words": [
            {"word": w, "doc_frequency": d, "total_frequency": t,
             "external_frequency": e, "popularity_score": p}
            for w, d, t, e, p in zip(
                top.column("word").to_pylist(),
                top.column("doc_frequency").to_pylist(),
                top.column("total_frequency").to_pylist(),
                top.column("external_frequency").to_pylist(),
                top.column("popularity_score").to_pylist())
        ],
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)
    return path


def load_meta_file(path: str) -> "SpellcheckLexicon":
    import json
    with open(path) as f:
        payload = json.load(f)
    words = payload["words"]
    table = pa.table({
        "word": pa.array([w["word"] for w in words], pa.string()),
        "doc_frequency": pa.array([w["doc_frequency"] for w in words],
                                  pa.int64()),
        "total_frequency": pa.array([w["total_frequency"] for w in words],
                                    pa.int64()),
        "external_frequency": pa.array([w["external_frequency"] for w in words],
                                       pa.int64()),
        "popularity_score": pa.array([w["popularity_score"] for w in words],
                                     pa.float64()),
    })
    return SpellcheckLexicon(table)


class SpellcheckLexicon:
    """Query-side lexicon actor state: the reference's pg_trgm candidate
    generation (J4, app/api/main.py:36-66) reproduced exactly — length band
    ±2, trigram-similarity > 0.3 (`word % input`), popularity floor 2.0,
    ORDER BY similarity DESC / popularity DESC, top-120 per word, with the
    first-letter fallback when the trigram set is empty — then the OSA
    acceptance contract (choose_correction)."""

    MAX_CANDIDATES = 120     # SPELLCHECK_MAX_CANDIDATES_PER_WORD
    MIN_POPULARITY = 2.0     # SPELLCHECK_MIN_CANDIDATE_POPULARITY

    def __init__(self, dictionary: pa.Table):
        from ..functions.trigram import trigrams
        self._entries: dict[str, LexiconEntry] = {}
        self._by_len: dict[int, list[LexiconEntry]] = {}
        self._tris: dict[str, frozenset] = {}
        for w, d, t, e, p in zip(
                dictionary.column("word").to_pylist(),
                dictionary.column("doc_frequency").to_pylist(),
                dictionary.column("total_frequency").to_pylist(),
                dictionary.column("external_frequency").to_pylist(),
                dictionary.column("popularity_score").to_pylist()):
            entry = LexiconEntry(w, int(d), int(t), int(e), float(p))
            self._entries[w] = entry
            self._by_len.setdefault(len(w), []).append(entry)
            self._tris[w] = trigrams(w)     # built once per actor (T3 cache)
        for band in self._by_len.values():
            band.sort(key=lambda x: (-x.popularity_score, x.word))

    def _band(self, n: int) -> list[LexiconEntry]:
        out: list[LexiconEntry] = []
        for l in range(max(2, n - 2), n + 3):       # length band ±2
            out.extend(self._by_len.get(l, ()))
        return out

    def candidates(self, word: str) -> list[LexiconEntry]:
        from ..functions.trigram import (SIMILARITY_THRESHOLD, trigrams)
        wt = trigrams(word)
        scored: list[tuple[float, LexiconEntry]] = []
        for e in self._band(len(word)):
            if e.popularity_score < self.MIN_POPULARITY:
                continue
            et = self._tris[e.word]
            union = len(wt | et)
            sim = (len(wt & et) / union) if union else 0.0
            if sim > SIMILARITY_THRESHOLD:
                scored.append((sim, e))
        if scored:
            # reference ORDER BY similarity DESC, popularity DESC (word ASC
            # added for determinism; Postgres leaves that tie unstable)
            scored.sort(key=lambda t: (-t[0], -t[1].popularity_score,
                                       t[1].word))
            return [e for _, e in scored[:self.MAX_CANDIDATES]]
        # SPELLCHECK_FALLBACK_SQL: first letter match, popularity DESC
        fb = [e for e in self._band(len(word))
              if e.popularity_score >= self.MIN_POPULARITY
              and e.word[:1] == word[:1]]
        fb.sort(key=lambda x: (-x.popularity_score, x.word))
        return fb[:self.MAX_CANDIDATES]

    def correct_word(self, word: str) -> str | None:
        norm = normalize_word(word)
        if not norm:
            return None
        known = self._entries.get(norm)
        return choose_correction(word=norm, known=known,
                                 candidates=self.candidates(norm))

    def correct_text(self, text: str) -> str:
        """Case-preserving whole-text correction (app/api/main.py:97-197
        behavior at the word level)."""
        def repl(m: re.Match) -> str:
            orig = m.group(0)
            corr = self.correct_word(orig)
            return apply_case(orig, corr) if corr else orig
        return re.sub(r"[A-Za-z]{2,32}", repl, text or "")


# -- SymSpell delete-variant path (legacy engine surface) --------------------
# The reference's SpellCheckerEngine.generate_deletes
# (/root/reference/app/spellcheck/engine.py:37-52) precomputed a
# `spellcheck_deletes` lookup table (dropped by migration 0005 in favor of
# pg_trgm, but still part of the engine's public surface).  SymSpell
# guarantee: two strings within OSA distance d share at least one delete
# variant when both sides expand up to d deletions — complete for every pair
# the acceptance contract admits (inputs of length <= 3 only accept
# distance-1 candidates, which always share a variant; the reference's
# expansion cutoff at length < 2 loses only 2-char-vs-distance-2 pairs,
# exactly the rejected class; property-tested in tests/test_stages.py).

def _delete_variants(word: str, max_distance: int = 2) -> set:
    """Reference generate_deletes semantics (engine.py:37-52): the distinct
    variants reachable by 1..max_distance single-character deletions; items
    shorter than 2 chars are never expanded further."""
    deletes: set = set()
    frontier = {word}
    for _ in range(max_distance):
        nxt = set()
        for item in frontier:
            if len(item) < 2:
                continue
            for i in range(len(item)):
                v = item[:i] + item[i + 1:]
                if v not in deletes:
                    deletes.add(v)
                    nxt.add(v)
        frontier = nxt
    return deletes


def symspell_deletes(dictionary: pa.Table, *,
                     max_distance: int = 2) -> "ray.data.Dataset":
    """(word, variant, distance) delete-variant table over the lexicon.

    The per-word loop runs over the BOUNDED top-N dictionary (<= 120k words,
    <= 32 chars each), never the corpus — at full scale the table is
    O(dict x len^2) rows built one bounded batch per task.  distance ==
    len(word) - len(variant) by construction (each step deletes exactly one
    character), which is what the SQL mirror exploits."""
    words = ray.data.from_arrow(dictionary.select(["word"]))

    def explode(batch: pa.Table) -> pa.Table:
        out_w: list = []
        out_v: list = []
        for w in batch.column("word").to_pylist():
            for v in _delete_variants(w, max_distance):
                out_w.append(w)
                out_v.append(v)
        dist = [len(a) - len(b) for a, b in zip(out_w, out_v)]
        return pa.table({
            "word": pa.array(out_w, pa.string()),
            "variant": pa.array(out_v, pa.string()),
            "distance": pa.array(dist, pa.int64()),
        })

    return words.map_batches(explode, batch_format="pyarrow")


def symspell_lookup(dictionary: pa.Table, inputs: list[str], *,
                    max_distance: int = 2) -> pa.Table:
    """Legacy SymSpell suggestion path: candidate = lexicon word whose
    delete-variant set (plus the word itself) intersects the input's, then
    the unchanged OSA acceptance contract (choose_correction,
    engine.py:110-162).

    The delete table streams as a Dataset; the input-side variant map (a few
    hundred strings per query word) is broadcast in the stage closure; only
    distinct (input, candidate) pairs reach the driver."""
    norm_inputs = []
    for w in inputs:
        n = normalize_word(w)
        norm_inputs.append(n)
    ivar_map: dict[str, set] = {}
    for q in norm_inputs:
        if not q:
            continue
        for v in _delete_variants(q, max_distance) | {q}:
            ivar_map.setdefault(v, set()).add(q)
    ivar_keys = pa.array(sorted(ivar_map), pa.string())

    deletes = symspell_deletes(dictionary, max_distance=max_distance)
    self_rows = ray.data.from_arrow(pa.table({
        "word": dictionary.column("word"),
        "variant": dictionary.column("word"),
        "distance": pa.array([0] * dictionary.num_rows, pa.int64()),
    }))

    def match(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sub = batch.filter(pc.is_in(batch.column("variant"),
                                    value_set=ivar_keys))
        qs_out: list = []
        ws_out: list = []
        # sub is the tiny intersection (bounded by the broadcast variant set)
        for v, w in zip(sub.column("variant").to_pylist(),
                        sub.column("word").to_pylist()):
            for q in ivar_map[v]:
                qs_out.append(q)
                ws_out.append(w)
        return pa.table({"input": pa.array(qs_out, pa.string()),
                         "cand": pa.array(ws_out, pa.string())})

    pairs = (deletes.union(self_rows)
             .map_batches(match, batch_format="pyarrow")
             .groupby(["input", "cand"]).count()
             .take_all())

    by_input: dict[str, list] = {}
    for r in pairs:
        by_input.setdefault(r["input"], []).append(r["cand"])
    entries = {w: LexiconEntry(w, int(d), int(t), int(e), float(p))
               for w, d, t, e, p in zip(
                   dictionary.column("word").to_pylist(),
                   dictionary.column("doc_frequency").to_pylist(),
                   dictionary.column("total_frequency").to_pylist(),
                   dictionary.column("external_frequency").to_pylist(),
                   dictionary.column("popularity_score").to_pylist())}

    out: list = []
    for q_orig, q in zip(inputs, norm_inputs):
        cands = [entries[c] for c in sorted(by_input.get(q, ()))]
        known = entries.get(q)
        corr = choose_correction(word=q, known=known, candidates=cands,
                                 max_distance=max_distance) if q else None
        out.append((q_orig, corr or ""))
    return pa.table({
        "word": pa.array([a for a, _ in out], pa.string()),
        "suggestion": pa.array([b for _, b in out], pa.string()),
    })
