"""Tokenize stage: docs -> exploded posting triples + per-doc lengths.

Reference semantics M1 (SURVEY.md §2.2): regex ``\\b[a-zA-Z0-9]{2,}\\b`` on
lowercased text, stopword drop, Porter stem, term->tf counts
(/root/reference/app/crawler/tokenizer.py:32-40).

One pass produces BOTH outputs in a single union-typed stream so text is
tokenized exactly once:

  kind=0 rows: (term, doc_id, tf)      — posting triples
  kind=1 rows: (term='', doc_id, tf=doc_len) — per-doc token counts

Stateful setup (stem cache — Zipf head terms hit a dict, not the stemmer) is
once per WORKER PROCESS (SURVEY.md §2.3 T1): tokenize runs as plain tasks on
Ray's long-lived shared worker pool and lazily builds a process-global
``TokenizeBatcher``, which gives actor-pool-style state reuse without actor
spawn / autoscaling ramp-up dead time.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.text import STOPWORDS, TOKEN_RE, StemCache

COMBINED_SCHEMA = pa.schema([
    ("kind", pa.int8()),
    ("term", pa.string()),
    ("doc_id", pa.int64()),
    ("tf", pa.int32()),
])


class TokenizeBatcher:
    """map_batches callable class: docs batch -> combined triples/doclen batch."""

    def __init__(self, *, do_stem: bool = True, drop_stopwords: bool = True):
        self._stemmer = StemCache()
        self._do_stem = do_stem
        self._drop_stopwords = drop_stopwords

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()

        kinds: list[int] = []
        terms: list[str] = []
        out_docs: list[int] = []
        tfs: list[int] = []

        findall = TOKEN_RE.findall
        stopwords = STOPWORDS
        stem = self._stemmer.stem
        do_stem = self._do_stem
        drop_stop = self._drop_stopwords

        for text, doc_id in zip(texts, doc_ids):
            counts: dict[str, int] = {}
            doc_len = 0
            for tok in findall((text or "").lower()):
                if drop_stop and tok in stopwords:
                    continue
                if do_stem:
                    tok = stem(tok)
                doc_len += 1
                counts[tok] = counts.get(tok, 0) + 1
            n_terms = len(counts)
            kinds.extend([0] * n_terms)
            terms.extend(counts.keys())
            out_docs.extend([doc_id] * n_terms)
            tfs.extend(counts.values())
            # doc-length row (every doc, including empty -> doc_len 0; the
            # reference counts all 'done' docs in N/avgdl, bm25_stats.py:9-13)
            kinds.append(1)
            terms.append("")
            out_docs.append(doc_id)
            tfs.append(doc_len)

        return pa.table({
            "kind": pa.array(kinds, pa.int8()),
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(out_docs, pa.int64()),
            "tf": pa.array(tfs, pa.int32()),
        })


# Per-worker-process TokenizeBatcher instances, keyed by flags.  Tasks reuse
# Ray's long-lived worker processes, so this is the same once-per-process
# state (T1 stem memo) an actor pool provides — without paying actor-process
# spawn + autoscaling ramp-up, which measured 3-5 s of dead time per build on
# 32 CPUs (the prewarmed task workers are reused instantly, a fresh actor
# pool is not).
_PROC_BATCHERS: dict[tuple, TokenizeBatcher] = {}


def _tokenize_task(batch: pa.Table, *, do_stem: bool,
                   drop_stopwords: bool) -> pa.Table:
    key = (do_stem, drop_stopwords)
    tb = _PROC_BATCHERS.get(key)
    if tb is None:
        tb = _PROC_BATCHERS[key] = TokenizeBatcher(
            do_stem=do_stem, drop_stopwords=drop_stopwords)
    return tb(batch)


def make_tokenize_fn(*, do_stem: bool = True, drop_stopwords: bool = True):
    """Picklable per-batch tokenize callable (docs batch -> combined batch).

    Used by the fused build path: ``build_segments`` composes this with the
    run combiner inside ONE map_batches task, so the exploded triples table
    (20+ B/posting, ~10x the compact-run volume) lives only in that task's
    heap and never lands in the object store.  Without fusion the triples
    queue ahead of the Sort barrier and Ray's memory-reservation policy
    throttles the combiner to a single task once the store fills (measured
    38.4M turns / 4 CPUs: 2737 s serialized vs healthy ~850 s)."""
    import functools
    return functools.partial(_tokenize_task, do_stem=do_stem,
                             drop_stopwords=drop_stopwords)


def tokenize_docs(docs: "ray.data.Dataset", *, batch_size: int = 2048,
                  concurrency=None, do_stem: bool = True,
                  drop_stopwords: bool = True) -> "ray.data.Dataset":
    """docs (with doc_id) -> combined triples + doclen Dataset (streaming).

    Runs as plain tasks on the shared worker pool; per-process stem state
    comes from ``_PROC_BATCHERS`` (``concurrency`` caps the task
    parallelism when given)."""
    import functools
    fn = functools.partial(_tokenize_task, do_stem=do_stem,
                           drop_stopwords=drop_stopwords)
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, **kwargs)
