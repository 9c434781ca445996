"""Tokenize stage: docs -> exploded posting triples + per-doc lengths.

Reference semantics M1 (SURVEY.md §2.2): regex ``\\b[a-zA-Z0-9]{2,}\\b`` on
lowercased text, stopword drop, Porter stem, term->tf counts
(/root/reference/app/crawler/tokenizer.py:32-40).

One pass produces BOTH outputs in a single union-typed stream so text is
tokenized exactly once:

  kind=0 rows: (term, doc_id, tf)      — posting triples
  kind=1 rows: (term='', doc_id, tf=doc_len) — per-doc token counts

Stateful setup (stem cache — Zipf head terms hit a dict, not the stemmer) is
once-per-actor via a callable class on an actor pool (SURVEY.md §2.3 T1).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.text import STOPWORDS, TOKEN_RE, StemCache
from ..util import default_pool_max

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


def tokenize_docs(docs: "ray.data.Dataset", *, batch_size: int = 2048,
                  concurrency=None, do_stem: bool = True,
                  drop_stopwords: bool = True) -> "ray.data.Dataset":
    """docs (with doc_id) -> combined triples + doclen Dataset (streaming)."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        TokenizeBatcher,
        fn_constructor_kwargs={"do_stem": do_stem,
                               "drop_stopwords": drop_stopwords},
        batch_format="pyarrow",
        batch_size=batch_size,
        # elastic pool — a fixed pool sized to the CPU count starves
        # downstream task operators (see stages/doc_ids.py)
        concurrency=(1, concurrency or default_pool_max()),
    )
