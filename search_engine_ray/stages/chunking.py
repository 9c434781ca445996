"""Document chunking + per-document keyword extraction (tf-idf top-k).

Training-data / RAG prep operators over the ``documents`` table:

* ``chunk_documents``: split each document into overlapping fixed-size
  token windows (window W, stride S) — the standard chunking step before
  embedding or sequence packing.  Embarrassingly parallel: one
  ``map_batches`` pass, no shuffle; chunk assembly is vectorized (one
  ``ListArray.from_arrays`` + ``pc.binary_join`` per batch, the only
  row-wise work is the regex word extraction shared with the M10 word
  extractor).
* ``tfidf_top_terms``: per-document top-k terms by tf-idf.  A document's
  term frequencies are complete within its own row, so tf and the per-doc
  top-k are computed in-batch; the only exchange is the vocabulary-sized
  document-frequency groupby, whose result is broadcast once via
  ``ray.put`` (vocabulary = distinct ``[a-z]{2,32}`` words; for corpora
  whose vocabulary exceeds driver memory the df side would cut over to a
  hash join keyed by word, the same cutover class as
  stages/doc_ids.py).

Word semantics are the reference's M10 extractor ``[a-z]{2,32}`` over
lowered text (/root/reference/app/batch/spellcheck_dictionary.py:125-147),
shared via ``functions.text.WORD_RE`` so the DuckDB oracle reproduces the
token stream exactly.  The tf-idf score is integerized through the pinned
``ln_microunits`` convention (functions/rounding.py) so ordering and values
are bit-stable across the engine and the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.rounding import ln_microunits
from ..functions.text import WORD_RE

DEFAULT_WINDOW = 32     # tokens per chunk
DEFAULT_STRIDE = 24     # tokens between chunk starts (W - S = 8 overlap)
DEFAULT_TOP_K = 5


def _chunk_batch(batch: pa.Table, *, window: int, stride: int) -> pa.Table:
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    tok_lists = [WORD_RE.findall((t or "").lower()) for t in texts]
    n_words = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                          count=len(tok_lists))
    n_chunks = np.where(n_words > 0, (n_words - 1) // stride + 1, 0)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })

    doc_rep = np.repeat(np.arange(len(texts)), n_chunks)
    # chunk_idx within each doc: global arange minus each doc's first slot
    first = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
    chunk_idx = np.arange(total) - np.repeat(first, n_chunks)
    starts = chunk_idx * stride                       # in-doc token offset
    lens = np.minimum(window, n_words[doc_rep] - starts)

    # Gather every chunk's tokens from the flat batch token stream with one
    # take (overlap = duplicated indices), then join per chunk in Arrow.
    flat = pa.array([w for toks in tok_lists for w in toks], pa.string())
    doc_base = np.concatenate(([0], np.cumsum(n_words)))[:-1]
    abs_starts = doc_base[doc_rep] + starts
    offsets = np.concatenate(([0], np.cumsum(lens)))
    take_idx = np.repeat(abs_starts, lens) + (
        np.arange(offsets[-1]) - np.repeat(offsets[:-1], lens))
    chunks = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      flat.take(pa.array(take_idx)))
    return pa.table({
        "doc_id": pa.array(ids[doc_rep], pa.int64()),
        "chunk_idx": pa.array(chunk_idx, pa.int64()),
        "n_tokens": pa.array(lens, pa.int64()),
        "chunk_text": pc.binary_join(chunks, " "),
    })


def chunk_documents(docs: "ray.data.Dataset", *,
                    window: int = DEFAULT_WINDOW,
                    stride: int = DEFAULT_STRIDE) -> "ray.data.Dataset":
    """(doc_id, chunk_idx, n_tokens, chunk_text) overlapping token windows.

    Zero-word documents emit no chunks; the final chunk of a document is
    short (``n_tokens < window``) rather than padded.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    return docs.select_columns(["doc_id", "text"]).map_batches(
        lambda b: _chunk_batch(b, window=window, stride=stride),
        batch_format="pyarrow")


def document_frequency_map(docs: "ray.data.Dataset") -> dict[str, int]:
    """word -> number of documents containing it (vocabulary-sized driver
    dict; see module docstring for the join-mode cutover note)."""
    from .spellcheck import doc_frequencies
    out: dict[str, int] = {}
    for b in doc_frequencies(docs).iter_batches(batch_format="pyarrow"):
        out.update(zip(b.column("word").to_pylist(),
                       b.column("doc_frequency").to_pylist()))
    return out


class _TfidfTopK:
    """Per-batch tf + broadcast-idf lookup + in-batch per-doc top-k."""

    def __init__(self, df_ref, n_docs: int, k: int):
        df_map: dict[str, int] = ray.get(df_ref) if not isinstance(
            df_ref, dict) else df_ref
        self._k = k
        self._words = np.asarray(list(df_map.keys()), dtype=object)
        dfs = np.fromiter(df_map.values(), dtype=np.float64,
                          count=len(df_map))
        self._idf_micro = ln_microunits(np.log(float(n_docs) / dfs))
        self._index = {w: i for i, w in enumerate(self._words)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "word": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "tfidf_micro": pa.array([], pa.int64()),
        })
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        tok_lists = [WORD_RE.findall((t or "").lower()) for t in texts]
        n_words = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                              count=len(tok_lists))
        flat = [w for toks in tok_lists for w in toks]
        if not flat:
            return empty
        # One batch-level factorize (sort=True: code order == word order),
        # then exact per-(doc, word) tf via np.unique over packed keys.
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=True)
        doc_rep = np.repeat(np.arange(len(texts)), n_words)
        pair, tf = np.unique(doc_rep * np.int64(len(uniq)) + codes,
                             return_counts=True)
        d, c = pair // len(uniq), pair % len(uniq)
        vocab_idx = np.fromiter((self._index[w] for w in uniq),
                                dtype=np.int64, count=len(uniq))
        score = tf.astype(np.int64) * self._idf_micro[vocab_idx[c]]
        # per-doc (score desc, word asc): np.unique output is already
        # (doc asc, code asc)-ordered, so a stable sort on the remaining
        # keys keeps the code-asc tie-break
        order = np.lexsort((-score, d))
        d, c, tf, score = d[order], c[order], tf[order], score[order]
        first = np.concatenate(([0], 1 + np.flatnonzero(np.diff(d))))
        rank = np.arange(len(d)) - np.repeat(
            first, np.diff(np.concatenate((first, [len(d)]))))
        keep = rank < self._k
        return pa.table({
            "doc_id": pa.array(ids[d[keep]], pa.int64()),
            "rank": pa.array(rank[keep] + 1, pa.int64()),
            "word": pa.array(uniq[c[keep]], pa.string()),
            "tf": pa.array(tf[keep], pa.int64()),
            "tfidf_micro": pa.array(score[keep], pa.int64()),
        })


def tfidf_top_terms(docs: "ray.data.Dataset", *,
                    k: int = DEFAULT_TOP_K) -> "ray.data.Dataset":
    """(doc_id, rank, word, tf, tfidf_micro) — top-k terms per document by
    tf * ln(N/df) in ln-microunits, rank ties broken word-ascending.

    N counts all documents (including zero-word ones).  ``docs`` must be
    consumable twice (a Parquet read re-executes; a derived lineage is
    re-run by Ray — both fine, the df pass reads only ``text``).
    """
    n_docs = docs.count()
    df_ref = ray.put(document_frequency_map(docs))
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _TfidfTopK, fn_constructor_args=(df_ref, n_docs, k),
        concurrency=(1, 8), batch_format="pyarrow")
