"""DSIR importance weights (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling") — hashed-n-gram importance weighting of
a raw corpus toward a target distribution.

The published recipe: featurize every document as a bag of hashed word
uni+bigrams over B buckets, fit smoothed bucket-frequency models p̂
(target corpus) and q̂ (raw corpus), and weight each raw document by
log w(x) = Σ_b count_x[b]·(ln p̂[b] − ln q̂[b]); resampling then draws
proportionally to w.  This module computes the exact log-weights — the
resample draw composes with the existing weighted-priority sampler
(``curation.sample_weighted``).

Scale shape (100 TB raw corpus, any-size target):
  1. ONE featurize pass per side emits per-doc bucket-count partials
     (doc_id, bucket, n) — the raw-side rows are materialized once and
     feed BOTH consumers (bucket totals and per-doc weights), so
     tokenization never runs twice;
  2. bucket totals are a keyed sum over ≤ B distinct buckets — the ONLY
     driver materialization is two length-B int64 arrays (B = 1024 here;
     the paper uses 10^4, still trivially broadcastable);
  3. the per-bucket log-ratio table broadcasts in the task closure and
     per-doc weights are a streaming weighted sum + one groupby(doc_id).

Float discipline (shared with ``stages/lm.py``): per-bucket log-ratios are
pinned to integer MICROUNITS (floor(x·1e6 + .5), one convention on both
sides) BEFORE the per-doc summation, so per-doc sums are order-free int64
and the DuckDB mirror is hash-exact.  Tokenizer: ``[a-z]{2,32}`` over
lower(text) (the _WORDS oracle fragment); bigrams join with a single
space.  Docs with zero features are absent from the output (mirrored).

Reference counterpart: none — a north-rule training-data addition
(curation family: mix_sources, sample_weighted neighbors).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.hashing import md5_hash64_column
from ..functions.rounding import ln_microunits as _r6u

from ..functions.text import WORD_RE  # noqa: E402 — the
# oracle-pinned word tokenizer, one shared definition

DEFAULT_BUCKETS = 1024
DSIR_ALPHA = 1.0


def _doc_bucket_rows(buckets: int):
    """Batch fn: (doc_id, text) -> (doc_id, bucket, n) per-doc bucket
    counts over hashed uni+bigram features; one md5 pass per batch."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat: list[str] = []
        counts: list[int] = []
        kept: list[int] = []
        for i, t in enumerate(texts):
            toks = WORD_RE.findall((t or "").lower())
            if not toks:
                continue
            feats = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
            flat.extend(feats)
            counts.append(len(feats))
            kept.append(i)
        if not kept:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        b = (md5_hash64_column(flat) % np.uint64(buckets)).astype(np.int64)
        doc = np.repeat(ids[kept], counts)
        # per-(doc, bucket) combine inside the batch: one lexsort +
        # run-length encode — the exchange ships combined rows only
        order = np.lexsort((b, doc))
        doc, b = doc[order], b[order]
        new = np.empty(len(doc), dtype=bool)
        new[0] = True
        np.not_equal(doc[1:], doc[:-1], out=new[1:])
        new[1:] |= b[1:] != b[:-1]
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(doc)))
        return pa.table({"doc_id": pa.array(doc[starts], pa.int64()),
                         "bucket": pa.array(b[starts], pa.int64()),
                         "n": pa.array(n, pa.int64())})

    return fn


def _bucket_totals(rows: "ray.data.Dataset", buckets: int) -> np.ndarray:
    """Length-B int64 bucket totals (the tiny driver-side model state)."""
    agg = rows.map_batches(
        lambda b: pa.table({"bucket": b.column("bucket"),
                            "n": b.column("n")}),
        batch_format="pyarrow").groupby("bucket").aggregate(
        Sum("n")).take_all()
    out = np.zeros(buckets, dtype=np.int64)
    for r in agg:
        out[r["bucket"]] = r["sum(n)"]
    return out


def dsir_logweights(corpus: "ray.data.Dataset", target: "ray.data.Dataset",
                    *, buckets: int = DEFAULT_BUCKETS) -> "ray.data.Dataset":
    """(doc_id, logw_micro): per-document DSIR importance log-weight in
    integer microunits; higher = more target-like.  Docs with zero
    ``[a-z]{2,32}`` tokens are absent."""
    feats = corpus.select_columns(["doc_id", "text"]).map_batches(
        _doc_bucket_rows(buckets), batch_format="pyarrow").materialize()
    tgt_rows = target.select_columns(["doc_id", "text"]).map_batches(
        _doc_bucket_rows(buckets), batch_format="pyarrow")

    tc = _bucket_totals(tgt_rows, buckets)
    rc = _bucket_totals(feats, buckets)
    a = DSIR_ALPHA
    lr = _r6u(np.log((tc + a) / (tc.sum() + a * buckets))
              - np.log((rc + a) / (rc.sum() + a * buckets)))
    lr_ref = ray.put(lr)

    class Weigh:
        def __init__(self, ref):
            self._lr = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
                else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "partial": pa.array([], pa.int64())})
            doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
            b = batch.column("bucket").to_numpy(zero_copy_only=False)
            n = batch.column("n").to_numpy(zero_copy_only=False)
            w = n * self._lr[b]
            uid, inv = np.unique(doc, return_inverse=True)
            # float64 bincount is exact while every running sum stays
            # under 2^53; Σ|w| bounds all of them — int64 fallback past it
            if np.abs(w).sum(initial=0) < 2 ** 52:
                part = np.round(np.bincount(
                    inv, weights=w.astype(np.float64))).astype(np.int64)
            else:
                part = np.zeros(len(uid), dtype=np.int64)
                np.add.at(part, inv, w)
            return pa.table({"doc_id": pa.array(uid, pa.int64()),
                             "partial": pa.array(part, pa.int64())})

    partials = feats.map_batches(Weigh, fn_constructor_args=(lr_ref,),
                                 batch_format="pyarrow", concurrency=(1, 8))
    from ..util import coalesce_blocks
    return coalesce_blocks(
        partials.groupby("doc_id").aggregate(Sum("partial")).map_batches(
            lambda b: pa.table({
                "doc_id": b.column("doc_id"),
                "logw_micro": b.column("sum(partial)").cast(pa.int64())})
            if b.num_rows and "doc_id" in b.column_names else
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "logw_micro": pa.array([], pa.int64())}),
            batch_format="pyarrow"))
