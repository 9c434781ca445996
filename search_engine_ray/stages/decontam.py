"""Benchmark decontamination: flag corpus documents that share word
n-grams with a benchmark/holdout set.

The standard guard for training-data pipelines (the reference engine has no
equivalent — this is a north-rule addition): before training on a crawled
corpus, any document that shares a long word n-gram with an evaluation
benchmark must be dropped, or the benchmark is contaminated.  The published
recipe (GPT-3 appendix C / PaLM / Llama data cards) is exact n-gram overlap
at n in the 8-13 range over lowercased whitespace tokens — implemented here
as a distributed hash join, never a driver-side set.

Scale shape (100 TB corpus, benchmark possibly millions of docs):
  1. both sides explode to DISTINCT-per-doc (ngram_hash, doc_id) rows in one
     ``map_batches`` pass — one md5 pass per batch over the flattened gram
     stream, mirroring the vectorized MinHash construction
     (``stages/dedup.py``);
  2. the benchmark side is reduced to a distinct hash set via a keyed
     groupby (stays distributed — no broadcast, no driver set);
  3. one inner hash join on ngram_hash + a groupby(doc_id) count yields
     (doc_id, overlap_ngrams).
Every exchange is keyed by ngram_hash or doc_id; nothing text-sized crosses
the driver.  The base hash is ``md5_hash64`` (== DuckDB ``md5_number_lower``)
so the whole operator is recomputable by an ANSI-SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import md5_hash64_column

DEFAULT_NGRAM = 8


def _gram_rows(n: int):
    """Batch fn: (doc_id, text) -> distinct-per-doc (ngram_hash, doc_id)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat: list[str] = []
        counts: list[int] = []
        kept: list[int] = []
        for i, t in enumerate(texts):
            w = (t or "").lower().split()
            if len(w) < n:
                continue
            grams = {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}
            flat.extend(grams)
            counts.append(len(grams))
            kept.append(i)
        if not kept:
            return pa.table({"ngram_hash": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        h = md5_hash64_column(flat).view(np.int64)     # one md5 pass/batch
        return pa.table({
            "ngram_hash": pa.array(h, pa.int64()),
            "doc_id": pa.array(np.repeat(ids[kept], counts), pa.int64()),
        })

    return fn


def benchmark_ngram_overlap(corpus: "ray.data.Dataset",
                            benchmark: "ray.data.Dataset", *,
                            n: int = DEFAULT_NGRAM,
                            num_partitions: int | None = None
                            ) -> "ray.data.Dataset":
    """(doc_id, overlap_ngrams) for corpus docs sharing >= 1 word n-gram
    with any benchmark doc.  ``overlap_ngrams`` counts DISTINCT shared
    n-grams per corpus doc.  Corpus docs absent from the result are clean
    (the decontaminated corpus = anti-join of corpus against this)."""
    from ray.data.aggregate import Count

    from ..util import coalesce_blocks

    if num_partitions is None:
        # sizing needs .count(): materialize FIRST so the count and the
        # gram pass don't each execute the upstream lineage (same trap
        # decontaminated_survivors and line_dedup already dodge)
        corpus = corpus.select_columns(["doc_id", "text"]).materialize()

    corpus_rows = corpus.select_columns(["doc_id", "text"]).map_batches(
        _gram_rows(n), batch_format="pyarrow")
    bench_rows = benchmark.select_columns(["doc_id", "text"]).map_batches(
        _gram_rows(n), batch_format="pyarrow")

    # distinct benchmark hash set — keyed groupby, never a driver set
    bench_hashes = coalesce_blocks(
        bench_rows.groupby("ngram_hash").aggregate(Count()).map_batches(
            lambda b: pa.table({"ngram_hash": b.column("ngram_hash")}),
            batch_format="pyarrow"))

    if num_partitions is None:
        # ~1 hash-join aggregator per 2M gram rows, bounded (each partition
        # is an actor; fixture scale wants few, 100 TB wants the cap)
        num_partitions = int(max(2, min(
            64, corpus.count() * 16 // 2_000_000 + 2)))

    from ..util import hash_join
    hits = hash_join(corpus_rows, bench_hashes, "inner",
                     num_partitions=num_partitions,
                     on=("ngram_hash",))
    return coalesce_blocks(
        hits.groupby("doc_id").aggregate(Count()).map_batches(
            lambda b: pa.table({
                "doc_id": b.column("doc_id"),
                "overlap_ngrams": b.column("count()"),
            }), batch_format="pyarrow"))


def decontaminated_survivors(corpus: "ray.data.Dataset",
                             benchmark: "ray.data.Dataset", *,
                             n: int = DEFAULT_NGRAM) -> "ray.data.Dataset":
    """Corpus doc_ids with ZERO benchmark n-gram overlap (the training set
    after decontamination) — a distributed LEFT ANTI hash join against the
    contaminated-id set, so a heavily contaminated corpus (ids too numerous
    for any driver set) still streams."""
    # count the corpus ONCE on a materialized handle: .count() on a lazy
    # dataset re-executes the whole upstream pipeline, and this function
    # would otherwise trigger it twice (here + benchmark_ngram_overlap)
    corpus = corpus.materialize()
    n_docs = corpus.count()
    overlap = benchmark_ngram_overlap(
        corpus, benchmark, n=n,
        num_partitions=int(max(2, min(64, n_docs * 16 // 2_000_000 + 2))))
    bad = overlap.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id")}),
        batch_format="pyarrow")
    nparts = int(max(2, min(64, n_docs // 2_000_000 + 2)))
    from ..util import hash_join
    return hash_join(corpus.select_columns(["doc_id"]), bad, "left_anti",
                     num_partitions=nparts, on=("doc_id",))


# -- corpus-level duplicated-span detection ----------------------------------

def _pos_gram_rows(n: int):
    """Batch fn: (doc_id, text) -> (ngram_hash, doc_id, pos) — one row per
    token position (NOT distinct: positions are the payload here)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat: list[str] = []
        counts: list[int] = []
        kept: list[int] = []
        pos: list[np.ndarray] = []
        for i, t in enumerate(texts):
            w = (t or "").lower().split()
            k = len(w) - n + 1
            if k <= 0:
                continue
            flat.extend(" ".join(w[j:j + n]) for j in range(k))
            counts.append(k)
            kept.append(i)
            pos.append(np.arange(k, dtype=np.int64))
        if not kept:
            return pa.table({"ngram_hash": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        h = md5_hash64_column(flat).view(np.int64)
        return pa.table({
            "ngram_hash": pa.array(h, pa.int64()),
            "doc_id": pa.array(np.repeat(ids[kept], counts), pa.int64()),
            "pos": pa.array(np.concatenate(pos), pa.int64()),
        })

    return fn


def _span_partition(group: pa.Table, *, n: int) -> pa.Table:
    """All hit positions for a doc_id partition -> per-doc merged spans.

    Fully vectorized across every doc in the partition: one lexsort by
    (doc_id, pos), island breaks where the doc changes or the position gap
    exceeds n-1 — i.e. OVERLAPPING token ranges [p, p+n) merge; ranges that
    merely touch end-to-start (gap exactly n) stay separate spans, since
    each is independent evidence of a duplicated substring and the
    concatenation need not itself recur (dup_tokens is unaffected either
    way: touching ranges don't overlap).  Then reduceat-style sums via
    break indices."""
    if group.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "dup_spans": pa.array([], pa.int64()),
                         "dup_tokens": pa.array([], pa.int64())})
    d = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    p = group.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((p, d))
    d, p = d[order], p[order]
    new_doc = np.empty(len(d), dtype=bool)
    new_doc[0] = True
    new_doc[1:] = d[1:] != d[:-1]
    brk = new_doc.copy()
    brk[1:] |= (p[1:] - p[:-1]) > (n - 1)       # island break within a doc
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], len(d))
    island_len = (p[ends - 1] + n) - p[starts]  # [min_pos, max_pos + n)
    island_doc = d[starts]
    doc_starts = np.flatnonzero(new_doc[starts])  # islands grouped by doc
    doc_ids = island_doc[doc_starts]
    spans_per_doc = np.diff(np.append(doc_starts, len(starts)))
    tok_per_doc = np.add.reduceat(island_len, doc_starts)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "dup_spans": pa.array(spans_per_doc.astype(np.int64), pa.int64()),
        "dup_tokens": pa.array(tok_per_doc.astype(np.int64), pa.int64()),
    })


def duplicated_spans(docs: "ray.data.Dataset", *, n: int = DEFAULT_NGRAM,
                     num_parts: int = 64) -> "ray.data.Dataset":
    """Per-doc merged duplicated-span stats: (doc_id, dup_spans, dup_tokens).

    The exact-substring dedup signal of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), simplified from suffix
    arrays to fixed-length token grams: a position is duplicated when its
    n-gram occurs more than once in the WHOLE corpus (any doc, including
    its own); OVERLAPPING duplicated grams merge into spans (token
    ranges that merely touch end-to-start stay separate — see _span_stats).
    ``dup_tokens`` is the union length — the number of tokens a span-level
    deduper would cut.

    Scale shape: gram explode (one md5 pass per batch) -> frequency
    groupby on ngram_hash -> inner hash join of position rows against the
    freq>1 hash set -> ONE keyed exchange on doc_id%num_parts with all
    per-doc span math vectorized inside each partition (same
    partition-groupby pattern as the MinHash pair stage — no per-doc
    Python calls, no driver state)."""
    from functools import partial

    from ray.data.aggregate import Count

    from ..util import coalesce_blocks

    # partition sizing below needs .count(): materialize so the count and
    # the gram pass don't each execute the upstream lineage
    docs = docs.select_columns(["doc_id", "text"]).materialize()
    rows = docs.map_batches(
        _pos_gram_rows(n), batch_format="pyarrow")
    # frequency > 1 over the corpus — total occurrences, not distinct docs,
    # so in-doc repetition (boilerplate) is caught too
    dup_hashes = coalesce_blocks(
        rows.groupby("ngram_hash").aggregate(Count()).map_batches(
            lambda b: b.filter(
                pa.compute.greater(b.column("count()"), 1)).select(
                ["ngram_hash"]),
            batch_format="pyarrow"))
    nparts = int(max(2, min(64, docs.count() * 16 // 2_000_000 + 2)))
    from ..util import hash_join
    hits = hash_join(rows, dup_hashes, "inner", num_partitions=nparts,
                     on=("ngram_hash",))

    def add_part(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "pos": b.column("pos"),
            "part": pa.array((ids % num_parts).astype(np.int32)),
        })

    return hits.map_batches(add_part, batch_format="pyarrow").groupby(
        "part").map_groups(
        lambda g: _span_partition(g.drop_columns(["part"]), n=n),
        batch_format="pyarrow")


# -- Bloom-filter decontamination ---------------------------------------------
# The broadcast-side scale path: when the benchmark set is small relative to
# the corpus (the usual case — evaluation suites are MBs, the corpus is TBs),
# a fixed-size Bloom bitset of the benchmark grams replaces the distributed
# hash join entirely.  One tiny aggregate builds the bitset, `ray.put`
# broadcasts it ONCE, and the corpus pass becomes a pure streaming filter —
# no all-to-all exchange of corpus gram rows at all.  The price is a bounded
# false-positive rate (docs flagged that share no gram), which is the right
# trade for decontamination: dropping a few extra docs from a 100 TB corpus
# is free, shuffling 10^12 gram rows is not.
#
# Bit function (mirrored exactly by the SQL oracle, same arithmetic as the
# MinHash permutations): bit_j(h) = splitmix64(h XOR j*GOLDEN) % m_bits for
# j in 1..k_hashes, over the md5_hash64 gram hash.

BLOOM_GOLDEN = 0x9E3779B97F4A7C15
DEFAULT_BLOOM_BITS = 1 << 16
DEFAULT_BLOOM_HASHES = 3


def _bloom_bit_matrix(hashes: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) int64 bit positions for uint64 gram hashes."""
    from ..functions.hashing import splitmix64_array
    seeds = (np.arange(1, k + 1, dtype=np.uint64)
             * np.uint64(BLOOM_GOLDEN))
    with np.errstate(over="ignore"):
        mixed = splitmix64_array(hashes[:, None] ^ seeds[None, :])
    return (mixed % np.uint64(m)).astype(np.int64)


def bloom_decontaminate(corpus: "ray.data.Dataset",
                        benchmark: "ray.data.Dataset", *,
                        n: int = DEFAULT_NGRAM,
                        m_bits: int = DEFAULT_BLOOM_BITS,
                        k_hashes: int = DEFAULT_BLOOM_HASHES
                        ) -> "ray.data.Dataset":
    """(doc_id, bloom_hits): corpus docs whose word n-grams hit the
    benchmark Bloom filter — a SUPERSET of the exact-overlap flag set
    (false positives allowed, false negatives impossible).

    ``bloom_hits`` counts DISTINCT corpus-doc grams passing all
    ``k_hashes`` bit tests.  The bitset is at most ``m_bits`` bits of
    driver/broadcast state regardless of corpus or benchmark size."""
    from ray.data.aggregate import Count

    bench_rows = benchmark.select_columns(["doc_id", "text"]).map_batches(
        _gram_rows(n), batch_format="pyarrow")

    def bench_bits(b: pa.Table) -> pa.Table:
        h = b.column("ngram_hash").to_numpy(
            zero_copy_only=False).astype(np.int64).view(np.uint64)
        bits = np.unique(_bloom_bit_matrix(h, k_hashes, m_bits))
        return pa.table({"bit": pa.array(bits, pa.int64())})

    # distinct bit positions: per-batch unique -> keyed distinct -> the
    # bitset itself (<= m_bits rows) is the ONLY driver materialization
    bit_rows = bench_rows.map_batches(
        bench_bits, batch_format="pyarrow").groupby("bit").aggregate(
        Count()).take_all()
    bitset = np.zeros(m_bits, dtype=bool)
    if bit_rows:
        bitset[np.asarray([r["bit"] for r in bit_rows], dtype=np.int64)] = \
            True
    bitset_ref = ray.put(bitset)

    class BloomFlag:
        def __init__(self, ref, k, m):
            self._bits = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
                else ref
            self._k = k
            self._m = m

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "partial": pa.array([], pa.int64())})
            h = batch.column("ngram_hash").to_numpy(
                zero_copy_only=False).astype(np.int64).view(np.uint64)
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            bm = _bloom_bit_matrix(h, self._k, self._m)
            hit = self._bits[bm].all(axis=1)
            if not hit.any():
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "partial": pa.array([], pa.int64())})
            uid, cnt = np.unique(ids[hit], return_counts=True)
            return pa.table({"doc_id": pa.array(uid, pa.int64()),
                             "partial": pa.array(cnt, pa.int64())})

    from ray.data.aggregate import Sum

    from ..util import coalesce_blocks

    corpus_rows = corpus.select_columns(["doc_id", "text"]).map_batches(
        _gram_rows(n), batch_format="pyarrow")
    partials = corpus_rows.map_batches(
        BloomFlag, fn_constructor_args=(bitset_ref, k_hashes, m_bits),
        batch_format="pyarrow", concurrency=(1, 8))
    return coalesce_blocks(
        partials.groupby("doc_id").aggregate(Sum("partial")).map_batches(
            lambda b: pa.table({
                "doc_id": b.column("doc_id"),
                "bloom_hits": b.column("sum(partial)").cast(pa.int64())})
            if b.num_rows and "doc_id" in b.column_names else
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "bloom_hits": pa.array([], pa.int64())}),
            batch_format="pyarrow"))
