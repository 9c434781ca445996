"""Deduplication stages (SURVEY.md §2.7 + north-rule additions).

The reference only computes SimHash fingerprints
(/root/reference/app/batch/duplicate_detection.py:45-69) and relies on URL
upserts for exact dedup (D2).  Here, as first-class engine operators:

  * fingerprints      — SimHash64 per turn (reference D1 semantics)
  * exact_dedup       — content-hash groupby, keep first by doc key
  * minhash_lsh_pairs — MinHash + banded LSH candidate generation, verified
                        by true token-set Jaccard
  * ngram_jaccard_pairs — character-n-gram Jaccard over LSH candidates
  * simhash_near_pairs — Hamming-close SimHash pairs via 4-band exact-match
                        blocking (a 64-bit fingerprint with <=3 differing bits
                        has at least one identical 16-bit band)

Partitioning: the shuffle key is always the bucket/hash (SURVEY.md §4 "dedup
-> content_hash"); pair verification happens inside the bucket group, so no
all-pairs stage ever materializes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

from ..functions.hashing import (hash64_column, md5_hash64_column,
                                 splitmix64_array)
from ..functions.simhash import hamming64, simhash_text


# -- fingerprints (reference D1) -------------------------------------------

def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Batch-vectorized SimHash64, bit-identical to functions/simhash.
    simhash_text (the per-doc path stays as the tested reference).

    One md5 pass over the batch's FACTORIZED token vocabulary (each distinct
    token hashed once per batch, not once per occurrence), then per-doc
    weighted bit sums via ``np.add.reduceat`` over the token stream and a
    single ``packbits`` for the sign bits — no per-document Python loop.
    Charikar identity used: sum over unique features of (2*bit-1)*count
    == 2 * sum(bits over the raw stream) - stream length."""
    import pandas as pd

    # Arrow whitespace split + empty-token filter == Python str.split():
    # Arrow splits on each whitespace char (runs yield "" tokens); dropping
    # the empties leaves exactly the maximal non-whitespace runs.
    text_col = pc.fill_null(batch.column("text"), "").combine_chunks()
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    split = pc.utf8_split_whitespace(text_col)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = split.flatten()
    nonempty = pc.not_equal(values, "")
    ne = nonempty.to_numpy(zero_copy_only=False).astype(np.int64)
    csum = np.concatenate(([0], np.cumsum(ne)))
    counts = csum[offsets[1:] - offsets[0]] - csum[offsets[:-1] - offsets[0]]
    fps = np.zeros(batch.num_rows, dtype=np.int64)
    flat = values.filter(nonempty)
    if len(flat):
        codes, uniques = pd.factorize(
            flat.to_numpy(zero_copy_only=False), sort=False)
        hashes = md5_hash64_column(list(uniques))[codes]      # (T,)
        bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little").astype(np.int32)
        kept = np.flatnonzero(counts > 0)
        starts = (np.concatenate(([0], np.cumsum(counts)))[:-1])[kept]
        sums = np.add.reduceat(bits, starts, axis=0)          # (n_kept, 64)
        v = 2 * sums - counts[kept, None]
        fp_u64 = np.packbits((v > 0).astype(np.uint8), axis=1,
                             bitorder="little").view(np.uint64).ravel()
        fps[kept] = fp_u64.view(np.int64)   # == to_signed64 wrap
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fps, pa.int64()),
    })


def fingerprints(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, fingerprint) — SimHash64 over whitespace-split text, signed
    BIGINT wrap (duplicate_detection.py:63,:11-14)."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _fingerprint_batch, batch_format="pyarrow")


# -- exact dedup ------------------------------------------------------------

def _content_hash_batch(batch: pa.Table) -> pa.Table:
    h = hash64_column(batch.column("text").to_pylist())
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "content_hash": pa.array(h.astype(np.int64)),
    })


def exact_dedup_groups(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """groupby(content_hash) -> (canonical_doc_id=min doc_id, dup_count).

    Keep-first semantics: doc_id order == (conv_id, turn_idx) order, so min
    doc_id IS the first turn by natural key."""
    hashed = docs.select_columns(["doc_id", "text"]).map_batches(
        _content_hash_batch, batch_format="pyarrow")
    agg = hashed.groupby("content_hash").aggregate(Min("doc_id"), Count())
    return agg.map_batches(
        lambda b: pa.table({
            "canonical_doc_id": b.column("min(doc_id)"),
            "dup_count": b.column("count()"),
        }),
        batch_format="pyarrow")


_STORE_SENTINEL = np.int64(2**62)   # doc_id stand-in for store rows; never
# emitted (groups containing a store row are dropped entirely)


def incremental_dedup_survivors(incoming: "ray.data.Dataset",
                                store: "ray.data.Dataset",
                                ) -> "ray.data.Dataset":
    """Dedup a NEW ingest increment against a persisted fingerprint store.

    ``incoming`` is (doc_id, text); ``store`` is the content-hash table of
    everything already ingested (column ``content_hash`` — hashes only, the
    store never ships text).  Output: (doc_id, inc_dup_count) — one row per
    distinct incoming text that is NOT in the store, doc_id = keep-first
    (min) within the increment, inc_dup_count = how many incoming rows
    collapsed into it.

    Shape: hash both sides, union, ONE groupby(content_hash) with
    (min doc_id, count, min flag) aggregates — store rows carry flag=0 and a
    sentinel doc_id, so a group whose min flag is 0 touched the store and is
    dropped.  The exchange ships (hash, doc_id, flag) triples only; this is
    the incremental-build counterpart of ``exact_dedup_groups`` (same
    collision assumption: 64-bit content hash, documented at
    ``_content_hash_batch``).
    """
    inc = incoming.select_columns(["doc_id", "text"]).map_batches(
        _content_hash_batch, batch_format="pyarrow").map_batches(
        lambda b: b.append_column("flag", pa.array(
            np.ones(b.num_rows, dtype=np.int64))),
        batch_format="pyarrow")
    st = store.select_columns(["content_hash"]).map_batches(
        lambda b: pa.table({
            "doc_id": pa.array(np.full(b.num_rows, _STORE_SENTINEL)),
            "content_hash": b.column("content_hash"),
            "flag": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
        }),
        batch_format="pyarrow")
    agg = inc.union(st).groupby("content_hash").aggregate(
        Min("doc_id"), Count(), Min("flag"))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        fresh = pc.equal(b.column("min(flag)"), 1)
        b = b.filter(fresh)
        return pa.table({
            "doc_id": b.column("min(doc_id)"),
            "inc_dup_count": b.column("count()"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def content_hash_store(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(content_hash) fingerprint-store projection of an already-ingested
    corpus — what a production run would persist as Parquet between
    increments."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _content_hash_batch, batch_format="pyarrow").select_columns(
        ["content_hash"])


def exact_dedup_survivors(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Surviving doc_ids (one per distinct text)."""
    return exact_dedup_groups(docs).map_batches(
        lambda b: pa.table({"doc_id": b.column("canonical_doc_id")}),
        batch_format="pyarrow")


# -- MinHash + LSH ----------------------------------------------------------

NUM_PERMS = 64
NUM_BANDS = 8          # 8 bands x 8 rows


def _token_set(text: str) -> list[str]:
    return list({w for w in (text or "").lower().split() if w})


class _MinHashBatch:
    """Emit (band, band_key, doc_id) LSH bucket rows per doc.

    MinHash via one base md5 hash per token + NUM_PERMS splitmix64
    re-mixes (vectorized) — standard one-hash + k-mix construction.  The
    base hash is ``md5_hash64`` (lower 64 bits of MD5, little-endian ==
    DuckDB ``md5_number_lower``) rather than blake2b so the whole
    signature/banding pipeline is recomputable by an ANSI-SQL oracle
    (splitmix64 is plain 64-bit arithmetic, expressible mod 2^64)."""

    def __init__(self, num_perms: int = NUM_PERMS, num_bands: int = NUM_BANDS):
        self._perms = num_perms
        self._bands = num_bands
        self._rows = num_perms // num_bands
        self._seeds = np.arange(1, num_perms + 1, dtype=np.uint64) * np.uint64(
            0x9E3779B97F4A7C15)

    def signature(self, tokens: list[str]) -> np.ndarray | None:
        if not tokens:
            return None
        base = md5_hash64_column(tokens)                   # (n,)
        with np.errstate(over="ignore"):
            mixed = splitmix64_array(base[:, None] ^ self._seeds[None, :])
        return mixed.min(axis=0)                           # (num_perms,)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized across the batch: ONE md5 pass over the batch's full
        token stream + one splitmix mix, per-doc signatures via segment-min
        (``np.minimum.reduceat`` over per-doc offsets), band rows emitted by
        numpy reshape — no per-document hashing loop (bit-identical to the
        per-doc ``signature()`` path, which stays for tests/reference)."""
        texts = batch.column("text").to_pylist()
        chashes = hash64_column(texts).astype(np.int64)
        flat: list[str] = []
        counts: list[int] = []
        kept: list[int] = []
        for i, text in enumerate(texts):
            toks = _token_set(text)
            if not toks:
                continue
            flat.extend(toks)
            counts.append(len(toks))
            kept.append(i)
        nb, r = self._bands, self._rows
        if not kept:
            return pa.table({
                "band": pa.array([], pa.int32()),
                "band_key": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "content_hash": pa.array([], pa.int64()),
            })
        base = md5_hash64_column(flat)                     # (T,) one pass
        with np.errstate(over="ignore"):
            mixed = splitmix64_array(base[:, None] ^ self._seeds[None, :])
        starts = np.concatenate(
            ([0], np.cumsum(counts[:-1]))).astype(np.int64)
        sigs = np.minimum.reduceat(mixed, starts, axis=0)  # (n_kept, perms)
        n = len(kept)
        # doc-major (n*nb, r) band rows share sigs' memory layout, so one
        # tobytes + memoryview slicing yields every band's key input
        buf = memoryview(np.ascontiguousarray(sigs).tobytes())
        row_bytes = 8 * r
        keys = hash64_column(
            [bytes(buf[k * row_bytes:(k + 1) * row_bytes])
             for k in range(n * nb)])
        keys = (keys & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        kept_idx = np.asarray(kept, dtype=np.int64)
        doc_ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)[kept_idx]
        return pa.table({
            "band": pa.array(np.tile(np.arange(nb, dtype=np.int32), n)),
            "band_key": pa.array(keys),
            "doc_id": pa.array(np.repeat(doc_ids, nb)),
            "content_hash": pa.array(np.repeat(chashes[kept_idx], nb)),
        })


# Degenerate-bucket guard: a bucket whose (post-collapse) width exceeds this
# emits only the first MAX_BUCKET_WIDTH reps' pairs and logs an overflow —
# O(cap^2) bounded, never O(n^2) on mass-duplicated boilerplate.
MAX_BUCKET_WIDTH = 512


def _bucket_pairs_partition(batch: pa.Table) -> pa.Table:
    """Candidate pairs for EVERY LSH bucket in one coarse partition,
    vectorized — one Python call handles thousands of buckets (a per-bucket
    ``map_groups`` paid table-construction overhead per tiny group, which
    dominated the stage).

    Per bucket (= one (band, band_key) group): exact-duplicate classes are
    first collapsed to their min-doc_id representative (identical text =>
    identical signature => same buckets, so the collapse is globally
    consistent across buckets; 10k identical docs cost O(n), not O(n^2) —
    exact-dup membership is already covered by exact_dedup_groups), then all
    i<j rep pairs are emitted, capped at MAX_BUCKET_WIDTH reps."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
        np.int64)
    if len(ids) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    band = batch.column("band").to_numpy(zero_copy_only=False).astype(
        np.int64)
    key = batch.column("band_key").to_numpy(zero_copy_only=False)
    chs = batch.column("content_hash").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, chs, key, band))
    band, key, ids, chs = band[order], key[order], ids[order], chs[order]
    n = len(ids)
    new_bucket = np.ones(n, dtype=bool)
    new_bucket[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    # first row of each (bucket, content-hash) class == min doc_id in class
    new_class = new_bucket.copy()
    new_class[1:] |= chs[1:] != chs[:-1]
    r_ids = ids[new_class]
    nb = new_bucket[new_class]
    seg_starts = np.flatnonzero(nb)
    seg_ends = np.append(seg_starts[1:], len(r_ids))
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for s, e in zip(seg_starts.tolist(), seg_ends.tolist()):
        if e - s < 2:
            continue
        u = np.sort(r_ids[s:e])
        if len(u) > MAX_BUCKET_WIDTH:
            import logging
            logging.getLogger(__name__).warning(
                "LSH bucket overflow: %d reps > cap %d, truncating",
                len(u), MAX_BUCKET_WIDTH)
            u = u[:MAX_BUCKET_WIDTH]
        ia, ib = np.triu_indices(len(u), k=1)
        out_a.append(u[ia])
        out_b.append(u[ib])
    if not out_a:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    # within-partition pair dedup before the global cross-band dedup
    packed = np.stack([np.concatenate(out_a), np.concatenate(out_b)], axis=1)
    uniq = np.unique(packed, axis=0)
    return pa.table({"doc_a": pa.array(uniq[:, 0], pa.int64()),
                     "doc_b": pa.array(uniq[:, 1], pa.int64())})


# coarse shuffle fan-out for the bucket-pairing step: buckets are spread
# over this many partitions (keyed by band_key hash), each processed by ONE
# vectorized call.  At cluster scale raise it so a partition's band rows fit
# a worker (rows per partition = corpus_docs * NUM_BANDS / pair_parts).
NUM_PAIR_PARTS = 64


def minhash_candidate_pairs(docs: "ray.data.Dataset", *,
                            pair_parts: int = NUM_PAIR_PARTS
                            ) -> "ray.data.Dataset":
    """LSH candidate pairs (doc_a < doc_b) over distinct-text representatives,
    deduplicated across bands."""
    buckets = docs.select_columns(["doc_id", "text"]).map_batches(
        _MinHashBatch, batch_format="pyarrow", concurrency=(1, 8))

    def add_part(b: pa.Table) -> pa.Table:
        key = b.column("band_key").to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((key % pair_parts).astype(np.int32)))

    pairs = buckets.map_batches(add_part, batch_format="pyarrow").groupby(
        "part").map_groups(
        lambda g: _bucket_pairs_partition(g.drop_columns(["part"])),
        batch_format="pyarrow")
    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    # Ray's sort-based aggregate can emit EMPTY blocks with an EMPTY
    # schema; they poison downstream hash joins.  force_schema + coalesce.
    from ..util import coalesce_blocks, force_schema
    return coalesce_blocks(
        pairs.groupby(["doc_a", "doc_b"]).aggregate(Count()).map_batches(
            force_schema(pair_schema, "doc_a"), batch_format="pyarrow"))


def _jaccard_features(text: str, mode: str) -> set:
    if mode == "ngram":
        t = (text or "").lower()
        return {t[i:i + 3] for i in range(max(len(t) - 2, 0))} or {t}
    return set((text or "").lower().split())


def _pairs_with_texts(docs: "ray.data.Dataset",
                      pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_a, doc_b) pairs + the doc store -> (doc_a, doc_b, text_a,
    text_b) via a DISTRIBUTED hash join — no driver-assembled id->text map
    anywhere, so dup-heavy corpora (where candidates are a large corpus
    fraction) never materialize text on the driver or in one object.

    Shape: two sequential hash joins of the pair list against the doc
    store — on ``doc_a`` (attaching ``text_a``) then on ``doc_b``
    (attaching ``text_b``).  The right side of each join is the full doc
    store keyed by dense doc ids, so every hash partition is populated
    (a pair⋈pair join on derived/filtered sides can hand Ray's shuffle
    aggregator an EMPTY schema-less partition and fail field resolution).
    Total exchange = two doc-store passes + two pair-sized shuffles."""
    # partitions sized to pair volume, not block count: each hash-join
    # partition carries fixed aggregator-actor overhead, so small candidate
    # sets want few partitions (at cluster scale pair counts in the billions
    # raise this toward the 64 cap)
    nparts = int(max(8, min(64, pairs.count() // 2_000_000 + 8)))

    def as_side(col: str, text_col: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({col: b.column("doc_id").cast(pa.int64()),
                             text_col: b.column("text")})
        return fn

    txt = docs.select_columns(["doc_id", "text"])
    txt_a = txt.map_batches(as_side("doc_a", "text_a"),
                            batch_format="pyarrow")
    txt_b = txt.map_batches(as_side("doc_b", "text_b"),
                            batch_format="pyarrow")
    from ..util import hash_join
    with_a = hash_join(pairs, txt_a, "inner", num_partitions=nparts,
                       on=("doc_a",))

    # The first join can emit EMPTY schema-less blocks for partitions with
    # no matches; as the LEFT side of the second join those blocks can't
    # resolve FieldRef(doc_b).  force_schema alone is NOT enough here:
    # schema-less blocks skip map_batches entirely, and if one arrives as
    # the second join's FIRST bundle it poisons every empty aggregator
    # partition (the documented flaky ArrowInvalid in coalesce_blocks's
    # docstring — observed live in test_minhash_near_dups under host
    # contention).  coalesce_blocks merges the empties out of existence;
    # force_schema then only normalizes column order/types of real blocks.
    from ..util import coalesce_blocks, force_schema
    mid_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("text_a", pa.large_string())])
    with_a = coalesce_blocks(with_a).map_batches(
        force_schema(mid_schema, "doc_b"), batch_format="pyarrow")
    return hash_join(with_a, txt_b, "inner", num_partitions=nparts,
                     on=("doc_b",))


def _verify_jaccard_batch(batch: pa.Table, *, threshold: float,
                          mode: str) -> pa.Table:
    a_ids = batch.column("doc_a").to_pylist()
    b_ids = batch.column("doc_b").to_pylist()
    texts_a = batch.column("text_a").to_pylist()
    texts_b = batch.column("text_b").to_pylist()
    oa, ob, js = [], [], []
    for da, db, ta, tb in zip(a_ids, b_ids, texts_a, texts_b):
        fa = _jaccard_features(ta, mode)
        fb = _jaccard_features(tb, mode)
        if not fa and not fb:
            continue
        j = len(fa & fb) / len(fa | fb) if (fa | fb) else 0.0
        if j >= threshold:
            oa.append(da)
            ob.append(db)
            js.append(j)
    return pa.table({
        "doc_a": pa.array(oa, pa.int64()),
        "doc_b": pa.array(ob, pa.int64()),
        "jaccard": pa.array(js, pa.float64()),
    })


def minhash_near_dups(docs: "ray.data.Dataset", *, threshold: float = 0.8,
                      mode: str = "token") -> "ray.data.Dataset":
    """MinHash LSH candidates -> Jaccard-verified near-dup pairs.

    Verification texts arrive via a distributed pair⋈doc-store hash join
    (``_pairs_with_texts``); the true token/ngram Jaccard is then computed
    inside the joined batches.  Nothing text-sized ever reaches the driver,
    so the path holds even when near-dup candidates are a large fraction of
    the corpus (the target training-data workload)."""
    from functools import partial
    pairs = minhash_candidate_pairs(docs).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    return _pairs_with_texts(docs, pairs).map_batches(
        partial(_verify_jaccard_batch, threshold=threshold, mode=mode),
        batch_format="pyarrow")


def ngram_jaccard_near_dups(docs: "ray.data.Dataset", *,
                            threshold: float = 0.8) -> "ray.data.Dataset":
    """Character-3-gram Jaccard over MinHash candidates."""
    return minhash_near_dups(docs, threshold=threshold, mode="ngram")


# -- SimHash near-dup pairs -------------------------------------------------

def simhash_near_pairs(docs: "ray.data.Dataset", *, max_hamming: int = 3
                       ) -> "ray.data.Dataset":
    """Hamming-<=k SimHash pairs via 4x16-bit band blocking (pigeonhole: <=3
    differing bits leave at least one band identical)."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming}: 4-band blocking only guarantees "
            f"recall for hamming <= 3 (pigeonhole); pairs differing by one "
            f"bit per band would be silently missed — use more bands")
    fps = fingerprints(docs)

    def explode_bands(batch: pa.Table) -> pa.Table:
        """Band-major (band, band_key, doc_id, fingerprint) rows — pure
        numpy tile/repeat + one vectorized shift per band, no .tolist()."""
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        f = batch.column("fingerprint").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        n = len(ids)
        shifts = np.repeat(np.arange(4, dtype=np.uint64) * np.uint64(16), n)
        keys = ((np.tile(f, 4) >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({
            "band": pa.array(np.repeat(np.arange(4, dtype=np.int32), n)),
            "band_key": pa.array(keys),
            "doc_id": pa.array(np.tile(ids, 4)),
            "fingerprint": pa.array(np.tile(f.view(np.int64), 4)),
        })

    def band_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(set(zip(group.column("doc_id").to_pylist(),
                              group.column("fingerprint").to_pylist())))
        if len(rows) > MAX_BUCKET_WIDTH:
            import logging
            logging.getLogger(__name__).warning(
                "SimHash band overflow: %d rows > cap %d, truncating",
                len(rows), MAX_BUCKET_WIDTH)
            rows = rows[:MAX_BUCKET_WIDTH]
        a, b, h = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = hamming64(rows[i][1], rows[j][1])
                if d <= max_hamming and rows[i][0] != rows[j][0]:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    h.append(d)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64()),
                         "hamming": pa.array(h, pa.int64())})

    pairs = fps.map_batches(explode_bands, batch_format="pyarrow").groupby(
        ["band", "band_key"]).map_groups(band_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming")).map_batches(
        lambda t: pa.table({
            "doc_a": t.column("doc_a"), "doc_b": t.column("doc_b"),
            "hamming": t.column("min(hamming)")}),
        batch_format="pyarrow")


# -- near-dup clustering (pairs -> connected components) ---------------------

def connected_components(pairs: "ray.data.Dataset", *,
                         max_iterations: int = 64) -> "ray.data.Dataset":
    """(doc_a, doc_b) pairs -> (doc_id, cluster_rep) via distributed
    min-label propagation: every node starts labeled with its own id, each
    iteration sends labels along (bidirectional) edges and keeps the
    per-node minimum — a join + groupby-min per round, converging in
    O(component diameter) rounds.  Labels only ever decrease, so the global
    label sum is a monotone convergence witness: when it stops falling, the
    components are final (checked per round; no driver-side graph state).

    Completes the dedup story the pair stages start: MinHash/SimHash emit
    candidate pairs, this turns them into canonical clusters so survivors =
    cluster minima.  Everything stays keyed on node id — at 100 TB each
    round is one hash-shuffle of the PAIR-derived node set (near-dup nodes,
    not the corpus)."""
    import pyarrow.compute as pc

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").combine_chunks()
        bb = b.column("doc_b").combine_chunks()
        return pa.table({
            "src": pa.concat_arrays(
                [a.cast(pa.int64()), bb.cast(pa.int64())]),
            "dst": pa.concat_arrays(
                [bb.cast(pa.int64()), a.cast(pa.int64())]),
        })

    from ..util import coalesce_blocks, hash_join
    edges = coalesce_blocks(
        pairs.map_batches(both_dirs, batch_format="pyarrow")).materialize()
    if edges.count() == 0:          # no pairs -> no clustered nodes
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "cluster_rep": pa.array([], pa.int64())}))

    labels = coalesce_blocks(edges.groupby("src").aggregate(Min("dst")).map_batches(
        lambda b: pa.table({
            "node": b.column("src"),
            "label": pc.min_element_wise(b.column("src"),
                                         b.column("min(dst)")),
        }), batch_format="pyarrow")).materialize()

    def _label_sum(ds: "ray.data.Dataset") -> int:
        return int(ds.sum("label"))

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iterations):
        # propagate: neighbor labels arrive via the edge join; keep the min
        # of (own label, best neighbor label)
        msgs = hash_join(edges, labels, "inner", num_partitions=max(
            2, edges.num_blocks() // 4), on=("src",), right_on=("node",))
        msgs = msgs.map_batches(
            lambda b: pa.table({"node": b.column("dst"),
                                "cand": b.column("label")}),
            batch_format="pyarrow")
        merged = coalesce_blocks(msgs.groupby("node").aggregate(Min("cand")))
        # coalesce_blocks on the round's OUTPUT too: the left_outer join's
        # empty partitions can emit schema-less blocks, and feeding those
        # back into the NEXT round's hash joins reproduces the flaky
        # ArrowInvalid documented on util.coalesce_blocks (materialize()
        # alone does not merge blocks)
        new_labels = coalesce_blocks(hash_join(
            labels, merged, "left_outer", num_partitions=max(
                2, edges.num_blocks() // 4),
            on=("node",)).map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "label": pc.min_element_wise(
                    b.column("label"),
                    pc.fill_null(b.column("min(cand)"),
                                 pa.scalar(2**62, pa.int64()))),
            }), batch_format="pyarrow"))
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    if not converged:
        # the monotone-sum witness only certifies finality when the loop
        # broke on convergence; a component with diameter > max_iterations
        # would otherwise return non-final cluster_reps silently and
        # near_dedup_survivors would keep/drop the wrong documents
        import logging
        logging.getLogger(__name__).warning(
            "connected_components: label sum still decreasing after %d "
            "iterations — cluster_rep labels are NOT final (component "
            "diameter exceeds max_iterations; rerun with a higher limit)",
            max_iterations)

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b.column("node"),
                            "cluster_rep": b.column("label")}),
        batch_format="pyarrow")


# -- corpus-wide line dedup (C4-style) ---------------------------------------

LINE_TOKENS = 8                 # tokens per derived "line"
BOILERPLATE_LINE = "subscribe to our newsletter for updates"
_LINE_PACK = 1 << 20            # packed key = doc_id * 2^20 + line_idx
                                # (documented bound: < 2^20 lines per doc)


def line_dedup(docs: "ray.data.Dataset", *, line_tokens: int = LINE_TOKENS,
               boilerplate_mod: int = 0,
               num_partitions: int | None = None,
               hash_bits: int = 64) -> "ray.data.Dataset":
    """C4-style corpus-wide line deduplication (Raffel et al. 2020 §2.2):
    a line occurring in multiple documents is kept only at its FIRST
    occurrence in (doc_id, line_idx) order; every other occurrence is
    dropped and the documents are reassembled from their surviving lines.

    Lines are derived deterministically as ``line_tokens``-token chunks of
    the whitespace-tokenized text (the synthetic corpus is single-line);
    with ``boilerplate_mod`` > 0, docs with doc_id % mod == 0 get their
    first line replaced by a shared boilerplate constant so the dedup is
    exercised with real cross-doc duplicates (same pattern as the
    synthetic-PII injection).  Returns (doc_id, kept_lines, dropped_lines,
    text_deduped) — docs with zero tokens produce zero lines and are
    absent, matching the SQL mirror.

    Scale shape: the argmin groupby ships only (line_hash, packed-int)
    pairs; line TEXT crosses exactly one partitioned exchange (the winner
    join — the irreducible cost of any corpus-wide line dedup), and the
    reassembly groupby is keyed by doc_id.  No driver state.

    ``hash_bits`` selects the line-identity hash width: 64 (blake2b-64,
    int64 keys — fine to ~billions of lines, birthday bound ~2^32) or 128
    (full md5, hex-string keys — the trillions-of-lines / 100 TB setting;
    collision probability ~2^-64 at 2^40 lines).  Both widths produce
    identical output wherever the 64-bit hash is collision-free, which a
    parity test pins."""
    from ..util import coalesce_blocks, hash_join

    if hash_bits not in (64, 128):
        raise ValueError(f"hash_bits must be 64 or 128, got {hash_bits}")

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc: list[int] = []
        out_idx: list[int] = []
        out_line: list[str] = []
        for d, t in zip(ids, texts):
            toks = (t or "").lower().split()
            lines = [" ".join(toks[j:j + line_tokens])
                     for j in range(0, len(toks), line_tokens)]
            if len(lines) >= _LINE_PACK:
                # past the packing bound the key would bleed into the
                # next doc_id's space and corrupt first-occurrence wins —
                # fail loudly instead of silently mis-deduping
                raise ValueError(
                    f"doc {d}: {len(lines)} lines >= packing bound "
                    f"{_LINE_PACK}; raise _LINE_PACK for this corpus")
            if boilerplate_mod and lines and d % boilerplate_mod == 0:
                lines[0] = BOILERPLATE_LINE
            out_doc.extend([d] * len(lines))
            out_idx.extend(range(len(lines)))
            out_line.extend(lines)
        doc = np.asarray(out_doc, dtype=np.int64)
        idx = np.asarray(out_idx, dtype=np.int64)
        if hash_bits == 64:
            lh = pa.array(hash64_column(out_line).view(np.int64), pa.int64())
        else:
            from hashlib import md5
            lh = pa.array([md5(ln.encode("utf-8")).hexdigest()
                           for ln in out_line], pa.string())
        return pa.table({
            "line_hash": lh,
            "doc_id": pa.array(doc, pa.int64()),
            "line_idx": pa.array(idx, pa.int64()),
            "line": pa.array(out_line, pa.string()),
            "packed": pa.array(doc * _LINE_PACK + idx, pa.int64()),
        })

    if num_partitions is None:
        # materialize before counting: .count() on a lazy derived dataset
        # (the callers pass transcripts_from_documents + assign_doc_ids)
        # would execute the whole upstream pipeline once just to size the
        # partitions, then again for the real run
        docs = docs.select_columns(["doc_id", "text"]).materialize()
        num_partitions = int(max(2, min(64, docs.count() // 500_000 + 2)))
    exploded = docs.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")

    winners = coalesce_blocks(
        exploded.select_columns(["line_hash", "packed"])
        .groupby("line_hash").aggregate(Min("packed")).map_batches(
            lambda b: pa.table({"line_hash": b.column("line_hash"),
                                "mp": b.column("min(packed)")}),
            batch_format="pyarrow"))

    flags = hash_join(exploded, winners, "inner",
                      num_partitions=num_partitions, on=("line_hash",))

    def flag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "line_idx": batch.column("line_idx"),
            "line": batch.column("line"),
            "keep": pc.equal(batch.column("packed"), batch.column("mp")),
        })

    def assemble(group: pa.Table) -> pa.Table:
        idx = group.column("line_idx").to_numpy(zero_copy_only=False)
        keep = group.column("keep").to_numpy(zero_copy_only=False)
        lines = group.column("line").to_pylist()
        order = np.argsort(idx, kind="stable")
        kept = [lines[i] for i in order if keep[i]]
        return pa.table({
            "doc_id": group.column("doc_id").slice(0, 1),
            "kept_lines": pa.array([int(keep.sum())], pa.int64()),
            "dropped_lines": pa.array([int(len(keep) - keep.sum())],
                                      pa.int64()),
            "text_deduped": pa.array(["\n".join(kept)], pa.string()),
        })

    return (flags.map_batches(flag, batch_format="pyarrow")
            .groupby("doc_id").map_groups(assemble, batch_format="pyarrow"))


# -- winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
#    algorithm) -------------------------------------------------------------

def _winnow_batch(batch: pa.Table, *, k: int, w: int) -> pa.Table:
    """(doc_id, text) -> DISTINCT (doc_id, pos, fp) winnowing fingerprints.

    Char ``k``-grams of the lowercased text are md5-hashed; each length-``w``
    window of consecutive gram hashes selects its MINIMUM hash, RIGHTMOST
    occurrence on ties (the paper's density rule), and the selected
    (position, hash) pairs are deduplicated.  ``pos`` is 1-based (the SQL
    mirror's substr convention).  Docs with fewer than ``w`` grams emit
    nothing (no full window exists).

    Vectorized: one md5 pass per batch over the factorized gram strings,
    then the window minimum via ``w`` shifted views (w is small) and the
    rightmost-tie argmax over the reversed equality matrix — no per-window
    Python loop."""
    import pandas as pd

    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    grams: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        lt = (t or "").lower()
        n = max(0, len(lt) - k + 1)
        counts[i] = n
        grams.extend(lt[j:j + k] for j in range(n))
    out_d: list[int] = []
    out_p: list[int] = []
    out_h: list[int] = []
    if grams:
        codes, uniques = pd.factorize(np.asarray(grams, dtype=object),
                                      sort=False)
        hashes = md5_hash64_column(list(uniques))[codes]
        start = 0
        for i, n in enumerate(counts):
            n = int(n)
            h = hashes[start:start + n]
            start += n
            if n < w:
                continue
            L = n - w + 1
            stack = np.stack([h[s:s + L] for s in range(w)])   # (w, L)
            mins = stack.min(axis=0)
            # rightmost tie: first match scanning shifts in reverse order
            rev_eq = (stack[::-1] == mins)
            idx = (w - 1) - np.argmax(rev_eq, axis=0)
            pos = np.arange(L, dtype=np.int64) + idx            # 0-based
            sel = np.unique(pos)
            out_d.extend([doc_ids[i]] * len(sel))
            out_p.extend((sel + 1).tolist())                    # 1-based
            out_h.extend(h[sel].view(np.int64).tolist())   # signed64 wrap
    return pa.table({
        "doc_id": pa.array(out_d, pa.int64()),
        "pos": pa.array(out_p, pa.int64()),
        "fp": pa.array(out_h, pa.int64()),
    })


def winnow_fingerprints(docs: "ray.data.Dataset", *, k: int = 8, w: int = 4
                        ) -> "ray.data.Dataset":
    """Winnowing document fingerprints (MOSS): the guaranteed-coverage
    local-minimum sampling of char-k-gram hashes — any shared substring of
    length >= k + w - 1 between two documents shares at least one selected
    fingerprint, at ~2/(w+1) the density of the full gram set.  Streaming
    per-batch map; downstream containment joins group on ``fp``."""
    import functools
    return docs.select_columns(["doc_id", "text"]).map_batches(
        functools.partial(_winnow_batch, k=k, w=w), batch_format="pyarrow")


def _winnow_distinct_batch(batch: pa.Table, *, k: int, w: int) -> pa.Table:
    """(doc_id, text) batch -> DISTINCT (doc_id, fp) winnow fingerprints.

    Fingerprinting and the per-doc dedup are COMPOSED into one batch fn so
    the "one doc = one input row" invariant genuinely holds for the dedup
    (a separate map_batches stage would see fingerprint ROWS, many per
    doc, and any re-blocking between the stages could split a doc across
    batches — emitting self-pairs and double-counted shared_fps
    downstream)."""
    b = _winnow_batch(batch, k=k, w=w)
    d = b.column("doc_id").to_numpy(zero_copy_only=False)
    f = b.column("fp").to_numpy(zero_copy_only=False)
    u = (np.unique(np.stack([d, f], axis=1), axis=0)
         if len(d) else np.zeros((0, 2), dtype=np.int64))
    return pa.table({
        "doc_id": pa.array(u[:, 0], pa.int64()),
        "fp": pa.array(u[:, 1], pa.int64()),
    })


def _winnow_pair_group(group: pa.Table, *, max_df: int) -> pa.Table:
    """One fp's docs -> ordered candidate pairs; groups wider than
    ``max_df`` are DROPPED (the MOSS rarity rule: a fingerprint shared by
    many documents is boilerplate, not evidence of copying — and the rule
    doubles as the bucket-width bound that keeps the pair fan-out
    O(max_df^2) per fingerprint at any corpus size)."""
    n = group.num_rows
    if n < 2 or n > max_df:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    ids = np.sort(group.column("doc_id").to_numpy(zero_copy_only=False))
    ia, ib = np.triu_indices(n, k=1)
    return pa.table({
        "doc_a": pa.array(ids[ia], pa.int64()),
        "doc_b": pa.array(ids[ib], pa.int64()),
    })


def winnow_containment_pairs(docs: "ray.data.Dataset", *, k: int = 8,
                             w: int = 4, max_df: int = 3,
                             min_shared: int = 3) -> "ray.data.Dataset":
    """Containment / partial-plagiarism candidate pairs via winnowing
    (the MOSS pipeline): docs sharing >= ``min_shared`` RARE selected
    fingerprints (each held by <= ``max_df`` docs) — shared substrings of
    length >= k + w - 1 guarantee a shared fingerprint, rarity filters
    boilerplate.  Output: (doc_a, doc_b, shared_fps), doc_a < doc_b.

    Shape: fingerprint -> distinct (doc, fp) -> groupby(fp) pair emission
    (bounded by the rarity rule) -> keyed pair count.  No all-pairs stage;
    every exchange keys on fp or the pair."""
    import functools

    import functools as _ft
    dfp = docs.select_columns(["doc_id", "text"]).map_batches(
        _ft.partial(_winnow_distinct_batch, k=k, w=w),
        batch_format="pyarrow")
    pairs = dfp.groupby("fp").map_groups(
        functools.partial(_winnow_pair_group, max_df=max_df),
        batch_format="pyarrow")
    agg = pairs.groupby(["doc_a", "doc_b"]).aggregate(Count())

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_a" not in b.column_names:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "shared_fps": pa.array([], pa.int64())})
        keep = pc.greater_equal(b.column("count()"), min_shared)
        b = b.filter(keep)
        return pa.table({
            "doc_a": b.column("doc_a"),
            "doc_b": b.column("doc_b"),
            "shared_fps": b.column("count()").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
