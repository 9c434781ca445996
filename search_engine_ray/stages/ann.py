"""Similarity search over embedding columns (north-rule training-data ops).

  * brute_force_topk — exact cosine top-k: per-batch numpy matmul against a
    broadcast query matrix (ray.put once, read per actor), per-batch partial
    top-k, final merge over (num_batches x k) partials.
  * lsh_topk — random-hyperplane LSH bucketing as a scale path: probe only
    buckets within a Hamming radius of each query's sign signature.
  * ivf_topk — IVF in-stream path: deterministic k-means coarse quantizer,
    queries probe only the n_probe nearest centroid lists (per-batch mask).
  * ivf_build / ivf_search — IVF physical layout: embeddings written
    hive-partitioned by list id; a search passes ONLY the probed lists'
    files to the reader, so scan bytes ∝ n_probe/n_lists (ivf_scan_stats
    measures it).  Identical results to ivf_topk.
  * cosine_near_dup_pairs — embedding near-dup pairs (cosine >= threshold)
    via LSH band blocking.

All stages stream over ``list<float>`` / ``fixed_size_list<float>`` Arrow
columns; ``_batch_matrix`` reshapes the flat Arrow child buffer zero-copy
(one ``astype`` only when the storage type isn't float64) — no per-row
``to_pylist`` in any hot path.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list column, zero-copy where the
    layout allows (constant-width lists, no nulls, float64 storage)."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.values.to_numpy(zero_copy_only=False)
        d = arr.type.list_size
        return flat[arr.offset * d:(arr.offset + len(arr)) * d].reshape(
            len(arr), d).astype(np.float64, copy=False)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        off = arr.offsets.to_numpy(zero_copy_only=False)
        if len(off) > 1:
            widths = np.diff(off)
            if (widths == widths[0]).all() and widths[0] > 0:
                flat = arr.values.to_numpy(zero_copy_only=False)
                return flat[off[0]:off[-1]].reshape(
                    len(arr), int(widths[0])).astype(np.float64, copy=False)
    return np.asarray(arr.to_pylist(), dtype=np.float64)


# byte-wise popcount lookup: Hamming distance over uint64 signatures without
# a per-bit Python loop
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POP8[np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)
                 ].sum(axis=1).astype(np.int64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteForceScorer:
    """Partial top-k per batch against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
            else queries_ref
        self._qids = q["ids"]
        self._qmat = _normalize(np.asarray(q["vecs"], dtype=np.float64))
        self._k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_batch_matrix(batch))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        sims = self._qmat @ vecs.T                     # (nq, nb)
        k = min(self._k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k] if k < len(row) else \
                np.arange(len(row))
            for j in top:
                out_q.append(int(self._qids[qi]))
                out_v.append(int(ids[j]))
                out_s.append(float(row[j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })


def brute_force_topk(embeddings: "ray.data.Dataset", query_ids: list[int],
                     query_vecs: np.ndarray, k: int = 10) -> pa.Table:
    """Exact cosine top-k per query.  Final ordering: (query_id ASC,
    cosine DESC, vec_id ASC) with deterministic tie-breaks."""
    ref = ray.put({"ids": list(query_ids), "vecs": np.asarray(query_vecs)})
    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _BruteForceScorer, fn_constructor_args=(ref, k),
        batch_format="pyarrow", concurrency=(1, 8))
    # merge partials: tiny (num_batches x num_queries x k rows)
    return _merge_topk_partials(partials, k)


# -- LSH (random hyperplanes) ----------------------------------------------

def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def _signatures(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    sig = np.zeros(len(vecs), dtype=np.uint64)
    for b in range(planes.shape[0]):
        sig |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return sig


def lsh_topk(embeddings: "ray.data.Dataset", query_ids: list[int],
             query_vecs: np.ndarray, k: int = 10, *, n_bits: int = 12,
             probe_hamming: int = 2, seed: int = 42) -> pa.Table:
    """Approximate cosine top-k: score only vectors whose hyperplane
    signature is within ``probe_hamming`` of the query's.  Same output shape
    as brute_force_topk; recall measured in tests.

    This is the in-stream variant (signature mask over a full scan — compute
    savings only); the PHYSICAL scale path lives in lsh_build / lsh_search
    below, which writes vectors hive-partitioned by signature bucket so a
    query reads only the probed Hamming neighborhoods.  Both paths share the
    plane/signature arithmetic and return identical results."""
    qv = np.asarray(query_vecs, dtype=np.float64)
    planes = _hyperplanes(qv.shape[1], n_bits, seed)
    qsigs = _signatures(_normalize(qv), planes)
    ref = ray.put({"ids": list(query_ids), "vecs": qv, "planes": planes,
                   "qsigs": qsigs})

    class Scorer:
        def __init__(self, ref, k, probe):
            q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self._qids = q["ids"]
            self._qmat = _normalize(np.asarray(q["vecs"]))
            self._planes = q["planes"]
            self._qsigs = q["qsigs"]
            self._k = k
            self._probe = probe

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_batch_matrix(batch))
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            sigs = _signatures(vecs, self._planes)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self._qids)):
                ham = _popcount64(sigs ^ self._qsigs[qi])
                mask = ham <= self._probe
                if not mask.any():
                    continue
                row = self._qmat[qi] @ vecs[mask].T
                sel_ids = ids[mask]
                k = min(self._k, len(row))
                top = np.argpartition(-row, k - 1)[:k] if k < len(row) else \
                    np.arange(len(row))
                for j in top:
                    out_q.append(int(self._qids[qi]))
                    out_v.append(int(sel_ids[j]))
                    out_s.append(float(row[j]))
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            })

    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        Scorer, fn_constructor_args=(ref, k, probe_hamming),
        batch_format="pyarrow", concurrency=(1, 8))
    return _merge_topk_partials(partials, k)


# -- LSH physical layout ------------------------------------------------------
# Same move as the IVF layout below: the in-stream lsh_topk saves COMPUTE
# only (probe mask over a full scan); at 100x the win requires the table to
# be WRITTEN bucketed by signature so a query physically reads only probed
# partitions.  Buckets are the top ``bucket_bits`` of the signature: total
# Hamming distance <= probe implies prefix Hamming <= probe, so the bucket
# filter is a sound superset of the signature filter (no recall change), and
# bucket count stays bounded (2^bucket_bits directories) independent of
# n_bits.

def auto_n_lists(n_vectors: int) -> int:
    """√N heuristic for coarse-partition counts (IVF lists / LSH buckets /
    SemDeDup clusters): lists ≈ √N keeps per-list size ≈ √N, so probed scan
    bytes shrink as n_probe/√N while per-list work stays bounded — the
    published IVF/SemDeDup sizing (the SemDeDup paper runs 50k clusters for
    100M+ docs ≈ √N·5).  Rounded to a power of two, clamped [16, 65536]."""
    import math
    if n_vectors <= 0:
        return 16
    return int(min(65536, max(
        16, 2 ** math.ceil(math.log2(max(1.0, math.sqrt(n_vectors)))))))


def lsh_build(embeddings: "ray.data.Dataset", index_dir: str, *,
              n_bits: int = 12, bucket_bits: int | None = None,
              seed: int = 42) -> np.ndarray:
    """Write the embedding table hive-partitioned by signature bucket
    (``bucket = sig >> (n_bits - bucket_bits)``), storing the full signature
    per row so search masks on the STORED bits (bit-identical to the
    in-stream path, no recompute drift).  Returns the hyperplanes.

    ``bucket_bits=None`` derives from corpus size: log2(auto_n_lists(N)) + 2
    (clamped to n_bits) — bucket count grows ~√N·4 so a Hamming-≤2 probe's
    scan fraction keeps SHRINKING with N instead of being pinned by a
    small-scale constant."""
    import json
    import os

    if bucket_bits is None:
        import math
        bucket_bits = min(
            n_bits, int(math.log2(auto_n_lists(embeddings.count()))) + 2)

    dim = _train_sample(embeddings, 1).shape[1]
    planes = _hyperplanes(dim, n_bits, seed)
    pref = ray.put(planes)
    shift = np.uint64(n_bits - bucket_bits)

    def assign(batch: pa.Table) -> pa.Table:
        p = ray.get(pref)
        sigs = _signatures(_normalize(_batch_matrix(batch)), p)
        batch = batch.append_column("sig", pa.array(sigs, pa.uint64()))
        return batch.append_column(
            "bucket", pa.array((sigs >> shift).astype(np.int32)))

    os.makedirs(index_dir, exist_ok=True)
    embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "buckets"), partition_cols=["bucket"])
    np.save(os.path.join(index_dir, "planes.npy"), planes)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"n_bits": n_bits, "bucket_bits": bucket_bits}, f)
    return planes


def lsh_scan_stats(index_dir: str, probe_buckets) -> dict:
    """Bytes a probed search physically reads vs the full table."""
    import os
    union = {int(x) for row in np.atleast_2d(probe_buckets) for x in row}
    return _hive_scan_stats(os.path.join(index_dir, "buckets"), "bucket=",
                            union)


def lsh_search(index_dir: str, query_ids: list[int],
               query_vecs: np.ndarray, k: int = 10, *,
               probe_hamming: int = 2) -> pa.Table:
    """Top-k over a physical LSH layout: prune to the union of every
    query's Hamming-<=probe bucket neighborhoods AT THE READ (non-probed
    partitions never leave storage), then the same per-row signature mask
    as lsh_topk against the STORED signatures.  Output is identical to
    lsh_topk at the same (n_bits, seed, probe_hamming)."""
    import json
    import os

    planes = np.load(os.path.join(index_dir, "planes.npy"))
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n_bits, bucket_bits = meta["n_bits"], meta["bucket_bits"]
    shift = np.uint64(n_bits - bucket_bits)

    qv = np.asarray(query_vecs, dtype=np.float64)
    qsigs = _signatures(_normalize(qv), planes)
    qtops = (qsigs >> shift).astype(np.uint64)
    all_buckets = np.arange(1 << bucket_bits, dtype=np.uint64)
    union: set = set()
    for qt in qtops:
        near = all_buckets[_popcount64(all_buckets ^ qt) <= probe_hamming]
        union.update(int(b) for b in near)
    ref = ray.put({"ids": list(query_ids), "qmat": _normalize(qv),
                   "qsigs": qsigs})

    buckets_dir = os.path.join(index_dir, "buckets")
    paths = []
    for b in sorted(union):
        d = os.path.join(buckets_dir, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding", "sig"])

    class Scorer:
        def __init__(self, ref, k, probe):
            q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self._qids = q["ids"]
            self._qmat = q["qmat"]
            self._qsigs = q["qsigs"]
            self._k = k
            self._probe = probe

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_batch_matrix(batch))
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            sigs = batch.column("sig").to_numpy(
                zero_copy_only=False).astype(np.uint64)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self._qids)):
                mask = _popcount64(sigs ^ self._qsigs[qi]) <= self._probe
                if not mask.any():
                    continue
                row = self._qmat[qi] @ vecs[mask].T
                sel_ids = ids[mask]
                kk = min(self._k, len(row))
                top = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) \
                    else np.arange(len(row))
                for j in top:
                    out_q.append(int(self._qids[qi]))
                    out_v.append(int(sel_ids[j]))
                    out_s.append(float(row[j]))
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            })

    partials = ds.map_batches(Scorer,
                              fn_constructor_args=(ref, k, probe_hamming),
                              batch_format="pyarrow", concurrency=(1, 8))
    return _merge_topk_partials(partials, k)


def _hive_scan_stats(part_dir: str, prefix: str, union: set) -> dict:
    """Shared probed-vs-total byte accounting for hive layouts (IVF lists,
    LSH buckets) — the scan-fraction evidence surfaced in the bench."""
    import os
    total = probed = 0
    for d in os.listdir(part_dir):
        if not d.startswith(prefix):
            continue
        sz = sum(os.path.getsize(os.path.join(part_dir, d, f))
                 for f in os.listdir(os.path.join(part_dir, d)))
        total += sz
        if int(d.split("=", 1)[1]) in union:
            probed += sz
    return {"probed_bytes": probed, "total_bytes": total,
            "scan_fraction": round(probed / total, 4) if total else 0.0}


def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means over unit vectors (coarse quantizer
    for IVF); returns (k, dim) normalized centroids rounded to 6 dp.

    Init is an even stride over the (vec_id-ordered) training sample, and
    every iteration re-normalizes then rounds centroids to 6 decimals, so
    the whole quantizer is recomputable by an ANSI-SQL oracle as chained
    CTEs without ulp divergence: both sides compute assignments from
    identical 6-dp centroids (an argmax flip would need two centroid dots
    within ~1e-15).  ``seed`` is kept for API compatibility but unused —
    a data-order init is reproducible by SQL, an rng draw is not."""
    sample = _normalize(sample)
    k = min(k, len(sample))
    cents = np.round(sample[(np.arange(k) * len(sample)) // k], 6)
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        new = cents.copy()
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        cents = np.round(_normalize(new), 6)
    return cents


def ivf_topk(embeddings: "ray.data.Dataset", query_ids: list[int],
             query_vecs: np.ndarray, k: int = 10, *, n_lists: int = 16,
             n_probe: int = 4, train_sample: int = 2048,
             seed: int = 42) -> pa.Table:
    """IVF approximate cosine top-k — the inverted-file scale path: a coarse
    k-means quantizer (trained once on a driver-side sample, broadcast)
    assigns every vector to its nearest centroid list; queries score only
    vectors whose list is among the query's ``n_probe`` closest centroids.

    This is the in-stream variant (per-batch probe mask over a full scan —
    compute savings only); the PHYSICAL scale path lives in ivf_build /
    ivf_search below, which writes vectors hive-partitioned by list id so a
    query reads only n_probe/n_lists of the stored bytes.  Both paths share
    the quantizer and assignment arithmetic and return identical results.
    Same output shape as brute_force_topk; recall pytest.

    The training sample contract lives in ``_train_sample`` (shared with
    pq_train)."""
    train = _train_sample(embeddings, train_sample)
    cents = _kmeans(train, n_lists, seed=seed)
    qv = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe_lists = np.argsort(-(qv @ cents.T), axis=1)[:, :n_probe]
    ref = ray.put({"ids": list(query_ids), "qmat": qv, "cents": cents,
                   "probe": probe_lists})

    class Scorer:
        def __init__(self, ref, k):
            q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self._qids = q["ids"]
            self._qmat = q["qmat"]
            self._cents = q["cents"]
            self._probe = [set(p.tolist()) for p in q["probe"]]
            self._k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_batch_matrix(batch))
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            assign = np.argmax(vecs @ self._cents.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self._qids)):
                mask = np.isin(assign, list(self._probe[qi]))
                if not mask.any():
                    continue
                row = self._qmat[qi] @ vecs[mask].T
                sel_ids = ids[mask]
                kk = min(self._k, len(row))
                top = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) \
                    else np.arange(len(row))
                for j in top:
                    out_q.append(int(self._qids[qi]))
                    out_v.append(int(sel_ids[j]))
                    out_s.append(float(row[j]))
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            })

    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        Scorer, fn_constructor_args=(ref, k),
        batch_format="pyarrow", concurrency=(1, 8))
    return _merge_topk_partials(partials, k)


# -- physical IVF layout ------------------------------------------------------
# The scale path the in-stream ivf_topk docstring defers to: embeddings are
# WRITTEN hive-partitioned by coarse list id, so a query physically reads
# only its probed partitions (scan bytes ∝ n_probe/n_lists) instead of
# streaming the whole table and masking.

def ivf_build(embeddings: "ray.data.Dataset", index_dir: str, *,
              n_lists: int | None = None, train_sample: int = 2048,
              seed: int = 42) -> np.ndarray:
    """Train the coarse quantizer (same deterministic _kmeans contract as
    ivf_topk) and write the embedding table partitioned by ``list_id``
    (hive layout, one directory per inverted list) plus the centroids.
    Assignment is identical to the in-stream path: _normalize + argmax
    against the 6-dp-rounded centroids, so a partitioned search returns
    exactly what ivf_topk returns.  Returns the (n_lists, dim) centroids.

    ``n_lists=None`` derives ``auto_n_lists(N)`` (√N) and widens the
    training sample to ≥16 vectors per centroid — scan bytes per query then
    shrink as n_probe/√N instead of being pinned by a small-scale constant.
    Oracled entries pass an EXPLICIT n_lists (the SQL mirror pins it)."""
    import os

    if n_lists is None:
        n_lists = auto_n_lists(embeddings.count())
        train_sample = max(train_sample, 16 * n_lists)
    train = _train_sample(embeddings, train_sample)
    cents = _kmeans(train, n_lists, seed=seed)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        vecs = _normalize(_batch_matrix(batch))
        a = np.argmax(vecs @ c.T, axis=1).astype(np.int32)
        return batch.append_column("list_id", pa.array(a))

    os.makedirs(index_dir, exist_ok=True)
    embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "lists"), partition_cols=["list_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    return cents


def ivf_scan_stats(index_dir: str, probe_lists: "np.ndarray") -> dict:
    """Bytes a probed search physically reads vs the full table — the
    scan-fraction evidence for the partitioned layout (bench surface)."""
    import os

    union = {int(x) for row in np.atleast_2d(probe_lists) for x in row}
    return _hive_scan_stats(os.path.join(index_dir, "lists"), "list_id=",
                            union)


def ivf_search(index_dir: str, query_ids: list[int],
               query_vecs: np.ndarray, k: int = 10, *,
               n_probe: int = 4) -> pa.Table:
    """Top-k over a physical IVF layout: prune to the union of every
    query's ``n_probe`` nearest lists AT THE READ (hive-partition filter —
    non-probed partitions never leave storage), then per-query masking by
    the stored list_id.  Output is identical to ivf_topk at the same
    quantizer settings; ties and merge semantics via _merge_topk_partials."""
    import os

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    qv = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe_lists = np.argsort(-(qv @ cents.T), axis=1)[:, :n_probe]
    union = sorted({int(x) for row in probe_lists for x in row})
    ref = ray.put({"ids": list(query_ids), "qmat": qv,
                   "probe": probe_lists})

    # pruning by construction: ONLY the probed lists' directories are passed
    # to the reader, so non-probed partitions never leave storage (no
    # reliance on filter pushdown); empty lists have no directory
    lists_dir = os.path.join(index_dir, "lists")
    paths = []
    for l in union:
        d = os.path.join(lists_dir, f"list_id={l}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    from ray.data.datasource.partitioning import Partitioning
    ds = ray.data.read_parquet(
        paths, columns=["vec_id", "embedding", "list_id"],
        partitioning=Partitioning("hive", base_dir=lists_dir,
                                  field_types={"list_id": int}))

    class Scorer:
        def __init__(self, ref, k):
            q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self._qids = q["ids"]
            self._qmat = q["qmat"]
            self._probe = [set(p.tolist()) for p in q["probe"]]
            self._k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_batch_matrix(batch))
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            lists = batch.column("list_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self._qids)):
                mask = np.isin(lists, list(self._probe[qi]))
                if not mask.any():
                    continue
                row = self._qmat[qi] @ vecs[mask].T
                sel_ids = ids[mask]
                kk = min(self._k, len(row))
                top = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) \
                    else np.arange(len(row))
                for j in top:
                    out_q.append(int(self._qids[qi]))
                    out_v.append(int(sel_ids[j]))
                    out_s.append(float(row[j]))
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            })

    partials = ds.map_batches(Scorer, fn_constructor_args=(ref, k),
                              batch_format="pyarrow", concurrency=(1, 8))
    return _merge_topk_partials(partials, k)


def _train_sample(embeddings: "ray.data.Dataset", n: int) -> np.ndarray:
    """Deterministic RAW training sample: ``vec_id < n`` in vec_id order —
    an id predicate (not ``limit``, whose block order Ray does not
    guarantee) that a SQL oracle can reproduce; assumes dense-ish ids as
    in the driver tables.  At scale substitute any deterministic id
    predicate (e.g. ``hash(vec_id) % m == 0``).  Shared by the IVF and PQ
    quantizer trainers so the sampling contract lives in one place.
    Raw, not normalized: each trainer applies exactly ONE normalization
    (inside _kmeans for IVF, before _kmeans_l2 for PQ) so the engine
    matches the oracle's single-normalize arithmetic at ulp level."""
    import pyarrow.compute as pc
    sample = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        lambda b: b.filter(pc.field("vec_id") < n),
        batch_format="pyarrow").take_all()
    sample.sort(key=lambda r: r["vec_id"])
    return np.asarray([r["embedding"] for r in sample], dtype=np.float64)


def _kmeans_l2(sample: np.ndarray, k: int, iters: int = 5) -> np.ndarray:
    """Plain-L2 deterministic Lloyd for PQ sub-quantizers (Jégou et al.
    2011): stride init over the vec_id-ordered sample, centroids rounded
    to 6 dp every iteration (same oracle-reproducibility contract as
    ``_kmeans``), assignment = argmin(||c||^2 - 2 x.c) with cid-ascending
    ties, empty clusters keep their previous centroid."""
    k = min(k, len(sample))
    cents = np.round(sample[(np.arange(k) * len(sample)) // k], 6)
    for _ in range(iters):
        d = (cents ** 2).sum(axis=1)[None, :] - 2.0 * (sample @ cents.T)
        assign = np.argmin(d, axis=1)
        new = cents.copy()
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        cents = np.round(new, 6)
    return cents


def pq_train(embeddings: "ray.data.Dataset", *, m: int = 4, ksub: int = 16,
             train_sample: int = 2048, iters: int = 5) -> np.ndarray:
    """(m, ksub, dim/m) PQ codebooks trained on the shared deterministic
    sample (``_train_sample``, same contract as ivf_topk), over NORMALIZED
    vectors so ADC approximates cosine."""
    train = _normalize(_train_sample(embeddings, train_sample))
    dim = train.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    return np.stack([
        _kmeans_l2(train[:, s * dsub:(s + 1) * dsub], ksub, iters=iters)
        for s in range(m)])


def _pq_assign(vecs: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) int64 PQ codes for normalized vectors."""
    m, _, dsub = codebooks.shape
    codes = np.empty((len(vecs), m), dtype=np.int64)
    for s in range(m):
        cents = codebooks[s]
        sub = vecs[:, s * dsub:(s + 1) * dsub]
        d = (cents ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ cents.T)
        codes[:, s] = np.argmin(d, axis=1)
    return codes


def pq_encode(embeddings: "ray.data.Dataset", codebooks: np.ndarray
              ) -> "ray.data.Dataset":
    """(vec_id, code_0..code_{m-1}) — the compressed representation: m
    small-int codes per vector (m*log2(ksub) bits of payload instead of
    dim floats; at 100 TB the codes table is what ships/persists, the
    float vectors stay at rest).  Codebooks are broadcast once."""
    ref = ray.put(codebooks)
    m = codebooks.shape[0]

    class Encoder:
        def __init__(self, ref):
            self._cb = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_batch_matrix(batch))
            codes = _pq_assign(vecs, self._cb)
            cols = {"vec_id": batch.column("vec_id")}
            for s in range(m):
                cols[f"code_{s}"] = pa.array(codes[:, s], pa.int64())
            return pa.table(cols)

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        Encoder, fn_constructor_args=(ref,), batch_format="pyarrow",
        concurrency=(1, 8))


def pq_topk(embeddings: "ray.data.Dataset", query_ids: list[int],
            query_vecs: np.ndarray, k: int = 10, *, m: int = 4,
            ksub: int = 16, train_sample: int = 2048,
            iters: int = 5) -> pa.Table:
    """PQ-compressed approximate cosine top-k via ADC (asymmetric distance
    computation, Jégou et al. 2011): queries score against per-subspace
    lookup tables of q_sub . centroid dots, so each candidate costs m
    table lookups instead of a dim-float dot.

    Scores are rounded to 6 dp BEFORE ranking on both engine and oracle
    (adc DESC, vec_id ASC), the m per-subspace terms are summed in
    subspace order on both sides, and every quantizer iteration rounds
    centroids to 6 dp — the same ulp-discipline as ivf_topk."""
    codebooks = pq_train(embeddings, m=m, ksub=ksub,
                         train_sample=train_sample, iters=iters)
    codes = pq_encode(embeddings, codebooks)

    qv = _normalize(np.asarray(query_vecs, dtype=np.float64))
    dsub = codebooks.shape[2]
    # (nq, m, ksub) ADC lookup tables
    lut = np.stack([qv[:, s * dsub:(s + 1) * dsub] @ codebooks[s].T
                    for s in range(m)], axis=1)
    ref = ray.put({"ids": list(query_ids), "lut": lut})

    class Scorer:
        def __init__(self, ref, k):
            q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self._qids = q["ids"]
            self._lut = q["lut"]
            self._k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            codes = np.stack([
                batch.column(f"code_{s}").to_numpy(zero_copy_only=False)
                for s in range(m)], axis=1)
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self._qids):
                score = self._lut[qi, 0][codes[:, 0]]
                for s in range(1, m):            # subspace-order sum
                    score = score + self._lut[qi, s][codes[:, s]]
                score = np.round(score, 6)       # rank on rounded
                kk = min(self._k, len(score))
                order = np.lexsort((ids, -score))[:kk]
                for j in order:
                    out_q.append(int(qid))
                    out_v.append(int(ids[j]))
                    out_s.append(float(score[j]))
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            })

    partials = codes.map_batches(Scorer, fn_constructor_args=(ref, k),
                                 batch_format="pyarrow", concurrency=(1, 8))
    return _merge_topk_partials(partials, k)


def _merge_topk_partials(partials: "ray.data.Dataset", k: int) -> pa.Table:
    """Tiny driver merge of per-batch partial top-ks (num_batches x k rows),
    deterministic (cosine DESC, vec_id ASC) ranking."""
    heaps: dict[int, list] = {}
    for batch in partials.iter_batches(batch_format="pyarrow"):
        for q, v, s in zip(batch.column("query_id").to_pylist(),
                           batch.column("vec_id").to_pylist(),
                           batch.column("cosine").to_pylist()):
            heapq.heappush(heaps.setdefault(q, []), (s, -v))
            if len(heaps[q]) > k:
                heapq.heappop(heaps[q])
    out_q, out_v, out_s, out_r = [], [], [], []
    for q in sorted(heaps):
        ranked = sorted(((-s, -nv) for s, nv in heaps[q]))
        for rank, (ns, v) in enumerate(ranked, start=1):
            out_q.append(q)
            out_v.append(int(v))
            out_s.append(-ns)
            out_r.append(rank)
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "cosine": pa.array(out_s, pa.float64()),
        "rank": pa.array(out_r, pa.int64()),
    })


def cosine_near_dup_pairs(embeddings: "ray.data.Dataset", *,
                          threshold: float = 0.95, n_bits: int = 10,
                          seed: int = 42) -> "ray.data.Dataset":
    """Embedding near-dup pairs (vec_a < vec_b, cosine >= threshold) blocked
    by exact LSH signature match (all shuffles keyed by signature)."""
    first = embeddings.take(1)
    if not first:
        return ray.data.from_arrow(pa.table({
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    dim = len(first[0]["embedding"])
    planes = _hyperplanes(dim, n_bits, seed)
    planes_ref = ray.put(planes)

    def sig_batch(batch: pa.Table) -> pa.Table:
        vecs = _normalize(_batch_matrix(batch))
        sigs = _signatures(vecs, ray.get(planes_ref)).astype(np.int64)
        return pa.table({
            "sig": pa.array(sigs),
            "vec_id": batch.column("vec_id"),
            "embedding": batch.column("embedding"),
        })

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # degenerate-bucket guard: in-bucket work is O(width^2); a bucket
        # wider than the cap is truncated (by vec_id) with a logged overflow
        MAX_SIG_BUCKET = 4096
        if group.num_rows > MAX_SIG_BUCKET:
            import logging
            logging.getLogger(__name__).warning(
                "cosine near-dup bucket overflow: %d rows > cap %d, "
                "truncating", group.num_rows, MAX_SIG_BUCKET)
            group = group.sort_by("vec_id").slice(0, MAX_SIG_BUCKET)
        ids = group.column("vec_id").to_pylist()
        vecs = _normalize(_batch_matrix(group))
        sims = vecs @ vecs.T
        a, b, s = [], [], []
        order = np.argsort(ids)
        for ii in range(len(ids)):
            for jj in range(ii + 1, len(ids)):
                i, j = order[ii], order[jj]
                if sims[i, j] >= threshold:
                    a.append(int(ids[i]))
                    b.append(int(ids[j]))
                    s.append(float(sims[i, j]))
        return pa.table({"vec_a": pa.array(a, pa.int64()),
                         "vec_b": pa.array(b, pa.int64()),
                         "cosine": pa.array(s, pa.float64())})

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        sig_batch, batch_format="pyarrow").groupby("sig").map_groups(
        bucket_pairs, batch_format="pyarrow")


# -- SemDeDup: semantic deduplication via k-means + intra-cluster cosine ------

def semdedup(embeddings: "ray.data.Dataset", *, n_lists: int | None = 16,
             tau: float = 0.95, train_sample: int = 2048
             ) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023): cluster embeddings with the IVF coarse
    quantizer, then flag semantic duplicates INSIDE each cluster — a member
    is a duplicate iff some cluster-mate EARLIER in (centroid-cosine ASC,
    vec_id ASC) order has pairwise cosine > ``tau``.  Keep-low-centroid-sim
    matches the paper's rule (retain the example farthest from the cluster
    centroid); the earlier-in-order formulation makes the flag a plain
    EXISTS self-join the SQL oracle reproduces exactly.

    Output: (vec_id, cluster_id, cent_cos, is_dup) — the full flag matrix;
    survivors = ``is_dup = 0``.

    Scale shape: the quantizer trains once on a deterministic sample
    (``_train_sample``) and broadcasts; assignment is a streaming
    ``map_batches``; the pairwise pass is a ``groupby(cluster_id)`` — the
    cluster id is the partition key, exactly how the published recipe
    shards (at 100 TB use enough clusters that m^2 per cluster is bounded;
    the paper runs 50k clusters for 100M+ docs).  Cosines and centroid
    dots round to 6 dp before any compare, the shared oracle contract.

    ``n_lists=None`` derives ``auto_n_lists(N)`` (√N, the paper's sizing)
    so max cluster size stays bounded as the corpus grows; the oracled
    entry pins n_lists=16 because the SQL mirror hard-codes the quantizer
    chain."""
    if n_lists is None:
        n_lists = auto_n_lists(embeddings.count())
        train_sample = max(train_sample, 16 * n_lists)
    train = _train_sample(embeddings, train_sample)
    cents = _kmeans(train, n_lists)
    ref = ray.put(cents)

    class Assign:
        def __init__(self, ref):
            self._cents = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
                else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "cluster_id": pa.array([], pa.int64()),
                                 "cent_cos": pa.array([], pa.float64()),
                                 "embedding": batch.column("embedding")})
            vecs = _normalize(_batch_matrix(batch))
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            dots = vecs @ self._cents.T
            assign = np.argmax(dots, axis=1)
            cent = np.round(dots[np.arange(len(ids)), assign], 6)
            return pa.table({
                "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
                "cluster_id": pa.array(assign.astype(np.int64), pa.int64()),
                "cent_cos": pa.array(cent, pa.float64()),
                "embedding": batch.column("embedding"),
            })

    def flag_group(g: pa.Table) -> pa.Table:
        vecs = _normalize(_batch_matrix(g))
        ids = g.column("vec_id").to_numpy(zero_copy_only=False)
        cent = g.column("cent_cos").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, cent))        # cent_cos ASC, vec_id ASC
        v = vecs[order]
        sims = np.round(v @ v.T, 6)
        dup_ord = np.logical_and(
            sims > tau, np.tri(len(v), k=-1, dtype=bool)).any(axis=1)
        is_dup = np.empty(len(v), dtype=np.int64)
        is_dup[order] = dup_ord.astype(np.int64)
        return pa.table({
            "vec_id": g.column("vec_id"),
            "cluster_id": g.column("cluster_id"),
            "cent_cos": g.column("cent_cos"),
            "is_dup": pa.array(is_dup, pa.int64()),
        })

    assigned = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        Assign, fn_constructor_args=(ref,),
        batch_format="pyarrow", concurrency=(1, 8))
    return assigned.groupby("cluster_id").map_groups(
        flag_group, batch_format="pyarrow")
