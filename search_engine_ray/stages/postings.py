"""The wide step: posting-triple shuffle -> compressed segment files.

Replaces the reference's exploded ``tokens`` rows + B-tree (SURVEY.md §1.3,
"no segments / no compression") with real posting lists: per-term sorted
doc_ids, delta + varbyte encoded, with df/cf/idf and block-max metadata
(north rule).

Shuffle design (SURVEY.md §4):
  * partition key = hash64(term) % num_partitions ("part") — ONE partitioning
    key reused by build, merge and query loading;
  * skew: Zipf head terms overload a single reducer, so with ``salt > 1`` the
    build runs two-phase — phase A groups by (part, salt=doc_id % S) and
    encodes per-(term, salt) sorted runs; phase B groups by part and k-way
    merges each term's disjoint runs (property-tested equal to the unsalted
    build);
  * segment writers are the stateful reduce stage: each part group writes ONE
    deterministic segment file ``segment-p{part:05d}.parquet`` and emits a
    manifest row, so a killed build resumes at part granularity (manifest is
    committed atomically via temp+rename).
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..config import SEGMENT_SCHEMA
from ..functions.hashing import hash64_column
from ..functions.text import idf as idf_fn
from ..functions.varbyte import (decode_postings, encode_postings,
                                 encode_postings_blocked,
                                 vb_encode_with_sizes)

RUN_SCHEMA = pa.schema([
    ("part", pa.int32()),
    ("term", pa.string()),
    ("salt", pa.int32()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("doc_ids_enc", pa.binary()),
    ("tfs_enc", pa.binary()),
])


def _term_slices(sorted_terms: list[str]):
    """Yield (term, start, end) over a term-sorted list."""
    n = len(sorted_terms)
    i = 0
    while i < n:
        term = sorted_terms[i]
        j = i + 1
        while j < n and sorted_terms[j] == term:
            j += 1
        yield term, i, j
        i = j


class _RunCombiner:
    """Pre-shuffle combiner (map_batches, no groupby): encode each batch's
    triples into per-term sorted runs.  This is the two-phase aggregation of
    SURVEY.md §4 — the shuffle then moves compact (term, run) rows (varbyte
    blobs, ~1-2 B/posting) instead of exploded 20+ B triples, an order of
    magnitude less exchange volume, and head-term skew is bounded by
    runs-per-batch rather than df.

    Runs need no doc-disjointness guarantee for the merge: each (term,
    doc_id) pair exists exactly once globally, so concat + sort in the
    reducer reconstructs the posting list regardless of how batches split."""

    def __init__(self, num_partitions: int, salt: int,
                 skip_parts: frozenset[int], range_splits: int = 1,
                 range_base_n: int = 1):
        self._parts = num_partitions
        self._salt = salt
        self._skip = skip_parts
        # doc-range split: physical part = hash(term)%P * R + rb where
        # rb = clip(doc_id * R // range_base_n, 0, R-1).  The mapping is
        # FROZEN at the base build's doc_total (incremental extends clamp
        # new, higher doc ids into the last bucket) so chunk doc ranges
        # stay disjoint and rb-ascending forever — the engine's load-time
        # byte concat depends on that invariant.
        self._rsplits = max(1, int(range_splits))
        self._rbase = max(1, int(range_base_n))

    DOCLEN_SHARDS = 16          # reserved parts: num_partitions .. +SHARDS-1
    _SHARD_RANGE = 65536        # contiguous doc-id range per shard stripe

    def __call__(self, batch: pa.Table) -> pa.Table:
        # fused-build path: kind==1 rows are per-doc lengths — encode them as
        # posting-list runs for the reserved SHARD parts (a single doclens
        # reducer would serialize an O(N) sort+write at the tail of the
        # build; sharding by doc-id stripe keeps the reduce parallel)
        doclen_tables = []
        if "kind" in batch.schema.names:
            import pyarrow.compute as pc
            doclen = batch.filter(pc.equal(batch.column("kind"), 1))
            batch = batch.filter(pc.equal(batch.column("kind"), 0))
            batch = batch.drop_columns(["kind"])
            if len(doclen):
                d = doclen.column("doc_id").to_numpy(zero_copy_only=False)
                t = doclen.column("tf").to_numpy(zero_copy_only=False)
                order = np.argsort(d, kind="stable")
                d, t = d[order], t[order]
                shards = (d // self._SHARD_RANGE) % self.DOCLEN_SHARDS
                for shard in np.unique(shards):
                    m = shards == shard
                    doc_buf, tf_buf = encode_postings(d[m], t[m])
                    doclen_tables.append(pa.table({
                        "part": pa.array(
                            [self._parts * self._rsplits + int(shard)],
                            pa.int32()),
                        "term": pa.array([""], pa.string()),
                        "salt": pa.array([0], pa.int32()),
                        "df": pa.array([int(m.sum())], pa.int64()),
                        "cf": pa.array([int(t[m].sum())], pa.int64()),
                        "doc_ids_enc": pa.array([doc_buf], pa.binary()),
                        "tfs_enc": pa.array([tf_buf], pa.binary()),
                    }))

        batch = batch.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tfs = batch.column("tf").to_numpy(zero_copy_only=False)
        n = len(doc_ids)

        if n == 0:
            out_terms: list[str] = []
            dfs_a = np.empty(0, dtype=np.int64)
            cfs_a = np.empty(0, dtype=np.int64)
            doc_bufs: list[bytes] = []
            tf_bufs: list[bytes] = []
            salts = np.empty(0, dtype=np.int64)
            run_rb = np.empty(0, dtype=np.int64)
        else:
            # one vb_encode over the whole batch, sliced per term run —
            # a per-term encode loop pays numpy fixed costs ~10k times per
            # batch (it measured 90 cpu-s per 600k turns; this path ~3)
            tcol = batch.column("term").combine_chunks()
            import pyarrow.compute as _pc
            changed = _pc.not_equal(tcol.slice(1), tcol.slice(0, n - 1))
            brk = changed.to_numpy(zero_copy_only=False).copy()
            if self._rsplits > 1:
                # runs must be rb-pure: also break where the range bucket
                # changes (rb is non-decreasing within a (term, doc) sort)
                rb_all = np.minimum(
                    doc_ids.astype(np.int64) * self._rsplits // self._rbase,
                    self._rsplits - 1)
                brk |= rb_all[1:] != rb_all[:-1]
            starts = np.concatenate(([0], np.flatnonzero(brk) + 1))
            bounds = np.concatenate((starts, [n]))

            gaps = np.empty(n, dtype=np.uint64)
            d64 = doc_ids.astype(np.uint64, copy=False)
            gaps[1:] = d64[1:] - d64[:-1]
            gaps[starts] = d64[starts]      # absolute at each run start
            dbuf, dsizes = vb_encode_with_sizes(gaps)
            tbuf, tsizes = vb_encode_with_sizes(tfs)
            dends = np.concatenate(([0], np.cumsum(dsizes)))[bounds]
            tends = np.concatenate(([0], np.cumsum(tsizes)))[bounds]
            doc_bufs = [dbuf[dends[i]:dends[i + 1]]
                        for i in range(len(starts))]
            tf_bufs = [tbuf[tends[i]:tends[i + 1]]
                       for i in range(len(starts))]
            out_terms = tcol.take(pa.array(starts, pa.int64())).to_pylist()
            dfs_a = np.diff(bounds)
            cfs_a = np.add.reduceat(tfs.astype(np.int64), starts)
            # runs of the same term spread across reducers when salted
            salts = (doc_ids[starts] % self._salt if self._salt > 1
                     else np.zeros(len(starts), dtype=np.int64))
            run_rb = np.minimum(
                doc_ids[starts].astype(np.int64) * self._rsplits
                // self._rbase, self._rsplits - 1) \
                if self._rsplits > 1 else np.zeros(len(starts),
                                                   dtype=np.int64)
        dfs, cfs = dfs_a, cfs_a

        part = (hash64_column(out_terms) % np.uint64(self._parts)).astype(
            np.int64)
        if self._rsplits > 1:
            part = part * self._rsplits + run_rb
        part = part.astype(np.int32)
        table = pa.table({
            "part": pa.array(part),
            "term": pa.array(out_terms, pa.string()),
            "salt": pa.array(salts, pa.int32()),
            "df": pa.array(dfs, pa.int64()),
            "cf": pa.array(cfs, pa.int64()),
            "doc_ids_enc": pa.array(doc_bufs, pa.binary()),
            "tfs_enc": pa.array(tf_bufs, pa.binary()),
        })
        if self._skip:
            keep = ~np.isin(part, np.fromiter(self._skip, dtype=np.int32))
            table = table.filter(pa.array(keep))
            doclen_tables = [t for t in doclen_tables
                             if int(t.column("part")[0].as_py())
                             not in self._skip]
        if doclen_tables:
            table = pa.concat_tables([table] + doclen_tables)
        return table


def _merge_runs(doc_bufs: list[bytes], tf_bufs: list[bytes]
                ) -> tuple[np.ndarray, np.ndarray]:
    """Concat + sort a term's runs ((term, doc) pairs are globally unique)."""
    if len(doc_bufs) == 1:
        return decode_postings(doc_bufs[0], tf_bufs[0])
    ds = [decode_postings(db, tb) for db, tb in zip(doc_bufs, tf_bufs)]
    d = np.concatenate([x[0] for x in ds])
    t = np.concatenate([x[1] for x in ds])
    order = np.argsort(d, kind="stable")
    return d[order], t[order]


def _decode_runs_segmented(doc_bufs: list[bytes], tf_bufs: list[bytes],
                           dfs: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode EVERY run with two vb_decode calls total: vbyte streams
    concatenate losslessly, and per-run delta decoding falls out of one
    global cumsum minus the cumsum value at each run's start (each run's
    first gap is absolute).  A per-run decode loop pays numpy fixed costs
    runs-per-part times (it was the reducer's dominant CPU); this is O(2)
    calls + vector math.  Returns (abs doc_ids, tfs, value-offsets per run
    boundary) with values laid out in run order."""
    from ..functions.varbyte import vb_decode

    gaps = vb_decode(b"".join(doc_bufs))
    tf_vals = vb_decode(b"".join(tf_bufs))
    dfs = np.asarray(dfs, dtype=np.int64)
    vbounds = np.concatenate(([0], np.cumsum(dfs)))
    c = np.cumsum(gaps, dtype=np.uint64)
    starts = vbounds[:-1]
    nonzero = starts > 0
    run_base = np.zeros(len(starts), dtype=np.uint64)
    run_base[nonzero] = c[starts[nonzero] - 1]
    base = np.repeat(run_base, dfs)
    return (c - base), tf_vals, vbounds


def _merge_partial(group: pa.Table) -> pa.Table:
    """Salted intermediate reducer: merge a (part, salt) group's runs per
    term into one run each (keeps RUN_SCHEMA shape for the final merge)."""
    group = group.sort_by([("term", "ascending")])
    terms = group.column("term").to_pylist()
    dfs = group.column("df").to_numpy(zero_copy_only=False)
    cfs = group.column("cf").to_numpy(zero_copy_only=False)
    doc_bufs = group.column("doc_ids_enc").to_pylist()
    tf_bufs = group.column("tfs_enc").to_pylist()
    part = int(group.column("part")[0].as_py()) if len(group) else 0
    salt = int(group.column("salt")[0].as_py()) if len(group) else 0

    all_d, all_t, vbounds = _decode_runs_segmented(doc_bufs, tf_bufs, dfs)
    o_terms, o_df, o_cf, o_docs, o_tfs = [], [], [], [], []
    for term, s, e in _term_slices(terms):
        d = all_d[vbounds[s]:vbounds[e]]
        t = all_t[vbounds[s]:vbounds[e]]
        if e - s > 1:
            order = np.argsort(d, kind="stable")
            d, t = d[order], t[order]
        doc_buf, tf_buf = encode_postings(d, t)
        o_terms.append(term)
        o_df.append(int(dfs[s:e].sum()))
        o_cf.append(int(cfs[s:e].sum()))
        o_docs.append(doc_buf)
        o_tfs.append(tf_buf)
    return pa.table({
        "part": pa.array([part] * len(o_terms), pa.int32()),
        "term": pa.array(o_terms, pa.string()),
        "salt": pa.array([salt] * len(o_terms), pa.int32()),
        "df": pa.array(o_df, pa.int64()),
        "cf": pa.array(o_cf, pa.int64()),
        "doc_ids_enc": pa.array(o_docs, pa.binary()),
        "tfs_enc": pa.array(o_tfs, pa.binary()),
    })


def _commit_part_sidecar(index_dir: str, part: int, entry: dict) -> None:
    """Per-part manifest commit FROM the reduce task (atomic sidecar file):
    a build killed mid-reduce resumes from every already-published part
    instead of losing all progress to the post-barrier driver commit.
    ``load_manifest`` merges sidecars whose artifact file still exists; the
    final driver commit consolidates and removes them."""
    side_dir = os.path.join(index_dir, "manifest.parts")
    os.makedirs(side_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix=f"part-{part}.", dir=side_dir)
    with os.fdopen(fd, "w") as f:
        json.dump({"part": part, **entry}, f)
    os.replace(tmp, os.path.join(side_dir, f"part-{part:05d}.json"))


def _entry_from_row(row: dict) -> dict:
    elapsed = float(row.get("elapsed_s", 0.0) or 0.0)
    n_post = int(row["num_postings"])
    return {
        "file": row["file"],
        "num_terms": int(row["num_terms"]),
        "num_postings": n_post,
        "total_tokens": int(row["total_tokens"]),
        "reduce_elapsed_s": elapsed,
        "postings_per_sec": round(n_post / elapsed, 1) if elapsed > 0
        else None,
        "input_fingerprint": row["input_fingerprint"],
    }


def _write_doclens_group(group: pa.Table, index_dir: str, fp: str,
                         shard: int, merge_existing: bool = False,
                         new_doc_base: int | None = None) -> pa.Table:
    """Reserved-shard reducer: the '' pseudo-term runs are (doc_id, doc_len)
    pairs — merge and publish this shard's doclens file.

    ``new_doc_base``: first doc id of the extend generation being merged.
    Rows >= it are dropped from the EXISTING file before concatenating —
    Ray tasks run at-least-once, and a retry that re-reads a segment the
    first attempt already published would otherwise duplicate every new
    row (idempotent-merge guard; same filter in _write_segment_group)."""
    d, t = _merge_runs(group.column("doc_ids_enc").to_pylist(),
                       group.column("tfs_enc").to_pylist())
    dl_dir = os.path.join(index_dir, "doclens")
    fname = f"doclens-{shard:03d}.parquet"
    existing = os.path.join(dl_dir, fname)
    if merge_existing and os.path.exists(existing):
        old = pq.read_table(existing)
        od = old.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        ot = old.column("doc_len").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        if new_doc_base is not None:
            keep = od < np.uint64(new_doc_base)
            od, ot = od[keep], ot[keep]
        d = np.concatenate([od, d])
        t = np.concatenate([ot, t])
        order = np.argsort(d, kind="stable")
        d, t = d[order], t[order]
    os.makedirs(dl_dir, exist_ok=True)
    table = pa.table({
        "doc_id": pa.array(d.astype(np.int64)),
        "doc_len": pa.array(t.astype(np.int64)),
    })
    # temp files go to a staging dir OUTSIDE doclens/: QueryEngine loads the
    # whole directory, so a crash-leftover partial temp inside it would
    # corrupt doc-length loading (rename across dirs stays atomic — same fs)
    staging = os.path.join(os.path.dirname(dl_dir), "doclens.staging")
    os.makedirs(staging, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix=fname + ".", dir=staging)
    os.close(fd)
    pq.write_table(table, tmp, row_group_size=65536, compression="zstd")
    os.replace(tmp, os.path.join(dl_dir, fname))
    part = int(group.column("part")[0].as_py())
    row = {
        "part": part,
        "file": "doclens/" + fname,
        "num_terms": 0,
        "num_postings": len(d),
        "total_tokens": int(t.sum()),
        "elapsed_s": 0.0,
        "input_fingerprint": fp,
    }
    _commit_part_sidecar(index_dir, part, _entry_from_row(row))
    return pa.table({
        "part": pa.array([part], pa.int32()),
        "file": pa.array([row["file"]], pa.string()),
        "num_terms": pa.array([0], pa.int64()),
        "num_postings": pa.array([len(d)], pa.int64()),
        "total_tokens": pa.array([row["total_tokens"]], pa.int64()),
        "elapsed_s": pa.array([0.0], pa.float64()),
        "input_fingerprint": pa.array([fp], pa.string()),
    })


def _write_segment_group(group: pa.Table, *, index_dir: str, doc_total: int,
                         block_size: int, input_fingerprint: str,
                         reserved_part: int | None = None,
                         merge_existing: bool = False,
                         new_doc_base: int | None = None) -> pa.Table:
    """Reducer TASK (plain function, not an actor pool: groups become ready
    all at once after the shuffle barrier, so task scheduling beats actor
    spin-up): merge a part's runs per term, write the segment file, emit a
    manifest row with per-partition throughput metrics (north rule)."""
    import time as _time
    t_start = _time.time()
    if len(group) == 0:
        return pa.table({
            "part": pa.array([], pa.int32()),
            "file": pa.array([], pa.string()),
            "num_terms": pa.array([], pa.int64()),
            "num_postings": pa.array([], pa.int64()),
            "total_tokens": pa.array([], pa.int64()),
            "elapsed_s": pa.array([], pa.float64()),
            "input_fingerprint": pa.array([], pa.string()),
        })
    seg_dir = os.path.join(index_dir, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    group = group.sort_by([("term", "ascending"), ("salt", "ascending")])
    part = int(group.column("part")[0].as_py())
    if reserved_part is not None and part >= reserved_part:
        return _write_doclens_group(group, index_dir, input_fingerprint,
                                    part - reserved_part, merge_existing,
                                    new_doc_base)
    terms = group.column("term").to_pylist()
    dfs = group.column("df").to_numpy(zero_copy_only=False)
    cfs = group.column("cf").to_numpy(zero_copy_only=False)
    doc_bufs = group.column("doc_ids_enc").to_pylist()
    tf_bufs = group.column("tfs_enc").to_pylist()

    # incremental extend: fold the existing segment's terms in.  Terms with
    # new postings are decoded+merged (new doc ids all sort after old ones);
    # untouched terms stay COLUMNAR — a pc.is_in split keeps them as Arrow
    # arrays end-to-end, so a fat part never pays O(rows x cols) Python dict
    # builds for rows this generation doesn't touch.
    existing_rows: dict[str, dict] = {}
    old_untouched: pa.Table | None = None
    if merge_existing:
        import pyarrow.compute as pc
        fpath0 = os.path.join(index_dir, "segments",
                              f"segment-p{part:05d}.parquet")
        if os.path.exists(fpath0):
            old = pq.read_table(fpath0)
            touched_mask = pc.is_in(
                old.column("term"),
                value_set=pa.array(sorted(set(terms)), pa.string()))
            touched = old.filter(touched_mask)
            # dict rows only for the touched (decoded+merged) terms
            cols = {c: touched.column(c).to_pylist()
                    for c in touched.schema.names}
            for i in range(touched.num_rows):
                existing_rows[cols["term"][i]] = {c: v[i]
                                                  for c, v in cols.items()}
            old_untouched = old.filter(pc.invert(touched_mask))

    o_terms: list[str] = []
    o_df: list[int] = []
    o_cf: list[int] = []
    o_idf: list[float] = []
    o_docs: list[bytes] = []
    o_tfs: list[bytes] = []
    o_bld: list[list[int]] = []
    o_bmt: list[list[int]] = []
    o_bdo: list[list[int]] = []
    o_bto: list[list[int]] = []
    o_bct: list[list[int]] = []

    def emit(term, d, t, df, cf):
        doc_buf, tf_buf, meta = encode_postings_blocked(d, t, block_size)
        o_terms.append(term)
        o_df.append(df)
        o_cf.append(cf)
        o_idf.append(idf_fn(doc_total, df))
        o_docs.append(doc_buf)
        o_tfs.append(tf_buf)
        o_bld.append(meta["last_doc"])
        o_bmt.append(meta["max_tf"])
        o_bdo.append(meta["doc_off"])
        o_bto.append(meta["tf_off"])
        o_bct.append(meta["count"])

    # decode every run in two vb_decode calls (see _decode_runs_segmented);
    # the per-term work below is then pure numpy over real data
    all_d, all_t, vbounds = _decode_runs_segmented(doc_bufs, tf_bufs, dfs)

    new_terms = set()
    for term, s, e in _term_slices(terms):
        new_terms.add(term)
        d = all_d[vbounds[s]:vbounds[e]]
        t = all_t[vbounds[s]:vbounds[e]]
        if e - s > 1:
            order = np.argsort(d, kind="stable")
            d, t = d[order], t[order]
        df = int(dfs[s:e].sum())
        cf = int(cfs[s:e].sum())
        old = existing_rows.get(term)
        if old is not None:
            from ..functions.varbyte import decode_postings_blocked
            od, ot = decode_postings_blocked(
                old["doc_ids_enc"], old["tfs_enc"],
                {"doc_off": old["block_doc_off"],
                 "tf_off": old["block_tf_off"],
                 "count": old["block_count"],
                 "last_doc": old["block_last_doc"]})
            if new_doc_base is not None:
                # idempotent-merge guard: a Ray retry re-reads the segment
                # the first attempt already extended — drop any posting of
                # THIS generation (doc id >= its base) from the old side
                # before re-merging, or retries duplicate postings and
                # double df/cf
                keep = od < int(new_doc_base)
                od, ot = od[keep], ot[keep]
            d = np.concatenate([od, d])
            t = np.concatenate([ot, t])
            order = np.argsort(d, kind="stable")
            d, t = d[order], t[order]
            # recomputed from the merged arrays (doc ids are unique per
            # term: old < new_doc_base <= new), NOT old+new sums — the
            # stored old df/cf may already include this generation
            df = int(len(d))
            cf = int(t.sum())
        emit(term, d, t, df, cf)
    seg = pa.table({
        "term": pa.array(o_terms, pa.string()),
        "df": pa.array(o_df, pa.int64()),
        "cf": pa.array(o_cf, pa.int64()),
        "idf": pa.array(o_idf, pa.float64()),
        "doc_ids_enc": pa.array(o_docs, pa.binary()),
        "tfs_enc": pa.array(o_tfs, pa.binary()),
        "block_last_doc": pa.array(o_bld, pa.list_(pa.int64())),
        "block_max_tf": pa.array(o_bmt, pa.list_(pa.int64())),
        "block_doc_off": pa.array(o_bdo, pa.list_(pa.int64())),
        "block_tf_off": pa.array(o_bto, pa.list_(pa.int64())),
        "block_count": pa.array(o_bct, pa.list_(pa.int64())),
    }, schema=SEGMENT_SCHEMA)
    if old_untouched is not None and old_untouched.num_rows:
        # untouched terms carry over as whole Arrow columns; only idf is
        # rebuilt (scalar math.log per term keeps bit-parity with the
        # full-rebuild path, which also goes through idf_fn)
        carried = old_untouched.set_column(
            old_untouched.schema.get_field_index("idf"), "idf",
            pa.array([idf_fn(doc_total, int(d))
                      for d in old_untouched.column("df").to_pylist()],
                     pa.float64())).cast(SEGMENT_SCHEMA)
        # term sets are disjoint (touched terms merged above), so one sort
        # restores the deterministic term order (UTF-8 byte order == the
        # Python-str order the rebuild path produces)
        seg = pa.concat_tables([seg, carried]).sort_by(
            [("term", "ascending")]).combine_chunks()

    fname = f"segment-p{part:05d}.parquet"
    fpath = os.path.join(seg_dir, fname)
    # atomic publish: temp file in same dir + rename
    fd, tmp = tempfile.mkstemp(prefix=fname + ".", dir=seg_dir)
    os.close(fd)
    # small row groups (term-sorted rows): the LAZY engine load reads one
    # term's postings via a term-equality filter, and row-group min/max
    # stats on `term` bound the decompressed bytes to ~32 rows, not the file
    pq.write_table(seg, tmp, compression="zstd", row_group_size=32)
    os.replace(tmp, fpath)

    elapsed = round(_time.time() - t_start, 4)
    n_terms = seg.num_rows
    n_postings = int(pa.compute.sum(seg.column("df")).as_py() or 0)
    row = {
        "part": part,
        "file": fname,
        "num_terms": n_terms,
        "num_postings": n_postings,
        "total_tokens": 0,
        "elapsed_s": elapsed,
        "input_fingerprint": input_fingerprint,
    }
    _commit_part_sidecar(index_dir, part, _entry_from_row(row))
    return pa.table({
        "part": pa.array([part], pa.int32()),
        "file": pa.array([fname], pa.string()),
        "num_terms": pa.array([n_terms], pa.int64()),
        "num_postings": pa.array([n_postings], pa.int64()),
        "total_tokens": pa.array([0], pa.int64()),
        "elapsed_s": pa.array([elapsed], pa.float64()),
        "input_fingerprint": pa.array([input_fingerprint], pa.string()),
    })


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def load_manifest(index_dir: str) -> dict:
    path = manifest_path(index_dir)
    if not os.path.exists(path):
        manifest = {"entries": {}}
    else:
        with open(path) as f:
            manifest = json.load(f)
    # merge per-part sidecar commits from reduce tasks (crash mid-build):
    # only entries whose published artifact still exists count
    side_dir = os.path.join(index_dir, "manifest.parts")
    if os.path.isdir(side_dir):
        for fn in sorted(os.listdir(side_dir)):
            if not fn.endswith(".json"):
                continue
            try:
                with open(os.path.join(side_dir, fn)) as f:
                    row = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            part = str(int(row.pop("part")))
            rel = row.get("file", "")
            fpath = os.path.join(index_dir, rel) if "/" in rel else \
                os.path.join(index_dir, "segments", rel)
            if part not in manifest["entries"] and os.path.exists(fpath):
                manifest["entries"][part] = row
    return manifest


def clear_part_sidecars(index_dir: str) -> None:
    """Remove sidecars after the consolidated driver commit."""
    import shutil as _shutil
    _shutil.rmtree(os.path.join(index_dir, "manifest.parts"),
                   ignore_errors=True)


def save_manifest(index_dir: str, manifest: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix="manifest.", dir=index_dir)
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, manifest_path(index_dir))


class _FusedMap:
    """Compose a per-batch pre-map (tokenize) with the run combiner inside
    ONE map_batches task.  The pre-map's fat intermediate (exploded posting
    triples) stays in the task heap; only compact runs reach the object
    store — the structural fix for the tokenize-output queue starving the
    combiner under Ray's memory-reservation backpressure (both callables are
    picklable: a functools.partial over a module fn + a plain-attrs class)."""

    def __init__(self, pre_map, combiner: "_RunCombiner"):
        self._pre = pre_map
        self._comb = combiner

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._comb(self._pre(batch))


def build_segments(combined: "ray.data.Dataset", *, index_dir: str,
                   doc_total: int, num_partitions: int = 32, salt: int = 1,
                   block_size: int = 128, input_fingerprint: str = "",
                   resume: bool = True, with_doclens: bool = False,
                   merge_existing: bool = False, range_splits: int = 1,
                   range_base_n: int | None = None,
                   new_doc_base: int | None = None,
                   pre_map=None, pre_batch_size: int | None = None,
                   pre_concurrency=None,
                   allow_full_skip: bool = True) -> dict:
    """Posting triples -> segment files + committed manifest.

    ``with_doclens=True`` (fused build): the input still carries kind==1
    doc-length rows; they ride the same shuffle to a reserved part whose
    reducer publishes the doclens artifact — one exchange for postings AND
    lengths.  Returns the manifest dict.

    ``range_splits=R > 1`` splits every hash part into R doc-id range
    buckets (physical part = part*R + rb), so one Zipf head term's encode
    work runs on R reducers instead of one.  Files stay per-physical-part;
    the engine byte-concats a term's rb-ascending chunks at load (block
    starts are absolute).  ``range_base_n`` freezes the bucket boundaries
    (defaults to this build's doc_total; incremental extends MUST reuse the
    recorded base so chunk ranges stay disjoint)."""
    # always load: non-resume builds reset the part entries but PRESERVE the
    # bookkeeping keys the caller committed before this barrier (max_conv,
    # docs_fingerprint, doc_total) — a fresh dict would drop them from the
    # final save and silently disable extend_index's append-only guard
    manifest = load_manifest(index_dir)
    if not (resume or merge_existing):
        manifest["entries"] = {}
    if merge_existing:
        # incremental extend: every existing entry stays valid (untouched
        # parts keep their files); nothing is skipped
        done = frozenset()
    else:
        done = frozenset(
            int(p) for p, e in manifest["entries"].items()
            if e.get("input_fingerprint") == input_fingerprint
        )
        manifest["entries"] = {str(p): manifest["entries"][str(p)]
                               for p in done}

    # full-skip: a previously COMPLETED identical build whose parts are all
    # still present needs no pass at all (fused mode would otherwise pay a
    # full re-tokenize just to drop every run).  ``allow_full_skip=False``
    # forces the pass even then — the fused-positions caller needs the
    # pre_map to re-run when the positional artifact must be regenerated
    # (segments complete but positions crashed pre-manifest).
    completed = manifest.get("completed_parts")
    if (allow_full_skip and resume and completed is not None
            and manifest.get("input_fingerprint") == input_fingerprint
            and all(p in done for p in completed)):
        return manifest

    if pre_map is None and not with_doclens \
            and "kind" in combined.schema().names:
        combined = combined.filter(expr="kind == 0")
    range_splits = max(1, int(range_splits))
    if range_base_n is None:
        range_base_n = max(1, doc_total)
    combiner = _RunCombiner(num_partitions, salt, done, range_splits,
                            range_base_n)
    if pre_map is not None:
        # FUSED path: ``combined`` is the docs dataset (doc_id, text);
        # tokenize + combine run in the same task.  Final segment bytes are
        # run-boundary-invariant (reducers concat+sort+re-encode), so the
        # fused batch size is a pure memory/shuffle-volume knob.
        kwargs = {}
        if pre_concurrency is not None:
            kwargs["concurrency"] = pre_concurrency
        runs = combined.map_batches(
            _FusedMap(pre_map, combiner), batch_format="pyarrow",
            batch_size=pre_batch_size, **kwargs)
    else:
        # batch_size=None: combine whole blocks — bigger batches = longer
        # runs = less shuffle volume (default 1024-row batches would emit
        # df~1 runs)
        runs = combined.map_batches(
            combiner, batch_format="pyarrow", batch_size=None)

    if salt > 1:
        runs = runs.groupby(["part", "salt"]).map_groups(
            _merge_partial, batch_format="pyarrow")

    from functools import partial
    writer = partial(
        _write_segment_group,
        index_dir=index_dir,
        doc_total=doc_total,
        block_size=block_size,
        input_fingerprint=input_fingerprint,
        reserved_part=(num_partitions * range_splits
                       if with_doclens else None),
        merge_existing=merge_existing,
        new_doc_base=new_doc_base,
    )
    writer_ds = runs.groupby("part").map_groups(
        writer, batch_format="pyarrow",
    )
    writer_rows = writer_ds.take_all()   # manifest rows only: one per part
    if os.environ.get("BUILD_PRINT_STATS"):
        print(writer_ds.stats())

    for row in writer_rows:
        manifest["entries"][str(int(row["part"]))] = _entry_from_row(row)
    manifest["num_partitions"] = num_partitions
    manifest["range_splits"] = range_splits
    manifest["range_base_n"] = range_base_n
    manifest["doc_total"] = doc_total
    manifest["input_fingerprint"] = input_fingerprint
    manifest["completed_parts"] = sorted(int(p) for p in manifest["entries"])
    save_manifest(index_dir, manifest)
    clear_part_sidecars(index_dir)
    return manifest


def prefix_term_scan(index_dir: str, prefixes: list[str]
                     ) -> "ray.data.Dataset":
    """Dictionary prefix (wildcard ``pre*``) scan over the segment artifact:
    (prefix, term, df, cf) for every indexed term matching any prefix.

    The reference's Postgres B-tree on ``tokens.token`` answers this with an
    index range scan; here the equivalent is a filtered parquet read over
    ALL segment partition files — terms are hash-partitioned across parts,
    so a prefix range cannot be routed to one part, but each part file is
    term-sorted, so parquet row-group min/max statistics prune the
    non-matching dictionary ranges inside every file.  Scan cost ~ matching
    dictionary rows + one row-group footer per part, independent of corpus
    size.  Posting buffers are never read (column projection drops them at
    the reader).

    Assumes a single-generation index (a fresh ``build_index``); a
    multi-generation extended index would need the engine's merged
    tombstone-aware view of df/cf.
    """
    import pyarrow.dataset as pads

    manifest = load_manifest(index_dir)
    seg_paths = sorted(
        os.path.join(index_dir, e["file"]) if "/" in e["file"]
        else os.path.join(index_dir, "segments", e["file"])
        for e in manifest["entries"].values()
        if "segment-" in e["file"])
    expr = None
    for p in prefixes:
        if not p:
            raise ValueError("empty prefix")
        hi = p[:-1] + chr(ord(p[-1]) + 1)
        e = (pads.field("term") >= p) & (pads.field("term") < hi)
        expr = e if expr is None else (expr | e)
    schema = pa.schema([("term", pa.string()), ("df", pa.int64()),
                        ("cf", pa.int64())])
    rows = ray.data.read_parquet(seg_paths, schema=schema,
                                 columns=["term", "df", "cf"], filter=expr)
    plist = sorted(prefixes)

    def attach(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        out_p: list[str] = []
        idx: list[int] = []
        for i, t in enumerate(terms):
            for p in plist:               # a term may match several prefixes
                if t.startswith(p):
                    out_p.append(p)
                    idx.append(i)
        sub = batch.take(pa.array(idx, pa.int64()))
        return sub.add_column(0, "prefix", pa.array(out_p, pa.string()))

    return rows.map_batches(attach, batch_format="pyarrow")
