"""Positional postings + exact phrase search.

The reference reserves a ``positions INT[]`` column on its postings table but
never fills it (/root/reference/app/crawler/worker.py:230-234 always inserts
``[]``; SURVEY.md §1.3 documents the omission).  This module implements the
real thing as a Ray-Data-native positional index so phrase queries ("this
exact token sequence") evaluate by posting intersection + position adjacency
instead of rescanning text.

Tokenization here is *positional-plain*: lowercase ``\\b[a-zA-Z0-9]{2,}\\b``
tokens with NO stopword drop and NO stemming — positions index the full
surface token sequence so any phrase (including stopwords: "the fast key")
is matchable, and the token stream is SQL-mirrorable (DuckDB
``regexp_extract_all`` with the same pattern joins to the same sequence).

Scale shape — doc-range buckets, not per-term groups
----------------------------------------------------
The index is partitioned by doc-id range (``bucket = doc_id //
docs_per_bucket``), NOT by term:

* phrase evaluation is per-document, so a doc-range shard holds everything
  needed to answer a phrase for its docs — queries fan out one task per
  bucket and union, exactly how a 256-node cluster would run it;
* per-group state is bounded by the bucket's token count regardless of term
  skew — "the" (df ~= every doc) never concentrates into one group the way
  a groupby(term) would concentrate it;
* within each bucket file rows are sorted by (term, doc_id) and written in
  small row groups, so parquet min/max statistics prune non-phrase terms at
  read time (only row groups whose term range covers a query token are
  scanned).

Positions are delta + varbyte encoded per (term, doc) — a binary cell, ~1
byte per occurrence for dense positions — so the index row count is
``sum_d |distinct terms of d|`` (same as the tf postings), not one row per
token occurrence.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..functions.varbyte import vb_decode, vb_encode_with_sizes

# Same surface pattern as the reference tokenizer
# (/root/reference/app/crawler/tokenizer.py:32-40) WITHOUT the stopword /
# stemming post-steps: positions must index the raw token sequence.
POS_TOKEN_RE = re.compile(r"\b[a-zA-Z0-9]{2,}\b")

POSITIONS_SCHEMA = pa.schema([
    ("bucket", pa.int32()),
    ("term", pa.string()),
    ("doc_id", pa.int64()),
    ("npos", pa.int32()),
    ("pos_buf", pa.binary()),
])


def tokenize_positions(text: str) -> list[str]:
    """Surface token sequence of one document (no stop drop, no stem)."""
    return POS_TOKEN_RE.findall((text or "").lower())


def _tok_positions_task(batch: pa.Table, *, docs_per_bucket: int) -> pa.Table:
    """(doc_id, text) batch -> (bucket, term, doc_id, npos, pos_buf) rows.

    Per-doc grouping happens HERE, inside the map task — one row per
    (term, doc) with an encoded position list leaves the task, so the
    groupby(bucket) exchange ships ~postings volume, never one row per
    token occurrence.

    Vectorized batch-wide (same discipline as the SimHash fingerprint
    pass): one token stream for the whole batch, a stable lexsort groups
    (doc, term) runs with positions already ascending, boundary-reset gaps
    feed ONE vb_encode_with_sizes call, and per-row buffers are byte
    slices of that single encode — no per-(term, doc) encoder calls."""
    texts = batch.column("text").to_pylist()
    doc_ids_in = batch.column("doc_id").to_numpy(zero_copy_only=False)

    findall = POS_TOKEN_RE.findall
    all_tokens: list[str] = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = findall((text or "").lower())
        all_tokens.extend(toks)
        lens[i] = len(toks)
    total = len(all_tokens)
    if total == 0:
        return POSITIONS_SCHEMA.empty_table()

    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)

    # factorize token strings once per batch (Arrow dictionary encode)
    codes_arr = pa.array(all_tokens, pa.string()).dictionary_encode()
    codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    # stable sort by (doc, term-code): ties keep token order -> positions
    # ascending within each (doc, term) run
    order = np.lexsort((codes, doc_of))
    s_doc = doc_of[order]
    s_code = codes[order]
    s_pos = pos_in_doc[order]
    new_run = np.empty(total, dtype=bool)
    new_run[0] = True
    new_run[1:] = (s_doc[1:] != s_doc[:-1]) | (s_code[1:] != s_code[:-1])
    run_starts = np.flatnonzero(new_run)
    run_ends = np.concatenate((run_starts[1:], [total]))

    # boundary-reset deltas == delta_encode per run (first value absolute)
    gaps = s_pos.copy()
    gaps[1:] -= s_pos[:-1]
    gaps[run_starts] = s_pos[run_starts]
    buf, sizes = vb_encode_with_sizes(gaps)
    byte_ends = np.cumsum(sizes)
    byte_starts = byte_ends - sizes

    run_doc = doc_ids_in[s_doc[run_starts]]
    npos = (run_ends - run_starts).astype(np.int32)
    # zero-copy per-run buffers: runs TILE the varbyte stream contiguously
    # (run i ends where run i+1 starts), so the binary column is the whole
    # encode buffer + an int32 offsets vector — no per-run bytes() copies.
    # binary() offsets are int32; a >2 GiB per-batch stream (absurd batch
    # size x doc length, but silent wrap would corrupt positions) falls
    # back to per-run byte slices.
    if int(byte_ends[-1]) <= np.iinfo(np.int32).max:
        offs = np.empty(len(run_starts) + 1, dtype=np.int32)
        offs[:-1] = byte_starts[run_starts]
        offs[-1] = byte_ends[-1]
        pos_buf_arr = pa.Array.from_buffers(
            pa.binary(), len(run_starts),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(buf)])
    else:  # pragma: no cover - requires a >2 GiB single-batch stream
        mv = memoryview(buf)
        pos_buf_arr = pa.array(
            [bytes(mv[byte_starts[a]:byte_ends[b - 1]])
             for a, b in zip(run_starts, run_ends)], pa.binary())
    terms_arr = codes_arr.dictionary.take(
        pa.array(s_code[run_starts], pa.int64())).cast(pa.string())

    return pa.table({
        "bucket": pa.array((run_doc // docs_per_bucket).astype(np.int32)),
        "term": terms_arr,
        "doc_id": pa.array(run_doc, pa.int64()),
        "npos": pa.array(npos),
        "pos_buf": pos_buf_arr,
    })


def decode_positions(buf: bytes) -> np.ndarray:
    """Inverse of the per-(term, doc) position encoding."""
    return np.cumsum(vb_decode(buf))


def _write_bucket_group(group: pa.Table, *, index_dir: str,
                        row_group_size: int) -> pa.Table:
    """map_groups writer: one sorted parquet file per doc-range bucket.

    Sorted by (term, doc_id) with small row groups so min/max stats on
    ``term`` prune non-query terms at read time.  Atomic publish via
    tmp + os.replace (same discipline as stages/postings.py segments)."""
    bucket = int(group.column("bucket")[0].as_py())
    table = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    path = os.path.join(index_dir, f"bucket-{bucket:06d}.parquet")
    tmp = path + ".tmp"
    pq.write_table(table, tmp, row_group_size=row_group_size,
                   compression="zstd")
    os.replace(tmp, path)
    return pa.table({
        "bucket": pa.array([bucket], pa.int32()),
        "rows": pa.array([table.num_rows], pa.int64()),
        "path": pa.array([os.path.basename(path)], pa.string()),
    })


def build_positional_index(docs: "ray.data.Dataset", index_dir: str, *,
                           docs_per_bucket: int = 65536,
                           row_group_size: int = 4096,
                           batch_size: int = 1024,
                           input_fingerprint: str = "") -> dict:
    """docs (doc_id, text) -> positional index at ``index_dir``.

    Returns the manifest (also written to ``index_dir/manifest.json``).
    Streaming end to end: tokenize tasks emit encoded (term, doc) rows, one
    groupby(bucket) exchange co-locates each doc range, per-bucket writers
    publish sorted files independently (a failed run re-publishes only
    missing buckets — writes are atomic per bucket)."""
    os.makedirs(index_dir, exist_ok=True)
    import functools
    fn = functools.partial(_tok_positions_task,
                           docs_per_bucket=docs_per_bucket)
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size)
    writer = functools.partial(_write_bucket_group, index_dir=index_dir,
                               row_group_size=row_group_size)
    stats = rows.groupby("bucket").map_groups(
        writer, batch_format="pyarrow").take_all()
    manifest = {
        "docs_per_bucket": docs_per_bucket,
        "buckets": sorted(int(r["bucket"]) for r in stats),
        "rows": int(sum(r["rows"] for r in stats)),
        "files": sorted(r["path"] for r in stats),
        "input_fingerprint": input_fingerprint,
    }
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    return manifest


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


# -- fused build: fragments + compaction --------------------------------------
#
# The standalone builder above pays its own corpus scan.  The FUSED path
# (pipelines/build.py, cfg.build_positions=True) instead derives the
# positional rows inside the main build's tokenize task (ONE corpus scan for
# BM25 segments AND positions) and side-writes them as per-bucket FRAGMENT
# files; a postings-volume compaction pass then merges each bucket's
# fragments into the final sorted bucket file.  Task retries are safe:
# fragment names are content-derived (identical batch -> same file, atomic
# replace) and compaction drops duplicate (term, doc_id) keys — positional
# rows are deterministic per doc, so duplicates are exact copies.

def write_position_fragments(pos_tbl: pa.Table, frag_root: str) -> None:
    """Side-write one positional batch as per-bucket fragment files."""
    if pos_tbl.num_rows == 0:
        return
    from ..functions.hashing import hash64
    buckets = pos_tbl.column("bucket").to_numpy(zero_copy_only=False)
    order = np.argsort(buckets, kind="stable")
    sb = buckets[order]
    starts = np.flatnonzero(np.concatenate(([True], sb[1:] != sb[:-1])))
    ends = np.concatenate((starts[1:], [len(sb)]))
    tbl = pos_tbl.take(pa.array(order)) if len(starts) > 1 else pos_tbl
    for a, b in zip(starts, ends):
        part = tbl.slice(a, b - a) if len(starts) > 1 else pos_tbl
        bucket = int(sb[a])
        d = os.path.join(frag_root, f"bucket={bucket:06d}")
        os.makedirs(d, exist_ok=True)
        # content-derived name: hash the full (doc_id, npos) buffers so a
        # retried identical batch lands on the SAME file (atomic replace,
        # idempotent) and distinct batches cannot collide via summary stats
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        nps = part.column("npos").to_numpy(zero_copy_only=False)
        h = hash64(f"{bucket}|".encode()
                   + np.ascontiguousarray(ids).tobytes()
                   + np.ascontiguousarray(nps).tobytes())
        path = os.path.join(d, f"frag-{h:016x}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        # lz4, not zstd: fragments are TRANSIENT (read once by compaction,
        # then deleted) and this write sits on the fused build's critical
        # path inside the tokenize task — trade bytes for CPU; the final
        # bucket files keep zstd
        pq.write_table(part, tmp, compression="lz4")
        os.replace(tmp, path)


def _dedup_sorted_term_doc(t: pa.Table) -> pa.Table:
    """Drop consecutive duplicate (term, doc_id) rows of a sorted table."""
    import pyarrow.compute as pc
    if t.num_rows < 2:
        return t
    terms = t.column("term").combine_chunks()
    docs = t.column("doc_id").to_numpy(zero_copy_only=False)
    same_doc = docs[1:] == docs[:-1]
    same_term = pc.equal(terms.slice(1), terms.slice(0, len(terms) - 1))
    same_term = same_term.to_numpy(zero_copy_only=False)
    keep = np.concatenate(([True], ~(same_doc & same_term)))
    if keep.all():
        return t
    return t.filter(pa.array(keep))


def _compact_one_bucket(batch: pa.Table, *, pos_dir: str,
                        row_group_size: int) -> pa.Table:
    """One task per bucket: fragments (+ any existing bucket file) ->
    final sorted deduped bucket file.  Reads/writes postings volume only."""
    out_b, out_rows, out_path = [], [], []
    for bucket in batch.column("bucket").to_pylist():
        bucket = int(bucket)
        frag_dir = os.path.join(pos_dir, "fragments", f"bucket={bucket:06d}")
        frags = sorted(
            os.path.join(frag_dir, f) for f in os.listdir(frag_dir)
            if f.endswith(".parquet")) if os.path.isdir(frag_dir) else []
        path = os.path.join(pos_dir, f"bucket-{bucket:06d}.parquet")
        tabs = [pq.read_table(f, schema=POSITIONS_SCHEMA) for f in frags]
        if os.path.exists(path):
            tabs.append(pq.read_table(path, schema=POSITIONS_SCHEMA))
        if not tabs:
            continue
        t = pa.concat_tables(tabs).sort_by(
            [("term", "ascending"), ("doc_id", "ascending")])
        t = _dedup_sorted_term_doc(t.combine_chunks())
        # pid-suffixed tmp (same retry discipline as the fragment writer):
        # a concurrently retried task must not truncate the file the
        # original attempt is still writing
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(t, tmp, row_group_size=row_group_size,
                       compression="zstd")
        os.replace(tmp, path)
        shutil.rmtree(frag_dir, ignore_errors=True)
        out_b.append(bucket)
        out_rows.append(t.num_rows)
        out_path.append(os.path.basename(path))
    return pa.table({
        "bucket": pa.array(out_b, pa.int32()),
        "rows": pa.array(out_rows, pa.int64()),
        "path": pa.array(out_path, pa.string()),
    })


def compact_position_fragments(pos_dir: str, *, docs_per_bucket: int,
                               row_group_size: int = 4096,
                               input_fingerprint: str = "") -> dict:
    """Fold ``pos_dir/fragments`` into final bucket files + manifest.

    Merge semantics: an existing ``bucket-NNNNNN.parquet`` is concatenated
    with the new fragments (extend_index appends new-doc fragments to tail
    buckets), so incremental ingest keeps the positional artifact live.
    Untouched buckets keep their files and manifest rows."""
    import functools

    frag_root = os.path.join(pos_dir, "fragments")
    touched = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(frag_root)
        if d.startswith("bucket=")) if os.path.isdir(frag_root) else []
    if touched:
        fn = functools.partial(_compact_one_bucket, pos_dir=pos_dir,
                               row_group_size=row_group_size)
        ray.data.from_items(
            [{"bucket": b} for b in touched],
            override_num_blocks=len(touched)).map_batches(
            fn, batch_format="pyarrow").take_all()
    shutil.rmtree(frag_root, ignore_errors=True)
    # manifest derives from the bucket files ACTUALLY ON DISK (footer-read
    # row counts), never from a prior manifest: a crash between per-bucket
    # publication and the manifest write would otherwise permanently drop
    # populated buckets from the artifact on the resumed run
    rows_by_bucket: dict[int, int] = {}
    for f in os.listdir(pos_dir):
        if f.startswith("bucket-") and f.endswith(".parquet"):
            b = int(f[len("bucket-"):-len(".parquet")])
            rows_by_bucket[b] = pq.read_metadata(
                os.path.join(pos_dir, f)).num_rows
    manifest = {
        "docs_per_bucket": docs_per_bucket,
        "buckets": sorted(rows_by_bucket),
        "bucket_rows": [rows_by_bucket[b] for b in sorted(rows_by_bucket)],
        "rows": int(sum(rows_by_bucket.values())),
        "files": [f"bucket-{b:06d}.parquet" for b in sorted(rows_by_bucket)],
        "input_fingerprint": input_fingerprint,
    }
    tmp = os.path.join(pos_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(pos_dir, "manifest.json"))
    return manifest


# per-process memoized (do_stem, drop_stopwords) -> surface-term mapper
_FUSED_STEM_STATE: dict = {}


def _fused_pos_task(batch: pa.Table, *, frag_root: str, docs_per_bucket: int,
                    do_stem: bool, drop_stopwords: bool) -> pa.Table:
    """ONE tokenize pass -> positional fragments (side write) + the BM25
    combined triples/doclen batch the segment shuffle consumes.

    The surface token stream is computed once (`_tok_positions_task`); the
    BM25 view derives from the positional rows: tf(doc, stem) = Σ npos over
    surface terms stemming to ``stem`` (stopwords dropped first), doc_len =
    Σ npos over non-stop surface terms — exactly the reference tokenizer's
    per-token pipeline (tokenizer.py:32-40) evaluated per DISTINCT surface
    term instead of per occurrence.  Pinned equal to ``TokenizeBatcher`` by
    ``test_fused_pos_tokenize_parity``."""
    from ..functions.text import STOPWORDS, StemCache
    from .tokenize import COMBINED_SCHEMA

    pos_tbl = _tok_positions_task(batch, docs_per_bucket=docs_per_bucket)
    write_position_fragments(pos_tbl, frag_root)

    batch_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    n_docs = len(batch_ids)
    dl = np.zeros(n_docs, dtype=np.int64)
    tables = []
    if pos_tbl.num_rows:
        stemmer = _FUSED_STEM_STATE.get("stem")
        if stemmer is None:
            stemmer = _FUSED_STEM_STATE["stem"] = StemCache()

        enc = pos_tbl.column("term").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        # per-unique-surface-term mapping: -1 = stopword-dropped
        stem_of: list[str] = []
        stem_code_of_tok = np.empty(len(vocab), dtype=np.int64)
        stem_ids: dict[str, int] = {}
        for i, tok in enumerate(vocab):
            if drop_stopwords and tok in STOPWORDS:
                stem_code_of_tok[i] = -1
                continue
            s = stemmer.stem(tok) if do_stem else tok
            c = stem_ids.get(s)
            if c is None:
                c = stem_ids[s] = len(stem_of)
                stem_of.append(s)
            stem_code_of_tok[i] = c

        npos = pos_tbl.column("npos").to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_doc = pos_tbl.column("doc_id").to_numpy(zero_copy_only=False)
        # map positional rows back to batch slots (batch doc ids unique)
        order = np.argsort(batch_ids, kind="stable")
        bi = order[np.searchsorted(batch_ids[order], row_doc)]
        stem_code = stem_code_of_tok[codes]
        kept = stem_code >= 0
        dl = np.bincount(bi[kept], weights=npos[kept],
                         minlength=n_docs).astype(np.int64)
        if kept.any():
            kb, kc, kn = bi[kept], stem_code[kept], npos[kept]
            g = np.lexsort((kc, kb))
            gb, gc, gn = kb[g], kc[g], kn[g]
            new = np.concatenate(
                ([True], (gb[1:] != gb[:-1]) | (gc[1:] != gc[:-1])))
            starts = np.flatnonzero(new)
            tf = np.add.reduceat(gn, starts)
            tables.append(pa.table({
                "kind": pa.array(np.zeros(len(starts), dtype=np.int8)),
                "term": pa.array([stem_of[c] for c in gc[starts]],
                                 pa.string()),
                "doc_id": pa.array(batch_ids[gb[starts]], pa.int64()),
                "tf": pa.array(tf.astype(np.int32)),
            }))
    tables.append(pa.table({
        "kind": pa.array(np.ones(n_docs, dtype=np.int8)),
        "term": pa.array([""] * n_docs, pa.string()),
        "doc_id": pa.array(batch_ids, pa.int64()),
        "tf": pa.array(dl.astype(np.int32)),
    }))
    out = pa.concat_tables(tables)
    return out.cast(COMBINED_SCHEMA)


def make_fused_pos_tokenize_fn(frag_root: str, *, docs_per_bucket: int,
                               do_stem: bool = True,
                               drop_stopwords: bool = True):
    """Picklable pre_map for ``build_segments``: tokenize once, feed the
    segment shuffle AND side-write positional fragments."""
    import functools
    os.makedirs(frag_root, exist_ok=True)
    return functools.partial(_fused_pos_task, frag_root=frag_root,
                             docs_per_bucket=docs_per_bucket,
                             do_stem=do_stem, drop_stopwords=drop_stopwords)


def _tombstone_filter(index_dir: str):
    """Keep-mask fn for a FUSED positional artifact whose parent index has
    tombstoned doc ranges (recrawl / delete_conversations), or None.

    Only an ``<index_dir>/positions`` artifact inherits its parent's
    tombstones; a standalone positional index has none.  The (lo, hi)
    range arrays are a tiny control artifact, shipped in the task
    closure (same broadcast shape as compact_index's filter)."""
    p = os.path.abspath(index_dir.rstrip("/"))
    if os.path.basename(p) != "positions":
        return None
    from ..state.tombstones import load_tombstones, mask_tombstoned
    lo, hi = load_tombstones(os.path.dirname(p))
    if not len(lo):
        return None

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(mask_tombstoned(ids, lo, hi)))
    return keep


def read_term_rows(index_dir: str, terms: list[str]) -> "ray.data.Dataset":
    """Stream (bucket, term, doc_id, npos, pos_buf) rows for ``terms`` only.

    The filter is a pyarrow dataset expression, so parquet row-group
    statistics on the sorted ``term`` column prune everything else at the
    read — scan cost ~ sum df(term), not index size."""
    manifest = load_manifest(index_dir)
    paths = [os.path.join(index_dir, p) for p in manifest["files"]]
    import pyarrow.dataset as pads
    # explicit schema: filtered fragments can yield EMPTY blocks, which Ray
    # would otherwise emit schema-less (cosmetic "different schema" warnings,
    # and poison for any downstream join — see util.coalesce_blocks)
    ds = ray.data.read_parquet(
        paths, schema=POSITIONS_SCHEMA,
        filter=pads.field("term").isin(sorted(set(terms))))
    keep = _tombstone_filter(index_dir)
    if keep is not None:
        ds = ds.map_batches(keep, batch_format="pyarrow")
    return ds


def decode_positions_many(bufs: list[bytes],
                          counts: np.ndarray) -> np.ndarray:
    """Decode MANY per-(term, doc) position rows in ONE varbyte pass.

    The rows are concatenated and decoded as a single stream (varbyte is
    self-delimiting); ``counts`` gives values per row, and a segmented
    cumsum rebuilds each row's absolute positions (deltas reset at row
    starts, first value absolute — the build encoder's boundary-reset
    contract, `_tok_positions_task`)."""
    if not bufs:
        return np.zeros(0, dtype=np.int64)
    deltas = vb_decode(b"".join(bufs)).astype(np.int64)
    c = np.cumsum(deltas)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
    row_carry = np.where(starts > 0, c[np.maximum(starts - 1, 0)], 0)
    return c - np.repeat(row_carry, counts)


def match_one_phrase(by_term: dict, toks: list[str]
                     ) -> list[tuple[int, int]]:
    """Core phrase evaluation over a posting map ``term -> (sorted doc_id
    array, aligned position-buffer sequence[, npos array])``; returns
    [(doc_id, n_matches)] for docs with ≥1 occurrence.

    Cheap candidate pruning first: a doc is a candidate only if it contains
    ALL the phrase's tokens (sorted doc-list intersection, numpy).  When
    per-row occurrence counts (``npos``) ride in the map, the adjacency
    chain is fully VECTORIZED across candidate docs: one batched varbyte
    decode per token, then sorted int64 keys ``local_doc * S + (pos - off
    + k)`` intersected across the phrase (np.intersect1d on sorted unique
    arrays) — no per-doc Python loop.  Survivors are phrase-start
    positions, so ``n_matches`` counts overlapping occurrences.  Without
    npos (or if the key space would overflow int64) the per-candidate
    scalar chain runs instead; both paths are pinned equal by the phrase
    property tests.  Shared by the distributed per-bucket matcher and the
    in-memory serving PhraseEngine (state/phrase_engine.py)."""
    if not toks or any(t not in by_term for t in toks):
        return []
    cand = by_term[toks[0]][0]
    for t in toks[1:]:
        cand = cand[np.isin(cand, by_term[t][0])]
        if len(cand) == 0:
            return []

    k = len(toks)
    have_npos = all(len(by_term[t]) > 2 and by_term[t][2] is not None
                    for t in set(toks))
    if have_npos:
        base = int(cand[0])
        span = int(cand[-1]) - base + 1
        keys = None
        max_shift = 0
        parts = []
        for off, t in enumerate(toks):
            docs_t, bufs_t, npos_t = by_term[t]
            idx = np.searchsorted(docs_t, cand)
            counts = np.asarray(npos_t, dtype=np.int64)[idx]
            pos = decode_positions_many([bufs_t[j] for j in idx], counts)
            parts.append((off, idx, counts, pos))
            if len(pos):
                max_shift = max(max_shift, int(pos.max()) + k)
        scale = 1 << max(1, (max_shift + 1)).bit_length()
        if span * scale < (1 << 62):        # key space fits int64
            for off, idx, counts, pos in parts:
                local = np.repeat(cand - base, counts)
                key = local * scale + (pos - off + k)
                keys = key if keys is None else np.intersect1d(
                    keys, key, assume_unique=True)
                if len(keys) == 0:
                    return []
            docs, n = np.unique(keys // scale, return_counts=True)
            return [(int(base + d), int(c)) for d, c in zip(docs, n)]

    out: list[tuple[int, int]] = []
    for d in cand:
        starts = None
        ok = True
        for off, t in enumerate(toks):
            docs_t, bufs_t = by_term[t][0], by_term[t][1]
            r = int(np.searchsorted(docs_t, d))
            pos = decode_positions(bufs_t[r]) - off
            starts = pos if starts is None else \
                np.intersect1d(starts, pos, assume_unique=True)
            if len(starts) == 0:
                ok = False
                break
        if ok and starts is not None and len(starts):
            out.append((int(d), len(starts)))
    return out


def postings_map_from_sorted(terms: list[str], doc_ids: np.ndarray,
                             bufs: list[bytes],
                             npos: np.ndarray | None = None) -> dict:
    """(term, doc_id)-sorted columnar rows -> the ``match_one_phrase``
    posting map (contiguous-run slicing, no copies of the doc array).
    Passing ``npos`` (per-row occurrence counts) enables the vectorized
    adjacency path in :func:`match_one_phrase`."""
    by_term: dict = {}
    i = 0
    n = len(terms)
    while i < n:
        j = i
        t = terms[i]
        while j < n and terms[j] == t:
            j += 1
        by_term[t] = (doc_ids[i:j], bufs[i:j],
                      None if npos is None else npos[i:j])
        i = j
    return by_term


def _match_phrases_group(group: pa.Table, *,
                         phrases: list[tuple[str, list[str]]]) -> pa.Table:
    """Per-bucket phrase evaluation (map_groups over ``bucket``) — builds
    the posting map for this doc range and runs the shared core."""
    # Bucket files are written (term, doc_id)-sorted, but the groupby
    # exchange doesn't guarantee intra-group order — re-sort (cheap,
    # group is one doc range's postings for the query tokens only).
    group = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    by_term = postings_map_from_sorted(
        group.column("term").to_pylist(),
        group.column("doc_id").to_numpy(zero_copy_only=False),
        group.column("pos_buf").to_pylist(),
        group.column("npos").to_numpy(zero_copy_only=False))

    out_phrase: list[str] = []
    out_doc: list[int] = []
    out_n: list[int] = []
    for phrase, toks in phrases:
        for d, cnt in match_one_phrase(by_term, toks):
            out_phrase.append(phrase)
            out_doc.append(d)
            out_n.append(cnt)

    return pa.table({
        "phrase": pa.array(out_phrase, pa.string()),
        "doc_id": pa.array(out_doc, pa.int64()),
        "n_matches": pa.array(out_n, pa.int64()),
    })


def _map_bucket_files(index_dir: str, terms: list[str], row_fn,
                      empty_schema: pa.Schema) -> "ray.data.Dataset":
    """Fan one task out per bucket FILE and union the results — the
    zero-shuffle physical plan for bucket-local query evaluation.

    Bucket files already ARE the doc-range groups (written (term,
    doc_id)-sorted by `_write_bucket_group`), so a groupby(bucket) over the
    scanned rows would re-exchange Σ df(term) rows just to rebuild a
    co-location the layout guarantees.  Each task instead does its own
    filtered parquet read (``term IN terms`` — row-group statistics prune
    non-query terms) and evaluates ``row_fn`` on the bucket's rows."""
    manifest = load_manifest(index_dir)
    paths = manifest["files"]
    want = sorted(set(terms))
    keep = _tombstone_filter(index_dir)

    def per_file(batch: pa.Table) -> pa.Table:
        outs = []
        for rel in batch.column("path").to_pylist():
            t = pq.read_table(os.path.join(index_dir, rel),
                              columns=["term", "doc_id", "npos", "pos_buf"],
                              filters=[("term", "in", want)])
            if keep is not None and t.num_rows:
                t = keep(t)
            if t.num_rows:
                r = row_fn(t)
                if r.num_rows:
                    outs.append(r)
        return (pa.concat_tables(outs) if outs
                else empty_schema.empty_table())

    if not paths:
        return ray.data.from_arrow(empty_schema.empty_table())
    return ray.data.from_items(
        [{"path": p} for p in paths],
        override_num_blocks=len(paths)).map_batches(
        per_file, batch_format="pyarrow")


def phrase_match(index_dir: str, phrases: list[str]) -> "ray.data.Dataset":
    """All (phrase, doc_id, n_matches) exact-sequence matches.

    One task per bucket file, NO shuffle: each task reads only the union
    of the phrases' token postings for its doc range (row-group-pruned),
    then runs the vectorized candidate intersection + adjacency.  Multiple
    phrases share the scan — cost ~ sum over distinct tokens of df(token),
    fanned out across buckets exactly as a multi-node cluster would run
    it."""
    union_toks = sorted({t for p in phrases for t in tokenize_positions(p)})
    empty = pa.schema([("phrase", pa.string()), ("doc_id", pa.int64()),
                       ("n_matches", pa.int64())])
    if not union_toks:
        return ray.data.from_arrow(empty.empty_table())
    import functools
    fn = functools.partial(
        _match_phrases_group,
        phrases=[(p, tokenize_positions(p)) for p in phrases])
    return _map_bucket_files(index_dir, union_toks, fn, empty)


def term_positions(index_dir: str, terms: list[str]) -> "ray.data.Dataset":
    """(term, doc_id, npos) for the given terms straight from the index
    artifact — npos equals the surface token count of ``term`` in the doc,
    which is what the SQL oracle recomputes from text."""
    rows = read_term_rows(index_dir, terms)
    return rows.select_columns(["term", "doc_id", "npos"]).map_batches(
        lambda b: b.set_column(b.schema.get_field_index("npos"), "npos",
                               b.column("npos").cast(pa.int64())),
        batch_format="pyarrow")


def _first_positions_batch(batch: pa.Table) -> pa.Table:
    """(term, doc_id, npos, pos_buf) rows -> (term, doc_id, p0): the first
    occurrence position, batch-decoded (one varbyte pass per batch)."""
    counts = batch.column("npos").to_numpy(zero_copy_only=False).astype(
        np.int64)
    bufs = batch.column("pos_buf").to_pylist()
    pos = decode_positions_many(bufs, counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
    return pa.table({
        "term": batch.column("term"),
        "doc_id": batch.column("doc_id"),
        "p0": pa.array(pos[starts] if len(pos) else
                       np.zeros(0, dtype=np.int64), pa.int64()),
    })


def _snippet_rows(batch: pa.Table, *, window: int) -> pa.Table:
    """(doc_id, text, term, p0) joined rows -> (term, doc_id, snippet)."""
    texts = batch.column("text").to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    terms = batch.column("term").to_pylist()
    p0s = batch.column("p0").to_pylist()
    out_t: list[str] = []
    out_d: list[int] = []
    out_s: list[str] = []
    tok_cache: dict[int, list[str]] = {}
    for text, d, term, p0 in zip(texts, doc_ids, terms, p0s):
        toks = tok_cache.get(d)
        if toks is None:
            toks = tok_cache[d] = tokenize_positions(text)
        lo = max(0, int(p0) - window)
        out_t.append(term)
        out_d.append(int(d))
        out_s.append(" ".join(toks[lo:int(p0) + window + 1]))
    return pa.table({
        "term": pa.array(out_t, pa.string()),
        "doc_id": pa.array(out_d, pa.int64()),
        "snippet": pa.array(out_s, pa.string()),
    })


def term_snippets(index_dir: str, docs: "ray.data.Dataset",
                  terms: list[str], *, window: int = 2,
                  batch_size: int = 1024,
                  max_broadcast_rows: int = 100_000) -> "ray.data.Dataset":
    """KWIC snippets: (term, doc_id, snippet) — the ±``window`` token
    context around the FIRST occurrence of each query term, resolved from
    the positional index (no corpus rescan to FIND the occurrence; one
    filtered read gives (doc, first_position) per term).

    Two physical plans with an AUTOMATIC cutover (same pattern as the
    build's conv-offset broadcast -> join mode):

    * Σ df(term) ≤ ``max_broadcast_rows``: the matched (doc, term, p0)
      triples are collected and shipped in the task closure of a single
      streaming pass over ``docs`` — right for the serving case (snippets
      over a result page, k ≤ 100 docs).
    * beyond the bound (head-term corpus-wide runs): driver state stays
      BOUNDED — the triples become a Dataset hash-joined against ``docs``
      on doc_id, and the window slicing runs inside the joined batches.
      Property-pinned equal to the broadcast path by
      ``test_term_snippets_join_path_equals_broadcast``."""
    # materialize once: count() would otherwise execute the filtered scan
    # and the consumer below (take_all or the join pipeline) would execute
    # it AGAIN from scratch — 2x the query's positional IO
    rows_ds = read_term_rows(index_dir, terms).select_columns(
        ["term", "doc_id", "npos", "pos_buf"]).materialize()
    n_rows = rows_ds.count()
    import functools
    if n_rows > max_broadcast_rows:
        from ..util import coalesce_blocks, hash_join
        firsts_ds = coalesce_blocks(
            rows_ds.map_batches(_first_positions_batch,
                                batch_format="pyarrow"))
        joined = hash_join(
            docs.select_columns(["doc_id", "text"]), firsts_ds,
            "inner", 16, on=("doc_id",))
        return joined.map_batches(
            functools.partial(_snippet_rows, window=window),
            batch_format="pyarrow", batch_size=batch_size)

    rows = rows_ds.take_all()
    firsts: dict[int, list[tuple[str, int]]] = {}
    for r in rows:
        p0 = int(decode_positions(r["pos_buf"])[0])
        firsts.setdefault(int(r["doc_id"]), []).append((r["term"], p0))

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        out_t: list[str] = []
        out_d: list[int] = []
        out_s: list[str] = []
        for text, d in zip(texts, doc_ids):
            hits = firsts.get(int(d))
            if not hits:
                continue
            toks = tokenize_positions(text)
            for term, p0 in hits:
                lo = max(0, p0 - window)
                out_t.append(term)
                out_d.append(int(d))
                out_s.append(" ".join(toks[lo:p0 + window + 1]))
        return pa.table({
            "term": pa.array(out_t, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "snippet": pa.array(out_s, pa.string()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size)


def proximity_pair_core(by_term: dict, ta: str, tb: str, max_dist: int
                        ) -> list[tuple[int, int]]:
    """Min |pos_a - pos_b| per doc for one unordered term pair, vectorized
    across candidate docs: one batched varbyte decode per side, then
    doc-prefixed sorted keys ``local_doc * S + pos`` — each a-occurrence's
    nearest b-occurrence is its searchsorted neighbor in the b key array
    (same-doc checked by ``key // S`` equality), and the per-doc minimum
    falls out of one ``np.minimum.reduceat`` over the candidate row
    boundaries.  Falls back to the per-candidate scalar chain if the key
    space would wrap int64 (huge bucket × very long docs).  Returns
    [(doc_id, min_dist)] with min_dist <= max_dist; shared by the
    distributed per-bucket task and the serving PhraseEngine."""
    if ta not in by_term or tb not in by_term:
        return []
    docs_a, bufs_a, npos_a = by_term[ta]
    docs_b, bufs_b, npos_b = by_term[tb]
    cand = docs_a[np.isin(docs_a, docs_b)]
    if len(cand) == 0:
        return []
    big = np.int64(1) << np.int64(62)
    base = int(cand[0])
    ia = np.searchsorted(docs_a, cand)
    ib = np.searchsorted(docs_b, cand)
    ca = np.asarray(npos_a, dtype=np.int64)[ia]
    cb = np.asarray(npos_b, dtype=np.int64)[ib]
    pos_a = decode_positions_many([bufs_a[j] for j in ia], ca)
    pos_b = decode_positions_many([bufs_b[j] for j in ib], cb)
    top = int(max(pos_a.max() if len(pos_a) else 0,
                  pos_b.max() if len(pos_b) else 0)) + 2
    scale = np.int64(1 << top.bit_length())
    span = int(cand[-1]) - base + 1
    if span * int(scale) >= (1 << 62):
        out = []
        for j, d in enumerate(cand):
            pa_p = decode_positions(bufs_a[int(ia[j])]).astype(np.int64)
            pb_p = decode_positions(bufs_b[int(ib[j])]).astype(np.int64)
            i2 = np.searchsorted(pb_p, pa_p)
            l2 = np.where(i2 > 0, pa_p - pb_p[np.maximum(i2 - 1, 0)], big)
            r2 = np.where(i2 < len(pb_p),
                          pb_p[np.minimum(i2, len(pb_p) - 1)] - pa_p, big)
            m2 = int(min(l2.min(), r2.min()))
            if m2 <= max_dist:
                out.append((int(d), m2))
        return out
    ka = np.repeat(cand - base, ca) * scale + pos_a
    kb = np.repeat(cand - base, cb) * scale + pos_b
    i = np.searchsorted(kb, ka)
    li = np.maximum(i - 1, 0)
    ri = np.minimum(i, len(kb) - 1)
    left = np.where((i > 0) & (kb[li] // scale == ka // scale),
                    ka - kb[li], big)
    right = np.where((i < len(kb)) & (kb[ri] // scale == ka // scale),
                     kb[ri] - ka, big)
    d = np.minimum(left, right)
    starts = np.concatenate(([0], np.cumsum(ca)[:-1])).astype(np.int64)
    mind = np.minimum.reduceat(d, starts)
    keep = mind <= max_dist
    return [(int(d), int(m)) for d, m in zip(cand[keep], mind[keep])]


def before_pair_core(by_term: dict, ta: str, tb: str, max_dist: int
                     ) -> list[tuple[int, int]]:
    """DIRECTED proximity ("ta BEFORE tb within n"): min (pos_b - pos_a)
    over occurrence pairs with pos_b STRICTLY after pos_a, per doc.  Same
    vectorized shape as :func:`proximity_pair_core` but only the
    right-neighbor branch: each a-occurrence's nearest FOLLOWING
    b-occurrence is its ``searchsorted(..., side='right')`` successor in
    the doc-prefixed sorted b key array.  Returns [(doc_id, min_dist)]
    with 1 <= min_dist <= max_dist."""
    if ta not in by_term or tb not in by_term:
        return []
    docs_a, bufs_a, npos_a = by_term[ta]
    docs_b, bufs_b, npos_b = by_term[tb]
    cand = docs_a[np.isin(docs_a, docs_b)]
    if len(cand) == 0:
        return []
    big = np.int64(1) << np.int64(62)
    base = int(cand[0])
    ia = np.searchsorted(docs_a, cand)
    ib = np.searchsorted(docs_b, cand)
    ca = np.asarray(npos_a, dtype=np.int64)[ia]
    cb = np.asarray(npos_b, dtype=np.int64)[ib]
    pos_a = decode_positions_many([bufs_a[j] for j in ia], ca)
    pos_b = decode_positions_many([bufs_b[j] for j in ib], cb)
    top = int(max(pos_a.max() if len(pos_a) else 0,
                  pos_b.max() if len(pos_b) else 0)) + 2
    scale = np.int64(1 << top.bit_length())
    span = int(cand[-1]) - base + 1
    if span * int(scale) >= (1 << 62):
        out = []
        for j, d in enumerate(cand):
            pa_p = decode_positions(bufs_a[int(ia[j])]).astype(np.int64)
            pb_p = decode_positions(bufs_b[int(ib[j])]).astype(np.int64)
            i2 = np.searchsorted(pb_p, pa_p, side="right")
            r2 = np.where(i2 < len(pb_p),
                          pb_p[np.minimum(i2, len(pb_p) - 1)] - pa_p, big)
            m2 = int(r2.min())
            if m2 <= max_dist:
                out.append((int(d), m2))
        return out
    ka = np.repeat(cand - base, ca) * scale + pos_a
    kb = np.repeat(cand - base, cb) * scale + pos_b
    i = np.searchsorted(kb, ka, side="right")
    ri = np.minimum(i, len(kb) - 1)
    right = np.where((i < len(kb)) & (kb[ri] // scale == ka // scale),
                     kb[ri] - ka, big)
    starts = np.concatenate(([0], np.cumsum(ca)[:-1])).astype(np.int64)
    mind = np.minimum.reduceat(right, starts)
    keep = mind <= max_dist
    return [(int(d), int(m)) for d, m in zip(cand[keep], mind[keep])]


def _proximity_group(group: pa.Table, *, pairs: list[tuple[str, str]],
                     max_dist: int) -> pa.Table:
    """Per-bucket proximity evaluation — packages
    :func:`proximity_pair_core` results for each query pair."""
    group = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    by_term = postings_map_from_sorted(
        group.column("term").to_pylist(),
        group.column("doc_id").to_numpy(zero_copy_only=False),
        group.column("pos_buf").to_pylist(),
        group.column("npos").to_numpy(zero_copy_only=False))

    tabs = []
    for ta, tb in pairs:
        hits = proximity_pair_core(by_term, ta, tb, max_dist)
        if hits:
            tabs.append(pa.table({
                "term_a": pa.array([ta] * len(hits), pa.string()),
                "term_b": pa.array([tb] * len(hits), pa.string()),
                "doc_id": pa.array([h[0] for h in hits], pa.int64()),
                "min_dist": pa.array([h[1] for h in hits], pa.int64()),
            }))
    if not tabs:
        return pa.table({
            "term_a": pa.array([], pa.string()),
            "term_b": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "min_dist": pa.array([], pa.int64()),
        })
    return pa.concat_tables(tabs)


def _before_group(group: pa.Table, *, pairs: list[tuple[str, str]],
                  max_dist: int) -> pa.Table:
    """Per-bucket DIRECTED proximity evaluation (A BEFORE B within n)."""
    group = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    by_term = postings_map_from_sorted(
        group.column("term").to_pylist(),
        group.column("doc_id").to_numpy(zero_copy_only=False),
        group.column("pos_buf").to_pylist(),
        group.column("npos").to_numpy(zero_copy_only=False))
    tabs = []
    for ta, tb in pairs:
        hits = before_pair_core(by_term, ta, tb, max_dist)
        if hits:
            tabs.append(pa.table({
                "term_a": pa.array([ta] * len(hits), pa.string()),
                "term_b": pa.array([tb] * len(hits), pa.string()),
                "doc_id": pa.array([h[0] for h in hits], pa.int64()),
                "min_dist": pa.array([h[1] for h in hits], pa.int64()),
            }))
    if not tabs:
        return pa.table({
            "term_a": pa.array([], pa.string()),
            "term_b": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "min_dist": pa.array([], pa.int64()),
        })
    return pa.concat_tables(tabs)


def pair_before(index_dir: str, pairs: list[tuple[str, str]], *,
                max_dist: int = 4) -> "ray.data.Dataset":
    """Ordered "A BEFORE B within n" retrieval over the positional index:
    (term_a, term_b, doc_id, min_dist) for docs where some occurrence of
    ``term_b`` follows an occurrence of ``term_a`` within ``max_dist``
    surface positions (min over qualifying ordered pairs, >= 1).  Same
    zero-shuffle per-bucket-file plan as :func:`pair_proximity`; the
    directed kernel keeps only the right-neighbor branch."""
    union_toks = sorted({t for p in pairs for t in p})
    empty = pa.schema([("term_a", pa.string()), ("term_b", pa.string()),
                      ("doc_id", pa.int64()), ("min_dist", pa.int64())])
    if not union_toks:
        return ray.data.from_arrow(empty.empty_table())
    import functools
    fn = functools.partial(_before_group, pairs=list(pairs),
                           max_dist=max_dist)
    return _map_bucket_files(index_dir, union_toks, fn, empty)


def pair_proximity(index_dir: str, pairs: list[tuple[str, str]], *,
                   max_dist: int = 4) -> "ray.data.Dataset":
    """Unordered term-pair proximity search over the positional index:
    (term_a, term_b, doc_id, min_dist) for docs where the two terms occur
    within ``max_dist`` surface-token positions of each other (``min_dist``
    = min |pos_a - pos_b| over all occurrence pairs).

    The classic `"a NEAR/n b"` retrieval operator.  Same zero-shuffle plan
    as :func:`phrase_match`: one task per bucket file, each doing its own
    term-filtered row-group-pruned read (scan ~ Σ df fanned across
    buckets), with the nearest-neighbor distance fully vectorized inside
    the task (sorted doc-prefixed keys, not the all-pairs product)."""
    union_toks = sorted({t for p in pairs for t in p})
    empty = pa.schema([("term_a", pa.string()), ("term_b", pa.string()),
                      ("doc_id", pa.int64()), ("min_dist", pa.int64())])
    if not union_toks:
        return ray.data.from_arrow(empty.empty_table())
    import functools
    fn = functools.partial(_proximity_group, pairs=list(pairs),
                           max_dist=max_dist)
    return _map_bucket_files(index_dir, union_toks, fn, empty)
