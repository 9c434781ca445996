"""End-to-end index build pipeline.

DAG (SURVEY.md §3 "ours"):

  read transcripts
    -> conv-count pass -> deterministic dense doc_id broadcast (ONE counting
       pass shared by every consumer; validates turn contiguity)
    -> doc store parquet (index_dir/docs/)
    -> tokenize map_batches (memoized Porter stem, reference semantics)
    -> run-combiner -> groupby(part) shuffle -> segment writer tasks
       -> segments + doclens + manifest

Two physical plans:

  * FUSED (default): tokenize -> combiner -> shuffle -> writers is ONE
    streaming pass; per-doc lengths ride the same shuffle to a reserved
    partition; the doc-store write runs CONCURRENTLY on a second thread
    (both consumers share the conv-offset broadcast).  Fewest barriers,
    fastest wall clock.
  * checkpoint_triples=True: the tokenize output is first persisted as a
    hive-partitioned Parquet artifact (kind=0 triples / kind=1 doclens) that
    resume can skip and other jobs (spellcheck, dedup) can share.

Every artifact is an immutable overwrite (the reference's truncate-and-
rebuild semantics, bm25_stats.py:15) and the segment step resumes at part
granularity via the manifest.
"""

from __future__ import annotations

import os
import shutil
import threading

import ray
import ray.data

# fsspec's HTTP module fails to import in this environment (no aiohttp).
# Ray's path resolution imports it on EVERY read/write plan and tolerates
# ModuleNotFoundError — but when two threads race the first import, Python
# caches a half-initialized module and later imports raise plain
# ImportError ("cannot import name"), which Ray does not catch.  Register a
# complete stub up front so every import resolves consistently and
# thread-safely; the sentinel class matches nothing, preserving Ray's
# "not an HTTP filesystem" behavior.
try:  # pragma: no cover - import side effect only
    import fsspec.implementations.http  # noqa: F401
except Exception:
    import sys as _sys
    import types as _types
    _stub = _types.ModuleType("fsspec.implementations.http")

    class _StubHTTPFileSystem:  # never instantiated
        pass

    _stub.HTTPFileSystem = _StubHTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = _stub

import time

from ..config import EngineConfig
from ..functions.hashing import hash64
from ..stages.doc_ids import (BroadcastCapExceeded, add_doc_ids_join,
                              add_doc_ids_with_offsets, conv_offsets,
                              conv_offsets_dataset,
                              conv_offsets_arrays)
from ..stages.postings import build_segments, load_manifest, save_manifest
from ..stages.stats import corpus_stats, write_stats
from ..stages.tokenize import make_tokenize_fn, tokenize_docs
from ..util import default_pool_max

# bump when artifact layout changes so resume never reads a stale layout
_LAYOUT_VERSION = 4


def _reserved_total_tokens(seg_manifest: dict, num_partitions: int) -> int:
    return sum(int(e.get("total_tokens", 0))
               for p, e in seg_manifest["entries"].items()
               if int(p) >= num_partitions)


def _fingerprint(source_desc: str, cfg: EngineConfig) -> str:
    key = (f"v{_LAYOUT_VERSION}|{source_desc}|stem={int(cfg.do_stem)}|"
           f"stop={int(cfg.drop_stopwords)}|P={cfg.num_partitions}|"
           f"R={cfg.range_splits}|block={cfg.block_size}")
    if cfg.build_positions:
        # a fused build is NOT resume-compatible with a plain one: a plain
        # full-skip would leave the positional artifact unbuilt.  'auto'
        # resolves deterministically from corpus size, so same corpus ->
        # same layout -> resume-safe.
        key += f"|pos=dpb{cfg.positions_docs_per_bucket or 'auto'}"
    return f"{hash64(key):016x}"


def _pos_manifest_valid(pos_dir: str, fp: str,
                        dpb: int | None = None) -> bool:
    """True iff ``pos_dir`` holds a positional manifest stamped with THIS
    build's fingerprint (and bucket size, when given) — the single
    validation rule shared by every resume path, so the checks can't
    drift apart."""
    import json
    pm = os.path.join(pos_dir, "manifest.json")
    if not os.path.exists(pm):
        return False
    try:
        with open(pm) as f:
            m = json.load(f)
    except Exception:
        return False
    if m.get("input_fingerprint") != fp:
        return False
    return dpb is None or m.get("docs_per_bucket") == dpb


def _resolve_pos_dpb(cfg: EngineConfig, n: int) -> int:
    """Positional docs_per_bucket: explicit cfg value, or derived from
    CORPUS SIZE ONLY (target ~128 buckets, clamped to [4096, 65536] docs
    per bucket).  Deliberately independent of the cluster's CPU count: a
    crashed build resumed on a different-sized cluster must re-derive the
    SAME bucket layout, or attempt-1 and attempt-2 fragments of one doc
    land in different buckets and compaction's per-bucket dedup cannot see
    the duplicate."""
    if cfg.positions_docs_per_bucket is not None:
        return int(cfg.positions_docs_per_bucket)
    import math
    dpb = 2 ** math.ceil(math.log2(max(1.0, n / 128)))
    return int(min(65536, max(4096, dpb)))


def build_index(transcripts: "ray.data.Dataset", cfg: EngineConfig, *,
                source_desc: str = "", resume: bool = False,
                transcripts_path: str | None = None,
                timings: dict | None = None) -> dict:
    """Build all index artifacts under cfg.index_dir; returns build info.

    ``transcripts_path`` (optional) lets the counting and tokenize passes
    use column-pruned, fan-out-controlled re-reads of the source (Ray does
    not push ``select_columns`` into an already-constructed parquet read).
    ``timings`` (optional dict) receives per-phase wall seconds."""
    index_dir = cfg.index_dir
    fp = _fingerprint(source_desc, cfg)
    manifest = load_manifest(index_dir) if resume else {"entries": {}}
    os.makedirs(index_dir, exist_ok=True)
    if not resume:
        # truncate semantics: a fresh build must clear EVERY artifact the
        # engine discovers by glob/dir-scan (segments, doclens, docs,
        # triples, tombstones, extend marker) — a rebuild with fewer
        # partitions or a smaller corpus would otherwise leave stale
        # files that double-count df or index-error doclen assignment
        for sub in ("segments", "doclens", "docs", "triples", "positions"):
            shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
        for f in ("tombstones.parquet", "extend.inprogress"):
            try:
                os.remove(os.path.join(index_dir, f))
            except OSError:
                pass
    _t = timings if timings is not None else {}
    _t0 = time.time()

    def _mark(phase: str) -> None:
        nonlocal _t0
        now = time.time()
        _t[phase] = round(_t.get(phase, 0.0) + (now - _t0), 3)
        _t0 = now

    docs_dir = os.path.join(index_dir, "docs")
    triples_dir = os.path.join(index_dir, "triples")
    doclens_dir = os.path.join(index_dir, "doclens")

    def _pruned(columns, fan_out=False):
        if transcripts_path is None:
            return transcripts
        kwargs = {"columns": columns}
        if fan_out:
            kwargs["override_num_blocks"] = default_pool_max() * 3
        return ray.data.read_parquet(transcripts_path, **kwargs)

    # 1) one conv-count pass -> offsets broadcast (+ contiguity validation);
    # broadcast is a (sorted conv array, base array) pair — memcpy put,
    # near-zero-copy per-actor get (a 1M+-entry dict costs seconds/actor).
    # Beyond cfg.max_broadcast_convs conversations the broadcast no longer
    # fits a driver/worker heap (at 100 TB the conv set is billions): cut
    # over to JOIN MODE — the offsets become a materialized (conv_id, base)
    # Dataset computed by the distributed two-phase prefix sum, and every
    # doc-id consumer hash-joins against it instead of reading a broadcast.
    offsets_ds = None
    try:
        (convs, bases), n = conv_offsets_arrays(
            _pruned(["conv_id", "turn_idx"], fan_out=True),
            max_broadcast_convs=cfg.max_broadcast_convs)
        max_conv = str(convs[-1]) if len(convs) else ""
    except BroadcastCapExceeded:
        offsets_ds, n = conv_offsets_dataset(
            _pruned(["conv_id", "turn_idx"], fan_out=True))
        offsets_ds = offsets_ds.materialize()
        # conv_offsets_dataset returns conv_id-sorted blocks; the global max
        # is the per-batch max of maxima (tiny driver reduce)
        import pyarrow as pa
        import pyarrow.compute as _pc
        batch_maxes = offsets_ds.map_batches(
            lambda t: pa.table(
                {"m": pa.array([_pc.max(t.column("conv_id")).as_py()])}),
            batch_format="pyarrow").take_all()
        max_conv = max((r["m"] for r in batch_maxes if r["m"] is not None),
                       default="")
    manifest["doc_total"] = n
    manifest["max_conv"] = max_conv
    save_manifest(index_dir, manifest)
    _mark("conv_offsets")

    if n == 0:
        # empty corpus: publish empty-but-valid artifacts (doc_total defaults
        # to 1 like bm25_stats.py:13) and skip the wide steps
        import pyarrow.parquet as pq
        from ..config import DOCS_SCHEMA
        os.makedirs(docs_dir, exist_ok=True)
        pq.write_table(DOCS_SCHEMA.empty_table(),
                       os.path.join(docs_dir, "part-empty.parquet"))
        stats = {"doc_total": 1, "total_tokens": 0, "avgdl": 0.0}
        write_stats(index_dir, stats)
        manifest["docs_fingerprint"] = fp
        save_manifest(index_dir, manifest)
        # an empty corpus has no positional rows BY DEFINITION: clear any
        # pre-existing artifact (a resume path could otherwise launder a
        # previous corpus's bucket files into a manifest stamped with the
        # new fingerprint) before publishing the empty-but-valid manifest
        shutil.rmtree(os.path.join(index_dir, "positions"),
                      ignore_errors=True)
        if cfg.build_positions:
            from ..stages.positions import compact_position_fragments
            os.makedirs(os.path.join(index_dir, "positions"), exist_ok=True)
            compact_position_fragments(
                os.path.join(index_dir, "positions"),
                docs_per_bucket=_resolve_pos_dpb(cfg, 0),
                input_fingerprint=fp)
        return {"index_dir": index_dir, "doc_total": 0, "stats": stats,
                "manifest": manifest}

    offsets_ref = None if offsets_ds is not None \
        else ray.put((convs, bases))

    def _add_ids(src):
        """doc_id attach in whichever mode the counting pass selected."""
        if offsets_ds is not None:
            return add_doc_ids_join(src, offsets_ds, n=n)
        return add_doc_ids_with_offsets(src, offsets_ref)

    needs_docs = not (resume and manifest.get("docs_fingerprint") == fp)

    if resume and needs_docs and not cfg.build_positions:
        # the corpus/source changed under a resume but THIS build doesn't
        # maintain the positional artifact: clear it rather than leave
        # rows keyed by the previous corpus's doc ids (the fused path has
        # its own fingerprint-gated guard below)
        shutil.rmtree(os.path.join(index_dir, "positions"),
                      ignore_errors=True)

    def _doc_store_plan():
        # fan the read out so parquet ENCODE parallelizes across cores (a
        # single-file source otherwise yields a handful of giant write
        # tasks, which becomes the build's critical path at high CPU
        # counts).  Plan construction stays on the caller's thread — lazy
        # imports inside read_parquet are not thread-safe against a
        # concurrent plan build (observed fsspec half-import race).
        src = transcripts
        if transcripts_path is not None:
            src = ray.data.read_parquet(
                transcripts_path,
                override_num_blocks=default_pool_max() * 3)
        return _add_ids(src)

    def _write_doc_store(with_ids=None):
        if with_ids is None:
            with_ids = _doc_store_plan()
        shutil.rmtree(docs_dir, ignore_errors=True)
        # small row groups: downstream column-pruned reads split into
        # parallel fragments even when a write task emits one big file.
        # zstd: artifact bytes hit a SHARED disk whose bandwidth doesn't
        # scale with CPUs — compressing trades non-scaling disk time for
        # scaling CPU time (and ~halves the doc-store footprint)
        with_ids.write_parquet(docs_dir, row_group_size=16384,
                               compression="zstd")

    if cfg.checkpoint_triples:
        if needs_docs:
            _write_doc_store()
            manifest["docs_fingerprint"] = fp
            save_manifest(index_dir, manifest)

        # 2a) tokenize -> shared triples artifact (resume skips re-tokenize;
        # dedup/spellcheck jobs can reuse it)
        if not (resume and manifest.get("triples_fingerprint") == fp):
            docs_ds = ray.data.read_parquet(docs_dir,
                                            columns=["doc_id", "text"])
            combined = tokenize_docs(
                docs_ds, batch_size=cfg.tokenize_batch_size,
                concurrency=cfg.tokenize_concurrency,
                do_stem=cfg.do_stem, drop_stopwords=cfg.drop_stopwords)
            shutil.rmtree(triples_dir, ignore_errors=True)
            # hive-partition by kind: doclen (kind=1) and triple (kind=0)
            # reads prune whole directories instead of row-filtering
            combined.write_parquet(triples_dir, partition_cols=["kind"],
                                   row_group_size=65536)
            manifest["triples_fingerprint"] = fp
            save_manifest(index_dir, manifest)

        # 3a) doclens + corpus stats (kind=1 hive directory read)
        dl_ds = ray.data.read_parquet(
            os.path.join(triples_dir, "kind=1"), columns=["doc_id", "tf"],
        ).map_batches(
            lambda b: b.rename_columns(["doc_id", "doc_len"]),
            batch_format="pyarrow")
        shutil.rmtree(doclens_dir, ignore_errors=True)
        dl_ds.write_parquet(doclens_dir)
        stats = corpus_stats(ray.data.read_parquet(doclens_dir))
        if stats["doc_total"] not in (n, 1):
            raise AssertionError(
                f"doc_total mismatch: id assigner says {n}, got {stats}")
        stats["doc_total"] = n if n > 0 else 1
        write_stats(index_dir, stats)

        # 4a) segments (resumable wide step)
        triples = ray.data.read_parquet(
            os.path.join(triples_dir, "kind=0"),
            columns=["term", "doc_id", "tf"])
        seg_manifest = build_segments(
            triples, index_dir=index_dir, doc_total=n,
            num_partitions=cfg.num_partitions, salt=cfg.salt,
            block_size=cfg.block_size, input_fingerprint=fp, resume=resume,
            range_splits=cfg.range_splits)
        if cfg.build_positions:
            # checkpoint mode tokenizes from the triples artifact, which
            # has no surface positions — the positional artifact needs its
            # own (doc-store) scan here; the FUSED default path below is
            # the one-scan plan.  Fingerprint-gated so a resume of an
            # already-complete build doesn't pay a full positional rebuild.
            from ..stages.positions import build_positional_index
            ckpt_pos_dir = os.path.join(index_dir, "positions")
            ckpt_done = resume and _pos_manifest_valid(ckpt_pos_dir, fp)
            if not ckpt_done:
                shutil.rmtree(ckpt_pos_dir, ignore_errors=True)
                build_positional_index(
                    ray.data.read_parquet(docs_dir,
                                          columns=["doc_id", "text"]),
                    ckpt_pos_dir,
                    docs_per_bucket=_resolve_pos_dpb(cfg, n),
                    row_group_size=cfg.positions_row_group_size,
                    input_fingerprint=fp)
    else:
        # 2b) FUSED: the doc-store write runs on a side thread while the
        # main thread streams tokenize -> combiner -> one shuffle -> writer
        # tasks (doc lengths ride the shuffle to a reserved part).  Both
        # pipelines share the Ray cluster; neither blocks the other.
        doc_store_error: list[BaseException] = []

        t = None
        if needs_docs:
            docs_plan = _doc_store_plan()     # plan built on main thread

            def _docs_thread():
                try:
                    _write_doc_store(docs_plan)
                except BaseException as e:   # surfaced after join
                    doc_store_error.append(e)

            t = threading.Thread(target=_docs_thread, name="doc-store-write")
            t.start()

        idx_src = _pruned(["conv_id", "turn_idx", "text"], fan_out=True)
        with_ids = _add_ids(idx_src)
        # tokenize rides INSIDE the combiner task (pre_map): the exploded
        # triples never hit the object store, so the Sort barrier only holds
        # compact runs and the combiner can't be reservation-throttled
        # behind its own input queue (the 38.4M-turn / 4-CPU serialization)
        pos_dir = os.path.join(index_dir, "positions")
        if cfg.build_positions:
            # one-scan fusion: the SAME pre_map tokenize side-writes
            # positional fragments while feeding the segment shuffle
            from ..stages.positions import (compact_position_fragments,
                                            make_fused_pos_tokenize_fn)
            pos_dpb = _resolve_pos_dpb(cfg, n)
            # resume staleness guard: an existing positional artifact built
            # from a DIFFERENT corpus/layout (fingerprint or bucket-size
            # mismatch, or bucket files with no manifest at all) must be
            # cleared BEFORE compaction, or its stale bucket rows merge
            # into the new artifact and phrase search serves mixed-corpus
            # hits (rows aren't exact (term, doc) duplicates, so the
            # compaction dedup cannot drop them)
            pos_valid = False
            if resume and os.path.isdir(pos_dir):
                pos_valid = _pos_manifest_valid(pos_dir, fp, pos_dpb)
                if not pos_valid:
                    shutil.rmtree(pos_dir, ignore_errors=True)
            pre_map = make_fused_pos_tokenize_fn(
                os.path.join(pos_dir, "fragments"),
                docs_per_bucket=pos_dpb,
                do_stem=cfg.do_stem, drop_stopwords=cfg.drop_stopwords)
        else:
            pre_map = make_tokenize_fn(do_stem=cfg.do_stem,
                                       drop_stopwords=cfg.drop_stopwords)
        seg_manifest = build_segments(
            with_ids.select_columns(["doc_id", "text"]),
            index_dir=index_dir, doc_total=n,
            num_partitions=cfg.num_partitions, salt=cfg.salt,
            block_size=cfg.block_size, input_fingerprint=fp, resume=resume,
            with_doclens=True, range_splits=cfg.range_splits,
            pre_map=pre_map,
            pre_batch_size=cfg.fused_batch_size,
            pre_concurrency=cfg.tokenize_concurrency,
            # a cleared/invalid positional artifact needs the pre_map to
            # RUN so fragments regenerate — a segments full-skip would
            # otherwise publish an empty positions manifest
            allow_full_skip=pos_valid if cfg.build_positions else True)
        _mark("segments_pipeline")
        if cfg.build_positions:
            compact_position_fragments(
                pos_dir, docs_per_bucket=pos_dpb,
                row_group_size=cfg.positions_row_group_size,
                input_fingerprint=fp)
            _mark("positions_compact")

        if t is not None:
            t.join()
            _mark("doc_store_tail")
            if doc_store_error:
                raise doc_store_error[0]
            manifest = load_manifest(index_dir)
            manifest["docs_fingerprint"] = fp
            manifest["doc_total"] = n
            save_manifest(index_dir, manifest)

        total_tokens = _reserved_total_tokens(
            seg_manifest, cfg.num_partitions * cfg.range_splits)
        stats = {"doc_total": n if n > 0 else 1,
                 "total_tokens": total_tokens,
                 "avgdl": (total_tokens / n) if n > 0 else 0.0}
        write_stats(index_dir, stats)
        _mark("finalize")

    return {"index_dir": index_dir, "doc_total": n, "stats": stats,
            "manifest": seg_manifest}


def extend_index(new_transcripts: "ray.data.Dataset", cfg: EngineConfig, *,
                 source_desc: str = "", transcripts_path: str | None = None,
                 allow_out_of_order: bool = False) -> dict:
    """Incrementally extend an existing index with new conversations.

    This is the engine's analogue of the reference's per-doc incremental
    maintenance (delete+reinsert on recrawl, worker.py:229) re-expressed for
    immutable artifacts: new turns are tokenized and shuffled into the SAME
    partitions, and each touched segment file is rewritten by merging the
    new postings into the existing term rows (untouched terms are carried
    over without decoding; untouched parts are untouched files).

    Default (append-only) contract: every new conv_id must sort AFTER the
    existing ``max_conv`` so dense doc ids stay order-equivalent to doc keys
    (new ids start at the old doc_total).  Violations raise.

    ``allow_out_of_order=True`` lifts the contract with a GENERATION model:
    the batch lands in its own tail doc-id block [n0, n0+n_new) regardless
    of conv-id sort order, and incoming conv_ids that already exist are
    recrawls — their old doc ranges are tombstoned first (delete+reinsert,
    exactly worker.py:229), so queries see only the new version.  The
    manifest records each generation's doc-id block; compaction = the normal
    truncate-rebuild, which folds every generation (and its tombstones) into
    one order-equivalent id space.  Semantics drift vs a clean rebuild:
    stage-1 candidate-limit TIE-BREAKS use doc_id order, which inside an
    out-of-order generation no longer equals url order (stage-2's final
    (-score, url) sort is unaffected — property-tested equal to a clean
    unified rebuild); after a recrawl, df/idf keep counting tombstoned docs
    until the next rebuild (same as delete_conversations)."""
    index_dir = cfg.index_dir
    manifest = load_manifest(index_dir)
    if "doc_total" not in manifest:
        raise ValueError(f"no existing index at {index_dir}")
    # retry guard: segment merges and doc-store appends commit
    # incrementally, so a retry after a mid-extend crash would merge the
    # same postings twice and append duplicate doc rows — fail loudly and
    # point at the recovery path instead of silently corrupting
    marker = os.path.join(index_dir, "extend.inprogress")
    if os.path.exists(marker):
        raise RuntimeError(
            f"a previous extend of {index_dir} did not complete "
            f"({marker} exists); the index may hold partially merged "
            f"segments — run compact_index (or a clean rebuild) before "
            f"extending again")
    n0 = int(manifest["doc_total"])
    max_conv = manifest.get("max_conv", "")
    fp = _fingerprint(source_desc, cfg)
    # partitioning is an index property, not a caller choice: merging new
    # postings into existing part files requires the SAME term->part
    # mapping as the base build (a different num_partitions would split a
    # term across overlapping-doc-range files, breaking the rb-ascending
    # chunk-concat invariant)
    num_partitions = int(manifest.get("num_partitions",
                                      cfg.num_partitions))

    src = (ray.data.read_parquet(transcripts_path,
                                 columns=["conv_id", "turn_idx"])
           if transcripts_path else new_transcripts)
    try:
        offsets, n_new = conv_offsets(
            src, max_broadcast_convs=cfg.max_broadcast_convs)
    except BroadcastCapExceeded as exc:
        # the documented join-mode path exists for full builds; an extend
        # batch past the cap needs the same treatment at the doc-id join —
        # not yet implemented, so fail with the recovery path rather than
        # an internal cutover exception
        raise RuntimeError(
            f"extend batch exceeds max_broadcast_convs "
            f"({cfg.max_broadcast_convs}): split the batch into smaller "
            f"extends or rebuild with build_index (join mode)") from exc
    if n_new == 0:
        return {"index_dir": index_dir, "doc_total": n0,
                "manifest": manifest}
    low = min(offsets)
    if max_conv and low <= max_conv:
        if not allow_out_of_order:
            raise ValueError(
                f"incremental extend requires new conv_ids > {max_conv!r}; "
                f"got {low!r} (append-only contract; pass "
                f"allow_out_of_order=True for generation-based ingest)")
        # recrawl semantics: tombstone the OLD docs of any re-ingested conv
        # BEFORE appending (the resolver reads the current doc store, so it
        # must not see the new rows).  Non-existing convs are a no-op.
        from ..state.tombstones import delete_conversations
        delete_conversations(index_dir, sorted(offsets))
    offsets = {c: b + n0 for c, b in offsets.items()}
    offsets_ref = ray.put(offsets)
    n = n0 + n_new

    with open(marker, "w") as f:
        f.write(fp)

    # append to the doc store (new files alongside the old ones)
    with_ids = add_doc_ids_with_offsets(new_transcripts, offsets_ref)
    with_ids.write_parquet(os.path.join(index_dir, "docs"),
                           row_group_size=16384, compression="zstd")

    idx_src = new_transcripts if transcripts_path is None else \
        ray.data.read_parquet(transcripts_path,
                              columns=["conv_id", "turn_idx", "text"],
                              override_num_blocks=default_pool_max() * 3)
    combined = add_doc_ids_with_offsets(
        idx_src, offsets_ref).select_columns(["doc_id", "text"])
    rs = int(manifest.get("range_splits", 1))
    rbase = int(manifest.get("range_base_n", max(n0, 1)))
    # keep the positional artifact LIVE across incremental ingest: when the
    # base build published one, the extend's tokenize pass side-writes
    # positional fragments for the new docs and the tail compaction merges
    # them into the existing bucket files (same one-scan fusion as the base
    # build; recrawled victims are already tombstoned above and filtered at
    # query time by the positional readers)
    pos_dir = os.path.join(index_dir, "positions")
    pos_live = os.path.exists(os.path.join(pos_dir, "manifest.json"))
    if pos_live:
        from ..stages.positions import (compact_position_fragments,
                                        load_manifest as load_pos_manifest,
                                        make_fused_pos_tokenize_fn)
        pos_dpb = int(load_pos_manifest(pos_dir)["docs_per_bucket"])
        ext_pre_map = make_fused_pos_tokenize_fn(
            os.path.join(pos_dir, "fragments"), docs_per_bucket=pos_dpb,
            do_stem=cfg.do_stem, drop_stopwords=cfg.drop_stopwords)
    else:
        ext_pre_map = make_tokenize_fn(do_stem=cfg.do_stem,
                                       drop_stopwords=cfg.drop_stopwords)
    seg_manifest = build_segments(
        combined, index_dir=index_dir, doc_total=n,
        pre_map=ext_pre_map,
        pre_batch_size=cfg.fused_batch_size,
        pre_concurrency=cfg.tokenize_concurrency,
        num_partitions=num_partitions, salt=cfg.salt,
        block_size=cfg.block_size, input_fingerprint=fp, resume=False,
        with_doclens=True, merge_existing=True,
        range_splits=rs, range_base_n=rbase,
        # idempotent-merge boundary: this generation's doc ids start at n0,
        # so a retried reducer can drop its own prior output from the
        # existing segment before re-merging (at-least-once task safety)
        new_doc_base=n0)

    if pos_live:
        compact_position_fragments(
            pos_dir, docs_per_bucket=pos_dpb,
            row_group_size=cfg.positions_row_group_size,
            input_fingerprint=fp)

    total_tokens = _reserved_total_tokens(
        seg_manifest, num_partitions * rs)
    stats = {"doc_total": n, "total_tokens": total_tokens,
             "avgdl": total_tokens / n}
    write_stats(index_dir, stats)
    seg_manifest["doc_total"] = n
    seg_manifest["max_conv"] = max(max(offsets), max_conv)
    gens = seg_manifest.get("generations") or [
        {"doc_lo": 0, "doc_hi": n0, "source": "base"}]
    gens.append({"doc_lo": n0, "doc_hi": n, "source": source_desc,
                 "out_of_order": bool(max_conv and low <= max_conv)})
    seg_manifest["generations"] = gens
    save_manifest(index_dir, seg_manifest)
    os.remove(marker)
    return {"index_dir": index_dir, "doc_total": n, "stats": stats,
            "manifest": seg_manifest}


def compact_index(cfg: EngineConfig, *, source_desc: str = "compact") -> dict:
    """Fold every generation and all tombstones into one clean index.

    Reads the LIVE rows of the doc store (tombstoned recrawl victims and
    deleted conversations filtered out), rebuilds into a sibling temp dir
    with the normal build pipeline — doc ids re-derive from conv order, so
    the unified id space is order-equivalent to doc keys again and df/idf/
    avgdl drop the deleted docs — then swaps the directories.  This is the
    engine's analogue of the reference's periodic truncate-rebuild cycle
    (/root/reference/app/batch/runner.py), applied to one index in place.

    Crash safety: the rebuild happens entirely in ``<index>.compact``; the
    swap renames the current index to ``<index>.pre-compact`` before moving
    the new one in, so a crash between the two renames leaves a complete
    index at the .pre-compact path (recover by renaming it back)."""
    from dataclasses import replace as dc_replace

    import pyarrow as pa

    from ..state.tombstones import load_tombstones, mask_tombstoned

    index_dir = cfg.index_dir
    # artifact-preserving compaction: an index whose live layout includes
    # the positional artifact keeps it through the rebuild even when the
    # caller's cfg doesn't say so (the artifact's EXISTENCE is the index's
    # property; dropping it would silently break phrase/NEAR serving after
    # the standard maintenance cycle)
    if not cfg.build_positions and os.path.exists(
            os.path.join(index_dir, "positions", "manifest.json")):
        cfg = dc_replace(cfg, build_positions=True)
    lo, hi = load_tombstones(index_dir)
    docs = ray.data.read_parquet(os.path.join(index_dir, "docs"))
    if len(lo):
        # tombstone ranges are a small control artifact (deletes are rare);
        # shipping the two arrays in the task closure is the broadcast
        def live(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(mask_tombstoned(ids, lo, hi)))
        docs = docs.map_batches(live, batch_format="pyarrow")
    docs = docs.drop_columns(["doc_id"])

    tmp_dir = index_dir.rstrip("/") + ".compact"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    info = build_index(docs, dc_replace(cfg, index_dir=tmp_dir),
                       source_desc=source_desc)
    old_dir = index_dir.rstrip("/") + ".pre-compact"
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(index_dir, old_dir)
    os.rename(tmp_dir, index_dir)
    shutil.rmtree(old_dir)
    info["index_dir"] = index_dir
    return info
