"""End-to-end index build pipeline.

DAG (SURVEY.md §3 "ours"):

  read transcripts
    -> assign deterministic dense doc_id (one conv-count groupby + broadcast)
    -> write doc store parquet (index_dir/docs/)
    -> tokenize map_batches over (doc_id, text) read back column-pruned
       -> write posting-triples artifact (index_dir/triples/) — the shared
          tokenize artifact reused by stats/dedup/spellcheck stages
    -> doclens + corpus stats (kind==1 rows; filter pushed into parquet read)
    -> part-hash groupby (optionally salted two-phase) -> SegmentWriter
       reducers write segment files + manifest (kind==0 rows)

Every artifact is an immutable overwrite (the reference's truncate-and-rebuild
semantics, bm25_stats.py:15) and the segment step resumes at part granularity
via the manifest.  All steps stream; the only driver-side state is the conv
offset map and the manifest rows.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.dataset as pads

import ray.data

from ..config import EngineConfig
from ..functions.hashing import hash64
from ..stages.doc_ids import assign_doc_ids
from ..stages.postings import build_segments, load_manifest, save_manifest
from ..stages.stats import corpus_stats, doclens, write_stats
from ..stages.tokenize import tokenize_docs


# bump when artifact layout changes so resume never reads a stale layout
_LAYOUT_VERSION = 3


def _fingerprint(source_desc: str, cfg: EngineConfig) -> str:
    key = (f"v{_LAYOUT_VERSION}|{source_desc}|stem={int(cfg.do_stem)}|"
           f"stop={int(cfg.drop_stopwords)}|P={cfg.num_partitions}|"
           f"block={cfg.block_size}")
    return f"{hash64(key):016x}"


def build_index(transcripts: "ray.data.Dataset", cfg: EngineConfig, *,
                source_desc: str = "", resume: bool = False) -> dict:
    """Build all index artifacts under cfg.index_dir; returns build info."""
    index_dir = cfg.index_dir
    fp = _fingerprint(source_desc, cfg)
    manifest = load_manifest(index_dir) if resume else {"entries": {}}
    os.makedirs(index_dir, exist_ok=True)

    docs_dir = os.path.join(index_dir, "docs")
    triples_dir = os.path.join(index_dir, "triples")
    doclens_dir = os.path.join(index_dir, "doclens")

    # 1) doc ids + doc store
    if not (resume and manifest.get("docs_fingerprint") == fp):
        with_ids, n = assign_doc_ids(
            transcripts, max_broadcast_convs=cfg.max_broadcast_convs)
        shutil.rmtree(docs_dir, ignore_errors=True)
        # small row groups: downstream column-pruned reads split into
        # parallel fragments even when a write task emits one big file
        with_ids.write_parquet(docs_dir, row_group_size=16384)
        manifest["docs_fingerprint"] = fp
        manifest["doc_total"] = n
        save_manifest(index_dir, manifest)
    n = int(manifest["doc_total"])

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
        save_manifest(index_dir, manifest)
        return {"index_dir": index_dir, "doc_total": 0, "stats": stats,
                "manifest": manifest}

    # 2) tokenize -> shared triples artifact (one tokenize pass total)
    if not (resume and manifest.get("triples_fingerprint") == fp):
        docs_ds = ray.data.read_parquet(docs_dir, columns=["doc_id", "text"])
        combined = tokenize_docs(
            docs_ds, batch_size=cfg.tokenize_batch_size,
            concurrency=cfg.tokenize_concurrency,
            do_stem=cfg.do_stem, drop_stopwords=cfg.drop_stopwords)
        shutil.rmtree(triples_dir, ignore_errors=True)
        # hive-partition by kind: doclen (kind=1) and triple (kind=0) reads
        # prune whole directories instead of row-filtering everything
        combined.write_parquet(triples_dir, partition_cols=["kind"],
                               row_group_size=65536)
        manifest["triples_fingerprint"] = fp
        save_manifest(index_dir, manifest)

    # 3) doclens + corpus stats (kind=1 hive directory read — path pruning)
    dl_ds = ray.data.read_parquet(
        os.path.join(triples_dir, "kind=1"), columns=["doc_id", "tf"],
    ).map_batches(
        lambda b: b.rename_columns(["doc_id", "doc_len"]),
        batch_format="pyarrow")
    shutil.rmtree(doclens_dir, ignore_errors=True)
    dl_ds.write_parquet(doclens_dir)
    dl_read = ray.data.read_parquet(doclens_dir)
    stats = corpus_stats(dl_read.map_batches(
        lambda b: b, batch_format="pyarrow"))
    if stats["doc_total"] not in (n, 1):
        raise AssertionError(
            f"doc_total mismatch: id assigner says {n}, doclens say {stats}")
    stats["doc_total"] = n if n > 0 else 1
    write_stats(index_dir, stats)

    # 4) segments (resumable wide step); kind=0 directory = posting triples
    triples = ray.data.read_parquet(
        os.path.join(triples_dir, "kind=0"),
        columns=["term", "doc_id", "tf"])
    seg_manifest = build_segments(
        triples, index_dir=index_dir, doc_total=n,
        num_partitions=cfg.num_partitions, salt=cfg.salt,
        block_size=cfg.block_size, input_fingerprint=fp, resume=resume)

    return {"index_dir": index_dir, "doc_total": n, "stats": stats,
            "manifest": seg_manifest}
