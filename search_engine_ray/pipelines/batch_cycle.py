"""Periodic batch maintenance cycle — the engine's analogue of the
reference's batch runner (`/root/reference/app/batch/runner.py:36-52`):

    news_fetch -> duplicates -> link_graph -> (pagerank || bm25 || spellcheck)

re-expressed over immutable Parquet artifacts instead of Postgres tables:

* news fetch (runner.py:40) is n/a by driver design (no network I/O); the
  second-corpus path is covered by the unified news build
  (sources/transcripts.news_from_documents).
* duplicates (duplicate_detection.py) -> ``fingerprints/`` parquet (SimHash
  per doc, the reference's document_fingerprints table) + ``dup_groups/``
  (exact-dup classes).
* link graph (link_graph_builder.py) -> ``links/`` parquet of resolved
  (src_doc_id, dst_doc_id) edges.
* pagerank (pagerank.py) -> ``pagerank/`` parquet (doc_id, pagerank,
  inlink_count).
* bm25 stats (bm25_stats.py:8-27) -> ``term_stats/`` parquet (term, df,
  idf, avg_doc_len) + refreshed corpus ``stats.json`` constants.
* spellcheck dictionary (spellcheck_dictionary.py) -> ``dictionary/``
  parquet + the JSON meta sink.

The reference gathers pagerank/bm25/spellcheck with asyncio because each
job is one single-threaded SQL connection; here every stage already fans
out over the whole cluster through Ray Data, so stages run sequentially —
the cluster-efficient equivalent (running them "concurrently" would just
interleave the same task pool).  Each stage is truncate-and-rebuild into
its own directory (the reference's TRUNCATE + INSERT semantics,
bm25_stats.py:15) with an atomic directory swap, so a crashed cycle leaves
the previous artifacts intact and a re-run is idempotent.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa

import ray
import ray.data


def _swap_in(tmp_dir: str, final_dir: str) -> None:
    """Atomic-ish truncate-and-replace: build into tmp, then swap.

    Crash safety: a crash between the two os.replace calls leaves the
    previous artifacts only in ``.old`` — so the next run first RECOVERS
    ``.old`` back into place when the final dir is absent, and ``.old`` is
    only deleted after the new dir has been swapped in."""
    old = final_dir + ".old"
    if os.path.isdir(old) and not os.path.exists(final_dir):
        os.replace(old, final_dir)      # recover from a prior mid-swap crash
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(final_dir):
        os.replace(final_dir, old)
    os.replace(tmp_dir, final_dir)
    shutil.rmtree(old, ignore_errors=True)


def run_cycle(docs: "ray.data.Dataset", out_dir: str, *,
              skip: frozenset[str] = frozenset(),
              pagerank_iterations: int | None = None) -> dict:
    """One maintenance cycle over a doc-id'd corpus Dataset; returns a
    manifest {stage: {path, rows, sec}}.  ``skip`` names stages to omit
    (reference worker role gating, runner.py:27-33,43-48: duplicates run on
    every node, the global jobs only on the coordinator — callers pass
    skip={'link_graph','pagerank','bm25','spellcheck'} for worker nodes)."""
    from ..stages.dedup import exact_dedup_groups, fingerprints
    from ..stages.graph import (extract_mention_edges, inlink_counts,
                                pagerank_dataset, resolve_edges)
    from ..stages.spellcheck import build_dictionary, write_meta_file
    from ..stages.stats import corpus_stats
    from ..stages.tokenize import tokenize_docs

    os.makedirs(out_dir, exist_ok=True)
    manifest: dict = {}
    docs = docs.materialize()       # consumed by every stage below

    def _publish(stage: str, ds: "ray.data.Dataset") -> int:
        tmp = os.path.join(out_dir, f".{stage}.tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp, compression="zstd")
        _swap_in(tmp, os.path.join(out_dir, stage))
        return ray.data.read_parquet(os.path.join(out_dir, stage)).count()

    def _stage(stage: str, fn, artifact: str | None = None) -> None:
        # ``artifact`` = the directory _publish actually writes (defaults to
        # the stage name) so the manifest path always points at a real dir
        if stage in skip:
            manifest[stage] = {"skipped": True}
            return
        t0 = time.time()
        rows = fn()
        manifest[stage] = {"path": os.path.join(out_dir, artifact or stage),
                           "rows": rows, "sec": round(time.time() - t0, 3)}

    # duplicates (runner.py:41): fingerprints + exact-dup classes
    _stage("fingerprints", lambda: _publish("fingerprints",
                                            fingerprints(docs)))
    _stage("dup_groups", lambda: _publish("dup_groups",
                                          exact_dedup_groups(docs)))

    # link graph (runner.py:50)
    resolved = None
    if "link_graph" not in skip:
        resolved = resolve_edges(extract_mention_edges(docs),
                                 docs).materialize()
        _stage("link_graph", lambda: _publish("links", resolved),
               artifact="links")
    else:
        manifest["link_graph"] = {"skipped": True}

    # pagerank (runner.py:52) — rank-as-Dataset path joined with inlinks
    def _pagerank() -> int:
        n = docs.count()
        kw = ({} if pagerank_iterations is None
              else {"iterations": pagerank_iterations})
        pr = pagerank_dataset(resolved, n, **kw)
        inl = inlink_counts(resolved)
        from ..util import hash_join
        joined = hash_join(pr, inl, "left_outer", num_partitions=8,
                           on=("doc_id",)).map_batches(
            lambda b: pa.table({
                "doc_id": b.column("doc_id"),
                "pagerank": b.column("pagerank"),
                "inlink_count": b.column("inlink_count").fill_null(0),
            }), batch_format="pyarrow")
        return _publish("pagerank", joined)
    if resolved is not None:
        _stage("pagerank", _pagerank)
    else:
        # link_graph was skipped, so pagerank has no edges to run over —
        # record it as skipped instead of publishing a phantom empty stage
        manifest["pagerank"] = {"skipped": True}

    # bm25 stats (runner.py:52, bm25_stats.py:8-27): term df/idf + constants
    def _bm25() -> int:
        # ONE tokenize pass: the combined stream carries both kinds (term
        # rows and doc-length rows); without the materialize the stage ran
        # the full Porter tokenize twice, once per filter consumer
        combined = tokenize_docs(docs).materialize()
        toks = combined.filter(expr="kind == 0")
        doc_total = docs.count()
        from ray.data.aggregate import Count, Sum
        import numpy as np

        def _idf(b: pa.Table, _n=doc_total) -> pa.Table:
            df = b.column("count()").to_numpy(
                zero_copy_only=False).astype(np.float64)
            return pa.table({
                "term": b.column("term"),
                "doc_frequency": b.column("count()"),
                "idf": pa.array(np.log((_n - df + 0.5) / (df + 0.5) + 1.0),
                                pa.float64()),
            })

        stats_ds = toks.groupby("term").aggregate(Count()).map_batches(
            _idf, batch_format="pyarrow")
        rows = _publish("term_stats", stats_ds)
        lens = combined.filter(expr="kind == 1").map_batches(
            lambda b: pa.table({"doc_id": b.column("doc_id"),
                                "doc_len": b.column("tf")}),
            batch_format="pyarrow")
        st = corpus_stats(lens)
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(st, f)
        return rows
    _stage("bm25", _bm25, artifact="term_stats")

    # spellcheck dictionary (runner.py:52)
    def _spell() -> int:
        d = build_dictionary(docs)
        tmp = os.path.join(out_dir, ".dictionary.tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        import pyarrow.parquet as pq
        pq.write_table(d, os.path.join(tmp, "dictionary.parquet"),
                       compression="zstd")
        _swap_in(tmp, os.path.join(out_dir, "dictionary"))
        write_meta_file(d, os.path.join(out_dir, "dictionary_meta.json"))
        return d.num_rows
    _stage("spellcheck", _spell, artifact="dictionary")

    manifest["cycle_completed_at"] = time.time()
    with open(os.path.join(out_dir, "cycle_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
