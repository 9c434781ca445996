"""Batch-search actor-pool pipeline vs driver-side engine."""

import pyarrow as pa

import ray.data

from search_engine_ray.pipelines.search import batch_search
from search_engine_ray.state.query_engine import QueryEngine


def test_batch_search_matches_single(built_index):
    cfg, _ = built_index
    queries = pa.table({
        "query_id": pa.array([0, 1, 2, 3], pa.int64()),
        "q": pa.array(["word0001 word0002", "running", "the and",
                       "word0000"], pa.string()),
        "limit": pa.array([5, 10, 20, 3], pa.int32()),
        "offset": pa.array([0, 2, 0, 0], pa.int32()),
    })
    out = batch_search(ray.data.from_arrow(queries), cfg.index_dir,
                       concurrency=2, batch_size=2).take_all()

    qe = QueryEngine(cfg.index_dir)
    expect = []
    for qid, q, limit, offset in zip(*[queries.column(c).to_pylist()
                                       for c in ("query_id", "q", "limit",
                                                 "offset")]):
        for rank, r in enumerate(qe.search(q, limit=limit, offset=offset),
                                 start=1):
            expect.append((qid, rank, r["conv_id"], r["turn_idx"],
                           r["score"]))
    got = sorted((r["query_id"], r["rank"], r["conv_id"], r["turn_idx"],
                  r["score"]) for r in out)
    assert got == sorted(expect)
    assert not any(r["query_id"] == 2 for r in out)   # stopword query empty


def test_batch_search_wand_matches_exhaustive(built_index):
    """use_wand=True must route stage-1 through the WAND cursors and
    return identical pages (it was previously accepted but ignored)."""
    cfg, _ = built_index
    queries = pa.table({
        "query_id": pa.array([0, 1], pa.int64()),
        "q": pa.array(["word0001 word0002", "word0000"], pa.string()),
        "limit": pa.array([5, 3], pa.int32()),
        "offset": pa.array([0, 0], pa.int32()),
    })
    key = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["conv_id"], r["turn_idx"], r["score"])
        for r in rows)
    plain = batch_search(ray.data.from_arrow(queries), cfg.index_dir,
                         concurrency=1, batch_size=2).take_all()
    wand = batch_search(ray.data.from_arrow(queries), cfg.index_dir,
                        concurrency=1, batch_size=2,
                        use_wand=True).take_all()
    assert key(plain) == key(wand) and plain
