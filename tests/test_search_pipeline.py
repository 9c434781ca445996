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


def test_search_facets_partition_the_match_set():
    """Facet counts partition the stage-1 match set: each facet's counts sum
    to the same total (the number of matched turns), and every value's count
    equals the naive filter count."""
    import pyarrow as pa

    from search_engine_ray.pipelines.queries import (STAGE1_TERMS, get_engine,
                                                     search_facets)
    from search_engine_ray.sources.transcripts import TURNS_PER_CONV

    sf = "/root/testdata/sf0.001"
    rows = search_facets(sf).take_all()
    by_facet = {}
    for r in rows:
        by_facet.setdefault(r["facet"], {})[r["value"]] = r["n_docs"]
    assert set(by_facet) == {"role", "tool"}

    matched = {r[0] for r in get_engine(sf, stem=False).score_terms(
        list(STAGE1_TERMS))}
    assert sum(by_facet["role"].values()) == len(matched)
    assert sum(by_facet["tool"].values()) == len(matched)
    # naive per-value recount from the transcript definition
    from search_engine_ray.sources.transcripts import ROLES, TOOLS
    exp_role = {}
    exp_tool = {}
    for d in matched:
        exp_role[ROLES[d % 4]] = exp_role.get(ROLES[d % 4], 0) + 1
        t = TOOLS[d % 5]
        exp_tool[t] = exp_tool.get(t, 0) + 1
    assert by_facet["role"] == exp_role
    assert by_facet["tool"] == exp_tool
