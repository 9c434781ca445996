"""Query-side pipelines.

Two serving shapes, mirroring the reference's API surface
(/root/reference/app/api/main.py:203-230 FastAPI endpoints, SURVEY.md §2.1
S8) re-expressed for Ray:

  * ``search_once`` — driver-side convenience wrapper (load engine, query).
  * ``batch_search`` — a queries Dataset mapped through a ``QueryEngine``
    actor pool: segments/dict load ONCE per actor in __init__ (SURVEY.md
    §2.3 T6), each batch of queries is served from warm state.  This is the
    shape for offline evaluation of large query logs.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..state.query_engine import QueryEngine

QUERIES_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("q", pa.string()),
    ("limit", pa.int32()),
    ("offset", pa.int32()),
])


class QueryEngineActor:
    """map_batches callable class over a queries Dataset."""

    def __init__(self, index_dir: str, *, scoring: str = "reference",
                 k1: float = 1.2, b: float = 0.75, use_wand: bool = False):
        self._engine = QueryEngine(index_dir, scoring=scoring, k1=k1, b=b)
        self._use_wand = use_wand

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("query_id").to_pylist()
        qs = batch.column("q").to_pylist()
        limits = batch.column("limit").to_pylist() if "limit" in \
            batch.schema.names else [20] * len(qs)
        offsets = batch.column("offset").to_pylist() if "offset" in \
            batch.schema.names else [0] * len(qs)

        out_qid, out_rank, out_conv, out_turn = [], [], [], []
        out_role, out_score, out_ts, out_mt = [], [], [], []
        stage1 = "wand" if self._use_wand else "exhaustive"
        for qid, q, limit, offset in zip(qids, qs, limits, offsets):
            rows, _ = self._engine.search_with_count(
                q, limit=int(limit or 20), offset=int(offset or 0),
                stage1=stage1)
            for rank, r in enumerate(rows, start=1):
                out_qid.append(qid)
                out_rank.append(rank)
                out_conv.append(r["conv_id"])
                out_turn.append(r["turn_idx"])
                out_role.append(r["role"])
                out_score.append(r["score"])
                out_ts.append(r["token_score"])
                out_mt.append(r["matched_terms"])
        return pa.table({
            "query_id": pa.array(out_qid, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            "conv_id": pa.array(out_conv, pa.string()),
            "turn_idx": pa.array(out_turn, pa.int32()),
            "role": pa.array(out_role, pa.string()),
            "score": pa.array(out_score, pa.float64()),
            "token_score": pa.array(out_ts, pa.float64()),
            "matched_terms": pa.array(out_mt, pa.int64()),
        })


def batch_search(queries: "ray.data.Dataset", index_dir: str, *,
                 scoring: str = "reference", concurrency: int = 4,
                 batch_size: int = 64,
                 use_wand: bool = False) -> "ray.data.Dataset":
    """``use_wand=True`` routes stage-1 through the Block-Max WAND
    cursors (rank-identical to exhaustive, property-tested; pays off on
    selective queries over large indexes)."""
    return queries.map_batches(
        QueryEngineActor,
        fn_constructor_args=(index_dir,),
        fn_constructor_kwargs={"scoring": scoring, "use_wand": use_wand},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def search_once(index_dir: str, q: str, *, limit: int = 20, offset: int = 0,
                scoring: str = "reference") -> list[dict]:
    return QueryEngine(index_dir, scoring=scoring).search(
        q, limit=limit, offset=offset)
