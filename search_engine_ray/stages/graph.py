"""Reference-graph stages (SURVEY.md §2.4 A7/A8, §2.5 J1, Phase 4b).

Edges are extracted from transcript text: cross-conversation mentions
(``see conv-XXXXXX#k``) resolve to (conv_id, turn_idx) doc keys, URLs are
normalized with the reference's normalizer (M2).  Resolution is the
reference's ``links_outgoing JOIN documents`` inner join
(/root/reference/app/batch/link_graph_builder.py:6-18): dangling targets are
dropped.  Degrees = groupby(dst).count() (pagerank.py:26-27); PageRank = the
reference's 20-iteration damping-0.85 loop (pagerank.py:29-38) re-expressed as
per-iteration Dataset contribution shuffles.

Scale notes: edge extraction + resolution shuffles by dst key; the rank
vector is dense over doc_ids and broadcast per iteration (ray.put once per
iteration, read per task) — beyond node counts that fit a broadcast, ranks
become a Dataset joined on src instead.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count

from ..functions.urlnorm import normalize_url

MENTION_RE = re.compile(r"\bsee (conv-\d{6})#(\d+)\b")
URL_RE = re.compile(r"https?://[^\s]+")

DAMPING = 0.85
ITERATIONS = 20


def extract_mention_edges(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(src_doc_id, dst_conv_id, dst_turn_idx) raw mention edges (order
    preserving, in-doc deduped like the reference link extractor
    worker.py:66-75)."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        src, dconv, dturn = [], [], []
        for doc_id, t in zip(ids, texts):
            seen = set()
            for conv, turn in MENTION_RE.findall(t or ""):
                key = (conv, int(turn))
                if key in seen:
                    continue
                seen.add(key)
                src.append(doc_id)
                dconv.append(conv)
                dturn.append(int(turn))
        return pa.table({
            "src_doc_id": pa.array(src, pa.int64()),
            "dst_conv_id": pa.array(dconv, pa.string()),
            "dst_turn_idx": pa.array(dturn, pa.int32()),
        })
    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def extract_url_edges(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(src_doc_id, url) normalized URL references (M2 normalizer)."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        src, urls = [], []
        for doc_id, t in zip(ids, texts):
            seen = set()
            for raw in URL_RE.findall(t or ""):
                u = normalize_url(raw)
                if u in seen:
                    continue
                seen.add(u)
                src.append(doc_id)
                urls.append(u)
        return pa.table({"src_doc_id": pa.array(src, pa.int64()),
                         "url": pa.array(urls, pa.string())})
    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def resolve_edges(edges: "ray.data.Dataset", docs: "ray.data.Dataset",
                  *, max_broadcast_docs: int = 50_000_000
                  ) -> "ray.data.Dataset":
    """Inner-join mention edges to doc keys -> (src_doc_id, dst_doc_id),
    DISTINCT (link_graph_builder.py:13-15 semantics: dangling dropped).

    The doc-key -> doc_id map is the small side: broadcast via ray.put and
    looked up inside map_batches instead of a shuffle join (SURVEY.md J1)."""
    key_map: dict[tuple[str, int], int] = {}
    for batch in docs.select_columns(["conv_id", "turn_idx", "doc_id"]
                                     ).iter_batches(batch_format="pyarrow"):
        key_map.update(zip(
            zip(batch.column("conv_id").to_pylist(),
                (int(x) for x in batch.column("turn_idx").to_pylist())),
            batch.column("doc_id").to_pylist()))
    if len(key_map) > max_broadcast_docs:
        raise NotImplementedError(
            "doc-key map exceeds broadcast cap; switch to hash join on "
            "(conv_id, turn_idx)")
    ref = ray.put(key_map)

    class Resolve:
        def __init__(self, ref):
            self._map = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            src = batch.column("src_doc_id").to_pylist()
            conv = batch.column("dst_conv_id").to_pylist()
            turn = batch.column("dst_turn_idx").to_pylist()
            s_out, d_out = [], []
            for s, c, t in zip(src, conv, turn):
                d = self._map.get((c, int(t)))
                if d is not None:
                    s_out.append(s)
                    d_out.append(d)
            return pa.table({"src_doc_id": pa.array(s_out, pa.int64()),
                             "dst_doc_id": pa.array(d_out, pa.int64())})

    resolved = edges.map_batches(Resolve, fn_constructor_args=(ref,),
                                 batch_format="pyarrow", concurrency=(1, 8))
    # DISTINCT
    return resolved.groupby(["src_doc_id", "dst_doc_id"]).aggregate(
        Count()).drop_columns(["count()"])


def inlink_counts(resolved: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, inlink_count) = groupby(dst).count() (pagerank.py:26-27)."""
    return resolved.groupby("dst_doc_id").aggregate(Count()).map_batches(
        lambda b: pa.table({"doc_id": b.column("dst_doc_id"),
                            "inlink_count": b.column("count()")}),
        batch_format="pyarrow")


def pagerank(resolved: "ray.data.Dataset", num_nodes: int, *,
             damping: float = DAMPING, iterations: int = ITERATIONS
             ) -> np.ndarray:
    """Dense PageRank over doc_ids 0..num_nodes-1, reference loop semantics
    (pagerank.py:29-38): dangling mass NOT redistributed, unknown endpoints
    dropped (resolution already guarantees known endpoints).

    Each iteration: one distributed contribution pass over the edges Dataset
    (groupby dst, partial-aggregated per batch) against the broadcast rank
    vector."""
    if num_nodes == 0:
        return np.zeros(0)

    edges = resolved.materialize()   # reused every iteration; edge list only
    out_deg = np.zeros(num_nodes, dtype=np.int64)
    for batch in edges.iter_batches(batch_format="pyarrow"):
        np.add.at(out_deg, batch.column("src_doc_id").to_numpy(
            zero_copy_only=False), 1)

    pr = np.full(num_nodes, 1.0 / num_nodes)
    base = (1.0 - damping) / num_nodes
    for _ in range(iterations):
        ref = ray.put(pr)
        deg_ref = ray.put(out_deg)

        def contribs(batch: pa.Table, *, _ref=ref, _dref=deg_ref) -> pa.Table:
            ranks = ray.get(_ref)
            degs = ray.get(_dref)
            src = batch.column("src_doc_id").to_numpy(zero_copy_only=False)
            dst = batch.column("dst_doc_id").to_numpy(zero_copy_only=False)
            share = damping * ranks[src] / degs[src]
            # partial per-batch aggregation before the shuffle
            agg: dict[int, float] = {}
            for d, s in zip(dst.tolist(), share.tolist()):
                agg[d] = agg.get(d, 0.0) + s
            return pa.table({
                "dst_doc_id": pa.array(list(agg.keys()), pa.int64()),
                "contrib": pa.array(list(agg.values()), pa.float64()),
            })

        from ray.data.aggregate import Sum
        summed = edges.map_batches(contribs, batch_format="pyarrow").groupby(
            "dst_doc_id").aggregate(Sum("contrib"))
        new_pr = np.full(num_nodes, base)
        for batch in summed.iter_batches(batch_format="pyarrow"):
            ids = batch.column("dst_doc_id").to_numpy(zero_copy_only=False)
            vals = batch.column("sum(contrib)").to_numpy(zero_copy_only=False)
            new_pr[ids] += vals
        pr = new_pr
    return pr
