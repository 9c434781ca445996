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
import pyarrow.compute as pc

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
            return resolve_edges_join(edges, docs)
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
    # DISTINCT; coalesce: aggregate-derived blocks feed downstream joins
    from ..util import coalesce_blocks
    return coalesce_blocks(
        resolved.groupby(["src_doc_id", "dst_doc_id"]).aggregate(
            Count()).drop_columns(["count()"]))


def resolve_edges_join(edges: "ray.data.Dataset", docs: "ray.data.Dataset",
                       *, num_partitions: int = 16) -> "ray.data.Dataset":
    """Distributed hash-join edge resolution — the beyond-broadcast-cap
    scale path: inner join on the composite (conv_id, turn_idx) doc key, no
    driver-held key map.  Property-tested edge-identical to the broadcast
    path (the cutover in resolve_edges switches here automatically)."""
    keys = docs.select_columns(["conv_id", "turn_idx", "doc_id"]).map_batches(
        lambda b: pa.table({
            "dst_conv_id": b.column("conv_id"),
            "dst_turn_idx": b.column("turn_idx"),
            "dst_doc_id": b.column("doc_id"),
        }), batch_format="pyarrow")
    from ..util import hash_join
    joined = hash_join(edges, keys, "inner", num_partitions,
                       on=("dst_conv_id", "dst_turn_idx"))
    resolved = joined.map_batches(
        lambda b: b.select(["src_doc_id", "dst_doc_id"]),
        batch_format="pyarrow")
    from ..util import coalesce_blocks
    return coalesce_blocks(
        resolved.groupby(["src_doc_id", "dst_doc_id"]).aggregate(
            Count()).drop_columns(["count()"]))


def inlink_counts(resolved: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, inlink_count) = groupby(dst).count() (pagerank.py:26-27)."""
    from ..util import coalesce_blocks
    return coalesce_blocks(
        resolved.groupby("dst_doc_id").aggregate(Count()).map_batches(
            lambda b: pa.table({"doc_id": b.column("dst_doc_id"),
                                "inlink_count": b.column("count()")}),
            batch_format="pyarrow"))


def _out_degrees(edges: "ray.data.Dataset", num_nodes: int) -> np.ndarray:
    """Distributed out-degree: per-batch partial bincount -> tiny groupby sum;
    only the aggregated (src, deg) result — O(nodes with outlinks), never the
    edge table — reaches the driver."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src_doc_id").to_numpy(zero_copy_only=False)
        ids, counts = np.unique(src, return_counts=True)
        return pa.table({"src_doc_id": pa.array(ids, pa.int64()),
                         "deg": pa.array(counts.astype(np.int64))})

    agg = edges.map_batches(partial, batch_format="pyarrow").groupby(
        "src_doc_id").aggregate(Sum("deg"))
    out_deg = np.zeros(num_nodes, dtype=np.int64)
    for batch in agg.iter_batches(batch_format="pyarrow"):
        out_deg[batch.column("src_doc_id").to_numpy(zero_copy_only=False)] = \
            batch.column("sum(deg)").to_numpy(zero_copy_only=False)
    return out_deg


# Beyond this many nodes the dense driver-held rank vector is replaced by the
# fully distributed rank-as-Dataset join path (pagerank_dataset).
MAX_DENSE_NODES = 50_000_000


def pagerank(resolved: "ray.data.Dataset", num_nodes: int, *,
             damping: float = DAMPING, iterations: int = ITERATIONS,
             max_dense_nodes: int = MAX_DENSE_NODES) -> np.ndarray:
    """PageRank over doc_ids 0..num_nodes-1, reference loop semantics
    (pagerank.py:29-38): dangling mass NOT redistributed, unknown endpoints
    dropped (resolution already guarantees known endpoints).

    Small graphs use the dense broadcast-vector fast path; beyond
    ``max_dense_nodes`` the rank vector itself becomes a Dataset and every
    step is a distributed join/aggregate (pagerank_dataset) — property-tested
    equal to the dense path."""
    if num_nodes == 0:
        return np.zeros(0)
    if num_nodes > max_dense_nodes:
        ranks_ds = pagerank_dataset(resolved, num_nodes, damping=damping,
                                    iterations=iterations)
        out = np.zeros(num_nodes)
        for batch in ranks_ds.iter_batches(batch_format="pyarrow"):
            out[batch.column("doc_id").to_numpy(zero_copy_only=False)] = \
                batch.column("pagerank").to_numpy(zero_copy_only=False)
        return out

    edges = resolved.materialize()   # reused every iteration; edge list only
    out_deg = _out_degrees(edges, num_nodes)

    pr = np.full(num_nodes, 1.0 / num_nodes)
    base = (1.0 - damping) / num_nodes
    # out-degrees never change: one object-store copy for all iterations
    # (inside the loop this was iterations x ~8B/node of store writes)
    deg_ref = ray.put(out_deg)
    for _ in range(iterations):
        ref = ray.put(pr)

        def contribs(batch: pa.Table, *, _ref=ref, _dref=deg_ref) -> pa.Table:
            ranks = ray.get(_ref)
            degs = ray.get(_dref)
            src = batch.column("src_doc_id").to_numpy(zero_copy_only=False)
            dst = batch.column("dst_doc_id").to_numpy(zero_copy_only=False)
            share = damping * ranks[src] / degs[src]
            # vectorized per-batch partial aggregation before the shuffle
            ids, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(len(ids))
            np.add.at(sums, inv, share)
            return pa.table({
                "dst_doc_id": pa.array(ids, pa.int64()),
                "contrib": pa.array(sums, pa.float64()),
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


def pagerank_dataset(resolved: "ray.data.Dataset", num_nodes: int, *,
                     damping: float = DAMPING, iterations: int = ITERATIONS,
                     num_partitions: int | None = None) -> "ray.data.Dataset":
    """Fully distributed PageRank: the rank vector IS a Dataset (doc_id,
    pagerank); every step is a hash join / groupby-aggregate — no dense
    driver-held vector, no full-table driver iteration.  Same semantics as
    the dense path (property-tested equal).

    Per iteration: edges⋈deg (built once) ⋈ ranks on src -> per-batch
    vectorized contribution partials -> groupby(dst).sum -> left-outer join
    back onto the node list so rank = base + damping·Σ contrib (nodes with no
    inlinks keep base).  Ranks are materialized each iteration to keep the
    lineage flat (20 chained joins would otherwise re-execute on consume).

    ``num_partitions`` defaults to ~1 per 100k nodes (each join spawns that
    many hash-shuffle aggregator actors PER ITERATION — at small scale the
    actor startup dominates, at 10^12 nodes you want thousands)."""
    from ray.data.aggregate import Sum

    if num_partitions is None:
        num_partitions = max(2, min(1024, num_nodes // 100_000))
    edges = resolved

    def deg_partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src_doc_id").to_numpy(zero_copy_only=False)
        ids, counts = np.unique(src, return_counts=True)
        return pa.table({"src_doc_id": pa.array(ids, pa.int64()),
                         "deg": pa.array(counts.astype(np.int64))})

    from ..util import coalesce_blocks
    deg = coalesce_blocks(edges.map_batches(
        deg_partial, batch_format="pyarrow").groupby(
        "src_doc_id").aggregate(Sum("deg")).map_batches(
        lambda b: pa.table({"deg_src": b.column("src_doc_id"),
                            "out_deg": b.column("sum(deg)")}),
        batch_format="pyarrow"))
    from ..util import hash_join
    edges_deg = hash_join(edges, deg, "inner", num_partitions,
                          on=("src_doc_id",),
                          right_on=("deg_src",)).materialize()

    nodes = ray.data.range(num_nodes).map_batches(
        lambda b: pa.table({"doc_id": b.column("id").cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    ranks = nodes.map_batches(
        lambda b, _n=num_nodes: pa.table({
            "rank_id": b.column("doc_id"),
            "rank": pa.array(np.full(b.num_rows, 1.0 / _n))}),
        batch_format="pyarrow").materialize()

    base = (1.0 - damping) / num_nodes
    for _ in range(iterations):
        joined = hash_join(edges_deg, ranks, "inner", num_partitions,
                           on=("src_doc_id",), right_on=("rank_id",))

        def contribs(batch: pa.Table) -> pa.Table:
            dst = batch.column("dst_doc_id").to_numpy(zero_copy_only=False)
            r = batch.column("rank").to_numpy(zero_copy_only=False)
            d = batch.column("out_deg").to_numpy(zero_copy_only=False)
            share = damping * r / d
            ids, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(len(ids))
            np.add.at(sums, inv, share)
            return pa.table({"dst_doc_id": pa.array(ids, pa.int64()),
                             "contrib": pa.array(sums)})

        summed = coalesce_blocks(
            joined.map_batches(contribs, batch_format="pyarrow").groupby(
                "dst_doc_id").aggregate(Sum("contrib")))
        merged = hash_join(nodes, summed, "left_outer", num_partitions,
                           on=("doc_id",), right_on=("dst_doc_id",))
        ranks = merged.map_batches(
            lambda b, _base=base: pa.table({
                "rank_id": b.column("doc_id"),
                "rank": pc.add(pc.coalesce(b.column("sum(contrib)"),
                                           pa.scalar(0.0)), _base),
            }), batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda b: pa.table({"doc_id": b.column("rank_id"),
                            "pagerank": b.column("rank")}),
        batch_format="pyarrow")


def _scatter_sum_int(edges: "ray.data.Dataset", vec_ref, num_nodes: int,
                     *, gather_col: str, scatter_col: str) -> np.ndarray:
    """One HITS half-step: out[scatter] += vec[gather] over the edge table.

    Distributed the same way as the dense-pagerank step: per-batch
    vectorized partials (np.unique + add.at) -> groupby sum; only the
    aggregated (node, sum) rows reach the driver.  Integer throughout."""
    from ray.data.aggregate import Sum

    def contribs(batch: pa.Table, *, _ref=vec_ref) -> pa.Table:
        vec = ray.get(_ref)
        g = batch.column(gather_col).to_numpy(zero_copy_only=False)
        s = batch.column(scatter_col).to_numpy(zero_copy_only=False)
        ids, inv = np.unique(s, return_inverse=True)
        sums = np.zeros(len(ids), dtype=np.int64)
        np.add.at(sums, inv, vec[g])
        return pa.table({"node": pa.array(ids, pa.int64()),
                         "contrib": pa.array(sums, pa.int64())})

    summed = edges.map_batches(contribs, batch_format="pyarrow").groupby(
        "node").aggregate(Sum("contrib"))
    out = np.zeros(num_nodes, dtype=np.int64)
    for batch in summed.iter_batches(batch_format="pyarrow"):
        ids = batch.column("node").to_numpy(zero_copy_only=False)
        vals = batch.column("sum(contrib)").to_numpy(zero_copy_only=False)
        out[ids] += vals
    return out


def hits(resolved: "ray.data.Dataset", num_nodes: int, *,
         iterations: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """HITS hubs/authorities (Kleinberg 1999) over doc_ids 0..num_nodes-1,
    UNNORMALIZED INTEGER iteration:

        a_0 = 1;  h_{k+1}(u) = Σ_{u→v} a_k(v);  a_{k+1}(v) = Σ_{u→v} h_{k+1}(u)

    Omitting the per-iteration scalar normalization keeps every value an
    exact int64 (rankings are unchanged — normalization divides all scores
    by one scalar), which makes the driver's DuckDB mirror hash-exact with
    zero float discipline.  Magnitudes grow ~λ(AᵀA)^k; with the synthetic
    entry graph λ≈9, so iterations ≤ 15 stays far inside int64.  Score
    vectors are dense driver-held broadcasts (2×8B/node — same budget as
    dense pagerank); the edge table never leaves the cluster, each
    half-step is the pagerank contribution pattern (per-batch partials +
    groupby sum).  Beyond ``MAX_DENSE_NODES`` compose the rank-as-Dataset
    join rounds exactly as ``pagerank_dataset`` does — each half-step is
    the same edges⋈scores groupby-aggregate.

    Returns (hub, auth) int64 arrays after ``iterations`` full rounds."""
    if num_nodes == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    edges = resolved.materialize()
    auth = np.ones(num_nodes, dtype=np.int64)
    hub = np.zeros(num_nodes, dtype=np.int64)
    for _ in range(iterations):
        hub = _scatter_sum_int(edges, ray.put(auth), num_nodes,
                               gather_col="dst_doc_id",
                               scatter_col="src_doc_id")
        auth = _scatter_sum_int(edges, ray.put(hub), num_nodes,
                                gather_col="src_doc_id",
                                scatter_col="dst_doc_id")
    return hub, auth
