"""ShardedQueryEngine: N query actors, each owning a contiguous doc-id
range, with a driver-side top-k merge — the multi-node serving shape the
QueryEngine docstring promises (state/query_engine.py "Scale notes").

Each shard runs the same deterministic stage-1 accumulation restricted to
its [lo, hi) range and returns its local top-``candidate_limit`` rows WITH
doc metadata, so the merge + stage-2 intent re-rank needs no further index
access.  Because per-doc scores are independent of sharding (same sorted
term order, same per-element float ops), the merged global top-cl equals the
single-engine top-cl — property-tested rank identity in
tests/test_build_and_search.py.

Shards load only their doc-range SLICE of every posting list: blocks are
independently decodable (delta restarts per block), so each shard keeps the
block range intersecting [lo, hi) plus range-filtered doclens and doc
metadata (parquet predicate pushdown).  Per-shard resident bytes therefore
scale with 1/num_shards of the corpus, not the corpus — property-tested in
tests/test_build_and_search.py (per-shard loaded_postings_bytes < 60% of the
single-engine load at 2 shards, rank identity preserved).
"""

from __future__ import annotations

import ray

from ..functions.text import intent_score, search_context
from ..stages.stats import read_stats
from .query_engine import QueryEngine, fallback_page


@ray.remote
class _ShardActor:
    """Query shard owning doc ids [lo, hi); index loaded once in __init__."""

    def __init__(self, index_dir: str, lo: int, hi: int, *,
                 scoring: str = "reference", k1: float = 1.2,
                 b: float = 0.75):
        # range-sliced load: only the blocks/doclens/doc-meta intersecting
        # [lo, hi) become resident (see QueryEngine doc_range) — per-shard
        # memory scales with the range fraction, not the corpus.
        # eager=True: serving actors are LONG-LIVED; paying the slice load
        # in __init__ keeps first-query latency warm (the lazy default is
        # for cold tooling/driver paths where start-up dominates)
        self._eng = QueryEngine(index_dir, scoring=scoring, k1=k1, b=b,
                                doc_range=(lo, hi), eager=True)
        self._lo, self._hi = lo, hi

    def loaded_postings_bytes(self) -> int:
        return self._eng.loaded_postings_bytes()

    def facet_range(self, sorted_terms: list[str],
                    fields: tuple[str, ...]) -> tuple[dict, int]:
        """Partial facet map for this shard's doc range — the coordinator
        sums value counts across shards (ranges are disjoint, so the merge
        is exact)."""
        return self._eng.facet_counts_terms(sorted_terms, fields=fields)

    def score_range(self, sorted_terms: list[str], cl: int,
                    ctx: dict | None = None) -> tuple[bool, list[tuple]]:
        """(ok, local top-cl rows) within this shard's range; rows carry
        (doc_id, token_score, matched, conv_id, turn_idx, role, tool, text
        [, intent]).  When ``ctx`` (query_phrase/query_compact/query_words/
        total_terms/intent_bias) is given, the stage-2 intent score is
        computed HERE, in the shard actor — the per-candidate Python scoring
        loop was the serving client's GIL bottleneck (~7 ms serialized per
        query at cl=220 capped the 8-thread QPS bench near 100); in the
        actors it parallelizes across shards and leaves the client a trivial
        merge.  ok=False signals a doc-meta decode failure — the rows then
        carry stage-1 triples only, and the driver degrades the WHOLE query
        to the reference's encoding-error fallback page
        (search_service.py:321)."""
        # no doc_range re-mask: the engine was built range-sliced, so its
        # postings() already clips boundary blocks to [lo, hi) — passing
        # doc_range again would recompute an all-true mask per query
        rows = self._eng.score_terms(sorted_terms, candidate_limit=cl)
        out = []
        try:
            metas = self._eng.doc_meta_many([r[0] for r in rows])
            for (doc_id, score, matched), meta in zip(rows, metas):
                row = [doc_id, score, matched, meta["conv_id"],
                       meta["turn_idx"], meta["role"], meta["tool"],
                       meta["text"]]
                if ctx is not None:
                    url = f"{meta['conv_id']}#{meta['turn_idx']}"
                    row.append(intent_score(
                        token_score=score, matched_terms=matched,
                        total_terms=ctx["total_terms"],
                        query_phrase=ctx["query_phrase"],
                        query_compact=ctx["query_compact"],
                        query_words=ctx["query_words"],
                        title=meta["tool"] or "",
                        description=meta["text"] or "",
                        url=url) + ctx.get("intent_bias", 0.0))
                out.append(tuple(row))
        except UnicodeDecodeError:
            return False, [(d, s, m) for d, s, m in rows]
        return True, out


class ShardedQueryEngine:
    """Facade: fan a query out to shard actors, merge stage-1 candidates,
    apply the identical stage-2 intent re-rank.  API mirrors
    QueryEngine.search."""

    def __init__(self, index_dir: str, *, num_shards: int = 2,
                 num_replicas: int = 1, scoring: str = "reference",
                 k1: float = 1.2, b: float = 0.75):
        """``num_shards`` partitions the corpus (per-actor memory = its
        doc-range slice); ``num_replicas`` adds identical actors per range
        for query THROUGHPUT — each shard actor is single-threaded, so a
        query costs ~num_shards actor-call-milliseconds and total QPS caps
        at (actors / per-call ms).  Queries pick a replica row round-robin;
        results are replica-independent (same slice, same floats)."""
        import itertools
        n = int(read_stats(index_dir)["doc_total"])
        bounds = [round(i * n / num_shards) for i in range(num_shards + 1)]
        self._replicas = [
            [_ShardActor.remote(index_dir, bounds[i], bounds[i + 1],
                                scoring=scoring, k1=k1, b=b)
             for i in range(num_shards)]
            for _ in range(max(1, num_replicas))
        ]
        self._rr = itertools.count()          # thread-safe round-robin
        self._actors = self._replicas[0]      # back-compat (tests poke it)

    def search(self, q: str, *, limit: int = 20, offset: int = 0,
               intent_bias: float = 0.0) -> list[dict]:
        return self.search_with_count(q, limit=limit, offset=offset,
                                      intent_bias=intent_bias)[0]

    def search_with_count(self, q: str, *, limit: int = 20, offset: int = 0,
                          intent_bias: float = 0.0
                          ) -> tuple[list[dict], int]:
        """(page, count), count as in QueryEngine.search_with_count —
        len(ranked) here is the post-cut candidate list, identical to the
        single engine's (each shard returns its full local top-cl)."""
        if not self._actors:
            raise RuntimeError("ShardedQueryEngine is shut down")
        ctx = search_context(q, limit, offset)
        if ctx is None:
            return [], 0
        cl = ctx["candidate_limit"]
        terms = sorted(set(ctx["query_terms"]))
        shard_ctx = {"total_terms": ctx["total_terms"],
                     "query_phrase": ctx["query_phrase"],
                     "query_compact": ctx["query_compact"],
                     "query_words": ctx["query_words"],
                     "intent_bias": intent_bias}
        row = self._replicas[next(self._rr) % len(self._replicas)] \
            if len(self._replicas) > 1 else self._actors
        futs = [a.score_range.remote(terms, cl, shard_ctx) for a in row]
        parts = ray.get(futs)
        if not all(ok for ok, _ in parts):
            # any shard hit a doc-meta decode error -> whole query degrades
            # (reference re-runs the titleless fallback SQL for the full
            # candidate set, search_service.py:321-338)
            triples = [r[:3] for _, part in parts for r in part]
            triples.sort(key=lambda r: (-r[1], r[0]))
            triples = triples[:cl]
            page = fallback_page(triples, ctx, limit=limit, offset=offset)
            return page, max(len(triples), offset + len(page))
        rows = [r for _, part in parts for r in part]
        # global stage-1 order: (score DESC, doc_id ASC); each shard returned
        # its full local top-cl, so the global top-cl is contained in rows.
        # Intent scores were computed per candidate in the shard actors; the
        # candidate CUT still happens here, on the stage-1 key, so semantics
        # equal the single engine (top-cl by stage-1, then intent re-rank).
        rows.sort(key=lambda r: (-r[1], r[0]))
        rows = rows[:cl]
        ranked = []
        for doc_id, token_score, matched, conv_id, turn_idx, role, tool, \
                text, score in rows:
            ranked.append({
                "conv_id": conv_id, "turn_idx": turn_idx, "role": role,
                "tool": tool, "text": text,
                "url": f"{conv_id}#{turn_idx}", "score": score,
                "token_score": token_score, "matched_terms": matched,
            })
        ranked.sort(key=lambda r: (-r["score"], r["url"]))
        page = ranked[offset:offset + limit]
        return page, max(len(ranked), offset + len(page))

    def facet_counts(self, q: str, *,
                     fields: tuple[str, ...] = ("role", "tool")
                     ) -> tuple[dict, int]:
        """Distributed facet aggregation: each shard counts its disjoint
        doc-range's matched facet values (vectorized, actor-side), the
        coordinator sums the partial maps.  Identical to the single
        engine's facet_counts by construction (disjoint-range sum)."""
        if not self._actors:
            raise RuntimeError("ShardedQueryEngine is shut down")
        ctx = search_context(q, 1, 0)
        if ctx is None:
            return {f: {} for f in fields}, 0
        terms = sorted(set(ctx["query_terms"]))
        row = self._replicas[next(self._rr) % len(self._replicas)] \
            if len(self._replicas) > 1 else self._actors
        futs = [a.facet_range.remote(terms, tuple(fields)) for a in row]
        merged: dict = {f: {} for f in fields}
        total = 0
        for part, n in ray.get(futs):
            total += n
            for f, m in part.items():
                bucket = merged[f]
                for v, c in m.items():
                    bucket[v] = bucket.get(v, 0) + c
        return merged, total

    def shutdown(self) -> None:
        for row in self._replicas:
            for a in row:
                ray.kill(a)
        # leave no live rows behind: a post-shutdown search raises instead
        # of silently returning [] from a zero-actor fan-out
        self._replicas = []
        self._actors = []
