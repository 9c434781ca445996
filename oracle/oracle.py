"""Single-process oracle: deliberately naive reimplementation of the
reference semantics (SURVEY.md §5.1) used as the golden model for the Ray
engine.

No Ray, no Arrow tricks, no compression: plain dicts and sorted() over the
whole corpus.  Scalar semantics (tokenizer, idf, scoring constants, intent
table) come from the same pinned pure functions the engine uses
(search_engine_ray.functions) — what this oracle independently re-executes is
everything the DISTRIBUTED machinery could get wrong: doc-id assignment,
grouping, posting construction, stats, candidate selection, tie-breaks,
paging, dedup grouping, graph degrees, PageRank mass distribution, and the
spellcheck dictionary merge.

Reference anchors:
  stage-1 scoring /root/reference/app/api/search_service.py:13-40
  stage-2 re-rank :174-262 ; candidate_limit :236-239
  idf /root/reference/app/batch/bm25_stats.py:21
  pagerank /root/reference/app/batch/pagerank.py:19-38
  dictionary merge /root/reference/app/batch/spellcheck_dictionary.py:171-200
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow as pa

from search_engine_ray.functions.text import (DEFAULT_FIELD_WEIGHT, bm25_score,
                                              idf as idf_fn, intent_score,
                                              search_context, tokenize)


class OracleIndex:
    def __init__(self, transcripts: pa.Table, *, scoring: str = "reference",
                 k1: float = 1.2, b: float = 0.75):
        self.scoring = scoring
        self.k1, self.b = k1, b
        rows = transcripts.to_pylist()
        rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
        self.rows = rows                      # doc_id == list position
        self.doc_total = len(rows) if rows else 1

        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.doc_len: list[int] = []
        total_tokens = 0
        for doc_id, row in enumerate(rows):
            counts = tokenize(row["text"])
            dl = sum(counts.values())
            self.doc_len.append(dl)
            total_tokens += dl
            for term, tf in counts.items():
                self.postings[term][doc_id] = tf
        self.avgdl = total_tokens / len(rows) if rows else 0.0
        self.df = {t: len(p) for t, p in self.postings.items()}
        self.cf = {t: sum(p.values()) for t, p in self.postings.items()}
        self.idf = {t: idf_fn(self.doc_total, df) for t, df in self.df.items()}

    # -- query -------------------------------------------------------------

    def candidates(self, q: str, *, limit: int = 20, offset: int = 0):
        ctx = search_context(q, limit, offset)
        if ctx is None:
            return None
        scores: dict[int, float] = {}
        matched: dict[int, int] = {}
        for term in sorted(set(ctx["query_terms"])):
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf[term]
            for doc_id, tf in plist.items():
                if self.scoring == "bm25":
                    contrib = bm25_score(tf, idf, self.doc_len[doc_id],
                                         self.avgdl, self.k1, self.b)
                else:
                    contrib = tf * idf * DEFAULT_FIELD_WEIGHT
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
                matched[doc_id] = matched.get(doc_id, 0) + 1
        ordered = sorted(scores.keys(), key=lambda d: (-scores[d], d))
        cl = ctx["candidate_limit"]
        return ([(d, scores[d], matched[d]) for d in ordered[:cl]], ctx)

    def search(self, q: str, *, limit: int = 20, offset: int = 0,
               intent_bias: float = 0.0) -> list[dict]:
        res = self.candidates(q, limit=limit, offset=offset)
        if res is None:
            return []
        cands, ctx = res
        ranked = []
        for doc_id, token_score, matched_terms in cands:
            row = self.rows[doc_id]
            url = f"{row['conv_id']}#{row['turn_idx']}"
            score = intent_score(
                token_score=token_score, matched_terms=matched_terms,
                total_terms=ctx["total_terms"],
                query_phrase=ctx["query_phrase"],
                query_compact=ctx["query_compact"],
                query_words=ctx["query_words"],
                title=row["tool"] or "", description=row["text"] or "",
                url=url) + intent_bias
            ranked.append({
                "conv_id": row["conv_id"], "turn_idx": row["turn_idx"],
                "role": row["role"], "tool": row["tool"], "url": url,
                "score": score, "token_score": token_score,
                "matched_terms": matched_terms,
            })
        ranked.sort(key=lambda r: (-r["score"], r["url"]))
        return ranked[offset:offset + limit]


def oracle_pagerank(nodes: list[int], edges: list[tuple[int, int]],
                    damping: float = 0.85, iterations: int = 20
                    ) -> tuple[dict[int, float], dict[int, int]]:
    """Naive PageRank, reference loop semantics
    (/root/reference/app/batch/pagerank.py:19-38): edges whose endpoints are
    unknown are dropped; dangling mass is NOT redistributed."""
    n = len(nodes)
    if n == 0:
        return {}, {}
    node_set = set(nodes)
    outgoing: dict[int, list[int]] = defaultdict(list)
    inlinks: dict[int, int] = defaultdict(int)
    for s, t in edges:
        if s in node_set and t in node_set:
            outgoing[s].append(t)
            inlinks[t] += 1
    pr = {node: 1.0 / n for node in nodes}
    for _ in range(iterations):
        new_pr = {node: (1 - damping) / n for node in nodes}
        for node in nodes:
            targets = outgoing[node]
            if targets:
                share = damping * pr[node] / len(targets)
                for t in targets:
                    new_pr[t] += share
        pr = new_pr
    return pr, {node: inlinks.get(node, 0) for node in nodes}


def oracle_word_counts(texts: list[str]) -> Counter:
    """[a-z]{2,32} word totals (spellcheck A4,
    /root/reference/app/batch/spellcheck_dictionary.py:125-147)."""
    import re
    word_re = re.compile(r"[a-z]{2,32}")
    counts: Counter = Counter()
    for text in texts:
        counts.update(word_re.findall((text or "").lower()))
    return counts
