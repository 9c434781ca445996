"""In-memory phrase query engine over a positional index (serving side).

The distributed ``stages.positions.phrase_match`` path launches a Dataset
per query — right for corpus-wide analytics, wrong for a serving endpoint
that wants milliseconds.  ``PhraseEngine`` loads the positional index's
bucket files into one posting map (term -> sorted doc array + position
buffers) at construction and answers phrase queries with the SAME shared
core (``match_one_phrase``) in-process.

Sharding story (mirrors ``state/sharded.ShardedQueryEngine``): buckets ARE
doc ranges, so a shard actor holding a bucket subset answers phrases for
its range independently and a fan-out client unions + re-sorts — pass
``buckets`` to slice.  Memory is the index slice itself (~postings volume
for the held ranges).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from ..stages.positions import (_tombstone_filter, load_manifest,
                                match_one_phrase,
                                postings_map_from_sorted,
                                proximity_pair_core, tokenize_positions)


class PhraseEngine:
    def __init__(self, index_dir: str, *, buckets: list[int] | None = None):
        manifest = load_manifest(index_dir)
        want = None if buckets is None else set(buckets)
        # same tombstone mask as the distributed positional readers: a
        # FUSED artifact inherits its parent index's recrawl tombstones, so
        # serving phrase()/near() must drop the same doc ids phrase_match
        # and the BM25 engine drop
        tomb = _tombstone_filter(index_dir)
        terms: list[str] = []
        doc_parts: list[np.ndarray] = []
        npos_parts: list[np.ndarray] = []
        bufs: list[bytes] = []
        for path in sorted(manifest["files"]):
            if want is not None:
                b = int(path.split("-")[1].split(".")[0])
                if b not in want:
                    continue
            t = pq.read_table(os.path.join(index_dir, path),
                              columns=["term", "doc_id", "npos", "pos_buf"])
            if tomb is not None:
                t = tomb(t)
            terms.extend(t.column("term").to_pylist())
            doc_parts.append(
                t.column("doc_id").to_numpy(zero_copy_only=False))
            npos_parts.append(
                t.column("npos").to_numpy(zero_copy_only=False))
            bufs.extend(t.column("pos_buf").to_pylist())
        doc_ids = (np.concatenate(doc_parts) if doc_parts
                   else np.empty(0, dtype=np.int64))
        npos = (np.concatenate(npos_parts) if npos_parts
                else np.empty(0, dtype=np.int64))
        # bucket files are (term, doc_id)-sorted but terms recur across
        # buckets: merge to one global (term, doc_id) order
        order = np.lexsort((doc_ids, np.asarray(terms, dtype="U")))
        terms = [terms[i] for i in order]
        doc_ids = doc_ids[order]
        npos = npos[order]
        bufs = [bufs[i] for i in order]
        self._by_term = postings_map_from_sorted(terms, doc_ids, bufs, npos)
        self.num_rows = len(terms)

    def phrase(self, text: str, *, limit: int = 10) -> list[dict]:
        """Top-``limit`` docs containing the exact token sequence, ordered
        by (n_matches DESC, doc_id ASC)."""
        toks = tokenize_positions(text)
        hits = match_one_phrase(self._by_term, toks)
        hits.sort(key=lambda r: (-r[1], r[0]))
        return [{"doc_id": d, "n_matches": c} for d, c in hits[:limit]]

    def near(self, term_a: str, term_b: str, *, max_dist: int = 4,
             limit: int = 10) -> list[dict]:
        """NEAR/n serving query: top-``limit`` docs where the two surface
        terms occur within ``max_dist`` token positions, ordered by
        (min_dist ASC, doc_id ASC) — the same vectorized kernel as the
        distributed ``pair_proximity`` path (they cannot drift)."""
        ta = tokenize_positions(term_a)
        tb = tokenize_positions(term_b)
        if len(ta) != 1 or len(tb) != 1:
            return []
        hits = proximity_pair_core(self._by_term, ta[0], tb[0], max_dist)
        hits.sort(key=lambda r: (r[1], r[0]))
        return [{"doc_id": d, "min_dist": m} for d, m in hits[:limit]]
