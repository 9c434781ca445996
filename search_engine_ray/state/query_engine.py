"""QueryEngine: long-lived query-side state over built index artifacts.

Replaces the reference's Postgres query path
(/root/reference/app/api/search_service.py:13-40 SEARCH_SQL + :242-262
re-rank): stage 1 traverses posting lists accumulating
Σ tf·idf·field_weight per doc plus a matched-terms count, takes the top
``candidate_limit`` by (score DESC, doc_id ASC); stage 2 applies the exact
intent-score constant table and re-sorts by (-score, doc_key), then pages.

Field mapping for transcript docs (SURVEY.md §1.4: single body field, weight
1.0): intent-score title := ``tool``, description := ``text``,
url := ``"{conv_id}#{turn_idx}"`` (the natural doc key plays the reference's
url role).  Stage-1 candidate truncation tie-breaks on doc_id ASC, which
equals the reference's ``ORDER BY url ASC`` for corpora with <10 turns per
conversation (the documents-derived driver corpus uses 8); at 10+ turns the
url STRING sorts 'conv#10' before 'conv#2', so a score tie exactly at the
candidate_limit boundary could pick a different candidate set than the
reference — stage-2's final (-score, url) sort is unaffected.

Determinism: per-doc stage-1 scores accumulate per query term in sorted term
order, float64 — the oracle sums in the same order, so scores are bit-equal.

Scoring modes: ``reference`` = tf·idf·field_weight exactly as the reference
(no length norm — SURVEY.md §1.3); ``bm25`` = true BM25(k1, b) with doc-length
normalization, the engine's native scorer.

Algorithms (public literature): WAND pivot skipping follows Broder et al.,
"Efficient Query Evaluation using a Two-Level Retrieval Process" (CIKM 2003);
the per-block max metadata + block skip pointer movement follows Ding & Suel,
"Faster Top-k Document Retrieval Using Block-Max Indexes" (SIGIR 2011); BM25
is Robertson-Sparck Jones with the k1/b saturation form.

Scale notes: per-query accumulation uses dense float64 arrays over N docs —
right for a per-node shard of the corpus (query actors each own a doc-id
range and a top-k merge combines shards); block-max WAND pruning
(``use_wand=True``) bounds per-term contributions so most blocks of rare-term
lists are skipped without decoding.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..functions.text import (DEFAULT_FIELD_WEIGHT,
                              fallback_score, idf as idf_fn, intent_score,
                              search_context)
import bisect

from ..functions.varbyte import decode_block, decode_postings_blocked
from ..stages.stats import read_stats


def fallback_page(cands: list[tuple[int, float, int]], ctx: dict, *,
                  limit: int, offset: int) -> list[dict]:
    """Degraded result page mirroring the reference's encoding-error retry
    (/root/reference/app/api/search_service.py:321-338): when stage-2 doc
    metadata cannot be decoded, re-rank the stage-1 candidates on token
    features alone and emit rows with empty text fields.  Sort is stable on
    score DESC, so ties keep stage-1 (token_score DESC, doc_id ASC) order —
    same as the reference's ``list.sort(key=score, reverse=True)`` over
    SQL-ordered rows."""
    out = []
    for doc_id, token_score, matched_terms in cands:
        score = fallback_score(token_score=token_score,
                               matched_terms=matched_terms,
                               total_terms=ctx["total_terms"])
        out.append({
            "conv_id": "", "turn_idx": -1, "role": "", "tool": "",
            "text": "", "url": "", "score": score,
            "token_score": token_score, "matched_terms": matched_terms,
        })
    out.sort(key=lambda r: -r["score"])
    return out[offset:offset + limit]


class _TermIter:
    """Posting-list cursor with block-skip next_geq (decodes one block at a
    time using the stored per-block byte offsets)."""

    __slots__ = ("dbuf", "tbuf", "meta", "idf", "ub", "ub_blocks", "nblocks",
                 "b", "docs", "tfs", "pos", "cur_doc", "cur_tf")
    INF = 1 << 62

    def __init__(self, dbuf: bytes, tbuf: bytes, meta: dict, idf: float,
                 ub_blocks: np.ndarray):
        self.dbuf, self.tbuf, self.meta = dbuf, tbuf, meta
        self.idf = idf
        self.ub_blocks = ub_blocks          # per-block score upper bounds
        self.ub = float(ub_blocks.max())    # global upper bound
        self.nblocks = len(meta["last_doc"])
        self._load_block(0)

    def _load_block(self, b: int) -> None:
        self.b = b
        docs, tfs = decode_block(self.dbuf, self.tbuf, self.meta, b)
        self.docs = docs.astype(np.int64)
        self.tfs = tfs.astype(np.int64)
        self.pos = 0
        self.cur_doc = int(self.docs[0])
        self.cur_tf = int(self.tfs[0])

    def _exhaust(self) -> None:
        self.cur_doc = self.INF
        self.cur_tf = 0

    def advance(self) -> None:
        self.pos += 1
        if self.pos < len(self.docs):
            self.cur_doc = int(self.docs[self.pos])
            self.cur_tf = int(self.tfs[self.pos])
        elif self.b + 1 < self.nblocks:
            self._load_block(self.b + 1)
        else:
            self._exhaust()

    def next_geq(self, target: int) -> None:
        if self.cur_doc >= target:
            return
        nb = bisect.bisect_left(self.meta["last_doc"], target, lo=self.b)
        if nb >= self.nblocks:
            self._exhaust()
            return
        if nb != self.b:
            self._load_block(nb)
        pos = int(np.searchsorted(self.docs, target, side="left"))
        self.pos = pos
        self.cur_doc = int(self.docs[pos])
        self.cur_tf = int(self.tfs[pos])


class _LazyTermDict:
    """Mapping facade over the engine's term dictionary: keys (the full
    vocabulary) are known from the eager (term, df, cf) pass; a term's
    posting record (buffers + block meta) materializes on FIRST access via
    ``engine._materialize`` and is memoized.  Cold engine start therefore
    reads ~vocabulary bytes, not corpus postings bytes."""

    __slots__ = ("_eng",)

    def __init__(self, eng):
        self._eng = eng

    def __contains__(self, term):
        return term in self._eng._locators

    def __iter__(self):
        return iter(self._eng._locators)

    def __len__(self):
        return len(self._eng._locators)

    def keys(self):
        return self._eng._locators.keys()

    def __getitem__(self, term):
        rec = self._eng._records.get(term)
        if rec is None:
            if term not in self._eng._locators:
                raise KeyError(term)
            rec = self._eng._materialize(term)
        return rec

    def get(self, term, default=None):
        rec = self._eng._records.get(term)
        if rec is None:
            if term not in self._eng._locators:
                return default
            rec = self._eng._materialize(term)
        return rec

    def values(self):
        return (self[t] for t in self)

    def items(self):
        return ((t, self[t]) for t in self)


class QueryEngine:
    def __init__(self, index_dir: str, *, scoring: str = "reference",
                 k1: float = 1.2, b: float = 0.75, load_docs: bool = True,
                 doc_range: tuple[int, int] | None = None,
                 eager: bool = False):
        """``doc_range=(lo, hi)``: range-sliced serving load.  Blocks are
        independently decodable (delta restarts per block,
        functions/varbyte.py encode_postings_blocked), so a shard keeps only
        each term's blocks intersecting [lo, hi) — per-shard resident bytes
        scale with the range fraction, not the corpus (the reference has no
        analogue: Postgres is one shared B-tree index).  df/cf/idf stay
        GLOBAL (scores must equal the full engine's); boundary blocks may
        carry a few out-of-range postings, filtered at decode."""
        self.index_dir = index_dir
        self.scoring = scoring
        self.k1, self.b = k1, b
        stats = read_stats(index_dir)
        self.doc_total = int(stats["doc_total"])
        self.avgdl = float(stats["avgdl"])
        self._range = doc_range
        self._base, range_hi = doc_range if doc_range is not None \
            else (0, self.doc_total)
        self._n_local = max(range_hi - self._base, 0)
        self._range_hi = range_hi

        # term dictionary: term -> (df, cf, idf, doc_buf, tf_buf, block_meta)
        # LAZY by default: the eager pass reads only the (term, df, cf)
        # columns of every segment file — vocabulary-sized, so cold start is
        # ~10x faster than decompressing all posting buffers — and records
        # per-term (file, row) locators.  A term's buffers + block meta load
        # on FIRST access (row-group-pruned term-filtered read; segments are
        # term-sorted with 32-row groups) and memoize.  ``eager=True``
        # restores the all-resident load (serving shards that want warm
        # latency + the resident-bytes evidence tests).
        #
        # df/cf accumulate over ALL of a term's chunks — including chunks
        # whose postings lie entirely outside this shard's doc range (the
        # range slicing happens at materialization).  With range_splits > 1
        # a term's global df is split across rb-chunk files; dropping
        # out-of-range chunks from the df sum would give each shard a
        # partial df and an inflated idf, breaking the invariant that
        # sharded scores equal the full engine's.
        self._records: dict[str, tuple] = {}
        self._locators: dict[str, list[tuple[int, int]]] = {}
        self._seg_files = sorted(glob.glob(
            os.path.join(index_dir, "segments", "segment-p*.parquet")))
        df_glob: dict[str, int] = {}
        cf_glob: dict[str, int] = {}
        # parallel footer+column reads: per-file pq.read_table fixed cost
        # (~5-15 ms) dominates the vocabulary pass at 100+ segment files;
        # pyarrow releases the GIL, so a thread pool turns 256 serial reads
        # into ~wall/16 (eager mode reads the FULL tables here once and
        # reuses them below — no second pass)
        from concurrent.futures import ThreadPoolExecutor
        # Legacy-layout guard: lazy per-term materialization relies on
        # row-group pruning over term-sorted 32-row groups; a segment file
        # written before that layout (one coarse row group) would make
        # every term-filtered read decompress ~the whole file, repeatedly.
        # Detect it once and load eagerly instead (the pre-lazy behavior).
        if not eager and self._seg_files:
            md = pq.read_metadata(self._seg_files[0])
            if md.num_row_groups <= 1 and md.num_rows > 64:
                eager = True
        # Pass 1 (always): vocabulary columns only — df/cf MUST be complete
        # over every file before ANY record is built (a doc-range shard's
        # record built mid-scan would miss df contributions from later
        # files whose chunks are out of this shard's range, inflating idf
        # — the sharded-vs-single score identity breaks).
        CHUNK = 16
        self._dict = _LazyTermDict(self)
        for c0 in range(0, len(self._seg_files), CHUNK):
            chunk_files = self._seg_files[c0:c0 + CHUNK]
            with ThreadPoolExecutor(min(16, len(chunk_files))) as ex:
                tables = list(ex.map(
                    lambda f: pq.read_table(
                        f, columns=["term", "df", "cf"]),
                    chunk_files))
            for off, t in enumerate(tables):
                fidx = c0 + off
                terms = t.column("term").to_pylist()
                dfs = t.column("df").to_pylist()
                cfs = t.column("cf").to_pylist()
                for i, term in enumerate(terms):
                    df_glob[term] = df_glob.get(term, 0) + dfs[i]
                    cf_glob[term] = cf_glob.get(term, 0) + cfs[i]
                    self._locators.setdefault(term, []).append((fidx, i))
        self._df_glob, self._cf_glob = df_glob, cf_glob
        if eager:
            # Pass 2: full tables, chunked so at most CHUNK segment tables
            # are transiently resident beside the records dict (unbounded
            # list(ex.map(...)) would double the postings volume per
            # engine, multiplied by co-located shard actors).  rb-ascending
            # file order preserved, so multi-chunk terms merge correctly.
            for c0 in range(0, len(self._seg_files), CHUNK):
                chunk_files = self._seg_files[c0:c0 + CHUNK]
                with ThreadPoolExecutor(min(16, len(chunk_files))) as ex:
                    tables = list(ex.map(pq.read_table, chunk_files))
                for t in tables:
                    self._materialize_from_table(t)

        # tombstone mask (delete support over immutable artifacts;
        # state/tombstones.py) — empty arrays when no deletes exist
        from .tombstones import load_tombstones
        self._tomb_lo, self._tomb_hi = load_tombstones(index_dir)

        # doc lengths (dense doc_id -> direct array indexing, rebased to the
        # range: local index = doc_id - base)
        rng_filters = None if doc_range is None else [
            ("doc_id", ">=", self._base), ("doc_id", "<", range_hi)]
        self._doc_len = np.zeros(self._n_local, dtype=np.int64)
        dl_dir = os.path.join(index_dir, "doclens")
        if os.path.isdir(dl_dir) and self._n_local:
            dl = pq.read_table(dl_dir, filters=rng_filters)
            ids = dl.column("doc_id").to_numpy(zero_copy_only=False)
            lens = dl.column("doc_len").to_numpy(zero_copy_only=False)
            self._doc_len[ids - self._base] = lens

        # doc metadata for stage-2 re-rank + result assembly (range mode
        # reads only this shard's row groups: parquet row-group pruning on
        # the doc_id filter).  LAZY like the postings: the store loads on
        # first doc_meta/facet access (Arrow string arrays, no per-row
        # Python conversion) so cold engine start reads ~vocabulary bytes;
        # eager engines preload for warm first-query latency.
        self._docs: dict | None = None
        self._docs_enabled = load_docs
        self._rng_filters = rng_filters
        if eager and load_docs:
            self._ensure_docs()

    def _ensure_docs(self) -> dict:
        """Load + doc_id-sort the doc store as ARROW arrays (string columns
        stay Arrow — ~10x faster than object-array conversion; doc_meta
        converts per ACCESSED row only)."""
        if self._docs is not None:
            return self._docs
        if not self._docs_enabled:
            raise RuntimeError(
                "doc_meta/search need document metadata but this engine "
                "was constructed with load_docs=False (stage-1 scoring "
                "only); rebuild it with load_docs=True")
        docs = pq.read_table(
            os.path.join(self.index_dir, "docs"),
            columns=["doc_id", "conv_id", "turn_idx", "role", "text",
                     "tool"],
            filters=self._rng_filters,
        )
        ids = docs.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        take = pa.array(order)
        self._docs = {
            name: docs.column(name).combine_chunks().take(take)
            for name in ("conv_id", "role", "text", "tool")
        }
        self._docs["turn_idx"] = docs.column("turn_idx").to_numpy(
            zero_copy_only=False)[order]
        return self._docs

    def _slice_chunk(self, dbuf, tbuf, bld, bmt, bdo, bto, bct):
        """Apply this engine's doc-range slice to one term chunk; returns
        the (possibly trimmed) chunk pieces or None when out of range."""
        range_hi = self._range_hi
        # blocks fully below lo have last_doc < lo; blocks after
        # the one containing hi-1 start past it (docs sorted)
        b0 = bisect.bisect_left(bld, self._base)
        b1 = min(bisect.bisect_left(bld, range_hi - 1) + 1, len(bld))
        if b0 >= b1:
            return None                          # no postings in range
        d0, d1 = bdo[b0], bdo[b1]
        t0, t1 = bto[b0], bto[b1]
        dbuf, tbuf = dbuf[d0:d1], tbuf[t0:t1]
        bld, bmt, bct = bld[b0:b1], bmt[b0:b1], bct[b0:b1]
        bdo = [x - d0 for x in bdo[b0:b1 + 1]]
        bto = [x - t0 for x in bto[b0:b1 + 1]]
        # boundary blocks can straddle the range: trim them by
        # decode -> filter -> re-encode so resident bytes equal
        # the TRUE range fraction (tail terms' single block would
        # otherwise stay fully resident in every shard).  Skipped
        # when the slice provably starts at 0 and ends in range.
        if self._base > 0 or bld[-1] > range_hi - 1:
            meta0 = {"last_doc": bld, "doc_off": bdo,
                     "tf_off": bto, "count": bct}
            d_all, t_all = decode_postings_blocked(dbuf, tbuf, meta0)
            keep = ((d_all >= np.uint64(self._base))
                    & (d_all < np.uint64(range_hi)))
            if not keep.any():
                return None
            if not keep.all():
                from ..functions.varbyte import encode_postings_blocked
                bs = max(bct) if bct else 128
                dbuf, tbuf, m2 = encode_postings_blocked(
                    d_all[keep], t_all[keep], bs)
                bld, bmt = m2["last_doc"], m2["max_tf"]
                bdo, bto = m2["doc_off"], m2["tf_off"]
                bct = m2["count"]
        return dbuf, tbuf, bld, bmt, bdo, bto, bct

    def _record_from_chunks(self, term: str, ch: list) -> tuple:
        """Merge a term's rb-ascending chunks into one record and memoize.

        Block starts are absolute (varbyte.py), so merging chunks is byte
        concat + block-offset shifts — no re-encode.  File-name order ==
        physical part order == rb-ascending per term."""
        if len(ch) == 1:
            dbuf, tbuf, bld, bmt, bdo, bto, bct = ch[0]
        else:
            dbuf = b"".join(c[0] for c in ch)
            tbuf = b"".join(c[1] for c in ch)
            bld, bmt, bct = [], [], []
            bdo, bto = [0], [0]
            d_base = t_base = 0
            for c in ch:
                bld.extend(c[2])
                bmt.extend(c[3])
                bct.extend(c[6])
                bdo.extend(x + d_base for x in c[4][1:])
                bto.extend(x + t_base for x in c[5][1:])
                d_base += len(c[0])
                t_base += len(c[1])
        meta = {"last_doc": bld, "max_tf": bmt,
                "doc_off": bdo, "tf_off": bto, "count": bct}
        # idf is recomputed from df + the LIVE corpus size: after an
        # incremental extend, stored idf values in untouched parts
        # reflect the N at their write time (stats.json is
        # authoritative; same float expression as build, so a clean
        # build's stored idf matches bit-for-bit)
        df_t = self._df_glob[term]
        rec = (df_t, self._cf_glob[term],
               idf_fn(self.doc_total, df_t), dbuf, tbuf, meta)
        self._records[term] = rec
        return rec

    def _chunks_from_rows(self, t: "pa.Table", out: dict) -> None:
        """Accumulate term -> chunk list from segment rows (range-sliced)."""
        terms = t.column("term").to_pylist()
        dbufs = t.column("doc_ids_enc").to_pylist()
        tbufs = t.column("tfs_enc").to_pylist()
        blds = t.column("block_last_doc").to_pylist()
        bmts = t.column("block_max_tf").to_pylist()
        bdos = t.column("block_doc_off").to_pylist()
        btos = t.column("block_tf_off").to_pylist()
        bcts = t.column("block_count").to_pylist()
        for i, term in enumerate(terms):
            chunk = (dbufs[i], tbufs[i], blds[i], bmts[i], bdos[i],
                     btos[i], bcts[i])
            if self._range is not None:
                chunk = self._slice_chunk(*chunk)
                if chunk is None:
                    continue
            out.setdefault(term, []).append(chunk)

    def _materialize_from_table(self, t: "pa.Table") -> None:
        """Eager bulk load of one full segment table (chunks of a term from
        LATER files merge in when their file is reached — locator order)."""
        acc: dict[str, list] = {}
        self._chunks_from_rows(t, acc)
        for term, ch in acc.items():
            prev = self._records.get(term)
            if prev is not None:
                # merge with already-materialized earlier chunks
                pm = prev[5]
                ch = [(prev[3], prev[4], pm["last_doc"], pm["max_tf"],
                       pm["doc_off"], pm["tf_off"], pm["count"])] + ch
            self._record_from_chunks(term, ch)

    def _materialize(self, term: str) -> tuple:
        """Lazy per-term load: term-filtered, row-group-pruned reads of
        exactly the files whose locators name this term."""
        acc: dict[str, list] = {}
        for fidx, _row in self._locators[term]:
            t = pq.read_table(self._seg_files[fidx],
                              filters=[("term", "==", term)])
            self._chunks_from_rows(t, acc)
        ch = acc.get(term)
        if ch is None:
            # every chunk fell outside this shard's doc range: an empty
            # record keeps df/cf/idf global while postings stay vacant
            rec = (self._df_glob[term], self._cf_glob[term],
                   idf_fn(self.doc_total, self._df_glob[term]), b"", b"",
                   {"last_doc": [], "max_tf": [], "doc_off": [0],
                    "tf_off": [0], "count": []})
            self._records[term] = rec
            return rec
        return self._record_from_chunks(term, ch)

    def loaded_postings_bytes(self) -> int:
        """RESIDENT posting-list bytes (encoded doc+tf buffers of the
        records materialized so far) — the range test asserts an eager
        shard's slice is a fraction of the full load; on a lazy engine this
        grows with the touched vocabulary."""
        return sum(len(rec[3]) + len(rec[4])
                   for rec in self._records.values())

    # -- stage 1 -----------------------------------------------------------

    # decoded-postings cache: hot (head) terms appear in most queries; keep
    # up to this many decoded lists (LRU-ish: clear-on-full is fine at this
    # size — decode is cheap, the cache only shaves repeated head terms)
    POSTINGS_CACHE_MAX = 256

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray, float] | None:
        cached = self._postings_cache.get(term) if hasattr(
            self, "_postings_cache") else None
        if cached is not None:
            return cached
        rec = self._dict.get(term)
        if rec is None:
            return None
        df, cf, idf, dbuf, tbuf, meta = rec
        doc_ids, tfs = decode_postings_blocked(dbuf, tbuf, meta)
        doc_ids = doc_ids.astype(np.int64)
        if self._range is not None:
            # boundary blocks of the slice can carry out-of-range postings
            keep = (doc_ids >= self._base) & (doc_ids < self._range_hi)
            doc_ids, tfs = doc_ids[keep], tfs[keep]
        out = (doc_ids, tfs.astype(np.float64), float(idf))
        if not hasattr(self, "_postings_cache"):
            self._postings_cache = {}
        if len(self._postings_cache) >= self.POSTINGS_CACHE_MAX:
            self._postings_cache.clear()
        self._postings_cache[term] = out
        return out

    def term_stats(self, term: str) -> tuple[int, int, float] | None:
        # answered from the eager vocabulary pass — no posting-buffer
        # materialization (vocab-wide stats sweeps stay IO-free)
        df = self._df_glob.get(term)
        if df is None:
            return None
        return df, self._cf_glob[term], idf_fn(self.doc_total, df)

    def score_terms(self, terms: list[str], *, candidate_limit: int | None = None,
                    doc_range: tuple[int, int] | None = None
                    ) -> list[tuple[int, float, int]]:
        """Accumulate stage-1 scores for an explicit term list (no query
        tokenization); ordered (score DESC, doc_id ASC).  Used by
        SQL-mirrored driver pipelines and (with ``doc_range``) by the
        sharded engine's per-shard candidate generation."""
        return self._accumulate(sorted(set(terms)),
                                candidate_limit or self.doc_total,
                                doc_range=doc_range)

    def candidates(self, q: str, *, limit: int = 20, offset: int = 0
                   ) -> tuple[list[tuple[int, float, int]], dict] | None:
        """Stage-1 candidate generation.  Returns ([(doc_id, token_score,
        matched_terms)], context) ordered by (score DESC, doc_id ASC), capped
        at the reference candidate_limit formula."""
        ctx = search_context(q, limit, offset)
        if ctx is None:
            return None
        return (self._accumulate(sorted(set(ctx["query_terms"])),
                                 ctx["candidate_limit"]), ctx)

    def _accumulate(self, sorted_terms: list[str], cl: int,
                    doc_range: tuple[int, int] | None = None
                    ) -> list[tuple[int, float, int]]:
        # reuse per-engine accumulators: allocating + zeroing 2 x N arrays
        # per query dominates short-query latency; instead zero only the
        # entries each query touched
        if not hasattr(self, "_acc_scores"):
            self._acc_scores = np.zeros(self._n_local, dtype=np.float64)
            self._acc_matched = np.zeros(self._n_local, dtype=np.int32)
        scores = self._acc_scores
        matched = self._acc_matched
        base = self._base
        # sorted term order => deterministic float accumulation (oracle pins
        # the same order)
        for term in sorted_terms:
            rec = self.postings(term)
            if rec is None:
                continue
            doc_ids, tfs, idf = rec
            local = doc_ids - base if base else doc_ids
            if self.scoring == "bm25":
                dl = self._doc_len[local].astype(np.float64)
                denom = tfs + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
                contrib = idf * tfs * (self.k1 + 1.0) / denom
            else:
                contrib = tfs * idf * DEFAULT_FIELD_WEIGHT
            scores[local] += contrib
            matched[local] += 1

        touched = np.flatnonzero(matched)
        if len(touched) == 0:
            return []
        nz = touched + base if base else touched    # absolute doc ids
        s = scores[touched].copy()
        m = matched[touched].copy()
        # reset only what this query touched (buffer reuse)
        scores[touched] = 0.0
        matched[touched] = 0
        if len(self._tomb_lo):
            from .tombstones import mask_tombstoned
            keep = mask_tombstoned(nz, self._tomb_lo, self._tomb_hi)
            nz, s, m = nz[keep], s[keep], m[keep]
            if len(nz) == 0:
                return []
        if doc_range is not None:
            lo, hi = doc_range
            keep = (nz >= lo) & (nz < hi)
            nz, s, m = nz[keep], s[keep], m[keep]
            if len(nz) == 0:
                return []
        if len(nz) > cl:
            # pre-prune with a partial selection, keeping every score tied
            # with the cl-th so the exact (score, doc_id) sort below breaks
            # boundary ties deterministically
            kth = np.partition(-s, cl - 1)[cl - 1]
            keep = np.flatnonzero(-s <= kth)
            nz, s, m = nz[keep], s[keep], m[keep]
        order = np.lexsort((nz, -s))[:cl]
        return [(int(nz[i]), float(s[i]), int(m[i]))
                for i in order]

    # -- block-max WAND ----------------------------------------------------

    def candidates_wand(self, q: str, *, limit: int = 20, offset: int = 0
                        ) -> tuple[list[tuple[int, float, int]], dict] | None:
        """Stage-1 candidates via document-at-a-time WAND with block-skip
        pointer movement (north rule: block-max pruning over a min-heap).
        Produces results identical to the exhaustive ``candidates`` —
        including float-sum order (contributions are summed in sorted term
        order) and the (score DESC, doc_id ASC) tie-break (strict heap
        replacement keeps the earlier doc on ties).

        With tombstones present the exhaustive path is used instead (the
        DAAT heap would need per-advance mask checks; deletes are rare and
        cleared at the next rebuild, so this trades a little latency for
        identical semantics)."""
        ctx = search_context(q, limit, offset)
        if ctx is None:
            return None
        if len(self._tomb_lo) or self._range is not None:
            # range-sliced engines accumulate exhaustively: the DAAT heap
            # would see boundary-block docs outside the range
            return (self._accumulate(sorted(set(ctx["query_terms"])),
                                     ctx["candidate_limit"]), ctx)
        return (self._wand(sorted(set(ctx["query_terms"])),
                           ctx["candidate_limit"]), ctx)

    def candidates_auto(self, q: str, *, limit: int = 20, offset: int = 0
                        ) -> tuple[list[tuple[int, float, int]], dict] | None:
        """Planner: DAAT WAND pays off when the query is selective (few
        candidate docs relative to the corpus — pointer skipping prunes);
        on dense queries the vectorized exhaustive accumulation wins.  Both
        paths produce identical results (property-tested), so this is purely
        a cost decision: Σdf < N/8 -> WAND."""
        ctx = search_context(q, limit, offset)
        if ctx is None:
            return None
        terms = sorted(set(ctx["query_terms"]))
        sum_df = sum(self._df_glob.get(t, 0) for t in terms)
        if (sum_df * 8 < self.doc_total and not len(self._tomb_lo)
                and self._range is None):
            return (self._wand(terms, ctx["candidate_limit"]), ctx)
        return (self._accumulate(terms, ctx["candidate_limit"]), ctx)

    def _wand(self, sorted_terms: list[str], k: int
              ) -> list[tuple[int, float, int]]:
        """Block-max WAND with BATCHED pivot evaluation: once the pivot is
        reachable (min cursor == pivot), every doc in the window
        [pivot_doc, min current-block end) is scored in one numpy pass —
        per-term block slices scored vectorized, merged with a stable
        doc-sort + ``np.add.reduceat`` so each doc's contributions sum in
        sorted-term order (float-identical to the exhaustive accumulator).
        Heap insertion runs per unique window doc in ascending doc order
        with the same strict-replacement rule as doc-at-a-time WAND, so the
        result — including boundary ties — equals the exhaustive path
        (property-tested in test_wand_equals_exhaustive).  Scoring a window
        is a superset of classic WAND's single-doc evaluation; the extra
        docs are bounded by the 128-entry block and never change the top-k
        (the per-doc score>theta check still gates insertion)."""
        import heapq

        INF = 1 << 62
        bm25 = self.scoring == "bm25"
        k1, b, avgdl = self.k1, self.b, self.avgdl
        doc_len, base = self._doc_len, self._base

        iters = []
        for term in sorted_terms:
            rec = self._dict.get(term)
            if rec is None:
                continue
            df, cf, idf, dbuf, tbuf, meta = rec
            if not meta["last_doc"]:
                continue
            idf = float(idf)
            mt = np.asarray(meta["max_tf"], dtype=np.float64)
            if bm25:                      # dl -> 0 upper-bounds the norm
                ub_blocks = idf * mt * (k1 + 1.0) / (mt + k1 * (1.0 - b))
            else:
                ub_blocks = mt * idf * DEFAULT_FIELD_WEIGHT
            iters.append(_TermIter(dbuf, tbuf, meta, idf, ub_blocks))
        if not iters:
            return []

        heap: list[tuple[float, int, int]] = []   # (score, -doc, matched)
        theta = -1.0

        while True:
            live = [it for it in iters if it.cur_doc < INF]
            if not live:
                break
            by_doc = sorted(live, key=lambda it: it.cur_doc)
            acc = 0.0
            pivot_idx = None
            for i, it in enumerate(by_doc):
                acc += it.ub
                if acc > theta or len(heap) < k:
                    pivot_idx = i
                    break
            if pivot_idx is None:
                break
            pivot_doc = by_doc[pivot_idx].cur_doc

            if by_doc[0].cur_doc != pivot_doc:
                for i in range(pivot_idx):
                    by_doc[i].next_geq(pivot_doc)
                continue

            # batched window: all already-decoded postings in
            # [pivot_doc, wend) across the live cursors
            wend = min(int(it.docs[-1]) for it in live) + 1

            if len(heap) == k:
                # BLOCK-MAX gate (Ding & Suel 2011): any doc in the window
                # scores at most the sum of the participating cursors'
                # CURRENT-block upper bounds; insertion needs score > theta,
                # so ub_sum <= theta skips the whole window unscored
                ub_sum = 0.0
                for it in live:
                    if it.cur_doc < wend:
                        ub_sum += float(it.ub_blocks[it.b])
                if ub_sum <= theta:
                    for it in live:
                        if it.cur_doc < wend:
                            it.next_geq(wend)
                    continue

            dparts: list[np.ndarray] = []
            cparts: list[np.ndarray] = []
            for it in iters:          # sorted-term order => float identity
                if it.cur_doc >= wend:
                    continue
                hi = int(np.searchsorted(it.docs, wend, side="left"))
                d = it.docs[it.pos:hi]
                t = it.tfs[it.pos:hi].astype(np.float64)
                if bm25:
                    dl = doc_len[d - base].astype(np.float64)
                    denom = t + k1 * (1.0 - b + b * dl / avgdl)
                    c = it.idf * t * (k1 + 1.0) / denom
                else:
                    c = t * it.idf * DEFAULT_FIELD_WEIGHT
                dparts.append(d)
                cparts.append(c)
            # per-doc sums accumulate TERM BY TERM into a zeroed window
            # accumulator — the same add order (0.0 += c_t1 += c_t2 ...) as
            # the exhaustive path, so scores are bit-identical.  (A stable
            # sort + np.add.reduceat is NOT: reduceat groups adds
            # pairwise/SIMD, which differs at the ulp.)
            docs_u = np.unique(np.concatenate(dparts))
            scores_u = np.zeros(len(docs_u), dtype=np.float64)
            matched_u = np.zeros(len(docs_u), dtype=np.int64)
            for d, c in zip(dparts, cparts):
                idx = np.searchsorted(docs_u, d)
                scores_u[idx] += c
                matched_u[idx] += 1
            if len(heap) == k:        # safe pre-prune: theta only rises
                keep = scores_u > theta
                docs_u = docs_u[keep]
                matched_u = matched_u[keep]
                scores_u = scores_u[keep]
            for j in range(len(docs_u)):
                score = float(scores_u[j])
                if len(heap) < k:
                    heapq.heappush(
                        heap, (score, -int(docs_u[j]), int(matched_u[j])))
                    if len(heap) == k:
                        theta = heap[0][0]
                elif score > heap[0][0]:
                    heapq.heapreplace(
                        heap, (score, -int(docs_u[j]), int(matched_u[j])))
                    theta = heap[0][0]
            for it in live:
                if it.cur_doc < wend:
                    it.next_geq(wend)

        out = [(-nd, s, m) for s, nd, m in heap]
        out.sort(key=lambda r: (-r[1], r[0]))
        return out

    # -- stage 2 -----------------------------------------------------------

    def doc_meta(self, doc_id: int) -> dict:
        d = self._docs if self._docs is not None else self._ensure_docs()
        i = doc_id - self._base
        return {
            "conv_id": d["conv_id"][i].as_py(),
            "turn_idx": int(d["turn_idx"][i]),
            "role": d["role"][i].as_py(),
            "text": d["text"][i].as_py(),
            "tool": d["tool"][i].as_py(),
        }

    def doc_meta_many(self, doc_ids) -> list[dict]:
        """Batched candidate-metadata fetch: ONE Arrow take + to_pylist per
        column for the whole candidate set (the stage-2 hot path), instead
        of per-candidate scalar conversions.  Routes through per-row
        ``doc_meta`` when that method is overridden on the instance or a
        subclass (keeps the decode-error fallback contract testable)."""
        if (self.__dict__.get("doc_meta") is not None
                or type(self).doc_meta is not QueryEngine.doc_meta):
            return [self.doc_meta(d) for d in doc_ids]
        d = self._docs if self._docs is not None else self._ensure_docs()
        idx = np.fromiter((int(i) - self._base for i in doc_ids),
                          dtype=np.int64, count=len(doc_ids))
        take = pa.array(idx)
        cols = {n: d[n].take(take).to_pylist()
                for n in ("conv_id", "role", "text", "tool")}
        tis = d["turn_idx"][idx]
        return [
            {"conv_id": c, "turn_idx": int(ti), "role": r, "text": x,
             "tool": t}
            for c, r, x, t, ti in zip(cols["conv_id"], cols["role"],
                                      cols["text"], cols["tool"], tis)
        ]

    def facet_counts_terms(self, sorted_terms: list[str],
                           fields: tuple[str, ...] = ("role", "tool")
                           ) -> tuple[dict, int]:
        """Facet value counts over the FULL stage-1 match set of
        ``sorted_terms`` (facet aggregations run over every match, not the
        candidate page — Elasticsearch-aggregation semantics): ``({field:
        {value: n_docs}}, match_count)``.  Vectorized: one np.unique over
        the metadata column per field, no per-doc Python loop."""
        if not self._docs_enabled:
            raise RuntimeError("facet_counts needs document metadata; this "
                               "engine was built with load_docs=False")
        d = self._docs if self._docs is not None else self._ensure_docs()
        rows = self.score_terms(list(sorted_terms))
        ids = np.fromiter((r[0] for r in rows), dtype=np.int64,
                          count=len(rows)) - self._base
        out: dict = {}
        for f in fields:
            if len(ids):
                col_a = d[f]
                if isinstance(col_a, pa.Array):
                    col = col_a.take(pa.array(ids)).to_numpy(
                        zero_copy_only=False)
                else:
                    col = col_a[ids]
                if col.dtype == object:
                    # coalesce None -> "" (doc_meta's `or ""` convention);
                    # np.unique would raise sorting None against str, and
                    # str(None) would diverge from the SQL mirror's NULL.
                    col = np.where(np.equal(col, None), "", col)
                vals, counts = np.unique(col, return_counts=True)
                out[f] = {str(v): int(c)
                          for v, c in zip(vals.tolist(), counts.tolist())}
            else:
                out[f] = {}
        return out, len(rows)

    def facet_counts(self, q: str, *,
                     fields: tuple[str, ...] = ("role", "tool")
                     ) -> tuple[dict, int]:
        """Query-string front end of :meth:`facet_counts_terms` (same
        normalization as search; termless queries facet nothing)."""
        ctx = search_context(q, 1, 0)
        if ctx is None:
            return {f: {} for f in fields}, 0
        return self.facet_counts_terms(sorted(set(ctx["query_terms"])),
                                       fields=fields)

    def search(self, q: str, *, limit: int = 20, offset: int = 0,
               intent_bias: float = 0.0) -> list[dict]:
        """Full two-stage search; returns the ranked page as dict rows.

        ``intent_bias`` reproduces the reference's second-corpus scoring
        variant (news results get a flat +8.0 on the intent score,
        /root/reference/app/api/search_service.py:297; the news stage-1 also
        drops field weights, :84-88, which is a no-op here since transcript
        bodies already score at weight 1.0)."""
        return self.search_with_count(q, limit=limit, offset=offset,
                                      intent_bias=intent_bias)[0]

    def search_with_count(self, q: str, *, limit: int = 20, offset: int = 0,
                          intent_bias: float = 0.0,
                          stage1: str = "exhaustive"
                          ) -> tuple[list[dict], int]:
        """(page, count) with the reference's count semantics: count =
        max(len(ranked), offset + len(page)), 0 when the query has no
        scoreable terms (search_service.py:338-342) — the serving layer
        needs the TOTAL ranked-candidate count, not the page length, or
        paginating clients under-iterate."""
        gen = {"exhaustive": self.candidates,
               "wand": self.candidates_wand,
               "auto": self.candidates_auto}[stage1]
        res = gen(q, limit=limit, offset=offset)
        if res is None:
            return [], 0
        cands, ctx = res
        ranked = []
        try:
            metas = self.doc_meta_many([c[0] for c in cands])
            for (doc_id, token_score, matched_terms), meta in zip(cands,
                                                                  metas):
                url = f"{meta['conv_id']}#{meta['turn_idx']}"
                score = intent_score(
                    token_score=token_score, matched_terms=matched_terms,
                    total_terms=ctx["total_terms"],
                    query_phrase=ctx["query_phrase"],
                    query_compact=ctx["query_compact"],
                    query_words=ctx["query_words"],
                    title=meta["tool"] or "", description=meta["text"] or "",
                    url=url) + intent_bias
                ranked.append({
                    "conv_id": meta["conv_id"], "turn_idx": meta["turn_idx"],
                    "role": meta["role"], "tool": meta["tool"],
                    "text": meta["text"], "url": url,
                    "score": score, "token_score": token_score,
                    "matched_terms": matched_terms,
                })
        except UnicodeDecodeError:
            page = fallback_page(cands, ctx, limit=limit, offset=offset)
            return page, max(len(cands), offset + len(page))
        ranked.sort(key=lambda r: (-r["score"], r["url"]))
        page = ranked[offset:offset + limit]
        return page, max(len(ranked), offset + len(page))

    def search_table(self, q: str, *, limit: int = 20, offset: int = 0) -> pa.Table:
        rows = self.search(q, limit=limit, offset=offset)
        return pa.table({
            "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": pa.array([r["role"] for r in rows], pa.string()),
            "score": pa.array([r["score"] for r in rows], pa.float64()),
            "token_score": pa.array([r["token_score"] for r in rows], pa.float64()),
            "matched_terms": pa.array([r["matched_terms"] for r in rows], pa.int64()),
        })
