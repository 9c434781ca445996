"""Driver-checkable pipelines over the testdata tables.

Each function here backs one ``queries()`` entry in ``__ray_entry__.py`` and
(where ANSI-SQL can express the semantics) has a DuckDB mirror in
``oracle_sql()``.  Column names and rounding match the SQL exactly — the
driver's compare is an order-insensitive value hash over name-sorted columns.

Float discipline: sums that DuckDB would accumulate in a different order are
either integerized (money -> cents BIGINT) or rounded to 6 decimals on BOTH
sides; expressions that are single IEEE operations on identical inputs
(quality, freshness) compare exactly without rounding.

The transcript-shaped input is derived deterministically from the driver's
``documents`` table (sources/transcripts.py) so DuckDB can re-derive it; by
construction the engine's dense doc_id equals ``documents.doc_id``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min, Sum

from ..config import EngineConfig
from ..functions.hashing import hash64
from ..sources.transcripts import transcripts_from_documents
from ..state.query_engine import QueryEngine
from .build import build_index
from ..util import read_parquet_clean

_CACHE_ROOT = "/tmp/search_engine_ray/entry"
_engines: dict[tuple, QueryEngine] = {}


def _round_col(t: pa.Table, col: str, ndigits: int = 6) -> pa.Table:
    i = t.schema.get_field_index(col)
    return t.set_column(i, col, pc.round(t.column(col), ndigits=ndigits))


def get_engine(sf_dir: str, *, stem: bool) -> QueryEngine:
    """Build (once per process per mode) an index over the documents-derived
    transcripts and return a loaded QueryEngine."""
    key = (os.path.abspath(sf_dir), stem)
    if key in _engines:
        return _engines[key]
    tag = f"{hash64(key[0]):08x}-{'stem' if stem else 'plain'}"
    cfg = EngineConfig(index_dir=os.path.join(_CACHE_ROOT, tag),
                       num_partitions=16, do_stem=stem)
    ds = transcripts_from_documents(sf_dir)
    build_index(ds, cfg, source_desc=f"{sf_dir}:{stem}", resume=True)
    eng = QueryEngine(cfg.index_dir)
    _engines[key] = eng
    return eng


def get_unified_engine(sf_dir: str, *, stem: bool) -> tuple[QueryEngine, int]:
    """Unified web+news index (reference J3: one tokens table, source_type
    discriminator -> here the news docs occupy the tail doc-id range because
    'news-' conv ids sort after 'conv-').  Returns (engine, n_web)."""
    key = (os.path.abspath(sf_dir), stem, "unified")
    if key in _engines:
        return _engines[key]
    from ..sources.transcripts import news_from_documents
    tag = f"{hash64(key[0]):08x}-uni-{'stem' if stem else 'plain'}"
    cfg = EngineConfig(index_dir=os.path.join(_CACHE_ROOT, tag),
                       num_partitions=16, do_stem=stem)
    web = transcripts_from_documents(sf_dir)
    news = news_from_documents(sf_dir)
    n_web = web.count()
    build_index(web.union(news), cfg, source_desc=f"{sf_dir}:{stem}:uni",
                resume=True)
    eng = QueryEngine(cfg.index_dir)
    _engines[key] = (eng, n_web)
    return eng, n_web


_docs_ids_cache: dict[tuple[str, str], "ray.data.Dataset"] = {}


def _docs_with_ids(sf_dir: str) -> "ray.data.Dataset":
    """Transcript docs + deterministic doc_id (== documents.doc_id by
    construction of the derivation), MATERIALIZED once per process+sf_dir.

    Materializing here is a correctness-of-scheduling decision, not just a
    speedup: the dedup pipelines branch this dataset 3+ ways (fingerprint
    pass, pair-verify text sides, survivor anti-join), and every LAZY
    branch re-executes the lineage with its own `_AddDocId` actor pool
    (min 1 CPU each).  On a 4-CPU cluster three lingering pools plus one
    dispatched read task reserve everything, the next pool's min-size
    actor can never place, and the paused read generator never frees its
    CPU — a live-reproduced streaming-executor deadlock.  Branching off
    the materialized blocks spins the pool exactly once.  (At 100 TB the
    same role is played by a parquet checkpoint of the id-assigned corpus,
    which `pipelines/build.py` already writes as the doc store.)"""
    import ray as _ray

    from ..stages.doc_ids import assign_doc_ids

    def _session() -> str:
        # MaterializedDataset blocks die with the Ray session; key the
        # cache on the driver job so a shutdown/init cycle recomputes
        # instead of returning dead object refs
        try:
            if _ray.is_initialized():
                return _ray.get_runtime_context().get_job_id()
        except Exception:
            pass
        return ""

    key = (os.path.abspath(sf_dir), _session())
    if key not in _docs_ids_cache or not key[1]:
        ds, _ = assign_doc_ids(transcripts_from_documents(sf_dir))
        mat = ds.materialize()
        key = (key[0], _session())     # session may have just auto-inited
        _docs_ids_cache.clear()        # drop any prior session's refs
        _docs_ids_cache[key] = mat
    return _docs_ids_cache[key]


# -- index statistics -------------------------------------------------------

def corpus_stats(sf_dir: str) -> pa.Table:
    eng = get_engine(sf_dir, stem=False)
    from ..stages.stats import read_stats
    st = read_stats(eng.index_dir)
    return pa.table({
        "doc_total": pa.array([st["doc_total"]], pa.int64()),
        "total_tokens": pa.array([st["total_tokens"]], pa.int64()),
        "avgdl": pa.array([round(st["avgdl"], 6)], pa.float64()),
    })


def term_stats(sf_dir: str) -> pa.Table:
    eng = get_engine(sf_dir, stem=False)
    terms = sorted(eng._dict)
    stats = [eng.term_stats(t) for t in terms]   # vocab pass, no posting IO
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "df": pa.array([s[0] for s in stats], pa.int64()),
        "cf": pa.array([s[1] for s in stats], pa.int64()),
        "idf": pa.array([round(s[2], 6) for s in stats], pa.float64()),
    })


STAGE1_TERMS = ("merge", "sort", "window")


def search_stage1(sf_dir: str) -> pa.Table:
    """Reference stage-1 scoring (tf*idf*field_weight, SEARCH_SQL semantics)
    for a fixed unstemmed term set; all matching docs (no limit — the compare
    is order-insensitive and sf0.01 is far below MAX_CANDIDATES)."""
    eng = get_engine(sf_dir, stem=False)
    rows = eng.score_terms(list(STAGE1_TERMS))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "token_score": pa.array([round(r[1], 6) for r in rows], pa.float64()),
        "matched_terms": pa.array([r[2] for r in rows], pa.int64()),
    })


def search_reference(sf_dir: str) -> pa.Table:
    """Flagship stemmed two-stage search (reference scoring + intent re-rank)
    over a fixed query set; engine-vs-oracle identity is pytest-verified, the
    driver records rows/schema."""
    eng = get_engine(sf_dir, stem=True)
    out = []
    for qid, q in enumerate(("merge sort", "window batch stream",
                             "customer filter", "vector join")):
        for rank, r in enumerate(eng.search(q, limit=20), start=1):
            out.append((qid, rank, r["conv_id"], r["turn_idx"],
                        round(r["score"], 6), r["matched_terms"]))
    return pa.table({
        "query_id": pa.array([r[0] for r in out], pa.int64()),
        "rank": pa.array([r[1] for r in out], pa.int64()),
        "conv_id": pa.array([r[2] for r in out], pa.string()),
        "turn_idx": pa.array([r[3] for r in out], pa.int32()),
        "score": pa.array([r[4] for r in out], pa.float64()),
        "matched_terms": pa.array([r[5] for r in out], pa.int64()),
    })


def search_sharded(sf_dir: str) -> pa.Table:
    """``search_reference`` evaluated through the SHARDED serving path:
    doc-range shard actors + driver k-way merge (state/sharded.py), same
    query set, same SQL mirror — externally pins that the shard fan-out and
    merge reproduce the single-engine ranking, not just the pytest
    rank-identity property (tests/test_build_and_search.py)."""
    from ..state.sharded import ShardedQueryEngine
    eng = get_engine(sf_dir, stem=True)      # builds/loads the same index
    sh = ShardedQueryEngine(eng.index_dir, num_shards=4)
    try:
        out = []
        for qid, q in enumerate(("merge sort", "window batch stream",
                                 "customer filter", "vector join")):
            for rank, r in enumerate(sh.search(q, limit=20), start=1):
                out.append((qid, rank, r["conv_id"], r["turn_idx"],
                            round(r["score"], 6), r["matched_terms"]))
    finally:
        sh.shutdown()
    return pa.table({
        "query_id": pa.array([r[0] for r in out], pa.int64()),
        "rank": pa.array([r[1] for r in out], pa.int64()),
        "conv_id": pa.array([r[2] for r in out], pa.string()),
        "turn_idx": pa.array([r[3] for r in out], pa.int32()),
        "score": pa.array([r[4] for r in out], pa.float64()),
        "matched_terms": pa.array([r[5] for r in out], pa.int64()),
    })


SEARCH_PLAIN_QUERY = "merge sort"


def search_plain(sf_dir: str) -> pa.Table:
    """Unstemmed two-stage search with NO candidate truncation: the full
    intent re-rank constant table (search_service.py:174-222) applied to
    every stage-1 match for a fixed query.  Stemming is the only piece of
    search_reference ANSI-SQL can't express, so this variant IS the SQL
    oracle surface for the whole scoring path (title=tool,
    description=text, url=conv_id#turn_idx)."""
    from ..functions.text import (TOKEN_RE, STOPWORDS, extract_query_words,
                                  intent_score, normalize_text)
    eng = get_engine(sf_dir, stem=False)
    q = SEARCH_PLAIN_QUERY
    terms = []
    for t in TOKEN_RE.findall(q.lower()):
        if t not in STOPWORDS and t not in terms:
            terms.append(t)
    words = extract_query_words(q)
    phrase = normalize_text(q)
    compact = "".join(words)
    out = []
    for doc_id, tscore, mt in eng.score_terms(terms):
        meta = eng.doc_meta(doc_id)
        s = intent_score(
            token_score=tscore, matched_terms=mt, total_terms=len(terms),
            query_phrase=phrase, query_compact=compact, query_words=words,
            title=meta["tool"] or "", description=meta["text"] or "",
            url=f"{meta['conv_id']}#{meta['turn_idx']}")
        out.append((doc_id, round(s, 6), mt))
    return pa.table({
        "doc_id": pa.array([r[0] for r in out], pa.int64()),
        "score": pa.array([r[1] for r in out], pa.float64()),
        "matched_terms": pa.array([r[2] for r in out], pa.int64()),
    })


def search_stemmed(sf_dir: str) -> pa.Table:
    """STEMMED two-stage search without candidate truncation — the stemmed
    twin of search_plain: stage-1 token scoring runs over the Porter-stemmed
    index with stemmed query terms, the intent re-rank uses the raw query
    features (reference semantics — phrase/url/title matching is unstemmed,
    search_service.py:174-222).  With the pure-SQL Porter mirror in
    oracle_sql(), the stemmed scoring path is fully DuckDB-checkable."""
    from ..functions.porter import stem as porter
    from ..functions.text import (TOKEN_RE, STOPWORDS, extract_query_words,
                                  intent_score, normalize_text)
    eng = get_engine(sf_dir, stem=True)
    q = SEARCH_PLAIN_QUERY
    terms = []
    for t in TOKEN_RE.findall(q.lower()):
        if t not in STOPWORDS:
            st = porter(t)
            if st not in terms:
                terms.append(st)
    words = extract_query_words(q)
    phrase = normalize_text(q)
    compact = "".join(words)
    out = []
    for doc_id, tscore, mt in eng.score_terms(terms):
        meta = eng.doc_meta(doc_id)
        s = intent_score(
            token_score=tscore, matched_terms=mt, total_terms=len(terms),
            query_phrase=phrase, query_compact=compact, query_words=words,
            title=meta["tool"] or "", description=meta["text"] or "",
            url=f"{meta['conv_id']}#{meta['turn_idx']}")
        out.append((doc_id, round(s, 6), mt))
    return pa.table({
        "doc_id": pa.array([r[0] for r in out], pa.int64()),
        "score": pa.array([r[1] for r in out], pa.float64()),
        "matched_terms": pa.array([r[2] for r in out], pa.int64()),
    })


def search_bm25_stemmed(sf_dir: str) -> pa.Table:
    """Stemmed BM25(k1=1.2, b=0.75) scoring of every matching doc — the
    stemmed twin of search_bm25_plain, SQL-mirrored via the Porter CTE."""
    from ..functions.porter import stem as porter
    from ..functions.text import TOKEN_RE, STOPWORDS
    eng = get_engine(sf_dir, stem=True)
    qe = QueryEngine(eng.index_dir, scoring="bm25", load_docs=False)
    terms = []
    for t in TOKEN_RE.findall(SEARCH_PLAIN_QUERY.lower()):
        if t not in STOPWORDS:
            st = porter(t)
            if st not in terms:
                terms.append(st)
    rows = qe.score_terms(terms)
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "score": pa.array([round(r[1], 6) for r in rows], pa.float64()),
        "matched_terms": pa.array([r[2] for r in rows], pa.int64()),
    })


def search_news(sf_dir: str) -> pa.Table:
    """Second-corpus search (reference J3 for real): a genuinely separate
    news corpus (sources/transcripts.py news_from_documents) is indexed
    UNIFIED with the web corpus (shared df/idf statistics, the reference's
    0007_unify_news_tokens.py design); news queries restrict stage-1 to the
    news doc-id range and add the flat +8.0 intent bias
    (search_service.py:297).  Unstemmed + no candidate truncation so the
    whole path is SQL-mirrored; rows change whenever the news corpus does."""
    from ..functions.text import (TOKEN_RE, STOPWORDS, extract_query_words,
                                  intent_score, normalize_text)
    eng, n_web = get_unified_engine(sf_dir, stem=False)
    q = SEARCH_PLAIN_QUERY
    terms = []
    for t in TOKEN_RE.findall(q.lower()):
        if t not in STOPWORDS and t not in terms:
            terms.append(t)
    words = extract_query_words(q)
    phrase = normalize_text(q)
    compact = "".join(words)
    out = []
    for doc_id, tscore, mt in eng.score_terms(
            terms, doc_range=(n_web, eng.doc_total)):
        meta = eng.doc_meta(doc_id)
        s = intent_score(
            token_score=tscore, matched_terms=mt, total_terms=len(terms),
            query_phrase=phrase, query_compact=compact, query_words=words,
            title=meta["tool"] or "", description=meta["text"] or "",
            url=f"{meta['conv_id']}#{meta['turn_idx']}") + 8.0
        out.append((doc_id, round(s, 6), mt))
    return pa.table({
        "doc_id": pa.array([r[0] for r in out], pa.int64()),
        "score": pa.array([r[1] for r in out], pa.float64()),
        "matched_terms": pa.array([r[2] for r in out], pa.int64()),
    })


def search_bm25_plain(sf_dir: str) -> pa.Table:
    """Unstemmed BM25(k1=1.2, b=0.75) scoring of every matching doc for the
    fixed query — the SQL-mirrorable surface of the native BM25 scorer
    (doc-length normalization + idf + saturation all in the oracle; stemming
    is the only piece SQL can't express)."""
    from ..functions.text import TOKEN_RE, STOPWORDS
    eng = get_engine(sf_dir, stem=False)
    qe = QueryEngine(eng.index_dir, scoring="bm25", load_docs=False)
    terms = []
    for t in TOKEN_RE.findall(SEARCH_PLAIN_QUERY.lower()):
        if t not in STOPWORDS and t not in terms:
            terms.append(t)
    rows = qe.score_terms(terms)
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "score": pa.array([round(r[1], 6) for r in rows], pa.float64()),
        "matched_terms": pa.array([r[2] for r in rows], pa.int64()),
    })


def search_bm25(sf_dir: str) -> pa.Table:
    """Native BM25(k1=1.2, b=0.75) top-k for the same query set."""
    eng_ref = get_engine(sf_dir, stem=True)
    qe = QueryEngine(eng_ref.index_dir, scoring="bm25")
    out = []
    for qid, q in enumerate(("merge sort", "window batch stream",
                             "customer filter", "vector join")):
        cands = qe.candidates(q, limit=20, offset=0)
        if cands is None:
            continue
        for rank, (doc_id, score, mt) in enumerate(cands[0][:20], start=1):
            out.append((qid, rank, doc_id, round(score, 6), mt))
    return pa.table({
        "query_id": pa.array([r[0] for r in out], pa.int64()),
        "rank": pa.array([r[1] for r in out], pa.int64()),
        "doc_id": pa.array([r[2] for r in out], pa.int64()),
        "score": pa.array([r[3] for r in out], pa.float64()),
        "matched_terms": pa.array([r[4] for r in out], pa.int64()),
    })


# -- spellcheck -------------------------------------------------------------

def word_counts(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.spellcheck import word_counts as wc
    return wc(_docs_with_ids(sf_dir))


def doc_frequencies(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.spellcheck import doc_frequencies as dfq
    return dfq(_docs_with_ids(sf_dir))


def spellcheck_dictionary(sf_dir: str) -> pa.Table:
    from ..stages.spellcheck import build_dictionary
    t = build_dictionary(_docs_with_ids(sf_dir))
    return _round_col(t, "popularity_score")


def symspell_deletes(sf_dir: str) -> "ray.data.Dataset":
    """Legacy SymSpell delete-variant precompute over the corpus lexicon
    (reference engine.py:37-52 / the dropped spellcheck_deletes table)."""
    from ..stages.spellcheck import build_dictionary
    from ..stages.spellcheck import symspell_deletes as sd
    return sd(build_dictionary(_docs_with_ids(sf_dir)))


#: Raw-URL templates keyed by doc_id % 6, each exercising one normalizer
#: rule (M2/M3): tracking-param drop, multipart eTLD suffix, scheme default
#: on a bare host (whole string becomes the netloc, hostname unparseable ->
#: empty domain, reference-faithful), slash-run collapse, fragment drop,
#: port + param-order preservation.  The SQL oracle states the EXPECTED
#: normalized form analytically per template, so any engine deviation
#: hash-mismatches.
_URL_TEMPLATES = (
    lambda d: f"HTTPS://WWW.Example.COM//a//b/{d}?utm_source=news&x=1",
    lambda d: f"http://Sub.Shop.Example.CO.UK/p/{d}?fbclid=abc",
    lambda d: "example.net",
    lambda d: f"https://a.b.example.com.au///{d}",
    lambda d: f"https://news.example.jp/x/{d}#frag",
    lambda d: f"HTTP://example.COM:8080/path/{d}?b=2&a=1&gclid=z",
)


def url_normalize(sf_dir: str) -> "ray.data.Dataset":
    """M2 normalize_url + M3 registrable_domain over a deterministic
    synthetic URL column (templates above), run distributed."""
    from ..functions.urlnorm import normalize_url, registrable_domain
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        raws = [_URL_TEMPLATES[i % 6](i) for i in ids]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "raw_url": pa.array(raws, pa.string()),
            "norm_url": pa.array([normalize_url(r) for r in raws],
                                 pa.string()),
            "domain": pa.array([registrable_domain(r) for r in raws],
                               pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def domain_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-registrable-domain corpus statistics (doc count, M10-word total,
    keep-first doc_id) — the aggregation a crawl-curation pipeline runs to
    build domain blocklists / quality priors (cf. C4's domain filtering).

    Composition: the url_normalize synthetic URL column -> M3
    registrable_domain -> ONE pre-aggregated groupby(domain).  The word
    count is combined inside map_batches so the exchange ships one row per
    (block, domain), not per doc.  The SQL oracle states the expected
    domain analytically per template (same convention as url_normalize),
    so any registrable_domain deviation hash-mismatches."""
    from ..functions.text import WORD_RE
    from ..functions.urlnorm import registrable_domain

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        doms = np.asarray(
            [registrable_domain(_URL_TEMPLATES[i % 6](int(i))) for i in ids],
            dtype=object)
        n_words = np.fromiter(
            (len(WORD_RE.findall((t or "").lower())) for t in texts),
            dtype=np.int64, count=len(texts))
        uniq, inv = np.unique(doms, return_inverse=True)
        return pa.table({
            "domain": pa.array(uniq, pa.string()),
            "n_docs": pa.array(np.bincount(inv), pa.int64()),
            "n_words_total": pa.array(
                np.bincount(inv, weights=n_words).astype(np.int64)),
            "first_doc_id": pa.array(
                np.minimum.reduceat(ids[np.argsort(inv, kind="stable")],
                                    np.searchsorted(np.sort(inv),
                                                    np.arange(len(uniq))))),
        })

    agg = (_documents_docs(sf_dir)
           .map_batches(partial, batch_format="pyarrow")
           .groupby("domain")
           .aggregate(Sum("n_docs"), Sum("n_words_total"),
                      Min("first_doc_id")))
    return agg.map_batches(
        lambda b: pa.table({
            "domain": b.column("domain"),
            "n_docs": b.column("sum(n_docs)"),
            "n_words_total": b.column("sum(n_words_total)"),
            "first_doc_id": b.column("min(first_doc_id)"),
        }),
        batch_format="pyarrow")


def symspell_suggestions(sf_dir: str) -> pa.Table:
    """End-to-end legacy SymSpell suggestion path (delete-join candidates +
    OSA acceptance) on the same fixed misspelling set as
    spellcheck_suggestions."""
    from ..stages.spellcheck import build_dictionary, symspell_lookup
    inputs = ["tabel", "jion", "mrge", "windwo", "batc", "strem",
              "customer", "zzzzqqq"]
    return symspell_lookup(build_dictionary(_docs_with_ids(sf_dir)), inputs)


# -- dedup ------------------------------------------------------------------

def dedup_exact_groups(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.dedup import exact_dedup_groups
    return exact_dedup_groups(_docs_with_ids(sf_dir))


def dedup_exact_survivors(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.dedup import exact_dedup_survivors
    return exact_dedup_survivors(_docs_with_ids(sf_dir))


def simhash_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.dedup import fingerprints
    return fingerprints(_docs_with_ids(sf_dir))


def minhash_near_dups(sf_dir: str) -> pa.Table:
    from ..stages.dedup import minhash_near_dups as mnd
    t = mnd(_docs_with_ids(sf_dir), threshold=0.8).take_all()
    t.sort(key=lambda r: (r["doc_a"], r["doc_b"]))
    return pa.table({
        "doc_a": pa.array([r["doc_a"] for r in t], pa.int64()),
        "doc_b": pa.array([r["doc_b"] for r in t], pa.int64()),
        "jaccard": pa.array([round(r["jaccard"], 6) for r in t], pa.float64()),
    })


def ngram_jaccard_near_dups(sf_dir: str) -> pa.Table:
    """Character-3-gram Jaccard near-dups over MinHash LSH candidates."""
    from ..stages.dedup import ngram_jaccard_near_dups as njd
    t = njd(_docs_with_ids(sf_dir), threshold=0.9).take_all()
    t.sort(key=lambda r: (r["doc_a"], r["doc_b"]))
    return pa.table({
        "doc_a": pa.array([r["doc_a"] for r in t], pa.int64()),
        "doc_b": pa.array([r["doc_b"] for r in t], pa.int64()),
        "jaccard": pa.array([round(r["jaccard"], 6) for r in t],
                            pa.float64()),
    })


def minhash_clusters(sf_dir: str) -> pa.Table:
    """Near-dup CLUSTERS: connected components over the verified MinHash
    pair graph (distributed min-label propagation, stages/dedup.py
    connected_components).  (doc_id, cluster_rep) for every doc that
    appears in at least one near-dup pair; cluster_rep = component min."""
    from ..stages.dedup import connected_components, minhash_near_dups as mnd
    pairs = mnd(_docs_with_ids(sf_dir), threshold=0.8)
    t = connected_components(pairs).take_all()
    t.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in t], pa.int64()),
        "cluster_rep": pa.array([r["cluster_rep"] for r in t], pa.int64()),
    })


def near_dedup_survivors(sf_dir: str) -> pa.Table:
    """Full dedup story end-to-end: exact-dup groups collapse to their min
    doc_id, then near-dup clusters (MinHash pairs -> connected components)
    keep only the component minimum.  Returns surviving doc_ids.

    The drop set (near-dup cluster members that are not their component's
    min) is O(near-dup docs) — broadcast as an Arrow value_set and
    anti-filtered against the exact survivors, never shuffled."""
    from ..stages.dedup import (connected_components, exact_dedup_survivors,
                                minhash_near_dups as mnd)
    docs = _docs_with_ids(sf_dir)
    pairs = mnd(docs, threshold=0.8)
    clusters = connected_components(pairs)
    drop = clusters.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("doc_id"),
                                        b.column("cluster_rep"))).select(
            ["doc_id"]),
        batch_format="pyarrow").take_all()
    drop_set = pa.array(sorted(r["doc_id"] for r in drop), pa.int64())

    def anti(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(b.column("doc_id"), value_set=drop_set))
        return b.filter(keep).select(["doc_id"])

    t = exact_dedup_survivors(docs).map_batches(
        anti, batch_format="pyarrow").take_all()
    ids = sorted(r["doc_id"] for r in t)
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def events_asof_join(sf_dir: str) -> "ray.data.Dataset":
    """Backward as-of self-join: each click event annotated with the most
    recent prior view by the same user (stages/temporal.asof_prior_event)."""
    from ..stages.temporal import asof_prior_event
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    return asof_prior_event(ev, left_type="click", right_type="view")


RANGE_JOIN_WINDOW_US = 3_600_000_000      # 1 hour


def events_range_join(sf_dir: str) -> "ray.data.Dataset":
    """Range join: per error event, count + cent-sum of clicks by the same
    user within the following hour (stages/temporal.range_join_counts)."""
    from ..stages.temporal import range_join_counts
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "ts", "user_id",
                                        "event_type", "value"])

    def clicks(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.equal(b.column("event_type"), "click"))
        return pa.table({
            "key": sel.column("user_id"),
            "ts": sel.column("ts").cast(pa.int64()),
            "val": pc.cast(pc.floor(pc.add(pc.multiply(
                sel.column("value"), 100.0), 0.5)), pa.int64()),
        })

    def errors(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.equal(b.column("event_type"), "error"))
        return pa.table({
            "key": sel.column("user_id"),
            "id": sel.column("event_id"),
            "start": sel.column("ts").cast(pa.int64()),
        })

    out = range_join_counts(
        ev.map_batches(clicks, batch_format="pyarrow"),
        ev.map_batches(errors, batch_format="pyarrow"),
        window_us=RANGE_JOIN_WINDOW_US)
    return out.map_batches(
        lambda b: pa.table({
            "event_id": b.column("id"),
            "n_clicks": b.column("n_matches"),
            "sum_click_cents": b.column("sum_val"),
        }), batch_format="pyarrow")


def events_hll_registers(sf_dir: str) -> "ray.data.Dataset":
    """HyperLogLog distinct-user sketch per event type — the register table
    (integer-exact, SQL-mirrorable surface), stages/stats.hll_registers."""
    from ..stages.stats import hll_registers
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "user_id"])
    return hll_registers(ev, key="event_type", value_col="user_id")


def events_hopping_window(sf_dir: str) -> "ray.data.Dataset":
    """Hopping-window aggregate (1h windows every 15min):
    stages/temporal.hopping_window_counts."""
    from ..stages.temporal import hopping_window_counts
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "event_type", "value"])
    return hopping_window_counts(ev)


def events_rolling(sf_dir: str) -> "ray.data.Dataset":
    """Per-user rolling 5-row SUM/MAX/COUNT window (SQL ROWS BETWEEN 4
    PRECEDING AND CURRENT ROW): stages/temporal.rolling_user_stats."""
    from ..stages.temporal import rolling_user_stats
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "ts", "user_id", "value"])
    return rolling_user_stats(ev, window=5)


def schedule_fetch_batch(sf_dir: str) -> "ray.data.Dataset":
    """K4/K6 scheduling caps (reference news_fetcher.py:21-23,207-215):
    the 100 most-overdue keys (min ts), then the 50 newest events per
    selected key — global run cap + per-key item cap in one pipeline
    (stages/temporal.schedule_fetch_batch)."""
    from ..stages.temporal import schedule_fetch_batch as _sched
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "event_id", "ts"])
    return _sched(ev, max_keys=100, per_key=50)


def events_sample_per_user(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic uniform 5-per-user event sample (hash-draw reservoir
    analogue, stages/curation.sample_per_key)."""
    from ..stages.curation import sample_per_key
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "event_id"])
    return sample_per_key(ev, key="user_id", id_col="event_id", k=5)


def events_percentiles(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-event-type value percentiles (numpy linear ==
    quantile_cont), stages/stats.column_percentiles."""
    from ..stages.stats import column_percentiles
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "value"])
    return column_percentiles(ev, key="event_type", col="value")


def events_percentiles_sketch(sf_dir: str) -> "ray.data.Dataset":
    """Approximate per-event-type percentiles via the mergeable fixed-bin
    histogram sketch (stages/stats.approx_percentiles_hist) — bounded
    per-key state, unlike the exact events_percentiles."""
    from ..stages.stats import approx_percentiles_hist
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type", "value"])
    return approx_percentiles_hist(ev, key="event_type", col="value",
                                   qs=(0.5, 0.9, 0.99), bin_width=1.0)


def events_cms_registers(sf_dir: str) -> "ray.data.Dataset":
    """Count-Min sketch registers over event user_ids
    (stages/stats.cms_registers): mergeable d x w frequency counters,
    SQL-mirrored exactly via md5_number_lower."""
    from ..stages.stats import cms_registers
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id"])
    return cms_registers(ev, key_col="user_id")


def events_cms_heavy_hitters(sf_dir: str) -> "ray.data.Dataset":
    """Top-20 users by Count-Min point estimate
    (stages/stats.cms_estimate_topk) — deterministic (est desc, user_id)
    order, SQL-mirrored."""
    from ..stages.stats import cms_estimate_topk
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id"])
    return cms_estimate_topk(ev, key_col="user_id", k=20)


def events_sample_weighted(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic weighted sample (5 per event_type, weight = value+1)
    via Efraimidis-Spirakis priority sampling
    (stages/curation.sample_weighted)."""
    from ..stages.curation import sample_weighted
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type", "event_id", "value"])
    ev = ev.map_batches(
        lambda t: t.append_column(
            "w", pc.add(t.column("value"), pa.scalar(1.0))),
        batch_format="pyarrow")
    return sample_weighted(ev, key="event_type", id_col="event_id",
                           weight_col="w", k=5)


def pack_shards(sf_dir: str) -> "ray.data.Dataset":
    """Token-budget shard packing over documents (training-data curation):
    shard_id = (cumulative tokens before this doc, in doc_id order) //
    budget — a distributed two-phase prefix sum, no global sort."""
    from ..stages.curation import pack_shards as ps
    return ps(_docs_with_ids(sf_dir))


def shuffle_pack_shards(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic global shuffle (md5 key) + token-budget packing in
    shuffled order — the training-export last mile."""
    from ..stages.curation import shuffle_pack_shards as sps
    return sps(_docs_with_ids(sf_dir))


def pack_examples(sf_dir: str) -> "ray.data.Dataset":
    """Transcript-native example assembly: each conversation's turns pack
    in turn order into ~512-token training examples."""
    from ..stages.curation import pack_examples as pe
    return pe(transcripts_from_documents(sf_dir))


def sample_stratified(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic per-language stratified sample (hash draw, no RNG)."""
    from ..stages.curation import sample_stratified as ss
    return ss(_docs_with_ids(sf_dir))


def mix_sources(sf_dir: str) -> "ray.data.Dataset":
    """Static source mixing: downsample each documents.source stratum so
    output token mass follows the per-source weight units (binding-source
    integer math + md5 ppm draw — stages/curation.mix_sources)."""
    from ..stages.curation import mix_sources as mx
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text", "source"])
    return mx(docs)


def simhash_near_pairs(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.dedup import simhash_near_pairs as snp
    return snp(_docs_with_ids(sf_dir))


def line_dedup(sf_dir: str) -> "ray.data.Dataset":
    """C4-style corpus-wide line dedup over documents, with the shared
    boilerplate line injected into doc_id % 5 == 0 docs so cross-doc
    duplicates exist (stages/dedup.line_dedup)."""
    from ..stages.dedup import line_dedup as ld
    return ld(_documents_docs(sf_dir), boilerplate_mod=5)


# deterministic C4 testdata decorations (doc_id-keyed, mirrored in SQL)
C4_LINE_TOKENS = 8
C4_PUNCT_MOD = 3    # (doc_id + line) % 3 == 0 lines get NO terminal punct
C4_JS_MOD = 17      # doc_id % 17 docs get a "javascript" line (idx 1)
C4_BRACE_MOD = 23   # doc_id % 23 docs get a "{" (page filter)
C4_LOREM_MOD = 29   # doc_id % 29 docs get "lorem ipsum" (page filter)


def _c4_multiline(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic multi-line view of the (single-line) synthetic docs:
    8-token lines with doc_id-keyed decorations so every C4 rule is
    exercised — the same injection pattern as pii_redact's synthetic PII
    and line_dedup's boilerplate_mod.  Mirrored verbatim in the oracle
    SQL.  Docs with zero tokens produce zero lines and are absent."""
    docs = _documents_docs(sf_dir)

    def aug(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_ids: list[int] = []
        out_text: list[str] = []
        for d, t in zip(ids, texts):
            w = (t or "").lower().split()
            if not w:
                continue
            lines = []
            for g in range(0, -(-len(w) // C4_LINE_TOKENS)):
                line = " ".join(w[g * C4_LINE_TOKENS:
                                  (g + 1) * C4_LINE_TOKENS])
                if d % C4_LOREM_MOD == 0 and g == 0:
                    line = "lorem ipsum " + line
                if d % C4_JS_MOD == 0 and g == 1:
                    line += " javascript needed"
                if d % C4_BRACE_MOD == 0 and g == 0:
                    line += " {"
                if (d + g) % C4_PUNCT_MOD != 0:
                    line += "."
                lines.append(line)
            out_ids.append(d)
            out_text.append("\n".join(lines))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "text": pa.array(out_text, pa.string())})

    return docs.map_batches(aug, batch_format="pyarrow")


def c4_clean(sf_dir: str) -> "ray.data.Dataset":
    """C4 document cleaning (Raffel et al. 2020 §2.2): line keep rules
    (terminal punct, >= 5 words, no javascript) + page filters (no lorem
    ipsum / '{', >= 3 sentences) over the deterministic multi-line view
    (stages/textstats.c4_clean)."""
    from ..stages.textstats import c4_clean as cc
    return cc(_c4_multiline(sf_dir))


def c4_survivors(sf_dir: str) -> "ray.data.Dataset":
    """The cleaned C4 corpus: keep=1 pages as (doc_id, clean_text) —
    the operator's actual output a training pipeline would consume."""

    def fn(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("keep"), 1)
        f = b.filter(keep)
        return pa.table({"doc_id": f.column("doc_id"),
                         "clean_text": f.column("clean_text")})

    return c4_clean(sf_dir).map_batches(fn, batch_format="pyarrow")


def readability(sf_dir: str) -> "ray.data.Dataset":
    """Flesch-Kincaid grade level over the deterministic multi-line pages
    (stages/textstats.fk_readability) — the quality-scoring composition a
    curation pipeline runs after cleaning."""
    from ..stages.textstats import fk_readability as fk
    return fk(_c4_multiline(sf_dir))


# deterministic mojibake injection (doc_id-keyed, mirrored in SQL) —
# suffixes are BUILT from the MOJIBAKE table so both sides share byte
# sequences; _moji() is resolved lazily to keep import order clean
def _moji_suffixes() -> tuple[str, str]:
    from ..stages.textstats import MOJIBAKE
    m = {good: bad for bad, good in MOJIBAKE}
    inj_a = (" caf" + m["é"] + " cr" + m["è"] + "me f" + m["ü"] + "r sch"
             + m["ö"] + "n")
    inj_b = " don" + m["’"] + "t " + m["“"] + "quote" + m["…"]
    return inj_a, inj_b


MOJI_A_MOD = 19
MOJI_B_MOD = 31


def fix_encoding(sf_dir: str) -> "ray.data.Dataset":
    """cp1252-mojibake repair (stages/textstats.fix_encoding) over docs
    with deterministic doc_id-keyed mojibake injected (same pattern as
    the synthetic PII)."""
    from ..stages.textstats import fix_encoding as fe
    inj_a, inj_b = _moji_suffixes()

    def aug(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        t = pc.fill_null(b.column("text"), "")
        a_suf = pa.array(np.where(ids % MOJI_A_MOD == 0, inj_a, ""),
                         pa.string())
        b_suf = pa.array(np.where(ids % MOJI_B_MOD == 0, inj_b, ""),
                         pa.string())
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": pc.binary_join_element_wise(t, a_suf, b_suf, ""),
        })

    docs = _documents_docs(sf_dir).map_batches(aug, batch_format="pyarrow")
    return fe(docs)


# -- text stats -------------------------------------------------------------

def text_stats(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.textstats import text_stats as ts
    return ts(_docs_with_ids(sf_dir)).map_batches(
        lambda b: b.drop_columns(["punct_ratio"]), batch_format="pyarrow")


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.textstats import lang_id as li
    return li(_docs_with_ids(sf_dir))


def freshness(sf_dir: str) -> "ray.data.Dataset":
    from ..config import BUILD_NOW_ISO
    from ..stages.textstats import freshness as fr
    return fr(_docs_with_ids(sf_dir), build_now=BUILD_NOW_ISO)


def rolling_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.textstats import rolling_fingerprints as rf
    return rf(_docs_with_ids(sf_dir))


def winnow_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """Winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm):
    guaranteed-coverage local-minimum sampling of char-8-gram hashes with
    rightmost-tie selection over 4-gram windows — (doc_id, pos, fp)."""
    from ..stages.dedup import winnow_fingerprints as wf
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return wf(docs, k=8, w=4)


GREP_PATTERNS = ["window [a-z]+", "vector|batch", "[0-9]+",
                 "key (order|sort)", "(join|merge) [a-z]{4,}",
                 "\\bscans?\\b"]


def grep_documents(sf_dir: str) -> "ray.data.Dataset":
    """Corpus regex scan (the 'distributed grep' primitive every
    training-data pipeline needs for targeted filtering/auditing):
    (pattern, doc_id, n_matches) for docs with >= 1 non-overlapping match.
    Fully vectorized — one RE2 ``pc.count_substring_regex`` kernel per
    pattern per batch, no per-row Python; DuckDB's regexp_extract_all is
    RE2 too, so the mirror counts identically."""
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b.column("text"), "")
        doc_ids = b.column("doc_id")
        outs = []
        for p in GREP_PATTERNS:
            n = pc.count_substring_regex(text, p)
            keep = pc.greater(n, 0)
            # filter only the columns we emit — filtering the whole batch
            # would copy the matched rows' text strings 6x for nothing
            ids = pc.filter(doc_ids, keep)
            if len(ids):
                outs.append(pa.table({
                    "pattern": pa.array([p] * len(ids), pa.string()),
                    "doc_id": ids,
                    "n_matches": pc.filter(n, keep).cast(pa.int64()),
                }))
        if not outs:
            return pa.table({"pattern": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "n_matches": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    return docs.map_batches(fn, batch_format="pyarrow")


# single source of truth for the containment entry's knobs — the SQL
# mirror interpolates these, so the two sides can't drift
WINNOW_MAX_DF = 3
WINNOW_MIN_SHARED = 3


def winnow_containment(sf_dir: str) -> "ray.data.Dataset":
    """MOSS containment candidates: doc pairs sharing >= WINNOW_MIN_SHARED
    RARE winnowing fingerprints (rarity rule: fp held by <= WINNOW_MAX_DF
    docs — over-common fingerprints are boilerplate AND the structural
    bound on per-fp pair fan-out)."""
    from ..stages.dedup import winnow_containment_pairs
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return winnow_containment_pairs(docs, k=8, w=4,
                                    max_df=WINNOW_MAX_DF,
                                    min_shared=WINNOW_MIN_SHARED)


# -- positional index / phrase search ----------------------------------------

# Fixed phrase set for the driver entry: 2-4 token phrases over the testdata
# vocabulary, including stopword-bearing ("the batch") and repeated-token
# ("batch batch batch") shapes.  The SQL mirror matches each phrase as a
# space-joined-token substring, so the list must stay single-space, lowercase,
# quote-free.
POS_PHRASES = [
    "table scan", "hash join", "sort merge", "the batch",
    "merge data row", "batch batch batch", "the fast key order",
    "slow join sort", "data line join", "vector window batch agg",
]
POS_TERMS = ["batch", "spark", "the", "vector"]

_pos_indexes: dict[str, str] = {}


def get_positional_index(sf_dir: str) -> str:
    """Build (once per process) the positional index over ``documents`` and
    return its directory.  Small docs_per_bucket so even sf0.001's 500 docs
    exercise the multi-bucket fan-out the layout is designed for."""
    key = os.path.abspath(sf_dir)
    if key in _pos_indexes:
        return _pos_indexes[key]
    from ..stages.positions import build_positional_index
    idx = os.path.join(_CACHE_ROOT, f"{hash64(key):08x}-pos")
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"])
        build_positional_index(docs, idx, docs_per_bucket=256)
    _pos_indexes[key] = idx
    return idx


def search_phrase(sf_dir: str) -> "ray.data.Dataset":
    """Exact phrase matches (phrase, doc_id) via positional postings —
    posting intersection + position adjacency, never a text rescan."""
    from ..stages.positions import phrase_match
    idx = get_positional_index(sf_dir)
    return phrase_match(idx, POS_PHRASES).select_columns(
        ["phrase", "doc_id"])


def get_fused_index(sf_dir: str) -> str:
    """Build (once per process) the FUSED index — BM25 segments and the
    positional artifact from ONE corpus scan (build_index with
    cfg.build_positions; the tokenize pre_map side-writes positional
    fragments, a postings-volume compaction publishes
    ``<index>/positions``).  Returns the index dir."""
    key = (os.path.abspath(sf_dir), "fusedpos")
    got = _pos_indexes.get(key)
    if got is not None:
        return got
    tag = f"{hash64(key[0]):08x}-fusedpos"
    cfg = EngineConfig(index_dir=os.path.join(_CACHE_ROOT, tag),
                      num_partitions=16, build_positions=True,
                      positions_docs_per_bucket=256)
    build_index(transcripts_from_documents(sf_dir), cfg,
                source_desc=f"{sf_dir}:fusedpos", resume=True)
    _pos_indexes[key] = cfg.index_dir
    return cfg.index_dir


def search_phrase_fused(sf_dir: str) -> "ray.data.Dataset":
    """`search_phrase` evaluated over the FUSED artifact (one-scan build):
    same phrase list, same oracle — externally pins that the fused
    positional index answers identically to the standalone one."""
    from ..stages.positions import phrase_match
    idx = os.path.join(get_fused_index(sf_dir), "positions")
    return phrase_match(idx, POS_PHRASES).select_columns(
        ["phrase", "doc_id"])


def term_positions(sf_dir: str) -> "ray.data.Dataset":
    """(term, doc_id, npos) straight from the positional index artifact —
    externally oracles the index CONTENTS (npos == surface token count)."""
    from ..stages.positions import term_positions as tp
    return tp(get_positional_index(sf_dir), POS_TERMS)


SNIPPET_TERMS = ["spark", "window"]


def search_snippets(sf_dir: str) -> "ray.data.Dataset":
    """KWIC snippets (±2 tokens around the first occurrence), first
    occurrence located via the positional index."""
    from ..stages.positions import term_snippets
    idx = get_positional_index(sf_dir)
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    # max_broadcast_rows=0 forces the DISTRIBUTED hash-join plan (the
    # head-term / corpus-wide shape) so the driver oracles the scale path;
    # broadcast==join is pinned by test_term_snippets_join_path_equals_*
    return term_snippets(idx, docs, SNIPPET_TERMS, window=2,
                         max_broadcast_rows=0)


# -- dictionary prefix (wildcard) queries -------------------------------------

PREFIXES = ["ba", "s", "wi", "q"]


def prefix_search(sf_dir: str) -> "ray.data.Dataset":
    """Wildcard ``pre*`` dictionary expansion over the plain index's segment
    artifact: (prefix, term, df, cf), row-group-pruned read, posting
    buffers never touched."""
    from ..stages.postings import prefix_term_scan
    eng = get_engine(sf_dir, stem=False)
    return prefix_term_scan(eng.index_dir, PREFIXES)


# -- boolean query semantics ----------------------------------------------------

def search_boolean(sf_dir: str) -> pa.Table:
    """Boolean retrieval: docs matching 'merge' AND 'sort' AND NOT 'window',
    scored by the stage-1 sum over the required terms.  AND = full
    matched_terms count from the same posting intersection the engine
    already computes; NOT = posting-list anti-filter (no text rescan)."""
    eng = get_engine(sf_dir, stem=False)
    rows = eng.score_terms(["merge", "sort"])
    excluded = {r[0] for r in eng.score_terms(["window"])}
    kept = sorted((r[0], round(r[1], 6)) for r in rows
                  if r[2] == 2 and r[0] not in excluded)
    return pa.table({
        "doc_id": pa.array([d for d, _ in kept], pa.int64()),
        "token_score": pa.array([s for _, s in kept], pa.float64()),
    })


# -- hybrid retrieval (lexical + semantic RRF) ---------------------------------

RRF_K = 60          # the standard reciprocal-rank-fusion constant
HYBRID_TOPN = 50    # per-list depth entering the fusion
HYBRID_OUT = 20


def hybrid_rrf(sf_dir: str) -> pa.Table:
    """Hybrid retrieval: reciprocal-rank fusion of the lexical stage-1 list
    (tf·idf over STAGE1_TERMS) and the semantic cosine list (query vec 0).

    score(d) = 1/(60 + lex_rank) + 1/(60 + sem_rank), missing-list
    contribution = 0.  Both inputs are top-``HYBRID_TOPN`` lists ranked on
    the round-6 convention (score DESC, doc_id ASC), so the fusion — two
    divisions and one addition with identical operand order — is bit-equal
    to the SQL mirror before its round-6.  Fusion itself is driver-side on
    two k-bounded lists: that IS the production shape (fusion always runs
    on result pages, never the corpus)."""
    from ..stages.ann import brute_force_topk

    lex = search_stage1(sf_dir)
    lex_rows = sorted(zip(lex.column("doc_id").to_pylist(),
                          lex.column("token_score").to_pylist()),
                      key=lambda r: (-r[1], r[0]))[:HYBRID_TOPN]
    lex_rank = {d: i + 1 for i, (d, _) in enumerate(lex_rows)}

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
    sem_t = _rerank_topk(
        brute_force_topk(emb, [ANN_QUERY_IDS[0]],
                         _query_vecs(sf_dir)[:1], k=HYBRID_TOPN + 10),
        k=HYBRID_TOPN)
    sem_rank = {v: r for v, r in zip(sem_t.column("vec_id").to_pylist(),
                                     sem_t.column("rank").to_pylist())}

    ids = sorted(set(lex_rank) | set(sem_rank))
    fused = []
    for d in ids:
        lr = lex_rank.get(d, 0)
        sr = sem_rank.get(d, 0)
        s = (1.0 / (RRF_K + lr) if lr else 0.0) \
            + (1.0 / (RRF_K + sr) if sr else 0.0)
        fused.append((d, round(s, 6), lr, sr))
    fused.sort(key=lambda r: (-r[1], r[0]))
    fused = fused[:HYBRID_OUT]
    return pa.table({
        "doc_id": pa.array([r[0] for r in fused], pa.int64()),
        "rrf": pa.array([r[1] for r in fused], pa.float64()),
        "lex_rank": pa.array([r[2] for r in fused], pa.int64()),
        "sem_rank": pa.array([r[3] for r in fused], pa.int64()),
    })


# -- collocations --------------------------------------------------------------

def pmi_collocations(sf_dir: str) -> pa.Table:
    """Top-50 adjacent-pair collocations by ln-microunit PMI (min count 5):
    one pre-aggregated pair exchange, cluster-side thresholding."""
    from ..stages.cooc import pmi_collocations as pmi
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return pmi(docs)


# -- quality classifier -------------------------------------------------------

def quality_classifier(sf_dir: str) -> "ray.data.Dataset":
    """CCNet-style NB quality scores: distributed count training (one
    vocab-bounded exchange) + broadcast streaming scoring; ln-microunit
    integer scores so the DuckDB mirror is hash-exact."""
    from ..stages.classifier import nb_quality_scores
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return nb_quality_scores(docs)


# -- graph ------------------------------------------------------------------

def _synthetic_edges(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic SQL-mirrorable reference graph over documents: every doc
    with doc_id % 3 == 0 links to (doc_id * 7 + 13) % N."""
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id"])
    n = docs.count()

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = ids[ids % 3 == 0]
        dst = (src * 7 + 13) % n
        return pa.table({"src_doc_id": pa.array(src, pa.int64()),
                         "dst_doc_id": pa.array(dst, pa.int64())})
    return docs.map_batches(fn, batch_format="pyarrow")


def graph_inlinks(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.graph import inlink_counts
    return inlink_counts(_synthetic_edges(sf_dir))


def _hits_edges(sf_dir: str) -> "ray.data.Dataset":
    """Denser deterministic graph for HITS (the pagerank graph's out-degree
    is ≤1, which collapses hub scores): even docs link to (5id+3)%N and
    (11id+7)%N, plus the pagerank rule's (7id+13)%N for id%3==0."""
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    n = docs.count()

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        even = ids[ids % 2 == 0]
        tri = ids[ids % 3 == 0]
        src = np.concatenate([even, even, tri])
        dst = np.concatenate([(even * 5 + 3) % n, (even * 11 + 7) % n,
                              (tri * 7 + 13) % n])
        return pa.table({"src_doc_id": pa.array(src, pa.int64()),
                         "dst_doc_id": pa.array(dst, pa.int64())})
    return docs.map_batches(fn, batch_format="pyarrow")


def graph_hits(sf_dir: str) -> pa.Table:
    """Kleinberg HITS, 10 unnormalized integer rounds — hash-exact vs the
    20-CTE iterative SQL mirror."""
    from ..stages.graph import hits
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    n = docs.count()
    hub, auth = hits(_hits_edges(sf_dir), n, iterations=10)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "hub": pa.array(hub, pa.int64()),
        "auth": pa.array(auth, pa.int64()),
    })


def graph_pagerank(sf_dir: str) -> pa.Table:
    from ..stages.graph import pagerank
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id"])
    n = docs.count()
    pr = pagerank(_synthetic_edges(sf_dir), n)
    # round-6 (not 9): damping 0.85 over this synthetic graph yields
    # terminating decimals that land EXACTLY on round-9 tie boundaries,
    # where engine-vs-DuckDB summation order flips the digit
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "pagerank": pa.array(np.round(pr, 6), pa.float64()),
    })


# -- relational / events ----------------------------------------------------

def events_window(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour window per event_type: count + exact cents sum."""
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        # emit timestamp[us] explicitly — floor_temporal preserves the source
        # unit (driver compare is dtype-exact vs the DuckDB TIMESTAMP = us)
        hour = pc.floor_temporal(ts, unit="hour").cast(pa.timestamp("us"))
        # floor(x*100 + 0.5): same single IEEE expression as the SQL mirror
        # (pc.round is half-even, DuckDB round is half-away — avoid both)
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            batch.column("value"), 100), 0.5)), pa.int64())
        return pa.table({"window_start": hour,
                         "event_type": batch.column("event_type"),
                         "value_cents": cents})
    agg = ev.map_batches(prep, batch_format="pyarrow").groupby(
        ["window_start", "event_type"]).aggregate(Count(), Sum("value_cents"))
    return agg.map_batches(
        lambda b: pa.table({
            # re-cast: Ray's multi-block aggregate merge can downcast the
            # timestamp key to [s]; the driver compare is dtype-exact (us)
            "window_start": b.column("window_start").cast(pa.timestamp("us")),
            "event_type": b.column("event_type"),
            "n_events": b.column("count()"),
            "sum_value_cents": b.column("sum(value_cents)"),
        }), batch_format="pyarrow")


def sessionize(sf_dir: str) -> "ray.data.Dataset":
    """Gap-based sessionization (30-min gap) per user via groupby.map_groups."""
    GAP_US = 30 * 60 * 1_000_000
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "ts", "user_id", "value"])

    def per_user(group: pa.Table) -> pa.Table:
        group = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = group.column("value").to_numpy(zero_copy_only=False)
        user = group.column("user_id")[0].as_py()
        new_session = np.ones(len(ts), dtype=bool)
        new_session[1:] = (ts[1:] - ts[:-1]) > GAP_US
        bounds = np.flatnonzero(new_session)        # first index per session
        cents = np.floor(vals * 100 + 0.5).astype(np.int64)
        if len(ts):
            starts = ts[bounds]
            counts = np.diff(np.append(bounds, len(ts)))
            sums = np.add.reduceat(cents, bounds)
        else:
            starts = counts = sums = np.empty(0, dtype=np.int64)
        return pa.table({
            "user_id": pa.array([user] * len(starts), pa.int64()),
            "session_start": pa.array(starts, pa.int64()).cast(
                pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
            "sum_value_cents": pa.array(sums, pa.int64()),
        })
    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def join_orders_customers(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast hash join (small side via ray.put) + groupby aggregate."""
    import ray as _ray
    cust = read_parquet_clean(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_mktsegment"])
    seg_map: dict[int, str] = {}
    for b in cust.iter_batches(batch_format="pyarrow"):
        seg_map.update(zip(b.column("c_custkey").to_pylist(),
                           b.column("c_mktsegment").to_pylist()))
    ref = _ray.put(seg_map)

    orders = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_custkey", "o_totalprice"])

    class JoinAgg:
        def __init__(self, ref):
            self._map = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_pylist()
            price = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            cents = np.floor(price * 100 + 0.5).astype(np.int64)
            agg: dict[str, list[int]] = {}
            for k, c in zip(keys, cents.tolist()):
                seg = self._map.get(k)
                if seg is None:
                    continue
                e = agg.setdefault(seg, [0, 0])
                e[0] += 1
                e[1] += c
            return pa.table({
                "mktsegment": pa.array(list(agg.keys()), pa.string()),
                "n": pa.array([v[0] for v in agg.values()], pa.int64()),
                "cents": pa.array([v[1] for v in agg.values()], pa.int64()),
            })

    partial = orders.map_batches(JoinAgg, fn_constructor_args=(ref,),
                                 batch_format="pyarrow", concurrency=(1, 8))
    final = partial.groupby("mktsegment").aggregate(Sum("n"), Sum("cents"))
    return final.map_batches(
        lambda b: pa.table({
            "mktsegment": b.column("mktsegment"),
            "n_orders": b.column("sum(n)"),
            "total_cents": b.column("sum(cents)"),
        }), batch_format="pyarrow")


def lineitem_agg(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H-Q1-shaped aggregate over the largest table: per-batch partial
    aggregation (combiner) before the tiny groupby — the shuffle moves one
    row per (batch, group), not per lineitem."""
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        qty_c = pc.cast(pc.floor(pc.add(pc.multiply(
            batch.column("l_quantity"), 100), 0.5)), pa.int64())
        price_c = pc.cast(pc.floor(pc.add(pc.multiply(
            batch.column("l_extendedprice"), 100), 0.5)), pa.int64())
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty_cents": qty_c,
            "price_cents": price_c,
        })
        agg = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_cents", "sum"), ("price_cents", "sum"),
             ("qty_cents", "count")])
        return pa.table({
            "l_returnflag": agg.column("l_returnflag"),
            "l_linestatus": agg.column("l_linestatus"),
            "qty": agg.column("qty_cents_sum"),
            "price": agg.column("price_cents_sum"),
            "n": agg.column("qty_cents_count").cast(pa.int64()),
        })

    final = li.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty"), Sum("price"), Sum("n"))
    return final.map_batches(
        lambda b: pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "n_items": b.column("sum(n)"),
            "sum_qty_cents": b.column("sum(qty)"),
            "sum_price_cents": b.column("sum(price)"),
        }), batch_format="pyarrow")


def topk_orders(sf_dir: str) -> "ray.data.Dataset":
    orders = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_orderkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "total_cents": pc.cast(pc.floor(pc.add(pc.multiply(
                batch.column("o_totalprice"), 100), 0.5)), pa.int64()),
        })
    return orders.map_batches(cents, batch_format="pyarrow").sort(
        ["total_cents", "o_orderkey"], descending=[True, False]).limit(50)


# -- embeddings -------------------------------------------------------------

ANN_QUERY_IDS = (0, 1)
ANN_K = 10


def _query_vecs(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", list(ANN_QUERY_IDS))])
    by_id = {v: e for v, e in zip(t.column("vec_id").to_pylist(),
                                  t.column("embedding").to_pylist())}
    return np.asarray([by_id[q] for q in ANN_QUERY_IDS], dtype=np.float64)


def _rerank_topk(t: pa.Table, k: int = ANN_K) -> pa.Table:
    """Deterministic re-rank of an over-fetched top-k table on (rounded
    cosine DESC, vec_id ASC), truncated to k — so a DuckDB mirror ranking on
    round-6 cosines agrees at ulp boundaries."""
    rows = sorted(zip(t.column("query_id").to_pylist(),
                      t.column("vec_id").to_pylist(),
                      t.column("cosine").to_pylist()),
                  key=lambda r: (r[0], -round(r[2], 6), r[1]))
    out_q, out_v, out_c, out_r = [], [], [], []
    last_q, rank = None, 0
    for q, v, c in rows:
        rank = rank + 1 if q == last_q else 1
        last_q = q
        if rank > k:
            continue
        out_q.append(q)
        out_v.append(v)
        out_c.append(round(c, 6))
        out_r.append(rank)
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "cosine": pa.array(out_c, pa.float64()),
        "rank": pa.array(out_r, pa.int64()),
    })


def ann_topk(sf_dir: str) -> pa.Table:
    """Exact cosine top-k; over-fetch then deterministic re-rank on (rounded
    cosine DESC, vec_id ASC) so the DuckDB mirror agrees at ulp boundaries."""
    from ..stages.ann import brute_force_topk
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
    t = brute_force_topk(emb, list(ANN_QUERY_IDS), _query_vecs(sf_dir),
                         k=ANN_K + 10)
    return _rerank_topk(t)


def ann_lsh_topk(sf_dir: str) -> pa.Table:
    """LSH top-k over the PHYSICAL layout: build writes the embeddings
    hive-partitioned by signature bucket, search reads only the probed
    Hamming neighborhoods.  Output is identical to the in-stream lsh_topk
    (stored signatures, same mask arithmetic), which stages/ann keeps as
    the no-relayout fallback."""
    import shutil
    import tempfile

    from ..stages.ann import lsh_build, lsh_search
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
    idx = tempfile.mkdtemp(prefix="lsh_idx_")
    try:
        # pinned (not auto-√N): the SQL mirror hard-codes this layout
        lsh_build(emb, idx, bucket_bits=6)
        t = lsh_search(idx, list(ANN_QUERY_IDS), _query_vecs(sf_dir),
                       k=ANN_K + 10)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return _rerank_topk(t)


def ann_ivf_topk(sf_dir: str) -> pa.Table:
    """IVF top-k over the PHYSICAL layout: build writes the embeddings
    hive-partitioned by coarse list id, search reads only the probed
    partitions (scan bytes ∝ n_probe/n_lists).  Output is identical to the
    in-stream ivf_topk (same quantizer, same assignment arithmetic), which
    stages/ann keeps as the no-relayout fallback."""
    import shutil
    import tempfile

    from ..stages.ann import ivf_build, ivf_search
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
    idx = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        # pinned (not auto-√N): the SQL mirror hard-codes the 16-centroid
        # quantizer chain
        ivf_build(emb, idx, n_lists=16)
        t = ivf_search(idx, list(ANN_QUERY_IDS), _query_vecs(sf_dir),
                       k=ANN_K + 10)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return _rerank_topk(t)


def ann_pq_topk(sf_dir: str) -> pa.Table:
    """PQ-compressed ADC top-k (Jégou et al. 2011); scores are rounded
    before ranking on both sides, so no over-fetch/re-rank is needed."""
    from ..stages.ann import pq_topk
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
    return pq_topk(emb, list(ANN_QUERY_IDS), _query_vecs(sf_dir), k=ANN_K)


def embedding_near_dups(sf_dir: str) -> pa.Table:
    from ..stages.ann import cosine_near_dup_pairs
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
    rows = cosine_near_dup_pairs(emb, threshold=0.98).take_all()
    rows.sort(key=lambda r: (r["vec_a"], r["vec_b"]))
    return pa.table({
        "vec_a": pa.array([r["vec_a"] for r in rows], pa.int64()),
        "vec_b": pa.array([r["vec_b"] for r in rows], pa.int64()),
        "cosine": pa.array([round(r["cosine"], 6) for r in rows],
                           pa.float64()),
    })


def _aug_embeddings(sf_dir: str) -> "ray.data.Dataset":
    """embeddings ∪ scaled copies (x1.5, float32 rounding) of the first 25
    vectors at vec_id+100000 — the deterministic near-dup injection shared
    by embedding_near_dups_aug and semdedup_flags (the raw synthetic table
    has no natural near-dups, so without it the dup branch never fires)."""
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))

    def scaled_copies(batch: pa.Table) -> pa.Table:
        import numpy as np
        sel = batch.filter(pc.less(batch.column("vec_id"), 25))
        if sel.num_rows == 0:
            return sel
        emb_col = sel.column("embedding").combine_chunks()
        flat = emb_col.values.to_numpy(zero_copy_only=False)
        scaled = (flat.astype(np.float32) * np.float32(1.5))
        out_emb = pa.ListArray.from_arrays(emb_col.offsets,
                                           pa.array(scaled, pa.float32()))
        cols = {}
        for name in sel.column_names:
            if name == "vec_id":
                cols[name] = pc.add(sel.column("vec_id"), 100000)
            elif name == "embedding":
                cols[name] = out_emb
            else:
                cols[name] = sel.column(name)
        return pa.table(cols)

    return emb.union(emb.map_batches(scaled_copies, batch_format="pyarrow"))


def semdedup_flags(sf_dir: str) -> "ray.data.Dataset":
    """SemDeDup flag matrix (Abbas et al. 2023) over the augmented
    embeddings: k-means clusters (the IVF quantizer), intra-cluster
    pairwise cosine > 0.95 flags duplicates, keep-low-centroid-sim order.
    The 25 injected scaled copies flag against their originals; every
    natural pair exercises the reject branch (max natural cosine ~0.51)."""
    from ..stages.ann import semdedup
    return semdedup(_aug_embeddings(sf_dir), n_lists=16, tau=0.95,
                    train_sample=2048)


def embedding_near_dups_aug(sf_dir: str) -> pa.Table:
    """embedding_near_dups with the threshold path actually exercised: the
    synthetic embeddings table has no natural near-dups (max pairwise cosine
    ~0.51 at sf0.01), so this entry deterministically augments it with scaled
    copies (x1.5, float32 rounding) of the first 25 vectors at vec_id+100000.
    A positive scaling keeps the direction, hence the LSH signature, identical
    — recall of the injected pairs is guaranteed, cosine rounds to 1.0 — while
    every other in-bucket pair exercises the threshold-reject branch."""
    from ..stages.ann import cosine_near_dup_pairs
    rows = cosine_near_dup_pairs(_aug_embeddings(sf_dir),
                                 threshold=0.98).take_all()
    rows.sort(key=lambda r: (r["vec_a"], r["vec_b"]))
    return pa.table({
        "vec_a": pa.array([r["vec_a"] for r in rows], pa.int64()),
        "vec_b": pa.array([r["vec_b"] for r in rows], pa.int64()),
        "cosine": pa.array([round(r["cosine"], 6) for r in rows],
                           pa.float64()),
    })


def validate_turns(sf_dir: str) -> "ray.data.Dataset":
    """Validation filter M5: surviving (non-whitespace-text) doc_ids."""
    from ..stages.textstats import validate_turns as vt
    return vt(_docs_with_ids(sf_dir)).map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow")


ANTIJOIN_PRICE_THRESHOLD = 300_000.0


def customers_without_orders(sf_dir: str) -> pa.Table:
    """Anti-join (reference J5 NOT EXISTS pattern): customers with no order
    above the price threshold.  The qualifying custkey set is computed by a
    DISTRIBUTED filter + per-batch distinct + distinct aggregate — only the
    (small) distinct key set ever reaches the driver, never the orders table —
    then broadcast and anti-filtered against customers (no shuffle join).
    Returned as an explicit-schema Table so an empty result keeps columns."""
    import ray as _ray
    orders = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_custkey", "o_totalprice"])

    def qualifying_keys(batch: pa.Table) -> pa.Table:
        sel = pc.greater(batch.column("o_totalprice"),
                         ANTIJOIN_PRICE_THRESHOLD)
        keys_col = batch.filter(sel).column("o_custkey")
        return pa.table({"o_custkey": pc.unique(
            keys_col.combine_chunks() if isinstance(keys_col, pa.ChunkedArray)
            else keys_col)})

    keys = sorted(set(orders.map_batches(
        qualifying_keys, batch_format="pyarrow").unique("o_custkey")))
    ref = _ray.put(pa.array(keys, pa.int64()))

    class AntiJoin:
        def __init__(self, ref):
            self._keys = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) \
                else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch.column("c_custkey"),
                                      value_set=self._keys))
            return batch.filter(mask).select(["c_custkey", "c_name"])

    cust = read_parquet_clean(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_name"])
    rows = cust.map_batches(AntiJoin, fn_constructor_args=(ref,),
                            batch_format="pyarrow",
                            concurrency=(1, 4)).take_all()
    rows.sort(key=lambda r: r["c_custkey"])
    return pa.table({
        "c_custkey": pa.array([r["c_custkey"] for r in rows], pa.int64()),
        "c_name": pa.array([r["c_name"] for r in rows], pa.string()),
    })


def spellcheck_suggestions(sf_dir: str) -> pa.Table:
    """End-to-end suggestion path over the corpus dictionary (J4 + engine
    acceptance thresholds) for a fixed misspelling set."""
    from ..stages.spellcheck import SpellcheckLexicon, build_dictionary
    lex = SpellcheckLexicon(build_dictionary(_docs_with_ids(sf_dir)))
    inputs = ["tabel", "jion", "mrge", "windwo", "batc", "strem",
              "customer", "zzzzqqq"]
    out = [(w, lex.correct_word(w) or "") for w in inputs]
    return pa.table({
        "word": pa.array([w for w, _ in out], pa.string()),
        "suggestion": pa.array([s for _, s in out], pa.string()),
    })


# -- multimodal plumbing ----------------------------------------------------

def media_features(sf_dir: str) -> "ray.data.Dataset":
    """Multimodal featurization over text-derived payloads — fully
    SQL-mirrored (n_bytes, md5-based payload_hash, nibble-histogram feature
    compare bit-exactly: exact-int divisions on both sides).  The 16-d
    feature is emitted as scalar columns f00..f15 (driver value-hash
    compatibility)."""
    from ..stages.multimodal import featurize_media, media_from_documents
    media = ray.data.from_arrow(media_from_documents(sf_dir, limit=200))
    feats = featurize_media(media)

    def widen(b: pa.Table) -> pa.Table:
        import numpy as _np
        mat = _np.asarray(b.column("feature").to_pylist(), dtype=_np.float64)
        if mat.size == 0:
            mat = mat.reshape(0, 16)
        cols = {name: b.column(name)
                for name in ("doc_id", "media_type", "n_bytes",
                             "payload_hash")}
        for i in range(16):
            cols[f"f{i:02d}"] = pa.array(mat[:, i], pa.float64())
        return pa.table(cols)

    return feats.map_batches(widen, batch_format="pyarrow")


# -- training-data hygiene: decontamination + PII ----------------------------

def _documents_docs(sf_dir: str) -> "ray.data.Dataset":
    """Column-pruned (doc_id, text) read of the documents table."""
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])


DECONTAM_BENCH_MOD = 37     # doc_id % 37 == 0 plays the benchmark/holdout


def _mod_filter(ds: "ray.data.Dataset", mod: int, keep_zero: bool
                ) -> "ray.data.Dataset":
    """Vectorized doc_id % mod filter (Ray's filter-expr grammar has no %)."""

    def fn(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % mod == 0) if keep_zero else (ids % mod != 0)
        return b.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def decontaminate(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, overlap_ngrams): corpus docs sharing >=1 word 8-gram with
    the synthetic benchmark slice (doc_id % 37 == 0)."""
    from ..stages.decontam import benchmark_ngram_overlap
    docs = _documents_docs(sf_dir)
    bench = _mod_filter(docs, DECONTAM_BENCH_MOD, True)
    corpus = _mod_filter(docs, DECONTAM_BENCH_MOD, False)
    return benchmark_ngram_overlap(corpus, bench, n=8)


def bloom_decontaminate(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, bloom_hits): Bloom-filter variant of decontaminate — the
    broadcast scale path (fixed-size bitset of benchmark gram hashes,
    pure streaming corpus filter, no gram-row exchange); flags a SUPERSET
    of the exact-overlap docs (bounded false positives, no false
    negatives)."""
    from ..stages.decontam import bloom_decontaminate as bd
    docs = _documents_docs(sf_dir)
    bench = _mod_filter(docs, DECONTAM_BENCH_MOD, True)
    corpus = _mod_filter(docs, DECONTAM_BENCH_MOD, False)
    return bd(corpus, bench, n=8)


def decontam_survivors(sf_dir: str) -> "ray.data.Dataset":
    """Corpus doc_ids with zero benchmark 8-gram overlap (the training set
    after decontamination) — LEFT ANTI hash join, fully distributed."""
    from ..stages.decontam import decontaminated_survivors
    docs = _documents_docs(sf_dir)
    bench = _mod_filter(docs, DECONTAM_BENCH_MOD, True)
    corpus = _mod_filter(docs, DECONTAM_BENCH_MOD, False)
    return decontaminated_survivors(corpus, bench, n=8)


def dsir_logweights(sf_dir: str) -> "ray.data.Dataset":
    """DSIR importance log-weights (Xie et al. 2023) of every document
    toward the source='src0' stratum as the target distribution — hashed
    uni+bigram bucket models, integer-microunit log-ratios."""
    from ..stages.dsir import dsir_logweights as dlw
    # one column-pruned plan feeds both sides; the target slice (1/20 of
    # the corpus) re-scans rather than materializing raw text — a second
    # streaming parquet scan is the scale-correct price vs pinning the
    # whole text corpus in the object store
    with_src = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"])
    target = with_src.map_batches(
        lambda b: b.filter(pc.equal(b.column("source"),
                                    "src0")).select(["doc_id", "text"]),
        batch_format="pyarrow")
    return dlw(with_src.select_columns(["doc_id", "text"]), target,
               buckets=1024)


def pii_redact(sf_dir: str) -> "ray.data.Dataset":
    """PII scan + redaction over documents with deterministic synthetic PII
    injected (the raw corpus has none; see inject_synthetic_pii)."""
    from ..stages.pii import inject_synthetic_pii, pii_scan_redact
    return pii_scan_redact(inject_synthetic_pii(_documents_docs(sf_dir)))


def span_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc duplicated-span stats (Lee-et-al-style exact-substring
    signal over word 8-grams with corpus frequency > 1)."""
    from ..stages.decontam import duplicated_spans
    return duplicated_spans(_documents_docs(sf_dir), n=8)


def gopher_quality(sf_dir: str) -> "ray.data.Dataset":
    """Gopher/MassiveText whole-doc quality gates (Rae et al. 2021 A1.1)."""
    from ..stages.textstats import gopher_quality as gq
    return gq(_documents_docs(sf_dir))


# survivors bar for the bigram-LM quality filter: sf-testdata ppl spans
# ~24.8-36.0 with median ~28.6, so 28.8 keeps a non-trivial ~55% slice
LM_MAX_PPL = 28.8


def lm_perplexity(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-trained add-alpha bigram-LM perplexity per doc (CCNet-style
    quality scoring, integer-microunit log-probs)."""
    from ..stages.lm import lm_perplexity as lp
    return lp(_documents_docs(sf_dir))


def lm_survivors(sf_dir: str) -> "ray.data.Dataset":
    """Docs clearing the bigram-LM perplexity quality bar."""
    from ..stages.lm import lm_survivors as ls
    return ls(_documents_docs(sf_dir), max_ppl=LM_MAX_PPL)


def embed_documents(sf_dir: str) -> "ray.data.Dataset":
    """Batched embedding generation (deterministic hashed-projection
    encoder in an actor pool; the model-inference plumbing pattern)."""
    from ..stages.embed import embed_documents as ed
    return ed(_documents_docs(sf_dir))


def transcript_tool_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per (role, tool) transcript usage stats — turn count, distinct
    conversations, total text chars: a per-batch combine (groupby inside
    map_batches over the full input-hint columns role/tool/conv_id) then
    one tiny keyed sum over <= roles x tools x batches partial rows; the
    distinct-conv count stays exact because a conversation's turns share
    one (role, tool) cell only within a conv-aligned block boundary —
    so it's computed from per-(role, tool, conv) partials instead,
    keyed shuffle bounded by distinct (role, tool, conv)."""
    from ray.data.aggregate import Sum

    turns = transcripts_from_documents(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        # vectorized per-batch combine — pa.TableGroupBy stays Arrow-native
        # (no pandas copy of the batch's string columns)
        t = pa.table({
            "role": b.column("role"),
            "tool": b.column("tool"),
            "conv_id": b.column("conv_id"),
            "chars": pc.utf8_length(
                pc.fill_null(b.column("text"), "")).cast(pa.int64()),
        })
        g = pa.TableGroupBy(t, ["role", "tool", "conv_id"]).aggregate(
            [("chars", "count"), ("chars", "sum")])
        return pa.table({
            "role": g.column("role"),
            "tool": g.column("tool"),
            "conv_id": g.column("conv_id"),
            "turns": g.column("chars_count").cast(pa.int64()),
            "chars": g.column("chars_sum").cast(pa.int64()),
        })

    per_conv = turns.select_columns(
        ["conv_id", "role", "tool", "text"]).map_batches(
        partial, batch_format="pyarrow").groupby(
        ["role", "tool", "conv_id"]).aggregate(Sum("turns"), Sum("chars"))

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "role" not in b.column_names:
            return pa.table({"role": pa.array([], pa.string()),
                             "tool": pa.array([], pa.string()),
                             "turns": pa.array([], pa.int64()),
                             "convs": pa.array([], pa.int64()),
                             "chars": pa.array([], pa.int64())})
        return pa.table({
            "role": b.column("role"), "tool": b.column("tool"),
            "turns": b.column("sum(turns)").cast(pa.int64()),
            "convs": pa.array(np.ones(b.num_rows, dtype=np.int64),
                              pa.int64()),
            "chars": b.column("sum(chars)").cast(pa.int64())})

    return per_conv.map_batches(fold, batch_format="pyarrow").groupby(
        ["role", "tool"]).aggregate(
        Sum("turns"), Sum("convs"), Sum("chars")).map_batches(
        lambda b: pa.table({
            "role": b.column("role"), "tool": b.column("tool"),
            "turns": b.column("sum(turns)").cast(pa.int64()),
            "convs": b.column("sum(convs)").cast(pa.int64()),
            "chars": b.column("sum(chars)").cast(pa.int64())})
        if b.num_rows and "role" in b.column_names else
        pa.table({"role": pa.array([], pa.string()),
                  "tool": pa.array([], pa.string()),
                  "turns": pa.array([], pa.int64()),
                  "convs": pa.array([], pa.int64()),
                  "chars": pa.array([], pa.int64())}),
        batch_format="pyarrow")


def gopher_repetition(sf_dir: str) -> "ray.data.Dataset":
    """Gopher repetition gates (Rae et al. 2021 A1.1): top-n-gram and
    duplicated-n-gram char fractions in integer microunits + keep flag."""
    from ..stages.textstats import gopher_repetition as gr
    return gr(_documents_docs(sf_dir))


def bpe_merges(sf_dir: str) -> pa.Table:
    """First 8 BPE merge rules learned from the corpus word-frequency
    table (Sennrich et al. 2016) — tokenizer training as a distributed
    iterative pipeline; integer/string only, so hash-exact vs the
    chained-CTE DuckDB mirror."""
    from ..stages.bpe import bpe_train
    return bpe_train(_documents_docs(sf_dir), num_merges=8)


def bpe_token_counts(sf_dir: str) -> "ray.data.Dataset":
    """Corpus token-frequency table after ENCODING with the 8 learned
    merge rules — the tokenizer-application half (what a training-data
    export runs); vocabulary-sized apply + one keyed sum."""
    from ..stages.bpe import bpe_encode_token_counts
    return bpe_encode_token_counts(_documents_docs(sf_dir), num_merges=8)


def curate_corpus(sf_dir: str) -> "ray.data.Dataset":
    """The composed end-to-end curation flagship: doc_ids passing ALL four
    quality gates —

      1. Gopher/MassiveText structural rules (word count, mean word
         length, symbol ratio at the published thresholds) with the
         stopword-presence bar at >= 1: the synthetic corpus contains
         only 'the' from Gopher's 8-stopword list, so the published
         >= 2 bar is unsatisfiable here and would blind the composition
         (the standalone gopher_quality entry keeps the published
         keep rule),
      2. bigram-LM perplexity <= LM_MAX_PPL,
      3. dedup survivorship (exact collapse + MinHash near-dup clusters),
      4. benchmark decontamination (zero 8-gram overlap with the holdout).

    Output is the full per-doc gate MATRIX — (doc_id, gopher_ok, lm_ok,
    dedup_ok, decontam_ok, keep) over every document — rather than just
    the surviving intersection: each gate's pass set stays visible (on
    the harsh synthetic corpus the 4-way intersection is nearly empty,
    which the keep column shows honestly).

    Distribution: each gate's survivor id set (already distinct) unions
    with a zero-flag base of all doc_ids; one ``groupby(doc_id)`` sums
    the one-hot flags — no driver materialization beyond what the
    components themselves do.  Mirrored by LEFT JOINs of the four
    component oracles against the documents table."""
    from ray.data.aggregate import Sum
    from ..stages.textstats import (
        GOPHER_MAX_MEAN_WORD_LEN, GOPHER_MAX_SYMBOL_RATIO, GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MIN_WORDS)

    FLAGS = ("gopher_ok", "lm_ok", "dedup_ok", "decontam_ok")

    def one_hot(ds, flag):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "doc_id" not in b.column_names:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 **{f: pa.array([], pa.int64())
                                    for f in FLAGS}})
            n = b.num_rows
            return pa.table({
                "doc_id": b.column("doc_id").cast(pa.int64()),
                **{f: pa.array(
                    np.full(n, 1 if f == flag else 0, dtype=np.int64),
                    pa.int64()) for f in FLAGS}})
        return ds.map_batches(fn, batch_format="pyarrow")

    def gopher_gate(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(b.column("word_count"),
                                         GOPHER_MIN_WORDS),
                        pc.less_equal(b.column("word_count"),
                                      GOPHER_MAX_WORDS)),
                pc.and_(pc.greater_equal(b.column("mean_word_len"),
                                         GOPHER_MIN_MEAN_WORD_LEN),
                        pc.less_equal(b.column("mean_word_len"),
                                      GOPHER_MAX_MEAN_WORD_LEN))),
            pc.and_(pc.less_equal(b.column("symbol_word_ratio"),
                                  GOPHER_MAX_SYMBOL_RATIO),
                    pc.greater_equal(b.column("stop_hits"), 1)))
        return b.filter(keep)

    base = one_hot(_documents_docs(sf_dir), "__none__")
    gates = [
        one_hot(gopher_quality(sf_dir).map_batches(
            gopher_gate, batch_format="pyarrow"), "gopher_ok"),
        one_hot(lm_survivors(sf_dir), "lm_ok"),
        one_hot(ray.data.from_arrow(near_dedup_survivors(sf_dir)),
                "dedup_ok"),
        one_hot(decontam_survivors(sf_dir), "decontam_ok"),
    ]
    unioned = base
    for g in gates:
        unioned = unioned.union(g)

    def finalize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             **{f: pa.array([], pa.int64()) for f in FLAGS},
                             "keep": pa.array([], pa.int64())})
        flags = {f: b.column(f"sum({f})").to_numpy(zero_copy_only=False)
                 for f in FLAGS}
        keep = np.ones(b.num_rows, dtype=np.int64)
        for f in FLAGS:
            keep &= flags[f]
        return pa.table({
            "doc_id": b.column("doc_id"),
            **{f: pa.array(flags[f], pa.int64()) for f in FLAGS},
            "keep": pa.array(keep, pa.int64())})

    return unioned.groupby("doc_id").aggregate(
        *[Sum(f) for f in FLAGS]).map_batches(
        finalize, batch_format="pyarrow")


# -- round-4 additions: chunking / tf-idf / NFC / incremental dedup ----------

def chunk_documents(sf_dir: str) -> "ray.data.Dataset":
    """Overlapping token-window chunking (stages/chunking.chunk_documents)
    over the documents table — window 32, stride 24."""
    from ..stages.chunking import chunk_documents as cd
    return cd(_documents_docs(sf_dir))


def tfidf_top_terms(sf_dir: str) -> "ray.data.Dataset":
    """Per-document top-5 terms by tf-idf (stages/chunking.tfidf_top_terms),
    [a-z]{2,32} word semantics, ln-microunit idf."""
    from ..stages.chunking import tfidf_top_terms as tt
    return tt(_documents_docs(sf_dir), k=5)


# deterministic decomposed-Unicode injection (doc_id-keyed, mirrored in SQL
# via chr()) — exercises composition on an otherwise-ASCII corpus
NFC_A_MOD = 13          # ' cafe' + U+0301 (combining acute)  -> 'café'
NFC_B_MOD = 21          # ' A'+U+030A+'ngstro'+U+0308+'m'     -> 'Ångström'
_NFC_A_SUF = " café"
_NFC_B_SUF = " Ångström"


def nfc_normalize(sf_dir: str) -> "ray.data.Dataset":
    """Unicode NFC normalization (stages/textstats.nfc_normalize) over docs
    with deterministic decomposed base+combining suffixes injected."""
    from ..stages.textstats import nfc_normalize as nn

    def aug(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        t = pc.fill_null(b.column("text"), "")
        a_suf = pa.array(np.where(ids % NFC_A_MOD == 0, _NFC_A_SUF, ""),
                         pa.string())
        b_suf = pa.array(np.where(ids % NFC_B_MOD == 0, _NFC_B_SUF, ""),
                         pa.string())
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": pc.binary_join_element_wise(t, a_suf, b_suf, ""),
        })

    return nn(_documents_docs(sf_dir).map_batches(aug, batch_format="pyarrow"))


# deterministic duplicate injection for the incremental-dedup entry: docs
# with doc_id % 7 == 3 are remapped to one of 20 shared boilerplate variants
# (variant = doc_id % 20).  The store partition is doc_id % 4 == 0; because
# 20 % 4 == 0, variants with v % 4 != 0 never enter the store (they survive
# with inc_dup_count > 1) while v % 4 == 0 variants are store-hits (their
# whole group is dropped) — both code paths exercised.
INC_BOILER_MOD = 7
INC_BOILER_RES = 3
INC_VARIANTS = 20
INC_STORE_MOD = 4


def incremental_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Increment-vs-store exact dedup (stages/dedup.incremental_dedup_
    survivors): hash store built from the doc_id % 4 == 0 partition, the
    rest replayed as the new ingest increment."""
    from ..stages.dedup import (content_hash_store,
                                incremental_dedup_survivors)

    def aug(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        t = pc.fill_null(b.column("text"), "")
        boiler = pa.array(
            np.char.add("boilerplate variant ",
                        (ids % INC_VARIANTS).astype(str)), pa.string())
        mask = pa.array(ids % INC_BOILER_MOD == INC_BOILER_RES)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": pc.if_else(mask, boiler, t),
        })

    docs = _documents_docs(sf_dir).map_batches(aug, batch_format="pyarrow")
    store = content_hash_store(_mod_filter(docs, INC_STORE_MOD, True))
    incoming = _mod_filter(docs, INC_STORE_MOD, False)
    return incremental_dedup_survivors(incoming, store)


# -- round-4 session-3 additions: proximity / funnels / quantile gate --------

# NEAR/n pairs over the positional index: mixed head ("the") / body terms so
# the entry exercises both fat and thin posting rows.
PROX_PAIRS = [("hash", "join"), ("sort", "merge"), ("spark", "window"),
              ("the", "key")]
PROX_MAX_DIST = 4


def search_proximity(sf_dir: str) -> "ray.data.Dataset":
    """Unordered NEAR/4 retrieval: (term_a, term_b, doc_id, min_dist) via
    positional postings — sorted-array nearest-occurrence distance, never a
    text rescan."""
    from ..stages.positions import pair_proximity
    idx = get_positional_index(sf_dir)
    return pair_proximity(idx, PROX_PAIRS, max_dist=PROX_MAX_DIST)


def search_before(sf_dir: str) -> "ray.data.Dataset":
    """DIRECTED proximity retrieval ("A BEFORE B within 4"): min strictly-
    following distance per doc over the same pair set — the ordered
    variant of NEAR (Lucene SpanNearQuery inOrder=true semantics)."""
    from ..stages.positions import pair_before
    idx = get_positional_index(sf_dir)
    return pair_before(idx, PROX_PAIRS, max_dist=PROX_MAX_DIST)


MLT_SEEDS = [3, 40, 77]
MLT_TERMS = 5
MLT_K = 15


def more_like_this(sf_dir: str) -> pa.Table:
    """More-like-this retrieval (the classic Lucene/ES MLT operator): for
    each seed doc, select its top-``MLT_TERMS`` tf*idf terms (tf from the
    seed's stopworded unstemmed tokens, idf from the index dictionary —
    the same ln((N-df+0.5)/(df+0.5)+1) the stage-1 scorer uses), run the
    standard stage-1 accumulation over that derived query, and keep the
    top-``MLT_K`` OTHER docs per seed.  Term selection tie-break
    (tfidf DESC, term ASC) and result tie-break (score DESC, doc_id ASC)
    are pinned so the DuckDB mirror is hash-exact."""
    from ..functions.text import tokenize
    eng = get_engine(sf_dir, stem=False)
    out = []
    for seed in MLT_SEEDS:
        tf = tokenize(eng.doc_meta(seed)["text"],
                      do_stem=False, drop_stopwords=True)
        cand = []
        for t, n in tf.items():
            st = eng.term_stats(t)
            if st is not None:
                cand.append((-(n * st[2]), t))
        cand.sort()
        terms = [t for _, t in cand[:MLT_TERMS]]
        taken = 0
        for doc_id, score, matched in eng.score_terms(terms):
            if doc_id == seed:
                continue
            out.append((seed, doc_id, round(score, 6), matched))
            taken += 1
            if taken >= MLT_K:
                break
    return pa.table({
        "seed_doc_id": pa.array([r[0] for r in out], pa.int64()),
        "doc_id": pa.array([r[1] for r in out], pa.int64()),
        "mlt_score": pa.array([r[2] for r in out], pa.float64()),
        "matched_terms": pa.array([r[3] for r in out], pa.int64()),
    })


FUNNEL_STEPS = ["view", "click", "purchase"]


def events_funnel(sf_dir: str) -> "ray.data.Dataset":
    """Ordered earliest-completion funnel view→click→purchase per user."""
    from ..stages.temporal import funnel_steps
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "event_type"])
    return funnel_steps(ev, FUNNEL_STEPS)


def events_retention(sf_dir: str) -> "ray.data.Dataset":
    """Weekly cohort retention matrix (cohort_week, week_offset, n_users)."""
    from ..stages.temporal import retention_matrix
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return retention_matrix(ev)


def domain_quality_gate(sf_dir: str) -> "ray.data.Dataset":
    """Per-source median gate over token counts: keep each source's docs at
    or above the source's PERCENTILE_DISC(0.5) token count — the
    drop-the-bottom-half-per-domain curation step, histogram-exact."""
    from ..functions.text import TOKEN_RE
    from ..stages.curation import per_key_quantile_gate

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "source", "text"])

    def prep(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        n = [len(TOKEN_RE.findall((t or "").lower())) for t in texts]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "source": b.column("source"),
            "token_count": pa.array(n, pa.int64()),
        })

    rows = docs.map_batches(prep, batch_format="pyarrow")
    return per_key_quantile_gate(rows, key="source", value_col="token_count",
                                 id_col="doc_id")


def search_facets(sf_dir: str) -> "ray.data.Dataset":
    """Result-set facet counts (the Elasticsearch-aggregations /
    Solr-faceting operator): for the stage-1 match set of STAGE1_TERMS,
    the number of matched turns per ``role`` and per ``tool``.

    Distributed shape: the engine's stage-1 match ids become a Dataset and
    rejoin turn metadata through the bounded hash join (NOT the closed-form
    doc_id arithmetic — the join is the operator under test), then one
    groupby per facet, unioned as (facet, value, n_docs).  In sharded
    serving the same counts come from per-shard partial facet maps merged
    at the coordinator; this entry oracles the aggregation semantics."""
    from ..util import hash_join

    eng = get_engine(sf_dir, stem=False)
    rows = eng.score_terms(list(STAGE1_TERMS))
    matched = ray.data.from_arrow(pa.table({
        "m_doc_id": pa.array(sorted(r[0] for r in rows), pa.int64())}))
    # the id-assigned corpus (production derivation, cached+materialized)
    # already carries (doc_id, role, tool) — reuse it, don't re-derive
    tr = _docs_with_ids(sf_dir).map_batches(
        lambda b: b.select(["doc_id", "role", "tool"]),
        batch_format="pyarrow").materialize()
    m = hash_join(tr, matched, "inner",
                  num_partitions=max(2, tr.num_blocks() // 4),
                  on=("doc_id",), right_on=("m_doc_id",)).materialize()

    def facet(ds, col, name):
        from ray.data.aggregate import Count

        from ..util import coalesce_blocks
        return coalesce_blocks(ds.groupby(col).aggregate(Count())).map_batches(
            lambda b: pa.table({
                "facet": pa.array([name] * b.num_rows, pa.string()),
                "value": b.column(col),
                "n_docs": b.column("count()").cast(pa.int64()),
            }), batch_format="pyarrow")

    return facet(m, "role", "role").union(facet(m, "tool", "tool"))
