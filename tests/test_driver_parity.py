"""The driver-facing pipelines (pipelines/queries.py) vs the oracle on the
documents-derived transcripts — pins the exact path the correctness gate
exercises, including the doc_id == documents.doc_id identity."""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def derived_table():
    from search_engine_ray.sources.transcripts import _docs_batch_to_transcripts
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    return _docs_batch_to_transcripts(docs)


def test_engine_doc_id_equals_documents_doc_id(derived_table):
    import ray.data
    from search_engine_ray.stages.doc_ids import assign_doc_ids
    ds, n = assign_doc_ids(ray.data.from_arrow(derived_table).repartition(4))
    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    assert n == src.num_rows
    got = {(r["conv_id"], r["turn_idx"]): r["doc_id"]
           for r in ds.select_columns(["conv_id", "turn_idx", "doc_id"]
                                      ).take_all()}
    # derivation: conv = doc_id // 8, turn = doc_id % 8
    for doc_id in src.column("doc_id").to_pylist():
        key = (f"conv-{doc_id // 8:06d}", doc_id % 8)
        assert got[key] == doc_id


def test_search_reference_matches_oracle(derived_table):
    from oracle.oracle import OracleIndex
    from search_engine_ray.pipelines.queries import get_engine
    eng = get_engine(SF_DIR, stem=True)
    oi = OracleIndex(derived_table)
    for q in ("merge sort", "window batch stream", "customer filter",
              "vector join", "the and of"):
        a = eng.search(q, limit=20)
        b = oi.search(q, limit=20)
        assert [(r["url"], r["score"], r["matched_terms"]) for r in a] == \
               [(r["url"], r["score"], r["matched_terms"]) for r in b], q


def test_stage1_unstemmed_matches_oracle_formula(derived_table):
    """search_stage1's unstemmed scoring vs a direct per-row recomputation."""
    import math
    from collections import Counter

    from search_engine_ray.functions.text import STOPWORDS, TOKEN_RE
    from search_engine_ray.pipelines.queries import STAGE1_TERMS, search_stage1

    t = search_stage1(SF_DIR)
    got = {d: (s, m) for d, s, m in zip(
        t.column("doc_id").to_pylist(),
        t.column("token_score").to_pylist(),
        t.column("matched_terms").to_pylist())}

    texts = derived_table.column("text").to_pylist()
    n = len(texts)
    tf: list[Counter] = []
    df: Counter = Counter()
    for text in texts:
        toks = [x for x in TOKEN_RE.findall((text or "").lower())
                if x not in STOPWORDS]
        c = Counter(toks)
        tf.append(c)
        df.update(set(c))
    for doc_id in range(n):
        score = 0.0
        matched = 0
        for term in sorted(STAGE1_TERMS):
            if term in tf[doc_id]:
                idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
                score += tf[doc_id][term] * idf
                matched += 1
        if matched:
            assert got[doc_id] == (round(score, 6), matched)
        else:
            assert doc_id not in got


def test_more_like_this_matches_naive(derived_table):
    """more_like_this vs a from-scratch recomputation: term selection
    (tf*idf DESC, term ASC), stage-1 scoring over the derived query, and
    the top-k cut (score DESC, doc_id ASC) all pinned."""
    import math
    from collections import Counter

    from search_engine_ray.functions.text import STOPWORDS, TOKEN_RE
    from search_engine_ray.pipelines.queries import (MLT_K, MLT_SEEDS,
                                                     MLT_TERMS,
                                                     more_like_this)

    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                        columns=["doc_id", "text"])
    texts = {d: t for d, t in zip(src.column("doc_id").to_pylist(),
                                  src.column("text").to_pylist())}
    toks = {d: [w for w in TOKEN_RE.findall((t or "").lower())
                if w not in STOPWORDS] for d, t in texts.items()}
    n = len(texts)
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    idf = {t: math.log((n - d + 0.5) / (d + 0.5) + 1) for t, d in df.items()}

    got = more_like_this(SF_DIR)
    rows = list(zip(got.column("seed_doc_id").to_pylist(),
                    got.column("doc_id").to_pylist(),
                    got.column("mlt_score").to_pylist(),
                    got.column("matched_terms").to_pylist()))
    for seed in MLT_SEEDS:
        tf = Counter(toks[seed])
        cand = sorted(((-(c * idf[t]), t) for t, c in tf.items()))
        terms = [t for _, t in cand[:MLT_TERMS]]
        scored = []
        for d, ts in toks.items():
            if d == seed:
                continue
            dtf = Counter(ts)
            s = sum(dtf[t] * idf[t] for t in terms if dtf[t])
            m = sum(1 for t in terms if dtf[t])
            if m:
                scored.append((d, s, m))
        scored.sort(key=lambda r: (-r[1], r[0]))
        exp = [(seed, d, round(s, 6), m) for d, s, m in scored[:MLT_K]]
        assert [r for r in rows if r[0] == seed] == exp, seed
