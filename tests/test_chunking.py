"""Unit tests for the round-4 stages: document chunking, per-doc tf-idf
top-k, NFC normalization, and increment-vs-store exact dedup."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def _rows(ds):
    return sorted(tuple(r.values()) for r in ds.take_all())


# -- chunk_documents ----------------------------------------------------------

def test_chunk_windows_and_overlap():
    from search_engine_ray.stages.chunking import chunk_documents
    words = [f"w{c}" for c in "abcdefghij"]
    ds = chunk_documents(_docs([(1, " ".join(words))]), window=4, stride=3)
    got = {(r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
           for r in ds.take_all()}
    # 10 words, stride 3 -> ceil(10/3) = 4 chunks; starts 0,3,6,9
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == (4, "wa wb wc wd")
    assert got[1] == (4, "wd we wf wg")       # 1-token overlap
    assert got[2] == (4, "wg wh wi wj")
    assert got[3] == (1, "wj")                # short tail, no padding


def test_chunk_empty_and_nonword_docs():
    from search_engine_ray.stages.chunking import chunk_documents
    ds = chunk_documents(_docs([(1, ""), (2, "1234 !!"), (3, "one two")]),
                         window=4, stride=3)
    rows = ds.take_all()
    assert {r["doc_id"] for r in rows} == {3}
    assert rows[0]["chunk_text"] == "one two"


def test_chunk_uses_m10_word_semantics():
    from search_engine_ray.stages.chunking import chunk_documents
    # uppercase folded, digits/punct split words, 1-char words dropped
    ds = chunk_documents(_docs([(1, "Foo-BAR x baz42qux")]),
                         window=8, stride=8)
    assert ds.take_all()[0]["chunk_text"] == "foo bar baz qux"


# -- tfidf_top_terms ----------------------------------------------------------

def test_tfidf_scores_and_ranks():
    from search_engine_ray.stages.chunking import tfidf_top_terms
    # "apple" in 1/3 docs, "pear" in 2/3, "the" in all 3
    ds = tfidf_top_terms(_docs([
        (1, "apple apple pear the"),
        (2, "pear the"),
        (3, "the"),
    ]), k=2)
    by_doc = {}
    for r in ds.take_all():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["rank"])

    micro = lambda x: int(np.floor(x * 1e6 + 0.5))
    assert [(r["word"], r["tf"], r["tfidf_micro"]) for r in by_doc[1]] == [
        ("apple", 2, 2 * micro(math.log(3 / 1))),
        ("pear", 1, 1 * micro(math.log(3 / 2))),
    ]
    assert by_doc[2][0]["word"] == "pear"
    # idf(the) = ln(1) = 0 -> score 0, still rankable
    assert [(r["word"], r["tfidf_micro"]) for r in by_doc[3]] == [("the", 0)]


def test_tfidf_tie_breaks_word_ascending():
    from search_engine_ray.stages.chunking import tfidf_top_terms
    ds = tfidf_top_terms(_docs([(1, "zeta alpha"), (2, "other")]), k=1)
    rows = [r for r in ds.take_all() if r["doc_id"] == 1]
    assert len(rows) == 1 and rows[0]["word"] == "alpha"


# -- nfc_normalize ------------------------------------------------------------

def test_nfc_composes_and_flags():
    from search_engine_ray.stages.textstats import nfc_normalize
    decomposed = "café Ångström"
    ds = nfc_normalize(_docs([(1, "plain ascii"), (2, decomposed),
                              (3, "café already composed")]))
    got = {r["doc_id"]: (r["text"], r["changed"]) for r in ds.take_all()}
    assert got[1] == ("plain ascii", False)
    assert got[2] == ("café Ångström", True)
    assert got[3] == ("café already composed", False)


def test_nfc_all_ascii_batch_fast_path():
    from search_engine_ray.stages.textstats import nfc_normalize
    ds = nfc_normalize(_docs([(i, f"doc {i}") for i in range(8)]))
    assert all(not r["changed"] for r in ds.take_all())


# -- incremental_dedup_survivors ---------------------------------------------

def test_incremental_dedup_against_store():
    from search_engine_ray.stages.dedup import (content_hash_store,
                                                incremental_dedup_survivors)
    store = content_hash_store(_docs([(100, "old page"), (101, "shared")]))
    incoming = _docs([
        (1, "fresh unique"),
        (2, "shared"),          # store hit -> whole group dropped
        (3, "twice"), (4, "twice"),   # in-increment dup, no store hit
        (5, "shared"),          # same store hit, also dropped
    ])
    got = _rows(incremental_dedup_survivors(incoming, store))
    assert got == [(1, 1), (3, 2)]


def test_incremental_dedup_empty_store_matches_exact():
    from search_engine_ray.stages.dedup import (content_hash_store,
                                                incremental_dedup_survivors)
    docs = _docs([(1, "a"), (2, "b"), (3, "a")])
    empty = ray.data.from_arrow(pa.table({
        "content_hash": pa.array([], pa.int64())}))
    got = _rows(incremental_dedup_survivors(docs, empty))
    assert got == [(1, 2), (2, 1)]


# -- domain_stats -------------------------------------------------------------

def test_domain_stats_cross_batch_merge():
    """The per-batch partial aggregation must merge correctly across blocks
    (Sum of partial counts, Min of partial first ids)."""
    from search_engine_ray.pipelines.queries import domain_stats
    got = {r["domain"]: (r["n_docs"], r["n_words_total"], r["first_doc_id"])
           for r in domain_stats("/root/testdata/sf0.001").take_all()}
    # templates 0 and 5 both resolve to example.com -> 2 of every 6 docs
    assert got["example.com"][0] == 2 * 500 // 6 + (1 if 500 % 6 > 0 else 0)
    assert sum(v[0] for v in got.values()) == 500
    assert got["example.com"][2] == 0          # doc_id 0 uses template 0
    assert got["example.co.uk"][2] == 1
    assert all(v[1] > 0 for v in got.values())


def test_winnow_fingerprints_guarantee_and_ties():
    """Winnowing (MOSS): (a) engine batch output is selected-minimum
    correct vs a brute-force reference incl. RIGHTMOST tie-break, (b) the
    coverage guarantee holds — two docs sharing a substring of length
    >= k + w - 1 share at least one (relative-position-aligned) selected
    hash, (c) docs with < w grams emit nothing."""
    import numpy as np
    import pyarrow as pa

    from search_engine_ray.functions.hashing import md5_hash64
    from search_engine_ray.stages.dedup import _winnow_batch

    K, W = 8, 4
    shared = "zzcommon shared span of text zz"
    texts = ["prefix one " + shared + " suffix alpha",
             "totally different head " + shared + " tail omega",
             "aaaaaaaaaaaaaaaa", "tiny", ""]
    ids = list(range(len(texts)))
    out = _winnow_batch(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}), k=K, w=W)
    by_doc: dict = {}
    for d, p, f in zip(out.column("doc_id").to_pylist(),
                       out.column("pos").to_pylist(),
                       out.column("fp").to_pylist()):
        by_doc.setdefault(d, set()).add((p, f))

    def ref(text):
        lt = text.lower()
        grams = [lt[i:i + K] for i in range(max(0, len(lt) - K + 1))]
        hs = [md5_hash64(g) for g in grams]          # UNSIGNED comparison
        sel = set()
        for s in range(len(grams) - W + 1):
            win = hs[s:s + W]
            m = min(win)
            j = max(i for i, v in enumerate(win) if v == m)
            sel.add((s + j + 1, int(np.uint64(m).view(np.int64))))
        return sel

    for d, t in zip(ids, texts):
        assert by_doc.get(d, set()) == ref(t), d
    assert 2 not in by_doc or by_doc[2]          # tie-heavy doc still works
    assert 3 not in by_doc and 4 not in by_doc   # < w grams -> nothing
    # coverage guarantee: aligned shared fingerprint between docs 0 and 1
    fps0 = {f for _, f in by_doc[0]}
    fps1 = {f for _, f in by_doc[1]}
    assert fps0 & fps1


def test_winnow_containment_pairs_vs_brute_force():
    """MOSS containment pipeline == brute force over the same rarity rule:
    pairs sharing >= min_shared fingerprints each held by <= max_df docs;
    a planted shared span must surface, boilerplate shared by ALL docs
    must not."""
    import itertools

    import pyarrow as pa
    import ray.data

    from search_engine_ray.stages.dedup import (_winnow_batch,
                                                winnow_containment_pairs)

    common = "boilerplate header shared by every single document here"
    span = "zzneedle copied span of several words zz"
    texts = [
        common + " alpha unique body " + span,
        common + " beta other words " + span + " tail",
        common + " gamma totally different first body",
        common + " delta entirely separate second payload",
    ]
    ids = list(range(len(texts)))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    K, W, MAX_DF, MIN_SHARED = 8, 4, 2, 2

    got = sorted(
        (r["doc_a"], r["doc_b"], r["shared_fps"])
        for r in winnow_containment_pairs(
            ray.data.from_arrow(tbl).repartition(2), k=K, w=W,
            max_df=MAX_DF, min_shared=MIN_SHARED).take_all())

    wf = _winnow_batch(tbl, k=K, w=W)
    by_doc: dict = {}
    for d, f in zip(wf.column("doc_id").to_pylist(),
                    wf.column("fp").to_pylist()):
        by_doc.setdefault(d, set()).add(f)
    df_count: dict = {}
    for d, fps in by_doc.items():
        for f in fps:
            df_count[f] = df_count.get(f, 0) + 1
    want = []
    for a, b in itertools.combinations(ids, 2):
        shared = [f for f in by_doc[a] & by_doc[b]
                  if df_count[f] <= MAX_DF]
        if len(shared) >= MIN_SHARED:
            want.append((a, b, len(shared)))
    assert got == sorted(want)
    assert any(p[:2] == (0, 1) for p in got)          # planted span pair
    # the all-docs boilerplate alone must NOT connect the unrelated docs
    assert not any(p[:2] == (2, 3) for p in got)


def test_grep_documents_match_counts(tmp_path):
    """grep_documents: per-pattern non-overlapping RE2 match counts equal
    Python re.findall over the same patterns; zero-match (pattern, doc)
    rows are absent; None text is empty."""
    import re as _re

    import pyarrow.parquet as pq

    from search_engine_ray.pipelines import queries as Q

    texts = ["the window opens a window view", "vector batch vector",
             "a1 b22 c333", None, "", "key order and key sort here",
             "deep join merge paths scan scans"]
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), f"{sf}/documents.parquet")

    got = sorted(
        (r["pattern"], r["doc_id"], r["n_matches"])
        for r in Q.grep_documents(sf).take_all())
    want = []
    for p in Q.GREP_PATTERNS:
        rx = _re.compile(p)
        for i, t in enumerate(texts):
            n = len(rx.findall(t or ""))
            if n:
                want.append((p, i, n))
    assert got == sorted(want)
    assert any(p == "\\bscans?\\b" for p, _, _ in got)   # \b exercised
