"""Oracle tests for the non-search stages: dedup, graph, spellcheck,
text stats, ANN, multimodal plumbing (SURVEY.md §5.3-5.4)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from oracle.oracle import oracle_pagerank, oracle_word_counts
from search_engine_ray.functions.simhash import simhash_text
from search_engine_ray.stages.doc_ids import assign_doc_ids


@pytest.fixture(scope="module")
def docs_ds(tiny_transcripts):
    ds, _ = assign_doc_ids(ray.data.from_arrow(tiny_transcripts).repartition(4))
    return ds.materialize()


@pytest.fixture(scope="module")
def docs_rows(tiny_transcripts):
    rows = tiny_transcripts.to_pylist()
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    return rows      # doc_id == index


# -- dedup ------------------------------------------------------------------

def test_exact_dedup_vs_bruteforce(docs_ds, docs_rows):
    from search_engine_ray.stages.dedup import exact_dedup_groups
    got = {r["canonical_doc_id"]: r["dup_count"]
           for r in exact_dedup_groups(docs_ds).take_all()}
    groups: dict[str, list[int]] = {}
    for i, r in enumerate(docs_rows):
        groups.setdefault(r["text"], []).append(i)
    expect = {min(v): len(v) for v in groups.values()}
    assert got == expect
    assert any(c > 1 for c in got.values())     # fixture plants exact dups


def test_fingerprints_match_scalar(docs_ds, docs_rows):
    from search_engine_ray.stages.dedup import fingerprints
    got = {r["doc_id"]: r["fingerprint"]
           for r in fingerprints(docs_ds).take_all()}
    for doc_id in (0, 1, len(docs_rows) // 2, len(docs_rows) - 1):
        assert got[doc_id] == simhash_text(docs_rows[doc_id]["text"])


def test_minhash_near_dups_collapse_and_soundness(docs_ds, docs_rows):
    """Near-dup pairs are reported over distinct-text REPRESENTATIVES (min
    doc_id per exact-dup class); exact-dup membership lives in
    exact_dedup_groups.  Identical-token-set classes must still surface as a
    jaccard-1.0 pair between their two class representatives."""
    from search_engine_ray.stages.dedup import minhash_near_dups
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in minhash_near_dups(docs_ds, threshold=0.95).take_all()}
    groups: dict[str, list[int]] = {}
    for i, r in enumerate(docs_rows):
        if r["text"].strip():
            groups.setdefault(r["text"], []).append(i)
    assert any(len(v) > 1 for v in groups.values()), "fixture plants dups"
    canon = {text: min(ids) for text, ids in groups.items()}
    # no pair may connect two members of the same exact-dup class, and only
    # class representatives may appear at all
    reps = set(canon.values())
    for a, b in pairs:
        assert docs_rows[a]["text"] != docs_rows[b]["text"]
        assert a in reps and b in reps
    # identical token SETS with different raw text (distinct classes) must be
    # found as jaccard-1.0 rep pairs
    by_tokset: dict[frozenset, list[int]] = {}
    for text, rep in canon.items():
        ts = frozenset(text.lower().split())
        if ts:
            by_tokset.setdefault(ts, []).append(rep)
    for rep_ids in by_tokset.values():
        rep_ids.sort()
        for i in range(1, len(rep_ids)):
            assert pairs.get((rep_ids[0], rep_ids[i])) == pytest.approx(1.0)
    # soundness: every reported pair really has Jaccard >= threshold
    for (a, b), j in pairs.items():
        sa = set(docs_rows[a]["text"].lower().split())
        sb = set(docs_rows[b]["text"].lower().split())
        true_j = len(sa & sb) / len(sa | sb)
        assert j == pytest.approx(true_j)
        assert true_j >= 0.95


def test_minhash_mass_duplicate_blowup_guard():
    """10k byte-identical docs collapse to one representative: candidate
    generation stays O(n), produces zero pairs, and finishes fast."""
    import time
    from search_engine_ray.stages.dedup import minhash_candidate_pairs
    n = 10_000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["the same boilerplate text repeated verbatim"] * n),
    })
    t0 = time.time()
    pairs = minhash_candidate_pairs(
        ray.data.from_arrow(t).repartition(8)).take_all()
    assert pairs == []
    assert time.time() - t0 < 60


def test_simhash_near_pairs_sound(docs_ds, docs_rows):
    from search_engine_ray.functions.simhash import hamming64
    from search_engine_ray.stages.dedup import simhash_near_pairs
    rows = simhash_near_pairs(docs_ds, max_hamming=3).take_all()
    assert rows, "exact dups guarantee hamming-0 pairs"
    for r in rows:
        ha = simhash_text(docs_rows[r["doc_a"]]["text"])
        hb = simhash_text(docs_rows[r["doc_b"]]["text"])
        assert hamming64(ha, hb) == r["hamming"] <= 3


# -- graph ------------------------------------------------------------------

def test_graph_edges_and_pagerank_vs_oracle(docs_ds, docs_rows):
    from search_engine_ray.stages.graph import (extract_mention_edges,
                                                inlink_counts, pagerank,
                                                resolve_edges)
    raw = extract_mention_edges(docs_ds)
    resolved = resolve_edges(raw, docs_ds).materialize()
    edges = [(r["src_doc_id"], r["dst_doc_id"]) for r in resolved.take_all()]
    assert edges, "fixture plants mention markers"

    # oracle edge extraction: regex over rows + key resolution, dangling drop
    import re
    mention = re.compile(r"\bsee (conv-\d{6})#(\d+)\b")
    key_to_id = {(r["conv_id"], r["turn_idx"]): i
                 for i, r in enumerate(docs_rows)}
    expect = set()
    for i, r in enumerate(docs_rows):
        for conv, turn in mention.findall(r["text"] or ""):
            tgt = key_to_id.get((conv, int(turn)))
            if tgt is not None:
                expect.add((i, tgt))
    assert set(edges) == expect

    n = len(docs_rows)
    got_in = {r["doc_id"]: r["inlink_count"]
              for r in inlink_counts(resolved).take_all()}
    pr = pagerank(resolved, n)
    o_pr, o_in = oracle_pagerank(list(range(n)), edges)
    for d, c in o_in.items():
        assert got_in.get(d, 0) == c
    assert np.allclose(pr, [o_pr[i] for i in range(n)], rtol=1e-9, atol=1e-12)


def test_pagerank_dataset_path_equals_dense(docs_ds):
    """The fully distributed rank-as-Dataset path (used beyond
    MAX_DENSE_NODES) must match the dense broadcast path bit-for-bit-ish;
    also exercised via the lowered-cap cutover inside pagerank()."""
    from search_engine_ray.stages.graph import (extract_mention_edges,
                                                pagerank, pagerank_dataset,
                                                resolve_edges)
    resolved = resolve_edges(extract_mention_edges(docs_ds),
                             docs_ds).materialize()
    n = docs_ds.count()
    dense = pagerank(resolved, n)
    ds_path = np.zeros(n)
    for r in pagerank_dataset(resolved, n, num_partitions=2).take_all():
        ds_path[r["doc_id"]] = r["pagerank"]
    assert np.allclose(dense, ds_path, rtol=1e-12, atol=1e-15)
    # cutover inside pagerank() with an artificially lowered cap
    via_cutover = pagerank(resolved, n, max_dense_nodes=1)
    assert np.allclose(dense, via_cutover, rtol=1e-12, atol=1e-15)


# -- embedding near-dups ----------------------------------------------------

def test_cosine_near_dup_pairs_finds_planted():
    """Planted near-identical vectors must surface as pairs; random vectors
    must not (threshold 0.95)."""
    from search_engine_ray.stages.ann import cosine_near_dup_pairs
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, 32))
    vecs[150] = vecs[50] + 0.01 * rng.standard_normal(32)   # planted twin
    vecs[151] = vecs[50]                                     # exact dup
    t = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs])})
    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"]
             for r in cosine_near_dup_pairs(
                 ray.data.from_arrow(t).repartition(4),
                 threshold=0.95).take_all()}
    assert (50, 150) in pairs and pairs[(50, 150)] > 0.99
    assert (50, 151) in pairs and pairs[(50, 151)] == pytest.approx(1.0)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for (a, b), c in pairs.items():
        assert c == pytest.approx(sims[a, b])
        assert c >= 0.95


# -- doc ids ----------------------------------------------------------------

def test_doc_id_join_path_equals_broadcast(tiny_transcripts):
    """Distributed-join assigner (the beyond-broadcast-cap scale path) must
    produce identical ids to the broadcast path, including via the automatic
    cutover with an artificially lowered cap."""
    from search_engine_ray.stages.doc_ids import (assign_doc_ids,
                                                  assign_doc_ids_join)
    src = ray.data.from_arrow(tiny_transcripts).repartition(4)

    def ids_of(ds):
        return sorted((r["conv_id"], r["turn_idx"], r["doc_id"])
                      for r in ds.take_all())

    bcast_ds, n_b = assign_doc_ids(src)
    join_ds, n_j = assign_doc_ids_join(src, num_partitions=4)
    assert n_b == n_j
    assert ids_of(bcast_ds) == ids_of(join_ds)
    # automatic cutover when the broadcast cap is exceeded
    cut_ds, n_c = assign_doc_ids(src, max_broadcast_convs=1)
    assert n_c == n_b
    assert ids_of(cut_ds) == ids_of(bcast_ds)


def test_doc_id_join_path_contiguity_guard():
    from search_engine_ray.stages.doc_ids import assign_doc_ids_join
    import pyarrow as _pa
    bad = _pa.table({"conv_id": ["c1", "c1"], "turn_idx": _pa.array(
        [0, 2], _pa.int32()), "text": ["a", "b"]})
    # Ray wraps worker-side ValueError in RayTaskError(UserCodeException)
    with pytest.raises(Exception, match="not contiguous"):
        assign_doc_ids_join(ray.data.from_arrow(bad))[0].take_all()


def test_resolve_edges_join_equals_broadcast(docs_ds):
    """Hash-join edge resolution (the beyond-50M-docs path) must produce the
    identical edge set, incl. via the automatic cutover at a lowered cap."""
    from search_engine_ray.stages.graph import (extract_mention_edges,
                                                resolve_edges,
                                                resolve_edges_join)
    raw = extract_mention_edges(docs_ds).materialize()
    bcast = sorted((r["src_doc_id"], r["dst_doc_id"])
                   for r in resolve_edges(raw, docs_ds).take_all())
    joined = sorted((r["src_doc_id"], r["dst_doc_id"])
                    for r in resolve_edges_join(
                        raw, docs_ds, num_partitions=4).take_all())
    assert bcast == joined
    cutover = sorted((r["src_doc_id"], r["dst_doc_id"])
                     for r in resolve_edges(raw, docs_ds,
                                            max_broadcast_docs=1).take_all())
    assert bcast == cutover


# -- spellcheck -------------------------------------------------------------

def test_word_counts_vs_oracle(docs_ds, docs_rows):
    from search_engine_ray.stages.spellcheck import word_counts
    got = {r["word"]: r["total_frequency"]
           for r in word_counts(docs_ds).take_all()}
    expect = oracle_word_counts([r["text"] for r in docs_rows])
    assert got == dict(expect)


def test_dictionary_and_suggestions(docs_ds, tmp_path):
    from search_engine_ray.sources.wordlists import (
        collect_external_frequencies, write_fixture_wordlists)
    from search_engine_ray.stages.spellcheck import (SpellcheckLexicon,
                                                     build_dictionary)
    sources = write_fixture_wordlists(str(tmp_path / "wl"))
    ext = collect_external_frequencies(sources)
    assert ext["extwordaaa"] > 0 and ext["rankwordaaa"] > 0
    assert "nocount" not in ext and "a" not in ext     # malformed skipped

    d = build_dictionary(docs_ds, dict(ext))
    words = set(d.column("word").to_pylist())
    # dictionary is alpha-only ([a-z]{2,32} + isalpha filter): the Zipf
    # vocab "word0001" contributes only "word"
    assert "word" in words and "running" in words
    assert not any(any(c.isdigit() for c in w) for w in words)

    lex = SpellcheckLexicon(d)
    # corpus word misspelled by one edit -> corrected
    assert lex.correct_word("runninng") == "running"
    # known word with no drastically-more-popular neighbor stays
    assert lex.correct_word("running") is None
    # case preservation through correct_text
    assert lex.correct_text("Runninng").startswith("Running")


def test_meta_file_roundtrip(docs_ds, tmp_path):
    from search_engine_ray.stages.spellcheck import (build_dictionary,
                                                     load_meta_file,
                                                     write_meta_file)
    d = build_dictionary(docs_ds)
    path = write_meta_file(d, str(tmp_path / "meta.json"), max_words=50)
    lex = load_meta_file(path)
    # top-50 cap respected and lookups work from the warm-cache artifact
    assert lex.correct_word("runninng") in ("running", None)
    assert len(lex._entries) == min(50, d.num_rows)


def test_symspell_deletes_vs_bruteforce(docs_ds):
    """The BFS generate_deletes set (reference engine.py:37-52) equals the
    brute-force model: every distinct subsequence at length len-1 / len-2."""
    import itertools
    from search_engine_ray.stages.spellcheck import (build_dictionary,
                                                     symspell_deletes)
    d = build_dictionary(docs_ds)
    got = {(r["word"], r["variant"], r["distance"])
           for r in symspell_deletes(d).take_all()}
    expect = set()
    for w in d.column("word").to_pylist():
        for dd in (1, 2):
            if len(w) < 2 or len(w) - dd < 1:
                continue
            for keep in itertools.combinations(range(len(w)), len(w) - dd):
                expect.add((w, "".join(w[i] for i in keep), dd))
    assert got == expect


def test_symspell_delete_join_completeness():
    """SymSpell guarantee the candidate join relies on, gated exactly the way
    choose_correction gates candidates: for input q and word w with
    OSA(q,w) <= 2 AND (len(q) > 3 or distance <= 1), the delete-variant sets
    (each including the string itself) intersect.  The reference's expansion
    cutoff (items shorter than 2 chars are never expanded, engine.py:42-43)
    breaks the naive ungated guarantee only for 2-char strings at distance 2
    ('ab' vs 'ed' share no variant) — and those pairs are exactly the ones
    the len<=3 acceptance rule rejects before candidates matter."""
    import random
    from search_engine_ray.functions.osa import osa_distance
    from search_engine_ray.stages.spellcheck import _delete_variants
    rng = random.Random(42)
    alpha = "abcdefg"
    base_words = ["table", "running", "search", "ab", "abc", "aaaa",
                  "abcdefgh"]
    checked = 0
    for _ in range(300):
        a = rng.choice(base_words)
        b = list(a)
        for _e in range(rng.randint(0, 2)):
            op = rng.choice(("sub", "del", "ins", "swap"))
            if op == "sub" and b:
                i = rng.randrange(len(b)); b[i] = rng.choice(alpha)
            elif op == "del" and len(b) > 1:
                del b[rng.randrange(len(b))]
            elif op == "ins":
                b.insert(rng.randrange(len(b) + 1), rng.choice(alpha))
            elif op == "swap" and len(b) > 1:
                i = rng.randrange(len(b) - 1)
                b[i], b[i + 1] = b[i + 1], b[i]
        b = "".join(b)
        dist = osa_distance(a, b)
        if a == b or dist is None or len(b) < 2:
            continue
        # both directions: each string as the query-side input
        for q, w in ((a, b), (b, a)):
            if len(q) <= 3 and dist > 1:
                continue    # choose_correction rejects these outright
            sq = _delete_variants(q) | {q}
            sw = _delete_variants(w) | {w}
            assert sq & sw, (q, w, dist)
            checked += 1
    assert checked > 200


def test_symspell_lookup_equals_bruteforce(docs_ds):
    """Delete-join candidates cover every word within OSA distance 2
    (completeness above), so the lookup must equal choose_correction run
    against the ENTIRE dictionary."""
    from search_engine_ray.functions.osa import LexiconEntry, choose_correction
    from search_engine_ray.stages.spellcheck import (build_dictionary,
                                                     symspell_lookup)
    d = build_dictionary(docs_ds)
    entries = {w: LexiconEntry(w, int(df), int(tf), int(e), float(p))
               for w, df, tf, e, p in zip(
                   d.column("word").to_pylist(),
                   d.column("doc_frequency").to_pylist(),
                   d.column("total_frequency").to_pylist(),
                   d.column("external_frequency").to_pylist(),
                   d.column("popularity_score").to_pylist())}
    inputs = ["runninng", "wrod", "zzzzqqq", "running", "ab", "tabel"]
    got = symspell_lookup(d, inputs)
    for w, s in zip(got.column("word").to_pylist(),
                    got.column("suggestion").to_pylist()):
        brute = choose_correction(word=w, known=entries.get(w),
                                  candidates=list(entries.values()))
        assert (brute or "") == s, (w, s, brute)


# -- text stats -------------------------------------------------------------

def test_text_stats_vs_scalar(docs_ds, docs_rows):
    from search_engine_ray.functions.text import STOPWORDS, TOKEN_RE
    from search_engine_ray.stages.textstats import text_stats
    got = {r["doc_id"]: r for r in text_stats(docs_ds).take_all()}
    for doc_id in (0, 5, len(docs_rows) - 1):
        t = docs_rows[doc_id]["text"]
        toks = TOKEN_RE.findall(t.lower())
        assert got[doc_id]["word_count"] == len(t.split())
        assert got[doc_id]["token_count"] == len(toks)
        assert got[doc_id]["stopword_count"] == sum(
            1 for x in toks if x in STOPWORDS)


def test_lang_id_markers():
    from search_engine_ray.stages.textstats import lang_id
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "the cat and the dog of it is that",
            "el perro la casa es una para los",
            "zzz qqq xxx",
            "der hund die katze und das ist",
        ], pa.string()),
    })
    got = {r["doc_id"]: r["lang"]
           for r in lang_id(ray.data.from_arrow(t)).take_all()}
    assert got == {0: "en", 1: "es", 2: "unk", 3: "de"}


# -- ANN --------------------------------------------------------------------

def _rand_embeddings(n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim))
    # plant a near-duplicate pair
    vecs[10] = vecs[7] + rng.standard_normal(dim) * 1e-3
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    })


def test_brute_force_topk_vs_numpy():
    from search_engine_ray.stages.ann import brute_force_topk
    t = _rand_embeddings()
    ds = ray.data.from_arrow(t).repartition(4)
    q = np.asarray(t.column("embedding").to_pylist()[:2], dtype=np.float64)
    got = brute_force_topk(ds, [0, 1], q, k=5)

    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ vn.T
    for qi in (0, 1):
        expect = sorted(range(len(vecs)), key=lambda j: (-sims[qi, j], j))[:5]
        mask = got.filter(
            pa.compute.equal(got.column("query_id"), qi))
        assert mask.column("vec_id").to_pylist() == expect


def test_lsh_topk_recall_and_near_dups():
    from search_engine_ray.stages.ann import (brute_force_topk,
                                              cosine_near_dup_pairs, lsh_topk)
    t = _rand_embeddings()
    ds = ray.data.from_arrow(t).repartition(4)
    q = np.asarray(t.column("embedding").to_pylist()[:2], dtype=np.float64)
    exact = brute_force_topk(ds, [0, 1], q, k=5)
    approx = lsh_topk(ds, [0, 1], q, k=5, probe_hamming=3)
    # recall of approximate vs exact top-5 (self + planted twins make the
    # head easy; require >= 60% overall)
    e = set(zip(exact.column("query_id").to_pylist(),
                exact.column("vec_id").to_pylist()))
    a = set(zip(approx.column("query_id").to_pylist(),
                approx.column("vec_id").to_pylist()))
    assert len(e & a) / len(e) >= 0.6

    pairs = cosine_near_dup_pairs(ds, threshold=0.99).take_all()
    assert any({r["vec_a"], r["vec_b"]} == {7, 10} for r in pairs)


def test_ivf_topk_recall_and_determinism():
    from search_engine_ray.stages.ann import brute_force_topk, ivf_topk
    t = _rand_embeddings()
    ds = ray.data.from_arrow(t).repartition(4)
    q = np.asarray(t.column("embedding").to_pylist()[:2], dtype=np.float64)
    exact = brute_force_topk(ds, [0, 1], q, k=5)
    approx = ivf_topk(ds, [0, 1], q, k=5, n_lists=8, n_probe=3)
    e = set(zip(exact.column("query_id").to_pylist(),
                exact.column("vec_id").to_pylist()))
    a = set(zip(approx.column("query_id").to_pylist(),
                approx.column("vec_id").to_pylist()))
    assert len(e & a) / len(e) >= 0.6
    # reported cosines are true cosines, self always found (it lands in the
    # query's own nearest list)
    for qi in (0, 1):
        assert (qi, qi) in a
    approx2 = ivf_topk(ds, [0, 1], q, k=5, n_lists=8, n_probe=3)
    assert approx.equals(approx2)       # seeded quantizer => deterministic


def test_ivf_physical_layout_parity(tmp_path):
    """ivf_build + ivf_search (hive-partitioned lists, probed-partition
    reads) must return exactly what the in-stream ivf_topk returns, and the
    physical scan must touch only ~n_probe/n_lists of the stored bytes."""
    from search_engine_ray.stages.ann import (_normalize, ivf_build,
                                              ivf_scan_stats, ivf_search,
                                              ivf_topk)
    t = _rand_embeddings()
    ds = ray.data.from_arrow(t).repartition(4)
    q = np.asarray(t.column("embedding").to_pylist()[:2], dtype=np.float64)

    stream = ivf_topk(ds, [0, 1], q, k=5, n_lists=8, n_probe=3)
    idx = str(tmp_path / "ivf")
    cents = ivf_build(ds, idx, n_lists=8)
    phys = ivf_search(idx, [0, 1], q, k=5, n_probe=3)

    def norm(tab):
        # batch composition differs between the two paths, so BLAS dot
        # reductions may differ by 1 ulp; the engine's score contract is
        # 6 dp (the oracle rounds) — compare well past it at 9 dp
        return sorted(zip(tab.column("query_id").to_pylist(),
                          tab.column("vec_id").to_pylist(),
                          (round(c, 9) for c in
                           tab.column("cosine").to_pylist())))
    assert norm(stream) == norm(phys)

    probe = np.argsort(-(_normalize(q) @ cents.T), axis=1)[:, :3]
    stats = ivf_scan_stats(idx, probe)
    # union of two 3-probe sets over 8 lists scans well under the full table
    assert 0 < stats["probed_bytes"] < stats["total_bytes"]
    assert stats["scan_fraction"] <= 6 / 8 + 0.15


def test_lsh_physical_layout_parity(tmp_path):
    """lsh_build + lsh_search (hive-partitioned signature buckets,
    probed-neighborhood reads) must return exactly what the in-stream
    lsh_topk returns, and the physical scan must skip non-probed buckets."""
    from search_engine_ray.stages.ann import (_hyperplanes, _normalize,
                                              _popcount64, _signatures,
                                              lsh_build, lsh_scan_stats,
                                              lsh_search, lsh_topk)
    t = _rand_embeddings()
    ds = ray.data.from_arrow(t).repartition(4)
    q = np.asarray(t.column("embedding").to_pylist()[:2], dtype=np.float64)

    stream = lsh_topk(ds, [0, 1], q, k=5, n_bits=12, probe_hamming=2)
    idx = str(tmp_path / "lsh")
    planes = lsh_build(ds, idx, n_bits=12, bucket_bits=6)
    phys = lsh_search(idx, [0, 1], q, k=5, probe_hamming=2)

    def norm(tab):
        # 1-ulp BLAS tolerance across batch compositions, as in the IVF test
        return sorted(zip(tab.column("query_id").to_pylist(),
                          tab.column("vec_id").to_pylist(),
                          (round(c, 9) for c in
                           tab.column("cosine").to_pylist())))
    assert norm(stream) == norm(phys)
    assert len(norm(phys)) > 0

    # scan evidence: probed neighborhoods (prefix Hamming <= 2 around each
    # query's bucket) touch strictly less than the full table
    qtops = (_signatures(_normalize(q), planes) >> np.uint64(6))
    all_b = np.arange(64, dtype=np.uint64)
    union = {int(b) for qt in qtops
             for b in all_b[_popcount64(all_b ^ qt) <= 2]}
    stats = lsh_scan_stats(idx, [list(union)])
    assert 0 < stats["probed_bytes"] <= stats["total_bytes"]
    # 2 queries x C(6,<=2)=22 of 64 buckets; allow overlap/size skew slack
    assert stats["scan_fraction"] < 0.95


def test_semdedup_flags_planted_dups_and_reference():
    from search_engine_ray.stages.ann import _kmeans, semdedup
    t = _rand_embeddings()                  # vec 10 ~ vec 7 planted
    ds = ray.data.from_arrow(t).repartition(4)
    tau = 0.95
    got = {r["vec_id"]: r
           for r in semdedup(ds, n_lists=8, tau=tau,
                             train_sample=64).take_all()}
    assert set(got) == set(range(t.num_rows))   # full flag matrix

    # plain-numpy reference of the same spec; _kmeans gets the RAW slice
    # (it normalizes once itself — the single-normalize ulp discipline)
    raw = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    cents = _kmeans(raw[:64], 8)
    vecs = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    dots = vecs @ cents.T
    assign = np.argmax(dots, axis=1)
    cent = np.round(dots[np.arange(len(vecs)), assign], 6)
    for cid in range(8):
        members = np.where(assign == cid)[0]
        order = members[np.lexsort((members, cent[members]))]
        for i, vid in enumerate(order):
            sims = np.round(vecs[order[:i]] @ vecs[vid], 6)
            want_dup = bool((sims > tau).any())
            assert got[int(vid)]["is_dup"] == int(want_dup), vid
            assert got[int(vid)]["cluster_id"] == int(cid)
            assert got[int(vid)]["cent_cos"] == cent[vid]
    # the planted near-identical pair lands in one cluster; exactly the
    # later-in-keep-order one is flagged
    assert got[7]["cluster_id"] == got[10]["cluster_id"]
    assert got[7]["is_dup"] + got[10]["is_dup"] == 1


def test_semdedup_cluster_count_scaling():
    """The paper's scale knob (Abbas et al. 2023 run 50k clusters for 100M+
    docs): raising n_lists must bound the per-cluster pairwise m^2 work —
    max cluster size shrinks — while near-identical duplicates keep being
    caught, because twins share an argmax assignment under ANY centroid
    set and therefore always co-cluster."""
    from search_engine_ray.stages.ann import semdedup

    rng = np.random.default_rng(17)
    n, dim = 600, 16
    vecs = rng.standard_normal((n, dim))
    planted = [(50, 51), (200, 201), (350, 351), (500, 501)]
    for a, b in planted:
        vecs[b] = vecs[a] + rng.standard_normal(dim) * 1e-4
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(4)

    sizes, flags = {}, {}
    for n_lists in (4, 32):
        rows = semdedup(ds, n_lists=n_lists, tau=0.95,
                        train_sample=256).take_all()
        by_id = {r["vec_id"]: r for r in rows}
        from collections import Counter
        sizes[n_lists] = max(Counter(
            r["cluster_id"] for r in rows).values())
        flags[n_lists] = {vid: by_id[vid]["is_dup"]
                          for pair in planted for vid in pair}
        for a, b in planted:
            assert by_id[a]["cluster_id"] == by_id[b]["cluster_id"], n_lists
            assert by_id[a]["is_dup"] + by_id[b]["is_dup"] == 1, n_lists

    # every planted pair is caught at BOTH cluster counts (pair-level
    # parity; WHICH twin survives is centroid-relative — the keep rule
    # retains the member farther from the centroid, and the centroid
    # moves with n_lists)
    caught = {nl: {p for p in planted
                   if flags[nl][p[0]] + flags[nl][p[1]] == 1}
              for nl in (4, 32)}
    assert caught[4] == caught[32] == set(planted)
    # ...and more lists bound the per-cluster group (m^2 work shrinks)
    assert sizes[32] < sizes[4]


def test_pq_topk_recall_codes_and_determinism():
    from search_engine_ray.stages.ann import (brute_force_topk, pq_encode,
                                              pq_topk, pq_train)
    t = _rand_embeddings()
    ds = ray.data.from_arrow(t).repartition(4)
    q = np.asarray(t.column("embedding").to_pylist()[:2], dtype=np.float64)
    dim = len(t.column("embedding")[0].as_py())
    m, ksub = 4, 8

    cb = pq_train(ds, m=m, ksub=ksub, train_sample=64, iters=3)
    assert cb.shape == (m, ksub, dim // m)
    codes = pq_encode(ds, cb).take_all()
    assert len(codes) == t.num_rows
    for r in codes:
        for s in range(m):
            assert 0 <= r[f"code_{s}"] < ksub

    exact = brute_force_topk(ds, [0, 1], q, k=5)
    approx = pq_topk(ds, [0, 1], q, k=5, m=m, ksub=ksub, train_sample=64,
                     iters=3)
    e = set(zip(exact.column("query_id").to_pylist(),
                exact.column("vec_id").to_pylist()))
    a = set(zip(approx.column("query_id").to_pylist(),
                approx.column("vec_id").to_pylist()))
    # ADC is lossy (quantized candidates); the planted-twin head still
    # keeps recall well above chance
    assert len(e & a) / len(e) >= 0.4
    approx2 = pq_topk(ds, [0, 1], q, k=5, m=m, ksub=ksub, train_sample=64,
                      iters=3)
    assert approx.equals(approx2)       # stride-init Lloyd => deterministic


# -- multimodal plumbing ----------------------------------------------------

def test_media_featurizer_plumbing():
    from search_engine_ray.stages.multimodal import (MediaFeaturizer,
                                                     decode_image,
                                                     featurize_media,
                                                     synth_media_table)
    media = synth_media_table(list(range(30)))
    out = featurize_media(ray.data.from_arrow(media), batch_size=8).take_all()
    assert len(out) == 30
    for r in out:
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-9
        assert r["n_bytes"] > 0
    # determinism
    out2 = featurize_media(ray.data.from_arrow(media), batch_size=16).take_all()
    assert sorted((r["doc_id"], r["payload_hash"]) for r in out) == \
        sorted((r["doc_id"], r["payload_hash"]) for r in out2)
    # compressed formats are decodable only with codec libs -> clear error
    with pytest.raises(ValueError, match="imaging library"):
        decode_image(b"\x89PNG")


def test_real_decoders_roundtrip():
    """Pure-stdlib decoders: PPM/BMP pixel-exact roundtrip, WAV sample
    roundtrip (incl. stereo downmix), video frame sampling."""
    import numpy as np

    from search_engine_ray.stages.multimodal import (decode_audio,
                                                     decode_image,
                                                     decode_video, synth_bmp,
                                                     synth_ppm, synth_video,
                                                     synth_wav)
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(9, 12, 3), dtype=np.uint8)
    ppm = b"P6\n# c\n12 9\n255\n" + px.tobytes()
    assert np.array_equal(decode_image(ppm), px)
    assert decode_image(synth_ppm(5, 4, seed=1)).shape == (4, 5, 3)
    assert decode_image(synth_bmp(11, 7, seed=2)).shape == (7, 11, 3)
    # BMP roundtrip is pixel-exact vs the PPM of the same RNG draw
    a = decode_image(synth_ppm(6, 5, seed=3))
    b = decode_image(synth_bmp(6, 5, seed=3))
    assert np.array_equal(a, b)
    s, sr = decode_audio(synth_wav(400, sample_rate=8000, seed=4))
    assert sr == 8000 and len(s) == 400 and np.abs(s).max() <= 1.0
    s2, _ = decode_audio(synth_wav(400, channels=2, seed=4))
    assert len(s2) == 400                      # stereo downmixed to mono
    frames = decode_video(synth_video(8, 6, 7, seed=5))
    assert len(frames) == 4                    # evenly sampled to max 4
    assert all(f.shape == (6, 8, 3) for f in frames)
    with pytest.raises(ValueError):
        decode_audio(b"RIFFxxxxNOPE")


def test_real_decode_featurizer():
    """fake_decode=False drives the REAL decoders through the actor-pool
    stage: every media type produces a normalized 16-d feature,
    deterministically across batch sizes."""
    from search_engine_ray.stages.multimodal import (featurize_media,
                                                     synth_real_media_table)
    media = synth_real_media_table(list(range(18)))
    out = featurize_media(ray.data.from_arrow(media), batch_size=4,
                          fake_decode=False).take_all()
    assert len(out) == 18
    for r in out:
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-9, r["doc_id"]
    out2 = featurize_media(ray.data.from_arrow(media), batch_size=16,
                           fake_decode=False).take_all()
    key = lambda rows: sorted((r["doc_id"], tuple(r["feature"]))
                              for r in rows)
    assert key(out) == key(out2)


def test_connected_components_vs_union_find():
    """Distributed min-label propagation == naive union-find on random
    graphs (sparse ids, chains, cliques, singleton edges)."""
    import random

    from search_engine_ray.stages.dedup import connected_components

    rng = random.Random(7)
    for trial in range(2):
        nodes = rng.sample(range(100_000), 120)
        edges = []
        # random edges + a long chain (worst-case diameter) + a clique
        edges += [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
        chain = rng.sample(range(200_000, 300_000), 10)
        edges += list(zip(chain, chain[1:]))
        clique = rng.sample(range(300_000, 400_000), 6)
        edges += [(a, b) for a in clique for b in clique if a < b]
        edges = [(a, b) for a, b in edges if a != b]

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        members: dict[int, list[int]] = {}
        for n in {x for e in edges for x in e}:
            members.setdefault(find(n), []).append(n)
        want = {n: min(ms) for ms in members.values() for n in ms}

        pairs = pa.table({
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        })
        got_rows = connected_components(
            ray.data.from_arrow(pairs)).take_all()
        got = {r["doc_id"]: r["cluster_rep"] for r in got_rows}
        assert got == want


def test_pack_shards_vs_naive_cumsum():
    """Two-phase distributed prefix sum == naive ordered cumsum, with a
    small bucket_size so the multi-bucket path (driver prefix over bucket
    sums + in-bucket cumsum) is actually exercised; sparse non-contiguous
    doc_ids included."""
    import random

    from search_engine_ray.stages.curation import pack_shards

    rng = random.Random(3)
    ids = sorted(rng.sample(range(10_000), 300))
    texts = [" ".join(f"w{rng.randrange(50):02d}"
                      for _ in range(rng.randrange(0, 40))) for _ in ids]
    docs = pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})

    from search_engine_ray.functions.text import TOKEN_RE
    budget = 64
    cum = 0
    want = {}
    for i, t in zip(ids, texts):
        n = len(TOKEN_RE.findall(t.lower()))
        want[i] = (n, cum // budget)
        cum += n

    got = pack_shards(ray.data.from_arrow(docs).repartition(8),
                      budget_tokens=budget, bucket_size=256).take_all()
    assert len(got) == len(ids)
    for r in got:
        n, s = want[r["doc_id"]]
        assert (r["token_count"], r["shard_id"]) == (n, s), r


def test_shuffle_pack_shards_vs_naive_shuffled_cumsum():
    """Shuffled-order packing == naive cumsum in md5-key order, with a
    small bucket width (bucket_bits high -> sparse buckets) so the
    multi-bucket prefix path is exercised; keys must form the same
    permutation the oracle's ORDER BY h produces."""
    import random

    from search_engine_ray.functions.hashing import md5_hash64
    from search_engine_ray.functions.text import TOKEN_RE
    from search_engine_ray.stages.curation import shuffle_pack_shards

    rng = random.Random(7)
    ids = sorted(rng.sample(range(10_000), 300))
    texts = [" ".join(f"w{rng.randrange(50):02d}"
                      for _ in range(rng.randrange(0, 40))) for _ in ids]
    docs = pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})

    budget = 64
    order = sorted(ids, key=lambda i: (md5_hash64(str(i)), i))
    nmap = {i: len(TOKEN_RE.findall(t.lower())) for i, t in zip(ids, texts)}
    cum, want = 0, {}
    for i in order:
        want[i] = (nmap[i], cum // budget)
        cum += nmap[i]

    got = shuffle_pack_shards(ray.data.from_arrow(docs).repartition(8),
                              budget_tokens=budget, bucket_bits=8).take_all()
    assert len(got) == len(ids)
    for r in got:
        n, s = want[r["doc_id"]]
        assert (r["token_count"], r["shard_id"]) == (n, s), r
        assert r["shuffle_key"] == md5_hash64(str(r["doc_id"]))
    # the shuffle is a real permutation: shard_id in key order is
    # nondecreasing, and doc_id order != key order
    by_key = sorted(got, key=lambda r: (r["shuffle_key"], r["doc_id"]))
    assert all(a["shard_id"] <= b["shard_id"]
               for a, b in zip(by_key, by_key[1:]))
    assert [r["doc_id"] for r in by_key] != sorted(r["doc_id"] for r in got)


def test_pack_examples_per_conversation_budgets():
    """Segmented-cumsum packing == naive per-conv cumsum; examples never
    cross conversation boundaries; multi-partition path exercised."""
    import random

    from search_engine_ray.functions.text import TOKEN_RE
    from search_engine_ray.stages.curation import pack_examples

    rng = random.Random(11)
    rows = []
    for c in range(17):
        for t in range(rng.randrange(1, 9)):
            rows.append((f"conv-{c:06d}", t,
                         " ".join(f"w{rng.randrange(40):02d}"
                                  for _ in range(rng.randrange(0, 30)))))
    turns = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })

    budget = 32
    want, cum = {}, {}
    for conv, ti, txt in sorted(rows):
        n = len(TOKEN_RE.findall(txt.lower()))
        want[(conv, ti)] = (n, cum.get(conv, 0) // budget)
        cum[conv] = cum.get(conv, 0) + n

    got = pack_examples(ray.data.from_arrow(turns).repartition(6),
                        budget_tokens=budget, num_partitions=5).take_all()
    assert len(got) == len(rows)
    for r in got:
        n, e = want[(r["conv_id"], r["turn_idx"])]
        assert (r["token_count"], r["example_idx"]) == (n, e), r
    # example_idx restarts at 0 for every conversation
    firsts = {r["conv_id"]: r["example_idx"] for r in got
              if r["turn_idx"] == 0}
    assert set(firsts.values()) == {0}


def test_sample_stratified_deterministic_rates():
    from search_engine_ray.stages.curation import sample_stratified

    texts = (["the and of is that with for"] * 40        # en
             + ["der und das ist nicht mit die"] * 40    # de
             + ["xyzzy qwerty"] * 20)                    # unk
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = sample_stratified(ray.data.from_arrow(docs).repartition(4),
                            rates={"en": 0, "de": 100, "unk": 100}).take_all()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["keep"])
    assert not any(by_lang["en"])         # rate 0 -> nothing kept
    assert all(by_lang["de"])             # rate 100 -> everything kept
    assert all(by_lang["unk"])
    # determinism: re-run equals first run row-for-row
    out2 = sample_stratified(ray.data.from_arrow(docs),
                             rates={"en": 0, "de": 100, "unk": 100}).take_all()
    key = lambda r: r["doc_id"]
    assert sorted(((r["doc_id"], r["lang"], r["keep"]) for r in out)) == \
        sorted(((r["doc_id"], r["lang"], r["keep"]) for r in out2))


def test_mix_sources_binding_and_proportions():
    """mix_sources keeps ~everything from the binding source and
    downsamples heavy sources so kept token mass tracks the weight units;
    integer math + hash draw make the result rerun-deterministic."""
    from search_engine_ray.stages.curation import mix_sources

    # source "a": 300 docs x 10 tokens; source "b": 30 docs x 10 tokens.
    # weights 1:1 -> "b" binds (keeps all), "a" keeps ~10% of its tokens.
    texts = ["tok " * 10] * 330
    docs = pa.table({
        "doc_id": pa.array(range(330), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(["a"] * 300 + ["b"] * 30, pa.string()),
    })
    ds = ray.data.from_arrow(docs).repartition(4)
    out = mix_sources(ds, weights={"a": 1, "b": 1}).take_all()
    assert len(out) == 330
    kept = {s: sum(r["token_count"] for r in out if r["source"] == s
                   and r["keep"]) for s in ("a", "b")}
    assert kept["b"] == 300                      # binding source keeps all
    assert 150 <= kept["a"] <= 450               # ~300 +/- hash-draw noise
    ppm = {r["source"]: r["keep_ppm"] for r in out}
    assert ppm["b"] == 1_000_000 and ppm["a"] == 100_000

    # default name-derived units; rerun-deterministic row-for-row
    docs2 = docs.set_column(2, "source", pa.array(
        ["src0"] * 300 + ["src1"] * 30, pa.string()))
    runs = [sorted((r["doc_id"], r["keep_ppm"], r["keep"]) for r in
                   mix_sources(ray.data.from_arrow(docs2)).take_all())
            for _ in range(2)]
    assert runs[0] == runs[1]
    # src1 unit=2 vs src0 unit=1: src1 still binds, src0 ppm halves
    ppm2 = {r[0]: r[1] for r in runs[0]}
    assert ppm2[0] == 50_000 and ppm2[329] == 1_000_000

    with pytest.raises(ValueError):
        mix_sources(ds, weights={"a": 1}).take_all()


def test_line_dedup_first_occurrence_wins():
    """C4-style line dedup: a line shared across docs survives only at its
    first (doc_id, line_idx) occurrence; docs reassemble from surviving
    lines in order; token-less docs vanish (zero lines)."""
    from search_engine_ray.stages.dedup import line_dedup

    # 2-token lines for readability: doc0 = [A B], doc1 = [B C], doc2 = [A]
    a, b, c = "aa bb", "cc dd", "ee ff"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([f"{a} {b}", f"{b} {c}", a, ""], pa.string()),
    })
    out = {r["doc_id"]: r for r in line_dedup(
        ray.data.from_arrow(docs).repartition(3),
        line_tokens=2).take_all()}
    assert set(out) == {0, 1, 2}              # empty doc 3 absent
    assert out[0]["kept_lines"] == 2 and out[0]["dropped_lines"] == 0
    assert out[0]["text_deduped"] == f"{a}\n{b}"
    assert out[1]["kept_lines"] == 1 and out[1]["dropped_lines"] == 1
    assert out[1]["text_deduped"] == c         # b already seen in doc 0
    assert out[2]["kept_lines"] == 0 and out[2]["dropped_lines"] == 1
    assert out[2]["text_deduped"] == ""        # a already seen in doc 0

    # boilerplate injection: doc 0 and 5's first line become identical
    docs2 = pa.table({
        "doc_id": pa.array([0, 5], pa.int64()),
        "text": pa.array(["xx yy zz ww", "pp qq rr ss"], pa.string()),
    })
    out2 = {r["doc_id"]: r for r in line_dedup(
        ray.data.from_arrow(docs2), line_tokens=2,
        boilerplate_mod=5).take_all()}
    assert out2[0]["dropped_lines"] == 0
    assert out2[5]["dropped_lines"] == 1       # its boilerplate line lost
    assert out2[5]["text_deduped"] == "rr ss"


def test_line_dedup_hash_width_parity():
    """hash_bits=64 (blake2b int64 keys) and hash_bits=128 (full-md5 hex
    keys, the trillions-of-lines setting) must produce identical dedup
    output wherever the 64-bit hash is collision-free."""
    import random

    from search_engine_ray.stages.dedup import line_dedup

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 24)))
             for _ in range(60)]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })

    def run(bits):
        rows = line_dedup(ray.data.from_arrow(docs).repartition(4),
                          line_tokens=3, boilerplate_mod=7,
                          hash_bits=bits).take_all()
        return sorted((r["doc_id"], r["kept_lines"], r["dropped_lines"],
                       r["text_deduped"]) for r in rows)

    assert run(64) == run(128)

    with pytest.raises(ValueError, match="hash_bits"):
        line_dedup(ray.data.from_arrow(docs), hash_bits=96).take_all()


def test_batch_cycle_runner(tmp_path, docs_ds, docs_rows):
    """Maintenance-cycle analogue of the reference batch runner
    (runner.py:36-52): all artifact stages publish, semantics spot-checked
    against naive recomputation, worker role skips global jobs, re-run is
    idempotent (truncate-and-rebuild swap)."""
    import json
    import math

    from search_engine_ray.pipelines.batch_cycle import run_cycle

    out = str(tmp_path / "cycle")
    m = run_cycle(docs_ds, out, pagerank_iterations=3)
    n_docs = len(docs_rows)

    assert m["fingerprints"]["rows"] == n_docs
    assert m["pagerank"]["rows"] == n_docs
    groups = {}
    for i, r in enumerate(docs_rows):
        groups.setdefault(r["text"], []).append(i)
    assert m["dup_groups"]["rows"] == len(groups)

    # bm25 term stats: spot-check idf formula for one term
    import pyarrow.parquet as pq
    ts = pq.read_table(out + "/term_stats").to_pylist()
    assert m["bm25"]["rows"] == len(ts) > 0
    from search_engine_ray.functions.text import STOPWORDS, TOKEN_RE
    from search_engine_ray.functions.porter import stem as porter_stem
    df_naive: dict[str, set] = {}
    for i, r in enumerate(docs_rows):
        toks = {porter_stem(t) for t in TOKEN_RE.findall(r["text"].lower())
                if t not in STOPWORDS}
        for t in toks:
            df_naive.setdefault(t, set()).add(i)
    for row in ts[:10]:
        df = len(df_naive[row["term"]])
        assert row["doc_frequency"] == df
        assert row["idf"] == pytest.approx(
            math.log((n_docs - df + 0.5) / (df + 0.5) + 1))
    stats = json.load(open(out + "/stats.json"))
    assert stats["doc_total"] == n_docs

    # dictionary + meta sink
    assert (tmp_path / "cycle" / "dictionary_meta.json").exists()
    assert m["spellcheck"]["rows"] > 0

    # idempotent truncate-and-rebuild
    m2 = run_cycle(docs_ds, out, pagerank_iterations=3)
    assert {k: v.get("rows") for k, v in m2.items() if isinstance(v, dict)} \
        == {k: v.get("rows") for k, v in m.items() if isinstance(v, dict)}

    # worker role: only per-node duplicate jobs run
    from search_engine_ray.batch_cli import WORKER_SKIP
    mw = run_cycle(docs_ds, str(tmp_path / "worker"), skip=WORKER_SKIP,
                   pagerank_iterations=3)
    assert mw["link_graph"] == {"skipped": True}
    assert mw["pagerank"] == {"skipped": True}
    assert mw["fingerprints"]["rows"] == n_docs


def test_asof_and_range_join_vs_naive():
    """Temporal operators vs naive per-row computation on random event
    streams with deliberate timestamp ties and multi-batch partitioning."""
    import random

    from search_engine_ray.stages.temporal import (asof_prior_event,
                                                   range_join_counts)

    rng = random.Random(11)
    n = 600
    rows = []
    for eid in range(n):
        rows.append({
            "event_id": eid,
            "ts": rng.randrange(0, 5_000) * 1_000_000,   # us, many ties
            "user_id": rng.randrange(8),
            "event_type": rng.choice(["click", "view", "view", "error"]),
            "value": round(rng.uniform(0, 20), 2),
        })
    t = pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(6)

    # asof: most recent view strictly earlier in (ts, event_id) order
    got = {r["event_id"]: (r["prior_event_id"], r["gap_seconds"])
           for r in asof_prior_event(ds).take_all()}
    clicks = [r for r in rows if r["event_type"] == "click"]
    assert len(got) == len(clicks)
    for c in clicks:
        views = [v for v in rows
                 if v["user_id"] == c["user_id"] and v["event_type"] == "view"
                 and (v["ts"], v["event_id"]) < (c["ts"], c["event_id"])]
        if not views:
            assert got[c["event_id"]] == (None, None)
        else:
            best = max(views, key=lambda v: (v["ts"], v["event_id"]))
            pid, gap = got[c["event_id"]]
            assert pid == best["event_id"]
            assert gap == pytest.approx((c["ts"] - best["ts"]) / 1e6)

    # range join: clicks within [err.ts, err.ts + 1h) per user
    win = 3_600_000_000
    left = ray.data.from_arrow(pa.table({
        "key": pa.array([r["user_id"] for r in rows
                         if r["event_type"] == "error"], pa.int64()),
        "id": pa.array([r["event_id"] for r in rows
                        if r["event_type"] == "error"], pa.int64()),
        "start": pa.array([r["ts"] for r in rows
                           if r["event_type"] == "error"], pa.int64()),
    })).repartition(4)
    right = ray.data.from_arrow(pa.table({
        "key": pa.array([r["user_id"] for r in rows
                         if r["event_type"] == "click"], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows
                        if r["event_type"] == "click"], pa.int64()),
        "val": pa.array([int(r["value"] * 100 + 0.5) for r in rows
                         if r["event_type"] == "click"], pa.int64()),
    })).repartition(4)
    got_rj = {r["id"]: (r["n_matches"], r["sum_val"])
              for r in range_join_counts(right, left, window_us=win
                                         ).take_all()}
    for e in (r for r in rows if r["event_type"] == "error"):
        matches = [c for c in rows
                   if c["event_type"] == "click"
                   and c["user_id"] == e["user_id"]
                   and e["ts"] <= c["ts"] < e["ts"] + win]
        if matches:
            assert got_rj[e["event_id"]] == (
                len(matches),
                sum(int(c["value"] * 100 + 0.5) for c in matches))
        else:
            assert e["event_id"] not in got_rj


def test_sample_per_key_and_percentiles_vs_naive():
    import random

    from search_engine_ray.functions.hashing import md5_hash64
    from search_engine_ray.stages.curation import sample_per_key
    from search_engine_ray.stages.stats import column_percentiles

    rng = random.Random(5)
    n = 400
    t = pa.table({
        "user_id": pa.array([rng.randrange(7) for _ in range(n)], pa.int64()),
        "event_id": pa.array(range(n), pa.int64()),
        "value": pa.array([round(rng.uniform(0, 50), 2) for _ in range(n)],
                          pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(5)

    got = sorted((r["user_id"], r["event_id"]) for r in sample_per_key(
        ds, key="user_id", id_col="event_id", k=3).take_all())
    want = []
    by_user: dict[int, list[int]] = {}
    for u, e in zip(t.column("user_id").to_pylist(),
                    t.column("event_id").to_pylist()):
        by_user.setdefault(u, []).append(e)
    for u, es in by_user.items():
        es.sort(key=lambda e: (md5_hash64(str(e)), e))
        want += [(u, e) for e in es[:3]]
    assert got == sorted(want)

    import numpy as np
    gotp = {r["user_id"]: (r["n"], r["p50"], r["p90"], r["p99"])
            for r in column_percentiles(
                ds, key="user_id", col="value").take_all()}
    for u in by_user:
        vals = [v for uu, v in zip(t.column("user_id").to_pylist(),
                                   t.column("value").to_pylist()) if uu == u]
        n_, p50, p90, p99 = gotp[u]
        assert n_ == len(vals)
        assert p50 == round(float(np.percentile(vals, 50)), 6)
        assert p90 == round(float(np.percentile(vals, 90)), 6)
        assert p99 == round(float(np.percentile(vals, 99)), 6)


def test_hopping_window_vs_naive():
    import random
    from collections import defaultdict

    from search_engine_ray.stages.temporal import hopping_window_counts

    rng = random.Random(13)
    width, hop = 1_000_000 * 40, 1_000_000 * 10      # 40s windows, 10s hop
    n = 500
    t = pa.table({
        "ts": pa.array([rng.randrange(0, 300_000_000) for _ in range(n)],
                       pa.timestamp("us")),
        "event_type": pa.array([rng.choice(["a", "b"]) for _ in range(n)],
                               pa.string()),
        "value": pa.array([round(rng.uniform(0, 9), 2) for _ in range(n)],
                          pa.float64()),
    })
    got = {(r["window_start"], r["event_type"]):
           (r["n_events"], r["sum_value_cents"])
           for r in hopping_window_counts(
               ray.data.from_arrow(t).repartition(5),
               width_us=width, hop_us=hop).take_all()}

    import datetime
    want: dict = defaultdict(lambda: [0, 0])
    for ts, et, v in zip(t.column("ts").to_pylist(),
                         t.column("event_type").to_pylist(),
                         t.column("value").to_pylist()):
        us = int(ts.timestamp() * 1e6 + 0.5)
        for kk in range(width // hop):
            s = (us // hop - kk) * hop
            if s <= us < s + width:
                w = want[(datetime.datetime.utcfromtimestamp(s / 1e6), et)]
                w[0] += 1
                w[1] += int(v * 100 + 0.5)
    assert got == {k: tuple(v) for k, v in want.items()}


def test_new_ops_empty_inputs():
    """Every curation/temporal/clustering op returns an empty result (not a
    crash) on empty inputs — a clean corpus with zero near-dup pairs is the
    realistic trigger for the connected-components empty path."""
    from search_engine_ray.stages.curation import (pack_shards,
                                                   sample_per_key,
                                                   sample_stratified)
    from search_engine_ray.stages.dedup import connected_components
    from search_engine_ray.stages.stats import column_percentiles
    from search_engine_ray.stages.temporal import (asof_prior_event,
                                                   hopping_window_counts,
                                                   range_join_counts)

    empty_pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64())}))
    assert connected_components(empty_pairs).take_all() == []

    empty_docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert pack_shards(empty_docs).take_all() == []
    assert sample_stratified(empty_docs).take_all() == []

    empty_ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64())}))
    assert asof_prior_event(empty_ev).take_all() == []
    assert hopping_window_counts(empty_ev).take_all() == []
    assert column_percentiles(empty_ev, key="event_type",
                              col="value").take_all() == []
    assert sample_per_key(empty_ev, key="user_id",
                          id_col="event_id").take_all() == []

    empty_l = ray.data.from_arrow(pa.table({
        "key": pa.array([], pa.int64()), "id": pa.array([], pa.int64()),
        "start": pa.array([], pa.int64())}))
    empty_r = ray.data.from_arrow(pa.table({
        "key": pa.array([], pa.int64()), "ts": pa.array([], pa.int64()),
        "val": pa.array([], pa.int64())}))
    assert range_join_counts(empty_r, empty_l).take_all() == []


def test_hll_registers_and_estimate():
    """HLL sketch: registers are partition-invariant and mergeable by max;
    the estimator lands within the published error bound of the exact
    distinct count (m=1024 -> ~3.25% standard error; assert 4 sigma)."""
    import random

    from search_engine_ray.stages.stats import hll_estimate, hll_registers

    rng = random.Random(17)
    keys, vals = [], []
    true = {"a": 4000, "b": 700, "c": 12}
    for k, n in true.items():
        pool = rng.sample(range(10_000_000), n)
        for _ in range(n * 3):                 # duplicates included
            keys.append(k)
            vals.append(rng.choice(pool))
        vals[-n:] = pool[-n:] if n <= len(pool) else vals[-n:]
        # make sure every distinct value appears at least once
        keys.extend([k] * n)
        vals.extend(pool)
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.int64())})

    regs = hll_registers(ray.data.from_arrow(t).repartition(7),
                         key="k", value_col="v").take_all()
    regs2 = hll_registers(ray.data.from_arrow(t).repartition(2),
                          key="k", value_col="v").take_all()
    canon = lambda rows: sorted((r["k"], r["bucket"], r["rho"]) for r in rows)
    assert canon(regs) == canon(regs2)          # partition-invariant

    reg_table = pa.table({
        "k": pa.array([r["k"] for r in regs], pa.string()),
        "bucket": pa.array([r["bucket"] for r in regs], pa.int64()),
        "rho": pa.array([r["rho"] for r in regs], pa.int64()),
    })
    est = hll_estimate(reg_table, key="k")
    for k, n in true.items():
        # distinct count actually present (sampling w/ replacement may miss)
        actual = len({v for kk, v in zip(keys, vals) if kk == k})
        err = abs(est[k] - actual) / actual
        assert err < 4 * 1.04 / (1024 ** 0.5), (k, est[k], actual, err)


def test_approx_percentiles_hist_vs_naive():
    """The histogram sketch's estimate is the upper edge of the bin holding
    the ceil(q*n)-th value — verify against a direct numpy computation, and
    that the estimate brackets the exact quantile within one bin_width."""
    import math
    import random

    import numpy as np

    from search_engine_ray.stages.stats import approx_percentiles_hist

    rng = random.Random(17)
    n = 600
    t = pa.table({
        "k": pa.array([rng.randrange(4) for _ in range(n)], pa.int64()),
        "v": pa.array([round(rng.uniform(-3, 80), 3) for _ in range(n)],
                      pa.float64()),
    })
    bw = 2.5
    got = {r["k"]: r for r in approx_percentiles_hist(
        ray.data.from_arrow(t).repartition(6), key="k", col="v",
        qs=(0.5, 0.9, 0.99), bin_width=bw).take_all()}
    ks = t.column("k").to_numpy()
    vs = t.column("v").to_numpy()
    for k in sorted(set(ks.tolist())):
        sub = np.sort(vs[ks == k])
        assert got[k]["n"] == len(sub)
        for q, cname in ((0.5, "p50_approx"), (0.9, "p90_approx"),
                         (0.99, "p99_approx")):
            rank_val = sub[math.ceil(q * len(sub)) - 1]
            expect = (math.floor(rank_val / bw) + 1) * bw
            assert got[k][cname] == expect, (k, q)
            # bracketing: the true order statistic lies in (est - bw, est]
            assert expect - bw < rank_val <= expect


def test_cms_registers_and_heavy_hitters_vs_naive():
    """CMS registers equal a direct Counter over (row, hashed col); the
    point estimate is >= the true count (one-sided error) and equals it
    when no collision occurred; top-k order is (est desc, key asc)."""
    import random
    from collections import Counter

    from search_engine_ray.functions.hashing import md5_hash64
    from search_engine_ray.stages.stats import (CMS_DEPTH, CMS_WIDTH,
                                                cms_estimate_topk,
                                                cms_registers)

    rng = random.Random(23)
    vals = [rng.randrange(40) for _ in range(500)] + [7] * 100
    t = pa.table({"u": pa.array(vals, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(5)

    regs = {(r["row"], r["col"]): r["c"]
            for r in cms_registers(ds, key_col="u").take_all()}
    expect = Counter()
    for r in range(CMS_DEPTH):
        for v in vals:
            expect[(r, md5_hash64(f"{r}:{v}") % CMS_WIDTH)] += 1
    assert regs == dict(expect)

    true_counts = Counter(vals)
    top = cms_estimate_topk(ds, key_col="u", k=10).take_all()
    assert top[0]["u"] == 7 and top[0]["est"] >= true_counts[7]
    for row in top:
        assert row["est"] >= true_counts[row["u"]]
    ests = [(r["est"], r["u"]) for r in top]
    assert ests == sorted(ests, key=lambda e: (-e[0], e[1]))


def test_sample_weighted_vs_naive():
    """sample_weighted == direct numpy recomputation of the E-S priority
    top-k per stratum, and weights bias selection: with one heavy-weight
    row per key, that row is always sampled."""
    import random

    import numpy as np

    from search_engine_ray.functions.hashing import md5_hash64
    from search_engine_ray.stages.curation import sample_weighted

    rng = random.Random(31)
    n = 400
    keys = [rng.randrange(4) for _ in range(n)]
    wts = [round(rng.uniform(0.5, 2.0), 3) for _ in range(n)]
    heavy = {}
    for i in range(n):   # one row per key gets a crushing weight
        if keys[i] not in heavy:
            heavy[keys[i]] = i
            wts[i] = 1e6
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "i": pa.array(range(n), pa.int64()),
                  "w": pa.array(wts, pa.float64())})
    got = sorted((r["k"], r["i"]) for r in sample_weighted(
        ray.data.from_arrow(t).repartition(6), key="k", id_col="i",
        weight_col="w", k=3).take_all())

    pri = {}
    for i in range(n):
        u = np.float64(md5_hash64(str(i))) / np.float64(2.0) ** 64
        pri.setdefault(keys[i], []).append((-(np.log(u) / wts[i]), i))
    expect = sorted((k, i) for k, lst in pri.items()
                    for _, i in sorted(lst)[:3])
    assert got == expect
    for k, i in heavy.items():
        assert (k, i) in got


# -- training-data hygiene: decontamination + PII -----------------------------

def test_benchmark_ngram_overlap_vs_bruteforce():
    from search_engine_ray.stages.decontam import (
        benchmark_ngram_overlap, decontaminated_survivors)
    n = 4
    base = "alpha beta gamma delta epsilon zeta eta theta".split()
    corpus_rows = [
        (0, " ".join(base)),                       # contains bench 4-grams
        (1, "one two three four five six"),        # clean
        (2, " ".join(base[2:6]) + " xx yy zz"),    # one shared 4-gram
        (3, "short text"),                         # < n tokens -> no grams
    ]
    bench_rows = [(100, " ".join(base[:6])), (101, "nothing shared here at all")]
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in corpus_rows], pa.int64()),
        "text": pa.array([r[1] for r in corpus_rows], pa.string())}))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in bench_rows], pa.int64()),
        "text": pa.array([r[1] for r in bench_rows], pa.string())}))

    def grams(t):
        w = t.lower().split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    bench_set = set().union(*(grams(t) for _, t in bench_rows))
    expect = {}
    for did, t in corpus_rows:
        k = len(grams(t) & bench_set)
        if k:
            expect[did] = k
    got = {r["doc_id"]: r["overlap_ngrams"]
           for r in benchmark_ngram_overlap(corpus, bench, n=n).take_all()}
    assert got == expect
    assert got                                  # fixture plants overlaps

    surv = sorted(r["doc_id"] for r in
                  decontaminated_survivors(corpus, bench, n=n).take_all())
    assert surv == sorted(d for d, _ in corpus_rows if d not in expect)

    # Bloom variant: no false negatives (every exact-overlap doc flagged
    # with hits >= its exact overlap), and with a roomy bitset the small
    # fixture has no false positives either
    from search_engine_ray.stages.decontam import bloom_decontaminate
    bloom = {r["doc_id"]: r["bloom_hits"]
             for r in bloom_decontaminate(corpus, bench, n=n).take_all()}
    for did, k in expect.items():
        assert bloom.get(did, 0) >= k
    assert bloom == expect      # m=65536 bits, ~20 grams -> no collisions


def test_bloom_decontaminate_tiny_bitset_false_positives():
    """With a deliberately tiny bitset the flag set is a strict SUPERSET
    of the exact overlap — false positives appear, false negatives never."""
    from search_engine_ray.stages.decontam import (benchmark_ngram_overlap,
                                                   bloom_decontaminate)
    n = 3
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array([f"w{i} x{i} y{i} z{i} q{i}" for i in range(40)],
                         pa.string())}))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(["w7 x7 y7 z7 q7", "a b c d e f"], pa.string())}))
    exact = {r["doc_id"] for r in
             benchmark_ngram_overlap(corpus, bench, n=n).take_all()}
    assert exact == {7}
    bloom = {r["doc_id"] for r in
             bloom_decontaminate(corpus, bench, n=n, m_bits=32,
                                 k_hashes=2).take_all()}
    assert exact <= bloom           # no false negatives, ever
    assert len(bloom) > len(exact)  # 32 bits over ~120 gram-bit draws


def test_dsir_logweights_vs_bruteforce():
    from search_engine_ray.functions.hashing import md5_hash64
    from search_engine_ray.stages.dsir import dsir_logweights
    B = 64
    corpus_rows = [
        (0, "alpha beta alpha beta gamma"),       # target-like
        (1, "alpha beta gamma alpha"),            # target-like
        (2, "delta epsilon zeta delta epsilon"),  # off-target
        (3, "zeta zeta epsilon delta"),           # off-target
        (4, "???"),                               # zero features -> absent
    ]
    target_rows = [(0, corpus_rows[0][1]), (1, corpus_rows[1][1])]

    def feats(t):
        import re
        toks = re.findall(r"[a-z]{2,32}", t.lower())
        return toks + [a + " " + b for a, b in zip(toks, toks[1:])]

    def buckets(t):
        return [md5_hash64(g) % B for g in feats(t)]

    tc = np.zeros(B)
    for _, t in target_rows:
        for b in buckets(t):
            tc[b] += 1
    rc = np.zeros(B)
    for _, t in corpus_rows:
        for b in buckets(t):
            rc[b] += 1
    lr = np.floor((np.log((tc + 1) / (tc.sum() + B))
                   - np.log((rc + 1) / (rc.sum() + B)))
                  * 1e6 + 0.5).astype(np.int64)
    expect = {}
    for did, t in corpus_rows:
        bs = buckets(t)
        if bs:
            expect[did] = int(sum(lr[b] for b in bs))

    def ds(rows):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}
        )).repartition(2)

    got = {r["doc_id"]: r["logw_micro"]
           for r in dsir_logweights(ds(corpus_rows), ds(target_rows),
                                    buckets=B).take_all()}
    assert got == expect
    assert 4 not in got                     # zero-feature doc absent
    # target-like docs outweigh off-target docs
    assert min(got[0], got[1]) > max(got[2], got[3])


def test_pii_scan_redact_counts_and_masks():
    from search_engine_ray.stages.pii import pii_scan_redact
    rows = [
        (0, "mail Bob.Smith+x@Foo-bar.org or b@c.io now"),
        (1, "server at 10.2.0.33 and 192.168.1.1"),
        (2, "call 555-123-4567 or 555.987.6543"),
        (3, "clean text with no pii at all"),
        (4, "combo a@b.co 1.2.3.4 111-222-3333"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))
    got = {r["doc_id"]: r for r in pii_scan_redact(ds).take_all()}
    assert (got[0]["email_count"], got[0]["ip_count"]) == (2, 0)
    assert got[0]["redacted"] == "mail <EMAIL> or <EMAIL> now"
    assert got[1]["ip_count"] == 2
    assert got[1]["redacted"] == "server at <IP> and <IP>"
    assert got[2]["phone_count"] == 2
    assert got[2]["redacted"] == "call <PHONE> or <PHONE>"
    assert got[3]["redacted"] == rows[3][1]
    assert (got[4]["email_count"], got[4]["ip_count"],
            got[4]["phone_count"]) == (1, 1, 1)
    assert got[4]["redacted"] == "combo <EMAIL> <IP> <PHONE>"


def test_inject_synthetic_pii_roundtrip():
    """Injected PII is found and fully redacted back out."""
    from search_engine_ray.stages.pii import (inject_synthetic_pii,
                                              pii_scan_redact)
    ids = list(range(30))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"doc {i} body" for i in ids], pa.string())}))
    got = {r["doc_id"]: r
           for r in pii_scan_redact(inject_synthetic_pii(ds)).take_all()}
    for i in ids:
        assert got[i]["email_count"] == (1 if i % 7 == 0 else 0)
        assert got[i]["ip_count"] == (1 if i % 11 == 0 else 0)
        assert got[i]["phone_count"] == (1 if i % 13 == 0 else 0)
        assert "@" not in got[i]["redacted"]


def test_duplicated_spans_vs_bruteforce():
    from search_engine_ray.stages.decontam import duplicated_spans
    n = 3
    rows = [
        (0, "a b c d e f g"),          # shares "a b c"... with doc 1
        (1, "a b c d x y z"),          # shares a-b-c, b-c-d with doc 0
        (2, "p q r p q r p q r"),      # in-doc repetition
        (3, "unique words only here"),
        (4, "xx"),                     # < n tokens
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))

    # brute force
    from collections import Counter
    grams: list[tuple[int, int, str]] = []
    for did, t in rows:
        w = t.lower().split()
        for i in range(len(w) - n + 1):
            grams.append((did, i, " ".join(w[i:i + n])))
    freq = Counter(g for _, _, g in grams)
    expect = {}
    for did, _ in rows:
        pos = sorted(p for d, p, g in grams if d == did and freq[g] > 1)
        if not pos:
            continue
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1] - 1:     # overlap/adjacent
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + n))
            else:
                spans.append((p, p + n))
        expect[did] = (len(spans), sum(e - s for s, e in spans))

    got = {r["doc_id"]: (r["dup_spans"], r["dup_tokens"])
           for r in duplicated_spans(ds, n=n, num_parts=4).take_all()}
    assert got == expect
    assert 2 in got and got[2][0] >= 1        # in-doc repeats are caught


def test_embed_documents_deterministic_projection():
    from search_engine_ray.functions.hashing import (md5_hash64,
                                                     splitmix64)
    from search_engine_ray.stages.embed import GOLDEN, embed_documents

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["cat dog cat", "zebra", ""], pa.string()),
    })
    out = {r["doc_id"]: r for r in embed_documents(
        ray.data.from_arrow(docs).repartition(2), dims=4).take_all()}
    assert set(out) == {0, 1}          # empty doc absent

    def ref(tokens, dims=4):
        e = [0] * dims
        for t in tokens:
            b = md5_hash64(t)
            for i in range(dims):
                seed = ((i + 1) * GOLDEN) & ((1 << 64) - 1)
                e[i] += (splitmix64(b ^ seed) % 1000) - 500
        return e

    assert [out[0][f"e{i}"] for i in range(4)] == ref(["cat", "dog", "cat"])
    assert [out[1][f"e{i}"] for i in range(4)] == ref(["zebra"])
    # same input -> identical vectors (encode is stateless-deterministic)
    out2 = {r["doc_id"]: r for r in embed_documents(
        ray.data.from_arrow(docs).repartition(2), dims=4).take_all()}
    assert out == out2


def test_gopher_repetition_handcrafted():
    from search_engine_ray.stages.textstats import gopher_repetition

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            # "a b" occurs 3x: top2 num = 3 * 3 chars
            "a b a b a b",
            # all tokens distinct and long enough that no single n-gram
            # dominates: every gate passes
            " ".join(f"token{i:02d}word" for i in range(30)),
            # a repeated 5-gram: "q w e r t ... q w e r t"
            "q w e r t x q w e r t",
        ], pa.string()),
    })
    out = {r["doc_id"]: r
           for r in gopher_repetition(ray.data.from_arrow(docs)).take_all()}

    d0 = out[0]             # len("a b a b a b") = 11
    assert d0["top2_u"] == int(np.floor(1e6 * (3 * 3) / 11 + 0.5))
    assert d0["keep"] == 0  # 9/11 > 0.20

    d1 = out[1]
    assert d1["dup5_u"] == 0 and d1["dup10_u"] == 0
    assert d1["keep"] == 1

    d2 = out[2]             # positions 0-4 and 6-10 covered (10 tokens
    # of 1 char each); den = len(text) = 21
    assert d2["dup5_u"] == int(np.floor(1e6 * 10 / 21 + 0.5))
    assert d2["keep"] == 0


def test_gopher_quality_vs_bruteforce():
    from search_engine_ray.stages.textstats import (GOPHER_STOPWORDS,
                                                    gopher_quality)
    import re
    rows = [
        (0, "the quick brown fox jumps over lazy dogs and cats " * 6),
        (1, "short doc"),                               # < 50 words
        (2, ("be to of and that " * 12) + "#### ### ...... ..."),  # symbols
        (3, " ".join(["supercalifragilistic"] * 60)),   # mwl > 10, no stops
        (4, None),
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))
    got = {r["doc_id"]: r for r in gopher_quality(ds).take_all()}
    for did, t in rows:
        t = t or ""
        words = t.split()
        wc = len(words)
        nonspace = len(re.sub(r"\s+", "", t))
        mwl = round(nonspace / max(wc, 1), 6)
        sym = round((t.count("#") + t.count("...")) / max(wc, 1), 6)
        hits = sum(1 for w in GOPHER_STOPWORDS
                   if re.search(rf"\b{w}\b", t))
        keep = int(50 <= wc <= 100_000 and 3 <= mwl <= 10
                   and sym <= 0.1 and hits >= 2)
        g = got[did]
        assert (g["word_count"], g["mean_word_len"], g["symbol_word_ratio"],
                g["stop_hits"], g["keep"]) == (wc, mwl, sym, hits, keep), did
    assert got[0]["keep"] == 1 and got[1]["keep"] == 0
    assert got[2]["keep"] == 0 and got[3]["keep"] == 0


def test_c4_clean_rules():
    """Each C4 §2.2 rule on handcrafted multi-line pages: terminal punct,
    >= 5 words, javascript line drop, lorem-ipsum / brace page filters,
    >= 3 sentence page floor."""
    from search_engine_ray.stages.textstats import c4_clean

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            # 3 keepable sentences + a short line + a punctless line
            "this is a good long line.\nshort one.\n"
            "another quite long good line!\nno punct line here at all\n"
            "third fine sentence keeps page alive?",
            # javascript line dropped -> only 2 sentences -> page dropped
            "uses javascript on this line.\n"
            "only two good sentences here today.\n"
            "second good sentence is right here.",
            # lorem ipsum -> page dropped despite 4 good lines
            "lorem ipsum dolor sit amet here.\nfine long line number one.\n"
            "fine long line number two.\nfine long line number three.",
            # '{' -> page dropped
            "contains a { brace so page dies.\ngood line one for counter.\n"
            "good line two for counter.\ngood line three for counter.",
        ], pa.string()),
    })
    got = {r["doc_id"]: r
           for r in c4_clean(ray.data.from_arrow(docs)).take_all()}
    assert (got[0]["total_lines"], got[0]["kept_lines"],
            got[0]["sentences"], got[0]["keep"]) == (5, 3, 3, 1)
    assert got[0]["clean_text"].split("\n") == [
        "this is a good long line.", "another quite long good line!",
        "third fine sentence keeps page alive?"]
    # the short line and the punctless line are gone
    assert "short one." not in got[0]["clean_text"]
    assert got[1]["kept_lines"] == 2 and got[1]["keep"] == 0
    assert "javascript" not in got[1]["clean_text"]
    assert got[2]["keep"] == 0 and got[2]["kept_lines"] == 4
    assert got[3]["keep"] == 0 and got[3]["sentences"] == 4


def test_fk_readability_formula():
    """FK grade matches the hand-computed Kincaid 1975 formula, divisor
    clamps fire on empty/punctless docs."""
    from search_engine_ray.stages.textstats import fk_readability

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "the cat sat on the mat. the dog ran far away!",
            "no terminal punctuation here at all",
            "",
        ], pa.string()),
    })
    got = {r["doc_id"]: r
           for r in fk_readability(ray.data.from_arrow(docs)).take_all()}

    import re as _re
    t0 = "the cat sat on the mat. the dog ran far away!"
    w = len(_re.findall(r"\S+", t0))
    s = len(_re.findall(r"[.!?]", t0))
    sy = len(_re.findall(r"[aeiouy]+", t0.lower()))
    assert (got[0]["words"], got[0]["sentences"], got[0]["syllables"]) == \
        (w, s, sy) == (11, 2, 12)

    def micro(x):
        import math
        return math.floor(x * 1e6 + 0.5)

    assert got[0]["fk_grade_micro"] == micro(
        0.39 * w / s + 11.8 * sy / w - 15.59)
    # punctless doc: sentence divisor clamps to 1
    assert got[1]["sentences"] == 0
    assert got[1]["fk_grade_micro"] == micro(
        0.39 * got[1]["words"] / 1
        + 11.8 * got[1]["syllables"] / got[1]["words"] - 15.59)
    # empty doc: both divisors clamp, counts are zero
    assert (got[2]["words"], got[2]["syllables"]) == (0, 0)
    assert got[2]["fk_grade_micro"] == micro(-15.59)


def test_fix_encoding_mojibake():
    """cp1252 mojibake repaired, replacement counts exact, clean text
    untouched."""
    from search_engine_ray.stages.textstats import MOJIBAKE, fix_encoding

    m = {good: bad for bad, good in MOJIBAKE}
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "perfectly clean ascii text",
            "caf" + m["é"] + " don" + m["’"] + "t",
            "sch" + m["ö"] + "n " + m["“"] + "quote" + m["…"]
            + " caf" + m["é"],
        ], pa.string()),
    })
    got = {r["doc_id"]: r
           for r in fix_encoding(ray.data.from_arrow(docs)).take_all()}
    assert got[0]["replacements"] == 0
    assert got[0]["fixed_text"] == "perfectly clean ascii text"
    assert got[1]["replacements"] == 2
    assert got[1]["fixed_text"] == "café don’t"
    assert got[2]["replacements"] == 4
    assert got[2]["fixed_text"] == "schön “quote… café"


def test_wordlist_blank_lines_do_not_shift_ranks(tmp_path):
    """Ranked-mode rank counter must skip blank lines BEFORE assigning
    ranks (reference _fetch_lines filters empties first) — a blank line
    must not change any following word's log-rank score."""
    from search_engine_ray.sources.wordlists import (
        collect_external_frequencies)

    clean = tmp_path / "clean.txt"
    clean.write_text("alpha\nbeta\ngamma\n")
    blanky = tmp_path / "blanky.txt"
    blanky.write_text("alpha\n\n\nbeta\ngamma\n")
    a = collect_external_frequencies([(str(clean), "ranked", 100, 1.0)])
    b = collect_external_frequencies([(str(blanky), "ranked", 100, 1.0)])
    assert a == b and a["beta"] > 0


def test_rolling_user_stats_vs_naive():
    """rolling_user_stats == naive per-row ROWS-window over (ts, event_id)
    order, with timestamp ties and multi-batch partitioning."""
    import math
    import random

    from search_engine_ray.stages.temporal import rolling_user_stats

    rng = random.Random(23)
    n, k = 500, 5
    rows = []
    for eid in range(n):
        rows.append({
            "event_id": eid,
            "ts": rng.randrange(0, 300) * 1_000_000,     # us, heavy ties
            "user_id": rng.randrange(6),
            "value": round(rng.uniform(0, 200), 2),
        })
    t = pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(7)

    got = {r["event_id"]: (r["roll_sum_cents"], r["roll_max_cents"],
                           r["roll_cnt"])
           for r in rolling_user_stats(ds, window=k).take_all()}
    assert len(got) == n

    by_user = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        hist = by_user.setdefault(r["user_id"], [])
        hist.append((r["event_id"], int(math.floor(r["value"] * 100 + 0.5))))
        win = [c for _, c in hist[-k:]]
        assert got[r["event_id"]] == (sum(win), max(win), len(win)), r


def test_hits_matches_dense_reference():
    """Distributed integer HITS vs a plain numpy reference on a random
    multigraph (duplicate edges included — each parallel edge contributes)."""
    import random
    import numpy as np
    import pyarrow as pa
    import ray.data
    from search_engine_ray.stages.graph import hits

    rng = random.Random(42)
    n = 30
    src = [rng.randrange(n) for _ in range(120)]
    dst = [rng.randrange(n) for _ in range(120)]
    edges = ray.data.from_arrow(pa.table({
        "src_doc_id": pa.array(src, pa.int64()),
        "dst_doc_id": pa.array(dst, pa.int64()),
    })).repartition(4)

    hub, auth = hits(edges, n, iterations=6)

    a = np.ones(n, dtype=np.int64)
    h = np.zeros(n, dtype=np.int64)
    for _ in range(6):
        h = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            h[s] += a[d]
        a = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            a[d] += h[s]
    assert hub.tolist() == h.tolist()
    assert auth.tolist() == a.tolist()


def test_hybrid_rrf_invariants():
    """Fusion output self-consistency on the sf0.001 fixture corpus."""
    from search_engine_ray.pipelines.queries import (HYBRID_OUT, HYBRID_TOPN,
                                                     RRF_K, hybrid_rrf)
    t = hybrid_rrf("/root/testdata/sf0.001")
    assert t.num_rows == HYBRID_OUT
    rows = t.to_pylist()
    for r in rows:
        assert 0 <= r["lex_rank"] <= HYBRID_TOPN
        assert 0 <= r["sem_rank"] <= HYBRID_TOPN
        assert r["lex_rank"] or r["sem_rank"]
        exp = (1.0 / (RRF_K + r["lex_rank"]) if r["lex_rank"] else 0.0) \
            + (1.0 / (RRF_K + r["sem_rank"]) if r["sem_rank"] else 0.0)
        assert r["rrf"] == round(exp, 6)
    # descending with doc_id tie-break
    key = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert key == sorted(key)
    # docs on both lists outrank single-list docs of similar depth: the top
    # fused row must beat any pure single-list score at rank 1
    assert rows[0]["rrf"] >= round(1.0 / (RRF_K + 1), 6) or (
        rows[0]["lex_rank"] and rows[0]["sem_rank"])


def test_funnel_steps_vs_naive():
    """funnel_steps == naive earliest-completion chain per user, including
    out-of-order arrivals, ties broken by strict ts >, and 0-step users."""
    import random

    from search_engine_ray.stages.temporal import funnel_steps

    rng = random.Random(7)
    steps = ["view", "click", "purchase"]
    types = steps + ["error", "signup"]
    rows = []
    for eid in range(400):
        rows.append((eid, rng.randrange(20), rng.choice(types),
                     rng.randrange(1000) * 1_000_000))
    # a user whose click precedes every view (must stall at 1 step)
    rows.append((400, 90, "click", 1_000_000))
    rows.append((401, 90, "view", 2_000_000))
    # a user with view and purchase but no click (stalls at 1)
    rows.append((402, 91, "view", 1_000_000))
    rows.append((403, 91, "purchase", 2_000_000))
    # a user with only errors (0 steps, still a row)
    rows.append((404, 92, "error", 1_000_000))

    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([r[3] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
    })).repartition(5)

    got = {r["user_id"]: r["steps_completed"]
           for r in funnel_steps(ds, steps).take_all()}

    by_user = {}
    for eid, uid, et, ts in rows:
        by_user.setdefault(uid, []).append((et, ts))
    exp = {}
    for uid, evs in by_user.items():
        cur, done = -1, 0
        for s in steps:
            cand = [t for et, t in evs if et == s and t > cur]
            if not cand:
                break
            cur = min(cand)
            done += 1
        exp[uid] = done
    assert got == exp
    assert got[90] == 1 and got[91] == 1 and got[92] == 0


def test_retention_matrix_vs_naive():
    """retention_matrix == naive Monday-week cohort/offset counts."""
    import random

    from search_engine_ray.stages.temporal import retention_matrix

    rng = random.Random(11)
    US_DAY = 86_400_000_000
    rows = []
    for eid in range(600):
        rows.append((rng.randrange(25), rng.randrange(70) * US_DAY
                     + rng.randrange(US_DAY)))
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
    })).repartition(7)

    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention_matrix(ds).take_all()}

    weeks = {}
    for uid, ts in rows:
        weeks.setdefault(uid, set()).add((ts // US_DAY + 3) // 7)
    exp = {}
    for uid, ws in weeks.items():
        cw = min(ws)
        for w in ws:
            exp[(cw, w - cw)] = exp.get((cw, w - cw), 0) + 1
    assert got == exp
    # every cohort has an offset-0 row covering its full membership
    cohorts = {}
    for uid, ws in weeks.items():
        cohorts[min(ws)] = cohorts.get(min(ws), 0) + 1
    for cw, n in cohorts.items():
        assert got[(cw, 0)] == n


def test_per_key_quantile_gate_vs_naive():
    """per_key_quantile_gate == sort-based PERCENTILE_DISC per key, for
    several q values, with duplicate-heavy and single-row keys."""
    import random

    from search_engine_ray.stages.curation import per_key_quantile_gate

    rng = random.Random(13)
    rows = []
    for i in range(500):
        rows.append((i, f"k{rng.randrange(12)}",
                     rng.choice([1, 2, 2, 3, 5, 8, 8, 8, 13, 21])))
    rows.append((500, "solo", 42))     # single-row key: threshold = value

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "token_count": pa.array([r[2] for r in rows], pa.int64()),
    })).repartition(6)

    for q_num, q_den in ((1, 2), (1, 4), (3, 4)):
        got = {r["doc_id"]: (r["token_count"], r["threshold"]) for r in
               per_key_quantile_gate(ds, key="source",
                                     value_col="token_count",
                                     id_col="doc_id", q_num=q_num,
                                     q_den=q_den).take_all()}
        by_key = {}
        for i, k, v in rows:
            by_key.setdefault(k, []).append(v)
        thr = {}
        for k, vs in by_key.items():
            s = sorted(vs)
            n = len(s)
            target = (q_num * n + q_den - 1) // q_den
            thr[k] = s[max(target, 1) - 1]
        exp = {i: (v, thr[k]) for i, k, v in rows if v >= thr[k]}
        assert got == exp, (q_num, q_den)
    assert 500 in got


def test_hash_join_aggregator_reservation_policy():
    """hash_join's aggregator resource override: ZERO CPU reservation at
    sandbox-sized clusters (<= 8 CPUs — the live-reproduced deadlock mode),
    proportional ~25%-of-cluster pool at real cluster sizes, caller
    override always respected."""
    from unittest import mock

    from search_engine_ray.util import hash_join

    captured = {}

    class FakeDS:
        def join(self, other, join_type, num_partitions, **kwargs):
            captured.update(kwargs)
            return "joined"

    def run(cpus, nparts):
        captured.clear()
        with mock.patch("ray.cluster_resources",
                        return_value={"CPU": float(cpus)}), \
             mock.patch("ray.is_initialized", return_value=True):
            out = hash_join(FakeDS(), None, "inner", nparts, on=("k",))
        assert out == "joined"
        return captured["aggregator_ray_remote_args"]

    # this pytest session runs at 4 CPUs: reservation must be zero
    assert run(4, 8)["num_cpus"] == 0.0
    assert run(8, 8)["num_cpus"] == 0.0
    # 32-cpu cluster, 8 partitions: (32/4)/8 = 1.0 per aggregator
    assert run(32, 8)["num_cpus"] == 1.0
    # 64 partitions at 32 cpus: (32/4)/64 = 0.125
    assert run(32, 64)["num_cpus"] == 0.125
    # never exceeds 1 CPU per aggregator
    assert run(256, 4)["num_cpus"] == 1.0
    # caller-provided args pass through untouched
    captured.clear()
    hash_join(FakeDS(), None, "inner", 8,
              aggregator_ray_remote_args={"num_cpus": 0.5})
    assert captured["aggregator_ray_remote_args"] == {"num_cpus": 0.5}
    # Ray not initialized: hash_join lazily (guarded) inits so the sizing
    # sees the REAL cluster — the <=8-cpu fix applies on library paths too.
    # (Here the guarded init is a no-op against the live 4-cpu session, so
    # the reservation must come out zero, not absent.)
    captured.clear()
    with mock.patch("ray.is_initialized", return_value=False):
        hash_join(FakeDS(), None, "inner", 8, on=("k",))
    assert captured["aggregator_ray_remote_args"]["num_cpus"] == 0.0


def test_semdedup_auto_n_lists_scaled_flag_parity():
    """Scale-aware SemDeDup sizing (n_lists=None -> auto_n_lists ~ √N): at
    sf0.1 the √N configuration must (a) bound max cluster size well below
    the small-n_lists config's, (b) flag EXACTLY the injected near-dup set
    — cluster granularity changes the partitioning, not the verdicts."""
    import os

    from search_engine_ray.pipelines.queries import _aug_embeddings
    from search_engine_ray.stages.ann import auto_n_lists, semdedup

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        import pytest as _p
        _p.skip("sf0.1 testdata not present")
    emb = _aug_embeddings(sf_dir).materialize()
    n = emb.count()
    assert auto_n_lists(n) >= 4 * 16       # √N grew past the legacy 16
    injected = {v + 100000 for v in range(25)}

    small = semdedup(emb, n_lists=16, tau=0.95).to_pandas()
    auto = semdedup(emb, n_lists=None, tau=0.95).to_pandas()
    flags_small = set(small[small.is_dup == 1].vec_id)
    flags_auto = set(auto[auto.is_dup == 1].vec_id)
    assert flags_small == flags_auto == injected
    max_small = small.groupby("cluster_id").size().max()
    max_auto = auto.groupby("cluster_id").size().max()
    assert max_auto < max_small / 2        # measured 139 -> 43 at sf0.1
