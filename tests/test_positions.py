"""Positional postings + phrase search (stages/positions.py).

The reference reserves positions INT[] but always writes []
(/root/reference/app/crawler/worker.py:230-234); these tests cover the real
implementation: index layout, position round-trip, and phrase adjacency
semantics incl. overlapping occurrences and repeated-token phrases.
"""

import os
import random

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from search_engine_ray.stages.positions import (
    build_positional_index, decode_positions, load_manifest, phrase_match,
    term_positions, tokenize_positions)

DOCS = [
    (0, "the fast key order sort table scan merge part"),
    (1, "batch batch batch batch stream"),
    (2, "a small a part a batch"),           # 'a' dropped by {2,}
    (3, "merge sort merge sort merge"),
    (4, ""),
    (5, "the end the end"),
    (6, None),
    (7, "end"),
]

PHRASES = ["batch batch batch", "the fast key", "small part batch",
           "merge sort merge", "the end the", "absent phrase", "batch",
           "part", "sort merge part"]


def _ref_count(text: str, phrase: str) -> int:
    t = tokenize_positions(text or "")
    p = tokenize_positions(phrase)
    if not p:
        return 0
    return sum(1 for i in range(len(t) - len(p) + 1) if t[i:i + len(p)] == p)


@pytest.fixture(scope="module")
def pos_index(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("posidx"))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string()),
    }))
    manifest = build_positional_index(ds, idx, docs_per_bucket=2)
    return idx, manifest


def test_manifest_and_bucket_layout(pos_index):
    idx, manifest = pos_index
    # docs_per_bucket=2 over doc_ids 0..7 -> buckets 0..3 (4 and 6 are
    # empty/None docs, so bucket 2 exists via doc 5)
    assert manifest["buckets"] == [0, 1, 2, 3]
    for p in manifest["files"]:
        assert os.path.exists(os.path.join(idx, p))
    assert load_manifest(idx) == manifest


def test_phrase_match_equals_sliding_window_reference(pos_index):
    idx, _ = pos_index
    res = phrase_match(idx, PHRASES).take_all()
    got = {(r["phrase"], r["doc_id"]): r["n_matches"] for r in res}
    for doc_id, text in DOCS:
        for ph in PHRASES:
            exp = _ref_count(text, ph)
            assert got.get((ph, doc_id), 0) == exp, (doc_id, ph)
    # no spurious rows
    assert all(n > 0 for n in got.values())


def test_term_positions_equals_token_counts(pos_index):
    idx, _ = pos_index
    res = term_positions(idx, ["batch", "the", "end"]).take_all()
    got = {(r["term"], r["doc_id"]): r["npos"] for r in res}
    exp = {}
    for doc_id, text in DOCS:
        for t in tokenize_positions(text or ""):
            if t in ("batch", "the", "end"):
                exp[(t, doc_id)] = exp.get((t, doc_id), 0) + 1
    assert got == exp


def test_positions_roundtrip_random():
    rng = random.Random(7)
    for _ in range(50):
        n = rng.randrange(0, 200)
        pos = sorted(rng.sample(range(10000), n))
        from search_engine_ray.functions.varbyte import (delta_encode,
                                                         vb_encode)
        buf = vb_encode(delta_encode(np.asarray(pos, dtype=np.int64)))
        assert decode_positions(buf).tolist() == pos


def test_phrase_match_randomized_vs_reference(pos_index):
    """Random corpora + random phrases vs the sliding-window reference."""
    rng = random.Random(1234)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
            for i in range(40)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    }))
    import tempfile
    with tempfile.TemporaryDirectory() as idx:
        build_positional_index(ds, idx, docs_per_bucket=7)
        phrases = [" ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 4)))
                   for _ in range(12)]
        phrases = sorted(set(phrases))
        res = phrase_match(idx, phrases).take_all()
        got = {(r["phrase"], r["doc_id"]): r["n_matches"] for r in res}
        for doc_id, text in docs:
            for ph in phrases:
                assert got.get((ph, doc_id), 0) == _ref_count(text, ph), \
                    (doc_id, ph)


def test_term_snippets_windows(pos_index):
    from search_engine_ray.stages.positions import term_snippets
    idx, _ = pos_index
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string()),
    }))
    res = term_snippets(idx, ds, ["batch", "end", "sort"],
                        window=2).take_all()
    got = {(r["term"], r["doc_id"]): r["snippet"] for r in res}
    exp = {}
    for doc_id, text in DOCS:
        toks = tokenize_positions(text or "")
        for t in ("batch", "end", "sort"):
            if t in toks:
                p = toks.index(t)
                exp[(t, doc_id)] = " ".join(toks[max(0, p - 2):p + 3])
    assert got == exp
    # edge coverage: first-token occurrence trims the left side
    assert got[("batch", 1)] == "batch batch batch"
    # near-end occurrence trims the right side
    assert got[("end", 7)] == "end"


def test_vectorized_tokenize_equals_reference_impl():
    """The batch-vectorized position encoder must be bit-identical to a
    plain per-doc reference encode over random unicode-ish docs."""
    import functools
    from search_engine_ray.functions.varbyte import delta_encode, vb_encode
    from search_engine_ray.stages.positions import _tok_positions_task

    rng = random.Random(31337)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ffff", "x1", "Q9", "éé", "a"]
    docs = []
    for i in range(300):
        docs.append((i * 3,  # non-contiguous ids exercise bucketing math
                     " ".join(rng.choice(vocab)
                              for _ in range(rng.randrange(0, 40)))))
    docs += [(901, ""), (902, None), (903, "  --  !!")]
    batch = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })
    got = _tok_positions_task(batch, docs_per_bucket=64)
    got_rows = {(r["term"], r["doc_id"]): (r["bucket"], r["npos"],
                                           r["pos_buf"])
                for r in got.to_pylist()}

    exp_rows = {}
    for doc_id, text in docs:
        positions = {}
        for p, tok in enumerate(tokenize_positions(text or "")):
            positions.setdefault(tok, []).append(p)
        for term, plist in positions.items():
            exp_rows[(term, doc_id)] = (
                doc_id // 64, len(plist),
                vb_encode(delta_encode(np.asarray(plist, dtype=np.int64))))
    assert got_rows == exp_rows


def test_phrase_engine_matches_distributed_path(pos_index):
    from search_engine_ray.state.phrase_engine import PhraseEngine
    idx, manifest = pos_index
    eng = PhraseEngine(idx)
    assert eng.num_rows == manifest["rows"]
    dist = phrase_match(idx, PHRASES).take_all()
    for ph in PHRASES:
        exp = sorted(((r["doc_id"], r["n_matches"]) for r in dist
                      if r["phrase"] == ph), key=lambda r: (-r[1], r[0]))
        got = [(h["doc_id"], h["n_matches"]) for h in eng.phrase(ph, limit=100)]
        assert got == exp, ph
    # bucket-sliced shard answers only its doc range
    shard = PhraseEngine(idx, buckets=[0])  # docs 0..1
    got = [(h["doc_id"], h["n_matches"])
           for h in shard.phrase("batch", limit=100)]
    assert got == [(1, 4)]
    # limit respected
    assert len(eng.phrase("batch", limit=1)) == 1


def test_serving_phrase_endpoint(pos_index):
    import json
    import urllib.request
    from search_engine_ray.serving.http import SearchServer
    from search_engine_ray.state.phrase_engine import PhraseEngine

    class _NoEngine:
        def search(self, *a, **k):
            return []

    idx, _ = pos_index
    with SearchServer(_NoEngine(), phrase_engine=PhraseEngine(idx)) as srv:
        base = f"http://{srv.host}:{srv.port}"
        r = json.load(urllib.request.urlopen(
            base + "/search/phrase?q=batch%20batch%20batch&limit=5"))
        assert r == {"results": [{"doc_id": 1, "n_matches": 2}], "count": 1}
        r = json.load(urllib.request.urlopen(
            base + "/search/phrase?q=absent%20phrase"))
        assert r == {"results": [], "count": 0}
        for bad in ("/search/phrase?q=", "/search/phrase?q=x&limit=0",
                    "/search/phrase?q=x&limit=abc"):
            try:
                urllib.request.urlopen(base + bad)
                raise AssertionError("expected 422")
            except urllib.error.HTTPError as e:
                assert e.code == 422, bad


def test_pair_proximity_equals_naive_min_distance(pos_index):
    """pair_proximity == brute-force min |pos_a - pos_b| over the surface
    token sequences, including head-vs-head and absent-term pairs."""
    from search_engine_ray.stages.positions import pair_proximity

    pairs = [("sort", "merge"), ("batch", "stream"), ("the", "end"),
             ("absent", "batch"), ("part", "batch"), ("end", "end")]
    max_dist = 3
    got = {(r["term_a"], r["term_b"], r["doc_id"]): r["min_dist"]
           for r in pair_proximity(pos_index[0], pairs,
                                   max_dist=max_dist).take_all()}

    exp = {}
    for doc_id, text in DOCS:
        toks = tokenize_positions(text or "")
        for ta, tb in pairs:
            pa_ = [i for i, t in enumerate(toks) if t == ta]
            pb_ = [i for i, t in enumerate(toks) if t == tb]
            if not pa_ or not pb_:
                continue
            mind = min(abs(x - y) for x in pa_ for y in pb_)
            if mind <= max_dist:
                exp[(ta, tb, doc_id)] = mind
    assert got == exp
    # same-term pair distance is 0 wherever the term occurs at all
    assert all(v == 0 for (a, b, _), v in got.items() if a == b)


def test_vectorized_matcher_equals_scalar_on_random_corpora():
    """match_one_phrase's vectorized path (npos present) must equal the
    scalar per-doc chain (npos stripped) on random corpora — including
    repeated-token phrases, overlapping occurrences, and absent terms."""
    import random

    from search_engine_ray.functions.varbyte import vb_encode_with_sizes
    from search_engine_ray.stages.positions import (match_one_phrase,
                                                    postings_map_from_sorted)

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(8):
        docs = {d: [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
                for d in range(rng.randint(1, 40))}
        rows = []
        for d, toks in sorted(docs.items()):
            by = {}
            for i, t in enumerate(toks):
                by.setdefault(t, []).append(i)
            for t, ps in by.items():
                gaps = np.asarray([ps[0]] + list(np.diff(ps)),
                                  dtype=np.int64)
                buf, _ = vb_encode_with_sizes(gaps)
                rows.append((t, d, len(ps), bytes(buf)))
        rows.sort(key=lambda r: (r[0], r[1]))
        terms = [r[0] for r in rows]
        dids = np.asarray([r[1] for r in rows], dtype=np.int64)
        npos = np.asarray([r[2] for r in rows], dtype=np.int64)
        bufs = [r[3] for r in rows]
        with_n = postings_map_from_sorted(terms, dids, bufs, npos)
        without = postings_map_from_sorted(terms, dids, bufs)
        for _ in range(20):
            plen = rng.randint(1, 4)
            ph = [rng.choice(vocab) for _ in range(plen)]
            a = sorted(match_one_phrase(with_n, ph))
            b = sorted(match_one_phrase(without, ph))
            assert a == b, (trial, ph)


def test_phrase_engine_near_matches_distributed(pos_index):
    """PhraseEngine.near == pair_proximity on the same index, ordered by
    (min_dist ASC, doc_id ASC); non-single-token inputs return []."""
    from search_engine_ray.stages.positions import pair_proximity
    from search_engine_ray.state.phrase_engine import PhraseEngine

    idx, _ = pos_index
    eng = PhraseEngine(idx)
    pairs = [("sort", "merge"), ("the", "end"), ("absent", "batch"),
             ("part", "batch")]
    dist = 3
    distributed = {}
    for r in pair_proximity(idx, pairs, max_dist=dist).take_all():
        distributed.setdefault((r["term_a"], r["term_b"]), []).append(
            (r["min_dist"], r["doc_id"]))
    for ta, tb in pairs:
        exp = sorted(distributed.get((ta, tb), []))
        got = [(r["min_dist"], r["doc_id"])
               for r in eng.near(ta, tb, max_dist=dist, limit=100)]
        assert got == exp, (ta, tb)
    assert eng.near("two words", "x") == []
    assert eng.near("", "x") == []


# -- fused build + extend/tombstone lifecycle ---------------------------------

def _phrase_urls(index_dir: str, phrases) -> set:
    """(phrase, url, n_matches) set for a FUSED index — url-keyed so id
    remapping across recrawl generations doesn't affect the comparison."""
    import pyarrow.parquet as pq

    hits = phrase_match(os.path.join(index_dir, "positions"),
                        phrases).take_all()
    docs = pq.read_table(os.path.join(index_dir, "docs"),
                         columns=["doc_id", "conv_id", "turn_idx"])
    url = {d: f"{c}#{t}" for d, c, t in zip(
        docs.column("doc_id").to_pylist(),
        docs.column("conv_id").to_pylist(),
        docs.column("turn_idx").to_pylist())}
    return {(r["phrase"], url[r["doc_id"]], r["n_matches"]) for r in hits}


def test_fused_positions_extend_and_recrawl_match_clean_rebuild(tmp_path):
    """build_index(build_positions=True) + extend_index (append, then an
    out-of-order RECRAWL) keeps the positional artifact live: phrase hits
    over the extended index equal a clean fused rebuild of the final
    corpus — tombstoned recrawl victims are filtered, new docs findable."""
    import pyarrow.compute as pc

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index, extend_index
    from search_engine_ray.sources.transcripts import generate_transcripts

    full = generate_transcripts(60, seed=21)
    mask_a = pc.less(full.column("conv_id"), "conv-000040")
    part_a, part_b = full.filter(mask_a), full.filter(pc.invert(mask_a))
    phrases = ["word0001 word0002", "the word0003", "word0004",
               "zzfresh phrase body", "absent thing"]

    cfg = EngineConfig(index_dir=str(tmp_path / "inc"), num_partitions=4,
                       build_positions=True, positions_docs_per_bucket=64)
    build_index(ray.data.from_arrow(part_a).repartition(3), cfg,
                source_desc="pos-a")
    extend_index(ray.data.from_arrow(part_b).repartition(2), cfg,
                 source_desc="pos-b")

    cfg_full = EngineConfig(index_dir=str(tmp_path / "full"),
                            num_partitions=4, build_positions=True,
                            positions_docs_per_bucket=64)
    build_index(ray.data.from_arrow(full).repartition(4), cfg_full,
                source_desc="pos-full")
    assert _phrase_urls(cfg.index_dir, phrases) == \
        _phrase_urls(cfg_full.index_dir, phrases)

    # recrawl one conversation with entirely new text: old version must
    # drop out of phrase results (tombstone filter), new text findable
    reconv = full.filter(pc.equal(full.column("conv_id"), "conv-000010"))
    assert reconv.num_rows
    recrawl = reconv.set_column(
        reconv.schema.get_field_index("text"), "text",
        pa.array(["zzfresh phrase body here"] * reconv.num_rows,
                 pa.string()))
    extend_index(ray.data.from_arrow(recrawl), cfg,
                 source_desc="pos-recrawl", allow_out_of_order=True)

    final = pa.concat_tables([
        full.filter(pc.not_equal(full.column("conv_id"), "conv-000010")),
        recrawl]).sort_by("conv_id")
    cfg_f2 = EngineConfig(index_dir=str(tmp_path / "full2"),
                          num_partitions=4, build_positions=True,
                          positions_docs_per_bucket=64)
    build_index(ray.data.from_arrow(final).repartition(4), cfg_f2,
                source_desc="pos-full2")
    got, want = _phrase_urls(cfg.index_dir, phrases), \
        _phrase_urls(cfg_f2.index_dir, phrases)
    assert got == want
    assert any(p == "zzfresh phrase body" for p, _, _ in got)


def test_fused_pos_tokenize_parity(tmp_path):
    """_fused_pos_task's combined (BM25) output is row-set identical to
    TokenizeBatcher for every (do_stem, drop_stopwords) combination —
    empty, None, stop-only and repeated-token docs included."""
    import shutil

    from search_engine_ray.stages.positions import _fused_pos_task
    from search_engine_ray.stages.tokenize import TokenizeBatcher

    rng = random.Random(31)
    vocab = ["the", "batch", "running", "runs", "tables", "of", "data2",
             "a", "xy", "sorting"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
             for _ in range(40)]
    texts += ["", "the of a to", None, "THE Batch RUNNING!"]
    ids = list(range(500, 500 + len(texts)))
    rng.shuffle(ids)
    batch = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})

    def norm(t):
        return sorted(zip(t.column("kind").to_pylist(),
                          t.column("term").to_pylist(),
                          t.column("doc_id").to_pylist(),
                          t.column("tf").to_pylist()))

    for do_stem in (True, False):
        for drop in (True, False):
            frag = str(tmp_path / f"frag-{do_stem}-{drop}")
            shutil.rmtree(frag, ignore_errors=True)
            old = TokenizeBatcher(do_stem=do_stem, drop_stopwords=drop)(
                batch)
            new = _fused_pos_task(batch, frag_root=frag, docs_per_bucket=16,
                                  do_stem=do_stem, drop_stopwords=drop)
            assert norm(old) == norm(new), (do_stem, drop)


def test_fused_build_artifact_equals_standalone(tmp_path):
    """build_index(build_positions=True): (a) BM25 segments are
    byte-identical to a plain build (fusion is invisible to the main
    artifact), (b) positional bucket files are table-identical to the
    standalone build_positional_index over the same doc store."""
    import hashlib

    import pyarrow.parquet as pq

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.sources.transcripts import generate_transcripts

    table = generate_transcripts(40, seed=17)
    cfg = EngineConfig(index_dir=str(tmp_path / "fused"), num_partitions=4,
                       build_positions=True, positions_docs_per_bucket=64)
    build_index(ray.data.from_arrow(table).repartition(3), cfg,
                source_desc="par")
    cfg2 = EngineConfig(index_dir=str(tmp_path / "plain"), num_partitions=4)
    build_index(ray.data.from_arrow(table).repartition(3), cfg2,
                source_desc="par")

    def segdigest(d):
        h = hashlib.md5()
        for s in sorted(os.listdir(os.path.join(d, "segments"))):
            h.update(s.encode())
            with open(os.path.join(d, "segments", s), "rb") as f:
                h.update(f.read())
        return h.hexdigest()

    assert segdigest(cfg.index_dir) == segdigest(cfg2.index_dir)

    docs = ray.data.read_parquet(os.path.join(cfg.index_dir, "docs"),
                                 columns=["doc_id", "text"])
    standalone = str(tmp_path / "standalone")
    build_positional_index(docs, standalone, docs_per_bucket=64)
    ma = load_manifest(os.path.join(cfg.index_dir, "positions"))
    mb = load_manifest(standalone)
    assert ma["files"] == mb["files"] and ma["rows"] == mb["rows"]
    for f in ma["files"]:
        ta = pq.read_table(os.path.join(cfg.index_dir, "positions", f))
        tb = pq.read_table(os.path.join(standalone, f))
        assert ta.equals(tb), f


def test_term_snippets_join_path_equals_broadcast(pos_index):
    """The distributed hash-join snippet plan (auto-cutover when Σ df over
    the query terms exceeds max_broadcast_rows) returns exactly the
    broadcast plan's rows — driver state stays bounded on head terms."""
    from search_engine_ray.stages.positions import term_snippets

    idx, _ = pos_index
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string()),
    }))
    terms = ["batch", "merge", "the", "end"]
    broadcast = sorted(
        (r["term"], r["doc_id"], r["snippet"])
        for r in term_snippets(idx, docs, terms, window=2).take_all())
    joined = sorted(
        (r["term"], r["doc_id"], r["snippet"])
        for r in term_snippets(idx, docs, terms, window=2,
                               max_broadcast_rows=0).take_all())
    assert broadcast and joined == broadcast


def test_compact_index_preserves_positional_artifact(tmp_path):
    """compact_index on a FUSED index keeps the positional artifact live
    (even when the compaction caller's cfg doesn't set build_positions) and
    folds tombstones: post-compact phrase hits equal a clean fused rebuild
    of the live corpus."""
    import pyarrow.compute as pc

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import (build_index,
                                                   compact_index,
                                                   extend_index)
    from search_engine_ray.sources.transcripts import generate_transcripts

    full = generate_transcripts(40, seed=29)
    cfg = EngineConfig(index_dir=str(tmp_path / "cmp"), num_partitions=4,
                       build_positions=True, positions_docs_per_bucket=64)
    build_index(ray.data.from_arrow(full).repartition(3), cfg,
                source_desc="cmp-pos")
    reconv = full.filter(pc.equal(full.column("conv_id"), "conv-000003"))
    recrawl = reconv.set_column(
        reconv.schema.get_field_index("text"), "text",
        pa.array(["zzfresh phrase body here"] * reconv.num_rows,
                 pa.string()))
    extend_index(ray.data.from_arrow(recrawl), cfg,
                 source_desc="cmp-pos-re", allow_out_of_order=True)

    # compact with a cfg that does NOT claim build_positions — the artifact
    # on disk is the property that must survive
    plain_cfg = EngineConfig(index_dir=cfg.index_dir, num_partitions=4,
                             positions_docs_per_bucket=64)
    compact_index(plain_cfg)
    assert os.path.exists(os.path.join(cfg.index_dir, "positions",
                                       "manifest.json"))

    live = pa.concat_tables([
        full.filter(pc.not_equal(full.column("conv_id"), "conv-000003")),
        recrawl]).sort_by("conv_id")
    cfg2 = EngineConfig(index_dir=str(tmp_path / "clean"), num_partitions=4,
                        build_positions=True, positions_docs_per_bucket=64)
    build_index(ray.data.from_arrow(live).repartition(3), cfg2,
                source_desc="cmp-pos-clean")
    phrases = ["word0001 word0002", "zzfresh phrase body", "the word0003"]

    def urls(index_dir):
        import pyarrow.parquet as pq
        hits = phrase_match(os.path.join(index_dir, "positions"),
                            phrases).take_all()
        docs = pq.read_table(os.path.join(index_dir, "docs"),
                             columns=["doc_id", "conv_id", "turn_idx"])
        u = {d: f"{c}#{t}" for d, c, t in zip(
            docs.column("doc_id").to_pylist(),
            docs.column("conv_id").to_pylist(),
            docs.column("turn_idx").to_pylist())}
        return {(r["phrase"], u[r["doc_id"]], r["n_matches"]) for r in hits}

    got, want = urls(cfg.index_dir), urls(cfg2.index_dir)
    assert got == want
    assert any(p == "zzfresh phrase body" for p, _, _ in got)


def test_pair_before_equals_naive_directed_min_distance(pos_index):
    """Directed BEFORE/n (b strictly after a): distributed result equals
    the brute-force min over ordered occurrence pairs, incl. the same-term
    pair (consecutive-occurrence gap) and pairs with no qualifying order."""
    from search_engine_ray.stages.positions import pair_before

    idx, _ = pos_index
    pairs = [("sort", "merge"), ("merge", "sort"), ("the", "end"),
             ("end", "the"), ("batch", "batch"), ("absent", "batch"),
             ("small", "part")]
    dist = 3
    got = {}
    for r in pair_before(idx, pairs, max_dist=dist).take_all():
        got[(r["term_a"], r["term_b"], r["doc_id"])] = r["min_dist"]

    want = {}
    for doc_id, text in DOCS:
        toks = tokenize_positions(text or "")
        for ta, tb in pairs:
            best = None
            for i, t in enumerate(toks):
                if t != ta:
                    continue
                for j in range(i + 1, len(toks)):
                    if toks[j] == tb:
                        d = j - i
                        best = d if best is None else min(best, d)
                        break
            if best is not None and best <= dist:
                want[(ta, tb, doc_id)] = best
    assert got == want


def test_fused_resume_with_changed_corpus_rebuilds_positions(tmp_path):
    """resume=True over a CHANGED corpus must not merge the previous
    corpus's positional buckets into the new artifact: phrases that exist
    only in corpus A must return zero hits after the rebuild with corpus
    B (review finding: stale bucket rows survived the (term, doc_id)
    dedup and served mixed-corpus phrase hits)."""
    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index

    marker = "qqstalemarker unique phrase body"
    a = pa.table({
        "conv_id": pa.array([f"conv-{i:06d}" for i in range(8)]),
        "turn_idx": pa.array([0] * 8, pa.int32()),
        "role": pa.array(["user"] * 8),
        "text": pa.array([marker + f" extra {i}" for i in range(8)]),
        "tool": pa.array([""] * 8),
        "ts": pa.array([0] * 8, pa.timestamp("us")),
    })
    b = a.set_column(a.schema.get_field_index("text"), "text",
                     pa.array([f"fresh other words {i}" for i in range(8)]))
    cfg = EngineConfig(index_dir=str(tmp_path / "sr"), num_partitions=4,
                       build_positions=True, positions_docs_per_bucket=4)
    build_index(ray.data.from_arrow(a), cfg, source_desc="corpus-a")
    assert phrase_match(os.path.join(cfg.index_dir, "positions"),
                        ["qqstalemarker unique"]).count() == 8
    # resume=True, different source fingerprint -> full rebuild; the
    # positional artifact must be regenerated, not merged
    build_index(ray.data.from_arrow(b), cfg, source_desc="corpus-b",
                resume=True)
    assert phrase_match(os.path.join(cfg.index_dir, "positions"),
                        ["qqstalemarker unique"]).count() == 0
    assert phrase_match(os.path.join(cfg.index_dir, "positions"),
                        ["fresh other words"]).count() == 8


def test_fused_positions_crash_window_resume(tmp_path):
    """Crash between bucket publication and the positions manifest write:
    a resumed build must republish a COMPLETE artifact, not an empty
    manifest over populated bucket files (review finding: the old manifest
    rebuild trusted prior manifest rows + touched fragments only)."""
    import json

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.sources.transcripts import generate_transcripts

    table = generate_transcripts(30, seed=41)
    cfg = EngineConfig(index_dir=str(tmp_path / "cw"), num_partitions=4,
                       build_positions=True, positions_docs_per_bucket=32)
    build_index(ray.data.from_arrow(table).repartition(3), cfg,
                source_desc="cw")
    pos_dir = os.path.join(cfg.index_dir, "positions")
    before = load_manifest(pos_dir)
    assert before["rows"] > 0
    hits_before = sorted(map(tuple, phrase_match(
        pos_dir, ["word0001 word0002"]).to_pandas().values.tolist()))

    # simulate the crash window: manifest gone, bucket files present
    os.remove(os.path.join(pos_dir, "manifest.json"))
    build_index(ray.data.from_arrow(table).repartition(3), cfg,
                source_desc="cw", resume=True)
    after = load_manifest(pos_dir)
    assert after["rows"] == before["rows"]
    assert after["files"] == before["files"]
    hits_after = sorted(map(tuple, phrase_match(
        pos_dir, ["word0001 word0002"]).to_pandas().values.tolist()))
    assert hits_after == hits_before


def test_phrase_engine_respects_tombstones_and_plain_resume_clears(tmp_path):
    """(a) The serving PhraseEngine applies the same tombstone mask as the
    distributed positional readers — a recrawled conversation's OLD turns
    must not appear in phrase()/near() results; (b) a resume=True rebuild
    with build_positions=False over a CHANGED corpus clears the stale
    positional artifact instead of leaving doc-id-stale rows."""
    import pyarrow.compute as pc

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index, extend_index
    from search_engine_ray.sources.transcripts import generate_transcripts
    from search_engine_ray.state.phrase_engine import PhraseEngine

    full = generate_transcripts(30, seed=47)
    cfg = EngineConfig(index_dir=str(tmp_path / "pt"), num_partitions=4,
                       build_positions=True, positions_docs_per_bucket=32)
    build_index(ray.data.from_arrow(full).repartition(3), cfg,
                source_desc="pt")
    pos_dir = os.path.join(cfg.index_dir, "positions")

    # doc ids of conv-000002 BEFORE the recrawl (they will be tombstoned)
    import pyarrow.parquet as pq
    docs = pq.read_table(os.path.join(cfg.index_dir, "docs"),
                         columns=["doc_id", "conv_id"])
    old_ids = {d for d, c in zip(docs.column("doc_id").to_pylist(),
                                 docs.column("conv_id").to_pylist())
               if c == "conv-000002"}
    assert old_ids

    reconv = full.filter(pc.equal(full.column("conv_id"), "conv-000002"))
    recrawl = reconv.set_column(
        reconv.schema.get_field_index("text"), "text",
        pa.array(["zzserving fresh body"] * reconv.num_rows, pa.string()))
    extend_index(ray.data.from_arrow(recrawl), cfg,
                 source_desc="pt-re", allow_out_of_order=True)

    pe = PhraseEngine(pos_dir)
    new_hits = pe.phrase("zzserving fresh body", limit=100)
    assert new_hits and all(h["doc_id"] not in old_ids for h in new_hits)
    # any phrase result anywhere must exclude the tombstoned old ids
    for q in ("word0001 word0002", "the word0003"):
        for h in pe.phrase(q, limit=1000):
            assert h["doc_id"] not in old_ids, q
    for h in pe.near("word0001", "word0002", max_dist=5, limit=1000):
        assert h["doc_id"] not in old_ids

    # (b) plain (build_positions=False) resume over a CHANGED corpus: the
    # stale positional artifact must be cleared, not left behind
    other = generate_transcripts(20, seed=48)
    cfg_plain = EngineConfig(index_dir=cfg.index_dir, num_partitions=4)
    build_index(ray.data.from_arrow(other).repartition(2), cfg_plain,
                source_desc="pt-other", resume=True)
    assert not os.path.exists(os.path.join(pos_dir, "manifest.json"))
