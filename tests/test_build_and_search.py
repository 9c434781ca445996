"""Engine-vs-oracle rank identity + build invariants (SURVEY.md §5.1-5.5)."""

import glob
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from oracle.oracle import OracleIndex
from search_engine_ray.config import EngineConfig
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.state.query_engine import QueryEngine

# Reference query set (FIXTURES.md F2 coverage classes)
QUERY_SET = [
    ("word0000", 20, 0),                 # hot head term
    ("word4321", 20, 0),                 # rare term
    ("word0001 word0002 word0003", 20, 0),   # multi-term partial coverage
    ("the and of to", 20, 0),            # all stopwords -> empty
    ("running", 20, 0),                  # stemmed form matches
    ("indexes indexing", 20, 0),
    ("Word0001, WORD0002!", 20, 0),      # mixed case + punctuation
    ("word0001", 1, 0),                  # limit 1
    ("word0001", 100, 0),                # limit 100
    ("word0001 word0005", 20, 10),       # nonzero offset
    ("word0000", 20, 100000),            # offset beyond results
    ("error404 v2", 20, 0),              # alphanumerics
    ("mutated", 20, 0),                  # near-dup marker word
    ("café 日本語", 20, 0),              # non-ASCII -> empty
]


def _rows_key(rows):
    return [(r["url"], r["score"], r["token_score"], r["matched_terms"])
            for r in rows]


def test_rank_identity_vs_oracle(built_index, oracle_index):
    cfg, _ = built_index
    qe = QueryEngine(cfg.index_dir)
    for q, limit, offset in QUERY_SET:
        a = qe.search(q, limit=limit, offset=offset)
        b = oracle_index.search(q, limit=limit, offset=offset)
        assert _rows_key(a) == _rows_key(b), f"query {q!r}"


def test_bm25_mode_rank_identity(built_index, tiny_transcripts):
    cfg, _ = built_index
    qe = QueryEngine(cfg.index_dir, scoring="bm25")
    oi = OracleIndex(tiny_transcripts, scoring="bm25")
    for q in ("word0000", "word0001 word0002", "running indexes"):
        a = qe.search(q, limit=20)
        b = oi.search(q, limit=20)
        assert _rows_key(a) == _rows_key(b), f"bm25 query {q!r}"


def test_corpus_stats_match_oracle(built_index, oracle_index):
    _, info = built_index
    assert info["doc_total"] == oracle_index.doc_total
    assert info["stats"]["avgdl"] == pytest.approx(oracle_index.avgdl)
    assert info["stats"]["total_tokens"] == sum(oracle_index.doc_len)


def test_term_stats_match_oracle(built_index, oracle_index):
    cfg, _ = built_index
    qe = QueryEngine(cfg.index_dir, load_docs=False)
    assert set(qe._dict.keys()) == set(oracle_index.postings.keys())
    for term in list(oracle_index.postings.keys()):
        df, cf, idf = qe.term_stats(term)
        assert df == oracle_index.df[term]
        assert cf == oracle_index.cf[term]
        assert idf == oracle_index.idf[term]


def test_per_turn_text_equality_invariant(built_index, tiny_transcripts):
    """BASELINE.json per-row invariant: doc-store text == source text
    byte-for-byte for every (conv_id, turn_idx)."""
    cfg, _ = built_index
    docs = pq.read_table(os.path.join(cfg.index_dir, "docs"),
                         columns=["conv_id", "turn_idx", "text"])
    stored = {(c, t): x for c, t, x in zip(
        docs.column("conv_id").to_pylist(),
        docs.column("turn_idx").to_pylist(),
        docs.column("text").to_pylist())}
    src = tiny_transcripts
    assert len(stored) == src.num_rows
    for c, t, x in zip(src.column("conv_id").to_pylist(),
                       src.column("turn_idx").to_pylist(),
                       src.column("text").to_pylist()):
        assert stored[(c, t)] == x


def _segments_digest(index_dir):
    h = hashlib.sha256()
    for f in sorted(glob.glob(os.path.join(index_dir, "segments", "*.parquet"))):
        h.update(os.path.basename(f).encode())
        h.update(repr(pq.read_table(f).to_pydict()).encode())
    return h.hexdigest()


def test_parallelism_independence(tiny_transcripts, tmp_path):
    """Different block layouts must produce byte-identical segments."""
    digests = []
    for i, parts in enumerate((2, 7)):
        cfg = EngineConfig(index_dir=str(tmp_path / f"idx{i}"), num_partitions=8)
        ds = ray.data.from_arrow(tiny_transcripts).repartition(parts)
        build_index(ds, cfg, source_desc="par")
        digests.append(_segments_digest(cfg.index_dir))
    assert digests[0] == digests[1]


def test_salted_equals_unsalted(tiny_transcripts, tmp_path, built_index):
    cfg_ref, _ = built_index
    cfg = EngineConfig(index_dir=str(tmp_path / "salted"), num_partitions=8,
                       salt=4)
    ds = ray.data.from_arrow(tiny_transcripts).repartition(4)
    build_index(ds, cfg, source_desc="tiny")
    assert _segments_digest(cfg.index_dir) == _segments_digest(cfg_ref.index_dir)


def test_resume_equals_clean(tiny_transcripts, tmp_path, built_index):
    """Kill/resume (SURVEY.md §5.5): drop segments + manifest entries, rebuild,
    byte-identical artifacts."""
    from search_engine_ray.stages.postings import load_manifest, save_manifest

    cfg_ref, _ = built_index
    cfg = EngineConfig(index_dir=str(tmp_path / "resume"), num_partitions=8)
    ds = ray.data.from_arrow(tiny_transcripts).repartition(4)
    build_index(ds, cfg, source_desc="tiny")

    man = load_manifest(cfg.index_dir)
    dropped = 0
    for p in list(man["entries"])[:3]:
        e = man["entries"].pop(p)
        os.remove(os.path.join(cfg.index_dir, "segments", e["file"]))
        dropped += 1
    assert dropped == 3
    save_manifest(cfg.index_dir, man)

    build_index(ds, cfg, source_desc="tiny", resume=True)
    assert _segments_digest(cfg.index_dir) == _segments_digest(cfg_ref.index_dir)


def test_wand_equals_exhaustive(built_index):
    """Property (SURVEY.md §5.4a): block-max-WAND top-k == exhaustive
    scoring top-k, scores bit-identical, in both scoring modes."""
    cfg, _ = built_index
    for scoring in ("reference", "bm25"):
        qe = QueryEngine(cfg.index_dir, scoring=scoring, load_docs=False)
        for q, limit, offset in QUERY_SET:
            a = qe.candidates(q, limit=limit, offset=offset)
            b = qe.candidates_wand(q, limit=limit, offset=offset)
            c = qe.candidates_auto(q, limit=limit, offset=offset)
            assert (a is None) == (b is None) == (c is None)
            if a is not None:
                assert a[0] == b[0], f"{scoring} {q!r}"
                assert a[0] == c[0], f"auto {scoring} {q!r}"


def test_blocked_postings_roundtrip():
    import numpy as np
    from search_engine_ray.functions.varbyte import (
        decode_block, decode_postings_blocked, encode_postings_blocked)
    docs = np.sort(np.random.default_rng(5).choice(
        10_000, size=1000, replace=False)).astype(np.uint64)
    tfs = (docs % 9 + 1).astype(np.uint64)
    dbuf, tbuf, meta = encode_postings_blocked(docs, tfs, 128)
    d2, t2 = decode_postings_blocked(dbuf, tbuf, meta)
    assert np.array_equal(d2, docs) and np.array_equal(t2, tfs)
    # each block independently decodable and consistent with meta
    for b in range(len(meta["last_doc"])):
        db, tb = decode_block(dbuf, tbuf, meta, b)
        assert db[-1] == meta["last_doc"][b]
        assert tb.max() == meta["max_tf"][b]
        assert len(db) == meta["count"][b]


def test_news_bias_matches_oracle(built_index, oracle_index):
    """Second-corpus variant (J3): +8.0 intent bias applied identically."""
    cfg, _ = built_index
    qe = QueryEngine(cfg.index_dir)
    for q in ("word0001 word0002", "running"):
        a = qe.search(q, limit=10, intent_bias=8.0)
        b = oracle_index.search(q, limit=10, intent_bias=8.0)
        assert _rows_key(a) == _rows_key(b)
        plain = qe.search(q, limit=10)
        assert all(x["score"] == y["score"] + 8.0
                   for x, y in zip(a, plain) if x["url"] == y["url"])


def test_checkpoint_triples_path_equals_fused(tiny_transcripts, tmp_path,
                                              built_index):
    """The triples-checkpoint physical plan produces byte-identical segments
    to the fused plan (they are alternative executions of the same logical
    build)."""
    cfg_ref, _ = built_index
    cfg = EngineConfig(index_dir=str(tmp_path / "ckpt"), num_partitions=8,
                       checkpoint_triples=True)
    ds = ray.data.from_arrow(tiny_transcripts).repartition(4)
    build_index(ds, cfg, source_desc="tiny")
    assert _segments_digest(cfg.index_dir) == _segments_digest(cfg_ref.index_dir)
    # doclens artifact equivalent too (fused writes one file, checkpoint path
    # writes a directory — compare contents)
    import pyarrow.parquet as pq
    a = pq.read_table(os.path.join(cfg.index_dir, "doclens")).sort_by("doc_id")
    b = pq.read_table(os.path.join(cfg_ref.index_dir, "doclens")).sort_by("doc_id")
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
    assert [int(x) for x in a.column("doc_len").to_pylist()] == \
        [int(x) for x in b.column("doc_len").to_pylist()]


def test_incremental_extend_equals_full_build(tmp_path):
    """build(A) + extend_index(B) == build(A ∪ B): identical term stats,
    postings, doc lengths and search results (stored idf in untouched parts
    may reflect the old N — QueryEngine recomputes idf from live stats)."""
    import numpy as np
    import pyarrow.compute as pc

    from search_engine_ray.pipelines.build import extend_index
    from search_engine_ray.sources.transcripts import generate_transcripts

    full = generate_transcripts(80, seed=11)
    mask_a = pc.less(full.column("conv_id"), "conv-000050")
    part_a = full.filter(mask_a)
    part_b = full.filter(pc.invert(mask_a))
    assert part_a.num_rows and part_b.num_rows

    cfg_inc = EngineConfig(index_dir=str(tmp_path / "inc"), num_partitions=8)
    build_index(ray.data.from_arrow(part_a).repartition(3), cfg_inc,
                source_desc="inc-a")
    extend_index(ray.data.from_arrow(part_b).repartition(2), cfg_inc,
                 source_desc="inc-b")

    cfg_full = EngineConfig(index_dir=str(tmp_path / "full"),
                            num_partitions=8)
    build_index(ray.data.from_arrow(full).repartition(4), cfg_full,
                source_desc="inc-full")

    qi = QueryEngine(cfg_inc.index_dir)
    qf = QueryEngine(cfg_full.index_dir)
    assert qi.doc_total == qf.doc_total == full.num_rows
    assert qi.avgdl == qf.avgdl
    assert set(qi._dict) == set(qf._dict)
    for term in qf._dict:
        a, b = qi.postings(term), qf.postings(term)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1]), term
        assert a[2] == b[2]
        assert qi.term_stats(term) == qf.term_stats(term)
    assert np.array_equal(qi._doc_len, qf._doc_len)
    for q, limit, offset in QUERY_SET[:8]:
        assert _rows_key(qi.search(q, limit=limit, offset=offset)) == \
            _rows_key(qf.search(q, limit=limit, offset=offset)), q

    # append-only contract enforced
    import pytest as _pytest
    with _pytest.raises(ValueError, match="append-only"):
        extend_index(ray.data.from_arrow(part_a), cfg_inc,
                     source_desc="inc-bad")


def test_rebuild_clears_stale_artifacts(tmp_path):
    """A fresh (non-resume) rebuild into an existing index dir must
    truncate: rebuilding a smaller corpus with fewer partitions may leave
    old segment/doclen files behind otherwise, and QueryEngine discovers
    those by glob — stale doclens index-error, stale segments double-count
    df and resurrect deleted docs."""
    from search_engine_ray.sources.transcripts import generate_transcripts

    big = generate_transcripts(80, seed=3)
    small = generate_transcripts(24, seed=4)
    cfg_big = EngineConfig(index_dir=str(tmp_path / "re"),
                           num_partitions=16)
    build_index(ray.data.from_arrow(big).repartition(4), cfg_big,
                source_desc="big")
    cfg_small = EngineConfig(index_dir=str(tmp_path / "re"),
                             num_partitions=4)
    build_index(ray.data.from_arrow(small).repartition(2), cfg_small,
                source_desc="small")

    qe = QueryEngine(cfg_small.index_dir)
    assert qe.doc_total == small.num_rows
    # no stale double counts: df can never exceed the live corpus
    for term, entry in qe._dict.items():
        assert entry[0] <= small.num_rows, term
    # and a clean build of the small corpus matches exactly
    cfg_ref = EngineConfig(index_dir=str(tmp_path / "ref"),
                           num_partitions=4)
    build_index(ray.data.from_arrow(small).repartition(2), cfg_ref,
                source_desc="small")
    qr = QueryEngine(cfg_ref.index_dir)
    assert set(qe._dict) == set(qr._dict)
    for term in qr._dict:
        assert qe.term_stats(term) == qr.term_stats(term), term
    for q, limit, offset in QUERY_SET[:6]:
        assert _rows_key(qe.search(q, limit=limit, offset=offset)) == \
            _rows_key(qr.search(q, limit=limit, offset=offset)), q


def test_extend_retry_guard(tmp_path):
    """An interrupted extend leaves extend.inprogress; a retry must refuse
    (segment merges commit incrementally — re-merging would double-count)
    and a completed extend must clear the marker."""
    import pytest as _pytest

    from search_engine_ray.pipelines.build import extend_index
    from search_engine_ray.sources.transcripts import generate_transcripts

    full = generate_transcripts(40, seed=9)
    import pyarrow.compute as pc
    mask = pc.less(full.column("conv_id"), "conv-000003")
    cfg = EngineConfig(index_dir=str(tmp_path / "g"), num_partitions=4)
    build_index(ray.data.from_arrow(full.filter(mask)), cfg,
                source_desc="g-a")

    marker = os.path.join(cfg.index_dir, "extend.inprogress")
    with open(marker, "w") as f:
        f.write("crashed")
    with _pytest.raises(RuntimeError, match="did not complete"):
        extend_index(ray.data.from_arrow(full.filter(pc.invert(mask))),
                     cfg, source_desc="g-b")
    os.remove(marker)
    extend_index(ray.data.from_arrow(full.filter(pc.invert(mask))), cfg,
                 source_desc="g-b")
    assert not os.path.exists(marker)
    assert QueryEngine(cfg.index_dir).doc_total == full.num_rows


def test_out_of_order_extend_and_recrawl(tmp_path):
    """Generation-based ingest: a conv-id slice that sorts BEFORE max_conv
    lands as its own tail doc-id generation; search results equal a clean
    unified rebuild.  Re-ingesting an existing conv (recrawl) tombstones the
    old docs — queries see only the new version, no duplicate urls."""
    import pyarrow.compute as pc
    import pytest as _pytest

    from search_engine_ray.pipelines.build import extend_index
    from search_engine_ray.sources.transcripts import generate_transcripts

    full = generate_transcripts(60, seed=13)
    mask_mid = pc.and_(
        pc.greater_equal(full.column("conv_id"), "conv-000020"),
        pc.less(full.column("conv_id"), "conv-000030"))
    part_mid = full.filter(mask_mid)
    part_rest = full.filter(pc.invert(mask_mid))
    assert part_mid.num_rows and part_rest.num_rows

    cfg_inc = EngineConfig(index_dir=str(tmp_path / "ooo"), num_partitions=8)
    build_index(ray.data.from_arrow(part_rest).repartition(3), cfg_inc,
                source_desc="ooo-a")
    with _pytest.raises(ValueError, match="append-only"):
        extend_index(ray.data.from_arrow(part_mid), cfg_inc,
                     source_desc="ooo-bad")
    info = extend_index(ray.data.from_arrow(part_mid).repartition(2),
                        cfg_inc, source_desc="ooo-b",
                        allow_out_of_order=True)
    gens = info["manifest"]["generations"]
    assert gens[-1]["out_of_order"] and \
        gens[-1]["doc_hi"] - gens[-1]["doc_lo"] == part_mid.num_rows

    cfg_full = EngineConfig(index_dir=str(tmp_path / "ooo_full"),
                            num_partitions=8)
    build_index(ray.data.from_arrow(full).repartition(4), cfg_full,
                source_desc="ooo-full")
    qi = QueryEngine(cfg_inc.index_dir)
    qf = QueryEngine(cfg_full.index_dir)
    assert qi.doc_total == qf.doc_total == full.num_rows
    assert qi.avgdl == qf.avgdl
    for q, limit, offset in QUERY_SET[:8]:
        assert _rows_key(qi.search(q, limit=limit, offset=offset)) == \
            _rows_key(qf.search(q, limit=limit, offset=offset)), q

    # recrawl conv-000025 with entirely new text
    reconv = part_mid.filter(pc.equal(part_mid.column("conv_id"),
                                      "conv-000025"))
    assert reconv.num_rows
    recrawl = reconv.set_column(
        reconv.schema.get_field_index("text"), "text",
        pa.array(["zzzmarker fresh body"] * reconv.num_rows, pa.string()))
    extend_index(ray.data.from_arrow(recrawl), cfg_inc,
                 source_desc="ooo-recrawl", allow_out_of_order=True)
    qe = QueryEngine(cfg_inc.index_dir)
    hits = qe.search("zzzmarker", limit=50)
    assert {r["url"] for r in hits} == \
        {f"conv-000025#{t}" for t in
         reconv.column("turn_idx").to_pylist()}
    # the OLD version is gone: any query returning conv-000025 urls must
    # show the new text, and no query may return a duplicate url
    for q in ("word0000", "word0001 word0002", "zzzmarker"):
        rows = qe.search(q, limit=100)
        urls = [r["url"] for r in rows]
        assert len(urls) == len(set(urls)), q
        for r in rows:
            if r["conv_id"] == "conv-000025":
                assert r["text"] == "zzzmarker fresh body"


def test_empty_corpus(tmp_path):
    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
        "tool": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
    })
    cfg = EngineConfig(index_dir=str(tmp_path / "empty"), num_partitions=2)
    info = build_index(ray.data.from_arrow(empty), cfg, source_desc="empty")
    assert info["doc_total"] == 0
    assert info["stats"]["doc_total"] == 1   # bm25_stats.py:13 default
    qe = QueryEngine(cfg.index_dir, load_docs=False)
    assert qe.candidates("anything", limit=10, offset=0)[0] == []


def test_range_sliced_shard_load(tmp_path):
    """Doc-range serving layout: a shard engine loads only the posting-list
    blocks intersecting its [lo, hi) range — per-shard resident bytes are a
    fraction of the full load (< 60% at 2 shards), and per-doc scores are
    bit-identical to the full engine restricted to the range."""
    from search_engine_ray.sources.transcripts import generate_transcripts

    table = generate_transcripts(200, seed=3)
    cfg = EngineConfig(index_dir=str(tmp_path / "rng"), num_partitions=8,
                       block_size=16)
    build_index(ray.data.from_arrow(table).repartition(4), cfg,
                source_desc="rng")
    # eager=True: the resident-bytes evidence needs every record
    # materialized (the default engine is LAZY — cold start reads only the
    # vocabulary columns and would report ~0 resident bytes here)
    full = QueryEngine(cfg.index_dir, eager=True)
    n = full.doc_total
    total = full.loaded_postings_bytes()
    mid = n // 2
    for lo, hi in ((0, mid), (mid, n)):
        shard = QueryEngine(cfg.index_dir, doc_range=(lo, hi), eager=True)
        assert shard.loaded_postings_bytes() < 0.6 * total, (lo, hi)
        for q in ("word0001 word0002", "the and of", "word0005"):
            terms = sorted(set(q.split()))
            want = [r for r in full.score_terms(terms, candidate_limit=n,
                                                doc_range=(lo, hi))]
            got = shard.score_terms(terms, candidate_limit=n)
            assert got == want, (lo, hi, q)
            for doc_id, _, _ in got[:5]:
                assert shard.doc_meta(doc_id) == full.doc_meta(doc_id)


def test_sharded_engine_rank_identity(built_index):
    """N-shard fan-out + merge must be rank- and score-identical to the
    single engine for every query shape (incl. paging and all-stopword)."""
    from search_engine_ray.state.sharded import ShardedQueryEngine
    cfg, _ = built_index
    single = QueryEngine(cfg.index_dir)
    for shards in (2, 3):
        sharded = ShardedQueryEngine(cfg.index_dir, num_shards=shards)
        for q, limit, offset in (("word0001 word0002", 10, 0),
                                 ("word0003", 5, 3),
                                 ("the and of", 10, 0),
                                 ("", 10, 0)):
            a = single.search(q, limit=limit, offset=offset)
            b = sharded.search(q, limit=limit, offset=offset)
            assert [(r["url"], r["score"], r["matched_terms"]) for r in a] \
                == [(r["url"], r["score"], r["matched_terms"]) for r in b], \
                (shards, q)
        sharded.shutdown()


def test_unified_news_corpus_range_and_sensitivity(tiny_transcripts, tmp_path):
    """J3 second corpus: news docs occupy the tail doc-id range of a unified
    build; news-range search hits only news docs, and its results change
    when the news corpus changes."""
    import numpy as np
    import pyarrow as pa

    def news_table(suffix):
        n = 12 if suffix == "alpha" else 16
        return pa.table({
            "conv_id": pa.array([f"news-{i // 4:06d}" for i in range(n)]),
            "turn_idx": pa.array([i % 4 for i in range(n)], pa.int32()),
            "role": pa.array(["news"] * n),
            "text": pa.array([f"news digest word000{i % 3} {suffix}"
                              for i in range(n)]),
            "tool": pa.array(["feed"] * n),
            "ts": pa.array(np.arange(n, dtype=np.int64)).cast(
                pa.timestamp("us")),
        })

    results = []
    for tag, suffix in (("a", "alpha"), ("b", "beta")):
        cfg = EngineConfig(index_dir=str(tmp_path / f"uni-{tag}"),
                           num_partitions=4)
        web = ray.data.from_arrow(tiny_transcripts)
        n_web = tiny_transcripts.num_rows
        build_index(web.union(ray.data.from_arrow(news_table(suffix))), cfg,
                    source_desc=f"uni-{tag}")
        qe = QueryEngine(cfg.index_dir)
        rows = qe.score_terms(["word0001", suffix],
                              doc_range=(n_web, qe.doc_total))
        assert rows, "news range must match"
        for doc_id, _, _ in rows:
            assert doc_id >= n_web          # only news docs
            assert qe.doc_meta(doc_id)["conv_id"].startswith("news-")
        results.append(rows)
    assert results[0] != results[1]         # second corpus drives the rows


def test_crash_resume_from_part_sidecars(tiny_transcripts, tmp_path,
                                         built_index):
    """A build killed between the reduce tasks and the driver's consolidated
    manifest commit must resume from the per-part sidecar commits: simulate
    the crash by reconstructing sidecars from a finished build and deleting
    manifest.json, then verify load_manifest recovers every entry and a
    resumed build produces byte-identical segments."""
    import json as _json
    from search_engine_ray.stages.postings import (load_manifest,
                                                   save_manifest)
    cfg_ref, _ = built_index
    cfg = EngineConfig(index_dir=str(tmp_path / "crash"), num_partitions=8,
                       salt=1)
    ds = ray.data.from_arrow(tiny_transcripts).repartition(4)
    build_index(ds, cfg, source_desc="tiny")
    man = load_manifest(cfg.index_dir)
    # simulate: reduce tasks committed sidecars, driver died pre-commit
    side = os.path.join(cfg.index_dir, "manifest.parts")
    os.makedirs(side, exist_ok=True)
    for part, entry in man["entries"].items():
        with open(os.path.join(side, f"part-{int(part):05d}.json"),
                  "w") as f:
            _json.dump({"part": int(part), **entry}, f)
    os.remove(os.path.join(cfg.index_dir, "manifest.json"))
    recovered = load_manifest(cfg.index_dir)
    assert recovered["entries"] == man["entries"]
    # a resumed build over the same input skips the published parts and
    # converges to the same digest as the clean reference build
    save_manifest(cfg.index_dir, {**recovered, "doc_total":
                                  man.get("doc_total", 0)})
    build_index(ds, cfg, source_desc="tiny", resume=True)
    assert _segments_digest(cfg.index_dir) == \
        _segments_digest(cfg_ref.index_dir)
    assert not os.path.isdir(side)      # consolidated commit clears sidecars


def test_tombstone_deletes(tiny_transcripts, tmp_path):
    """Delete path: tombstoned conversations vanish from every query path;
    surviving docs keep their exact pre-delete scores (df/idf intentionally
    unchanged until the next truncate-rebuild, reference batch semantics);
    deletes merge and are idempotent."""
    from search_engine_ray.state.tombstones import (delete_conversations,
                                                    load_tombstones)
    cfg = EngineConfig(index_dir=str(tmp_path / "tomb"), num_partitions=4)
    build_index(ray.data.from_arrow(tiny_transcripts).repartition(4), cfg,
                source_desc="tomb")
    qe0 = QueryEngine(cfg.index_dir)
    before = qe0.search("word0001 word0002", limit=2000)
    victims = sorted({r["conv_id"] for r in before})[:2]
    n = delete_conversations(cfg.index_dir, victims)
    assert n > 0
    assert delete_conversations(cfg.index_dir, victims) == 0   # idempotent
    qe = QueryEngine(cfg.index_dir)
    after = qe.search("word0001 word0002", limit=2000)
    assert all(r["conv_id"] not in victims for r in after)
    kept = [r for r in before if r["conv_id"] not in victims]
    assert [(r["url"], r["score"]) for r in after] == \
        [(r["url"], r["score"]) for r in kept]
    # WAND/auto planner also honors tombstones (routes to exhaustive)
    a = qe.candidates_auto("word0001", limit=50, offset=0)
    w = qe.candidates_wand("word0001", limit=50, offset=0)
    lo, hi = load_tombstones(cfg.index_dir)
    from search_engine_ray.state.tombstones import mask_tombstoned
    import numpy as np
    for res in (a, w):
        ids = np.array([d for d, _, _ in res[0]], dtype=np.int64)
        assert mask_tombstoned(ids, lo, hi).all()


def test_encoding_error_fallback_single_engine(built_index, monkeypatch):
    """Reference parity: a stage-2 doc-meta decode failure degrades the query
    to token-feature-only scoring with empty text fields
    (/root/reference/app/api/search_service.py:321-338)."""
    import math
    from search_engine_ray.functions.text import fallback_score
    cfg, _ = built_index
    eng = QueryEngine(cfg.index_dir)
    q = "word0001 word0002"
    cands, ctx = eng.candidates(q, limit=10, offset=0)
    assert cands

    def boom(doc_id):
        raise UnicodeDecodeError("utf-8", b"\xff", 0, 1, "synthetic")
    monkeypatch.setattr(eng, "doc_meta", boom)

    page = eng.search(q, limit=10, offset=0)
    assert len(page) == min(10, len(cands))
    for row in page:
        assert row["conv_id"] == "" and row["text"] == "" and row["url"] == ""
    want = sorted(
        (fallback_score(token_score=s, matched_terms=m,
                        total_terms=ctx["total_terms"])
         for _, s, m in cands), reverse=True)[:10]
    assert [r["score"] for r in page] == want
    # formula spot-check
    _, s0, m0 = cands[0]
    expect = math.log1p(max(s0, 0.0)) * 12.0 + \
        (m0 / ctx["total_terms"]) * 25.0 + \
        (40.0 if m0 == ctx["total_terms"] else 0.0)
    assert fallback_score(token_score=s0, matched_terms=m0,
                          total_terms=ctx["total_terms"]) == expect


def test_encoding_error_fallback_sharded_driver(built_index):
    """If any shard reports a decode failure, the WHOLE sharded query
    degrades to the fallback page over merged stage-1 triples."""
    import ray
    from search_engine_ray.state.sharded import ShardedQueryEngine

    cfg, _ = built_index
    single = QueryEngine(cfg.index_dir)
    q = "word0001 word0002"
    cands, ctx = single.candidates(q, limit=10, offset=0)
    sharded = ShardedQueryEngine(cfg.index_dir, num_shards=2)

    @ray.remote
    class FakeShard:
        def __init__(self, triples):
            self._t = triples

        def score_range(self, terms, cl, ctx=None):
            return False, self._t[:cl]

    # replace one real shard with a degraded one carrying that shard's
    # stage-1 triples; the other shard stays healthy
    n = single.doc_total
    lo_triples = [c for c in cands if c[0] < n // 2]
    sharded._actors[0] = FakeShard.remote(lo_triples)
    page = sharded.search(q, limit=10, offset=0)
    assert page and all(r["conv_id"] == "" and r["url"] == "" for r in page)
    # scores are the fallback formula over the merged candidate set
    from search_engine_ray.functions.text import fallback_score
    want = sorted(
        (fallback_score(token_score=s, matched_terms=m,
                        total_terms=ctx["total_terms"])
         for _, s, m in cands), reverse=True)[:10]
    assert [r["score"] for r in page] == want
    sharded.shutdown()


def test_compact_index_folds_generations_and_tombstones(tmp_path):
    """compact_index == clean rebuild of the LIVE corpus: after out-of-order
    generations + a recrawl, compaction rebuilds in place to bit-identical
    segments, resets the generation list, and drops tombstones/df of the
    replaced docs (the reference's truncate-rebuild, batch/runner.py,
    applied to one index)."""
    import pyarrow.compute as pc

    from search_engine_ray.pipelines.build import compact_index, extend_index
    from search_engine_ray.sources.transcripts import generate_transcripts

    full = generate_transcripts(60, seed=13)
    mask_mid = pc.and_(
        pc.greater_equal(full.column("conv_id"), "conv-000020"),
        pc.less(full.column("conv_id"), "conv-000030"))
    part_mid = full.filter(mask_mid)
    part_rest = full.filter(pc.invert(mask_mid))

    cfg = EngineConfig(index_dir=str(tmp_path / "cmp"), num_partitions=8)
    build_index(ray.data.from_arrow(part_rest).repartition(3), cfg,
                source_desc="cmp-a")
    extend_index(ray.data.from_arrow(part_mid).repartition(2), cfg,
                 source_desc="cmp-b", allow_out_of_order=True)
    reconv = part_mid.filter(pc.equal(part_mid.column("conv_id"),
                                      "conv-000025"))
    recrawl = reconv.set_column(
        reconv.schema.get_field_index("text"), "text",
        pa.array(["zzzmarker fresh body"] * reconv.num_rows, pa.string()))
    extend_index(ray.data.from_arrow(recrawl), cfg,
                 source_desc="cmp-recrawl", allow_out_of_order=True)

    info = compact_index(cfg)
    assert info["index_dir"] == cfg.index_dir
    assert not os.path.exists(cfg.index_dir + ".compact")
    assert not os.path.exists(cfg.index_dir + ".pre-compact")

    # the live corpus: full with conv-000025's text replaced
    live = full.set_column(
        full.schema.get_field_index("text"), "text",
        pc.if_else(pc.equal(full.column("conv_id"), "conv-000025"),
                   pa.scalar("zzzmarker fresh body"),
                   full.column("text")))
    cfg_clean = EngineConfig(index_dir=str(tmp_path / "cmp_clean"),
                             num_partitions=8)
    build_index(ray.data.from_arrow(live).repartition(4), cfg_clean,
                source_desc="cmp-clean")

    assert _segments_digest(cfg.index_dir) == \
        _segments_digest(cfg_clean.index_dir)
    from search_engine_ray.stages.postings import load_manifest
    man = load_manifest(cfg.index_dir)
    assert "generations" not in man or len(man["generations"]) <= 1
    from search_engine_ray.state.tombstones import load_tombstones
    lo, _hi = load_tombstones(cfg.index_dir)
    assert len(lo) == 0
    qc = QueryEngine(cfg.index_dir)
    qf = QueryEngine(cfg_clean.index_dir)
    assert qc.doc_total == qf.doc_total == live.num_rows
    for q, limit, offset in QUERY_SET[:8]:
        assert _rows_key(qc.search(q, limit=limit, offset=offset)) == \
            _rows_key(qf.search(q, limit=limit, offset=offset)), q


def test_join_mode_build_equals_broadcast_build(tmp_path):
    """build_index beyond max_broadcast_convs cuts over to JOIN MODE (conv
    offsets as a materialized Dataset + hash-join doc-id attach in BOTH the
    doc-store and the tokenize pipelines) — segments bit-identical and
    search results equal to the broadcast-mode build."""
    from search_engine_ray.sources.transcripts import generate_transcripts

    table = generate_transcripts(60, seed=17)
    cfg_b = EngineConfig(index_dir=str(tmp_path / "bcast"), num_partitions=8)
    build_index(ray.data.from_arrow(table).repartition(4), cfg_b,
                source_desc="jm")
    cfg_j = EngineConfig(index_dir=str(tmp_path / "join"), num_partitions=8,
                         max_broadcast_convs=3)
    info = build_index(ray.data.from_arrow(table).repartition(4), cfg_j,
                       source_desc="jm")
    assert info["doc_total"] == table.num_rows
    assert info["manifest"]["max_conv"] == \
        max(table.column("conv_id").to_pylist())
    assert _segments_digest(cfg_j.index_dir) == \
        _segments_digest(cfg_b.index_dir)
    qb = QueryEngine(cfg_b.index_dir)
    qj = QueryEngine(cfg_j.index_dir)
    assert qb.doc_total == qj.doc_total and qb.avgdl == qj.avgdl
    for q, limit, offset in QUERY_SET[:8]:
        assert _rows_key(qj.search(q, limit=limit, offset=offset)) == \
            _rows_key(qb.search(q, limit=limit, offset=offset)), q


def test_range_split_equals_plain(tiny_transcripts, tmp_path, built_index):
    """range_splits=R build: postings/dict/search bit-identical to plain
    (the skew control for Zipf head terms — each hot term's encode work is
    spread over R reducers; the engine byte-concats chunks at load)."""
    import numpy as np
    from search_engine_ray.functions.varbyte import decode_postings_blocked

    cfg_ref, _ = built_index
    e1 = QueryEngine(cfg_ref.index_dir)
    cfg = EngineConfig(index_dir=str(tmp_path / "rsplit"), num_partitions=8,
                       range_splits=4)
    ds = ray.data.from_arrow(tiny_transcripts).repartition(4)
    build_index(ds, cfg, source_desc="tiny")
    e4 = QueryEngine(cfg.index_dir)
    assert set(e1._dict) == set(e4._dict)
    for t in e1._dict:
        a, b = e1._dict[t], e4._dict[t]
        assert (a[0], a[1], a[2]) == (b[0], b[1], b[2])
        da, ta = decode_postings_blocked(a[3], a[4], a[5])
        db, tb = decode_postings_blocked(b[3], b[4], b[5])
        assert np.array_equal(da, db) and np.array_equal(ta, tb)
        assert b[5]["doc_off"][-1] == len(b[3])     # merged offsets coherent
    for q in ("word0001 word0002", "word0003 word0001 word0002", ""):
        assert [(r["url"], r["score"]) for r in e1.search(q, limit=10)] == \
               [(r["url"], r["score"]) for r in e4.search(q, limit=10)]


def test_range_split_build_sharded_serving_identity(tiny_transcripts,
                                                    tmp_path):
    """The combination the individual tests missed: a range_splits>1 build
    served through doc-range shards.  A shard skips a term's out-of-range
    rb-chunks, but df/cf/idf must stay GLOBAL (sum over ALL chunks) or
    per-shard idf inflates and merged scores diverge from the full
    engine."""
    from search_engine_ray.state.sharded import ShardedQueryEngine

    cfg = EngineConfig(index_dir=str(tmp_path / "rss"), num_partitions=8,
                       range_splits=4)
    build_index(ray.data.from_arrow(tiny_transcripts).repartition(4), cfg,
                source_desc="tiny")
    single = QueryEngine(cfg.index_dir)

    # per-shard df equals the global df for every term the shard holds
    lo, hi = 0, single.doc_total // 2
    shard = QueryEngine(cfg.index_dir, doc_range=(lo, hi))
    for t, entry in shard._dict.items():
        assert entry[0] == single._dict[t][0], t       # df global
        assert entry[2] == single._dict[t][2], t       # idf global

    for shards in (2, 3):
        sharded = ShardedQueryEngine(cfg.index_dir, num_shards=shards)
        for q, limit, offset in (("word0001 word0002", 10, 0),
                                 ("word0003", 5, 3),
                                 ("the and of", 10, 0)):
            a = single.search(q, limit=limit, offset=offset)
            b = sharded.search(q, limit=limit, offset=offset)
            assert [(r["url"], r["score"], r["matched_terms"]) for r in a] \
                == [(r["url"], r["score"], r["matched_terms"]) for r in b], \
                (shards, q)
        sharded.shutdown()


def test_range_split_extend_equals_full(tmp_path):
    """Incremental extend on a range-split base (frozen bucket mapping)
    must equal a clean range-split build of the union — search identity."""
    from search_engine_ray.pipelines.build import extend_index
    from search_engine_ray.sources.transcripts import generate_transcripts

    full = generate_transcripts(60, seed=23)
    import pyarrow.compute as pc
    convs = sorted(set(full.column("conv_id").to_pylist()))
    first = full.filter(pc.is_in(full.column("conv_id"),
                                 pa.array(convs[:40])))
    second = full.filter(pc.is_in(full.column("conv_id"),
                                  pa.array(convs[40:])))

    cfg_inc = EngineConfig(index_dir=str(tmp_path / "inc"),
                           num_partitions=4, range_splits=3)
    build_index(ray.data.from_arrow(first).repartition(3), cfg_inc,
                source_desc="base")
    extend_index(ray.data.from_arrow(second).repartition(2), cfg_inc,
                 source_desc="more")

    cfg_full = EngineConfig(index_dir=str(tmp_path / "fullr"),
                            num_partitions=4, range_splits=3)
    build_index(ray.data.from_arrow(full).repartition(4), cfg_full,
                source_desc="union")

    ei, ef = QueryEngine(cfg_inc.index_dir), QueryEngine(cfg_full.index_dir)
    assert set(ei._dict) == set(ef._dict)
    for t in ei._dict:
        assert ei._dict[t][0] == ef._dict[t][0]       # df
        assert ei._dict[t][1] == ef._dict[t][1]       # cf
    for q in ("word0001 word0002", "word0005", "word0002 word0003"):
        assert [(r["url"], r["score"]) for r in ei.search(q, limit=10)] == \
               [(r["url"], r["score"]) for r in ef.search(q, limit=10)]


def test_extend_reducer_retry_is_idempotent(tmp_path, monkeypatch):
    """Ray tasks run at-least-once: a reduce task that published its
    extended segment and then re-executes must NOT merge the same new
    postings twice.  Simulated by running every extend reducer TWICE (the
    second call re-reads the file the first just published — the exact
    retry shape); the result must still equal a clean unified build."""
    import numpy as np
    import pyarrow.compute as pc

    import search_engine_ray.stages.postings as P
    from search_engine_ray.pipelines.build import extend_index
    from search_engine_ray.sources.transcripts import generate_transcripts

    full = generate_transcripts(60, seed=19)
    mask_a = pc.less(full.column("conv_id"), "conv-000040")
    part_a, part_b = full.filter(mask_a), full.filter(pc.invert(mask_a))
    assert part_a.num_rows and part_b.num_rows

    orig = P._write_segment_group

    def retry_twice(group, **kw):
        orig(group, **kw)          # first attempt publishes the segment
        return orig(group, **kw)   # retry re-reads the published file

    monkeypatch.setattr(P, "_write_segment_group", retry_twice)

    cfg_inc = EngineConfig(index_dir=str(tmp_path / "inc"), num_partitions=6)
    build_index(ray.data.from_arrow(part_a).repartition(3), cfg_inc,
                source_desc="retry-a")
    extend_index(ray.data.from_arrow(part_b).repartition(2), cfg_inc,
                 source_desc="retry-b")

    monkeypatch.setattr(P, "_write_segment_group", orig)
    cfg_full = EngineConfig(index_dir=str(tmp_path / "full"),
                            num_partitions=6)
    build_index(ray.data.from_arrow(full).repartition(4), cfg_full,
                source_desc="retry-full")

    qi, qf = QueryEngine(cfg_inc.index_dir), QueryEngine(cfg_full.index_dir)
    assert qi.doc_total == qf.doc_total == full.num_rows
    assert qi.avgdl == qf.avgdl
    assert set(qi._dict) == set(qf._dict)
    for term in qf._dict:
        a, b = qi.postings(term), qf.postings(term)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1]), \
            term
        assert qi.term_stats(term) == qf.term_stats(term)
    assert np.array_equal(qi._doc_len, qf._doc_len)
    for q, limit, offset in QUERY_SET[:6]:
        assert _rows_key(qi.search(q, limit=limit, offset=offset)) == \
            _rows_key(qf.search(q, limit=limit, offset=offset)), q


def test_facet_counts_single_vs_sharded_and_naive(built_index):
    """facet_counts over the full match set: single engine == naive recount
    from doc_meta == sharded per-range merge, for several query shapes."""
    from search_engine_ray.state.sharded import ShardedQueryEngine
    cfg, _ = built_index
    single = QueryEngine(cfg.index_dir)
    sharded = ShardedQueryEngine(cfg.index_dir, num_shards=3)
    try:
        for q in ("word0001 word0002", "word0003", "the and of", ""):
            facets, count = single.facet_counts(q)
            assert set(facets) == {"role", "tool"}
            # naive recount from the match set
            from search_engine_ray.functions.text import search_context
            ctx = search_context(q, 1, 0)
            if ctx is None:
                assert count == 0 and facets == {"role": {}, "tool": {}}
            else:
                rows = single.score_terms(sorted(set(ctx["query_terms"])))
                assert count == len(rows)
                exp_role: dict = {}
                exp_tool: dict = {}
                for doc_id, _, _ in rows:
                    m = single.doc_meta(doc_id)
                    exp_role[m["role"]] = exp_role.get(m["role"], 0) + 1
                    exp_tool[m["tool"]] = exp_tool.get(m["tool"], 0) + 1
                assert facets["role"] == exp_role
                assert facets["tool"] == exp_tool
            sf, sc = sharded.facet_counts(q)
            assert (sf, sc) == (facets, count), q
    finally:
        sharded.shutdown()
