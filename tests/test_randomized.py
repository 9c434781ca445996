"""Randomized engine-vs-oracle property tests (SURVEY.md §5.4): seeds drive
small random corpora; the full distributed build must match the naive oracle
on every query, at any parallelism."""

import pyarrow as pa
import pytest

import ray.data

from oracle.oracle import OracleIndex
from search_engine_ray.config import EngineConfig
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.sources.transcripts import generate_transcripts
from search_engine_ray.state.query_engine import QueryEngine


@pytest.mark.parametrize("seed,parts,repartition", [(7, 4, 2), (13, 8, 5),
                                                    (99, 3, 7)])
def test_random_corpus_rank_identity(tmp_path, seed, parts, repartition):
    table = generate_transcripts(30, seed=seed)
    cfg = EngineConfig(index_dir=str(tmp_path / f"r{seed}"),
                       num_partitions=parts)
    build_index(ray.data.from_arrow(table).repartition(repartition), cfg,
                source_desc=f"rand{seed}")
    qe = QueryEngine(cfg.index_dir)
    oi = OracleIndex(table)

    # derive queries from the corpus itself so they hit real terms
    words = []
    for t in table.column("text").to_pylist()[:20]:
        words.extend((t or "").split()[:2])
    queries = [" ".join(words[i:i + 2]) for i in range(0, min(len(words), 20), 2)]
    queries += ["the and", "", "nonexistentterm"]
    for q in queries:
        a = qe.search(q, limit=15)
        b = oi.search(q, limit=15)
        assert [(r["url"], r["score"], r["token_score"], r["matched_terms"])
                for r in a] == \
               [(r["url"], r["score"], r["token_score"], r["matched_terms"])
                for r in b], (seed, q)
        # WAND agrees with exhaustive on the same corpus
        c1 = qe.candidates(q, limit=15, offset=0)
        c2 = qe.candidates_wand(q, limit=15, offset=0)
        assert (c1 is None) == (c2 is None)
        if c1 is not None:
            assert c1[0] == c2[0], (seed, q)


@pytest.mark.parametrize("seed,nparts", [(3, 4), (21, 16)])
def test_random_corpus_lm_perplexity_vs_reference(seed, nparts):
    """lm_perplexity over random small-vocab docs == a pure-Python
    reimplementation of the integer-microunit formula, exactly."""
    import math
    import random
    import re

    import numpy as np

    from search_engine_ray.stages.lm import LM_ALPHA, lm_perplexity

    rng = random.Random(seed)
    vocab = [f"w{i:02d}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randrange(0, 18)))
             for _ in range(60)]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })

    word_re = re.compile(r"[a-z]{2,32}")
    cb, cu = {}, {}
    for t in texts:
        toks = word_re.findall(t.lower())
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
            cu[a] = cu.get(a, 0) + 1
    v = len(cu)          # context vocabulary, matching stages/lm.py

    def r6u(x):
        return int(math.floor(x * 1e6 + 0.5))

    want = {}
    for did, t in enumerate(texts):
        toks = word_re.findall(t.lower())
        grams = list(zip(toks, toks[1:]))
        if not grams:
            continue
        u = sum(r6u(math.log(cb[g] + LM_ALPHA))
                - r6u(math.log(cu[g[0]] + LM_ALPHA * v)) for g in grams)
        au = int(np.floor(u / len(grams) + 0.5))
        want[did] = (len(grams), u, au / 1e6, round(math.exp(-au / 1e6), 6))

    got = {r["doc_id"]: (r["bigrams"], r["logprob_u"], r["avg_logprob"],
                         r["ppl"])
           for r in lm_perplexity(
               ray.data.from_arrow(docs).repartition(5),
               nparts=nparts).take_all()}
    assert got == want


@pytest.mark.parametrize("seed", [5, 17])
def test_random_corpus_bpe_vs_reference(seed):
    """Distributed BPE merge rules over a random corpus == the in-test
    reference implementation (tie-breaks included)."""
    import random

    from tests.test_bpe import _ref_bpe
    from search_engine_ray.stages.bpe import bpe_train

    rng = random.Random(seed)
    alpha = "abcdef"
    texts = [" ".join("".join(rng.choice(alpha)
                              for _ in range(rng.randrange(2, 6)))
                      for _ in range(rng.randrange(3, 15)))
             for _ in range(40)]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = bpe_train(ray.data.from_arrow(docs).repartition(4), num_merges=6)
    rows = list(zip(got.column("rank").to_pylist(),
                    got.column("lft").to_pylist(),
                    got.column("rgt").to_pylist(),
                    got.column("freq").to_pylist()))
    assert rows == _ref_bpe(texts, 6)


@pytest.mark.parametrize("seed,nparts", [(5, 3), (42, 7)])
def test_random_corpus_dsir_vs_reference(seed, nparts):
    """dsir_logweights over random small-vocab docs == a pure-Python
    reimplementation of the hashed-bucket log-ratio formula, exactly."""
    import random
    import re

    import numpy as np

    from search_engine_ray.functions.hashing import md5_hash64
    from search_engine_ray.stages.dsir import dsir_logweights

    rng = random.Random(seed)
    vocab = [f"w{i:02d}" for i in range(30)]
    docs = [" ".join(rng.choices(vocab, k=rng.randint(0, 12)))
            for _ in range(60)]
    target_ids = [i for i in range(60) if i % 5 == 0]
    B = 128

    def ds(ids):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([docs[i] for i in ids], pa.string()),
        })).repartition(nparts)

    got = {r["doc_id"]: r["logw_micro"]
           for r in dsir_logweights(ds(list(range(60))), ds(target_ids),
                                    buckets=B).take_all()}

    def buckets(t):
        toks = re.findall(r"[a-z]{2,32}", t.lower())
        feats = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
        return [md5_hash64(g) % B for g in feats]

    tc = np.zeros(B)
    for i in target_ids:
        for b in buckets(docs[i]):
            tc[b] += 1
    rc = np.zeros(B)
    for i in range(60):
        for b in buckets(docs[i]):
            rc[b] += 1
    lr = np.floor((np.log((tc + 1) / (tc.sum() + B))
                   - np.log((rc + 1) / (rc.sum() + B))) * 1e6
                  + 0.5).astype(np.int64)
    expect = {}
    for i in range(60):
        bs = buckets(docs[i])
        if bs:
            expect[i] = int(sum(lr[b] for b in bs))
    assert got == expect


@pytest.mark.parametrize("seed", [11, 77])
def test_random_corpus_bloom_superset_of_exact(seed):
    """bloom_decontaminate is always a superset of the exact overlap with
    per-doc hit counts >= exact counts, at any bitset size."""
    import random

    from search_engine_ray.stages.decontam import (benchmark_ngram_overlap,
                                                   bloom_decontaminate)

    rng = random.Random(seed)
    vocab = [f"t{i:02d}" for i in range(40)]
    mk = lambda k: " ".join(rng.choices(vocab, k=k))
    corpus_rows = [(i, mk(rng.randint(2, 14))) for i in range(50)]
    bench_rows = [(100 + i, mk(rng.randint(4, 10))) for i in range(6)]
    # plant guaranteed overlap: doc 0 contains bench doc 100's text
    corpus_rows[0] = (0, bench_rows[0][1] + " " + corpus_rows[0][1])

    def ds(rows):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        })).repartition(4)

    n = 4
    exact = {r["doc_id"]: r["overlap_ngrams"] for r in
             benchmark_ngram_overlap(ds(corpus_rows), ds(bench_rows),
                                     n=n).take_all()}
    assert 0 in exact
    for m_bits in (64, 4096):
        bloom = {r["doc_id"]: r["bloom_hits"] for r in
                 bloom_decontaminate(ds(corpus_rows), ds(bench_rows), n=n,
                                     m_bits=m_bits, k_hashes=3).take_all()}
        for did, k in exact.items():
            assert bloom.get(did, 0) >= k, (m_bits, did)


@pytest.mark.parametrize("seed,n_salts", [(9, 4), (31, 3)])
def test_lm_perplexity_salted_equals_unsalted(seed, n_salts):
    """Hot-context salting changes only the exchange layout: per-doc
    perplexities are bit-identical at any n_salts."""
    import random

    from search_engine_ray.stages.lm import lm_perplexity

    rng = random.Random(seed)
    # Zipf-ish: 'hot' starts most bigrams, exercising the salted split
    vocab = ["hot"] * 6 + [f"w{i:02d}" for i in range(20)]
    docs = [" ".join(rng.choices(vocab, k=rng.randint(2, 16)))
            for _ in range(50)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(50), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })).repartition(5)

    def rows(n_s):
        got = lm_perplexity(ds, nparts=4, n_salts=n_s).take_all()
        return sorted((r["doc_id"], r["bigrams"], r["logprob_u"], r["ppl"])
                      for r in got)

    base = rows(1)
    assert base                      # non-trivial corpus
    assert rows(n_salts) == base


@pytest.mark.parametrize("seed", [5, 17])
def test_random_mojibake_roundtrip(seed):
    """Random clean strings over the repairable alphabet: encode to
    cp1252 mojibake, repair, and require the identity — with exact
    replacement counts."""
    import random

    from search_engine_ray.stages.textstats import _MOJI_CHARS, fix_encoding

    rng = random.Random(seed)
    alphabet = list("abc def. ") + list(_MOJI_CHARS)
    clean, broken, counts = [], [], []
    for _ in range(60):
        s = "".join(rng.choices(alphabet, k=rng.randint(0, 40)))
        clean.append(s)
        broken.append(s.encode("utf-8").decode("cp1252"))
        counts.append(sum(s.count(c) for c in _MOJI_CHARS))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(clean)), pa.int64()),
        "text": pa.array(broken, pa.string()),
    })).repartition(4)
    got = {r["doc_id"]: r for r in fix_encoding(ds).take_all()}
    for i, s in enumerate(clean):
        assert got[i]["fixed_text"] == s, i
        assert got[i]["replacements"] == counts[i], i


@pytest.mark.parametrize("seed", [11, 23])
def test_random_c4_clean_vs_reference(seed):
    """c4_clean over random multi-line pages equals a plain-Python
    re-implementation of the published rules."""
    import random
    import re

    from search_engine_ray.stages.textstats import c4_clean

    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "javascript", "lorem",
             "ipsum", "brace{x", "the", "of"]
    ends = [".", "!", "?", '"', "", " "]
    docs = []
    for _ in range(80):
        lines = []
        for _ in range(rng.randint(0, 8)):
            lines.append(" ".join(rng.choices(words, k=rng.randint(0, 9)))
                         + rng.choice(ends))
        docs.append("\n".join(lines))

    def ref(t):
        lines = t.split("\n")
        kept = [l for l in lines
                if re.search(r'[.!?"]$', l)
                and len(re.findall(r"\S+", l)) >= 5
                and "javascript" not in l.lower()]
        clean = "\n".join(kept)
        sentences = len(re.findall(r"[.!?]", clean))
        keep = int("lorem ipsum" not in t.lower() and "{" not in t
                   and sentences >= 3)
        return (len(lines), len(kept), sentences, keep, clean)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })).repartition(4)
    got = {r["doc_id"]: r for r in c4_clean(ds).take_all()}
    for i, t in enumerate(docs):
        r = got[i]
        assert (r["total_lines"], r["kept_lines"], r["sentences"],
                r["keep"], r["clean_text"]) == ref(t), i
