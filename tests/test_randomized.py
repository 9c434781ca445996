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
