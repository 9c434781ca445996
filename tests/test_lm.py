"""Bigram-LM perplexity stage (stages/lm.py): model counts vs a hand
oracle, scoring exactness, and survivor-filter semantics."""

import math

import numpy as np
import pyarrow as pa

import ray.data

from search_engine_ray.stages.lm import (
    LM_ALPHA, _hash_strs, bigram_model, lm_perplexity, lm_survivors)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "dogs bark"),
    (3, "x"),                 # single sub-2-char token -> no words at all
    (4, "one"),               # one token -> no bigrams
    (5, ""),
]


def _docs_ds():
    t = pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([x for _, x in DOCS], pa.string()),
    })
    return ray.data.from_arrow(t).repartition(3)


def _hand_model():
    """Reference add-alpha bigram model computed in plain Python.
    V = context vocabulary (distinct w1), matching stages/lm.py."""
    import re
    word_re = re.compile(r"[a-z]{2,32}")
    cb, cu = {}, {}
    for _, text in DOCS:
        toks = word_re.findall(text.lower())
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
            cu[a] = cu.get(a, 0) + 1
    return cb, cu, len(cu)


def test_bigram_model_counts_match_hand_oracle():
    model, contexts, v = bigram_model(_docs_ds())
    cb, cu, v_ref = _hand_model()
    exp_cb = {int(_hash_strs([a + "\x1f" + b])[0]): n
              for (a, b), n in cb.items()}
    exp_cu = {int(_hash_strs([a])[0]): n for a, n in cu.items()}
    got_cb = {r["gh"]: r["cb"] for r in model.take_all()}
    got_cu = {r["ch"]: r["cu"] for r in contexts.take_all()}
    assert got_cb == exp_cb
    assert got_cu == exp_cu
    assert v == v_ref
    # model's ch column is consistent with the context key
    for r in model.take_all():
        assert r["ch"] in exp_cu


def test_perplexity_matches_hand_computation():
    cb, cu, v = _hand_model()
    rows = {r["doc_id"]: r for r in lm_perplexity(_docs_ds()).take_all()}
    # docs without bigrams are absent ("dogs bark" has exactly one)
    assert set(rows) == {0, 1, 2}
    import re
    word_re = re.compile(r"[a-z]{2,32}")
    for did, text in DOCS[:3]:
        toks = word_re.findall(text.lower())
        grams = list(zip(toks, toks[1:]))
        u = sum(
            int(math.floor(math.log(cb[g] + LM_ALPHA) * 1e6 + 0.5))
            - int(math.floor(math.log(cu[g[0]] + LM_ALPHA * v) * 1e6 + 0.5))
            for g in grams)
        r = rows[did]
        assert r["bigrams"] == len(grams)
        assert r["logprob_u"] == u
        au = int(np.floor(u / len(grams) + 0.5))
        assert r["avg_logprob"] == au / 1e6
        assert r["ppl"] == round(math.exp(-au / 1e6), 6)


def test_survivors_is_threshold_filter():
    scored = {r["doc_id"]: r["ppl"]
              for r in lm_perplexity(_docs_ds()).take_all()}
    cut = sorted(scored.values())[0]           # keep exactly the best doc
    kept = {r["doc_id"]: r["ppl"]
            for r in lm_survivors(_docs_ds(), max_ppl=cut).take_all()}
    assert kept == {d: p for d, p in scored.items() if p <= cut}
    assert len(kept) >= 1
