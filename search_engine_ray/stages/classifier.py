"""Naive-Bayes document quality classifier (CCNet-style, distributed).

CCNet / fastText-style corpus curation scores every page with a linear
classifier trained on a "high-quality vs rest" split and keeps the top mass
(Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data").  This module implements the same shape as two Ray
Data passes with a multinomial Naive Bayes model — the classic linear
bag-of-words scorer whose training is EXACTLY a pair of keyed count
aggregations, so it distributes with one vocab-bounded exchange and is
bit-mirrorable in SQL:

  pass 1 (train): map_batches tokenizes ([a-z]{2,32}, the corpus word
    convention) and pre-aggregates per-batch (word, n1, n0) class counts —
    the groupby(word) exchange ships one row per distinct word per batch,
    never per token.  A sentinel word='' row per batch carries the
    (docs_in_class1, docs_in_class0) partials for the prior on the same
    exchange.  The aggregated model is vocab-bounded (ceiling ~10^7 rows at
    web scale — broadcastable), collected once and shipped via the task
    closure.
  pass 2 (score): a fresh streaming map over the docs computes
    score(d) = prior + Σ_w count_d(w)·weight(w) per batch with a dict
    lookup — zero exchange.  Re-tokenizing here is deliberate: shipping
    per-(doc, word) rows through a groupby(doc_id) would move ~token-count
    rows through the object store, strictly worse than a second CPU pass.

Class labels are derived in-corpus by a deterministic rule (doc contains
the seed word) so the driver's DuckDB oracle can re-derive them; swap
``label_fn``/``seed_word`` for a real reference-corpus split in production.

Float discipline (shared with stages/dsir.py and stages/lm.py): per-word
log-likelihood-ratio weights and the class prior are pinned to integer
MICROUNITS (floor(x·1e6 + .5)) before any per-doc summation, so per-doc
scores are order-free int64 sums and the SQL mirror is hash-exact.

Smoothing: add-one over the joint vocabulary V (distinct corpus words), the
textbook multinomial NB estimator:
  weight(w) = ln((n1_w + 1)/(N1 + V)) − ln((n0_w + 1)/(N0 + V))
  prior     = ln(D1/D) − ln(D0/D)
Degenerate corpora where one class is empty (D1·D0 = 0) raise ValueError —
a ln(0) prior means the label rule, not the classifier, is broken.

Reference counterpart: none — a north-rule training-data addition (quality
family: gopher_quality, lm_perplexity neighbors).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.rounding import ln_microunits
from ..functions.text import WORD_RE

DEFAULT_SEED_WORD = "spark"


def _count_rows_fn(seed_word: str):
    """Batch fn: (doc_id, text) -> per-batch (word, n1, n0) count partials
    plus one sentinel word='' row carrying (docs_label1, docs_label0)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts: dict[str, list[int]] = {}
        d1 = d0 = 0
        findall = WORD_RE.findall
        for text in texts:
            words = findall((text or "").lower())
            label = 1 if seed_word in words else 0
            if label:
                d1 += 1
            else:
                d0 += 1
            for w in words:
                c = counts.get(w)
                if c is None:
                    c = counts[w] = [0, 0]
                c[label] += 1
        keys = list(counts.keys()) + [""]
        n1 = [counts[k][1] for k in counts] + [d1]
        n0 = [counts[k][0] for k in counts] + [d0]
        return pa.table({
            "word": pa.array(keys, pa.string()),
            "n1": pa.array(n1, pa.int64()),
            "n0": pa.array(n0, pa.int64()),
        })

    return fn


def train_nb_model(docs: "ray.data.Dataset", *,
                   seed_word: str = DEFAULT_SEED_WORD,
                   batch_size: int = 1024) -> dict:
    """One counting pass -> {'weights': {word: micro_llr}, 'prior': micro,
    'd1': int, 'd0': int, 'vocab': int}."""
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        _count_rows_fn(seed_word), batch_format="pyarrow",
        batch_size=batch_size)
    agg = rows.groupby("word").aggregate(
        Sum("n1", alias_name="n1"), Sum("n0", alias_name="n0")).take_all()
    d1 = d0 = 0
    words: list[str] = []
    c1: list[int] = []
    c0: list[int] = []
    for r in agg:
        if r["word"] == "":
            d1, d0 = int(r["n1"]), int(r["n0"])
        else:
            words.append(r["word"])
            c1.append(int(r["n1"]))
            c0.append(int(r["n0"]))
    if d1 == 0 or d0 == 0:
        raise ValueError(
            f"degenerate class split d1={d1} d0={d0} for seed "
            f"{seed_word!r} — label rule selects an empty class")
    vocab = len(words)
    a1 = np.asarray(c1, dtype=np.float64)
    a0 = np.asarray(c0, dtype=np.float64)
    n1_tot = float(a1.sum())
    n0_tot = float(a0.sum())
    # same expression SHAPE as the SQL mirror: double division, ln, subtract,
    # one microunit floor of the difference
    llr = np.log((a1 + 1.0) / (n1_tot + vocab)) \
        - np.log((a0 + 1.0) / (n0_tot + vocab))
    wm = ln_microunits(llr)
    prior = int(ln_microunits(np.float64(
        math.log(d1 / (d1 + d0)) - math.log(d0 / (d1 + d0)))))
    return {"weights": dict(zip(words, (int(x) for x in wm))),
            "prior": prior, "d1": d1, "d0": d0, "vocab": vocab}


def nb_quality_scores(docs: "ray.data.Dataset", *,
                      seed_word: str = DEFAULT_SEED_WORD,
                      model: dict | None = None,
                      batch_size: int = 1024) -> "ray.data.Dataset":
    """(doc_id, label, score_micro) for every doc — label is the training
    rule's class, score_micro the NB log-odds in ln-microunits.  Streaming
    scoring pass; the model rides the task closure (vocab-bounded)."""
    if model is None:
        model = train_nb_model(docs, seed_word=seed_word,
                               batch_size=batch_size)
    weights = model["weights"]
    prior = model["prior"]

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id")
        labels: list[int] = []
        scores: list[int] = []
        findall = WORD_RE.findall
        get = weights.get
        for text in texts:
            words = findall((text or "").lower())
            labels.append(1 if seed_word in words else 0)
            s = prior
            for w in words:
                s += get(w, 0)
            scores.append(s)
        return pa.table({
            "doc_id": doc_ids,
            "label": pa.array(labels, pa.int64()),
            "score_micro": pa.array(scores, pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", batch_size=batch_size)
