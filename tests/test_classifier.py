"""NB quality classifier (stages/classifier.py) vs a pure-Python reference."""

import math
import random

import pyarrow as pa
import pytest

import ray.data

from search_engine_ray.functions.text import WORD_RE
from search_engine_ray.stages.classifier import (nb_quality_scores,
                                                 train_nb_model)


def _ref_scores(docs, seed_word):
    """Independent row-at-a-time multinomial NB with add-one smoothing."""
    tokenized = [(d, WORD_RE.findall((t or "").lower())) for d, t in docs]
    labels = {d: 1 if seed_word in ws else 0 for d, ws in tokenized}
    counts: dict[str, list[int]] = {}
    for d, ws in tokenized:
        for w in ws:
            counts.setdefault(w, [0, 0])[labels[d]] += 1
    v = len(counts)
    n1 = sum(c[1] for c in counts.values())
    n0 = sum(c[0] for c in counts.values())
    d1 = sum(labels.values())
    d0 = len(labels) - d1

    def micro(x):
        return math.floor(x * 1e6 + 0.5)

    wm = {w: micro(math.log((c[1] + 1.0) / (n1 + v))
                   - math.log((c[0] + 1.0) / (n0 + v)))
          for w, c in counts.items()}
    pm = micro(math.log(d1 / (d1 + d0)) - math.log(d0 / (d1 + d0)))
    return {d: (labels[d], pm + sum(wm[w] for w in ws))
            for d, ws in tokenized}


def _ds(docs):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }))


def test_nb_scores_match_reference_randomized():
    rng = random.Random(99)
    vocab = ["spark", "merge", "sort", "rowly", "batchy", "zz"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 15))))
            for i in range(60)]
    docs.append((60, ""))          # empty doc -> label 0, score == prior
    docs.append((61, None))
    res = nb_quality_scores(_ds(docs), seed_word="spark").take_all()
    got = {r["doc_id"]: (r["label"], r["score_micro"]) for r in res}
    exp = _ref_scores(docs, "spark")
    assert got == exp


def test_model_shape_and_prior_sign():
    docs = [(0, "spark good good"), (1, "bad bad noise"), (2, "spark noise")]
    m = train_nb_model(_ds(docs), seed_word="spark")
    assert m["d1"] == 2 and m["d0"] == 1
    assert m["vocab"] == 4
    # 'good' only ever co-occurs with the seed -> positive weight
    assert m["weights"]["good"] > 0 > m["weights"]["bad"]


def test_degenerate_class_raises():
    docs = [(0, "all the same class"), (1, "no seed here")]
    with pytest.raises(ValueError, match="degenerate"):
        train_nb_model(_ds(docs), seed_word="spark")
