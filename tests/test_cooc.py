"""PMI collocations (stages/cooc.py) vs a row-at-a-time reference."""

import math
import random

import pyarrow as pa

import ray.data

from search_engine_ray.functions.text import WORD_RE
from search_engine_ray.stages.cooc import pmi_collocations


def _ref(docs, min_count, top_k):
    uni, bi = {}, {}
    n_tok = n_bi = 0
    for _, t in docs:
        ws = WORD_RE.findall((t or "").lower())
        n_tok += len(ws)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            n_bi += 1
            bi[(a, b)] = bi.get((a, b), 0) + 1
    rows = []
    for (a, b), c in bi.items():
        if c < min_count:
            continue
        pmi = math.log((c / n_bi) / ((uni[a] / n_tok) * (uni[b] / n_tok)))
        rows.append((a, b, c, math.floor(pmi * 1e6 + 0.5)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_k]


def _ds(docs):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }))


def test_pmi_matches_reference_randomized():
    rng = random.Random(5)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 20))))
            for i in range(80)] + [(80, ""), (81, None)]
    got = pmi_collocations(_ds(docs), min_count=3, top_k=10).to_pylist()
    got = [(r["w1"], r["w2"], r["c_ab"], r["pmi_micro"]) for r in got]
    assert got == _ref(docs, 3, 10)


def test_pmi_empty_corpus():
    t = pmi_collocations(_ds([(0, ""), (1, "one")]), min_count=1, top_k=5)
    assert t.num_rows == 0
