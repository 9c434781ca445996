"""Bigram collocation extraction (pointwise mutual information).

Classic corpus-analysis pass (Church & Hanks 1990, "Word Association Norms,
Mutual Information, and Lexicography"): score adjacent word pairs by
PMI = ln( p(ab) / (p(a)·p(b)) ) and keep the top collocations above a
minimum count.  In an LLM-data pipeline this is the standard tool for
boilerplate-phrase discovery and tokenizer-merge diagnostics.

Scale shape: ONE tokenize pass emits per-batch pre-aggregated partials —
(w1, w2, n) bigram counts, plus sentinel (w, '', n) unigram rows and two
('', ·) totals rows riding the same exchange — then a single
groupby((w1, w2)) keyed sum.  Exchange volume is distinct pairs per batch,
never per token.  The min-count threshold is applied ON the aggregated
dataset before collection, so the driver materializes only vocab-bounded
unigrams + thresholded pairs; unigram counts join the kept pairs by dict
lookup (no second shuffle) and top-k is a deterministic total-order cut.

Float discipline: PMI is pinned to ln-microunits with the exact expression
shape of the SQL mirror (double divisions, one ln, one floor), so the
driver compare is hash-exact.  Tokenizer: [a-z]{2,32} over lower(text)
(the _WORDS oracle convention).

Reference counterpart: none — a north-rule text-analysis addition
(neighbors: word_counts A4, tfidf_top_terms, lm bigram model in
stages/lm.py, which shares the bigram featurization but serves perplexity
scoring rather than collocation ranking).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.rounding import ln_microunits
from ..functions.text import WORD_RE

DEFAULT_MIN_COUNT = 5
DEFAULT_TOP_K = 50


def _pair_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> per-batch (w1, w2, n) partials; unigram rows carry
    w2='' (words are nonempty, so no collision), and two totals rows under
    the reserved w1='' namespace carry n_tokens / n_bigrams — everything
    rides the one pair exchange."""
    texts = batch.column("text").to_pylist()
    pairs: dict[tuple[str, str], int] = {}
    unis: dict[str, int] = {}
    n_tokens = 0
    n_bigrams = 0
    findall = WORD_RE.findall
    for text in texts:
        words = findall((text or "").lower())
        n_tokens += len(words)
        for w in words:
            unis[w] = unis.get(w, 0) + 1
        for a, b in zip(words, words[1:]):
            n_bigrams += 1
            k = (a, b)
            pairs[k] = pairs.get(k, 0) + 1
    w1 = [k[0] for k in pairs] + list(unis.keys()) + ["", ""]
    w2 = [k[1] for k in pairs] + [""] * len(unis) + ["tokens", "bigrams"]
    n = list(pairs.values()) + list(unis.values()) + [n_tokens, n_bigrams]
    return pa.table({
        "w1": pa.array(w1, pa.string()),
        "w2": pa.array(w2, pa.string()),
        "n": pa.array(n, pa.int64()),
    })


def pmi_collocations(docs: "ray.data.Dataset", *,
                     min_count: int = DEFAULT_MIN_COUNT,
                     top_k: int = DEFAULT_TOP_K,
                     batch_size: int = 1024) -> pa.Table:
    """Top-k adjacent-pair collocations: (w1, w2, c_ab, pmi_micro), ordered
    by (pmi_micro desc, w1, w2) — a total order, so the cut is
    deterministic."""
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        _pair_rows, batch_format="pyarrow", batch_size=batch_size)
    agg_ds = rows.groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.or_(pc.or_(pc.equal(b.column("w1"), ""),
                             pc.equal(b.column("w2"), "")),
                      pc.greater_equal(b.column("n"), min_count))
        return b.filter(mask)

    agg = agg_ds.map_batches(keep, batch_format="pyarrow").take_all()

    unis: dict[str, int] = {}
    pairs: list[tuple[str, str, int]] = []
    n_tokens = n_bigrams = 0
    for r in agg:
        if r["w1"] == "":
            if r["w2"] == "tokens":
                n_tokens = int(r["n"])
            else:
                n_bigrams = int(r["n"])
        elif r["w2"] == "":
            unis[r["w1"]] = int(r["n"])
        else:
            pairs.append((r["w1"], r["w2"], int(r["n"])))
    kept = [(a, b, c) for a, b, c in pairs if c >= min_count]
    if not kept or n_bigrams == 0:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "c_ab": pa.array([], pa.int64()),
                         "pmi_micro": pa.array([], pa.int64())})
    c_ab = np.asarray([c for _, _, c in kept], dtype=np.float64)
    c_a = np.asarray([unis[a] for a, _, _ in kept], dtype=np.float64)
    c_b = np.asarray([unis[b] for _, b, _ in kept], dtype=np.float64)
    # expression shape shared with the SQL mirror: three double divisions,
    # one composite ratio, one ln, one microunit floor
    pmi = np.log((c_ab / n_bigrams) / ((c_a / n_tokens) * (c_b / n_tokens)))
    pm = ln_microunits(pmi)
    order = sorted(range(len(kept)),
                   key=lambda i: (-int(pm[i]), kept[i][0], kept[i][1]))
    order = order[:top_k]
    return pa.table({
        "w1": pa.array([kept[i][0] for i in order], pa.string()),
        "w2": pa.array([kept[i][1] for i in order], pa.string()),
        "c_ab": pa.array([kept[i][2] for i in order], pa.int64()),
        "pmi_micro": pa.array([int(pm[i]) for i in order], pa.int64()),
    })
