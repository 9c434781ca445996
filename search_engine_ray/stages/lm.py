"""Corpus-trained bigram language-model perplexity scoring (CCNet-style
quality filtering, Wenzek et al. 2020 pattern, simplified to an add-alpha
bigram model so the whole operator is deterministic and SQL-mirrorable).

Shape (all distributed; strings never cross an exchange):

  1. TRAIN — ``map_batches`` emits per-batch pre-aggregated
     (gh, ch, cnt) bigram partials, where gh = hash64(w1 + US + w2) and
     ch = hash64(w1); one keyed ``groupby(gh, ch)`` sum builds the model.
     Context totals c(w1) come from a model-sized ``groupby(ch)`` sum;
     the smoothing vocabulary V is the CONTEXT vocabulary (distinct w1
     count — a metadata-only count on the materialized context table,
     standard for context-conditional add-alpha smoothing, and it keeps
     training at exactly ONE corpus pass).
  2. SCORE — a second corpus pass emits one (doc_id, gh, ch) row per
     bigram OCCURRENCE (numpy-flattened, no per-doc Python dicts); the
     gram stream, the model and the context table are unioned and hit ONE
     ``groupby(part = ch % nparts)`` exchange; inside each partition the
     lookups are vectorized ``np.searchsorted`` against the partition's
     model/context rows (both land in the same partition by construction
     — same ch key) and per-doc PARTIAL sums leave the partition, so the
     final ``groupby(doc_id)`` sees combiner-sized input.

Joining on 64-bit hashes instead of strings matches the repo's LSH-band
convention (band_key vs literal tuple, "modulo 2^-63 collision
probability"): the hash is only an equality key, so engine/oracle parity
holds unless two distinct grams collide.

Float discipline: per-bigram log-probs are fixed to integer MICROUNITS
(floor(ln(x) * 1e6 + .5) as int64) before any per-group summation, so
per-doc sums are order-free, and the per-doc average is itself pinned to
microunits (floor-half-up) — no round-half convention (numpy half-even
vs SQL half-away) can flip the 6th decimal.

Tokenizer: ``[a-z]{2,32}`` over lower(text) — identical to the
word_counts/_WORDS oracle fragment.  Docs with < 2 tokens have no
bigrams and are absent from the output (mirrored).

At 100 TB: the one wide exchange keys on hash(w1) — Zipf-skewed (a hot
context word concentrates its grams in one partition); ``n_salts > 1``
splits every ch partition by the GRAM hash: gram and model rows are both
gh-keyed so they co-locate under the same salt with NO replication, and
only the tiny context table replicates across salts — the same hot-key
treatment as the posting-list build, property-tested bit-identical to
the unsalted exchange.  Reference
counterpart: none — a north-rule training-data addition (quality scoring
family, textstats.py neighbors).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.rounding import ln_microunits as _r6u
from ..functions.text import WORD_RE  # noqa: E402 — the
# oracle-pinned word tokenizer, one shared definition

LM_ALPHA = 0.5          # add-alpha smoothing mass per vocabulary entry
LM_NUM_PARTS = 16


def _hash_strs(strs: list) -> np.ndarray:
    """Deterministic-within-run vectorized 64-bit string hash (C siphash
    via pandas), as int64 (bit view)."""
    return pd.util.hash_array(
        np.asarray(strs, dtype=object)).view(np.int64)


def _batch_grams(texts: list) -> tuple[np.ndarray, list, list]:
    """Flatten a batch's bigrams: (row_doc_index, w1_list, w2_list)."""
    idx, w1, w2 = [], [], []
    for i, t in enumerate(texts):
        toks = WORD_RE.findall((t or "").lower())
        if len(toks) < 2:
            continue
        w1.extend(toks[:-1])
        w2.extend(toks[1:])
        idx.extend([i] * (len(toks) - 1))
    return np.asarray(idx, dtype=np.int64), w1, w2


def _gram_keys(w1: list, w2: list) -> tuple[np.ndarray, np.ndarray]:
    """(gh, ch) int64 keys for bigrams."""
    gh = _hash_strs([a + "\x1f" + b for a, b in zip(w1, w2)])
    ch = _hash_strs(w1)
    return gh, ch


def _doc_gram_rows(batch: pa.Table) -> pa.Table:
    """One (doc_id, gh, ch) row per bigram occurrence."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    idx, w1, w2 = _batch_grams(batch.column("text").to_pylist())
    if len(idx) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "gh": pa.array([], pa.int64()),
                         "ch": pa.array([], pa.int64())})
    gh, ch = _gram_keys(w1, w2)
    return pa.table({"doc_id": pa.array(ids[idx], pa.int64()),
                     "gh": pa.array(gh, pa.int64()),
                     "ch": pa.array(ch, pa.int64())})


def _model_partials(batch: pa.Table) -> pa.Table:
    """Batch-combined (gh, ch, cnt) training partials."""
    _, w1, w2 = _batch_grams(batch.column("text").to_pylist())
    if not w1:
        return pa.table({"gh": pa.array([], pa.int64()),
                         "ch": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    gh, ch = _gram_keys(w1, w2)
    ug, inv = np.unique(gh, return_inverse=True)
    cnt = np.bincount(inv, minlength=len(ug)).astype(np.int64)
    # ch is functionally dependent on gh: take it from each gram's first
    # occurrence
    first = np.full(len(ug), -1, dtype=np.int64)
    first[inv[::-1]] = np.arange(len(gh) - 1, -1, -1)
    return pa.table({"gh": pa.array(ug, pa.int64()),
                     "ch": pa.array(ch[first], pa.int64()),
                     "cnt": pa.array(cnt, pa.int64())})


def bigram_model(docs: "ray.data.Dataset"
                 ) -> tuple["ray.data.Dataset", "ray.data.Dataset", int]:
    """(model, contexts, V): model = (gh, ch, cb); contexts = (ch, cu);
    V = context vocabulary size (distinct w1)."""
    partials = docs.select_columns(["text"]).map_batches(
        _model_partials, batch_format="pyarrow")
    model = partials.groupby(["gh", "ch"]).aggregate(Sum("cnt")).map_batches(
        lambda b: pa.table({"gh": b.column("gh"), "ch": b.column("ch"),
                            "cb": b.column("sum(cnt)").cast(pa.int64())})
        if b.num_rows and "gh" in b.column_names else
        pa.table({"gh": pa.array([], pa.int64()),
                  "ch": pa.array([], pa.int64()),
                  "cb": pa.array([], pa.int64())}),
        batch_format="pyarrow").materialize()
    # materialized: the model feeds BOTH the context aggregate and the
    # scoring union — lazy, its corpus-pass lineage would execute twice.
    # Size is distinct-bigrams-bounded (object store, spillable), not
    # corpus-bounded.
    contexts = model.groupby("ch").aggregate(Sum("cb")).map_batches(
        lambda b: pa.table({"ch": b.column("ch"),
                            "cu": b.column("sum(cb)").cast(pa.int64())})
        if b.num_rows and "ch" in b.column_names else
        pa.table({"ch": pa.array([], pa.int64()),
                  "cu": pa.array([], pa.int64())}),
        batch_format="pyarrow").materialize()
    return model, contexts, contexts.count()


# union-side discriminators for the single scoring exchange
_SIDE_GRAM, _SIDE_MODEL, _SIDE_CTX = 0, 1, 2


def _union_schema() -> pa.Schema:
    return pa.schema([("part", pa.int64()), ("side", pa.int64()),
                      ("doc_id", pa.int64()), ("gh", pa.int64()),
                      ("ch", pa.int64()), ("cb", pa.int64()),
                      ("cu", pa.int64())])


def _as_union(b: pa.Table, side: int, nparts: int,
              n_salts: int = 1) -> pa.Table:
    """Tag a side's rows with their exchange partition.

    Hot-context salting (``n_salts > 1``): a Zipf-hot w1 concentrates its
    grams in one ch-keyed partition; salting splits every ch partition
    ``n_salts`` ways by the GRAM hash.  Because model rows are gh-keyed
    too, gram and model rows co-locate under the same ``gh % n_salts``
    salt with NO replication — only the context table (one row per
    distinct w1, the tiny side) replicates across the salts of its ch.
    Results are bit-identical at any n_salts (property-tested)."""
    n = b.num_rows
    ch = b.column("ch").to_numpy(zero_copy_only=False)
    base = (ch.view(np.uint64) % np.uint64(nparts)).astype(np.int64)
    nulls = pa.nulls(n, pa.int64())
    if side == _SIDE_CTX:
        reps = np.repeat(np.arange(n_salts, dtype=np.int64), n)
        idx = np.tile(np.arange(n, dtype=np.int64), n_salts)
        cols = {
            "part": pa.array(np.tile(base, n_salts) * n_salts + reps,
                             pa.int64()),
            "side": pa.array(np.full(n * n_salts, side, dtype=np.int64),
                             pa.int64()),
            "doc_id": pa.nulls(n * n_salts, pa.int64()),
            "gh": pa.nulls(n * n_salts, pa.int64()),
            "ch": b.column("ch").take(pa.array(idx, pa.int64())),
            "cb": pa.nulls(n * n_salts, pa.int64()),
            "cu": b.column("cu").take(pa.array(idx, pa.int64())),
        }
        return pa.table(cols, schema=_union_schema())
    gh_np = b.column("gh").to_numpy(zero_copy_only=False)
    salt = (gh_np.view(np.uint64) % np.uint64(n_salts)).astype(np.int64)
    cols = {
        "part": pa.array(base * n_salts + salt, pa.int64()),
        "side": pa.array(np.full(n, side, dtype=np.int64), pa.int64()),
        "doc_id": b.column("doc_id") if side == _SIDE_GRAM else nulls,
        "gh": b.column("gh"),
        "ch": b.column("ch"),
        "cb": b.column("cb") if side == _SIDE_MODEL else nulls,
        "cu": nulls,
    }
    return pa.table(cols, schema=_union_schema())


def lm_perplexity(docs: "ray.data.Dataset", *, alpha: float = LM_ALPHA,
                  nparts: int = LM_NUM_PARTS,
                  n_salts: int = 1) -> "ray.data.Dataset":
    """(doc_id, bigrams, logprob_u, avg_logprob, ppl) per doc with >= 1
    bigram.

      p(w2|w1)    = (c(w1,w2) + alpha) / (c(w1) + alpha * V)
                    with V = |distinct contexts w1|
      logprob_u   = sum over doc bigrams of
                    r6u(ln(cb + alpha)) - r6u(ln(cu + alpha * V))  [int64]
      avg_u       = floor(logprob_u / bigrams + 0.5)               [int64]
      avg_logprob = avg_u / 1e6
      ppl         = round(exp(-avg_u / 1e6), 6)
    """
    model, contexts, vocab = bigram_model(docs)
    grams = docs.select_columns(["doc_id", "text"]).map_batches(
        _doc_gram_rows, batch_format="pyarrow")

    unioned = (
        grams.map_batches(
            lambda b: _as_union(b, _SIDE_GRAM, nparts, n_salts),
            batch_format="pyarrow")
        .union(model.map_batches(
            lambda b: _as_union(b, _SIDE_MODEL, nparts, n_salts),
            batch_format="pyarrow"))
        .union(contexts.map_batches(
            lambda b: _as_union(b, _SIDE_CTX, nparts, n_salts),
            batch_format="pyarrow")))

    av = float(alpha)
    av_v = float(alpha) * float(vocab)

    def score_partition(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        gmask = side == _SIDE_GRAM
        if not gmask.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "u": pa.array([], pa.int64())})
        mmask = side == _SIDE_MODEL
        cmask = side == _SIDE_CTX
        import pyarrow.compute as pc
        # fill nulls BEFORE to_numpy: a nullable int64 column converts to
        # float64, which would truncate 64-bit hash keys (ulp at 2^62 is
        # 1024 — distinct grams would silently collide in the lookup)
        gh = pc.fill_null(g.column("gh"), 0).to_numpy(zero_copy_only=False)
        ch = g.column("ch").to_numpy(zero_copy_only=False)
        doc = pc.fill_null(g.column("doc_id"), 0).to_numpy(
            zero_copy_only=False)[gmask]
        # vectorized lookups: model/context rows for every gram in this
        # partition are co-located (same ch-keyed partition function)
        m_gh = gh[mmask]
        m_cb = pc.fill_null(g.column("cb"), 0).to_numpy(
            zero_copy_only=False)[mmask]
        order = np.argsort(m_gh, kind="stable")
        m_gh, m_cb = m_gh[order], m_cb[order]
        c_ch = ch[cmask]
        c_cu = pc.fill_null(g.column("cu"), 0).to_numpy(
            zero_copy_only=False)[cmask]
        corder = np.argsort(c_ch, kind="stable")
        c_ch, c_cu = c_ch[corder], c_cu[corder]
        cb = m_cb[np.searchsorted(m_gh, gh[gmask])].astype(np.float64)
        cu = c_cu[np.searchsorted(c_ch, ch[gmask])].astype(np.float64)
        u = _r6u(np.log(cb + av)) - _r6u(np.log(cu + av_v))
        # per-doc PARTIAL sums leave the partition (combiner).  int64
        # accumulation (np.add.at), NOT bincount's float64 weights path:
        # a partial sum past 2^53 would round and break integer exactness
        udoc, inv = np.unique(doc, return_inverse=True)
        usum = np.zeros(len(udoc), dtype=np.int64)
        np.add.at(usum, inv, u)
        return pa.table({
            "doc_id": pa.array(udoc, pa.int64()),
            "n": pa.array(np.bincount(inv, minlength=len(udoc))
                          .astype(np.int64), pa.int64()),
            "u": pa.array(usum, pa.int64()),
        })

    per_doc = unioned.groupby("part").map_groups(
        score_partition, batch_format="pyarrow").groupby(
        "doc_id").aggregate(Sum("n"), Sum("u"))

    def finalize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "bigrams": pa.array([], pa.int64()),
                "logprob_u": pa.array([], pa.int64()),
                "avg_logprob": pa.array([], pa.float64()),
                "ppl": pa.array([], pa.float64())})
        n = b.column("sum(n)").to_numpy(zero_copy_only=False)
        u = b.column("sum(u)").to_numpy(zero_copy_only=False)
        avg_u = np.floor(u / n + 0.5).astype(np.int64)
        avg = avg_u / 1_000_000.0
        return pa.table({
            "doc_id": b.column("doc_id"),
            "bigrams": pa.array(n, pa.int64()),
            "logprob_u": pa.array(u, pa.int64()),
            "avg_logprob": pa.array(avg, pa.float64()),
            "ppl": pa.array(np.round(np.exp(-avg), 6), pa.float64()),
        })

    return per_doc.map_batches(finalize, batch_format="pyarrow")


def lm_survivors(docs: "ray.data.Dataset", *, max_ppl: float,
                 alpha: float = LM_ALPHA) -> "ray.data.Dataset":
    """(doc_id, ppl) for docs whose bigram perplexity clears the quality
    bar (ppl <= max_ppl) — the CCNet keep set.  Pure filter over
    lm_perplexity; the threshold is a fixed constant (CCNet buckets by
    trained-model percentiles; a fixed bar keeps the oracle exact)."""
    import pyarrow.compute as pc
    scored = lm_perplexity(docs, alpha=alpha)
    return scored.map_batches(
        lambda b: b.filter(pc.less_equal(b.column("ppl"), max_ppl)).select(
            ["doc_id", "ppl"]),
        batch_format="pyarrow")
