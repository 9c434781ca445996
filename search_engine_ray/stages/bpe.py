"""Distributed BPE merge-rule training (Sennrich et al. 2016) — the
tokenizer-training operator of the training-data suite.

Classic BPE trains on the WORD-FREQUENCY table, not the raw token
stream, so the corpus-scale work is exactly one distributed word count
(same tokenizer as word_counts, ``[a-z]{2,32}``); every merge iteration
then runs over the vocabulary-sized symbolization table:

  per iteration (all distributed, driver sees ONE row):
    1. pair counts — ``map_batches`` over the symbolized vocab emits
       per-batch (left, right, freq-weighted count) partials; one keyed
       ``groupby(left, right)`` sum;
    2. argmax — per-block best inside ``map_batches``, then a driver
       reduce over <= num_blocks candidate rows picks the merge
       (count DESC, left ASC, right ASC — plain ASCII ordering, shared
       with the SQL oracle);
    3. apply — greedy-left merge scan over each word's symbol list
       (per-word Python is vocabulary-bounded, not corpus-bounded —
       the same acceptance as the spellcheck dictionary ops), then
       ``materialize()`` so the next iteration reads the merged state.

Everything is integer/string — no floats anywhere — so the DuckDB
mirror (chained CTEs: pair-count, ORDER BY ... LIMIT 1, list_reduce
merge fold) is hash-exact, and the per-iteration merge fold's
greedy-left semantics are identical on both sides (acc[-1]==left and
x==right merges; "a a a" under (a,a) -> ["aa","a"]).

At 100 TB: the word count is the only corpus pass; the per-iteration
shuffles are vocabulary-sized (distinct words, then distinct symbol
pairs).  K merges = K small keyed exchanges.  Reference counterpart:
none — a north-rule training-data addition.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.text import WORD_RE  # noqa: E402 — the
# oracle-pinned word tokenizer, one shared definition
END_SYM = "</w>"

DEFAULT_NUM_MERGES = 8


def word_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(word, freq) — the A4 corpus word count (same [a-z]{2,32}
    tokenizer, per-batch Counter partials + one keyed sum), reused from
    the spellcheck stage so the plan lives in one place."""
    from .spellcheck import word_counts as _wc
    return _wc(docs).map_batches(
        lambda b: pa.table({
            "word": b.column("word"),
            "freq": b.column("total_frequency").cast(pa.int64())})
        if b.num_rows and "word" in b.column_names else
        pa.table({"word": pa.array([], pa.string()),
                  "freq": pa.array([], pa.int64())}),
        batch_format="pyarrow")


def _merge_syms(syms: list, left: str, right: str) -> list:
    """Greedy-left merge of the (left, right) pair in one symbol list."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(docs: "ray.data.Dataset", *,
              num_merges: int = DEFAULT_NUM_MERGES) -> pa.Table:
    """Learn the first ``num_merges`` BPE merge rules; returns
    (rank, lft, rgt, freq) — rank is 1-based merge order, freq the
    pair's weighted count when it was chosen."""
    merges, _ = _bpe_train_state(docs, num_merges=num_merges)
    return merges


def _bpe_train_state(docs: "ray.data.Dataset", *,
                     num_merges: int = DEFAULT_NUM_MERGES
                     ) -> tuple[pa.Table, "ray.data.Dataset"]:
    """Shared trainer: returns (merge-rule table, final symbolized
    word-frequency Dataset) so the encode stage reuses the fully-merged
    vocabulary the training loop already materialized instead of
    re-applying every rule from scratch."""
    def symbolize(b: pa.Table) -> pa.Table:
        words = b.column("word").to_pylist()
        syms = [list(w) + [END_SYM] for w in words]
        return pa.table({
            "freq": b.column("freq"),
            "syms": pa.array(syms, pa.list_(pa.string())),
        })

    vocab = word_counts(docs).map_batches(
        symbolize, batch_format="pyarrow").materialize()

    def pair_partials(b: pa.Table) -> pa.Table:
        counts: dict[tuple, int] = {}
        freqs = b.column("freq").to_pylist()
        for f, syms in zip(freqs, b.column("syms").to_pylist()):
            for a, c in zip(syms, syms[1:]):
                counts[(a, c)] = counts.get((a, c), 0) + f
        lft, rgt, cnt = [], [], []
        for (a, c), n in counts.items():
            lft.append(a)
            rgt.append(c)
            cnt.append(n)
        return pa.table({"lft": pa.array(lft, pa.string()),
                         "rgt": pa.array(rgt, pa.string()),
                         "cnt": pa.array(cnt, pa.int64())})

    def block_best(b: pa.Table) -> pa.Table:
        empty = pa.table({"lft": pa.array([], pa.string()),
                          "rgt": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if b.num_rows == 0 or "lft" not in b.column_names:
            return empty
        rows = sorted(zip(b.column("lft").to_pylist(),
                          b.column("rgt").to_pylist(),
                          b.column("cnt").to_pylist()),
                      key=lambda r: (-r[2], r[0], r[1]))
        a, c, n = rows[0]
        return pa.table({"lft": pa.array([a], pa.string()),
                         "rgt": pa.array([c], pa.string()),
                         "cnt": pa.array([n], pa.int64())})

    merges = []
    for rank in range(1, num_merges + 1):
        cands = vocab.map_batches(
            pair_partials, batch_format="pyarrow").groupby(
            ["lft", "rgt"]).aggregate(Sum("cnt")).map_batches(
            lambda b: block_best(pa.table({
                "lft": b.column("lft"), "rgt": b.column("rgt"),
                "cnt": b.column("sum(cnt)")}))
            if b.num_rows and "lft" in b.column_names else block_best(b),
            batch_format="pyarrow").take_all()
        if not cands:
            break
        best = min(cands, key=lambda r: (-r["cnt"], r["lft"], r["rgt"]))
        merges.append((rank, best["lft"], best["rgt"], best["cnt"]))
        left, right = best["lft"], best["rgt"]

        def apply(b: pa.Table, left=left, right=right) -> pa.Table:
            syms = [
                _merge_syms(s, left, right)
                for s in b.column("syms").to_pylist()]
            return pa.table({
                "freq": b.column("freq"),
                "syms": pa.array(syms, pa.list_(pa.string()))})

        vocab = vocab.map_batches(apply, batch_format="pyarrow").materialize()

    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "lft": pa.array([m[1] for m in merges], pa.string()),
        "rgt": pa.array([m[2] for m in merges], pa.string()),
        "freq": pa.array([m[3] for m in merges], pa.int64()),
    }), vocab


def bpe_encode_token_counts(docs: "ray.data.Dataset", *,
                            num_merges: int = DEFAULT_NUM_MERGES
                            ) -> "ray.data.Dataset":
    """Apply the learned merge rules to the corpus and return the token
    frequency table (token, total) — the tokenizer-APPLICATION half of
    the BPE story (train learns the rules; encode is what a training-data
    export actually runs over every document).

    Because classic BPE segments each word independently, encoding the
    corpus == encoding the word-frequency table and weighting by word
    freq: the expensive corpus pass is the ONE word count the trainer
    already does, and the apply runs over the vocabulary-sized table the
    training loop left fully merged (zero re-application).  Exploding
    (syms, freq) -> per-batch (token, partial) Counter partials + one
    keyed sum mirrors every other count in the suite.

    Integer/string only — the DuckDB mirror extends the training CTE
    chain with one unnest+GROUP BY, hash-exact.  At 100 TB the explode
    and sum stay vocabulary-sized (distinct words), not corpus-sized."""
    _, vocab = _bpe_train_state(docs, num_merges=num_merges)

    def explode(b: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for f, syms in zip(b.column("freq").to_pylist(),
                           b.column("syms").to_pylist()):
            for s in syms:
                counts[s] = counts.get(s, 0) + f
        return pa.table({
            "token": pa.array(list(counts.keys()), pa.string()),
            "partial": pa.array(list(counts.values()), pa.int64())})

    return vocab.map_batches(explode, batch_format="pyarrow").groupby(
        "token").aggregate(Sum("partial")).map_batches(
        lambda b: pa.table({
            "token": b.column("token"),
            "total": b.column("sum(partial)").cast(pa.int64())})
        if b.num_rows and "token" in b.column_names else
        pa.table({"token": pa.array([], pa.string()),
                  "total": pa.array([], pa.int64())}),
        batch_format="pyarrow")
