"""Training-data curation operators: token-budget shard packing and
deterministic stratified sampling.

These are the post-dedup steps of a large-scale training-data pipeline:
pack cleaned documents into fixed-token-budget shards (sequential packing in
a stable global order), and draw reproducible per-stratum samples without an
RNG (hash-based, so any worker — or a SQL oracle — computes the same draw).

Both are Ray-Data-first and shuffle-light:

* ``pack_shards``: a two-phase distributed prefix sum — per-bucket token
  sums (tiny groupby over doc_id // bucket_size), driver-side exclusive
  prefix over the sorted bucket sums (O(num_buckets), same cutover class as
  the conv-offset broadcast in stages/doc_ids.py), then one
  groupby(bucket).map_groups that computes the exact in-bucket cumulative
  sum and shard id.  No global sort, no all-to-all beyond the one bucket
  groupby.
* ``sample_stratified``: a pure filter — md5-based uniform hash of the doc
  id against a per-language keep-rate (language from the lang_id marker
  heuristic).  md5_hash64 == DuckDB ``md5_number_lower``, so the draw is
  SQL-mirrorable bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.hashing import md5_hash64_column
from ..functions.text import TOKEN_RE
from .textstats import classify_lang

DEFAULT_SHARD_BUDGET = 2048       # tokens per training shard
DEFAULT_BUCKET_SIZE = 65536       # doc_ids per prefix-sum bucket

# per-language keep percentage (0..100): up-weight the tail languages,
# down-sample the head — the standard multilingual curation shape
DEFAULT_STRATA_RATES: dict[str, int] = {
    "en": 10, "de": 40, "es": 40, "fr": 40, "unk": 100,
}


def _token_counts(docs: "ray.data.Dataset",
                  bucket_size: int) -> "ray.data.Dataset":
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts = [len(TOKEN_RE.findall((t or "").lower())) for t in texts]
        ids = batch.column("doc_id")
        return pa.table({
            "doc_id": ids,
            "token_count": pa.array(counts, pa.int64()),
            "bucket": pc.divide(ids, bucket_size),
        })
    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def pack_shards(docs: "ray.data.Dataset", *,
                budget_tokens: int = DEFAULT_SHARD_BUDGET,
                bucket_size: int = DEFAULT_BUCKET_SIZE) -> "ray.data.Dataset":
    """(doc_id, token_count, shard_id): sequential packing of docs in
    doc_id order into shards of ``budget_tokens`` — shard_id = (cumulative
    tokens BEFORE this doc) // budget, i.e. a shard closes once it reaches
    the budget; a doc longer than the budget occupies its own shard(s).

    Exactly mirrors ``sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING
    AND 1 PRECEDING) // budget`` without a global sort: bucket partial sums
    (distributed) -> driver exclusive prefix over ~doc_total/bucket_size
    rows -> broadcast bases -> per-bucket exact cumsum."""
    # materialize: the counts dataset feeds TWO consumers (bucket-sum
    # take_all + the groupby below); without this the tokenization of every
    # document text would execute twice
    counts = _token_counts(docs, bucket_size).materialize()

    bucket_rows = counts.groupby("bucket").aggregate(
        Sum("token_count")).take_all()          # ~1 row per 64k doc_ids
    bucket_rows.sort(key=lambda r: r["bucket"])
    buckets = np.asarray([r["bucket"] for r in bucket_rows], dtype=np.int64)
    sums = np.asarray([r["sum(token_count)"] for r in bucket_rows],
                      dtype=np.int64)
    bases = np.concatenate(([0], np.cumsum(sums)[:-1]))
    bases_ref = ray.put((buckets, bases))

    def assign(group: pa.Table) -> pa.Table:
        bks, bss = ray.get(bases_ref)
        group = group.sort_by("doc_id")
        n = group.column("token_count").to_numpy(zero_copy_only=False)
        b = int(group.column("bucket")[0].as_py())
        base = int(bss[np.searchsorted(bks, b)])
        cum_before = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table({
            "doc_id": group.column("doc_id"),
            "token_count": group.column("token_count"),
            "shard_id": pa.array(cum_before // budget_tokens, pa.int64()),
        })

    return counts.groupby("bucket").map_groups(assign, batch_format="pyarrow")


def shuffle_pack_shards(docs: "ray.data.Dataset", *,
                        budget_tokens: int = DEFAULT_SHARD_BUDGET,
                        bucket_bits: int = 16) -> "ray.data.Dataset":
    """(doc_id, shuffle_key, token_count, shard_id): the training-export
    last mile — a DETERMINISTIC global shuffle (order by
    md5_hash64(doc_id), the oracle-recomputable stand-in for an RNG
    permutation) followed by token-budget packing in shuffled order, so
    every shard is an unbiased corpus sample of ~``budget_tokens``.

    Same two-phase prefix sum as ``pack_shards``, but bucketed by the
    TOP ``bucket_bits`` bits of the shuffle key, so ascending bucket id
    IS ascending shuffle order: bucket partial sums (distributed) ->
    driver exclusive prefix over <= 2^bucket_bits rows -> broadcast
    bases -> exact in-bucket cumsum ordered by (shuffle_key, doc_id).
    No global sort, no materialized permutation; at 100 TB the bucket
    count scales by raising ``bucket_bits`` (driver state stays tiny)."""
    shift = np.uint64(64 - bucket_bits)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        counts = [len(TOKEN_RE.findall((t or "").lower())) for t in texts]
        h = md5_hash64_column([str(i) for i in ids])
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "shuffle_key": pa.array(h, pa.uint64()),
            "token_count": pa.array(counts, pa.int64()),
            "bucket": pa.array((h >> shift).astype(np.int64), pa.int64()),
        })

    counts = docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow").materialize()

    bucket_rows = counts.groupby("bucket").aggregate(
        Sum("token_count")).take_all()          # <= 2^bucket_bits rows
    bucket_rows.sort(key=lambda r: r["bucket"])
    buckets = np.asarray([r["bucket"] for r in bucket_rows], dtype=np.int64)
    sums = np.asarray([r["sum(token_count)"] for r in bucket_rows],
                      dtype=np.int64)
    bases = np.concatenate(([0], np.cumsum(sums)[:-1]))
    bases_ref = ray.put((buckets, bases))

    def assign(group: pa.Table) -> pa.Table:
        bks, bss = ray.get(bases_ref)
        group = group.sort_by([("shuffle_key", "ascending"),
                               ("doc_id", "ascending")])
        n = group.column("token_count").to_numpy(zero_copy_only=False)
        b = int(group.column("bucket")[0].as_py())
        base = int(bss[np.searchsorted(bks, b)])
        cum_before = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table({
            "doc_id": group.column("doc_id"),
            "shuffle_key": group.column("shuffle_key"),
            "token_count": group.column("token_count"),
            "shard_id": pa.array(cum_before // budget_tokens, pa.int64()),
        })

    return counts.groupby("bucket").map_groups(assign, batch_format="pyarrow")


def pack_examples(turns: "ray.data.Dataset", *,
                  budget_tokens: int = 512,
                  num_partitions: int = 32) -> "ray.data.Dataset":
    """(conv_id, turn_idx, token_count, example_idx): transcript-native
    example assembly — each conversation's turns pack, in turn order,
    into training examples of ~``budget_tokens`` (example_idx =
    cumulative tokens BEFORE this turn within its conversation //
    budget), so a model-ready example never crosses a conversation
    boundary.

    Scale shape: conversations hash into ``num_partitions`` groups (one
    exchange) and each partition runs ONE segmented cumsum over its
    sorted (conv_id, turn_idx) rows — numpy reduce, no per-conversation
    Python and no per-conv map_groups overhead (billions of small convs
    at 10^12 turns would drown a group-per-conv plan)."""
    def count(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = [len(TOKEN_RE.findall((t or "").lower())) for t in texts]
        conv = batch.column("conv_id").to_pylist()
        part = pd.util.hash_array(
            np.asarray(conv, dtype=object)) % num_partitions
        return pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "token_count": pa.array(n, pa.int64()),
            "part": pa.array(part.astype(np.int64), pa.int64()),
        })

    def assign(group: pa.Table) -> pa.Table:
        group = group.sort_by([("conv_id", "ascending"),
                               ("turn_idx", "ascending")])
        n = group.column("token_count").to_numpy(zero_copy_only=False)
        conv = group.column("conv_id").to_pylist()
        # segment boundaries where conv_id changes
        codes = pd.factorize(np.asarray(conv, dtype=object))[0]
        cs = np.cumsum(n)
        starts = np.flatnonzero(np.diff(codes, prepend=codes[0] - 1))
        counts = np.diff(np.append(starts, len(n)))
        seg_base = np.repeat(cs[starts] - n[starts], counts)
        cum_before = cs - n - seg_base
        return pa.table({
            "conv_id": group.column("conv_id"),
            "turn_idx": group.column("turn_idx"),
            "token_count": group.column("token_count"),
            "example_idx": pa.array(cum_before // budget_tokens, pa.int64()),
        })

    return turns.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        count, batch_format="pyarrow").groupby("part").map_groups(
        assign, batch_format="pyarrow")


def sample_stratified(docs: "ray.data.Dataset", *,
                      rates: dict[str, int] | None = None
                      ) -> "ray.data.Dataset":
    """(doc_id, lang, keep) deterministic stratified sample: keep iff
    md5_hash64(str(doc_id)) % 100 < rates[lang].  Pure filter — no RNG, no
    shuffle; reproducible across runs, workers, and the SQL oracle."""
    rates = dict(DEFAULT_STRATA_RATES if rates is None else rates)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        # the SAME classifier lang_id reports — a private copy here could
        # silently sample under one label and analyze under another
        out_lang = [classify_lang(set((t or "").lower().split()))
                    for t in texts]
        draws = md5_hash64_column([str(i) for i in ids]) % 100
        keep = [int(d) < rates.get(l, 100)
                for d, l in zip(draws, out_lang)]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": pa.array(out_lang, pa.string()),
            "keep": pa.array(keep, pa.bool_()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def sample_per_key(ds: "ray.data.Dataset", *, key: str, id_col: str,
                   k: int = 5) -> "ray.data.Dataset":
    """Deterministic uniform k-per-group sample (the distributed analogue of
    per-key reservoir sampling, RNG-free): keep the k rows with the smallest
    md5 hash of their id within each key group — every worker, every rerun,
    and the SQL oracle draw the same rows.  One keyed exchange; the in-group
    selection is a vectorized argpartition."""
    def pick(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        draws = md5_hash64_column([str(i) for i in ids])
        if len(ids) > k:
            # (draw, id) lexicographic keeps the tie-break deterministic
            order = np.lexsort((np.asarray(ids, dtype=np.int64), draws))[:k]
            group = group.take(pa.array(np.sort(order), pa.int64()))
        return group.select([key, id_col])
    return ds.select_columns([key, id_col]).groupby(key).map_groups(
        pick, batch_format="pyarrow")


def sample_weighted(ds: "ray.data.Dataset", *, key: str, id_col: str,
                    weight_col: str, k: int) -> "ray.data.Dataset":
    """Deterministic weighted sampling without replacement per ``key``
    stratum (priority sampling, Efraimidis & Spirakis 2006): draw
    u = md5_hash64(str(id)) / 2^64 (exact power-of-two division of the
    SQL-mirrorable md5 hash), priority = ln(u) / weight — a monotone
    transform of the classic u^(1/w) key, so ranking by priority DESC
    samples each stratum proportionally to weight, RNG-free.

    Scale shape: the per-batch partial keeps only the local top-k per key
    BEFORE the exchange, so the keyed shuffle moves O(k * strata * batches)
    rows, never the corpus; the per-group finalize re-ranks the partials.
    Ties (impossible for continuous weights) break by id.  Weights must be
    > 0 after the caller's shift."""
    import numpy as np

    from ..functions.hashing import md5_hash64_column

    def _topk(batch: pa.Table, priorities: "np.ndarray") -> pa.Table:
        keys_np = batch.column(key).to_numpy(zero_copy_only=False)
        ids_np = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_np, -priorities, keys_np))
        sk = keys_np[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        rank = np.arange(len(sk)) - np.repeat(starts, np.diff(
            np.append(starts, len(sk))))
        keep = order[rank < k]
        return pa.table({key: pa.array(keys_np[keep]),
                         id_col: pa.array(ids_np[keep]),
                         "_pri": pa.array(priorities[keep], pa.float64())})

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        h = md5_hash64_column([str(v) for v in ids])
        u = h.astype(np.float64) / 2.0 ** 64
        wts = batch.column(weight_col).to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore"):
            pri = np.log(u) / wts
        return _topk(batch, pri)

    def finalize(group: pa.Table) -> pa.Table:
        pri = group.column("_pri").to_numpy(zero_copy_only=False)
        return _topk(group, pri).drop_columns(["_pri"])

    return (ds.select_columns([key, id_col, weight_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key).map_groups(finalize, batch_format="pyarrow"))


def _source_unit(source: str) -> int:
    """Default mixing weight unit for a source name: 1 + (digits % 4).

    Deterministic and derivable from the name alone, so the SQL oracle
    recomputes it (``1 + coalesce(try_cast(regexp_replace(source,
    '[^0-9]', '', 'g') AS BIGINT), 0) % 4``).  Callers with real mixing
    targets pass explicit ``weights`` instead."""
    digits = "".join(ch for ch in source if ch.isdigit())
    return 1 + (int(digits) % 4 if digits else 0)


def mix_sources(docs: "ray.data.Dataset", *,
                weights: dict[str, int] | None = None
                ) -> "ray.data.Dataset":
    """Static source mixing (the DoReMi-style curation step): downsample
    each ``source`` stratum so the OUTPUT token mass follows integer weight
    units, keeping as much data as the binding source allows.

    Math is integer-exact end to end so the SQL oracle matches bit-for-bit
    (Python ints are arbitrary precision; the mirror casts to HUGEINT):

      U           = sum of units over sources present
      nstar       = min over sources with tokens of  T_s * U // u_s
                    (max total output tokens honoring every target share)
      keep_ppm_s  = min(1e6, u_s * nstar * 1e6 // (U * T_s))
      keep(doc)   = md5_hash64(str(doc_id)) % 1e6 < keep_ppm_s

    The binding source keeps ~everything; heavier-than-target sources are
    hash-downsampled.  Token-less sources keep_ppm = 1e6 (nothing to mix).

    Scale shape: tokenization runs ONCE (materialized counts feed both the
    per-source total and the flag pass); the only driver state is the
    per-source totals dict (#sources rows — the same cutover class as the
    conv-offset broadcast) and the keep_ppm closure dict; the flag pass is
    a pure map.  No shuffle beyond the tiny source groupby."""
    def count_fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = [len(TOKEN_RE.findall((t or "").lower())) for t in texts]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "token_count": pa.array(n, pa.int64()),
        })

    counts = docs.select_columns(["doc_id", "source", "text"]).map_batches(
        count_fn, batch_format="pyarrow").materialize()

    totals: dict[str, int] = {
        r["source"]: int(r["sum(token_count)"])
        for r in counts.groupby("source").aggregate(
            Sum("token_count")).take_all()}
    if weights is not None and (missing := set(totals) - set(weights)):
        raise ValueError(f"mix_sources: no weight for sources {missing}")
    units = {s: int(weights[s]) if weights is not None else _source_unit(s)
             for s in totals}
    uu = sum(units.values())
    with_tokens = [s for s, t in totals.items() if t > 0]
    nstar = (min(totals[s] * uu // units[s] for s in with_tokens)
             if with_tokens else 0)
    keep_ppm = {
        s: (1_000_000 if totals[s] == 0 else
            min(1_000_000, units[s] * nstar * 1_000_000 // (uu * totals[s])))
        for s in totals}

    def flag(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        draws = md5_hash64_column([str(i) for i in ids]) % 1_000_000
        ppm = np.fromiter((keep_ppm[s] for s in srcs), dtype=np.int64,
                          count=len(srcs))
        return batch.append_column(
            "keep_ppm", pa.array(ppm, pa.int64())).append_column(
            "keep", pa.array(draws.astype(np.int64) < ppm, pa.bool_()))

    return counts.map_batches(flag, batch_format="pyarrow")


def per_key_quantile_gate(ds: "ray.data.Dataset", *, key: str,
                          value_col: str, id_col: str,
                          q_num: int = 1, q_den: int = 2
                          ) -> "ray.data.Dataset":
    """Per-key discrete-quantile gate: keep rows whose ``value_col`` >=
    PERCENTILE_DISC(q) of their ``key`` group — the "drop each domain's
    below-median documents" curation step, without ever materializing a
    group's raw values.

    Exact and scale-safe via a value HISTOGRAM: groupby (key, value) counts
    collapse each key to its distinct integer values (bounded — e.g. word
    counts, score microunits), the per-key disc-quantile is the smallest
    value whose cumulative count reaches ``ceil(q * n)`` (computed as
    ``(q_num * n + q_den - 1) // q_den``, matching DuckDB
    ``quantile_disc``), and the thresholds rejoin the rows on ``key``
    through the bounded hash join — no per-key sort of raw rows, no driver
    state.

    Output: the input's (id_col, key, value_col) rows at/above their key's
    quantile, plus the key's threshold."""
    from ray.data.aggregate import Count

    from ..util import coalesce_blocks, hash_join

    rows = ds.select_columns([id_col, key, value_col]).materialize()

    hist = coalesce_blocks(
        rows.groupby([key, value_col]).aggregate(Count()))

    def per_key(group: pa.Table) -> pa.Table:
        v = group.column(value_col).to_numpy(zero_copy_only=False)
        c = group.column("count()").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        target = (q_num * n + q_den - 1) // q_den
        thr = int(v[int(np.searchsorted(cum, target))])
        return pa.table({
            "gate_key": group.column(key).slice(0, 1),
            "threshold": pa.array([thr], pa.int64()),
        })

    thresholds = coalesce_blocks(
        hist.groupby(key).map_groups(per_key, batch_format="pyarrow"))

    joined = hash_join(rows, thresholds, "inner",
                       num_partitions=max(2, rows.num_blocks() // 4),
                       on=(key,), right_on=("gate_key",))
    return joined.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b.column(value_col), b.column("threshold"))).select(
            [id_col, key, value_col, "threshold"]),
        batch_format="pyarrow")
