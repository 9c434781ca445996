"""Deterministic dense doc_id assignment.

The reference keys documents by BIGSERIAL id assigned at insert time
(/root/reference/alembic/versions/0001_initial_schema.py:31-51); ours must be
reproducible across runs and independent of Ray block layout (SURVEY.md §1.4,
hard part #2).  Scheme:

  doc_id = conv_base_offset[conv_id] + turn_idx

where conv_base_offset is the exclusive prefix sum of per-conversation turn
counts in lexicographic conv_id order.  This relies on the contractual
invariant that turn_idx is 0-based contiguous per conversation (FIXTURES.md
F4.2), which this stage VALIDATES during the same aggregation pass.

Properties: dense 0..N-1; doc_id ascending == (conv_id, turn_idx) ascending,
so tie-breaking by doc_id is identical to tie-breaking by the natural doc key
(the reference's ``url ASC``); stable under any parallelism.

Scale notes: the wide step is a conv_id groupby over a two-column projection
with in-batch pre-aggregation (turns/conv partial counts), so the shuffle
moves one row per (batch, conv) — not per turn.  The conv -> offset map is
broadcast via ``ray.put`` once and read by every task.  Beyond
``cfg.max_broadcast_convs`` conversations the map no longer fits a broadcast;
the scale path is a hash join of the offsets Dataset against the input on
conv_id (same math, no driver state) — not needed at sandbox scale but the
cutover is guarded explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


class BroadcastCapExceeded(RuntimeError):
    """Conversation count exceeds the conv-offset broadcast cap; the caller
    must switch to the distributed-join assigner (assign_doc_ids_join)."""

    def __init__(self, n: int):
        super().__init__(f"{n} conversation partials exceed the broadcast cap")
        self.n = n


def _conv_partials(batch: pa.Table) -> pa.Table:
    agg = pa.TableGroupBy(batch, "conv_id").aggregate([
        ("turn_idx", "count"), ("turn_idx", "min"), ("turn_idx", "max")])
    return pa.table({
        "conv_id": agg.column("conv_id"),
        "cnt": agg.column("turn_idx_count").cast(pa.int64()),
        "min_t": agg.column("turn_idx_min").cast(pa.int64()),
        "max_t": agg.column("turn_idx_max").cast(pa.int64()),
    })


def _merged_conv_stats(ds: "ray.data.Dataset", max_broadcast_convs: int
                       ) -> pa.Table | None:
    """Sorted, contiguity-validated (conv_id, cnt_sum) driver-side merge of
    the distributed per-batch partials; None for an empty input.

    Partial rows number ~one per (batch, conv) — tiny next to turns; the
    merge is Arrow kernels only (no shuffle, no Python row loop).  Beyond
    the broadcast cap the whole assigner switches to the distributed-join
    variant, so driver merge and broadcast share a cutover."""
    import pyarrow.compute as pc
    partials = ds.select_columns(["conv_id", "turn_idx"]).map_batches(
        _conv_partials, batch_format="pyarrow")
    chunks = []
    seen_convs = 0
    for b in partials.iter_batches(batch_format="pyarrow"):
        if not len(b):
            continue
        chunks.append(b)
        seen_convs += len(b)
        # bail BEFORE driver memory grows past the cap (partial rows are an
        # overcount of distinct convs, so this errs on the early side)
        if seen_convs > max_broadcast_convs * 4:
            raise BroadcastCapExceeded(seen_convs)
    if not chunks:
        return None
    merged = pa.TableGroupBy(pa.concat_tables(chunks), "conv_id").aggregate(
        [("cnt", "sum"), ("min_t", "min"), ("max_t", "max")])
    if merged.num_rows > max_broadcast_convs:
        raise BroadcastCapExceeded(merged.num_rows)
    order = pc.sort_indices(merged.column("conv_id"))
    merged = merged.take(order)
    cnt = merged.column("cnt_sum").to_numpy(zero_copy_only=False)
    mn = merged.column("min_t_min").to_numpy(zero_copy_only=False)
    mx = merged.column("max_t_max").to_numpy(zero_copy_only=False)
    bad = np.flatnonzero((mn != 0) | (mx != cnt - 1))
    if len(bad):
        i = int(bad[0])
        conv = merged.column("conv_id")[i].as_py()
        raise ValueError(
            f"conv {conv!r}: turn_idx not contiguous from 0 "
            f"(count={int(cnt[i])}, min={int(mn[i])}, max={int(mx[i])}) — "
            "stable-turn-ordering invariant violated")
    return merged


def conv_offsets(ds: "ray.data.Dataset", *, max_broadcast_convs: int = 5_000_000
                 ) -> tuple[dict[str, int], int]:
    """conv_id -> exclusive base offset, plus total turn count N.

    Validates turn contiguity (min==0, max==cnt-1) for every conversation."""
    merged = _merged_conv_stats(ds, max_broadcast_convs)
    if merged is None:
        return {}, 0
    cnt = merged.column("cnt_sum").to_numpy(zero_copy_only=False)
    bases = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    offsets = dict(zip(merged.column("conv_id").to_pylist(),
                       bases.tolist()))
    return offsets, int(cnt.sum())


def conv_offsets_arrays(ds: "ray.data.Dataset", *,
                        max_broadcast_convs: int = 5_000_000
                        ) -> tuple[tuple[np.ndarray, np.ndarray], int]:
    """Array form of ``conv_offsets``: ((sorted conv_id array, base array), N).

    Broadcasting two numpy arrays instead of a python dict makes the
    ``ray.put`` a memcpy and the per-actor ``ray.get`` near-zero-copy — at
    ~1M+ conversations the dict pickle/unpickle costs seconds per actor and
    is pure serial ramp-up time.  The conv array uses object dtype (direct
    Arrow ``to_numpy``, ~25x cheaper to build than a fixed-width ``np.str_``
    copy at ~1M convs; searchsorted stays O(log n) C-level either way).
    Same validation as ``conv_offsets``."""
    merged = _merged_conv_stats(ds, max_broadcast_convs)
    if merged is None:
        return (np.zeros(0, dtype=object), np.zeros(0, dtype=np.int64)), 0
    cnt = merged.column("cnt_sum").to_numpy(zero_copy_only=False)
    bases = np.concatenate(([0], np.cumsum(cnt)[:-1])).astype(np.int64)
    convs = merged.column("conv_id").to_numpy(zero_copy_only=False)
    return (convs, bases), int(cnt.sum())


class _AddDocId:
    """Actor-pool batch fn: doc_id = offsets[conv_id] + turn_idx.

    The offsets broadcast is fetched from the object store once per actor
    (``ray.get`` of a ``ray.put`` handle in __init__), never re-shipped per
    batch.  Accepts either the legacy dict or the (sorted conv array, base
    array) pair from ``conv_offsets_arrays`` (searchsorted lookup)."""

    def __init__(self, offsets_ref):
        off = ray.get(offsets_ref) if isinstance(
            offsets_ref, ray.ObjectRef) else offsets_ref
        if isinstance(off, tuple):
            self._convs, self._bases = off
            self._offsets = None
        else:
            self._offsets = off
            self._convs = self._bases = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        # dictionary-encode: one lookup per DISTINCT conv in the batch,
        # then a vectorized gather for the per-row offsets
        conv_col = batch.column("conv_id").combine_chunks().dictionary_encode()
        uniques = conv_col.dictionary.to_pylist()
        if self._offsets is not None:
            base = np.asarray([self._offsets[c] for c in uniques],
                              dtype=np.int64)
        else:
            want = np.asarray(uniques, dtype=self._convs.dtype)
            pos = np.searchsorted(self._convs, want)
            pos = np.minimum(pos, max(len(self._convs) - 1, 0))
            if len(self._convs) == 0 or (self._convs[pos] != want).any():
                missing = [u for p, u in zip(pos, uniques)
                           if len(self._convs) == 0 or self._convs[p] != u]
                raise KeyError(f"conv_ids not in offset map: {missing[:3]}")
            base = self._bases[pos]
        idx = conv_col.indices.to_numpy(zero_copy_only=False)
        turn = batch.column("turn_idx").to_numpy(zero_copy_only=False)
        doc_id = base[idx] + turn.astype(np.int64)
        return batch.append_column("doc_id", pa.array(doc_id, pa.int64()))


def add_doc_ids_with_offsets(ds: "ray.data.Dataset", offsets_ref, *,
                             concurrency: int | None = None
                             ) -> "ray.data.Dataset":
    """Apply a precomputed conv-offset broadcast (lets two consumers of the
    same source share one counting pass)."""
    from ..util import default_pool_max
    return ds.map_batches(
        _AddDocId,
        fn_constructor_args=(offsets_ref,),
        batch_format="pyarrow",
        concurrency=(1, concurrency or default_pool_max()),
    )


def conv_offsets_dataset(ds: "ray.data.Dataset"
                         ) -> tuple["ray.data.Dataset", int]:
    """Distributed conv-offset computation: (conv_id, base) Dataset + N.

    Same math as ``conv_offsets`` with no driver-held conv map:
      1. per-batch partials -> groupby(conv_id) merge (distributed);
         contiguity validated per conv row inside the aggregate's consumers;
      2. sort by conv_id -> ordered blocks;
      3. two-phase distributed prefix sum: per-block turn totals (one number
         per block reaches the driver), exclusive prefix over block totals,
         then a per-block task adds the block base to the within-block
         exclusive cumsum.
    Raw ray tasks are used only for step 3 — Dataset API has no prefix-sum."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    partials = ds.select_columns(["conv_id", "turn_idx"]).map_batches(
        _conv_partials, batch_format="pyarrow")
    merged = partials.groupby("conv_id").aggregate(
        Sum("cnt"), Min("min_t"), Max("max_t"))

    def validate(batch: pa.Table) -> pa.Table:
        cnt = batch.column("sum(cnt)").to_numpy(zero_copy_only=False)
        mn = batch.column("min(min_t)").to_numpy(zero_copy_only=False)
        mx = batch.column("max(max_t)").to_numpy(zero_copy_only=False)
        bad = np.flatnonzero((mn != 0) | (mx != cnt - 1))
        if len(bad):
            i = int(bad[0])
            conv = batch.column("conv_id")[i].as_py()
            raise ValueError(
                f"conv {conv!r}: turn_idx not contiguous from 0 "
                f"(count={int(cnt[i])}, min={int(mn[i])}, max={int(mx[i])}) "
                "— stable-turn-ordering invariant violated")
        return pa.table({"conv_id": batch.column("conv_id"),
                         "cnt": batch.column("sum(cnt)")})

    stats = merged.map_batches(validate, batch_format="pyarrow").sort(
        "conv_id").materialize()
    refs = stats.to_arrow_refs()     # ordered blocks of a sorted dataset

    @ray.remote
    def block_total(t) -> int:
        t = pa.Table.from_batches([t]) if isinstance(t, pa.RecordBatch) else t
        s = pc.sum(t.column("cnt")).as_py()
        return int(s) if s is not None else 0

    totals = ray.get([block_total.remote(r) for r in refs])
    bases = np.concatenate(([0], np.cumsum(totals)[:-1])).astype(np.int64)

    @ray.remote
    def with_base(t, base: int) -> pa.Table:
        t = pa.Table.from_batches([t]) if isinstance(t, pa.RecordBatch) else t
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        excl = np.concatenate(([0], np.cumsum(cnt)[:-1])).astype(np.int64)
        return pa.table({"conv_id": t.column("conv_id"),
                         "base": pa.array(excl + base, pa.int64())})

    offset_refs = [with_base.remote(r, int(b)) for r, b in zip(refs, bases)]
    return ray.data.from_arrow_refs(offset_refs), int(sum(totals))


def add_doc_ids_join(ds: "ray.data.Dataset",
                     offsets_ds: "ray.data.Dataset", *,
                     n: int, num_partitions: int | None = None
                     ) -> "ray.data.Dataset":
    """Hash-join a precomputed (conv_id, base) offsets Dataset onto ``ds``
    and derive doc_id = base + turn_idx — the no-broadcast building block
    shared by ``assign_doc_ids_join`` and ``build_index``'s join-mode
    fallback (several consumers can join against one materialized offsets
    Dataset without recomputing the counting pass).

    ``num_partitions`` defaults to ~1 per million turns (each hash-join
    partition is an aggregator ACTOR; at 10^12 turns you want thousands, at
    fixture scale 64 of them would starve a 4-CPU box)."""
    if num_partitions is None:
        num_partitions = max(2, min(1024, n // 1_000_000))
    from ..util import hash_join
    joined = hash_join(ds, offsets_ds, "inner", num_partitions,
                       on=("conv_id",))

    def add_id(batch: pa.Table) -> pa.Table:
        doc_id = pa.array(
            batch.column("base").to_numpy(zero_copy_only=False)
            + batch.column("turn_idx").to_numpy(
                zero_copy_only=False).astype(np.int64), pa.int64())
        return batch.drop_columns(["base"]).append_column("doc_id", doc_id)

    return joined.map_batches(add_id, batch_format="pyarrow")


def assign_doc_ids_join(ds: "ray.data.Dataset", *,
                        num_partitions: int | None = None,
                        conv_stats_source: "ray.data.Dataset | None" = None
                        ) -> tuple["ray.data.Dataset", int]:
    """Distributed-join doc_id assigner: no driver conv map, no broadcast —
    the scale path beyond ``max_broadcast_convs`` (module docstring).  The
    conv-offset Dataset is hash-joined onto the input on conv_id and
    doc_id = base + turn_idx.  Property-tested id-identical to the broadcast
    path."""
    offsets_ds, n = conv_offsets_dataset(conv_stats_source or ds)
    return add_doc_ids_join(ds, offsets_ds, n=n,
                            num_partitions=num_partitions), n


def assign_doc_ids(ds: "ray.data.Dataset", *,
                   max_broadcast_convs: int = 5_000_000,
                   concurrency: int | None = None,
                   conv_stats_source: "ray.data.Dataset | None" = None
                   ) -> tuple["ray.data.Dataset", int]:
    """Append a deterministic dense ``doc_id`` column; returns (ds, N).

    Uses the broadcast assigner up to ``max_broadcast_convs`` conversations,
    then cuts over to the distributed-join assigner (assign_doc_ids_join).

    ``conv_stats_source`` lets the caller supply a column-pruned read of the
    same table for the counting pass (Ray doesn't push ``select_columns``
    into an already-constructed parquet read, so a fresh
    ``read_parquet(path, columns=["conv_id", "turn_idx"])`` is ~5x faster)."""
    try:
        offsets, n = conv_offsets(conv_stats_source or ds,
                                  max_broadcast_convs=max_broadcast_convs)
    except BroadcastCapExceeded:
        return assign_doc_ids_join(ds, conv_stats_source=conv_stats_source)
    ref = ray.put(offsets)
    # elastic (1, k) pool: a fixed-size pool equal to the CPU count reserves
    # every core and starves downstream task operators (observed deadlock);
    # the executor can always make progress with one actor
    from ..util import default_pool_max
    out = ds.map_batches(
        _AddDocId,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, concurrency or default_pool_max()),
    )
    return out, n
