"""Temporal join operators Ray Data lacks natively: as-of join and range
join, built as compositions of keyed groupby + vectorized in-group kernels
(the partitioning assumption each relies on is documented per op).

Both stay shuffle-minimal: ONE hash exchange keyed by the entity id (user /
customer), with all temporal logic vectorized (numpy searchsorted /
forward-fill) inside the group — no sort of the whole dataset, no
driver-side iteration.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

US_PER_DAY = 86_400_000_000


def asof_prior_event(events: "ray.data.Dataset", *,
                     left_type: str = "click",
                     right_type: str = "view") -> "ray.data.Dataset":
    """Backward as-of self-join: for every ``left_type`` event, the most
    recent ``right_type`` event of the SAME user strictly earlier in
    (ts, event_id) order — i.e. ``last(view IGNORE NULLS) OVER (PARTITION BY
    user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING)``, with the (ts, event_id) tie-break making the match
    deterministic even on equal timestamps.

    Partitioning assumption: one user's events fit one group (true whenever
    per-entity history is bounded — salt the user key if not).

    Output: (event_id, user_id, prior_event_id, gap_seconds) for left-type
    events; prior_* null when no earlier right-type event exists."""

    def per_user(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "ascending"),
                                                ("event_id", "ascending")])
        g = group.take(idx)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        types = g.column("event_type").to_pylist()
        n = len(eid)

        # forward-fill the index of the last right-type row STRICTLY before
        # each position (shift by one so row i only sees rows < i)
        is_right = np.fromiter((t == right_type for t in types),
                               dtype=bool, count=n)
        right_idx = np.where(is_right, np.arange(n), -1)
        ffill = np.maximum.accumulate(right_idx)
        prior = np.concatenate(([-1], ffill[:-1]))

        is_left = np.fromiter((t == left_type for t in types),
                              dtype=bool, count=n)
        li = np.flatnonzero(is_left)
        pi = prior[li]
        has = pi >= 0
        prior_ids = np.where(has, eid[np.maximum(pi, 0)], 0)
        gaps = np.where(has, (ts[li] - ts[np.maximum(pi, 0)]) / 1e6, 0.0)
        return pa.table({
            "event_id": pa.array(eid[li], pa.int64()),
            "user_id": pa.array(
                np.repeat(g.column("user_id")[0].as_py(), len(li)),
                pa.int64()),
            "prior_event_id": pa.array(
                [int(x) if h else None for x, h in zip(prior_ids, has)],
                pa.int64()),
            "gap_seconds": pa.array(
                [round(float(x), 6) if h else None
                 for x, h in zip(gaps, has)], pa.float64()),
        })

    return events.select_columns(
        ["event_id", "ts", "user_id", "event_type"]).groupby(
        "user_id").map_groups(per_user, batch_format="pyarrow")


def range_join_counts(right: "ray.data.Dataset",
                      left: "ray.data.Dataset", *,
                      window_us: int = US_PER_DAY) -> "ray.data.Dataset":
    """Range join: per LEFT row, the count and value-sum of RIGHT rows with
    the same key and ``start <= ts < start + window_us`` — inner semantics
    (left rows with zero in-window matches are absent).

    Inputs are pre-projected: ``left`` has (key, id, start) and ``right``
    has (key, ts, val) — int64 microsecond timestamps, int64 val.

    Distributed shape: right rows carry their time bucket (window-sized
    bins); each left row is REPLICATED into the two buckets its window can
    overlap, so one (key, bucket) hash exchange co-locates every candidate
    pair; the precise range filter and the per-left partial aggregate run
    vectorized (searchsorted + prefix sums) inside the group, and a final
    tiny groupby(id) folds the <=2 bucket partials."""
    from ray.data.aggregate import Sum

    def r_prep(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64())
        return pa.table({
            "k": b.column("key"),
            "bkt": pc.divide(ts, window_us),
            "r_ts": ts,
            "val": b.column("val").cast(pa.int64()),
            "is_right": pa.array(np.ones(b.num_rows, dtype=bool)),
            "id": pa.nulls(b.num_rows, pa.int64()),
            "start": pa.nulls(b.num_rows, pa.int64()),
        })

    def l_prep(b: pa.Table) -> pa.Table:
        start = b.column("start").cast(pa.int64())
        b0 = pc.divide(start, window_us)
        out = []
        for shift in (0, 1):
            out.append(pa.table({
                "k": b.column("key"),
                "bkt": pc.add(b0, shift),
                "r_ts": pa.nulls(b.num_rows, pa.int64()),
                "val": pa.nulls(b.num_rows, pa.int64()),
                "is_right": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "id": b.column("id"),
                "start": start,
            }))
        return pa.concat_tables(out)

    both = right.map_batches(r_prep, batch_format="pyarrow").union(
        left.map_batches(l_prep, batch_format="pyarrow"))

    def per_group(group: pa.Table) -> pa.Table:
        is_r = group.column("is_right").to_numpy(zero_copy_only=False)
        rr = group.filter(pa.array(is_r))
        ll = group.filter(pa.array(~is_r))
        if rr.num_rows == 0 or ll.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        raw_ts = rr.column("r_ts").to_numpy(zero_copy_only=False)
        order_idx = np.argsort(raw_ts, kind="stable")
        ts = raw_ts[order_idx]
        vals = rr.column("val").to_numpy(zero_copy_only=False)[order_idx]
        vcum = np.concatenate(([0], np.cumsum(vals)))
        starts = ll.column("start").to_numpy(zero_copy_only=False)
        ids = ll.column("id").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(ts, starts, side="left")
        hi = np.searchsorted(ts, starts + window_us, side="left")
        n = (hi - lo).astype(np.int64)
        keep = n > 0
        return pa.table({
            "id": pa.array(ids[keep], pa.int64()),
            "n": pa.array(n[keep], pa.int64()),
            "val": pa.array((vcum[hi] - vcum[lo])[keep], pa.int64()),
        })

    partials = both.groupby(["k", "bkt"]).map_groups(
        per_group, batch_format="pyarrow")
    return partials.groupby("id").aggregate(
        Sum("n"), Sum("val")).map_batches(
        lambda b: pa.table({
            "id": b.column("id"),
            "n_matches": b.column("sum(n)"),
            "sum_val": b.column("sum(val)"),
        }), batch_format="pyarrow")


def hopping_window_counts(events: "ray.data.Dataset", *,
                          width_us: int = 3_600_000_000,
                          hop_us: int = 900_000_000) -> "ray.data.Dataset":
    """Hopping (sliding) window aggregate: windows of ``width_us`` starting
    every ``hop_us`` (width must be a multiple of hop); every event lands in
    exactly width/hop windows.  Output (window_start, event_type, n_events,
    sum_value_cents) — the overlapping-window generalization of the tumbling
    events_window pipeline.

    Distributed shape: replication + in-batch partial aggregation BEFORE the
    exchange — each batch expands events into their covering windows
    vectorized (numpy repeat/tile), combines per (window, type) locally, and
    only the combined partials hit the final tiny groupby-sum."""
    from ray.data.aggregate import Sum

    if width_us % hop_us:
        raise ValueError("width_us must be a multiple of hop_us")
    k = width_us // hop_us

    def expand(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            b.column("value"), 100.0), 0.5)), pa.int64()).to_numpy(
            zero_copy_only=False)
        types = np.asarray(b.column("event_type").to_pylist(), dtype=object)
        base = (ts // hop_us)
        starts = ((np.repeat(base, k)
                   - np.tile(np.arange(k, dtype=np.int64), len(ts)))
                  * hop_us)
        # in-batch combine: factorize types to int codes, fold (window, code)
        # into one collision-free int64 key, aggregate with bincount
        tuniq, tcode = np.unique(types, return_inverse=True)
        rep_code = np.repeat(tcode, k)
        rep_cents = np.repeat(cents, k)
        key = (starts // hop_us) * len(tuniq) + rep_code
        uniq, first, inv = np.unique(key, return_index=True,
                                     return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        c = np.bincount(inv, weights=rep_cents.astype(np.float64),
                        minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "ws": pa.array(starts[first], pa.int64()),
            "event_type": pa.array(
                [str(tuniq[i]) for i in rep_code[first]], pa.string()),
            "n": pa.array(n, pa.int64()),
            "cents": pa.array(c, pa.int64()),
        })

    out = events.select_columns(["ts", "event_type", "value"]).map_batches(
        expand, batch_format="pyarrow").groupby(
        ["ws", "event_type"]).aggregate(Sum("n"), Sum("cents"))
    return out.map_batches(
        lambda b: pa.table({
            "window_start": b.column("ws").cast(pa.timestamp("us")),
            "event_type": b.column("event_type"),
            "n_events": b.column("sum(n)"),
            "sum_value_cents": b.column("sum(cents)"),
        }), batch_format="pyarrow")


def schedule_fetch_batch(events: "ray.data.Dataset", *,
                         key: str = "user_id", ts_col: str = "ts",
                         id_col: str = "event_id", max_keys: int = 100,
                         per_key: int = 50) -> "ray.data.Dataset":
    """K4/K6 scheduling caps (reference app/batch/news_fetcher.py:21-23 and
    :207-215): select the ``max_keys`` most-overdue keys -- smallest min(ts),
    the analogue of ``ORDER BY next_fetch_at NULLS FIRST ... LIMIT
    MAX_FEEDS_PER_RUN`` -- then cap each selected key at its ``per_key``
    newest items (MAX_ITEMS_PER_FEED), newest-first by (ts DESC, id ASC).

    Scale shape: key selection is a partial-combined Min aggregate (the
    exchange ships one row per key, the driver sees <= max_keys rows); the
    winner set is broadcast via ray.put and applied as a streaming filter;
    the per-key cap runs as a per-batch partial top-k BEFORE the keyed
    exchange, so the final shuffle moves at most max_keys * per_key rows per
    input batch, never the corpus."""
    import ray

    due = (events.select_columns([key, ts_col])
           .groupby(key).min(ts_col)
           .sort([f"min({ts_col})", key]).limit(max_keys))
    selected = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
         for b in ray.get(due.to_arrow_refs())],
        promote_options="default").column(key).combine_chunks()
    sel_ref = ray.put(selected)

    def _topk(batch: pa.Table) -> pa.Table:
        sel = pa.chunked_array([ray.get(sel_ref)])
        batch = batch.filter(pc.is_in(batch.column(key), value_set=sel))
        if batch.num_rows == 0:
            return batch.select([key, id_col, ts_col])
        keys_np = batch.column(key).to_numpy(zero_copy_only=False)
        ids_np = batch.column(id_col).to_numpy(zero_copy_only=False)
        ts_np = batch.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((ids_np, -ts_np, keys_np))
        sk = keys_np[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        rank = np.arange(len(sk)) - np.repeat(
            starts, np.diff(np.append(starts, len(sk))))
        keep = np.sort(order[rank < per_key])
        return batch.take(pa.array(keep, pa.int64())).select(
            [key, id_col, ts_col])

    def finalize(group: pa.Table) -> pa.Table:
        return _topk(group)

    partial = events.select_columns([key, id_col, ts_col]).map_batches(
        _topk, batch_format="pyarrow")
    return partial.groupby(key).map_groups(finalize, batch_format="pyarrow")


def rolling_user_stats(events: "ray.data.Dataset", *, window: int = 5,
                       key: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id",
                       value_col: str = "value") -> "ray.data.Dataset":
    """Per-key rolling ROWS-window aggregates — the SQL
    ``SUM/MAX/COUNT(...) OVER (PARTITION BY key ORDER BY ts, id ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)`` — as ONE hash exchange keyed by
    ``key`` with the window math fully vectorized inside the group
    (prefix-sum difference for the rolling sum, a max-reduce over ``window``
    shifted copies for the rolling max).  Ray Data has no window-function
    operator; this is the composition pattern for it.

    Values are fixed-point cents (int64) so results are bit-exact and
    order-free — float accumulation order never leaks into the output.

    Partitioning assumption: one key's history fits one group (bounded
    per-entity history; salt the key if a single entity can exceed a block).

    Output: (event_id, user_id, roll_sum_cents, roll_max_cents, roll_cnt),
    one row per input event."""
    k = max(1, int(window))
    int64_min = np.iinfo(np.int64).min

    def per_key(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                                (id_col, "ascending")])
        g = group.take(idx)
        n = g.num_rows
        # repo-wide cents convention (== SQL floor(value*100 + 0.5))
        cents = np.floor(g.column(value_col).to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(cents)))
        pos = np.arange(n, dtype=np.int64)
        lo = np.maximum(pos - k + 1, 0)
        pad = np.concatenate((np.full(k - 1, int64_min, dtype=np.int64),
                              cents))
        roll_max = np.maximum.reduce([pad[i:i + n] for i in range(k)])
        return pa.table({
            id_col: g.column(id_col),
            key: g.column(key),
            "roll_sum_cents": pa.array(cs[pos + 1] - cs[lo], pa.int64()),
            "roll_max_cents": pa.array(roll_max, pa.int64()),
            "roll_cnt": pa.array(pos + 1 - lo, pa.int64()),
        })

    return (events.select_columns([key, id_col, ts_col, value_col])
            .groupby(key).map_groups(per_key, batch_format="pyarrow"))


def funnel_steps(events: "ray.data.Dataset",
                 steps: list[str]) -> "ray.data.Dataset":
    """Ordered-funnel completion per user: how many of ``steps`` each user
    completed IN ORDER, where step ``i+1`` must occur STRICTLY after the
    earliest qualifying occurrence of step ``i`` (the standard
    earliest-completion funnel; strict ``>`` on ``ts`` keeps the result
    deterministic and mirrors the SQL ``min(ts) ... WHERE ts > prev``
    chain).

    One hash exchange keyed by user; the step chain is a vectorized
    searchsorted walk inside each group.

    Partitioning assumption: one user's events fit one group (salt the key
    for pathological entities).

    Output: (user_id, steps_completed) — one row per user with ≥1 event."""
    step_list = list(steps)

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        types = group.column("event_type").to_pylist()
        done = 0
        cur = -(1 << 62)               # earliest prior-step time
        for s in step_list:
            mask = np.fromiter((t == s for t in types), dtype=bool,
                               count=len(types))
            cand = ts[mask]
            cand = cand[cand > cur]
            if len(cand) == 0:
                break
            cur = int(cand.min())
            done += 1
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "steps_completed": pa.array([done], pa.int64()),
        })

    return (events.select_columns(["user_id", "ts", "event_type"])
            .groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow"))


_MONDAY_EPOCH_OFFSET_DAYS = 3      # 1969-12-29 (a Monday) -> 1970-01-01

US_PER_DAY = 86_400_000_000


def retention_matrix(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Weekly cohort retention: users cohorted by the ISO week (Monday
    start) of their first event; for each (cohort_week, week_offset) the
    number of cohort users active in that week.

    Week index = ``(days_since_epoch + 3) // 7`` — integer weeks anchored
    on Monday 1969-12-29, so both sides (numpy here, ``datediff`` in the
    SQL mirror) agree without any timezone/calendar library.

    Two keyed exchanges, both bounded: groupby(user) reduces each user's
    events to their distinct active weeks (≤ weeks-of-history rows per
    user); groupby(cohort_week, week_offset) counts users.  No driver-side
    state.

    Output: (cohort_week, week_offset, n_users)."""

    def to_weeks(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = ts // US_PER_DAY
        return pa.table({
            "user_id": b.column("user_id"),
            "w": pa.array((days + _MONDAY_EPOCH_OFFSET_DAYS) // 7,
                          pa.int64()),
        })

    def per_user(group: pa.Table) -> pa.Table:
        w = np.unique(group.column("w").to_numpy(zero_copy_only=False))
        cw = int(w.min())
        return pa.table({
            "cohort_week": pa.array(np.full(len(w), cw), pa.int64()),
            "week_offset": pa.array(w - cw, pa.int64()),
        })

    from ray.data.aggregate import Count

    from ..util import coalesce_blocks
    weeks = events.select_columns(["user_id", "ts"]).map_batches(
        to_weeks, batch_format="pyarrow")
    per = weeks.groupby("user_id").map_groups(per_user,
                                              batch_format="pyarrow")
    return coalesce_blocks(
        per.groupby(["cohort_week", "week_offset"]).aggregate(
            Count())).map_batches(
        lambda b: pa.table({
            "cohort_week": b.column("cohort_week"),
            "week_offset": b.column("week_offset"),
            "n_users": b.column("count()").cast(pa.int64()),
        }), batch_format="pyarrow")
