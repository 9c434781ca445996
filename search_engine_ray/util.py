"""Small runtime helpers."""

from __future__ import annotations


def default_pool_max(cap: int = 64) -> int:
    """Upper bound for elastic (1, k) actor pools: the cluster CPU count
    (pools stay elastic, so oversizing only sets a ceiling — the streaming
    executor still shares cores with task operators)."""
    try:
        import ray
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
            return max(1, min(cap, cpus))
    except Exception:
        pass
    return 8


def hash_join(left, right, join_type: str, num_partitions: int, **kwargs):
    """``Dataset.join`` with a bounded aggregator CPU reservation.

    Ray 2.49's join op reserves ``min(1, (CPU/2)/num_partitions)`` CPUs per
    aggregator actor (join.py:196, hash_shuffle.py:1007-1020).  With the
    default sizing, ONE join's pool can reserve half the cluster, and two
    concurrent joins (e.g. the chained pair⋈text_a⋈text_b verify join, or a
    join running beside another entry's groupby) can reserve the ENTIRE CPU
    budget at low cluster sizes — upstream map tasks then never schedule and
    the streaming executor deadlocks (observed as the rare sf0.001 sweep
    stall at num_cpus=8).

    The deadlock anatomy (reproduced live, 3-round 4-cpu stress): aggregator
    actors are plain ``.remote()`` actors OUTSIDE the streaming executor's
    per-operator resource accounting, so their reservation silently shrinks
    the budget the executor plans against.  A pipeline with two running
    actor pools (2x1 CPU) plus a dispatched read task (1 CPU) needs the 4th
    CPU for the NEXT pool's min-size actor; the read's streaming generator
    is paused pending that downstream pool's capacity, so its CPU never
    frees — any aggregator fraction then makes first-actor placement
    impossible and the execution hangs (self-heals only if an idle pool
    actor times out ~10 min later).  At sandbox-sized clusters (<= 8 CPUs)
    aggregators therefore reserve ZERO CPUs — num_cpus is a scheduling
    reservation, not a cgroup, so this costs nothing when the cluster is
    otherwise idle; at real cluster sizes the pool keeps a proportional
    reservation (~25% of CPUs) so placement pressure still spreads
    aggregators across nodes."""
    if "aggregator_ray_remote_args" not in kwargs:
        cpus = None
        try:
            import ray
            if not ray.is_initialized():
                # The join would auto-init Ray anyway; doing the (guarded)
                # init here first means the aggregator sizing below always
                # sees the REAL cluster size — so the <=8-CPU deadlock fix
                # applies on library-use paths too, not only when a driver
                # pre-initialized Ray.
                ray.init(ignore_reinit_error=True,
                         include_dashboard=False, logging_level="error")
            cpus = float(ray.cluster_resources().get("CPU", 0)) or None
        except Exception:
            pass
        if cpus is not None:
            n_agg = max(1, min(num_partitions, 64))
            per = 0.0 if cpus <= 8 \
                else min(1.0, max(0.05, (cpus / 4.0) / n_agg))
            kwargs["aggregator_ray_remote_args"] = {
                "num_cpus": per, "scheduling_strategy": "SPREAD"}
    return left.join(right, join_type, num_partitions, **kwargs)


def force_schema(schema, sentinel: str):
    """``map_batches`` fn pinning blocks to ``schema``: blocks that are
    empty or missing the ``sentinel`` column (Ray's sort-based aggregates
    can emit empty blocks with an EMPTY schema) become properly-schema'd
    empty tables; real blocks are column-selected and cast.  Use on
    aggregate-derived datasets BEFORE they feed a ``Dataset.join`` — and
    note the stronger guarantee of :func:`coalesce_blocks` when the
    schema-less block could be the join input's FIRST bundle (schema-less
    blocks skip ``map_batches`` entirely)."""
    def fn(b):
        if b.num_rows == 0 or sentinel not in b.column_names:
            return schema.empty_table()
        return b.select(schema.names).cast(schema)
    return fn


def read_parquet_clean(path, **kwargs):
    """``ray.data.read_parquet`` with the file's schema METADATA stripped.

    The driver testdata parquet carries a ``b'pandas'`` schema-metadata
    entry whose decoded form is a dict, which makes ``pa.Schema``
    unhashable — Ray Data's block-schema dedup then logs ``Failed to hash
    the schemas (for deduplication)`` from inside every read task.  Passing
    an explicit metadata-free schema removes the noise at the source (and
    costs one footer read on the driver)."""
    import ray.data

    if "schema" not in kwargs:
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq
            s = pq.read_schema(path).remove_metadata()
            cols = kwargs.get("columns")
            if cols is not None:      # match the reader's projected schema
                s = pa.schema([s.field(c) for c in cols])
            kwargs["schema"] = s
        except Exception:
            pass                      # directories/unreadable: Ray infers
    return ray.data.read_parquet(path, **kwargs)


def coalesce_blocks(ds, target_rows: int = 262_144):
    """Merge a Dataset's blocks to ~``target_rows`` rows each, ELIMINATING
    empty blocks.

    Primary job here is CORRECTNESS, not block sizing: Ray 2.49's
    groupby/aggregate emits EMPTY blocks with an EMPTY schema (observed as
    ``Operator produced a RefBundle with a different schema … new
    schema: .`` warnings).  Those schema-less blocks pass through
    ``map_batches`` UNCALLED, and the hash-join operator broadcasts the
    FIRST bundle's schema to its aggregators (hash_shuffle.py:545-589) — a
    schema-less first bundle therefore poisons every join partition that
    receives no real rows, dying with ``ArrowInvalid: No match or multiple
    matches for key field reference`` (flaky: depends on bundle arrival
    order).  Only ``repartition(num_blocks=…)`` rebuilds/merges blocks
    (``target_num_rows_per_block`` mode SPLITS but never merges, so empty
    blocks survive it), hence: materialize, size the block count from the
    now-free row count, merge.  Apply to every aggregate-derived Dataset
    that feeds a ``Dataset.join``."""
    m = ds.materialize()
    n = m.count()                      # metadata-only on a materialized ds
    nblocks = max(1, min(1000, -(-n // target_rows)))
    return m.repartition(nblocks)
