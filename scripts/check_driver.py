"""Local emulation of the driver's correctness gate: run every queries()
entry and compare against oracle_sql() via DuckDB (row count + schema +
order-insensitive values).  Usage:

    python scripts/check_driver.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_arrow(result) -> pa.Table:
    import ray
    import ray.data
    if isinstance(result, ray.data.Dataset):
        # keep Arrow dtypes (to_pandas would coerce timestamps to ns etc.)
        tables = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
                  else b for b in ray.get(result.to_arrow_refs())]
        tables = [t for t in tables if t.num_rows] or tables[:1]
        return pa.concat_tables(tables, promote_options="default")
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    if isinstance(result, pa.Table):
        return result
    raise TypeError(type(result))


def canon(t: pa.Table) -> pa.Table:
    """Name-sorted columns, row-sorted — dtype-preserving (Arrow, not pandas)
    so the compare sees exactly what the driver's value-hash sees.  Nested
    (list) columns can't key an Arrow sort; rows sort by the scalar columns
    (unique in every mirrored query)."""
    t = t.combine_chunks().select(sorted(t.column_names))
    keys = [c for c in t.column_names
            if not pa.types.is_nested(t.schema.field(c).type)]
    if t.num_rows and keys:
        t = t.sort_by([(c, "ascending") for c in keys])
    return t


def main() -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{tbl}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = canon(to_arrow(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: pipeline raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(ours)} rows ({dt:.1f}s, no SQL oracle)")
            n_rows_only += 1
            continue
        try:
            theirs = canon(con.execute(sql).arrow())
        except Exception as e:
            print(f"FAIL  {name}: SQL raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        # NO lenient retry: dtypes and values must match exactly, like the
        # driver's value-hash over name-sorted columns.
        ok_shape = (ours.column_names == theirs.column_names
                    and ours.num_rows == theirs.num_rows)
        ok_schema = ok_shape and ours.schema.types == theirs.schema.types
        ok_vals = ok_schema and ours.equals(theirs)
        if ok_vals:
            print(f"PASS  {name}: {ours.num_rows} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: ours rows={ours.num_rows} "
                  f"schema={[(f.name, str(f.type)) for f in ours.schema]}")
            print(f"      sql  rows={theirs.num_rows} "
                  f"schema={[(f.name, str(f.type)) for f in theirs.schema]}")
            if ok_schema:
                a, b = ours.to_pandas(), theirs.to_pandas()
                diff = a.compare(b)
                if len(diff):
                    print(diff.head(10))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


def main_chunked(chunk: int = 25) -> int:
    """Full sweep partitioned across FRESH processes, ``chunk`` entries
    each.  Long single sessions (hundreds of dataset executions) can die
    on a Ray-core native bug (reference_count.cc RAY_CHECK, observed in
    rounds 3 and 4 around entry ~50-80 of a 100-entry session); chunking
    bounds the blast radius so one native crash costs one chunk re-run,
    not the sweep.  The external driver checks ~50 entries per session, so
    this mode is for the repo's own 100+-entry gate."""
    import subprocess

    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import __ray_entry__ as entry
    names = list(entry.queries())
    total_pass = total_rows = total_fail = 0
    for i in range(0, len(names), chunk):
        part = names[i:i + chunk]
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, *part],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for line in r.stdout.splitlines():
            if line.startswith(("PASS", "FAIL", "rows")):
                print(line, flush=True)
        import re
        m = re.search(r"(\d+) pass, (\d+) rows-only, (\d+) fail", r.stdout)
        if m:
            total_pass += int(m.group(1))
            total_rows += int(m.group(2))
            total_fail += int(m.group(3))
        else:
            # Chunk died mid-run (native crash): credit the PASS/FAIL lines
            # it already printed and count only the unreported remainder as
            # failures, so the TOTAL agrees with the per-entry lines above.
            seen_pass = sum(1 for ln in r.stdout.splitlines()
                            if ln.startswith("PASS"))
            seen_rows = sum(1 for ln in r.stdout.splitlines()
                            if ln.startswith("rows"))
            seen_fail = sum(1 for ln in r.stdout.splitlines()
                            if ln.startswith("FAIL"))
            unreported = len(part) - seen_pass - seen_rows - seen_fail
            print(f"CHUNK {i // chunk} died (rc={r.returncode}) — "
                  f"entries {part[0]}..{part[-1]}; {seen_pass} pass/"
                  f"{seen_rows} rows-only/{seen_fail} fail already printed, "
                  f"{unreported} unreported counted as fail; stderr tail:",
                  flush=True)
            print("\n".join(r.stderr.splitlines()[-3:]), flush=True)
            total_pass += seen_pass
            total_rows += seen_rows
            total_fail += seen_fail + max(0, unreported)
    print(f"\nTOTAL: {total_pass} pass, {total_rows} rows-only, "
          f"{total_fail} fail of {len(names)}")
    return 1 if total_fail else 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--chunked":
        sys.exit(main_chunked())
    sys.exit(main())
