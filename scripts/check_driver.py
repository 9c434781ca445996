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
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return pa.Table.from_pandas(result.to_pandas(), preserve_index=False)
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    if isinstance(result, pa.Table):
        return result
    raise TypeError(type(result))


def canon(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


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
            theirs = canon(pa.Table.from_pandas(con.execute(sql).fetchdf(),
                                                preserve_index=False))
        except Exception as e:
            print(f"FAIL  {name}: SQL raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok_shape = list(ours.columns) == list(theirs.columns) and \
            len(ours) == len(theirs)
        ok_vals = ok_shape and ours.equals(theirs)
        if not ok_vals and ok_shape:
            # dtype-insensitive retry (int32 vs int64 etc.)
            try:
                ok_vals = all(
                    (ours[c].astype("float64").round(6) ==
                     theirs[c].astype("float64").round(6)).all()
                    if pd.api.types.is_numeric_dtype(ours[c])
                    else (ours[c].astype(str) == theirs[c].astype(str)).all()
                    for c in ours.columns)
            except Exception:
                ok_vals = False
        if ok_vals:
            print(f"PASS  {name}: {len(ours)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: ours {ours.shape} cols={list(ours.columns)} "
                  f"vs sql {theirs.shape} cols={list(theirs.columns)}")
            if ok_shape:
                diff = ours.compare(theirs) if ours.shape == theirs.shape else None
                if diff is not None and len(diff):
                    print(diff.head(10))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
