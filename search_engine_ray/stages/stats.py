"""Corpus + term statistics stages.

Reference: ``bm25_stats`` job (/root/reference/app/batch/bm25_stats.py) —
N = COUNT(*) of done docs, avgdl = AVG(word_count), per-term df and
idf = LN((N - df + 0.5)/(df + 0.5) + 1), rebuilt truncate-style each cycle.

Ours: df/cf/idf fall out of the SAME groupby that builds posting lists (one
shuffle, not two — SURVEY.md §2.4 A1); corpus constants are a tiny aggregate
over the doc-length rows of the tokenize stream, stored as one small JSON
artifact instead of being denormalized onto every term row.  doc_len here is
the tokenize-stage token count (Σtf), which is what BM25 length normalization
actually needs (SURVEY.md §2.2 M8); the reference's whitespace word_count is
exposed separately by the text-stats stage.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum


def doclens(combined: "ray.data.Dataset") -> "ray.data.Dataset":
    """kind==1 rows -> (doc_id, doc_len)."""
    return combined.filter(expr="kind == 1").map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "doc_len": b.column("tf").cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def corpus_stats(doclen_ds: "ray.data.Dataset") -> dict:
    """{'doc_total': N, 'total_tokens': Σ, 'avgdl': Σ/N} (doc_total defaults
    to 1 if empty, matching bm25_stats.py:13)."""
    agg = doclen_ds.aggregate(Count(), Sum("doc_len"))
    n = int(agg.get("count()", 0) or 0)
    total = int(agg.get("sum(doc_len)", 0) or 0)
    return {
        "doc_total": n if n > 0 else 1,
        "total_tokens": total,
        "avgdl": (total / n) if n > 0 else 0.0,
    }


def write_stats(index_dir: str, stats: dict) -> str:
    os.makedirs(index_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix="stats.", dir=index_dir)
    with os.fdopen(fd, "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True)
    path = os.path.join(index_dir, "stats.json")
    os.replace(tmp, path)
    return path


def read_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def column_percentiles(ds: "ray.data.Dataset", *, key: str, col: str,
                       qs: tuple[float, ...] = (0.5, 0.9, 0.99)
                       ) -> "ray.data.Dataset":
    """Exact per-key linear-interpolated percentiles of ``col`` (numpy
    'linear' == SQL ``quantile_cont``), plus the group count.  One keyed
    exchange; the group's values are sorted once in numpy.  Exact
    percentiles need the whole group co-resident — for heavy-hitter keys at
    100 TB, swap in a t-digest/KLL sketch combiner; for the bounded
    per-entity groups here (and the reference's per-type analytics), the
    exact path is the right cost."""
    import numpy as np

    def pct(group: pa.Table) -> pa.Table:
        v = group.column(col).to_numpy(zero_copy_only=False)
        out = {key: pa.array([group.column(key)[0].as_py()]),
               "n": pa.array([len(v)], pa.int64())}
        for q in qs:
            out[f"p{int(q * 100)}"] = pa.array(
                [round(float(np.percentile(v, q * 100, method="linear")), 6)],
                pa.float64())
        return pa.table(out)

    return ds.select_columns([key, col]).groupby(key).map_groups(
        pct, batch_format="pyarrow")


# -- HyperLogLog sketch ------------------------------------------------------

HLL_BITS = 10                      # 2^10 = 1024 registers per key


def _bit_length_u64(x: "np.ndarray") -> "np.ndarray":
    """Exact vectorized bit_length for uint64 (no float log — values above
    2^53 would misround)."""
    import numpy as np
    x = x.astype(np.uint64, copy=True)
    out = np.zeros(len(x), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (x >> np.uint64(shift)) > 0
        out[mask] += shift
        x[mask] >>= np.uint64(shift)
    out[x > 0] += 1
    return out


def hll_registers(ds: "ray.data.Dataset", *, key: str, value_col: str,
                  b: int = HLL_BITS) -> "ray.data.Dataset":
    """HyperLogLog registers per key: (key, bucket, rho) with bucket = top
    ``b`` bits of md5_hash64(str(value)) and rho = leading-zero count of the
    remaining 64-b bits + 1 (register value = max rho).

    The classic streaming-cardinality sketch expressed Ray-Data-first:
    per-batch partial max per (key, bucket) BEFORE the exchange, then one
    tiny groupby-max over at most keys x 2^b rows — constant state per key
    regardless of input size, mergeable across shards (max is associative).
    md5 base hash == DuckDB ``md5_number_lower`` and rho is integer-exact
    (binary bit length, no float log), so the register table — not a float
    estimate — is the SQL-mirrorable surface."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Max

    from ..functions.hashing import md5_hash64_column

    low_bits = 64 - b

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_pylist()
        h = md5_hash64_column([str(v) for v in vals])
        bucket = (h >> np.uint64(low_bits)).astype(np.int64)
        low = h & np.uint64((1 << low_bits) - 1)
        bl = _bit_length_u64(low)
        rho = np.where(low == 0, low_bits + 1, low_bits - bl + 1).astype(
            np.int64)
        t = pa.table({key: batch.column(key),
                      "bucket": pa.array(bucket),
                      "rho": pa.array(rho)})
        # in-batch combine: one row per (key, bucket).  Select/rename BY
        # NAME — pyarrow group-by column order (keys-first vs agg-first)
        # has differed across releases, and a positional rename would
        # silently relabel the columns
        g = pa.TableGroupBy(t, [key, "bucket"]).aggregate([("rho", "max")])
        return pa.table({key: g.column(key),
                         "bucket": g.column("bucket"),
                         "rho": g.column("rho_max")})

    out = ds.select_columns([key, value_col]).map_batches(
        partial, batch_format="pyarrow").groupby(
        [key, "bucket"]).aggregate(Max("rho"))
    return out.map_batches(
        lambda t: pa.table({key: t.column(key),
                            "bucket": t.column("bucket"),
                            "rho": t.column("max(rho)")}),
        batch_format="pyarrow")


def hll_estimate(registers: "pa.Table", *, key: str,
                 b: int = HLL_BITS) -> dict:
    """{key_value: estimated distinct count} from a register table — the
    published HLL estimator (Flajolet et al. 2007): alpha_m * m^2 /
    sum(2^-M_j) with the small-range linear-counting correction."""
    import math
    from collections import defaultdict

    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs: dict = defaultdict(dict)
    for k, bucket, rho in zip(registers.column(key).to_pylist(),
                              registers.column("bucket").to_pylist(),
                              registers.column("rho").to_pylist()):
        regs[k][bucket] = rho
    out = {}
    for k, r in regs.items():
        s = sum(2.0 ** -r.get(j, 0) for j in range(m))
        est = alpha * m * m / s
        zeros = m - len(r)
        if est <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)
        out[k] = est
    return out


def approx_percentiles_hist(ds: "ray.data.Dataset", *, key: str, col: str,
                            qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                            bin_width: float = 1.0) -> "ray.data.Dataset":
    """Mergeable fixed-bin histogram quantile sketch — the documented scale
    path for heavy-hitter keys where exact percentiles
    (``column_percentiles``) would co-locate unbounded groups.

    Per-key state is bounded by value_range / bin_width counters; partial
    histograms combine INSIDE ``map_batches`` (the exchange moves
    (key, bin, count) rows, not values), one keyed shuffle sums them, and
    the per-key finalize walks the cumulative histogram: estimate(q) =
    upper edge of the first bin whose cumulative count reaches
    ``ceil(q * n)`` — deterministic, SQL-mirrorable, error <= bin_width.
    The same shape holds at 100 TB: histogram rows per key are constant,
    so the groupby state never grows with the corpus.
    """
    import math

    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        if len(keys) == 0:          # empty block: sk[starts] would raise
            return pa.table({key: batch.column(key),
                             "bin": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        bins = np.floor(vals / bin_width).astype(np.int64)
        order = np.lexsort((bins, keys))
        sk, sb = keys[order], bins[order]
        starts = np.flatnonzero(
            np.r_[True, (sk[1:] != sk[:-1]) | (sb[1:] != sb[:-1])])
        counts = np.diff(np.append(starts, len(sk)))
        return pa.table({
            key: pa.array(sk[starts]),
            "bin": pa.array(sb[starts], pa.int64()),
            "c": pa.array(counts, pa.int64()),
        })

    hist = (ds.select_columns([key, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby([key, "bin"]).sum("c"))

    def finalize(group: pa.Table) -> pa.Table:
        b = group.column("bin").to_numpy(zero_copy_only=False)
        c = group.column("sum(c)").to_numpy(zero_copy_only=False)
        o = np.argsort(b)
        b, c = b[o], c[o]
        cum = np.cumsum(c)
        n = int(cum[-1])
        out = {key: pa.array([group.column(key)[0].as_py()]),
               "n": pa.array([n], pa.int64())}
        for q in qs:
            rank = math.ceil(q * n)
            i = int(np.searchsorted(cum, rank, side="left"))
            out[f"p{int(q * 100)}_approx"] = pa.array(
                [float((b[i] + 1) * bin_width)], pa.float64())
        return pa.table(out)

    return hist.groupby(key).map_groups(finalize, batch_format="pyarrow")

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_registers(ds: "ray.data.Dataset", *, key_col: str,
                  d: int = CMS_DEPTH, w: int = CMS_WIDTH
                  ) -> "ray.data.Dataset":
    """Count-Min sketch registers: (row, col, c) with col =
    md5_hash64(f"{row}:{value}") % w and one increment per input row.

    The classic streaming frequency sketch (Cormode & Muthukrishnan 2005)
    expressed Ray-Data-first: per-batch partial counts per (row, col)
    BEFORE the exchange (np.bincount over the hashed columns), then one
    keyed sum over at most d*w rows — counters merge by elementwise sum,
    so shards combine with the same exchange and total sketch state is a
    constant d*w regardless of corpus size.  Point estimate(v) = min over
    rows of counter[row, col_row(v)] (``cms_estimate_topk``) — an
    overestimate within eN/w with probability 1-e^-d.  md5 base hash ==
    DuckDB ``md5_number_lower``, so the register table is exactly
    SQL-mirrorable (like ``hll_registers``)."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_hash64_column

    def partial(batch: pa.Table) -> pa.Table:
        vals = [str(v) for v in batch.column(key_col).to_pylist()]
        rows_out, cols_out, counts_out = [], [], []
        for r in range(d):
            h = md5_hash64_column([f"{r}:{v}" for v in vals])
            col = (h % np.uint64(w)).astype(np.int64)
            cnt = np.bincount(col, minlength=w)
            nz = np.flatnonzero(cnt)
            rows_out.append(np.full(len(nz), r, np.int64))
            cols_out.append(nz.astype(np.int64))
            counts_out.append(cnt[nz].astype(np.int64))
        return pa.table({"row": pa.array(np.concatenate(rows_out)),
                         "col": pa.array(np.concatenate(cols_out)),
                         "c": pa.array(np.concatenate(counts_out))})

    out = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow").groupby(["row", "col"]).aggregate(
        Sum("c"))
    return out.map_batches(
        lambda t: pa.table({"row": t.column("row"), "col": t.column("col"),
                            "c": t.column("sum(c)")}),
        batch_format="pyarrow")


def cms_estimate_topk(ds: "ray.data.Dataset", *, key_col: str, k: int = 20,
                      d: int = CMS_DEPTH, w: int = CMS_WIDTH
                      ) -> "ray.data.Dataset":
    """Heavy hitters by Count-Min point estimate: for every DISTINCT key,
    est = min over sketch rows of its counter; top-k by (est desc, key).

    The sketch matrix is tiny (d*w int64) so it is collected once and
    shipped in the task closure; the distinct-key set is computed
    DISTRIBUTED (per-batch distinct -> keyed count, the J5 anti-join
    shape) and stays a Dataset through estimate -> sort -> limit."""
    import numpy as np

    import pyarrow.compute as _pc

    from ..functions.hashing import md5_hash64_column

    regs = cms_registers(ds, key_col=key_col, d=d, w=w).take_all()
    mat = np.zeros((d, w), np.int64)
    for r in regs:
        mat[r["row"], r["col"]] = r["c"]

    def batch_distinct(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return pa.table({key_col: _pc.unique(col)})

    def estimate(batch: pa.Table) -> pa.Table:
        vals = [str(v) for v in batch.column(key_col).to_pylist()]
        est = np.full(len(vals), np.iinfo(np.int64).max, np.int64)
        for r in range(d):
            h = md5_hash64_column([f"{r}:{v}" for v in vals])
            col = (h % np.uint64(w)).astype(np.int64)
            est = np.minimum(est, mat[r, col])
        return batch.append_column("est", pa.array(est, pa.int64()))

    keys = (ds.select_columns([key_col])
            .map_batches(batch_distinct, batch_format="pyarrow")
            .groupby(key_col).count()
            .map_batches(lambda t: t.select([key_col]),
                         batch_format="pyarrow"))
    return (keys.map_batches(estimate, batch_format="pyarrow")
            .sort(["est", key_col], descending=[True, False])
            .limit(k))
