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
