"""Tombstone deletes over immutable index artifacts.

The reference handles recrawl/removal as DELETE + reinsert rows in Postgres
(/root/reference/app/crawler/worker.py:229 delete-then-insert on recrawl);
with immutable segment files the analogue is a query-time tombstone mask:
``delete_conversations`` resolves conv_ids to their dense doc-id ranges
(doc_id = conv_base + turn_idx, so each conversation is one contiguous
range) and appends them to an atomic tombstone artifact; QueryEngine masks
tombstoned ids out of stage-1 accumulation.  Corpus statistics (df/idf/
avgdl) intentionally keep their build-time values until the next
truncate-rebuild — exactly the reference's behavior between batch rebuild
cycles.

The artifact is a single sorted parquet of (lo, hi) ranges (half-open),
rewritten atomically on every delete — deletes are rare control operations,
not a data path.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOMBSTONE_FILE = "tombstones.parquet"


def _path(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONE_FILE)


def load_tombstones(index_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(lo, hi) sorted half-open doc-id ranges; empty arrays when none."""
    p = _path(index_dir)
    if not os.path.exists(p):
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    t = pq.read_table(p)
    return (t.column("lo").to_numpy(zero_copy_only=False),
            t.column("hi").to_numpy(zero_copy_only=False))


def _save(index_dir: str, lo: np.ndarray, hi: np.ndarray) -> None:
    fd, tmp = tempfile.mkstemp(prefix="tombstones.", dir=index_dir)
    os.close(fd)
    pq.write_table(pa.table({"lo": pa.array(lo, pa.int64()),
                             "hi": pa.array(hi, pa.int64())}), tmp)
    os.replace(tmp, _path(index_dir))


def _merge_ranges(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray,
                                                           np.ndarray]:
    if not len(lo):
        return lo, hi
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    out_lo, out_hi = [int(lo[0])], [int(hi[0])]
    for l, h in zip(lo[1:].tolist(), hi[1:].tolist()):
        if l <= out_hi[-1]:
            out_hi[-1] = max(out_hi[-1], h)
        else:
            out_lo.append(l)
            out_hi.append(h)
    return (np.asarray(out_lo, dtype=np.int64),
            np.asarray(out_hi, dtype=np.int64))


def delete_conversations(index_dir: str, conv_ids: list[str]) -> int:
    """Tombstone every turn of the given conversations; returns the number
    of newly tombstoned doc ids.  Conv ranges are resolved from the doc
    store (one column-pruned read filtered to the requested convs)."""
    docs = pq.read_table(os.path.join(index_dir, "docs"),
                         columns=["conv_id", "doc_id"])
    mask = pa.compute.is_in(docs.column("conv_id"),
                            value_set=pa.array(sorted(set(conv_ids))))
    ids = np.sort(docs.filter(mask).column("doc_id").to_numpy(
        zero_copy_only=False))
    if not len(ids):
        return 0
    # contiguous ids -> ranges
    breaks = np.flatnonzero(np.diff(ids) != 1)
    lo_new = ids[np.concatenate(([0], breaks + 1))]
    hi_new = ids[np.concatenate((breaks, [len(ids) - 1]))] + 1
    lo, hi = load_tombstones(index_dir)
    before = int((hi - lo).sum())
    lo, hi = _merge_ranges(np.concatenate([lo, lo_new]),
                           np.concatenate([hi, hi_new]))
    _save(index_dir, lo, hi)
    return int((hi - lo).sum()) - before


def mask_tombstoned(doc_ids: np.ndarray, lo: np.ndarray, hi: np.ndarray
                    ) -> np.ndarray:
    """Boolean keep-mask: True where doc_id is NOT tombstoned (vectorized
    range lookup via searchsorted over the sorted range starts)."""
    if not len(lo):
        return np.ones(len(doc_ids), dtype=bool)
    pos = np.searchsorted(lo, doc_ids, side="right") - 1
    inside = (pos >= 0) & (doc_ids < hi[np.clip(pos, 0, len(hi) - 1)])
    return ~inside
