"""Embedding generation as a batched actor-pool inference stage.

Real deployments put a neural encoder here (weights loaded once per
actor in ``__init__``, batched forward passes in ``__call__``); no ML
runtime ships in this container, so the encoder is a DETERMINISTIC
hashed projection — md5 per token once, then one vectorized splitmix64
remix per output dimension (exactly the MinHash permutation scheme,
which the DuckDB oracle already reproduces bit-exactly) — keeping every
piece of the plumbing real: broadcast-free stateful setup, zero-copy
batch flow, per-doc reduction via ``np.add.reduceat`` over token
offsets, narrow integer output columns.

  e_i(doc) = sum over token occurrences t of
             (splitmix64(md5_hash64(t) XOR seed_i) % 1000) - 500
  seed_i   = (i + 1) * GOLDEN mod 2^64

Tokenizer ``[a-z]{2,32}`` (the _WORDS oracle fragment); docs with zero
tokens are absent (mirrored).  Output is (doc_id, e0..e{dims-1}) scalar
int64 columns — integer-exact, so the SQL mirror hashes identically.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import md5_hash64_column, splitmix64_array

from ..functions.text import WORD_RE  # noqa: E402 — the
# oracle-pinned word tokenizer, one shared definition
GOLDEN = 0x9E3779B97F4A7C15

DEFAULT_DIMS = 8


class HashedEncoder:
    """Callable-class stage: seeds built once per actor, batches encoded
    vectorized."""

    def __init__(self, dims: int = DEFAULT_DIMS):
        self._dims = dims
        self._seeds = (np.arange(1, dims + 1, dtype=np.uint64)
                       * np.uint64(GOLDEN))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        toks: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            w = WORD_RE.findall((t or "").lower())
            toks.extend(w)
            counts[i] = len(w)
        keep = counts > 0
        if not keep.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             **{f"e{d}": pa.array([], pa.int64())
                                for d in range(self._dims)}})
        base = md5_hash64_column(toks)
        mixed = splitmix64_array(base[:, None] ^ self._seeds[None, :])
        v = (mixed % np.uint64(1000)).astype(np.int64) - 500
        offsets = np.concatenate(([0], np.cumsum(counts[keep])[:-1]))
        sums = np.add.reduceat(v, offsets, axis=0)
        if len(offsets) == 1:
            sums = sums.reshape(1, -1)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            **{f"e{d}": pa.array(sums[:, d], pa.int64())
               for d in range(self._dims)}})


def embed_documents(docs: "ray.data.Dataset", *, dims: int = DEFAULT_DIMS
                    ) -> "ray.data.Dataset":
    """(doc_id, e0..e{dims-1}) — batched encoding over an actor pool."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        HashedEncoder, fn_constructor_args=(dims,),
        batch_format="pyarrow", concurrency=(1, 8))
