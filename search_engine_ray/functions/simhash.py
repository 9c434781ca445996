"""64-bit SimHash over whitespace-split features.

The reference computes ``Simhash((content or '').split()).value`` with the
``simhash`` PyPI package (/root/reference/app/batch/duplicate_detection.py:63)
and wraps it to signed BIGINT (:11-14).  That package is not available here,
so the standard Charikar construction is implemented directly: hash each
feature to 64 bits, sum +1/-1 per bit weighted by feature count, sign -> bit.
Feature hashing uses md5-lower-64 (functions/hashing.py md5_hash64 ==
DuckDB ``md5_number_lower``) so the whole fingerprint is recomputable by an
ANSI-SQL oracle; fingerprint VALUES therefore differ from the PyPI library,
but the semantics (near-dup Hamming proximity over whitespace features) are
identical, and the in-repo oracle pins the same construction.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .hashing import md5_hash64, to_signed64


def simhash64(features: list[str]) -> int:
    """Unsigned 64-bit Charikar simhash of a feature list (duplicates weight)."""
    if not features:
        return 0
    counts = Counter(features)
    hashes = np.fromiter(
        (md5_hash64(f) for f in counts), dtype=np.uint64, count=len(counts)
    )
    weights = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    # bit matrix: (n_features, 64) of {0,1}
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    v = ((2 * bits - 1) * weights[:, None]).sum(axis=0)
    fp = np.uint64(0)
    for b in np.flatnonzero(v > 0):
        fp |= np.uint64(1) << np.uint64(b)
    return int(fp)


def simhash_text(text: str) -> int:
    """Signed-wrapped simhash of whitespace-split text, reference semantics
    (/root/reference/app/batch/duplicate_detection.py:63 + :11-14)."""
    return to_signed64(simhash64((text or "").split()))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
