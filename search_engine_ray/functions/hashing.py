"""Stable 64-bit hashes.

Everything downstream (doc ids, content-hash dedup, shuffle partitioning,
MinHash) needs hashes that are stable across processes, nodes and Python
versions — so no builtin ``hash()`` (PYTHONHASHSEED) anywhere.  blake2b is in
the stdlib and fast for short inputs."""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

_MASK64 = (1 << 64) - 1


def hash64(data: bytes | str, *, seed: int = 0) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = blake2b(data, digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def hash64_column(values, *, seed: int = 0) -> np.ndarray:
    """Vector of unsigned 64-bit hashes for an iterable of str/bytes.

    Returns uint64 ndarray; None -> hash of empty string."""
    salt = seed.to_bytes(8, "little")
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        if v is None:
            b = b""
        elif isinstance(v, str):
            b = v.encode("utf-8")
        else:
            b = v
        out[i] = int.from_bytes(blake2b(b, digest_size=8, salt=salt).digest(),
                                "little")
    return out


def md5_hash64(data: bytes | str) -> int:
    """Lower 64 bits of MD5, little-endian — bit-identical to DuckDB's
    ``md5_number_lower``, so any stage hashed with this is SQL-mirrorable.
    Used where an ANSI-SQL oracle must recompute the hash (simhash features,
    rolling fingerprints); NOT for partitioning (blake2b hash64 stays the
    shuffle/identity hash)."""
    from hashlib import md5
    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(md5(data).digest()[8:16], "little")


def md5_hash64_column(values) -> np.ndarray:
    """uint64 ndarray of md5_hash64 per value; None -> hash of empty string."""
    from hashlib import md5
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        if v is None:
            b = b""
        elif isinstance(v, str):
            b = v.encode("utf-8")
        else:
            b = v
        out[i] = int.from_bytes(md5(b).digest()[8:16], "little")
    return out


def splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (public splitmix64 finalizer)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


def splitmix64_array(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over a uint64 array."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def to_signed64(value: int) -> int:
    """Wrap an unsigned 64-bit value into signed BIGINT range, matching the
    reference's Postgres wrap (/root/reference/app/batch/duplicate_detection.py:11-14)."""
    if value >= (1 << 63):
        return value - (1 << 64)
    return value
