"""Delta + varbyte posting-list compression, numpy-vectorized.

The reference stores postings as exploded B-tree-indexed rows with no
compression (SURVEY.md §1.3); real posting lists with delta + varbyte encoding
and block-max metadata are new design mandated by the north rule.

Format (classic VByte): each integer is little-endian base-128; every byte
carries 7 payload bits, the high bit is set on all bytes except the last of a
value.  Doc-id lists are delta-encoded (first value absolute) before VByte.

Both encode and decode avoid per-integer Python loops: they loop over *byte
positions* (<= 10 iterations) with numpy masks, so cost is O(total_bytes) in
C-land.
"""

from __future__ import annotations

import numpy as np


def vb_encode(values: np.ndarray) -> bytes:
    """VByte-encode a non-negative int array -> bytes."""
    vals = np.asarray(values, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(n, dtype=np.int64)
    tmp = vals.copy()
    # bit length via successive shifts (max 64 bits -> 10 iterations of 7)
    nbytes = np.ones(n, dtype=np.int64)
    tmp = vals >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)          # exclusive end offset per value
    starts = ends - nbytes
    # fill byte position k of every value that has > k bytes
    max_len = int(nbytes.max())
    for k in range(max_len):
        mask = nbytes > k
        idx = starts[mask] + k
        byte = ((vals[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        # continuation bit on all but the last byte of each value
        cont = (nbytes[mask] - 1 > k)
        out[idx] = byte | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def vb_decode(buf: bytes) -> np.ndarray:
    """Decode VByte bytes -> uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)                 # index of last byte per value
    n = len(ends)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    payload = (raw & 0x7F).astype(np.uint64)
    for k in range(max_len):
        mask = lengths > k
        out[mask] |= payload[starts[mask] + k] << np.uint64(7 * k)
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing int array -> gaps (first value absolute)."""
    v = np.asarray(sorted_vals, dtype=np.uint64)
    if len(v) == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted doc_ids, aligned tfs) -> (delta+vbyte docs, vbyte tfs)."""
    return vb_encode(delta_encode(doc_ids)), vb_encode(tfs)


def decode_postings(doc_buf: bytes, tf_buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    return delta_decode(vb_decode(doc_buf)), vb_decode(tf_buf)


BLOCK_SIZE = 128


def block_max_meta(doc_ids: np.ndarray, tfs: np.ndarray,
                   block_size: int = BLOCK_SIZE) -> tuple[list[int], list[int]]:
    """Per-block (last_doc_id, max_tf) metadata for block-max WAND pruning.
    max_tf upper-bounds any monotone per-posting score within the block."""
    n = len(doc_ids)
    if n == 0:
        return [], []
    last_docs: list[int] = []
    max_tfs: list[int] = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        last_docs.append(int(doc_ids[e - 1]))
        max_tfs.append(int(tfs[s:e].max()))
    return last_docs, max_tfs


def encode_postings_blocked(doc_ids: np.ndarray, tfs: np.ndarray,
                            block_size: int = BLOCK_SIZE
                            ) -> tuple[bytes, bytes, dict]:
    """Block-independent encoding for WAND: delta encoding RESTARTS at each
    block (first doc of a block is absolute), so any block can be decoded
    without its predecessors.  Returns (doc_buf, tf_buf, meta) where meta has
    per-block byte offsets + last_doc + max_tf + counts."""
    n = len(doc_ids)
    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    doc_off = [0]
    tf_off = [0]
    last_docs: list[int] = []
    max_tfs: list[int] = []
    counts: list[int] = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        dchunk = vb_encode(delta_encode(doc_ids[s:e]))
        tchunk = vb_encode(tfs[s:e])
        doc_chunks.append(dchunk)
        tf_chunks.append(tchunk)
        doc_off.append(doc_off[-1] + len(dchunk))
        tf_off.append(tf_off[-1] + len(tchunk))
        last_docs.append(int(doc_ids[e - 1]))
        max_tfs.append(int(np.asarray(tfs[s:e]).max()))
        counts.append(e - s)
    meta = {"last_doc": last_docs, "max_tf": max_tfs,
            "doc_off": doc_off, "tf_off": tf_off, "count": counts}
    return b"".join(doc_chunks), b"".join(tf_chunks), meta


def decode_block(doc_buf: bytes, tf_buf: bytes, meta: dict, block: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single block of a blocked posting list."""
    ds, de = meta["doc_off"][block], meta["doc_off"][block + 1]
    ts, te = meta["tf_off"][block], meta["tf_off"][block + 1]
    docs = delta_decode(vb_decode(doc_buf[ds:de]))
    tfs = vb_decode(tf_buf[ts:te])
    return docs, tfs


def decode_postings_blocked(doc_buf: bytes, tf_buf: bytes, meta: dict
                            ) -> tuple[np.ndarray, np.ndarray]:
    """Decode all blocks of a blocked posting list."""
    n_blocks = len(meta["last_doc"])
    if n_blocks == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    parts = [decode_block(doc_buf, tf_buf, meta, b) for b in range(n_blocks)]
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]))
