"""Multimodal columns: opaque binary payloads + typed metadata
(north-rule training-data ops).

Image/audio decode libraries are not available in this container, so the
DECODE KERNELS are stubbed — ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless the deterministic fake codec is requested —
but the Ray-side plumbing is real and tested: schemas, small-batch actor-pool
stages, broadcast model state, and output layout are exactly what a real
decode/feature pipeline uses.

Design rules encoded here (for 100 TB media):
  * payloads are ``binary`` columns; batches are SMALL (``batch_size=16``
    default) so batch x concurrency fits worker heaps;
  * decode/feature stages are callable-class actor pools — the (stub) model
    handle is constructed once per actor, never per batch;
  * outputs carry (doc_id, media metadata, feature vector), never the raw
    payload, so downstream stages stay narrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import md5_hash64

MEDIA_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("width", pa.int32()),             # typed metadata (0 when unknown)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 16


def decode_image(payload: bytes):
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; use fake_decode=True for the deterministic stand-in")


def decode_audio(payload: bytes):
    raise NotImplementedError(
        "audio decode requires an audio library not present in this "
        "container; use fake_decode=True for the deterministic stand-in")


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in 'decoder': 16-d feature from byte statistics
    (stable across runs/nodes; replaces a real CNN/fbank featurizer)."""
    if not payload:
        return np.zeros(FEATURE_DIM)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    return hist / hist.sum()


class MediaFeaturizer:
    """Actor-pool stage: (doc_id, payload) -> (doc_id, media_type, n_bytes,
    payload_hash, feature list<double>).  Model state loads once per actor."""

    def __init__(self, *, fake_decode: bool = True):
        if not fake_decode:
            # a real implementation loads the decoder/model here, once
            decode_image(b"")          # raises NotImplementedError
        self._fake = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [_fake_feature(p or b"").tolist() for p in payloads]
        # md5-lower-64 (== DuckDB md5_number_lower) so the whole stage is
        # SQL-mirrorable when payloads are text-derived
        hashes = [int(md5_hash64(p or b"") & 0x7FFFFFFFFFFFFFFF)
                  for p in payloads]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_type": batch.column("media_type"),
            "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            "payload_hash": pa.array(hashes, pa.int64()),
            "feature": pa.array(feats, pa.list_(pa.float64())),
        })


def featurize_media(media: "ray.data.Dataset", *, batch_size: int = 16,
                    concurrency: int = 8, fake_decode: bool = True
                    ) -> "ray.data.Dataset":
    return media.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"fake_decode": fake_decode},
        batch_format="pyarrow",
        batch_size=batch_size,              # small: payloads are wide
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def media_from_documents(sf_dir: str, *, limit: int = 200) -> pa.Table:
    """Deterministic media payloads derived from the documents table
    (payload = utf8 text bytes) so the featurization stage has an ANSI-SQL
    oracle: n_bytes = octet_length, payload_hash = md5_number_lower & 2^63-1,
    feature = high-nibble histogram of the payload (= hex-string character
    counts at even positions)."""
    import os
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"]).sort_by("doc_id")
    t = t.filter(pa.compute.less(t.column("doc_id"), limit))
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    types = [("image", "audio", "video")[d % 3] for d in doc_ids]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array([(x or "").encode("utf-8") for x in texts],
                            pa.binary()),
        "width": pa.array([640 if mt != "audio" else 0 for mt in types],
                          pa.int32()),
        "height": pa.array([480 if mt != "audio" else 0 for mt in types],
                           pa.int32()),
        "duration_ms": pa.array(
            [500 + d % 59_500 if mt != "image" else 0
             for d, mt in zip(doc_ids, types)], pa.int32()),
    }, schema=MEDIA_SCHEMA)


def synth_media_table(doc_ids: list[int], *, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media payloads for plumbing tests."""
    rng = np.random.default_rng(seed)
    types, payloads, w, h, d = [], [], [], [], []
    for i, doc_id in enumerate(doc_ids):
        mt = ("image", "audio", "video")[i % 3]
        size = int(rng.integers(64, 4096))
        types.append(mt)
        payloads.append(rng.integers(0, 256, size=size, dtype=np.uint8
                                     ).tobytes())
        w.append(640 if mt != "audio" else 0)
        h.append(480 if mt != "audio" else 0)
        d.append(int(rng.integers(500, 60_000)) if mt != "image" else 0)
    return pa.table({
        "doc_id": pa.array(list(doc_ids), pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(w, pa.int32()),
        "height": pa.array(h, pa.int32()),
        "duration_ms": pa.array(d, pa.int32()),
    }, schema=MEDIA_SCHEMA)
