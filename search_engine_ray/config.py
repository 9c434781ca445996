"""Engine configuration + fixed Arrow schemas.

The reference fixes its schemas with Alembic migrations
(/root/reference/alembic/versions/0001_initial_schema.py ...); ours are
explicit ``pyarrow.Schema`` constants validated on read (SURVEY.md §1.4) —
schemas are contracts, never inferred.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

# Input table shape — BASELINE.json input_hint.
TRANSCRIPTS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

# Doc store: transcripts + assigned dense doc_id (doc_len lives in its own
# small (doc_id, doc_len) artifact produced by the tokenize stream).
DOCS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
    ("doc_id", pa.int64()),
])

# Exploded posting triples (intermediate, streaming).
POSTINGS_TRIPLES_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("doc_id", pa.int64()),
    ("tf", pa.int32()),
])

# Final segment rows: real posting lists (SURVEY.md §1.4 / north rule).
# Delta coding restarts per block and byte offsets are stored, so block-max
# WAND can decode any block independently.
SEGMENT_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("idf", pa.float64()),
    ("doc_ids_enc", pa.binary()),      # per-block delta + varbyte
    ("tfs_enc", pa.binary()),          # per-block varbyte
    ("block_last_doc", pa.list_(pa.int64())),
    ("block_max_tf", pa.list_(pa.int64())),
    ("block_doc_off", pa.list_(pa.int64())),   # len = n_blocks + 1
    ("block_tf_off", pa.list_(pa.int64())),
    ("block_count", pa.list_(pa.int64())),
])

TERM_STATS_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("idf", pa.float64()),
])

# Pinned "now" so freshness scores are deterministic (SURVEY.md §2.2 M7).
BUILD_NOW_ISO = "2026-03-01T00:00:00+00:00"


@dataclass
class EngineConfig:
    """One dataclass of knobs (SURVEY.md §2.10)."""

    index_dir: str = "/tmp/search_engine_ray/index"
    num_partitions: int = 32          # hash(term) shuffle fan-out
    salt: int = 1                     # >1 = two-phase salted groupby for skew
    # >1 = split every part into R doc-id range buckets, each reduced and
    # written independently (file segment-p{part*R+rb}); the engine
    # byte-concats a term's chunks at load (block starts are absolute, so
    # no re-encode).  THE skew control for Zipf head terms: a single term's
    # encode work parallelizes R ways instead of serializing one reducer.
    range_splits: int = 1
    block_size: int = 128             # postings per block-max block
    k1: float = 1.2
    b: float = 0.75
    scoring: str = "reference"        # "reference" (tf*idf*fw) | "bm25"
    tokenize_batch_size: int = 2048
    tokenize_concurrency: int | None = None   # None -> Ray decides
    # docs per fused tokenize+combine task (build's hot stage).  Larger =
    # longer runs = less shuffle volume, at ~O(batch x avg_doc_len) task
    # heap for the in-task triples; 16k docs x ~100 tokens ~ 1.6M triples
    # ~ tens of MB — safe at 32 concurrent tasks on a 128 GiB node.
    fused_batch_size: int = 16384
    do_stem: bool = True              # False = unstemmed index (SQL-checkable)
    drop_stopwords: bool = True
    # True: checkpoint the tokenize output as a reusable Parquet artifact
    # (resume skips re-tokenizing; dedup/spellcheck jobs can share it).
    # False (default): fuse tokenize -> combiner -> shuffle into one pass,
    # with doc lengths riding the same shuffle — 2 fewer full passes.
    checkpoint_triples: bool = False
    build_now: str = BUILD_NOW_ISO
    # conv_id -> base-offset broadcast cap; beyond this the dense-id assigner
    # must switch to the distributed join path (stages/doc_ids.py docstring).
    max_broadcast_convs: int = 5_000_000
    # True: the SAME tokenize pass that feeds the segment shuffle also
    # side-writes positional (term, doc, positions) fragments; a
    # postings-volume compaction then publishes index_dir/positions/ (the
    # phrase/NEAR artifact) — one corpus scan for both artifacts instead of
    # the standalone builder's second scan (stages/positions.py).
    build_positions: bool = False
    # None -> derived at build time: bucket count targets ~2x the worker
    # pool so the compaction + query fan-out parallelize (clamped to
    # [4096, 65536] docs per bucket)
    positions_docs_per_bucket: int | None = None
    positions_row_group_size: int = 4096
