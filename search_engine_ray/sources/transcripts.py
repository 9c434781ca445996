"""Transcript sources.

Two deterministic ways to obtain the BASELINE.json input-shaped table
(conv_id, turn_idx, role, text, tool, ts):

1. ``generate_transcripts`` — the FIXTURES.md F1 synthetic generator
   (seed=42): Zipf vocabulary with hot head terms, stopwords, morphological
   variants, digits/unicode/edge rows, ~2% exact duplicates, ~1% near
   duplicates, and reference markers (URLs + ``see conv-XXXXXX#k``) for the
   graph stage.  Used by pytest and by standalone index builds.

2. ``transcripts_from_documents`` — a deterministic, SQL-mirrorable mapping of
   the driver's ``documents`` testdata table into transcript shape, so driver
   correctness checks can run the same derivation in DuckDB
   (``TRANSCRIPTS_FROM_DOCUMENTS_SQL``).  doc_id is dense 0..N-1 in that
   table, which makes (conv_id, turn_idx) contiguous by construction.
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..config import TRANSCRIPTS_SCHEMA
from ..util import read_parquet_clean

TURNS_PER_CONV = 8
_EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("bash", "search", "edit", "", "")

# DuckDB mirror of transcripts_from_documents(); oracle_sql() builds on it.
TRANSCRIPTS_FROM_DOCUMENTS_SQL = """
SELECT
  'conv-' || lpad(CAST(doc_id // 8 AS VARCHAR), 6, '0') AS conv_id,
  CAST(doc_id % 8 AS INTEGER) AS turn_idx,
  CASE doc_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                  WHEN 2 THEN 'system' ELSE 'tool' END AS role,
  text,
  CASE doc_id % 5 WHEN 0 THEN 'bash' WHEN 1 THEN 'search'
                  WHEN 2 THEN 'edit' ELSE '' END AS tool,
  TIMESTAMP '2026-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts,
  doc_id
FROM documents
"""


def _docs_batch_to_transcripts(batch: pa.Table) -> pa.Table:
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    conv_num = doc_id // TURNS_PER_CONV
    conv_id = pa.array([f"conv-{c:06d}" for c in conv_num], pa.string())
    turn_idx = pa.array((doc_id % TURNS_PER_CONV).astype(np.int32))
    role = pa.array([ROLES[d % 4] for d in doc_id], pa.string())
    tool = pa.array([TOOLS[d % 5] for d in doc_id], pa.string())
    base_us = int(_EPOCH.timestamp()) * 1_000_000
    ts = pa.array(base_us + doc_id * 60_000_000).cast(pa.timestamp("us"))
    return pa.table({
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": batch.column("text"),
        "tool": tool,
        "ts": ts,
    })


def transcripts_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """documents.parquet -> transcript-shaped Dataset (column-pruned read)."""
    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(_docs_batch_to_transcripts, batch_format="pyarrow")


NEWS_TURNS_PER_CONV = 4

# DuckDB mirror of news_from_documents(); the unified-index oracle builds on
# it.  r = dense rank of the filtered docs (row_number over doc_id ASC).
NEWS_FROM_DOCUMENTS_SQL = """
SELECT
  'news-' || lpad(CAST((row_number() OVER (ORDER BY doc_id) - 1) // 4
                       AS VARCHAR), 6, '0') AS conv_id,
  CAST((row_number() OVER (ORDER BY doc_id) - 1) % 4 AS INTEGER) AS turn_idx,
  'news' AS role,
  'news digest ' || text AS text,
  'feed' AS tool,
  TIMESTAMP '2026-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
FROM documents WHERE doc_id % 3 = 0
"""


def _news_batch(batch: pa.Table) -> pa.Table:
    """Filtered-doc rank in CLOSED FORM: documents.doc_id is dense 0..N-1
    (module contract, same density transcripts_from_documents' conv layout
    relies on), so the docs passing ``doc_id % 3 == 0`` are exactly
    {0, 3, 6, ...} and ``row_number() OVER (ORDER BY doc_id) - 1`` equals
    ``doc_id // 3`` — each batch derives its rows independently, no sort, no
    prefix-sum exchange, no driver materialization."""
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sel = doc_id % 3 == 0
    doc_id = doc_id[sel]
    r = doc_id // 3
    texts = pc.binary_join_element_wise(
        pa.scalar("news digest "), batch.column("text").filter(pa.array(sel)),
        "")
    base_us = int(_EPOCH.timestamp()) * 1_000_000
    return pa.table({
        "conv_id": pa.array([f"news-{c:06d}"
                             for c in r // NEWS_TURNS_PER_CONV], pa.string()),
        "turn_idx": pa.array((r % NEWS_TURNS_PER_CONV).astype(np.int32)),
        "role": pa.array(["news"] * len(r), pa.string()),
        "text": texts,
        "tool": pa.array(["feed"] * len(r), pa.string()),
        "ts": pa.array(base_us + doc_id * 60_000_000).cast(pa.timestamp("us")),
    })


def news_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """Second corpus (reference J3 news): every 3rd document becomes a news
    item, 4 turns per news conversation, 'news digest ' text prefix.  The
    'news-' conv prefix sorts AFTER 'conv-', so in a unified build the news
    docs occupy the tail doc-id range [N_web, N_web + N_news) — the engine's
    analogue of the reference's source_type discriminator column
    (/root/reference/alembic/versions/0007_unify_news_tokens.py:18-31).

    Fully streaming: column-pruned read_parquet + a stateless map_batches
    (rank is a closed form of the dense doc_id — see _news_batch), so the
    derivation scales with the documents table without any driver pass."""
    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return ds.map_batches(_news_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Synthetic generator (FIXTURES.md F1)
# ---------------------------------------------------------------------------

_STOPWORD_SAMPLE = ("the", "and", "of", "to", "in", "is", "that", "for")
_MORPH_VARIANTS = ("running", "runs", "run", "indexes", "indexing", "indexed",
                   "connection", "connections", "connected")
_ODDBALLS = ("error404", "v2", "a", "x", "café", "日本語", "foo_bar", "x1")


def _zipf_vocab(size: int) -> list[str]:
    return [f"word{i:04d}" for i in range(size)]


def generate_transcripts(num_convs: int = 200, *, seed: int = 42,
                         vocab_size: int = 5000,
                         mean_turns: int = 10) -> pa.Table:
    """Deterministic synthetic transcript table (one row per turn)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_zipf_vocab(vocab_size))
    # Zipf s~1.1 over ranks
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    base_us = int(_EPOCH.timestamp()) * 1_000_000
    all_rows: list[tuple[str, int]] = []   # (conv_id, turn_idx) for references

    for c in range(num_convs):
        conv = f"conv-{c:06d}"
        n_turns = int(rng.integers(1, mean_turns * 2))
        for t in range(n_turns):
            n_words = int(rng.integers(3, 40))
            words = list(rng.choice(vocab, size=n_words, p=probs))
            # sprinkle stopwords + morphological variants
            for _ in range(int(rng.integers(0, 4))):
                words.insert(int(rng.integers(0, len(words) + 1)),
                             _STOPWORD_SAMPLE[int(rng.integers(0, len(_STOPWORD_SAMPLE)))])
            if rng.random() < 0.3:
                words.append(_MORPH_VARIANTS[int(rng.integers(0, len(_MORPH_VARIANTS)))])
            if rng.random() < 0.1:
                words.append(_ODDBALLS[int(rng.integers(0, len(_ODDBALLS)))])
            # reference markers (~10% of turns)
            r = rng.random()
            if r < 0.05:
                tgt_conv = int(rng.integers(0, int(num_convs * 1.1)))  # some dangling
                tgt_turn = int(rng.integers(0, mean_turns * 2))
                words.append(f"see conv-{tgt_conv:06d}#{tgt_turn}")
            elif r < 0.10:
                words.append("https://Example.com//a//b?utm_source=x&q=1#frag")
            text = " ".join(words)
            conv_ids.append(conv)
            turn_idxs.append(t)
            roles.append(ROLES[int(rng.integers(0, 4))])
            texts.append(text)
            tools.append(TOOLS[int(rng.integers(0, 5))])
            tss.append(base_us + (c * 1000 + t) * 60_000_000)
            all_rows.append((conv, t))

    n = len(texts)
    # edge rows: empty / whitespace / stopword-only / very long
    edge_positions = rng.choice(n, size=min(8, n), replace=False)
    edge_texts = ["", "   ", "the and of to", "longword " * 3000]
    for i, pos in enumerate(edge_positions):
        texts[pos] = edge_texts[i % len(edge_texts)]

    # exact duplicates (~2%): copy text into a row of a different conversation
    n_dup = max(1, n // 50)
    src_idx = rng.choice(n, size=n_dup, replace=False)
    dst_idx = rng.choice(n, size=n_dup, replace=False)
    for s, d in zip(src_idx, dst_idx):
        if conv_ids[s] != conv_ids[d]:
            texts[d] = texts[s]
    # near duplicates (~1%): twin with one word changed
    n_near = max(1, n // 100)
    src_idx = rng.choice(n, size=n_near, replace=False)
    dst_idx = rng.choice(n, size=n_near, replace=False)
    for s, d in zip(src_idx, dst_idx):
        if conv_ids[s] != conv_ids[d] and texts[s]:
            w = texts[s].split()
            if w:
                w[int(rng.integers(0, len(w)))] = "mutated"
                texts[d] = " ".join(w)

    table = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
    })
    assert table.schema.equals(TRANSCRIPTS_SCHEMA)
    return table


def generate_bench_transcripts(num_turns: int, *, seed: int = 42,
                               vocab_size: int = 5000,
                               turns_per_conv: int = 10,
                               text_pool: int = 200_000) -> pa.Table:
    """Vectorized deterministic generator for benchmark-scale corpora
    (hundreds of thousands to tens of millions of turns).

    Texts come from a Zipf-sampled POOL of ``text_pool`` distinct turn
    bodies assembled once, then sampled per turn and materialized as a
    dictionary-encoded Arrow column — generating 10M turns costs seconds and
    bounded memory instead of building 10M Python strings.  Term statistics
    stay Zipfian; duplicate bodies are expected (like real transcripts)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_zipf_vocab(vocab_size) + list(_STOPWORD_SAMPLE)
                     + list(_MORPH_VARIANTS))
    n_vocab = len(vocab)
    ranks = np.arange(1, n_vocab + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()

    pool_n = min(text_pool, num_turns)
    n_words = rng.integers(5, 40, size=pool_n)
    ends = np.cumsum(n_words)
    starts = ends - n_words
    flat = vocab[rng.choice(n_vocab, size=int(ends[-1]), p=probs)]
    pool = [" ".join(flat[a:b]) for a, b in zip(starts, ends)]
    text_idx = rng.integers(0, pool_n, size=num_turns).astype(np.int32)
    text_dict = pa.DictionaryArray.from_arrays(
        pa.array(text_idx), pa.array(pool, pa.string()))
    # cast to plain string in bounded chunks: a single cast overflows the
    # 2 GiB int32 offset limit beyond ~10M turns of expanded text
    _CHUNK = 2_000_000
    text_col = pa.chunked_array([
        text_dict.slice(i, _CHUNK).cast(pa.string())
        for i in range(0, num_turns, _CHUNK)] or
        [pa.array([], pa.string())])

    num_convs = (num_turns + turns_per_conv - 1) // turns_per_conv
    conv_names = [f"conv-{c:06d}" for c in range(num_convs)]
    conv_idx = (np.arange(num_turns, dtype=np.int64)
                // turns_per_conv).astype(np.int32)
    conv_col = pa.DictionaryArray.from_arrays(
        pa.array(conv_idx), pa.array(conv_names, pa.string())).cast(pa.string())
    turn_col = np.arange(num_turns, dtype=np.int64) % turns_per_conv
    role_col = pa.DictionaryArray.from_arrays(
        pa.array((np.arange(num_turns) % 4).astype(np.int8)),
        pa.array(list(ROLES), pa.string())).cast(pa.string())
    tool_col = pa.DictionaryArray.from_arrays(
        pa.array((np.arange(num_turns) % 5).astype(np.int8)),
        pa.array(list(TOOLS), pa.string())).cast(pa.string())
    base_us = int(_EPOCH.timestamp()) * 1_000_000
    table = pa.table({
        "conv_id": conv_col,
        "turn_idx": pa.array(turn_col.astype(np.int32)),
        "role": role_col,
        "text": text_col,
        "tool": tool_col,
        "ts": pa.array(base_us + np.arange(num_turns, dtype=np.int64)
                       * 60_000_000).cast(pa.timestamp("us")),
    })
    assert table.schema.equals(TRANSCRIPTS_SCHEMA)
    return table


def write_transcripts(table: pa.Table, path: str, *,
                      row_group_size: int = 16384) -> str:
    """Small row groups so Ray's parquet reader can split a single file into
    parallel read fragments (one giant row group serializes the whole read)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path, row_group_size=row_group_size)
    return path


def read_transcripts(path: str) -> "ray.data.Dataset":
    ds = read_parquet_clean(path)
    return ds
