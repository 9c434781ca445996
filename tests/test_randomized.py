"""Randomized engine-vs-oracle property tests (SURVEY.md §5.4): seeds drive
small random corpora; the full distributed build must match the naive oracle
on every query, at any parallelism."""

import pyarrow as pa
import pytest

import ray.data

from oracle.oracle import OracleIndex
from search_engine_ray.config import EngineConfig
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.sources.transcripts import generate_transcripts
from search_engine_ray.state.query_engine import QueryEngine


@pytest.mark.parametrize("seed,parts,repartition", [(7, 4, 2), (13, 8, 5),
                                                    (99, 3, 7)])
def test_random_corpus_rank_identity(tmp_path, seed, parts, repartition):
    table = generate_transcripts(30, seed=seed)
    cfg = EngineConfig(index_dir=str(tmp_path / f"r{seed}"),
                       num_partitions=parts)
    build_index(ray.data.from_arrow(table).repartition(repartition), cfg,
                source_desc=f"rand{seed}")
    qe = QueryEngine(cfg.index_dir)
    oi = OracleIndex(table)

    # derive queries from the corpus itself so they hit real terms
    words = []
    for t in table.column("text").to_pylist()[:20]:
        words.extend((t or "").split()[:2])
    queries = [" ".join(words[i:i + 2]) for i in range(0, min(len(words), 20), 2)]
    queries += ["the and", "", "nonexistentterm"]
    for q in queries:
        a = qe.search(q, limit=15)
        b = oi.search(q, limit=15)
        assert [(r["url"], r["score"], r["token_score"], r["matched_terms"])
                for r in a] == \
               [(r["url"], r["score"], r["token_score"], r["matched_terms"])
                for r in b], (seed, q)
        # WAND agrees with exhaustive on the same corpus
        c1 = qe.candidates(q, limit=15, offset=0)
        c2 = qe.candidates_wand(q, limit=15, offset=0)
        assert (c1 is None) == (c2 is None)
        if c1 is not None:
            assert c1[0] == c2[0], (seed, q)
