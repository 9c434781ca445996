"""One-off scale probe for the positional index + phrase search.

Builds the positional index over the standard bench transcript corpus
(600k turns at sf0.1 scale) and times build + a multi-phrase query.
Results are recorded in BASELINE.md; not part of the default bench to keep
the driver's per-round record lean.

Usage: python scripts/bench_positions.py [num_turns]
"""

import json
import os
import shutil
import sys
import time

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    num_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    from search_engine_ray.sources.transcripts import (
        generate_bench_transcripts, write_transcripts)
    from search_engine_ray.stages.doc_ids import assign_doc_ids
    from search_engine_ray.stages.positions import (build_positional_index,
                                                    phrase_match)

    cache = "/tmp/search_engine_ray/bench"
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"transcripts-{num_turns}-seed42.parquet")
    if not os.path.exists(path):
        write_transcripts(generate_bench_transcripts(num_turns), path)

    idx = "/tmp/posidx_bench"
    shutil.rmtree(idx, ignore_errors=True)
    ds = ray.data.read_parquet(path)
    docs, _ = assign_doc_ids(ds)
    t0 = time.perf_counter()
    manifest = build_positional_index(docs, idx, docs_per_bucket=65536)
    build_s = time.perf_counter() - t0

    phrases = ["word0010 word0011", "the quick", "connection running",
               "word0001 word0002 word0003"]
    t0 = time.perf_counter()
    n_hits = phrase_match(idx, phrases).count()
    query_s = time.perf_counter() - t0

    print(json.dumps({
        "metric": "positional index build + phrase query",
        "turns": num_turns,
        "num_cpus": cpus,
        "build_sec": round(build_s, 2),
        "turns_per_sec": round(num_turns / build_s, 1),
        "index_rows": manifest["rows"],
        "buckets": len(manifest["buckets"]),
        "phrase_query_sec": round(query_s, 2),
        "phrase_hits": n_hits,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
