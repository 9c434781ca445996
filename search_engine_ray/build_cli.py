"""CLI: python -m search_engine_ray.build_cli --input <parquet> --index <dir>

Build entry point (SURVEY.md §3 "ours" (1)).  Owns its Ray session (guarded
init per the driver contract)."""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description="Build the inverted index")
    p.add_argument("--input", required=True, help="transcripts parquet path/dir")
    p.add_argument("--index", required=True, help="output index directory")
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--salt", type=int, default=1)
    p.add_argument("--no-stem", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--address", default=None,
                   help="Ray address: 'local' (default), 'auto' to join an "
                        "existing cluster (the `ray job submit` path), or "
                        "an explicit head address; the flag wins over "
                        "RAY_ADDRESS, which wins over the 'local' default")
    args = p.parse_args()

    import os

    import ray
    if not ray.is_initialized():
        addr = args.address or os.environ.get("RAY_ADDRESS", "local")
        ray.init(address=addr,
                 num_cpus=args.num_cpus if addr == "local" else None,
                 include_dashboard=False)
    import ray.data

    from .config import EngineConfig
    from .pipelines.build import build_index

    cfg = EngineConfig(index_dir=args.index, num_partitions=args.partitions,
                       salt=args.salt, do_stem=not args.no_stem)
    info = build_index(ray.data.read_parquet(args.input), cfg,
                       source_desc=args.input, resume=args.resume,
                       transcripts_path=args.input)
    print({"doc_total": info["doc_total"], "stats": info["stats"],
           "index_dir": info["index_dir"]})
    ray.shutdown()


if __name__ == "__main__":
    main()
