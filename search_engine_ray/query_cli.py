"""CLI: python -m search_engine_ray.query_cli --index <dir> "query text"

Query entry point (SURVEY.md §3 "ours" (2))."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description="Query the index")
    p.add_argument("--index", required=True)
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--offset", type=int, default=0)
    p.add_argument("--scoring", choices=("reference", "bm25"),
                   default="reference")
    p.add_argument("q", help="query text")
    args = p.parse_args()

    from .state.query_engine import QueryEngine

    engine = QueryEngine(args.index, scoring=args.scoring)
    rows = engine.search(args.q, limit=args.limit, offset=args.offset)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
