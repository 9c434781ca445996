"""CLI: python -m search_engine_ray.query_cli --index <dir> "query text"
     python -m search_engine_ray.query_cli --index <dir> --serve --port 8080

Query entry point (SURVEY.md §3 "ours" (2)); ``--serve`` starts the HTTP
surface (S8, serving/http.py) instead of running a one-shot query."""

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
    p.add_argument("--serve", action="store_true",
                   help="start the HTTP /search server instead")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("q", nargs="?", default=None, help="query text")
    args = p.parse_args()

    if args.serve:
        from .serving.http import SearchServer
        srv = SearchServer(args.index, port=args.port, scoring=args.scoring)
        print(f"serving on http://{srv.host}:{srv.port}/search")
        srv.start()
        try:
            srv._thread.join()
        except KeyboardInterrupt:
            srv.shutdown()
        return

    if args.q is None:
        p.error("query text required unless --serve")

    from .state.query_engine import QueryEngine

    engine = QueryEngine(args.index, scoring=args.scoring)
    rows = engine.search(args.q, limit=args.limit, offset=args.offset)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
