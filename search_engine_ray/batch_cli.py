"""Batch maintenance runner CLI — reference `python -m app.batch.runner`
(`/root/reference/app/batch/runner.py:55-75`): run the maintenance cycle
once or on a fixed interval, with the coordinator/worker role split
(runner.py:21-33 — workers run only the per-node duplicate jobs, global
jobs run on the coordinator).

    python -m search_engine_ray.batch_cli --docs corpus.parquet --out /tmp/m \
        [--interval 300] [--role coordinator|worker|auto] [--once]
"""

from __future__ import annotations

import argparse
import logging
import time

logger = logging.getLogger(__name__)

WORKER_SKIP = frozenset({"link_graph", "pagerank", "bm25", "spellcheck"})


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", required=True,
                   help="parquet path of a doc-id'd corpus (doc_id, text)")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--interval", type=int, default=0,
                   help="seconds between cycles (0 = run once)")
    p.add_argument("--role", choices=("auto", "coordinator", "worker"),
                   default="auto")
    p.add_argument("--once", action="store_true")
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    import ray.data

    from .pipelines.batch_cycle import run_cycle

    skip = WORKER_SKIP if args.role == "worker" else frozenset()
    while True:
        started = time.time()
        docs = ray.data.read_parquet(args.docs)
        manifest = run_cycle(docs, args.out, skip=skip)
        done = {k: v for k, v in manifest.items() if isinstance(v, dict)}
        logger.info("cycle done in %.1fs: %s", time.time() - started,
                    {k: v.get("rows") for k, v in done.items()})
        if args.once or args.interval <= 0:
            return 0
        # reference sleep-to-interval loop (runner.py:59-66)
        delay = max(0.0, args.interval - (time.time() - started))
        time.sleep(delay)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
