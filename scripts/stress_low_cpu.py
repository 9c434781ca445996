"""Low-CPU scheduling stress: the join-heavy driver entries, repeated in
fresh small (`num_cpus=4`) Ray sessions.

This is the reproduction harness for the streaming-executor deadlock fixed
in round 4 (see util.hash_join and queries._docs_with_ids docstrings): with
stock join aggregator reservations plus per-branch actor-pool lineages, the
suite stalled in 2 of 3 rounds at 4 CPUs (a dispatched read task's paused
generator + an unplaceable min-size pool actor, circular); after the fix it
passes repeatedly.  Run it whenever the join/actor-pool plumbing changes:

    python scripts/stress_low_cpu.py [rounds] [num_cpus] [sf_dir]

Each round runs in a FRESH subprocess (its own Ray session); a round that
exceeds the timeout or exits nonzero is reported as a STALL/CRASH and makes
the script exit 1.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENTRIES = ("minhash_near_dups", "ngram_jaccard_near_dups",
           "minhash_clusters", "near_dedup_survivors", "decontaminate",
           "graph_pagerank", "domain_quality_gate", "search_facets")

_CHILD = r"""
import sys, time
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False)
sys.path.insert(0, {repo!r})
import pyarrow as pa, pandas as pd
import __ray_entry__ as e
qs = e.queries()
for name in {entries!r}:
    t0 = time.time()
    r = qs[name]({sf!r})
    n = (r.num_rows if isinstance(r, pa.Table)
         else len(r) if isinstance(r, pd.DataFrame) else r.count())
    print(f"PASS {{name}} rows={{n}} {{time.time()-t0:.1f}}s", flush=True)
ray.shutdown()
"""


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    timeout_s = int(os.environ.get("STRESS_TIMEOUT_S", "600"))
    failures = 0
    for i in range(1, rounds + 1):
        print(f"=== round {i}/{rounds} (num_cpus={cpus}) ===", flush=True)
        code = _CHILD.format(cpus=cpus, repo=REPO, entries=ENTRIES, sf=sf)
        try:
            r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                               capture_output=True, text=True,
                               timeout=timeout_s)
        except subprocess.TimeoutExpired as e:
            print(f"STALL round {i}: exceeded {timeout_s}s "
                  f"(the deadlock signature)", flush=True)
            tail = (e.stdout or b"")
            if isinstance(tail, bytes):
                tail = tail.decode(errors="replace")
            print("\n".join(tail.splitlines()[-5:]), flush=True)
            failures += 1
            continue
        for line in r.stdout.splitlines():
            if line.startswith("PASS"):
                print(line, flush=True)
        if r.returncode != 0:
            print(f"CRASH round {i}: rc={r.returncode}; stderr tail:",
                  flush=True)
            print("\n".join(r.stderr.splitlines()[-5:]), flush=True)
            failures += 1
    print(f"=== {rounds - failures}/{rounds} rounds clean ===", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
