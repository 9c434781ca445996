#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Default mode: one fresh Ray session (num_cpus=$RAY_GRAFT_CPUS, default 32)
over $GRAFT_SF_DIR (default /root/testdata/sf0.1); prints ONE JSON line:

  {"metric": ..., "value": <headline build sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "turns": N, "turns_per_sec": X, "query_p50_ms": X}

--scaling: runs the identical build twice in FRESH subprocesses
(num_cpus=8 then 32 by default) on the same input — the sandbox stand-in for
the north rule's N vs 4N node criterion — and prints one JSON line with both
throughputs and efficiency = (tp_hi / tp_lo) / (cpus_hi / cpus_lo).

The corpus is the deterministic synthetic transcript table (seed=42), sized
from the sf in the dir name (sf * 6M turns -> sf0.1 = 600k), generated once
and cached as Parquet under /tmp.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE = "/tmp/search_engine_ray/bench"

QUERY_SET = [
    "word0000", "word0001 word0002", "running indexes", "word0100 word0500",
    "word0003 word0050 word0200", "the and of", "word4000", "word0007",
    "connection running", "word0010 word0011 word0012",
] * 5   # 50 timed queries


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


# --scaling corpus multiplier: the fused build finishes 600k turns in ~20s,
# which is fixed-cost-dominated — strong-scaling measurements need enough
# work per core, so the scaling protocol runs a larger corpus (same input at
# BOTH cpu levels; override with SCALING_MULT).  Sized (38.4M turns, ~3 min
# of work at 32 CPUs) so the measured fixed residue — Ray startup, shuffle
# barrier, shared-single-disk artifact bandwidth, ~26 s + 0.8 s/M turns on
# this host — stays well under the per-level work, as it would on a real
# cluster where jobs run minutes-to-hours and disks scale with nodes.
SCALING_MULT = int(os.environ.get("SCALING_MULT", "64"))


def _bench_corpus(sf: float, mult: int = 1) -> tuple[str, int]:
    num_turns = max(2000, int(sf * 6_000_000)) * mult
    path = os.path.join(CACHE, f"transcripts-{num_turns}-seed42.parquet")
    if not os.path.exists(path):
        from search_engine_ray.sources.transcripts import (
            generate_bench_transcripts, write_transcripts)
        write_transcripts(generate_bench_transcripts(num_turns), path)
    return path, num_turns


def run_once(num_cpus: int, sf_dir: str, mult: int = 1,
             build_only: bool = False) -> dict:
    # effective-core probe BEFORE the session: the official record carries
    # its own host-contention evidence (shared host; same-code builds have
    # spanned 3.9x across windows) — <27 effective cores means the wall
    # numbers below are contended, not regressed
    eff_pre = _effective_cores(0.5)
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import ray.data
    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.state.query_engine import QueryEngine

    sf = _sf_from_dir(sf_dir)
    corpus_path, num_turns = _bench_corpus(sf, mult)
    index_dir = os.path.join(CACHE, f"idx-{num_turns}-{num_cpus}")
    shutil.rmtree(index_dir, ignore_errors=True)
    # wider reduce fan-out for multi-million-turn corpora (parallelizes the
    # shuffle reduce + segment writes)
    parts = 64 if num_turns > 2_000_000 else 32
    parts = int(os.environ.get("BENCH_PARTS", parts))
    # doc-range split for the big corpus: the synthetic vocabulary is tiny,
    # so single hot terms dominate whole parts — one reducer encoding a
    # 50M-posting term was the measured 42-78 s tail of the 32-cpu build.
    # R=4 spreads each term's encode over 4 reducers (bit-identical index).
    rsplits = 4 if num_turns > 2_000_000 else 1
    rsplits = int(os.environ.get("BENCH_RANGE_SPLITS", rsplits))
    cfg = EngineConfig(index_dir=index_dir, num_partitions=parts,
                       range_splits=rsplits,
                       tokenize_concurrency=num_cpus,
                       max_broadcast_convs=int(os.environ.get(
                           "BENCH_MAX_CONVS", 5_000_000)))

    queries: dict[str, float] = {}

    # Steady-state measurement: spin the Ray Data worker pool up BEFORE the
    # timed region (one trivial execution forces worker-process spawn + the
    # ray.data/pyarrow imports inside them, ~6 s on this host).  On a real
    # cluster the workers are already running when a job is submitted; the
    # fresh-process scaling protocol would otherwise time process startup —
    # a constant — at every CPU level.  Applied identically at all levels.
    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 4) \
        .map_batches(lambda b: b, batch_size=None).materialize()

    t0 = time.time()
    ds = ray.data.read_parquet(corpus_path)
    timings: dict = {}
    build_index(ds, cfg, source_desc=f"bench-{num_turns}",
                transcripts_path=corpus_path, timings=timings)
    build_sec = time.time() - t0
    queries["index_build"] = round(build_sec, 3)
    for phase, sec in timings.items():
        queries[f"build.{phase}"] = sec

    if build_only:
        ray.shutdown()
        return {
            "metric": "index-build wall sec",
            "value": round(build_sec, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "num_cpus": num_cpus,
            "turns": num_turns,
            "turns_per_sec": round(num_turns / build_sec, 1),
            "effective_cores_probe": eff_pre,
        }

    # FUSED build: same corpus, ONE tokenize pass also emits the positional
    # phrase/NEAR artifact (cfg.build_positions).  Recorded as its own wall
    # so the record carries the combined-vs-plain overhead (target: <= plain
    # + ~20%, vs ~2x for the old separate positional scan).
    from dataclasses import replace as dc_replace
    fused_dir = os.path.join(CACHE, f"idx-fused-{num_turns}-{num_cpus}")
    shutil.rmtree(fused_dir, ignore_errors=True)
    t0 = time.time()
    build_index(ray.data.read_parquet(corpus_path),
                dc_replace(cfg, index_dir=fused_dir, build_positions=True),
                source_desc=f"bench-fused-{num_turns}",
                transcripts_path=corpus_path)
    fused_sec = time.time() - t0
    queries["index_build_fused"] = round(fused_sec, 3)
    queries["fused_overhead_pct"] = round(100 * (fused_sec / build_sec - 1),
                                          1)
    shutil.rmtree(fused_dir, ignore_errors=True)

    t0 = time.time()
    qe = QueryEngine(index_dir)
    queries["engine_load"] = round(time.time() - t0, 3)

    # the LAZY engine defers posting/doc materialization to first touch:
    # one untimed pass records that warm-up separately so query_set stays
    # comparable with the pre-lazy rounds (whose eager load pre-paid it)
    t0 = time.time()
    for q in QUERY_SET[:10]:
        qe.search(q, limit=20)
    queries["engine_warmup"] = round(time.time() - t0, 3)

    lat = []
    for q in QUERY_SET:
        t0 = time.time()
        qe.search(q, limit=20)
        lat.append(time.time() - t0)
    lat.sort()
    p50_ms = lat[len(lat) // 2] * 1000
    queries["query_set"] = round(sum(lat), 3)

    # planner path (WAND for selective queries, vectorized exhaustive for
    # dense ones; identical results, property-tested)
    wand_lat = []
    for q in QUERY_SET:
        t0 = time.time()
        qe.candidates_auto(q, limit=20)
        wand_lat.append(time.time() - t0)
    wand_lat.sort()
    queries["stage1_auto"] = round(sum(wand_lat), 3)

    # concurrent serving: QPS through the HTTP surface backed by a sharded
    # engine (N client threads, each running the query set once) — measures
    # the multi-node serving shape, not just single-stream latency
    (qps, q_p50_ms, q_p99_ms, ka_qps, ka_p99_ms,
     ka_errs) = _bench_qps(index_dir)
    queries[f"qps_threads{QPS_THREADS}_shards{QPS_SHARDS}"
            f"x{QPS_REPLICAS}"] = qps
    queries["qps_keepalive"] = ka_qps

    # secondary pipelines over the driver testdata tables
    from search_engine_ray.pipelines import queries as Q
    for name, fn in (("dedup_exact", Q.dedup_exact_groups),
                     ("ann_topk", Q.ann_topk),
                     ("events_window", Q.events_window)):
        t0 = time.time()
        r = fn(sf_dir)
        if hasattr(r, "materialize"):
            r.materialize()
        queries[name] = round(time.time() - t0, 3)

    # physical ANN layouts: record the probed-vs-total scan fractions so the
    # driver bench record carries the pruning evidence (embeddings tables
    # are tiny at every sf, this costs ~seconds)
    ann_scan = _ann_scan_fractions(sf_dir)
    queries.update(ann_scan)

    ray.shutdown()
    return {
        "metric": "index-build wall sec (turns/sec + BM25 p50 in fields)",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "turns": num_turns,
        "turns_per_sec": round(num_turns / build_sec, 1),
        "query_p50_ms": round(p50_ms, 2),
        "stage1_auto_p50_ms": round(wand_lat[len(wand_lat) // 2] * 1000, 2),
        "qps": qps,
        "concurrent_p50_ms": q_p50_ms,
        "query_p99_ms": q_p99_ms,
        "qps_keepalive": ka_qps,
        "keepalive_p99_ms": ka_p99_ms,
        "keepalive_errors": ka_errs,
        "effective_cores_probe": eff_pre,
        "effective_cores_probe_post": _effective_cores(0.5),
    }


def _ann_scan_fractions(sf_dir: str) -> dict:
    """Build both physical ANN layouts over the sf embeddings table and
    report the fraction of stored bytes the bench query set physically
    reads — the scan-pruning evidence for the hive-partitioned IVF lists
    and LSH signature buckets."""
    import shutil
    import tempfile

    import numpy as np

    from search_engine_ray.pipelines.queries import (ANN_QUERY_IDS,
                                                     _query_vecs,
                                                     read_parquet_clean)
    from search_engine_ray.stages.ann import (_hyperplanes, _normalize,
                                              _popcount64, _signatures,
                                              ivf_build, ivf_scan_stats,
                                              lsh_build, lsh_scan_stats)
    out: dict = {}
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(emb_path):
        return out
    qv = _normalize(_query_vecs(sf_dir))
    n_probe, probe_hamming = 4, 2

    # AUTO (√N) partition counts — the scale-aware defaults; the oracled
    # driver entries stay pinned to the SQL mirror's constants
    idx = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        cents = ivf_build(read_parquet_clean(emb_path), idx)
        out["ivf_n_lists"] = int(cents.shape[0])
        probe = np.argsort(-(qv @ cents.T), axis=1)[:, :n_probe]
        out["ivf_scan_fraction"] = ivf_scan_stats(idx, probe)[
            "scan_fraction"]
    finally:
        shutil.rmtree(idx, ignore_errors=True)

    idx = tempfile.mkdtemp(prefix="bench_lsh_")
    try:
        import json as _json
        planes = lsh_build(read_parquet_clean(emb_path), idx)
        with open(os.path.join(idx, "meta.json")) as f:
            bucket_bits = _json.load(f)["bucket_bits"]
        out["lsh_bucket_bits"] = int(bucket_bits)
        qtops = _signatures(qv, planes) >> np.uint64(
            planes.shape[0] - bucket_bits)
        all_b = np.arange(1 << bucket_bits, dtype=np.uint64)
        union = {int(b) for qt in qtops
                 for b in all_b[_popcount64(all_b ^ qt) <= probe_hamming]}
        out["lsh_scan_fraction"] = lsh_scan_stats(idx, [sorted(union)])[
            "scan_fraction"]
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return out


QPS_THREADS = int(os.environ.get("QPS_THREADS", "8"))
QPS_SHARDS = int(os.environ.get("QPS_SHARDS", "4"))
# QPS scales with shard-actor count (each actor is single-threaded and a
# query costs ~num_shards actor-call-ms): replicas add throughput without
# shrinking the per-actor doc slice
QPS_REPLICAS = int(os.environ.get("QPS_REPLICAS", "2"))


def _bench_qps(index_dir: str, n_threads: int = QPS_THREADS,
               n_shards: int = QPS_SHARDS,
               n_replicas: int = QPS_REPLICAS
               ) -> tuple[float, float, float, float, float, int]:
    """(qps, p50_ms, p99_ms, keepalive_qps, keepalive_p99_ms) for
    concurrent GET /search load against a ThreadingHTTPServer holding one
    warm ShardedQueryEngine.  The first triple uses one TCP connection
    per request (urllib, the historical protocol); the keep-alive pair
    reuses one persistent HTTP/1.1 connection per client thread — the
    path real search clients and the MCP transport take."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer
    from urllib.parse import quote

    from search_engine_ray.serving.http import make_handler
    from search_engine_ray.state.sharded import ShardedQueryEngine

    eng = ShardedQueryEngine(index_dir, num_shards=n_shards,
                             num_replicas=n_replicas)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    port = srv.server_address[1]
    st = threading.Thread(target=srv.serve_forever, daemon=True)
    st.start()
    urls = [f"http://127.0.0.1:{port}/search?q={quote(q)}&limit=20"
            for q in QUERY_SET]
    for u in urls[:10]:                       # warm shard actors + caches
        urllib.request.urlopen(u, timeout=30).read()

    lat: list[float] = []
    lock = threading.Lock()

    def worker():
        local = []
        for u in urls:
            t0 = time.time()
            urllib.request.urlopen(u, timeout=60).read()
            local.append(time.time() - t0)
        with lock:
            lat.extend(local)

    t_start = time.time()
    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t_start
    lat.sort()

    # keep-alive pass: one persistent HTTP/1.1 connection per thread
    import http.client
    from urllib.parse import urlparse

    def _path_query(u: str) -> str:
        parsed = urlparse(u)
        return parsed.path + ("?" + parsed.query if parsed.query else "")

    paths = [_path_query(u) for u in urls]
    ka_lat: list[float] = []
    ka_errors = [0]

    def ka_worker():
        local = []
        errs = 0
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            for p in paths:
                t0 = time.time()
                try:
                    conn.request("GET", p)
                    conn.getresponse().read()
                    local.append(time.time() - t0)
                except Exception:
                    errs += 1
                    conn.close()
                    conn = http.client.HTTPConnection("127.0.0.1", port,
                                                      timeout=60)
            conn.close()
        except Exception:
            errs += 1
        with lock:
            ka_lat.extend(local)
            ka_errors[0] += errs

    ka_start = time.time()
    ka_threads = [threading.Thread(target=ka_worker)
                  for _ in range(n_threads)]
    for t in ka_threads:
        t.start()
    for t in ka_threads:
        t.join()
    ka_wall = time.time() - ka_start
    srv.shutdown()
    eng.shutdown()
    ka_lat.sort()
    return (round(len(lat) / wall, 1),
            round(lat[len(lat) // 2] * 1000, 2),
            round(lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1000, 2),
            round(len(ka_lat) / ka_wall, 1) if ka_lat else 0.0,
            round(ka_lat[min(len(ka_lat) - 1, int(len(ka_lat) * 0.99))]
                  * 1000, 2) if ka_lat else 0.0,
            ka_errors[0])


SCALING_REPEATS = int(os.environ.get("SCALING_REPEATS", "2"))

# every child run (both repeats, both levels) is appended raw to this jsonl
# so the min-per-level protocol stays auditable (BASELINE.md "Scaling
# measurement honesty")
SCALING_LOG = os.environ.get("SCALING_LOG",
                             os.path.join(REPO, "SCALING_runs.jsonl"))


def _log_scaling_run(rec: dict) -> None:
    try:
        with open(SCALING_LOG, "a") as f:
            f.write(json.dumps({"wall_clock": time.strftime(
                "%Y-%m-%dT%H:%M:%S"), **rec}) + "\n")
    except OSError:
        pass


def _probe_spin(seconds: float) -> int:
    t = time.time()
    n = 0
    while time.time() - t < seconds:
        n += 1
    return n


def _effective_cores(seconds: float = 1.0) -> float:
    """Measured parallel CPU capacity actually available RIGHT NOW (shared
    host!): 32 spin processes, sum-of-iterations / best-single-process.
    Logged with every scaling child so a neighbor-tenant-contended run is
    distinguishable from a code regression in the audit trail (observed:
    the same 32-cpu build at 200 s on a quiet host and 572 s when this
    probe reads < 12)."""
    import multiprocessing as mp
    with mp.Pool(32) as p:
        r = p.map(_probe_spin, [seconds] * 32)
    return round(sum(r) / max(r), 1)


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Each level runs SCALING_REPEATS fresh processes on the SAME input and
    the fastest run counts: the shared sandbox host shows 2x run-to-run
    noise (disk/host contention), and min-time per level is the standard
    way to measure the machine rather than the noise."""
    # warm the corpus cache so generation isn't timed in either child
    _bench_corpus(_sf_from_dir(sf_dir), SCALING_MULT)
    results = {}
    for cpus in (lo, hi):
        best = None
        for _ in range(SCALING_REPEATS):
            env = dict(os.environ, GRAFT_SF_DIR=sf_dir,
                       RAY_GRAFT_CPUS=str(cpus),
                       SCALING_MULT=str(SCALING_MULT))
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--child",
                 "--mult", str(SCALING_MULT), "--build-only"],
                env=env, capture_output=True, text=True, timeout=3600)
            lines = [l for l in out.stdout.strip().splitlines()
                     if l.startswith("{")]
            if not lines:
                sys.stderr.write(f"scaling child cpus={cpus} failed:\n"
                                 f"{out.stderr[-2000:]}\n")
                raise RuntimeError(
                    f"scaling child cpus={cpus} produced no JSON")
            r = json.loads(lines[-1])
            sys.stderr.write(f"scaling child cpus={cpus}: {r['value']}s "
                             f"{ {k: v for k, v in r['queries'].items()} }\n")
            _log_scaling_run({"cpus": cpus, "mult": SCALING_MULT,
                              "effective_cores_probe": _effective_cores(),
                              **r})
            if best is None or r["value"] < best["value"]:
                best = r
        results[cpus] = best
    tp_lo = results[lo]["turns_per_sec"]
    tp_hi = results[hi]["turns_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (throughput ratio / resource ratio)",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {f"build_cpus{lo}": results[lo]["queries"]["index_build"],
                    f"build_cpus{hi}": results[hi]["queries"]["index_build"]},
        "sf": results[hi]["sf"],
        "num_cpus": hi,
        "turns": results[hi]["turns"],
        "turns_per_sec_lo": tp_lo,
        "turns_per_sec_hi": tp_hi,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        lo = int(os.environ.get("SCALING_LO", "8"))
        hi = int(os.environ.get("SCALING_HI", "32"))
        print(json.dumps(run_scaling(SF_DIR, lo, hi)))
    else:
        mult = 1
        if "--mult" in sys.argv:
            mult = int(sys.argv[sys.argv.index("--mult") + 1])
        print(json.dumps(run_once(NUM_CPUS, SF_DIR, mult,
                                  build_only="--build-only" in sys.argv)))
