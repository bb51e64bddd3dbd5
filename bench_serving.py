"""Serving-tier scaling benchmark: QPS of JVM-free serving processes at
1 vs 4 workers over the same index — the query-side N vs 4N evidence.

The serving deployment model is many independent processes behind a
balancer, each `IndexReader(None, dir)` (no SparkSession, no JVM, no
shared state beyond the read-only store + page cache), so scaling
across processes is the production scaling axis — unlike the Spark
interactive path, there is no per-batch driver term to amortize (see
BENCH.md "Query-side scaling").

Method mirrors bench_scaling.py: fresh worker processes per sample,
levels interleaved 1/4/1/4 so both see the same VM weather, best-of-N
per level, all samples reported. Prints ONE JSON line.

Usage: python bench_serving.py [n_docs] [queries_per_worker] [repeats]
       (defaults 20000, 400, 2)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

QUERIES = [
    "return",
    "getUserName",
    "index query merge",
    "lang:java stream",
    "path:util",
    "repo:org0/repo0 cache",
    "fetchUpdate batchWriter",
    "error retry handler",
]


def _worker(args):
    idx_dir, n_queries = args
    from maestro_spark.operators.search import IndexReader

    r = IndexReader(None, idx_dir)
    r.search_local("warmup", k=10)
    t0 = time.time()
    for i in range(n_queries):
        r.search_local(QUERIES[i % len(QUERIES)], k=10)
    return n_queries, time.time() - t0


def run_level(idx_dir: str, procs: int, n_queries: int) -> dict:
    ctx = mp.get_context("spawn")  # clean children: no inherited JVM/threads
    t0 = time.time()
    with ctx.Pool(procs) as pool:
        results = pool.map(_worker, [(idx_dir, n_queries)] * procs)
    wall = time.time() - t0
    total = sum(n for n, _ in results)
    return {
        "procs": procs,
        "total_queries": total,
        "wall_s": round(wall, 3),
        "qps": round(total / wall, 1),
        "per_worker_wall_s": [round(w, 3) for _, w in results],
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    idx_dir = tempfile.mkdtemp(prefix="serve_bench_idx_")
    try:
        # build once with Spark, then STOP the JVM before any measurement
        from maestro_spark.operators.build import IndexConfig, build_index
        from maestro_spark.session import get_spark
        from maestro_spark.sources.corpus import synth_docs

        spark = get_spark("serve_bench")
        cfg = IndexConfig(shard_size=2048, n_buckets=16, n_salts=8,
                          hot_df_fraction=0.02, sample_fraction=0.05,
                          store_positions=True)
        build_index(spark, synth_docs(spark, n_docs, seed=42), idx_dir, cfg)
        spark.stop()

        lo_runs, hi_runs = [], []
        for _ in range(repeats):
            lo_runs.append(run_level(idx_dir, 1, n_queries))
            hi_runs.append(run_level(idx_dir, 4, n_queries))
        lo = max(lo_runs, key=lambda r: r["qps"])
        hi = max(hi_runs, key=lambda r: r["qps"])
        eff = hi["qps"] / (4.0 * lo["qps"])
        print(json.dumps({
            "metric": "serving-tier QPS scaling 1 -> 4 processes",
            "n_docs": n_docs,
            "low": lo,
            "high": hi,
            "low_samples_qps": [r["qps"] for r in lo_runs],
            "high_samples_qps": [r["qps"] for r in hi_runs],
            "speedup": round(hi["qps"] / lo["qps"], 3),
            "scaling_efficiency": round(eff, 3),
        }))
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
