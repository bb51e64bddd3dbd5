"""ServingPool worker-scaling benchmark (round-4; VERDICT r3 #1).

The 10× run showed single-process serving p95 growing 3.2× at 2M docs /
245 shards because ONE interpreter walks every shard. ServingPool is
the ES-cluster answer: W data-node processes own disjoint shard
subsets. This bench measures, on the SAME big index:

  * sequential baseline — IndexReader(None, dir).search_local p50/p95
  * pool at each W in workers_csv — ServingPool.search p50/p95 + QPS

with bit-identical results (asserted per query against the baseline),
so the only thing changing is wall-clock. "Scaling with workers, not
shards alone" = p95(W) falling as W grows at fixed shard count.

The index is cached under /tmp/bench_pool_idx_{n_docs}_v1 and reused
across runs (building 2M docs costs ~25 min; the serving measurements
are the point here). vm_cpu_score calibration brackets the run.

Usage: python bench_pool.py [n_docs] [workers_csv] [reps_per_query] [idx_dir]
       (defaults 2000000, "1,2,4,8", 5, the cached bench_pool index;
        pass e.g. /tmp/bench_auto_idx_2000000_v1 for the AUTO_SHARD
        layout)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from bench import CFG, _vm_cpu_score
from maestro_spark.operators.search import IndexReader
from maestro_spark.operators.serving import ServingPool

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


def _ensure_index(n_docs: int) -> str:
    idx = f"/tmp/bench_pool_idx_{n_docs}_v1"
    if os.path.exists(os.path.join(idx, "manifest.json")):
        return idx
    from maestro_spark.operators.build import build_index
    from maestro_spark.session import get_spark
    from maestro_spark.sources.corpus import synth_docs

    spark = get_spark("bench_pool_build")
    t0 = time.time()
    build_index(spark, synth_docs(spark, n_docs, seed=42), idx, CFG)
    print(f"# built {n_docs} docs in {time.time() - t0:.0f}s",
          file=sys.stderr)
    spark.stop()
    return idx


def _lat_stats(lats: list[float]) -> dict:
    a = np.array(lats)
    return {
        "p50_ms": round(float(np.percentile(a, 50)) * 1000, 1),
        "p95_ms": round(float(np.percentile(a, 95)) * 1000, 1),
        "mean_ms": round(float(a.mean()) * 1000, 1),
        "qps": round(len(a) / a.sum(), 1),
    }


def _run_queries(search_fn, reps: int) -> list[float]:
    lats = []
    for _ in range(reps):
        for q in QUERIES:
            t0 = time.time()
            search_fn(q)
            lats.append(time.time() - t0)
    return lats


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    workers = [int(w) for w in
               (sys.argv[2] if len(sys.argv) > 2 else "1,2,4,8").split(",")]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    idx = sys.argv[4] if len(sys.argv) > 4 else _ensure_index(n_docs)
    vm_pre = _vm_cpu_score()
    n_shards = len(IndexReader(None, idx).manifest["shards"])

    # sequential baseline + golden results for the parity assert
    seq = IndexReader(None, idx)
    for q in QUERIES:
        seq.search_local(q, k=10)                 # warm caches
    seq_lats = _run_queries(lambda q: seq.search_local(q, k=10), reps)
    golden = {q: seq.search_local(q, k=10) for q in QUERIES}

    levels = {}
    for w in workers:
        with ServingPool(idx, n_workers=w) as pool:
            for q in QUERIES:                     # warm worker caches
                got = pool.search(q, k=10)
                assert got["doc_id"].tolist() == \
                    golden[q]["doc_id"].tolist(), f"parity broke: {q}"
                np.testing.assert_array_equal(
                    got["score"].to_numpy(),
                    golden[q]["score"].to_numpy(), err_msg=q)
            lats = _run_queries(lambda q: pool.search(q, k=10), reps)
        levels[str(w)] = _lat_stats(lats)

    seq_stats = _lat_stats(seq_lats)
    best_w = min(levels, key=lambda w: levels[w]["p95_ms"])
    print(json.dumps({
        "metric": "ServingPool p50/p95 vs worker count (same index)",
        "n_docs": n_docs,
        "n_shards": n_shards,
        "reps_per_query": reps,
        "sequential": seq_stats,
        "pool": levels,
        "best_workers": int(best_w),
        "p95_speedup_vs_sequential": round(
            seq_stats["p95_ms"] / levels[best_w]["p95_ms"], 2),
        "vm_cpu_score": [vm_pre, _vm_cpu_score()],
    }))


if __name__ == "__main__":
    main()
