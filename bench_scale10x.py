"""10× corpus cost-model validation (round-3; VERDICT r2 next-round #7).

Runs the SAME build + query + incremental-upsert suite at two corpus
sizes a decade apart (default 200k and 2M docs, deterministic input_hint
corpus, identical IndexConfig) in ONE session, and reports the ratios the
cost models predict:

  * build docs/sec        — should be flat-or-better at 10× (per-doc work
                            constant; fixed driver/job costs amortize);
  * query p50/p95         — serving path is posting-bounded: grows with
                            df (∝ corpus) but sub-linearly for top-k
                            thanks to MaxScore block skipping; Spark path
                            sits on its scheduling floor;
  * incremental upsert    — shard-bounded: wall ∝ |touched shards| ×
                            shard_size, NOT corpus size, so the 10×
                            corpus should pay ≈ the same wall;
  * snapshot clone        — O(#files) hardlinks: grows with shard count
                            only, stays ~ms.

The VM's delivered CPU fluctuates ~2× (noisy neighbors), so a
vm_cpu_score calibration pair brackets each scale's measurement and the
two scales run back-to-back in the same session (same weather window).

Usage: python bench_scale10x.py [small] [big]   (defaults 200000 2000000)
Prints one JSON line; BENCH.md carries the narrative table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

from bench import CFG, PHRASES, QUERIES, _vm_cpu_score
from maestro_spark.operators.build import build_index
from maestro_spark.operators.incremental import incremental_update
from maestro_spark.operators.search import IndexReader, reset_prune_stats
from maestro_spark.session import get_spark
from maestro_spark.sources.corpus import synth_docs
from maestro_spark.sources.tableio import hardlink_clone


def run_scale(spark, n_docs: int) -> dict:
    out: dict = {"n_docs": n_docs, "vm_cpu_pre": _vm_cpu_score()}
    idx_dir = tempfile.mkdtemp(prefix=f"scale10x_{n_docs}_")
    try:
        docs = synth_docs(spark, n_docs, seed=42)
        t0 = time.time()
        manifest = build_index(spark, docs, idx_dir, CFG)
        wall = time.time() - t0
        n_post = sum(s["n_postings"] for s in manifest["shards"].values())
        out.update(
            build_wall_s=round(wall, 2),
            docs_per_sec=round(n_docs / wall, 1),
            postings_per_sec=round(n_post / wall, 1),
            n_postings=n_post,
            posting_bytes=sum(s["bytes"] for s in manifest["shards"].values()),
            n_shards=len(manifest["shards"]),
            phase_ms=manifest.get("phase_ms", {}),
        )

        reader = IndexReader(spark, idx_dir)
        reader.search("warmup", k=10).collect()
        lat = []
        for _ in range(3):
            for q in QUERIES:
                t1 = time.time()
                reader.search(q, k=10).collect()
                lat.append(time.time() - t1)
        best = np.asarray(lat).reshape(3, len(QUERIES)).min(axis=0)
        out["spark_query_p50_s"] = round(float(np.percentile(best, 50)), 4)
        out["spark_query_p95_s"] = round(float(np.percentile(best, 95)), 4)

        reader.search_local("warmup", k=10)
        lat = []
        for _ in range(3):
            for q in QUERIES:
                t1 = time.time()
                reader.search_local(q, k=10)
                lat.append(time.time() - t1)
        best = np.asarray(lat).reshape(3, len(QUERIES)).min(axis=0)
        out["local_query_p50_s"] = round(float(np.percentile(best, 50)), 4)
        out["local_query_p95_s"] = round(float(np.percentile(best, 95)), 4)

        ph = []
        for p in PHRASES:
            t1 = time.time()
            reader.phrase_search_local(p, k=10)
            ph.append(time.time() - t1)
        out["local_phrase_max_s"] = round(max(ph), 4)

        # MaxScore audit: decoded vs total blocks for the query mix —
        # the sub-linear-growth claim made concrete.
        reset_prune_stats()
        for q in QUERIES:
            reader.search_local(q, k=10)
        st = reset_prune_stats()
        out["prune_blocks_decoded"] = st["blocks_decoded"]
        out["prune_blocks_total"] = st["blocks_total"]

        batch = {f"q{i}": QUERIES[i % len(QUERIES)] for i in range(96)}
        t1 = time.time()
        reader.search_many_local(batch, k=10)
        out["msearch_local_qps"] = round(96.0 / (time.time() - t1), 1)

        clone_dir = idx_dir + "_snap"
        t1 = time.time()
        n_linked = hardlink_clone(idx_dir, clone_dir)
        out["snapshot_clone_s"] = round(time.time() - t1, 4)
        out["snapshot_files_linked"] = n_linked
        shutil.rmtree(clone_dir, ignore_errors=True)

        stored = spark.read.parquet(idx_dir + "/docs")
        mod = (stored.orderBy("doc_id").limit(100)
               .select("repo", "path", "commit", "lang",
                       F.concat(F.col("content"),
                                F.lit(" zzqscaleedit")).alias("content")))
        t1 = time.time()
        m_inc = incremental_update(spark, idx_dir, mod, None, CFG)
        out["incremental_upsert_100_s"] = round(time.time() - t1, 2)
        out["incremental_rebuilt_shards"] = (
            len(m_inc["shards"]) - len(m_inc.get("skipped_shards", [])))
        out["vm_cpu_post"] = _vm_cpu_score()
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return out


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark("scale10x")
    spark.sparkContext.setLogLevel("ERROR")
    res = {"small": run_scale(spark, small), "big": run_scale(spark, big)}
    s, b = res["small"], res["big"]
    res["ratios"] = {
        "corpus": round(b["n_docs"] / s["n_docs"], 2),
        "docs_per_sec": round(b["docs_per_sec"] / s["docs_per_sec"], 3),
        "local_p95": round(b["local_query_p95_s"] / s["local_query_p95_s"], 2),
        "spark_p95": round(b["spark_query_p95_s"] / s["spark_query_p95_s"], 2),
        "upsert_wall": round(b["incremental_upsert_100_s"]
                             / s["incremental_upsert_100_s"], 2),
    }
    spark.stop()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_scale10x.json")
    with open(out, "w") as f:
        f.write(json.dumps(res) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
