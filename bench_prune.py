"""Block-max pruning evidence on a Zipf-skewed corpus (VERDICT r3 #5).

The flat synthetic bench corpus decodes 2,959/3,222 blocks because its
term impacts don't discriminate (every block's max BM25 bound looks
alike). Real corpora are Zipf: a few docs carry high tf for a term,
most carry tf=1 — and Lucene's documented remedy for making block-max
skipping bite is INDEX SORTING by impact proxy, clustering high-impact
docs into few blocks so theta (the floating top-k threshold) is
reached early and the long tf=1 tail is bounded out without decoding.

This bench builds TWO indexes over the SAME skewed corpus:

  * clustered — docs id-ordered by descending total query-term tf
    (the index-sorting deployment; hot blocks first);
  * scattered — the same rows in hash order (impact spread uniformly,
    every block contains a hot doc → maxima can't discriminate).

and reports, for 2-term and 3-term OR/AND queries: wall, top-k,
decoded/total posting blocks (PRUNE_STATS), with a bit-identical
assert of prune=True vs prune=False per query. The target row:
clustered decoded/total < 0.5 with identical results.

Usage: python bench_prune.py [n_docs]   (default 200000)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import numpy as np

from bench import _vm_cpu_score
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader, reset_prune_stats

# AUTO_SHARD: the round-4 derive_shard_size config (65k docs/shard at
# this corpus → 4 shards at 200k). Fewer, bigger shards concentrate
# each top-k pass: theta is per shard, so the derived sizing prunes
# HARDER than the 8192-doc bench sharding (25 shards) — the config
# rule and the pruning evidence reinforce each other.
from maestro_spark.operators.build import AUTO_SHARD

CFG = IndexConfig(shard_size=AUTO_SHARD, n_buckets=16, n_salts=8,
                  hot_df_fraction=0.02, sample_fraction=0.05)

# letter-only filler vocabulary (the code tokenizer splits digits off)
_FILL = ["lorem", "ipsum", "dolor", "amet", "consectetur", "adipiscing",
         "elit", "vivamus", "porta", "fermentum", "aliquam", "viverra",
         "sagittis", "rhoncus", "pretium", "sodales"]

QUERIES = [
    ("alpha", "or"),              # 1-term: BMW ub-ordered early stop
    ("beta alpha", "or"),         # 2-term selective+common: MaxScore
    ("beta gamma alpha", "or"),   # 3-term: common terms candidates-only
]


def _corpus_rows(n_docs: int):
    """Deterministic Zipf-skewed rows in the realistic query-mix shape
    (MaxScore prunes when idfs DIFFER — a flat all-common query keeps
    every term essential and rightly decodes everything):

      alpha — common (30% of docs), tf from a Zipf(1.5) tail capped at
              64: ~1% of carriers are high-impact, the long tail is
              tf=1 (the BMW skip target);
      gamma — medium (5%), same tf shape;
      beta  — selective (0.2%), tf 1..3 — the high-idf anchor that
              drives theta above the common terms' upper bounds, so
              their postings decode only candidate-intersecting blocks.
    """
    rng = np.random.default_rng(13)
    rows = []
    for i in range(n_docs):
        parts = []
        impact = 0
        for term, p in (("alpha", 0.30), ("gamma", 0.05), ("beta", 0.002)):
            if rng.random() < p:
                tf = (int(rng.integers(1, 4)) if term == "beta"
                      else int(min(64, rng.zipf(1.5))))
                parts.extend([term] * tf)
                impact += tf
        fill = rng.integers(0, len(_FILL), size=int(rng.integers(8, 40)))
        parts.extend(_FILL[j] for j in fill)
        rng.shuffle(parts)
        rows.append((f"org{i % 37}/repo{i % 11}", f"src/f{i}.py",
                     f"c{i:08d}", "python", " ".join(parts), impact))
    return rows


def _build(spark, rows, out_dir: str, clustered: bool):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, impact int")
    order = (F.desc("impact") if clustered
             else F.asc(F.xxhash64("repo", "path")))  # hash scatter
    w = Window.orderBy(order, "repo", "path")
    with_ids = (df.withColumn("doc_id",
                              (F.row_number().over(w) - 1).cast("long"))
                .drop("impact"))
    build_index(spark, with_ids, out_dir, CFG, id_col="doc_id")


def _measure(idx_dir: str) -> dict:
    r = IndexReader(None, idx_dir)
    out = {}
    for q, mode in QUERIES:
        key = f"{q.replace(' ', '_')}_{mode}"
        r.search_local(q, k=10, mode=mode)          # warm posting cache
        reset_prune_stats()
        t0 = time.time()
        pruned = r.search_local(q, k=10, mode=mode)
        wall = time.time() - t0
        st = reset_prune_stats()
        exact = r.search_local(q, k=10, mode=mode, prune=False)
        assert pruned["doc_id"].tolist() == exact["doc_id"].tolist(), key
        np.testing.assert_array_equal(pruned["score"].to_numpy(),
                                      exact["score"].to_numpy(),
                                      err_msg=key)
        out[key] = {
            "wall_ms": round(wall * 1000, 1),
            "blocks_decoded": st["blocks_decoded"],
            "blocks_total": st["blocks_total"],
            "decoded_frac": round(
                st["blocks_decoded"] / max(1, st["blocks_total"]), 3),
        }
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from maestro_spark.session import get_spark

    vm_pre = _vm_cpu_score()
    rows = _corpus_rows(n_docs)
    spark = get_spark("bench_prune")
    d_clu = tempfile.mkdtemp(prefix="prune_clu_")
    d_sca = tempfile.mkdtemp(prefix="prune_sca_")
    try:
        _build(spark, rows, d_clu, clustered=True)
        _build(spark, rows, d_sca, clustered=False)
        spark.stop()
        clu = _measure(d_clu)
        sca = _measure(d_sca)
        worst = max(v["decoded_frac"] for v in clu.values())
        print(json.dumps({
            "metric": "block-max pruning on Zipf-skewed corpus "
                      "(clustered=index-sorted by impact vs scattered)",
            "n_docs": n_docs,
            "clustered": clu,
            "scattered": sca,
            "clustered_worst_decoded_frac": worst,
            "target_met_decoded_lt_0.5": bool(worst < 0.5),
            "vm_cpu_score": [vm_pre, _vm_cpu_score()],
        }))
    finally:
        shutil.rmtree(d_clu, ignore_errors=True)
        shutil.rmtree(d_sca, ignore_errors=True)


if __name__ == "__main__":
    main()
