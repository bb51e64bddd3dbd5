"""top_hits skew re-measure at 10× corpus (VERDICT r3 #6).

The round-3 skew-proof rework (two-phase bounded heap, no match-set
window) regressed the sf0.1 wall 1.4× (1.30 → 1.84 s) — the trade is
per-task heap bookkeeping against straggler immunity, which only pays
at scale. This bench confirms the trade at 2M docs with an engineered
hot bucket:

  * the repo synth corpus gives `repo` ~O(40) values; the query is a
    common term, so one bucket ("hot") is forced to hold ~50 % of all
    matches by querying a term the generator concentrates — we instead
    group by an expression that maps half the matches to one bucket:
    F.when(doc_id % 2 == 0, 'hot').otherwise(repo), the deterministic
    50 %-hot-bucket shape of test_top_hits_skew at bench scale.
  * evidence of "no single-task straggler": wall for the hot-bucket
    grouping vs the uniform grouping (same match set, same phases) —
    a window-based plan would pay the hot bucket on one task and the
    ratio blows up; the bounded-heap plan keeps them within noise.
  * wall scaling with match set: the same query at 200k docs (the
    10×-down corpus) — wall should scale ≈ with matches, not bucket
    shape.

Reuses the cached bench_pool index (/tmp/bench_pool_idx_{n}_v1) when
present so the 2M build is paid once per session.

Usage: python bench_tophits.py [big_docs] [small_docs]
       (defaults 2000000 200000)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from bench import _vm_cpu_score
from bench_pool import _ensure_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.session import get_spark

QUERY = "return"          # high-df term: big match set


def _measure(spark, idx_dir: str) -> dict:
    r = IndexReader(spark, idx_dir)
    n_matches = r.count_local(QUERY)
    out = {"n_matches": n_matches}
    hot = F.when((F.col("doc_id") % 2) == 0, F.lit("hot")) \
        .otherwise(F.col("repo"))
    for name, grp in (("uniform", F.col("repo")), ("hot50", hot)):
        r.search_top_hits(QUERY, grp, per_group=3, k_groups=10).collect()
        t0 = time.time()
        r.search_top_hits(QUERY, grp, per_group=3, k_groups=10).collect()
        out[f"wall_s_{name}"] = round(time.time() - t0, 3)
    out["hot_over_uniform"] = round(
        out["wall_s_hot50"] / out["wall_s_uniform"], 3)
    return out


def main() -> None:
    big = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    vm_pre = _vm_cpu_score()
    big_idx = _ensure_index(big)
    small_idx = _ensure_index(small)
    spark = get_spark("bench_tophits")
    try:
        b = _measure(spark, big_idx)
        s = _measure(spark, small_idx)
        print(json.dumps({
            "metric": "top_hits bounded-heap: hot-bucket immunity + "
                      "match-set scaling at 10x corpus",
            "big": {"n_docs": big, **b},
            "small": {"n_docs": small, **s},
            "wall_ratio_big_over_small_uniform": round(
                b["wall_s_uniform"] / s["wall_s_uniform"], 2),
            "match_ratio_big_over_small": round(
                b["n_matches"] / max(1, s["n_matches"]), 2),
            "vm_cpu_score": [vm_pre, _vm_cpu_score()],
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
