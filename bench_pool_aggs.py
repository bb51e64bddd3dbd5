"""ServingPool phrase + agg fan-out benchmark (round-5; VERDICT r4 #4/#5).

Round 4 benched pool.search/msearch/count; this measures, on the SAME
cached 2M-doc index bench_pool.py uses:

  * phrase       — dfs_query_then_fetch two-phase fan-out p50/p95 at
                   each W vs the sequential phrase_search_local baseline
  * facets       — pool.facets vs facets_local
  * sig_terms    — pool.significant_terms vs significant_terms_local
                   (foreground auto-routes to the sampler over budget —
                   the realistic stop-word-adjacent path at 2M)
  * top_hits     — pool.top_hits vs top_hits_local

Every pool result is asserted bit-identical to its single-process
baseline in-bench (the parity IS the contract; only wall-clock may
change). vm_cpu_score calibration brackets the run.

Usage: python bench_pool_aggs.py [n_docs] [workers_csv] [reps] [idx_dir]
       (defaults 2000000, "1,4,8", 3, the cached bench_pool index;
        pass e.g. /tmp/bench_auto_idx_2000000_v1 to measure the
        AUTO_SHARD layout)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from bench import PHRASES, _vm_cpu_score
from bench_pool import _ensure_index, _lat_stats
from maestro_spark.operators.search import IndexReader
from maestro_spark.operators.serving import ServingPool

AGG_QUERIES = ["getUserName", "index query merge", "error retry handler"]
SIG_QUERIES = ["getUserName", "error retry handler"]


def _assert_hits(a, b, msg):
    assert a["doc_id"].tolist() == b["doc_id"].tolist(), msg
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy(), err_msg=msg)


def _assert_frames(a, b, msg):
    assert list(a.columns) == list(b.columns), msg
    assert len(a) == len(b), f"{msg}: rows {len(a)} vs {len(b)}"
    for c in a.columns:
        if a[c].dtype == np.float64:
            np.testing.assert_array_equal(a[c].to_numpy(),
                                          b[c].to_numpy(),
                                          err_msg=f"{msg}:{c}")
        else:
            assert a[c].tolist() == b[c].tolist(), f"{msg}:{c}"


def _time_each(fn, items, reps):
    lats = []
    for _ in range(reps):
        for it in items:
            t0 = time.time()
            fn(it)
            lats.append(time.time() - t0)
    return lats


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    workers = [int(w) for w in
               (sys.argv[2] if len(sys.argv) > 2 else "1,4,8").split(",")]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    idx = sys.argv[4] if len(sys.argv) > 4 else _ensure_index(n_docs)
    vm_pre = _vm_cpu_score()
    seq = IndexReader(None, idx)
    n_shards = len(seq.manifest["shards"])

    # ---- sequential baselines (warm, then time) + goldens ------------
    for ph in PHRASES:
        seq.phrase_search_local(ph, k=10)
    g_phrase = {ph: seq.phrase_search_local(ph, k=10) for ph in PHRASES}
    seq_phrase = _lat_stats(_time_each(
        lambda p: seq.phrase_search_local(p, k=10), PHRASES, reps))

    g_facets = {q: seq.facets_local(q, ("lang",)) for q in AGG_QUERIES}
    seq_facets = _lat_stats(_time_each(
        lambda q: seq.facets_local(q, ("lang",)), AGG_QUERIES, reps))

    g_sig = {q: seq.significant_terms_local(q, size=15)
             for q in SIG_QUERIES}
    seq_sig = _lat_stats(_time_each(
        lambda q: seq.significant_terms_local(q, size=15),
        SIG_QUERIES, reps))

    g_top = {q: seq.top_hits_local(q, "repo", per_group=2, k_groups=5)
             for q in AGG_QUERIES}
    seq_top = _lat_stats(_time_each(
        lambda q: seq.top_hits_local(q, "repo", per_group=2, k_groups=5),
        AGG_QUERIES, reps))

    out = {
        "metric": "ServingPool phrase+agg fan-out p50/p95 vs workers",
        "n_docs": n_docs, "n_shards": n_shards, "reps": reps,
        "sequential": {"phrase": seq_phrase, "facets": seq_facets,
                       "significant_terms": seq_sig, "top_hits": seq_top},
        "pool": {},
    }

    for w in workers:
        with ServingPool(idx, n_workers=w) as pool:
            for ph in PHRASES:   # warm + parity
                _assert_hits(pool.phrase(ph, k=10), g_phrase[ph],
                             f"phrase W={w} {ph}")
            lp = _time_each(lambda p: pool.phrase(p, k=10), PHRASES, reps)
            for q in AGG_QUERIES:
                _assert_frames(pool.facets(q, ("lang",)), g_facets[q],
                               f"facets W={w} {q}")
            lf = _time_each(lambda q: pool.facets(q, ("lang",)),
                            AGG_QUERIES, reps)
            for q in SIG_QUERIES:
                _assert_frames(pool.significant_terms(q, size=15),
                               g_sig[q], f"sig W={w} {q}")
            ls = _time_each(
                lambda q: pool.significant_terms(q, size=15),
                SIG_QUERIES, reps)
            for q in AGG_QUERIES:
                _assert_frames(
                    pool.top_hits(q, "repo", per_group=2, k_groups=5),
                    g_top[q], f"top_hits W={w} {q}")
            lt = _time_each(
                lambda q: pool.top_hits(q, "repo", per_group=2,
                                        k_groups=5), AGG_QUERIES, reps)
        out["pool"][str(w)] = {
            "phrase": _lat_stats(lp), "facets": _lat_stats(lf),
            "significant_terms": _lat_stats(ls), "top_hits": _lat_stats(lt),
        }

    out["vm_cpu_score"] = [vm_pre, _vm_cpu_score()]
    out["parity"] = "bit-identical (asserted in-bench at every W)"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
