"""Two-parallelism scaling benchmark — the sandbox stand-in for the north
rule's N vs 4N executors criterion (BASELINE.md: scaling efficiency ≥ 0.8).

Runs the SAME index build on the SAME deterministic corpus at local[N] and
local[4N] (each in a fresh subprocess so the JVM/thread pool is clean),
then reports docs/sec at both and efficiency = thr_4N / (4 · thr_N).

The corpus generator is counter-based per row (sources/corpus.py), so both
runs consume byte-identical input regardless of partitioning. Writes
results to BENCH.md and prints one JSON line.

Usage: python bench_scaling.py [n_docs] [N]   (defaults 40000, 8)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import json, shutil, sys, tempfile, time
from maestro_spark.session import get_spark
from maestro_spark.sources.corpus import synth_docs
from maestro_spark.operators.build import IndexConfig, build_index

n_docs, cores = int(sys.argv[1]), int(sys.argv[2])
# shuffle_partitions == cores kept deliberately (comparable with every
# table row in BENCH.md): a 4-tasks-per-core variant was tried in
# round-3 session 11 and did NOT raise the measured ratio (0.728 vs
# 0.769 in adjacent windows — per-task overhead ate the skew headroom
# at this corpus size; see BENCH.md session 12 note)
spark = get_spark("scale_bench", master=f"local[{cores}]",
                  shuffle_partitions=max(cores, 4))
cfg = IndexConfig(shard_size=8192, n_buckets=16, n_salts=8,
                  hot_df_fraction=0.02, sample_fraction=0.05)
out = tempfile.mkdtemp(prefix=f"scale_{cores}_")
docs = synth_docs(spark, n_docs, seed=42)
t0 = time.time()
manifest = build_index(spark, docs, out, cfg)
wall = time.time() - t0
n_postings = sum(s["n_postings"] for s in manifest["shards"].values())
print(json.dumps({
    "cores": cores, "wall_s": round(wall, 2),
    "docs_per_sec": round(n_docs / wall, 1),
    "postings_per_sec": round(n_postings / wall, 1),
    "n_postings": n_postings,
    "posting_bytes": sum(s["bytes"] for s in manifest["shards"].values()),
    "phase_ms": manifest["phase_ms"],
}))
shutil.rmtree(out, ignore_errors=True)
spark.stop()
"""


def run_one(n_docs: int, cores: int) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    p = subprocess.run(
        [sys.executable, "-c", WORKER, str(n_docs), str(cores)],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise SystemExit(f"worker at local[{cores}] failed")
    return json.loads(p.stdout.strip().splitlines()[-1])


def run_best(n_docs: int, n: int, repeats: int) -> tuple[dict, list, dict, list]:
    """Best-of-N wall clock, levels INTERLEAVED (lo,hi,lo,hi,…) so both
    see the same distribution of VM weather. The sandbox VM's delivered
    CPU fluctuates (noisy neighbors: identical runs vary ~2×), so a
    single sample measures the neighbor, not the engine; best-of-N at
    each level is the standard remedy and all samples are reported."""
    lo_runs, hi_runs = [], []
    for _ in range(repeats):
        lo_runs.append(run_one(n_docs, n))
        hi_runs.append(run_one(n_docs, 4 * n))
    lo = max(lo_runs, key=lambda r: r["docs_per_sec"])
    hi = max(hi_runs, key=lambda r: r["docs_per_sec"])
    return (lo, [r["docs_per_sec"] for r in lo_runs],
            hi, [r["docs_per_sec"] for r in hi_runs])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    lo, lo_all, hi, hi_all = run_best(n_docs, n, repeats)
    eff = hi["docs_per_sec"] / (4.0 * lo["docs_per_sec"])
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    result = {
        "metric": f"index-build scaling local[{n}] -> local[{4*n}]",
        "n_docs": n_docs,
        "low": lo,
        "high": hi,
        "low_samples_docs_per_sec": lo_all,
        "high_samples_docs_per_sec": hi_all,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    md = f"""# BENCH — scaling evidence (north rule: efficiency ≥ 0.8 at N → 4N)

Same deterministic corpus ({n_docs} docs, input_hint schema), same code,
two parallelism levels in fresh subprocesses (local[{n}] vs local[{4*n}]
standing in for N vs 4N executors — no real cluster in this sandbox,
per BASELINE.md). Best of {repeats} runs per level — the sandbox VM's
delivered CPU fluctuates ~2× run-to-run (noisy neighbors), so single
samples measure the neighbor, not the engine; every sample is listed.

| parallelism | wall s (best) | docs/sec (best) | postings/sec | all samples (docs/sec) |
|---|---|---|---|---|
| local[{n}] | {lo['wall_s']} | {lo['docs_per_sec']} | {lo['postings_per_sec']} | {lo_all} |
| local[{4*n}] | {hi['wall_s']} | {hi['docs_per_sec']} | {hi['postings_per_sec']} | {hi_all} |

**Speedup {n}→{4*n} cores: {speedup:.2f}×; scaling efficiency: {eff:.3f}**
(efficiency = throughput_4N / (4 × throughput_N)).

Phase breakdown (ms):

| phase | local[{n}] | local[{4*n}] |
|---|---|---|
""" + "\n".join(
        f"| {ph} | {lo['phase_ms'].get(ph, '-')} | {hi['phase_ms'].get(ph, '-')} |"
        for ph in lo["phase_ms"]
    ) + f"""

Run: `python bench_scaling.py {n_docs} {n}` — emits this file + one JSON line.
"""
    # regenerate only the auto-written header block; hand-written analysis
    # sections (everything from the first "## " heading on) are preserved
    bench_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
    tail = ""
    if os.path.exists(bench_path):
        old = open(bench_path).read()
        cut = old.find("\n## ")
        if cut != -1:
            tail = old[cut:]
    with open(bench_path, "w") as f:
        f.write(md + tail)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
