"""spark-submit entry point: build (or resume) an index over an input
table of (repo, path, commit, lang, content) — the BASELINE input_hint
shape — on whatever cluster the submit targets.

    zip -r maestro_spark.zip maestro_spark            # or scripts/make_zip.sh
    spark-submit --py-files maestro_spark.zip \
        scripts/submit_build.py \
        --input  /data/docs_parquet \
        --output /data/index \
        --shard-size 1000000 --buckets 16 --salts 8 \
        [--resume] [--positions] [--synthetic N]

On a cluster, --master/--num-executors etc. come from spark-submit itself;
this script only builds the session from the inherited conf (it does NOT
force local[]). The manifest (lineage, per-shard metrics, phase timings)
prints to stdout as JSON.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir with the input_hint table")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic docs instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shard-size", type=int, default=1_000_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--tokenizer", default="code", choices=["code", "simple"])
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--audit", action="store_true",
                    help="post-build integrity audit (recompute per-shard "
                         "stats and compare to the manifest); non-zero exit "
                         "on failure")
    args = ap.parse_args()

    # imports AFTER spark-submit has placed the --py-files zip on sys.path
    from maestro_spark.operators.build import IndexConfig, build_index
    from maestro_spark.sources.corpus import synth_docs

    spark = (
        SparkSession.builder.appName("maestro_spark_build")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    cfg = IndexConfig(
        shard_size=args.shard_size, n_buckets=args.buckets, n_salts=args.salts,
        tokenizer=args.tokenizer, store_positions=args.positions,
    )
    if args.synthetic:
        docs = synth_docs(spark, args.synthetic, seed=42)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        raise SystemExit("one of --input / --synthetic is required")
    manifest = build_index(spark, docs, args.output, cfg, resume=args.resume)
    out = {
        "n_docs": manifest["n_docs"],
        "shards": {k: {kk: v[kk] for kk in ("n_postings", "bytes", "status",
                                            "max_merge_fanin")}
                   for k, v in manifest["shards"].items()},
        "phase_ms": manifest.get("phase_ms", {}),
        "wall_ms": manifest["wall_ms"],
    }
    audit_ok = True
    if args.audit:
        from maestro_spark.operators.audit import audit_index
        rep, audit_ok = audit_index(spark, args.output)
        out["audit_ok"] = audit_ok
        if not audit_ok:
            out["audit_failures"] = [r.asDict() for r in
                                     rep.where(~rep["ok"]).collect()]
    print(json.dumps(out))
    spark.stop()
    if not audit_ok:
        raise SystemExit(2)


if __name__ == "__main__":
    main()
