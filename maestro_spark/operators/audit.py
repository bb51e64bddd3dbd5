"""Index integrity audit — the lineage/verification pass the north star
asks for ("every indexed document verified ... by content sha256
equality"; per-partition lineage + metrics). Maestro's analogue is its
health/metrics surface (it trusts ES for storage integrity); here the
posting store is ours, so the audit is too.

One distributed pass over each store (docstore / doclens / postings),
aggregated PER SHARD with map-side partial aggregation — the audit
shuffles one row per shard per store, never raw rows, so it runs at any
corpus size. Every check recomputes from the data and compares against
the manifest the build wrote:

  docstore   n_docs + fingerprint (the same xxhash64-sum the build and
             incremental path use — a mismatch means files changed
             behind the manifest), doc_id range ∈ [shard·S, (shard+1)·S),
             duplicate doc_ids, content_sha256 == sha2(content) (the
             input-invariant re-check)
  postings   n_terms / n_postings(Σdf) / payload bytes vs manifest
  doclens    every (doc_id, field) row joins a docstore doc (orphan
             count), per-shard (n, Σdl) folds to the manifest's stats

Returns (report_df, ok): one row per shard with per-check booleans, and
the conjunction. Schema is stable for dashboards/alerts (notify.py can
subscribe a channel to `not ok`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maestro_spark.sources.tableio import read_manifest


def audit_index(spark: SparkSession, index_dir: str) -> tuple[DataFrame, bool]:
    manifest = read_manifest(os.path.join(index_dir, "manifest.json"))
    if manifest is None:
        raise FileNotFoundError(f"no manifest.json under {index_dir}")
    shard_size = int(manifest["config"]["shard_size"])

    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens"))
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))

    d = docs.groupBy("shard").agg(
        F.count("*").alias("a_n_docs"),
        F.sum(F.pmod(F.xxhash64("repo", "path", "commit", "content_sha256"),
                     F.lit(1 << 40))).alias("a_fp"),
        F.min("doc_id").alias("a_min_id"),
        F.max("doc_id").alias("a_max_id"),
        F.countDistinct("doc_id").alias("a_distinct_ids"),
        F.sum(F.when(F.sha2(F.col("content"), 256)
                     != F.col("content_sha256"), 1).otherwise(0))
        .alias("a_sha_mismatch"),
    )
    p = postings.groupBy("shard").agg(
        F.count("*").alias("a_n_terms"),
        F.sum("df").alias("a_n_postings"),
        F.sum(F.length("doc_bytes") + F.length("tf_bytes")).alias("a_bytes"),
    )
    # orphan doclens rows: (shard, doc_id) without a docstore row. The
    # join key starts with shard, so co-partitioned stores join without
    # moving the big side far; output is one count per shard.
    orphans = (
        doclens.select("shard", "doc_id")
        .join(docs.select("shard", "doc_id"), ["shard", "doc_id"],
              "left_anti")
        .groupBy("shard").agg(F.count("*").alias("a_orphans"))
    )
    dl = doclens.groupBy("shard", "field").agg(
        F.count("*").alias("n"), F.sum("dl").alias("sum_dl"))

    want = spark.createDataFrame(
        [(int(s),
          int(e["n_docs"]), int(e["fingerprint"]), int(e["n_terms"]),
          int(e["n_postings"]), int(e["bytes"]),
          [(f, int(n), int(sdl)) for f, (n, sdl) in e.get("fields", {}).items()])
         for s, e in manifest["shards"].items()],
        "shard int, m_n_docs long, m_fp long, m_n_terms long, "
        "m_n_postings long, m_bytes long, "
        "m_fields array<struct<field:string, n:long, sum_dl:long>>")

    dl_agg = dl.groupBy("shard").agg(
        F.array_sort(F.collect_list(F.struct("field", "n", "sum_dl")))
        .alias("a_fields"))

    rep = (want.join(d, "shard", "left")
           .join(p, "shard", "left")
           .join(dl_agg, "shard", "left")
           .join(orphans, "shard", "left")
           .na.fill(0, ["a_n_docs", "a_fp", "a_n_terms", "a_n_postings",
                        "a_bytes", "a_orphans", "a_sha_mismatch"]))
    rep = rep.select(
        "shard",
        (F.col("a_n_docs") == F.col("m_n_docs")).alias("n_docs_ok"),
        (F.col("a_fp") == F.col("m_fp")).alias("fingerprint_ok"),
        ((F.col("a_min_id") >= F.col("shard").cast("long") * shard_size)
         & (F.col("a_max_id") < (F.col("shard") + 1).cast("long") * shard_size)
         ).alias("id_range_ok"),
        (F.col("a_distinct_ids") == F.col("a_n_docs")).alias("ids_unique_ok"),
        (F.col("a_sha_mismatch") == 0).alias("content_sha_ok"),
        ((F.col("a_n_terms") == F.col("m_n_terms"))
         & (F.col("a_n_postings") == F.col("m_n_postings"))
         & (F.col("a_bytes") == F.col("m_bytes"))).alias("postings_ok"),
        (F.col("a_orphans") == 0).alias("doclens_ok"),
        (F.array_sort("m_fields") == F.col("a_fields")).alias("field_sums_ok"),
    )
    checks = [c for c in rep.columns if c != "shard"]
    rep = rep.withColumn(
        "ok", F.expr(" AND ".join(f"coalesce({c}, false)" for c in checks)))
    # n_shards rows — driver-side reduction is bounded
    ok = all(r["ok"] for r in rep.select("ok").collect())
    return rep, ok
