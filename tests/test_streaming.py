"""Streaming tests: command-stream ingest (upsert/delete routing, DLQ,
incremental rebuild, checkpointed restart) and watermarked windowed
aggregation. All use availableNow triggers — bounded, deterministic."""

import os

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.build import IndexConfig
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs
from maestro_spark.streaming import commands as sc
from maestro_spark.streaming import windows as sw

CFG = IndexConfig(shard_size=200, n_buckets=8, n_salts=4,
                  hot_df_fraction=0.05, sample_fraction=1.0)


def _write_commands(spark, cmd_dir, rows, fname):
    df = spark.createDataFrame(rows, sc.COMMAND_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(os.path.join(cmd_dir))
    del fname


def test_command_stream_end_to_end(spark, tmp_path):
    cmd_dir = str(tmp_path / "cmds")
    idx_dir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    reject = str(tmp_path / "reject")
    os.makedirs(cmd_dir)

    base = synth_docs(spark, 150, seed=42, partitions=3).collect()
    ups = [(i, "upsert", r["repo"], r["path"], r["commit"], r["lang"], r["content"])
           for i, r in enumerate(base)]
    _write_commands(spark, cmd_dir, ups, "b0")
    sc.run_command_stream(spark, cmd_dir, idx_dir, CFG, ckpt, reject)

    reader = IndexReader(spark, idx_dir)
    assert reader.manifest["n_docs"] == 150
    assert reader.search_pandas("zzqmarkerzzq", k=3).empty

    # batch 2: delete 1 doc, modify 1 doc, add a bad command (DLQ).
    # The edited doc's key also gets a LOWER-seq delete — the max-seq
    # upsert must win (log-compaction ordering, not file order).
    victim, edited = base[0], base[1]
    batch2 = [
        (200, "delete", victim["repo"], victim["path"], victim["commit"], None, None),
        (201, "delete", edited["repo"], edited["path"], edited["commit"], None, None),
        (202, "upsert", edited["repo"], edited["path"], edited["commit"],
         edited["lang"], edited["content"] + " zzqmarkerzzq"),
        (203, "upsert", "org/bad", "p", "c", "java", None),  # invalid: no content
    ]
    _write_commands(spark, cmd_dir, batch2, "b1")
    sc.run_command_stream(spark, cmd_dir, idx_dir, CFG, ckpt, reject)

    reader2 = IndexReader(spark, idx_dir)
    assert reader2.manifest["n_docs"] == 149
    hits = reader2.search_pandas("zzqmarkerzzq", k=3)
    assert len(hits) == 1
    stored = spark.read.parquet(f"{idx_dir}/docs")
    assert stored.where(
        (F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"])
        & (F.col("commit") == victim["commit"])).count() == 0
    # DLQ captured the malformed command
    assert spark.read.parquet(reject).count() == 1
    # checkpoint: re-running with no new files is a no-op
    m_before = reader2.manifest["shards"]
    sc.run_command_stream(spark, cmd_dir, idx_dir, CFG, ckpt, reject)
    assert IndexReader(spark, idx_dir).manifest["shards"] == m_before


def test_windowed_counts_match_batch(spark, tmp_path):
    """Streaming windowed agg over the events table == the same agg run as
    a plain batch query (completed windows only — append mode drops the
    final non-finalized window(s), so compare on the intersection)."""
    events_src = "/root/testdata/sf0.001/events.parquet"
    ckpt = str(tmp_path / "ckpt_w")
    ev_dir = str(tmp_path / "events_stream")
    spark.read.parquet(events_src).coalesce(2).write.parquet(ev_dir)

    q = sw.run_windowed_stream(spark, ev_dir, ckpt, query_name="evw")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("select * from evw").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in sw.windowed_event_counts(spark.read.parquet(ev_dir)).collect()
    }
    assert got, "no finalized windows emitted"
    for k, v in got.items():
        assert want[k] == v
    # append-mode completeness: every window strictly older than the max
    # watermark must have been emitted
    max_start = max(k[0] for k in want)
    missing = {k for k in want if k not in got and k[0] < max_start}
    # windows within the trailing watermark horizon may legitimately be
    # held back; everything older must be present
    horizon = sorted({k[0] for k in want})[-3]
    assert not {k for k in missing if k[0] < horizon}
