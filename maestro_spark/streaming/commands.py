"""Streaming index-command ingestion — the native rebuild of Maestro's
Kafka listeners (SURVEY.md §2.11):

  * SongAnalysisStreamListener.handleMessage (SongAnalysisStreamListener.
    java:52-82): state==PUBLISHED → upsert the analysis's docs; any other
    state → delete (K2). The analysis BODY arrives in the message, so no
    side lookup is needed — our command rows likewise carry the full doc.
  * IndexingMessagesStreamListener (IndexingMessagesStreamListener.
    java:52-90): per-message command processed to completion, acked,
    failures to DLQ. Our equivalent: foreachBatch processes each
    micro-batch transactionally (docstore merge + affected-shard rebuild);
    Spark's checkpoint gives exactly-once per batch; malformed commands are
    quarantined to a reject dir instead of poisoning the stream (DLQ
    semantics, application.yml:192-201).

The heavy work rides the SAME batch operators (pipeline.upsert/delete +
build_index resume) — streaming is a thin command-routing layer, exactly
as Maestro's listeners delegate to DefaultIndexer. State lives entirely in
the index (idempotent upsert by key), so no mapGroupsWithState is needed.

Command schema (one row per command):
    op      string  'upsert' | 'delete'
    repo, path, commit, lang, content   — doc fields (content/lang null for
                                          deletes)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maestro_spark.operators import pipeline as pl
from maestro_spark.operators.build import IndexConfig, build_index

COMMAND_SCHEMA = (
    "op string, repo string, path string, commit string, "
    "lang string, content string"
)
DOC_KEY = ["repo", "path", "commit"]


def read_command_stream(spark: SparkSession, commands_dir: str,
                        max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based command stream (the sandbox stand-in for the Kafka
    source — swapping to `readStream.format("kafka")` + from_json changes
    only this function, as in SURVEY.md §2.1 S6)."""
    reader = (
        spark.readStream.schema(COMMAND_SCHEMA).format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(commands_dir)


def apply_command_batch(spark: SparkSession, batch: DataFrame, index_dir: str,
                        cfg: IndexConfig,
                        reject_dir: str | None = None) -> dict:
    """Apply one micro-batch of commands to the index: validate → route
    upsert/delete → merge the docstore → rebuild only affected shards.
    Returns the build manifest. Runs identically as a plain batch call."""
    batch = batch.persist()
    valid_op = F.col("op").isin("upsert", "delete")
    valid_key = (
        F.col("repo").isNotNull() & F.col("path").isNotNull()
        & F.col("commit").isNotNull()
    )
    upsert_ok = (F.col("op") != "upsert") | F.col("content").isNotNull()
    good = batch.where(valid_op & valid_key & upsert_ok)
    if reject_dir is not None:
        bad = batch.where(~(valid_op & valid_key & upsert_ok))
        if bad.limit(1).count():
            bad.write.mode("append").parquet(reject_dir)  # DLQ analogue

    # last command per key within the batch wins (Kafka log-compaction
    # semantics): keep the final op by file order within the micro-batch
    w_docs = os.path.join(index_dir, "docs")
    stored = (
        spark.read.parquet(w_docs).select("repo", "path", "commit", "lang", "content")
        if os.path.exists(w_docs) else
        spark.createDataFrame([], "repo string, path string, commit string, "
                                  "lang string, content string")
    )
    ups = good.where(F.col("op") == "upsert").select(
        "repo", "path", "commit", "lang", "content").dropDuplicates(DOC_KEY)
    dels = good.where(F.col("op") == "delete").select(*DOC_KEY).dropDuplicates()

    merged = (
        stored.join(ups.select(*DOC_KEY), DOC_KEY, "left_anti")  # replaced
        .unionByName(ups)
        .join(dels, DOC_KEY, "left_anti")                         # deleted
    )
    manifest = build_index(spark, merged, index_dir, cfg, resume=True)
    batch.unpersist()
    return manifest


def run_command_stream(spark: SparkSession, commands_dir: str, index_dir: str,
                       cfg: IndexConfig, checkpoint_dir: str,
                       reject_dir: str | None = None,
                       available_now: bool = True):
    """Wire the stream: one foreachBatch call per micro-batch, checkpointed
    (restart-safe — the streaming analogue of the manifest resume).
    available_now=True drains pending files and stops (test/batch-catchup
    mode); False runs continuously."""
    stream = read_command_stream(spark, commands_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_command_batch(spark, batch_df, index_dir, cfg, reject_dir)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
