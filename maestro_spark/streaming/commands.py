"""Streaming index-command ingestion — the native rebuild of Maestro's
Kafka listeners (SURVEY.md §2.11):

  * SongAnalysisStreamListener.handleMessage (SongAnalysisStreamListener.
    java:52-82): state==PUBLISHED → upsert the analysis's docs; any other
    state → delete (K2). The analysis BODY arrives in the message, so no
    side lookup is needed — our command rows likewise carry the full doc.
  * IndexingMessagesStreamListener (IndexingMessagesStreamListener.
    java:52-90): per-message command processed to completion, acked,
    failures to DLQ. Our equivalent: foreachBatch processes each
    micro-batch transactionally (incremental_update: stable doc ids +
    affected-shard-only rebuild); Spark's checkpoint gives exactly-once
    per batch; malformed commands are quarantined to a reject dir instead
    of poisoning the stream (DLQ semantics, application.yml:192-201).

Ordering semantics: every command carries a monotonic ordinal `seq` (for
Kafka: the partition offset — monotonic per key on a key-partitioned
topic, exactly the log-compaction ordering; for the file source: a
producer-assigned sequence). Within a micro-batch the max-seq command
per doc key wins; a seq tie resolves to DELETE (the conservative choice)
— deterministic, unlike dropDuplicates' arbitrary row.

Command schema (one row per command):
    seq     long    monotonic ordinal (Kafka offset analogue)
    op      string  'upsert' | 'delete'
    repo, path, commit, lang, content   — doc fields (content/lang null
                                          for deletes)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from maestro_spark.operators.build import IndexConfig
from maestro_spark.operators.incremental import DOC_COLS, incremental_update

COMMAND_SCHEMA = (
    "seq long, op string, repo string, path string, commit string, "
    "lang string, content string"
)
KAFKA_VALUE_SCHEMA = (
    "op string, repo string, path string, commit string, "
    "lang string, content string"
)
DOC_KEY = ["repo", "path", "commit"]


def read_command_stream(spark: SparkSession, commands_dir: str,
                        max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based command stream (the sandbox stand-in for the Kafka
    source — read_command_stream_kafka below is the one-call swap)."""
    reader = (
        spark.readStream.schema(COMMAND_SCHEMA).format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(commands_dir)


def parse_kafka_commands(kafka_df: DataFrame) -> DataFrame:
    """Kafka source frame → command rows (S6: IndexingMessagesStreamListener
    .java:52-90). Input columns are exactly what format("kafka") yields
    (key/value binary, topic, partition, offset, timestamp); works
    identically on a static test frame of the same shape — the
    broker-less way to exercise this path.

    seq = Kafka offset (per-partition monotonic; with doc-key-keyed
    production the per-key order IS the offset order — the reference's
    log-compaction contract). Malformed JSON → from_json yields all-null
    struct → op NULL → routed to the DLQ by apply_command_batch, the
    enableDlq/autoCommitOnError analogue (application.yml:192-201)."""
    parsed = kafka_df.select(
        F.from_json(F.col("value").cast("string"), KAFKA_VALUE_SCHEMA).alias("c"),
        F.col("offset").cast("long").alias("seq"),
    )
    return parsed.select("seq", "c.op", "c.repo", "c.path", "c.commit",
                         "c.lang", "c.content")


def read_command_stream_kafka(spark: SparkSession, bootstrap_servers: str,
                              topic: str,
                              starting_offsets: str = "earliest") -> DataFrame:
    """The real Kafka source (no broker in this sandbox — the parse/route
    logic is exercised via parse_kafka_commands on static frames)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_commands(raw)


def apply_command_batch(spark: SparkSession, batch: DataFrame, index_dir: str,
                        cfg: IndexConfig,
                        reject_dir: str | None = None,
                        notifier=None, versioned: bool = False) -> dict:
    """Apply one micro-batch of commands to the index: validate → resolve
    per-key winner by seq → route upsert/delete → incremental_update
    (stable ids, affected-shard-only rebuild). Returns the build manifest.
    Runs identically as a plain batch call.

    versioned=True lands each batch snapshot-isolated
    (incremental_update_versioned: hardlink-cloned blue/green + atomic
    alias flip) — index_dir is then the alias BASE dir, and live readers
    never observe a half-applied batch. The in-place default is cheaper
    per batch (no clone) and right when no reader serves during
    ingestion."""
    batch = batch.persist()
    try:
        valid_op = F.col("op").isin("upsert", "delete")
        valid_key = (
            F.col("repo").isNotNull() & F.col("path").isNotNull()
            & F.col("commit").isNotNull()
        )
        upsert_ok = (F.col("op") != "upsert") | F.col("content").isNotNull()
        ok = valid_op & valid_key & upsert_ok
        # one action for both counts (no extra limit(1).count() per batch)
        counts = batch.agg(
            F.count("*").alias("n"),
            F.sum(F.when(ok, 0).otherwise(1)).alias("n_bad"),
        ).first()
        n_bad = int(counts["n_bad"] or 0)
        if n_bad and reject_dir is not None:
            batch.where(~ok).write.mode("append").parquet(reject_dir)  # DLQ
        if n_bad and notifier is not None:
            notifier.notify("COMMAND_REJECTED", n_rejected=n_bad,
                            reject_dir=reject_dir)
        if int(counts["n"]) == n_bad:
            from maestro_spark.sources.tableio import (read_manifest,
                                                       resolve_alias)
            return read_manifest(os.path.join(
                resolve_alias(index_dir), "manifest.json")) or {}

        # per-key winner: max seq; seq tie → delete (deterministic)
        w = Window.partitionBy(*DOC_KEY).orderBy(
            F.desc_nulls_last("seq"), F.asc("op"))
        winner = (
            batch.where(ok)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        ups = winner.where(F.col("op") == "upsert").select(*DOC_COLS)
        dels = winner.where(F.col("op") == "delete").select(*DOC_KEY)
        if versioned:
            from maestro_spark.operators.incremental import \
                incremental_update_versioned
            return incremental_update_versioned(spark, index_dir, ups,
                                                dels, cfg)
        return incremental_update(spark, index_dir, ups, dels, cfg)
    finally:
        batch.unpersist()


def run_command_stream(spark: SparkSession, commands_dir: str, index_dir: str,
                       cfg: IndexConfig, checkpoint_dir: str,
                       reject_dir: str | None = None,
                       available_now: bool = True,
                       notifier=None, versioned: bool = False):
    """Wire the stream: one foreachBatch call per micro-batch, checkpointed
    (restart-safe — the streaming analogue of the manifest resume).
    available_now=True drains pending files and stops (test/batch-catchup
    mode); False runs continuously. versioned=True lands every batch
    snapshot-isolated (see apply_command_batch)."""
    stream = read_command_stream(spark, commands_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_command_batch(spark, batch_df, index_dir, cfg, reject_dir,
                            notifier=notifier, versioned=versioned)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
