"""Streaming percolation — saved-search alerting over the indexing
command stream (the ES percolator run as a watcher, and the streaming
face of the reference's notification subscriptions: each registered
query is one subscriber's standing filter; SubscriptionService's
analogue fires per matching doc instead of per failure).

Every micro-batch of upsert commands percolates against the registered
queries (operators/percolate.py: broadcast term table + one partial
agg); matches land in a parquet alert sink PARTITIONED BY batch_id with
dynamic-partition overwrite. foreachBatch is at-least-once, so a
replayed batch rewrites exactly its own partition — alert state is
exactly-once without a transactional sink (same discipline the command
stream's crash-replay test proves for the index)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maestro_spark.operators.percolate import percolate
from maestro_spark.sources.tableio import write_partitioned
from maestro_spark.streaming.commands import read_command_stream

ALERT_SCHEMA = ("repo string, path string, commit string, "
                "query_id long, n_matched long, batch_id long")


def percolate_batch(batch: DataFrame, queries: DataFrame) -> DataFrame:
    """One micro-batch → alert rows: valid upserts only (op='upsert',
    content present), doc identity = the command key (repo, path,
    commit). Returns (repo, path, commit, query_id, n_matched)."""
    ups = (batch.where((F.col("op") == "upsert")
                       & F.col("content").isNotNull())
           .withColumn("_key", F.concat_ws("\x1f", "repo", "path",
                                           "commit")))
    hits = percolate(ups.select("_key", "content"), queries,
                     text_col="content", doc_id_col="_key")
    parts = F.split(F.col("doc_id"), "\x1f")
    return hits.select(
        parts.getItem(0).alias("repo"),
        parts.getItem(1).alias("path"),
        parts.getItem(2).alias("commit"),
        "query_id", "n_matched")


def run_percolate_stream(spark: SparkSession, commands_dir: str,
                         queries: DataFrame, alerts_dir: str,
                         checkpoint_dir: str,
                         available_now: bool = True):
    """Wire the alert stream: command files → percolate per micro-batch
    → alerts parquet (partitioned by batch_id, replay-idempotent).
    available_now=True drains pending files and stops."""
    stream = read_command_stream(spark, commands_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        alerts = percolate_batch(batch_df, queries) \
            .withColumn("batch_id", F.lit(int(batch_id)))
        write_partitioned(alerts, alerts_dir, ["batch_id"], dynamic=True)

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
