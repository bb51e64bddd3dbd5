"""Event-time windowed streaming aggregation with watermarked late-data
handling. The reference has NO windowed streaming (SURVEY.md §2.11 —
Maestro's Kafka handling is per-message command routing), so this module
is the forward-looking piece a training-data pipeline needs: continuous
ingest metrics (events/sec per type, per-source doc counts) computed as
a Structured Streaming job.

Scale notes: tumbling-window groupBy is a streaming state-store
aggregation; the watermark bounds state size (late rows beyond it are
dropped), and output mode 'append' emits each window exactly once when it
finalizes — the shape that runs indefinitely on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, events_dir: str,
                      schema: str = EVENT_SCHEMA) -> DataFrame:
    return spark.readStream.schema(schema).format("parquet").load(events_dir)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a watermark
    for late data. Works identically on a batch DataFrame (Spark unifies
    the API), which is how the oracle checks it."""
    d = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        d.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def run_windowed_stream(spark: SparkSession, events_dir: str,
                        checkpoint_dir: str, query_name: str = "event_windows",
                        window: str = "1 hour", watermark: str = "2 hours"):
    """Drain available files into an in-memory sink (append mode: only
    watermark-finalized windows appear — tests assert on the closed set)."""
    agg = windowed_event_counts(read_event_stream(spark, events_dir),
                                window, watermark)
    q = (
        agg.writeStream.format("memory").queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
