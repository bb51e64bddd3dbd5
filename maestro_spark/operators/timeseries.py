"""Time-series aggregations over event streams — the ES TSDB analogue.

ES 8.x time-series data streams group documents by their dimension
fields into per-series partitions and run metric aggregations that are
only well-defined WITHIN a series — most prominently `rate` over
`counter` fields, which must detect counter resets (the value dropping
because the producing process restarted) and compensate rather than
emit a negative rate (public ES docs: aggregations/metrics `rate` on
counter fields; the reference — overture-stack/maestro — delegates all
aggregations to Elasticsearch, ReadMe indexing pipeline).

Scale shape: ONE shuffle on the dimension key (the TSDB routing key —
exactly how ES routes a time series to one shard), a per-partition
ordered window for the lag, then a partial-agg groupBy whose keys are a
superset of the window's partition key, so Spark reuses the existing
hash distribution — no second shuffle (asserted in tests/test_plans
style by the session-10 tests). Nothing corpus-scale crosses the
driver.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


_UNIT_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}


def counter_rate(events: DataFrame, series_col: str = "user_id",
                 ts_col: str = "ts", value_col: str = "value",
                 id_col: str = "event_id",
                 unit: str = "hour") -> DataFrame:
    """ES TSDB `rate` aggregation over a counter field, with reset
    detection: per series (dimension key) in (ts, id) total order,

      delta_i    = v_i - v_{i-1}  (within the series; the first event
                   of a series has no predecessor and contributes 0)
      increase_i = delta_i        if delta_i >= 0
                 = v_i            otherwise — the counter reset to ~0
                   and climbed back to v_i, so the post-reset value IS
                   the observed increase (the Prometheus/ES rule)

    bucketed by the CURRENT event's calendar `unit` bucket (ES
    calendar_interval; minute/hour/day — the fixed-width units):

      increase(bucket) = sum(increase_i),
      rate_per_second  = increase / seconds(unit)

    Pinned semantics (documented because ES leaves them loose): the lag
    crosses bucket boundaries (a series is continuous; ES's
    within-bucket-only variant under-counts the boundary delta), and
    ties order by the event id. Deterministic and SQL-expressible —
    the oracle runs the identical window in DuckDB.
    """
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unit must be one of {sorted(_UNIT_SECONDS)}")
    bucket = F.date_format(
        F.date_trunc(unit, F.col(ts_col).cast("timestamp")),
        "yyyy-MM-dd HH:mm:ss")
    # alias the series key BELOW the window so the window's hash
    # distribution is expressed on the SAME attribute the groupBy
    # clusters on — otherwise the dropped original column makes the
    # output partitioning unknown and Spark inserts a second shuffle
    base = events.select(F.col(series_col).alias("series"),
                         F.col(ts_col).alias("_ts"),
                         F.col(id_col).alias("_id"),
                         F.col(value_col).alias("_v"),
                         bucket.alias("bucket"))
    w = Window.partitionBy("series").orderBy("_ts", "_id")
    prev = F.lag("_v").over(w)
    delta = F.col("_v") - prev
    inc = (F.when(prev.isNull(), F.lit(0.0))
            .when(delta >= 0, delta)
            .otherwise(F.col("_v")))
    return (base
            .select("series", "bucket", inc.alias("inc"))
            .groupBy("series", "bucket")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("inc"), 6).alias("increase"),
                 F.round(F.sum("inc") / F.lit(float(_UNIT_SECONDS[unit])),
                         6).alias("rate_per_second")))
