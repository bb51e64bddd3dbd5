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


def downsample(events: DataFrame, series_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               id_col: str = "event_id",
               unit: str = "hour") -> DataFrame:
    """ES TSDB downsampling (public docs: downsample API / ILM
    downsample action; the reference delegates all storage tiering to
    Elasticsearch): roll a time-series index up to one document per
    (series, calendar bucket) carrying exactly the statistics ES keeps —
    for gauge metrics min / max / sum / value_count, for counter metrics
    last_value (the latest sample in the bucket, (ts, id) total order),
    plus the bucket's doc count. Queries against the rollup answer any
    MERGEABLE aggregation (min/max/sum/count/avg and counter rate from
    last values) at `unit` or any coarser calendar interval with answers
    identical to the raw index — downsample_requery() below is that
    re-aggregation, and the oracle proves cross-engine equality of both
    the rollup and a coarser re-query against raw events.

    Scale shape: ONE (series, bucket)-keyed partial agg — partial rows
    combine map-side, the shuffle volume is |series × buckets| (the
    rollup's own size, orders of magnitude under the raw event count at
    100 TB). last_value rides the same agg as a struct-max argmax
    (max(struct(ts, id, v)).v), not a second window or join; ties pin on
    the event id so both engines pick the same sample."""
    return _round6(_rollup(events, series_col, ts_col, value_col,
                           id_col, unit))


def _rollup(events: DataFrame, series_col: str, ts_col: str,
            value_col: str, id_col: str, unit: str) -> DataFrame:
    """Unrounded rollup — the internal form downstream re-aggregation
    composes over (rounding the fine buckets first would leak up to
    0.5e-6 per bucket into a coarser sum and break raw-equality)."""
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unit must be one of {sorted(_UNIT_SECONDS)}")
    bucket = F.date_format(
        F.date_trunc(unit, F.col(ts_col).cast("timestamp")),
        "yyyy-MM-dd HH:mm:ss")
    base = events.select(F.col(series_col).alias("series"),
                         bucket.alias("bucket"),
                         F.col(ts_col).alias("_ts"),
                         F.col(id_col).alias("_id"),
                         F.col(value_col).alias("_v"))
    last = F.max(F.struct("_ts", "_id", "_v"))["_v"]
    return (base.groupBy("series", "bucket")
            .agg(F.count("*").alias("doc_count"),
                 F.min("_v").alias("v_min"),
                 F.max("_v").alias("v_max"),
                 F.sum("_v").alias("v_sum"),
                 F.count("_v").alias("v_count"),
                 last.alias("last_value")))


def _round6(roll: DataFrame) -> DataFrame:
    keep = [c for c in roll.columns
            if c not in ("v_min", "v_max", "v_sum", "v_avg", "last_value")]
    return roll.select(
        *keep,
        *[F.round(c, 6).alias(c)
          for c in ("v_min", "v_max", "v_sum", "v_avg", "last_value")
          if c in roll.columns])


def downsample_requery(events: DataFrame, series_col: str = "user_id",
                       ts_col: str = "ts", value_col: str = "value",
                       id_col: str = "event_id",
                       unit: str = "hour",
                       requery_unit: str = "day") -> DataFrame:
    """A coarser-interval aggregation answered FROM the rollup — the
    point of downsampling: min/max/sum/value_count merge across the fine
    buckets, avg derives from (sum, count), and the result is identical
    to running the same aggregation on the raw index (the oracle runs
    the raw form in DuckDB; equality is the mergeability proof ES's
    downsample correctness rests on). last_value re-reduces by the
    bucket key itself ((bucket, series) max-struct — the fine bucket IS
    the ordering prefix of (ts, id) under calendar nesting).

    Plan: the rollup's single partial agg, then a second partial agg
    over ALREADY-REDUCED rollup rows (|series × fine buckets|, never
    raw events)."""
    allowed = {"hour": ("day",), "minute": ("hour", "day")}
    if requery_unit not in allowed.get(unit, ()):
        raise ValueError(
            f"requery_unit {requery_unit!r} must be coarser than {unit!r}")
    roll = _rollup(events, series_col, ts_col, value_col, id_col, unit)
    coarse = F.date_format(
        F.date_trunc(requery_unit, F.col("bucket").cast("timestamp")),
        "yyyy-MM-dd HH:mm:ss")
    last = F.max(F.struct("bucket", "last_value"))["last_value"]
    return _round6(
        roll.groupBy("series", coarse.alias("bucket"))
        .agg(F.sum("doc_count").alias("doc_count"),
             F.min("v_min").alias("v_min"),
             F.max("v_max").alias("v_max"),
             F.sum("v_sum").alias("v_sum"),
             F.sum("v_count").alias("v_count"),
             (F.sum("v_sum") / F.sum("v_count")).alias("v_avg"),
             last.alias("last_value")))
