"""SparkSession factory with scale-appropriate defaults.

Defaults are tuned so the same code runs on local[N] in tests and on a
multi-executor cluster unchanged: AQE on (runtime re-plan, skew-join
splitting), Arrow on (all our UDFs are pandas/Arrow vectorized), UTC
session timezone (duckdb oracle comparison — duckdb timestamps are
UTC-naive), shuffle partitions sized by the caller.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "maestro_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cores = os.environ.get("SPARK_GRAFT_CPUS")
    if master.startswith("local[") and cores:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        n = master[6:-1] if master.startswith("local[") else "*"
        shuffle_partitions = 32 if n == "*" else max(int(n), 4)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
