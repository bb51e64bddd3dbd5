"""Input-parallelism guards shared by the per-row-heavy operators.

At production scale inputs span many files and both helpers are no-ops /
cheap; at small scale (one parquet file → one scan partition) they keep
the heavy per-row expression work (tokenize → shingle → hash chains,
regex batteries) off a single task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, min_rows_per_part: int = 0) -> DataFrame:
    """Repartition ONLY when the input arrives in fewer partitions than
    the cluster has slots (a small table read as one file, or a candidate
    subset collapsed into few partitions) — heavy per-row passes otherwise
    run on a fraction of the cores. At production scale inputs span many
    files and this is a no-op, so no extra shuffle is ever paid where it
    wouldn't help."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def pinned(cond: Column) -> Column:
    """`cond`, pinned in place: OR-ed with a term that is always false yet
    non-deterministic and non-foldable (`spark_partition_id() < 0`), so
    Catalyst's PushDownPredicates — which only moves deterministic
    conditions through exchanges — cannot sink the filter below a spread()
    exchange. A disjunction is never split, and the pid term neither folds
    (`isnull(rand())` would: rand is statically non-nullable; `rand() >
    2.0` would too: Spark 4 range-folds rand comparisons) nor detaches
    (an AND-ed term would: conjunctions are split and the deterministic
    half pushed anyway). Without this, a filter like `h0 IS NOT NULL` is
    rewritten in terms of the scan columns and re-runs the whole
    tokenize→shingle→hash chain on the (few) pre-exchange input
    partitions, serializing the heaviest work onto one task.

    NOTE: the condition is still SUBSTITUTED through deterministic
    projections above the exchange (re-evaluating their expressions in the
    filter). When the projection is expensive, additionally materialize a
    non-deterministic column in it (see minhash_signatures' `_pin`) so the
    filter stops immediately above and reads attributes, not expressions."""
    return cond | (F.spark_partition_id() < F.lit(0))
