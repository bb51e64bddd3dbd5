"""Dense, stable doc_id assignment from sorted (repo, path, commit) keys
(SURVEY.md §7.0). Two-pass, fully distributed — the scalable zipWithIndex:

  1. range-repartition + sort-within-partitions on the key (Spark's
     terasort primitive — this is the ONE global sort in the build),
  2. count rows per partition (cheap job over the persisted frame),
  3. per-partition offset = prefix sum; mapInPandas assigns
     offset + local position, preserving intra-partition order.

Dense ids matter downstream: docID-gap compression stays small, and
per-shard doc lengths become a flat numpy array lookup at query time.
The frame is persisted between the two passes so range boundaries
(sampled) cannot drift between jobs.
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_KEY = ["repo", "path", "commit"]


def assign_doc_ids(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Returns docs + doc_id (long, dense 0..N-1, ordered by DOC_KEY).
    Result is persisted (MEMORY_AND_DISK); caller unpersists when done."""
    spark = docs.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism * 2
    d = (
        docs.repartitionByRange(num_partitions, *[F.col(c) for c in DOC_KEY])
        .sortWithinPartitions(*DOC_KEY)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {r["_pid"]: r["n"] for r in d.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    cols = [c for c in d.columns if c != "_pid"]
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in d.schema.fields if f.name != "_pid"
    ) + ", doc_id long"

    def add_ids(batches):
        pos = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pos is None:
                pos = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf[cols].copy()
            out["doc_id"] = np.arange(pos, pos + len(pdf), dtype=np.int64)
            pos += len(pdf)
            yield out

    out = d.mapInPandas(add_ids, schema=schema)
    # stash the persisted base so the caller can free it when finished
    out._maestro_persisted_base = d  # type: ignore[attr-defined]
    return out
