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


def assign_doc_ids(docs: DataFrame, num_partitions: int | None = None,
                   key_cols: list[str] | None = None) -> DataFrame:
    """Returns docs + doc_id (long, dense 0..N-1, ordered by key_cols —
    default DOC_KEY). Result is persisted (MEMORY_AND_DISK); caller
    unpersists when done.

    key_cols is the INDEX-SORT seam: passing [sort_field, *DOC_KEY]
    assigns ids in (sort_field, stable tie) order, which makes doc_id
    order ≡ (sort_field, doc_id) order index-wide — the invariant the
    ES index-sorting early-termination path rests on."""
    key_cols = list(key_cols) if key_cols else DOC_KEY
    spark = docs.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism * 2
    d = (
        docs.repartitionByRange(num_partitions, *[F.col(c) for c in key_cols])
        .sortWithinPartitions(*key_cols)
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


def routing_shard_col(routing_col, n_shards: int):
    """Routing hash as a Column: md5 of the routing value's string form,
    first 8 hex digits as an integer, mod n_shards — the ES
    `_routing`-style hash, chosen (over xxhash64) because every engine
    with md5 can reproduce it (DuckDB: CAST('0x'||substring(md5(v),1,8)
    AS UBIGINT) % n; Python: int(md5(v).hexdigest()[:8], 16) % n), so
    routed results stay oracle-checkable."""
    if isinstance(routing_col, str):
        routing_col = F.col(routing_col)
    return (
        F.conv(F.substring(F.md5(routing_col.cast("string")), 1, 8),
               16, 10).cast("long") % n_shards
    ).cast("int")


def routing_shard(value: str, n_shards: int) -> int:
    """Python mirror of routing_shard_col for query-time routing."""
    import hashlib
    return int(hashlib.md5(str(value).encode("utf-8")).hexdigest()[:8],
               16) % n_shards


def assign_doc_ids_routed(docs: DataFrame, routing_col: str,
                          n_shards: int, shard_size: int,
                          num_partitions: int | None = None) -> DataFrame:
    """Routed doc_id assignment (the ES custom `_routing` analogue): every
    doc's shard is a HASH OF A ROUTING FIELD instead of an id range, so
    all docs sharing a routing value land in ONE shard — a routed query
    then touches 1/n_shards of the index (multi-tenant isolation). The
    doc-range invariant downstream (doc_id = shard·shard_size + local,
    local dense in [0, shard_size)) is preserved by assigning per-shard
    dense local ids; raises if any shard outgrows shard_size (size
    shard_size ≥ corpus/n_shards × skew headroom, exactly like sizing ES
    shards under custom routing — a hot tenant overflows its shard there
    too, ES rejects with a too-many-docs error at 2^31).

    Same two-pass scalable zipWithIndex as assign_doc_ids, with the
    prefix sums computed per (partition, shard): one range repartition
    on (shard, DOC_KEY) — rows of a shard are contiguous within each
    partition — then offset[pid, shard] = docs of `shard` in earlier
    partitions. Result persisted; caller unpersists."""
    spark = docs.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism * 2
    d = (
        docs.withColumn("shard", routing_shard_col(routing_col, n_shards))
        .repartitionByRange(num_partitions, F.col("shard"),
                            *[F.col(c) for c in DOC_KEY])
        .sortWithinPartitions("shard", *DOC_KEY)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {(r["_pid"], r["shard"]): r["n"]
              for r in d.groupBy("_pid", "shard")
              .agg(F.count("*").alias("n")).collect()}
    per_shard: dict[int, int] = {}
    offsets: dict[tuple[int, int], int] = {}
    for pid, shard in sorted(counts):
        offsets[(pid, shard)] = per_shard.get(shard, 0)
        per_shard[shard] = per_shard.get(shard, 0) + counts[(pid, shard)]
    over = {s: n for s, n in per_shard.items() if n > shard_size}
    if over:
        raise ValueError(
            f"routing overflow: shard(s) {over} exceed shard_size="
            f"{shard_size}; raise shard_size or n_shards")

    cols = [c for c in d.columns if c != "_pid"]
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in d.schema.fields if f.name != "_pid"
    ) + ", doc_id long"

    def add_ids(batches):
        pid = None
        pos: dict[int, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            out = pdf[cols].copy()
            shards = pdf["shard"].to_numpy()
            ids = np.empty(len(pdf), dtype=np.int64)
            start = 0
            while start < len(pdf):
                s = int(shards[start])
                end = start
                while end < len(pdf) and shards[end] == s:
                    end += 1
                local = pos.get(s)
                if local is None:
                    local = offsets[(pid, s)]
                n = end - start
                ids[start:end] = (s * shard_size + local
                                  + np.arange(n, dtype=np.int64))
                pos[s] = local + n
                start = end
            out["doc_id"] = ids
            yield out

    out = d.mapInPandas(add_ids, schema=schema)
    out._maestro_persisted_base = d  # type: ignore[attr-defined]
    return out
