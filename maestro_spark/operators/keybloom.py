"""Per-shard key bloom sidecars — metadata-pruned incremental key probe
(VERDICT r2 #4: the native analogue of Iceberg's bloom/min-max file
skipping behind the TableIO seam).

The incremental path must find which shards contain a batch's keys
(repo, path, commit). Without metadata that is a column-pruned key scan
of EVERY shard; with these sidecars the probe opens only shards whose
bloom admits at least one batch key — file opens ∝ touched shards, not
corpus shards (test_incremental_bloom_prune).

Layout: {index}/keyblooms/shard=N/*.parquet, one row per shard
(n_keys, m_bits, bloom binary). Sized at 16 bits/key with 8 probes →
~5·10⁻⁴ false-positive rate (a false positive costs one extra shard
scan, never a wrong answer; false negatives are impossible). Hashing is
Spark's xxhash64 over the key columns on BOTH the build and probe side,
so a bloom built on executors and a probe computed driver-side agree
bit-for-bit. Blooms are per-shard immutable artifacts: a shard rebuild
rewrites its own bloom (dynamic partition overwrite), untouched shards
keep theirs, hardlink snapshots share them.

Reference parity: ES routes upserts to one shard by _id hash
(FileCentricElasticSearchAdapter.java:266-324); our ids are assignment-
ordered rather than hash-routed, so membership needs a per-shard summary
— the bloom is that summary.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BITS_PER_KEY = 16
N_PROBES = 8

# Above this total sidecar size the probe runs executor-side (only
# candidate shard ids come back to the driver); below it a driver-local
# pyarrow read skips Spark job overhead. Same budget-routing discipline
# as search's LOCAL_DF_BUDGET.
LOCAL_BLOOM_BUDGET = 64 << 20

_SCHEMA = "shard int, n_keys long, m_bits long, bloom binary"


def _split_hash(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Double-hashing bases from one xxhash64 value (Kirsch-Mitzenmacher:
    probe_i = h1 + i·h2, h2 forced odd)."""
    h = np.ascontiguousarray(h, dtype=np.int64).view(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    return h1, h2


def _bloom_words(hashes: np.ndarray) -> tuple[np.ndarray, int]:
    n = max(len(hashes), 1)
    m_bits = ((BITS_PER_KEY * n + 63) // 64) * 64
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    h1, h2 = _split_hash(hashes)
    m = np.uint64(m_bits)
    for i in range(N_PROBES):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(words, (pos // np.uint64(64)).astype(np.int64),
                         np.uint64(1) << (pos % np.uint64(64)))
    return words, m_bits


def _bloom_maybe_contains(words: np.ndarray, m_bits: int,
                          hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership test: bool per hash (True = maybe present)."""
    h1, h2 = _split_hash(hashes)
    m = np.uint64(m_bits)
    ok = np.ones(len(h1), dtype=bool)
    for i in range(N_PROBES):
        pos = (h1 + np.uint64(i) * h2) % m
        bit = (words[(pos // np.uint64(64)).astype(np.int64)]
               >> (pos % np.uint64(64))) & np.uint64(1)
        ok &= bit.astype(bool)
        if not ok.any():
            break
    return ok


def write_key_blooms(subset: DataFrame, out_dir: str, key_cols: list[str],
                     n_parts: int, dynamic: bool) -> None:
    """One bloom row per shard of `subset`, written hive-partitioned so a
    shard rebuild replaces exactly its own file."""
    from maestro_spark.sources.tableio import write_partitioned

    hashed = subset.select("shard", F.xxhash64(*key_cols).alias("h"))

    def build(key, pdf):
        words, m_bits = _bloom_words(pdf["h"].to_numpy(np.int64))
        return pd.DataFrame({"shard": [int(key[0])],
                             "n_keys": [len(pdf)],
                             "m_bits": [m_bits],
                             "bloom": [words.tobytes()]})

    blooms = (hashed.repartition(max(n_parts, 1), "shard")
              .groupBy("shard").applyInPandas(build, schema=_SCHEMA))
    write_partitioned(blooms, out_dir, ["shard"], dynamic=dynamic)


def candidate_shards(spark: SparkSession, index_dir: str,
                     batch_keys: DataFrame, key_cols: list[str],
                     manifest: dict) -> set[int] | None:
    """Shards that may contain any batch key, by bloom probe. Returns
    None when no bloom sidecar exists (legacy index → full key scan).
    Shards missing a bloom row (partially upgraded index) stay
    candidates — pruning is only ever an optimization, exactness never
    depends on it."""
    path = os.path.join(index_dir, "keyblooms")
    if not os.path.isdir(path):
        return None
    import pyarrow.dataset as pads

    ds = pads.dataset(path, format="parquet", partitioning="hive")
    all_shards = {int(s) for s in manifest.get("shards", {})}
    hashes = np.array(
        [r["h"] for r in batch_keys.select(
            F.xxhash64(*key_cols).alias("h")).collect()],
        dtype=np.int64)

    side_bytes = sum(os.path.getsize(f) for f in ds.files)
    if side_bytes <= LOCAL_BLOOM_BUDGET:
        rows = ds.to_table().to_pylist()
        have = {int(r["shard"]) for r in rows}
        cand = all_shards - have  # bloomless shards: must scan
        if hashes.size == 0:
            return cand
        for r in rows:
            if int(r["shard"]) not in all_shards:
                continue
            words = np.frombuffer(r["bloom"], dtype=np.uint64)
            if _bloom_maybe_contains(words, int(r["m_bits"]),
                                     hashes).any():
                cand.add(int(r["shard"]))
        return cand

    # Large sidecar (many shards × MB-scale blooms): probe executor-side.
    # Batch hashes (bounded by batch size) ship in the closure; bloom
    # bytes never leave the executors — only shard ids come back.
    h_local = hashes

    def probe(it):
        for pdf in it:
            keep = []
            for _, r in pdf.iterrows():
                words = np.frombuffer(r["bloom"], dtype=np.uint64)
                if h_local.size and _bloom_maybe_contains(
                        words, int(r["m_bits"]), h_local).any():
                    keep.append(int(r["shard"]))
            yield pd.DataFrame({"shard": keep})

    bdf = spark.read.parquet(path)
    have = {int(r["shard"])
            for r in bdf.select("shard").distinct().collect()}
    cand = all_shards - have
    if hashes.size == 0:
        return cand
    hit = bdf.mapInPandas(probe, schema="shard int").collect()
    cand |= {int(r["shard"]) for r in hit if int(r["shard"]) in all_shards}
    return cand
