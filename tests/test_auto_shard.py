"""Shard-size auto-derivation (VERDICT r3 #7): derive_shard_size unit
band checks + an AUTO_SHARD build producing a concrete manifest value,
searchable results, and incremental updates that adopt the index size."""

import math

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.build import (AUTO_SHARD, IndexConfig,
                                           build_index, derive_shard_size)
from maestro_spark.operators.incremental import incremental_update
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs


def _n_shards(n_docs, size):
    return math.ceil(n_docs / size)


def test_derive_band_2m_docs():
    """The 10×-run config rule: 2M docs should land in ~25–50 shards
    (was 245 fixed-size shards, which taxed the serving floor)."""
    size = derive_shard_size(2_000_000, avg_doc_bytes=1000)
    assert 25 <= _n_shards(2_000_000, size) <= 50


def test_derive_grows_with_corpus():
    sizes = [derive_shard_size(n, 1000)
             for n in (10_000, 200_000, 2_000_000, 100_000_000)]
    shards = [_n_shards(n, s) for n, s in
              zip((10_000, 200_000, 2_000_000, 100_000_000), sizes)]
    assert shards == sorted(shards)
    assert shards[0] == 1                 # tiny corpus: one shard
    assert shards[-1] >= 1000             # big corpus: real fan-out


def test_derive_byte_budget_caps_huge_docs():
    """10 MB docs: the byte cap (1 GiB content / shard) binds before
    the docs target does."""
    size = derive_shard_size(1_000_000, avg_doc_bytes=10 * 1024 * 1024)
    assert size * 10 * 1024 * 1024 <= (1 << 30)
    assert size >= 1


def test_derive_no_stats():
    assert derive_shard_size(500) == 65_536   # docs target, no byte info
    assert derive_shard_size(0) == 65_536


def test_auto_build_and_incremental(spark, tmp_path):
    out = str(tmp_path / "idx_auto")
    docs = synth_docs(spark, 250, seed=31, partitions=4)
    cfg = IndexConfig(shard_size=AUTO_SHARD, n_buckets=4, n_salts=2,
                      sample_fraction=1.0)
    man = build_index(spark, docs, out, cfg)
    # manifest carries the CONCRETE derived value, never the sentinel
    assert man["config"]["shard_size"] == 65_536
    assert len(man["shards"]) == 1
    r = IndexReader(spark, out)
    hits = r.search_local("user merge", k=5)
    assert len(hits) > 0
    # incremental with an AUTO cfg adopts the index's fixed size
    ups = synth_docs(spark, 5, seed=77, partitions=1) \
        .withColumn("path", F.concat(F.lit("nw/"), F.col("path")))
    man2 = incremental_update(spark, out, ups,
                              cfg=IndexConfig(shard_size=AUTO_SHARD,
                                              n_buckets=4, n_salts=2,
                                              sample_fraction=1.0))
    assert man2["config"]["shard_size"] == 65_536
    assert man2["n_docs"] == 255
