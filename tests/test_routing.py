"""Custom routing (the ES `_routing` analogue): hash-of-field sharding
at build, single-shard routed queries at search.

Reference: ES custom routing (docs/reference routing field) — the
reference app's delegate supports ?routing= on index/search; here the
routing hash is md5-based so DuckDB/Python reproduce it exactly
(docids.routing_shard_col)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.docids import (assign_doc_ids_routed,
                                            routing_shard,
                                            routing_shard_col)
from maestro_spark.operators.search import IndexReader

N_DOCS = 400
N_SHARDS = 4
CFG = IndexConfig(
    shard_size=512,
    n_buckets=8,
    n_salts=2,
    sample_fraction=1.0,
    routing_col="lang",
    n_routing_shards=N_SHARDS,
)
Q = "index merge query"


@pytest.fixture(scope="module")
def corpus():
    from maestro_spark.sources.corpus import synth_docs_pandas
    return synth_docs_pandas(N_DOCS, seed=5).reset_index(names="orig_id")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("idx_routed"))
    build_index(spark, spark.createDataFrame(corpus), out, CFG)
    return out


@pytest.fixture(scope="module")
def reader(spark, built):
    return IndexReader(spark, built)


def test_hash_parity_spark_python(spark):
    vals = ["es", "java", "py", "tenant-42", "", "ü"]
    df = spark.createDataFrame([(v,) for v in vals], "v string") \
        .select("v", routing_shard_col("v", N_SHARDS).alias("s"))
    got = {r["v"]: r["s"] for r in df.collect()}
    assert got == {v: routing_shard(v, N_SHARDS) for v in vals}


def test_routing_colocates_and_ids_dense(reader, corpus):
    docs = reader._docs().select("doc_id", "lang").toPandas()
    shard = docs["doc_id"] // CFG.shard_size
    # every doc's shard is exactly the routing hash of its lang
    want = docs["lang"].map(lambda v: routing_shard(v, N_SHARDS))
    assert (shard == want).all()
    # local ids dense from 0 per shard (doc-range invariant preserved)
    for s, grp in docs.groupby(shard):
        local = np.sort(grp["doc_id"].to_numpy()) - s * CFG.shard_size
        assert (local == np.arange(len(grp))).all()


def test_routed_search_equals_shard_subset(reader, corpus):
    langs = sorted(corpus["lang"].unique())
    full = reader.search_local(Q, k=100_000)
    for lang in langs[:2]:
        s = routing_shard(lang, N_SHARDS)
        lo, hi = s * CFG.shard_size, (s + 1) * CFG.shard_size
        want = full[(full["doc_id"] >= lo) & (full["doc_id"] < hi)] \
            .head(10).reset_index(drop=True)
        got = reader.search_local(Q, k=10, routing=lang)
        pd.testing.assert_frame_equal(got, want)
        # Spark path bit-identical to the serving path
        got_spark = reader.search(Q, k=10, routing=lang).toPandas()
        pd.testing.assert_frame_equal(got_spark, want)


def test_routed_count_and_fetch_pruning(reader, corpus):
    lang = sorted(corpus["lang"].unique())[0]
    s = routing_shard(lang, N_SHARDS)
    terms = Q.split()
    by_shard = reader._fetch_posting_rows_routed(terms, s)
    assert set(by_shard) <= {s}
    n = reader.count_local(Q, routing=lang)
    full = reader.search_local(Q, k=100_000)
    lo, hi = s * CFG.shard_size, (s + 1) * CFG.shard_size
    assert n == ((full["doc_id"] >= lo) & (full["doc_id"] < hi)).sum()


def test_routed_spark_plan_prunes_partitions(reader):
    # the routed posting scan keeps exactly one shard partition
    lang_any = "es"
    s = routing_shard(lang_any, N_SHARDS)
    rel = reader._postings().where(
        (F.col("term").isin(["index"])) & (F.col("shard") == s))
    plan = rel._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "shard" in plan


def test_routing_on_range_sharded_index_raises(spark, tmp_path_factory,
                                               corpus):
    out = str(tmp_path_factory.mktemp("idx_plain"))
    cfg = IndexConfig(shard_size=256, n_buckets=8, n_salts=2,
                      sample_fraction=1.0)
    build_index(spark, spark.createDataFrame(corpus), out, cfg)
    r = IndexReader(spark, out)
    with pytest.raises(ValueError, match="routing"):
        r.search_local(Q, routing="es")


def test_routing_overflow_raises(spark, corpus):
    with pytest.raises(ValueError, match="overflow"):
        assign_doc_ids_routed(spark.createDataFrame(corpus), "lang",
                              n_shards=2, shard_size=10).count()


def test_routing_id_col_conflict(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="routing_col"):
        build_index(spark, spark.createDataFrame(corpus), str(tmp_path),
                    CFG, id_col="orig_id")
