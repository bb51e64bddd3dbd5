"""Maestro pipeline-semantics tests (SURVEY.md §5 fixtures): exclusion,
conflict detect+drop, upsert source-merge, delete, and the incremental
re-index path (only changed shards rebuilt; queries reflect the change)."""

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators import pipeline as pl
from maestro_spark.operators.build import IndexConfig
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs

N = 300
CFG = IndexConfig(shard_size=120, n_buckets=8, n_salts=4,
                  hot_df_fraction=0.05, sample_fraction=1.0)


def test_exclusion_any_level(spark):
    rows = [(1, "a", "x"), (2, "b", "x"), (3, "a", "y"), (4, "c", "z")]
    d = spark.createDataFrame(rows, "id long, repo string, lang string")
    rules = pl.ExclusionRules({"repo": ["b"], "lang": ["z"], "id": [3]})
    kept = {r["id"] for r in pl.apply_exclusions(d, rules).collect()}
    dropped = {r["id"] for r in pl.excluded(d, rules).collect()}
    assert kept == {1}
    assert dropped == {2, 3, 4}


def test_conflict_detect_and_drop(spark):
    stored = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "ccc")], "doc_id long, content string")
    incoming = spark.createDataFrame(
        [(2, "bbb"), (3, "CHANGED"), (4, "ddd")], "doc_id long, content string")
    conflicts = pl.detect_conflicts(stored, incoming, ["doc_id"])
    assert [r["doc_id"] for r in conflicts.collect()] == [3]
    clean = pl.drop_conflicting(incoming, conflicts, ["doc_id"])
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4]


def test_upsert_source_set_merge(spark):
    stored = spark.createDataFrame(
        [(1, "old", ["s1"]), (2, "keep", ["s1"])],
        "doc_id long, content string, sources array<string>")
    incoming = spark.createDataFrame(
        [(1, "new", ["s2"]), (3, "add", ["s2"])],
        "doc_id long, content string, sources array<string>")
    out = {r["doc_id"]: r for r in pl.upsert_docs(
        stored, incoming, ["doc_id"], ["content"]).collect()}
    assert out[1]["content"] == "new" and out[1]["sources"] == ["s1", "s2"]
    assert out[2]["content"] == "keep" and out[2]["sources"] == ["s1"]
    assert out[3]["content"] == "add" and out[3]["sources"] == ["s2"]
    # idempotency: re-applying the same incoming changes nothing
    merged = pl.upsert_docs(stored, incoming, ["doc_id"], ["content"])
    again = {r["doc_id"]: r for r in pl.upsert_docs(
        merged, incoming, ["doc_id"], ["content"]).collect()}
    assert {k: (v["content"], v["sources"]) for k, v in again.items()} == \
           {k: (v["content"], v["sources"]) for k, v in out.items()}


def test_delete_docs(spark):
    stored = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    dels = spark.createDataFrame([(2,)], "doc_id long")
    assert sorted(r["doc_id"] for r in
                  pl.delete_docs(stored, dels, ["doc_id"]).collect()) == [1, 3]


def test_incremental_reindex_only_changed_shard(spark, tmp_path):
    """M7+M5: editing docs in ONE shard rebuilds only that shard (manifest
    skipped_shards covers the rest) and queries see the new content."""
    out = str(tmp_path / "idx")
    docs = synth_docs(spark, N, seed=42, partitions=5)
    m1 = pl.upsert_and_reindex(spark, out, docs, CFG)
    n_shards = len(m1["shards"])
    assert n_shards == 3 and m1["skipped_shards"] == []

    reader = IndexReader(spark, out)
    assert reader.search_pandas("zzzmarkerzzz", k=5).empty

    # mutate one doc (content change) — identify its shard via the docstore
    stored = spark.read.parquet(f"{out}/docs")
    target = stored.orderBy("doc_id").limit(1).collect()[0]
    changed = docs.withColumn(
        "content",
        F.when((F.col("repo") == target["repo"]) & (F.col("path") == target["path"])
               & (F.col("commit") == target["commit"]),
               F.concat(F.col("content"), F.lit(" zzzmarkerzzz")))
        .otherwise(F.col("content")),
    )
    m2 = pl.upsert_and_reindex(spark, out, changed, CFG)
    assert len(m2["skipped_shards"]) == n_shards - 1, (
        f"expected only 1 shard rebuilt, skipped={m2['skipped_shards']}"
    )
    hits = IndexReader(spark, out).search_pandas("zzzmarkerzzz", k=5)
    assert hits["doc_id"].tolist() == [target["doc_id"]]
