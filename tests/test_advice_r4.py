"""Round-4 ADVICE regression tests: PIT-pinned version pruning in the
versioned FULL build (not just incremental), index_sort lifecycle on
reindex/incremental paths, pr_curve empty-input contract, and
incremental_dedup with non-long id types."""

import os

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.build import (IndexConfig, build_index,
                                           build_index_sorted,
                                           build_index_versioned, reindex)
from maestro_spark.operators.incremental import incremental_update
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs
from maestro_spark.sources.tableio import (close_pit, open_pit, read_manifest,
                                           resolve_alias, resolve_pit)

CFG = IndexConfig(shard_size=60, n_buckets=4, n_salts=2, sample_fraction=1.0)


# ---------------------------------------------------- PIT vs versioned build


def test_versioned_full_build_prune_skips_pit_pinned(spark, tmp_path):
    """build_index_versioned must honor the PIT retention contract the
    incremental path already enforces: a full rebuild with
    keep_versions=1 may NOT rmtree a version a live PIT pins."""
    base = str(tmp_path / "idx")
    docs = synth_docs(spark, 80, seed=3, partitions=3)
    build_index_versioned(spark, docs, base, CFG, keep_versions=1)
    pit = open_pit(base)  # pins v1
    # two more full rebuilds; with keep_versions=1 both would prune v1
    build_index_versioned(spark, docs, base, CFG, keep_versions=1)
    build_index_versioned(spark, docs, base, CFG, keep_versions=1)
    pinned_dir = resolve_pit(base, pit["id"])
    assert os.path.isdir(pinned_dir), "PIT-pinned version was pruned"
    # the pinned version still serves a consistent read
    r = IndexReader(spark, pinned_dir)
    assert len(r.search_local("user merge", k=5)) >= 0
    # unpinned old versions WERE pruned (v2 is neither current nor pinned)
    vdirs = sorted(d for d in os.listdir(base) if d.startswith("v"))
    assert "v2" not in vdirs
    close_pit(base, pit["id"])
    build_index_versioned(spark, docs, base, CFG, keep_versions=1)
    assert not os.path.isdir(pinned_dir), "released version not pruned"


# ------------------------------------------------- index_sort lifecycle


@pytest.fixture(scope="module")
def sorted_src(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_sorted_src"))
    docs = synth_docs(spark, 120, seed=9, partitions=4)
    build_index_sorted(spark, docs, out, "lang", CFG)
    return out


def test_reindex_keep_ids_false_strips_index_sort(spark, sorted_src,
                                                  tmp_path):
    """keep_ids=False reassigns ids in DOC_KEY order, breaking the
    doc_id ≡ (lang, doc_id) invariant — the new manifest must not claim
    it, and search_sorted's force path must refuse."""
    dst = str(tmp_path / "resharded")
    reindex(spark, sorted_src, dst, keep_ids=False, versioned=False)
    man = read_manifest(os.path.join(resolve_alias(dst), "manifest.json"))
    assert man["config"].get("index_sort") is None
    with pytest.raises(ValueError, match="not sorted"):
        IndexReader(spark, dst).search_sorted(
            "user", "lang", use_index_sort="force")
    # auto falls back to the exact path and agrees with 'never'
    r = IndexReader(spark, dst)
    a = [(x["doc_id"], x["sort_value"]) for x in
         r.search_sorted("user merge", "lang", k=5).collect()]
    b = [(x["doc_id"], x["sort_value"]) for x in
         r.search_sorted("user merge", "lang", k=5,
                         use_index_sort="never").collect()]
    assert a == b


def test_reindex_keep_ids_true_preserves_index_sort(spark, sorted_src,
                                                    tmp_path):
    """keep_ids=True preserves the id assignment, so the sort invariant
    (and the early-termination fast path) carries over."""
    dst = str(tmp_path / "kept")
    reindex(spark, sorted_src, dst, keep_ids=True, versioned=False)
    man = read_manifest(os.path.join(resolve_alias(dst), "manifest.json"))
    assert list(man["config"]["index_sort"]) == ["lang", True]
    a = [(x["doc_id"], x["sort_value"]) for x in
         IndexReader(spark, dst).search_sorted(
             "user merge", "lang", k=5,
             use_index_sort="force").collect()]
    b = [(x["doc_id"], x["sort_value"]) for x in
         IndexReader(spark, sorted_src).search_sorted(
             "user merge", "lang", k=5,
             use_index_sort="never").collect()]
    assert a == b


def test_incremental_update_refuses_cfg_index_sort(spark, sorted_src):
    from dataclasses import replace
    ups = synth_docs(spark, 5, seed=77, partitions=1)
    with pytest.raises(ValueError, match="index_sort"):
        incremental_update(spark, sorted_src, ups,
                           cfg=replace(CFG, index_sort=("lang", True)))


def test_incremental_update_drops_index_sort_from_manifest(spark,
                                                           sorted_src,
                                                           tmp_path):
    """A real append breaks the sorted-id invariant: the rewritten
    manifest must drop index_sort so search_sorted 'auto' takes the
    exact path (copy the index first — sorted_src is module-scoped)."""
    import shutil
    idx = str(tmp_path / "sorted_copy")
    shutil.copytree(sorted_src, idx)
    ups = synth_docs(spark, 8, seed=501, partitions=1) \
        .withColumn("path", F.concat(F.lit("newdir/"), F.col("path")))
    man = incremental_update(spark, idx, ups, cfg=CFG)
    assert man["config"].get("index_sort") is None
    disk = read_manifest(os.path.join(idx, "manifest.json"))
    assert disk["config"].get("index_sort") is None
    r = IndexReader(spark, idx)
    a = [(x["doc_id"], x["sort_value"]) for x in
         r.search_sorted("user merge", "lang", k=5).collect()]
    b = [(x["doc_id"], x["sort_value"]) for x in
         r.search_sorted("user merge", "lang", k=5,
                         use_index_sort="never").collect()]
    assert a == b


# ------------------------------------------------------- small contracts


def test_pr_curve_empty_input_zero_not_null(spark):
    from maestro_spark.operators.classifier import pr_curve
    empty = spark.createDataFrame([], "score double, label int")
    rows = pr_curve(empty, thresholds=(0.5,)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["kept_frac"] == 0.0 and r["precision"] == 0.0 \
        and r["recall"] == 0.0 and r["f1"] == 0.0


def test_incremental_dedup_string_ids(spark):
    from maestro_spark.operators.dedup import incremental_dedup
    batch = spark.createDataFrame(
        [("a", "hello world"), ("b", "hello world"), ("c", "unique")],
        "doc_id string, text string")
    store = spark.createDataFrame([("feedbeef" * 4,)], "fingerprint string")
    out = incremental_dedup(batch, store).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == ["a", "b", "c"]
    assert [r["keep"] for r in out] == [True, False, True]
    assert not any(r["dup_of_store"] for r in out)
