"""Snapshot-isolated incremental updates (ROADMAP #3): hardlink-cloned
blue/green batches. Guarantees under test:
  - a reader pinned to the OLD version dir serves pre-batch results
    unchanged while the batch lands (snapshot isolation),
  - a reader opened on the BASE dir retargets to the new version,
  - untouched shards SHARE inodes with the previous version (the clone
    is metadata-only), touched shards get new files,
  - unversioned indexes are refused; a missing index bootstraps v1,
  - old versions are pruned beyond keep_versions (never the current).
"""

import os

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.build import IndexConfig, build_index, \
    build_index_versioned
from maestro_spark.operators.incremental import incremental_update_versioned
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs
from maestro_spark.sources.tableio import list_versions, resolve_alias

CFG = IndexConfig(
    shard_size=64,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
)


def _upsert_batch(spark, base, n=5, marker="zzqversioned"):
    docs = spark.read.parquet(os.path.join(resolve_alias(base), "docs"))
    return (docs.orderBy("doc_id").limit(n)
            .select("repo", "path", "commit", "lang",
                    F.concat(F.col("content"),
                             F.lit(f" {marker}")).alias("content")))


@pytest.fixture()
def base(spark, tmp_path):
    b = str(tmp_path / "idx_base")
    build_index_versioned(spark, synth_docs(spark, 200, seed=5, partitions=4),
                          b, CFG)
    return b


def test_snapshot_isolation_and_retarget(spark, base):
    v1 = resolve_alias(base)
    r_pinned = IndexReader(spark, v1)       # a query mid-batch
    r_base = IndexReader(spark, base)       # an alias-following reader
    before = r_pinned.search_local("user merge", k=10)

    m = incremental_update_versioned(spark, base, _upsert_batch(spark, base),
                                     None, CFG)
    assert m["version_dir"] == "v2"
    assert resolve_alias(base).endswith("v2")

    # pinned reader still serves the OLD snapshot, bit-identical
    after_pinned = r_pinned.search_local("user merge", k=10)
    assert before.equals(after_pinned)
    # the alias reader retargets and sees the marker term
    assert r_base.count_local("zzqversioned") == 5
    assert r_pinned.count_local("zzqversioned") == 0


def test_untouched_shards_share_inodes(spark, base):
    v1 = resolve_alias(base)
    m = incremental_update_versioned(spark, base, _upsert_batch(spark, base),
                                     None, CFG)
    v2 = os.path.join(base, m["version_dir"])
    touched = {int(s) for s, e in m["shards"].items()
               if str(s) not in set(map(str, m.get("skipped_shards", [])))}
    skipped = [int(s) for s in m.get("skipped_shards", [])]
    assert skipped, "test needs at least one untouched shard"

    def inodes(version_dir, shard):
        d = os.path.join(version_dir, "docs", f"shard={shard}")
        return {f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")}

    s_skip = skipped[0]
    assert inodes(v1, s_skip) == inodes(v2, s_skip)  # shared, not copied
    s_touch = sorted(touched - set(skipped))[0]
    shared = set(inodes(v1, s_touch).values()) & set(inodes(v2, s_touch).values())
    assert not shared  # rebuilt shard wrote new files


def test_unversioned_index_refused(spark, tmp_path):
    flat = str(tmp_path / "idx_flat")
    build_index(spark, synth_docs(spark, 100, seed=5, partitions=4),
                flat, CFG)
    with pytest.raises(ValueError, match="unversioned"):
        incremental_update_versioned(
            spark, flat, _upsert_batch(spark, flat), None, CFG)


def test_bootstrap_missing_index(spark, tmp_path):
    b = str(tmp_path / "idx_boot")
    m = incremental_update_versioned(
        spark, b, synth_docs(spark, 100, seed=5, partitions=4), None, CFG)
    assert m["version_dir"] == "v1"
    r = IndexReader(spark, b)
    assert len(r.search_local("user", k=5)) > 0


def test_version_pruning(spark, base):
    for i in range(3):
        incremental_update_versioned(
            spark, base, _upsert_batch(spark, base, marker=f"zzq{i}"),
            None, CFG, keep_versions=2)
    vs = list_versions(base)
    assert len(vs) == 2 and vs[-1] == "v4"
    assert resolve_alias(base).endswith("v4")


# ------------------------------------------------------ point-in-time


def test_pit_survives_pruning_and_serves_old_view(spark, base):
    """ES PIT contract: a live PIT retains its version across updates
    that would otherwise prune it, and a reader on the PIT dir keeps
    serving the pinned snapshot."""
    from maestro_spark.sources.tableio import (close_pit, open_pit,
                                               pit_versions, resolve_pit)

    pit = open_pit(base)
    assert pit["version"] == "v1"
    r_pit = IndexReader(spark, pit["dir"])
    before = r_pit.search_local("user merge", k=10)

    # two updates with keep_versions=1 — without the pin, v1 would die
    for i in range(2):
        incremental_update_versioned(
            spark, base, _upsert_batch(spark, base, marker=f"zzp{'ab'[i]}"),
            None, CFG, keep_versions=1)
    vs = list_versions(base)
    assert "v1" in vs and vs[-1] == "v3"      # pinned + current survive
    assert "v2" not in vs                      # unpinned one was pruned
    assert pit_versions(base) == {"v1"}
    assert resolve_pit(base, pit["id"]).endswith("v1")

    after = r_pit.search_local("user merge", k=10)
    assert before.equals(after)
    assert r_pit.count_local("zzpa") == 0      # snapshot: no new terms
    assert IndexReader(spark, base).count_local("zzpb") == 5

    # close → the NEXT update prunes v1
    assert close_pit(base, pit["id"]) is True
    assert close_pit(base, pit["id"]) is False  # idempotent, ES-style
    incremental_update_versioned(
        spark, base, _upsert_batch(spark, base, marker="zzpc"),
        None, CFG, keep_versions=1)
    assert "v1" not in list_versions(base)
    with pytest.raises(ValueError, match="PIT"):
        resolve_pit(base, pit["id"])


def test_pit_refused_on_unversioned(spark, tmp_path):
    from maestro_spark.sources.tableio import open_pit

    flat = str(tmp_path / "idx_flat_pit")
    build_index(spark, synth_docs(spark, 80, seed=5, partitions=4),
                flat, CFG)
    with pytest.raises(ValueError, match="versioned"):
        open_pit(flat)


def test_pit_with_search_after_pagination(spark, base):
    """The ES deep-pagination recipe: PIT + search_after. Pages drawn
    through the PIT before and after a concurrent update stitch into
    the SAME total ordering — no skipped or doubled hits."""
    from maestro_spark.sources.tableio import open_pit

    pit = open_pit(base)
    r_pit = IndexReader(spark, pit["dir"])
    full = r_pit.search_local("user merge", k=50)
    page1 = full.head(5)

    incremental_update_versioned(
        spark, base, _upsert_batch(spark, base, marker="zzpage"),
        None, CFG, keep_versions=1)

    # page 2 AFTER the update, resumed from page 1's cursor
    last = page1.iloc[-1]
    page2 = r_pit.search_after_local(
        "user merge", k=5,
        after=(float(last["score"]), int(last["doc_id"])))
    got = list(page1["doc_id"]) + list(page2["doc_id"])
    assert got == list(full["doc_id"][:10])


# ------------------------------------------------------ snapshot/restore


def test_snapshot_restore_roundtrip(spark, base):
    """ES _snapshot semantics: snapshot the current state, mutate, then
    restore — the restored alias serves the snapshotted results
    bit-identically; the mutation's version is untouched on disk."""
    from maestro_spark.sources.tableio import (snapshot_create,
                                               snapshot_delete,
                                               snapshot_list,
                                               snapshot_restore)

    before = IndexReader(spark, base).search_local("user merge", k=10)
    snap = snapshot_create(base, "pre-edit")
    assert snap["version"] == "v1" and snap["files"] > 0
    assert snapshot_list(base) == ["pre-edit"]
    with pytest.raises(ValueError, match="exists"):
        snapshot_create(base, "pre-edit")

    incremental_update_versioned(
        spark, base, _upsert_batch(spark, base, marker="zzsnap"),
        None, CFG)
    r = IndexReader(spark, base)
    assert r.count_local("zzsnap") == 5

    v = snapshot_restore(base, "pre-edit")
    assert v == "v3"  # restored AS a new version, v2 untouched
    assert resolve_alias(base).endswith("v3")
    after = IndexReader(spark, base).search_local("user merge", k=10)
    assert before.equals(after)
    assert IndexReader(spark, base).count_local("zzsnap") == 0
    assert "v2" in list_versions(base)

    assert snapshot_delete(base, "pre-edit") is True
    assert snapshot_delete(base, "pre-edit") is False
    with pytest.raises(ValueError, match="no snapshot"):
        snapshot_restore(base, "pre-edit")


def test_snapshot_refused_on_unversioned(spark, tmp_path):
    from maestro_spark.sources.tableio import snapshot_create

    flat = str(tmp_path / "idx_flat_snap")
    build_index(spark, synth_docs(spark, 60, seed=5, partitions=4),
                flat, CFG)
    with pytest.raises(ValueError, match="versioned"):
        snapshot_create(flat, "s1")
