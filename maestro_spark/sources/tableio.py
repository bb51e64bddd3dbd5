"""TableIO seam: "Iceberg-style" tables as partitioned parquet dirs +
atomic JSON manifests (SURVEY.md §7.2: the sandbox has no Iceberg runtime
jar, so snapshots/partition-overwrite are implemented on plain parquet —
the call sites would swap to `format("iceberg")` + MERGE INTO unchanged).

Maestro analogue: index bootstrap / alias versioning
(FileCentricElasticSearchAdapter.java:146-170,232-244; application.yml:59-67)
becomes manifest-versioned table dirs."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite", dynamic: bool = False,
                      compression: str = "zstd",
                      row_group_bytes: int | None = None) -> None:
    """Write a partitioned parquet table. dynamic=True overwrites ONLY the
    partitions present in df (the resume / incremental-rebuild path — the
    analogue of Maestro re-upserting only affected docs, K1).

    compression defaults to zstd: measured on the posting store (binary
    varint payloads) it writes ~35% faster than snappy AND ~18% smaller;
    on the docstore it compresses text content harder at similar speed
    (ROADMAP #6).

    row_group_bytes bounds the parquet row-group size (parquet.block.size,
    default 128 MB). Stores whose files are sorted on a lookup key (the
    term-sorted posting/termdict stores) set this SMALLER so row-group
    min/max stats prune at finer key granularity: a query term then
    touches ~one small row group of a bucket file instead of a 128 MB
    one — this is what keeps a point lookup's I/O bounded when a
    production bucket file spans gigabytes."""
    writer = df.write.mode(mode).option("compression", compression)
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def drop_partition_dir(table_path: str, partition: str) -> None:
    """Physically remove one hive partition dir (e.g. "shard=3") from a
    partitioned parquet table — the plain-parquet stand-in for Iceberg's
    `DELETE WHERE partition = ...` / dropPartition. Used when an
    incremental update empties a shard: dynamic partition overwrite can
    only REPLACE partitions that receive rows, so an emptied partition
    must be dropped explicitly or its stale files would keep serving."""
    import shutil

    shutil.rmtree(os.path.join(table_path, partition), ignore_errors=True)


def write_manifest(path: str, manifest: dict) -> None:
    """Atomic write (tmp + rename) — a partially-written manifest must
    never be observable (Maestro's FailureData bookkeeping analogue:
    partial failure doesn't poison the run, SearchAdapterHelper.java:127-142)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def read_manifest(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


# ---- alias indirection (K4): versioned index dirs + atomic alias flip --
# The reference versions its ES indexes and migrates by repointing an
# alias (application.yml:59-67; FileCentricElasticSearchAdapter.java:
# 232-244; docs/usage/03-index-mappings.md). Here: {base}/v{N} dirs and
# an atomically-replaced {base}/alias.json pointer — readers opening via
# the alias can never observe a half-built index, and an in-place
# rebuild can run blue/green instead of mutating the serving version.

ALIAS_FILE = "alias.json"


def resolve_alias(path: str) -> str:
    """If `path` holds an alias.json, return the aliased version dir;
    otherwise return `path` unchanged (plain unversioned index)."""
    alias = os.path.join(path, ALIAS_FILE)
    if os.path.exists(alias):
        with open(alias) as f:
            return os.path.join(path, json.load(f)["current"])
    return path


def update_alias(base_dir: str, version: str) -> None:
    """Atomically repoint {base}/alias.json at `version` (tmp + rename —
    the alias-swap is the only publication step, like ES's atomic alias
    actions)."""
    write_manifest(os.path.join(base_dir, ALIAS_FILE), {"current": version})


def list_versions(base_dir: str) -> list[str]:
    if not os.path.isdir(base_dir):
        return []
    return sorted(
        (d for d in os.listdir(base_dir)
         if d.startswith("v") and d[1:].isdigit()),
        key=lambda d: int(d[1:]))


def next_version(base_dir: str) -> str:
    vs = list_versions(base_dir)
    return f"v{int(vs[-1][1:]) + 1}" if vs else "v1"


def hardlink_clone(src: str, dst: str) -> int:
    """Clone an index version dir via hardlinks — metadata-only, O(#files)
    not O(bytes), because every store file (parquet, sidecars) is
    IMMUTABLE once written: an in-place rebuild in the clone writes NEW
    part files and unlinks the clone's links, never touching the source
    version's inodes. This is the plain-filesystem stand-in for what an
    Iceberg deployment gets from snapshot metadata (a new snapshot shares
    every unchanged data file by reference); on an object store the
    equivalent is manifest-level file sharing, not copies. Returns the
    number of files linked; falls back to a copy when the filesystem
    refuses links (cross-device)."""
    import shutil

    n = 0
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        troot = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(troot, exist_ok=True)
        for f in files:
            s, t = os.path.join(root, f), os.path.join(troot, f)
            try:
                os.link(s, t)
            except OSError:
                shutil.copy2(s, t)
            n += 1
    return n


# ---- point-in-time (PIT) reads -----------------------------------------
# The ES analogue: POST /{index}/_pit pins a set of segments so paged /
# long-running searches see one consistent view while writes and merges
# continue (public ES docs, point-in-time API). On the versioned index
# layout a PIT is a keep-alive file naming the version dir the alias
# resolved to at open time: readers opened on that concrete dir never
# re-resolve the alias (resolve_alias is identity off the base dir), and
# version pruning skips any version a live PIT references — exactly ES's
# "segments are retained while a PIT references them".

PITS_DIR = "pits"


def open_pit(base_dir: str) -> dict:
    """Pin the CURRENT version for consistent reads across future alias
    flips. Returns {"id", "version", "dir"}; pass `dir` to IndexReader
    (a reader on a concrete v{N} dir is immune to alias flips) and `id`
    to close_pit when done. Refused on an unversioned index — there is
    no immutable version to pin (migrate with reindex(versioned=True))."""
    import uuid

    cur = resolve_alias(base_dir)
    if os.path.abspath(cur) == os.path.abspath(base_dir):
        raise ValueError(
            f"{base_dir} is not a versioned index — PIT needs the "
            "alias layout (build with versioned=True)")
    version = os.path.basename(cur)
    pit_id = uuid.uuid4().hex[:16]
    write_manifest(os.path.join(base_dir, PITS_DIR, f"{pit_id}.json"),
                   {"id": pit_id, "version": version})
    return {"id": pit_id, "version": version, "dir": cur}


def pit_versions(base_dir: str) -> set[str]:
    """Versions pinned by live PITs — the set version pruning must skip."""
    d = os.path.join(base_dir, PITS_DIR)
    out = set()
    if os.path.isdir(d):
        for f in os.listdir(d):
            if f.endswith(".json"):
                m = read_manifest(os.path.join(d, f))
                if m and "version" in m:
                    out.add(m["version"])
    return out


def resolve_pit(base_dir: str, pit_id: str) -> str:
    """Version dir a PIT pins; raises if the PIT was closed (the ES
    `search_context_missing` analogue)."""
    m = read_manifest(os.path.join(base_dir, PITS_DIR, f"{pit_id}.json"))
    if m is None:
        raise ValueError(f"no such PIT {pit_id!r} (closed or expired)")
    return os.path.join(base_dir, m["version"])


def close_pit(base_dir: str, pit_id: str) -> bool:
    """Release the pin; the next versioned update may prune the version.
    Returns False when the PIT was already gone (ES returns
    succeeded=false)."""
    p = os.path.join(base_dir, PITS_DIR, f"{pit_id}.json")
    if not os.path.exists(p):
        return False
    os.unlink(p)
    return True


# ---- snapshot / restore ------------------------------------------------
# The ES snapshot-repository API (public: _snapshot endpoints) on the
# versioned layout: a snapshot is a hardlink clone of the CURRENT
# version into {base}/snapshots/{name} — metadata-only, because every
# store file is immutable once written (the same property that makes
# blue/green cloning free). Restore clones the snapshot back in as a
# NEW version and flips the alias: the restored state becomes current
# without touching any later version (readers retarget on their next
# query, exactly like an incremental batch landing).

SNAPSHOTS_DIR = "snapshots"


def snapshot_create(base_dir: str, name: str) -> dict:
    """Snapshot the current version. Returns {"name", "version",
    "files"} (files = hardlinks made). Refused if the name exists —
    ES snapshots are immutable."""
    if not name or any(c in name for c in "/\\"):
        raise ValueError(f"bad snapshot name {name!r}")
    cur = resolve_alias(base_dir)
    if os.path.abspath(cur) == os.path.abspath(base_dir):
        raise ValueError(
            f"{base_dir} is not a versioned index — snapshots need the "
            "alias layout (build with versioned=True)")
    dst = os.path.join(base_dir, SNAPSHOTS_DIR, name)
    if os.path.exists(dst):
        raise ValueError(f"snapshot {name!r} already exists")
    n = hardlink_clone(cur, dst)
    return {"name": name, "version": os.path.basename(cur), "files": n}


def snapshot_list(base_dir: str) -> list[str]:
    d = os.path.join(base_dir, SNAPSHOTS_DIR)
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def snapshot_restore(base_dir: str, name: str) -> str:
    """Restore a snapshot as the CURRENT version (new v{N} + alias
    flip — later versions are untouched and still prunable). Returns
    the new version name."""
    src = os.path.join(base_dir, SNAPSHOTS_DIR, name)
    if not os.path.isdir(src):
        raise ValueError(f"no snapshot {name!r} in {base_dir}")
    version = next_version(base_dir)
    hardlink_clone(src, os.path.join(base_dir, version))
    update_alias(base_dir, version)
    return version


def snapshot_delete(base_dir: str, name: str) -> bool:
    import shutil

    d = os.path.join(base_dir, SNAPSHOTS_DIR, name)
    if not os.path.isdir(d):
        return False
    shutil.rmtree(d)
    return True
