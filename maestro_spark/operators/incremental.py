"""Scale-safe incremental index maintenance — the upsert/delete path the
streaming command layer rides (SURVEY.md §2.2 K1-K3, §3.3).

Round 1's incremental path re-derived dense doc ids and fingerprints over
the WHOLE corpus per micro-batch (a full-corpus range sort + sha scan per
command batch — the one wrong plan in the engine). This module replaces
it with:

  * STABLE doc ids. Existing keys keep their doc_id verbatim (idempotent
    upsert-by-_id, the ES contract — SearchAdapterHelper.java:48-154
    scripted upserts never change a document's _id or shard routing).
    Brand-new keys get append-only HIGH-WATER ids (manifest.max_doc_id+1
    onward, assigned in sorted key order for determinism). No existing id
    ever shifts, so shard membership of untouched docs cannot change.
  * AFFECTED-SHARD-ONLY work. Only shards containing a batch key — plus
    the shard(s) the new high-water ids land in — are re-read,
    re-fingerprinted, re-tokenized and re-encoded. Every other shard
    carries its manifest entry verbatim; its docs/doclens/postings files
    are never opened.

Cost shape at scale (the part the fingerprint-everything design got
wrong): per batch the key probe first consults the per-shard key bloom
sidecars (keybloom.py — the native analogue of the metadata/bloom file
skipping an Iceberg deployment would do behind the TableIO seam), then
runs ONE column-pruned scan of the docstore key columns (doc_id, shard,
repo, path, commit — no content) over ONLY the candidate shards, with a
broadcast semi-join against the batch keys (no shuffle of the big side).
Content reads and rebuild work stay bounded by |touched shards| *
shard_size regardless of corpus size. A delete-only batch whose keys
miss every bloom does no scan and no rebuild at all.

Reference parity: ES routes each document to one shard by _id and bulk
upsert/delete touches only the owning shards
(FileCentricElasticSearchAdapter.java:190-229, 266-324); this module
mirrors that locality contract on the posting store.
"""

from __future__ import annotations

import os
import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from maestro_spark.operators.build import (
    POSITIONS_SEMANTICS,
    IndexConfig,
    _build_shards,
    build_index,
    positions_compatible,
)
from maestro_spark.operators.docids import DOC_KEY, assign_doc_ids
from maestro_spark.sources.tableio import read_manifest

DOC_COLS = ["repo", "path", "commit", "lang", "content"]


def _dedup_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Deterministic one-row-per-key (dropDuplicates keeps an ARBITRARY
    row — unacceptable on a reindex path). Callers that resolved command
    order already pass unique keys; this is the deterministic backstop
    for direct API use."""
    w = Window.partitionBy(*DOC_KEY).orderBy(F.xxhash64(*cols))
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def incremental_update(
    spark: SparkSession,
    index_dir: str,
    upserts: DataFrame,
    deletes: DataFrame | None = None,
    cfg: IndexConfig | None = None,
) -> dict:
    """Apply upserts(repo,path,commit,lang,content) and deletes(repo,path,
    commit) to an existing index, rebuilding only the affected shards.
    Returns the new manifest; `skipped_shards` covers the untouched rest.

    A key present in both frames is treated as an upsert (command-order
    resolution is the caller's job — streaming.commands resolves by seq).
    On a missing index this bootstraps a fresh build (K4
    first-write-creates)."""
    cfg = cfg or IndexConfig()
    t0 = time.time()
    manifest = read_manifest(os.path.join(index_dir, "manifest.json"))
    if manifest is None:
        docs = upserts.select(*DOC_COLS, *cfg.stored_columns)
        if deletes is not None:
            docs = docs.join(deletes.select(*DOC_KEY), DOC_KEY, "left_anti")
        return build_index(spark, docs, index_dir, cfg)
    from maestro_spark.operators.build import AUTO_SHARD
    if cfg.shard_size == AUTO_SHARD:  # adopt the index's fixed size
        from dataclasses import replace as _dc_replace
        cfg = _dc_replace(cfg,
                          shard_size=manifest["config"]["shard_size"])
    if manifest["config"]["shard_size"] != cfg.shard_size:
        raise ValueError(
            f"shard_size mismatch: index has {manifest['config']['shard_size']}, "
            f"cfg has {cfg.shard_size} — doc ids would route to wrong shards")
    if not positions_compatible(manifest, cfg):
        # untouched shards would keep an old-semantics prox stream that the
        # new reader phrase-matches wrongly (ADVICE r2 #4): refuse instead
        # of mixing semantics; a full build_index migrates the index.
        raise ValueError(
            "index positional stream was written under older positions "
            "semantics (manifest positions_semantics != "
            f"{POSITIONS_SEMANTICS}); run a full build_index (or "
            "reindex_versioned) to migrate before incremental updates")
    # one codec per index: rebuilt shards must match the untouched
    # shards' posting format (a mixed-schema postings dir would make
    # dataset schema unification order-dependent), so adopt the index's
    # codec regardless of what the caller's cfg says. Old manifests
    # predate the field -> varint.
    index_codec = manifest["config"].get("codec", "varint")
    if cfg.codec != index_codec:
        from dataclasses import replace as _dc_replace
        cfg = _dc_replace(cfg, codec=index_codec)
    # index_sort does NOT survive an incremental update: appended docs
    # take fresh high-water ids, breaking doc_id ≡ (sort_col, doc_id).
    # The rewritten manifest config therefore intentionally drops the
    # flag (search_sorted's 'auto' falls back to the exact path); a
    # caller cfg asserting it is a contract error — refuse loudly
    # rather than stamp a sort invariant the index no longer holds.
    if cfg.index_sort is not None:
        raise ValueError(
            "cfg.index_sort is not valid for incremental_update: appends "
            "reassign high-water doc ids, so the sorted-id invariant no "
            "longer holds. Rebuild via build_index_sorted (or "
            "reindex through it) to re-establish index_sort.")
    from maestro_spark.operators.build import POSTING_FORMAT
    fmt = manifest.get("posting_format",
                       1 if index_codec == "varint" else 2)
    if fmt != POSTING_FORMAT[index_codec]:
        raise ValueError(
            f"index posting layout (format {fmt}) predates this codec's "
            f"current layout ({POSTING_FORMAT[index_codec]}); rebuilt "
            "shards would mix parquet schemas with untouched ones — run "
            "a full build_index (or reindex_versioned) to migrate")
    shard_size = cfg.shard_size
    docs_path = os.path.join(index_dir, "docs")

    doc_cols = DOC_COLS + list(cfg.stored_columns)
    ups = _dedup_keys(upserts.select(*doc_cols), doc_cols)
    dels = (_dedup_keys(deletes.select(*DOC_KEY), DOC_KEY)
            if deletes is not None else None)
    batch_keys = ups.select(*DOC_KEY)
    if dels is not None:
        batch_keys = batch_keys.unionByName(dels).distinct()

    # Key probe, metadata-pruned: the per-shard bloom sidecar names the
    # only shards that can contain a batch key, so the column-pruned key
    # scan opens files ∝ candidate shards instead of every shard (the
    # Iceberg bloom-skipping analogue — keybloom.py). A bloom false
    # positive costs one extra shard scanned, never a wrong answer; a
    # legacy index without the sidecar falls back to the full key scan.
    from maestro_spark.operators.keybloom import candidate_shards
    stored_keys = spark.read.parquet(docs_path).select("doc_id", "shard", *DOC_KEY)
    cand = candidate_shards(spark, index_dir, batch_keys, list(DOC_KEY),
                            manifest)
    if cand is None:
        probe = stored_keys
    elif cand:
        probe = stored_keys.where(F.col("shard").isin(sorted(cand)))
    else:  # every bloom rejected every key: all keys are brand-new
        probe = stored_keys.where(F.lit(False))
    hits = (
        probe.join(F.broadcast(batch_keys), DOC_KEY, "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hits.count()  # materialize: reused for ids, touched shards, anti-joins
    base = None
    try:
        ups_existing = ups.join(F.broadcast(hits), DOC_KEY, "inner")
        new_docs = ups.join(F.broadcast(hits.select(*DOC_KEY)), DOC_KEY, "left_anti")

        max_id = manifest.get("max_doc_id")
        if max_id is None:  # pre-round-2 manifest: one doc_id-column agg
            max_id = stored_keys.agg(F.max("doc_id")).first()[0]
            max_id = -1 if max_id is None else max_id
        n_new = new_docs.count()
        if n_new:
            wi = assign_doc_ids(new_docs)
            base = getattr(wi, "_maestro_persisted_base", None)
            new_with_ids = wi.withColumn(
                "doc_id", F.col("doc_id") + F.lit(int(max_id) + 1))

        touched = {int(r["shard"]) for r in hits.select("shard").distinct().collect()}
        if n_new:
            touched |= set(range((int(max_id) + 1) // shard_size,
                                 (int(max_id) + n_new) // shard_size + 1))
        if not touched:
            # every command was a no-op (deletes of absent keys): nothing
            # to rebuild, manifest unchanged (audit key reports how many
            # shards the bloom-pruned probe opened — 0 when every bloom
            # rejected every key)
            out = dict(manifest)
            out["key_probe_shards"] = (sorted(cand) if cand is not None
                                       else None)
            return out
        touched_sorted = sorted(touched)

        # new content of the touched shards only (partition-pruned read)
        remaining = (
            spark.read.parquet(docs_path)
            .where(F.col("shard").isin(touched_sorted))
            .select("doc_id", *doc_cols)
            .join(F.broadcast(batch_keys), DOC_KEY, "left_anti")
        )
        parts = remaining.unionByName(ups_existing.select("doc_id", *doc_cols))
        if n_new:
            parts = parts.unionByName(new_with_ids.select("doc_id", *doc_cols))
        d = (
            parts
            .withColumn("shard", (F.col("doc_id") / shard_size).cast("int"))
            .withColumn("content_sha256", F.sha2(F.col("content"), 256))
            # localCheckpoint: materializes the touched-shard frame
            # (bounded by |touched|·shard_size) and CUTS LINEAGE to the
            # docstore files the build is about to overwrite — without it
            # a lazy re-read mid-overwrite could corrupt the run
            .localCheckpoint(eager=True)
        )
        rows = d.groupBy("shard").agg(
            F.count("*").alias("n_docs"),
            F.sum(F.pmod(F.xxhash64("repo", "path", "commit", "content_sha256"),
                         F.lit(1 << 40))).alias("fp"),
        ).collect()
        fingerprints = {int(r["shard"]): (int(r["n_docs"]), int(r["fp"]))
                        for r in rows}
        keep = {int(s): e for s, e in manifest["shards"].items()
                if int(s) not in touched}
        out = _build_shards(
            spark, d, index_dir, cfg, fingerprints, prev=manifest, keep=keep,
            max_doc_id=int(max_id) + n_new, t0=t0,
        )
        # audit (returned, not persisted): which shards the bloom probe
        # actually opened — tests assert probe opens ∝ touched shards
        out["key_probe_shards"] = (sorted(cand) if cand is not None
                                   else None)
        return out
    finally:
        hits.unpersist()
        if base is not None:
            base.unpersist()


def incremental_update_versioned(
    spark: SparkSession,
    base_dir: str,
    upserts: DataFrame,
    deletes: DataFrame | None = None,
    cfg: IndexConfig | None = None,
    keep_versions: int = 2,
) -> dict:
    """Snapshot-isolated incremental update (ROADMAP #3): the in-place
    path above mutates the serving version's partition dirs, so a query
    racing a rebuild window can observe mixed shard state. This variant
    gives every batch ES's segment-immutability guarantee on a
    plain-parquet index:

      1. hardlink-clone the CURRENT version dir into {base}/v{N+1}
         (metadata-only — O(#files), zero data bytes; see
         tableio.hardlink_clone. Under Iceberg this step IS the snapshot),
      2. run the affected-shard-only incremental_update inside the clone
         (only touched shards write new files; untouched shards keep
         serving the shared inodes),
      3. atomically flip {base}/alias.json.

    Readers opened on `base_dir` keep serving the old version mid-batch
    and retarget on their next query (IndexReader re-resolves the alias)
    — no reader can ever observe a half-applied batch. Old versions
    beyond `keep_versions` are pruned (never the current).

    On a missing index this bootstraps {base}/v1. An unversioned index
    (manifest.json directly under base_dir) is refused — migrate once
    with build.reindex(versioned=True)."""
    import shutil

    from maestro_spark.sources.tableio import (hardlink_clone, list_versions,
                                               next_version, resolve_alias,
                                               update_alias)

    cur = resolve_alias(base_dir)
    unversioned = os.path.abspath(cur) == os.path.abspath(base_dir)
    if unversioned and read_manifest(
            os.path.join(base_dir, "manifest.json")) is not None:
        raise ValueError(
            f"{base_dir} is an unversioned index — snapshot isolation "
            "needs the alias layout; migrate once with "
            "reindex(src, base, versioned=True)")
    version = next_version(base_dir)
    dst = os.path.join(base_dir, version)
    try:
        if not unversioned:
            hardlink_clone(cur, dst)
        manifest = incremental_update(spark, dst, upserts, deletes, cfg)
    except BaseException:
        shutil.rmtree(dst, ignore_errors=True)  # never flip to a bad clone
        raise
    update_alias(base_dir, version)
    if keep_versions > 0:
        from maestro_spark.sources.tableio import pit_versions
        pinned = pit_versions(base_dir)  # live PITs retain their version
        for old in list_versions(base_dir)[:-keep_versions]:
            if old != version and old not in pinned:
                shutil.rmtree(os.path.join(base_dir, old), ignore_errors=True)
    manifest["version_dir"] = version
    return manifest


def update_by_query(
    spark: SparkSession,
    index_dir: str,
    query: str,
    transform,
    cfg: IndexConfig | None = None,
    mode: str = "or",
) -> dict:
    """_update_by_query (the ES analogue, ManagementController's bulk
    re-map flow re-expressed): re-index every doc matching `query` with
    a column `transform` applied, touching ONLY the shards holding
    matches.

    transform: DataFrame -> DataFrame over the matched docstore rows
    (must keep the natural key repo/path/commit and the indexed
    columns — the painless-script seam; column expressions stay
    whole-stage-codegen).

    Scale shape: the match set comes from the posting-bounded
    match_docs (never a corpus scan); the docstore fetch joins on
    (shard, doc_id) so partition pruning opens only matched shards;
    the rewrite is incremental_update's affected-shard-only rebuild
    with stable ids. Work ∝ |matches| + |touched shards| · shard_size,
    corpus-size independent — the same cost model ES documents for
    _update_by_query (it re-indexes matched docs, it does not rewrite
    segments in place)."""
    from maestro_spark.operators.search import IndexReader

    cfg = cfg or IndexConfig()
    reader = IndexReader(spark, index_dir)
    matches = reader.match_docs(query, mode=mode)
    docs_path = os.path.join(index_dir, "docs")
    stored = spark.read.parquet(docs_path)
    hit = stored.join(matches, ["shard", "doc_id"], "left_semi") \
                .drop("doc_id", "shard", "content_sha256")
    mod = transform(hit)
    missing = [c for c in DOC_COLS if c not in mod.columns]
    if missing:
        raise ValueError(
            f"transform dropped required doc columns {missing}")
    return incremental_update(
        spark, index_dir,
        mod.select(*DOC_COLS, *[c for c in cfg.stored_columns
                                if c in mod.columns]),
        None, cfg)
