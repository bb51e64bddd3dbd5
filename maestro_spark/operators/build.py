"""Distributed inverted-index build — the native rebuild of what Maestro
delegates to Elasticsearch bulk indexing (SURVEY.md §2.2 K1, §2.6 A4,
§2.10), re-expressed as DataFrame + Arrow-UDF dataflow:

  docs ──assign_doc_ids──▶ docstore (sharded by doc range)
       ──mapInPandas tokenize──▶ (shard, doc_id, term, tf, dl, field)
       ──sample──▶ hot-term detection ──▶ salted repartition by
         (shard, term, salt)  [contiguous doc-range salts]
       ──sortWithinPartitions + streaming mapInPandas encode──▶ segments
       ──groupBy(shard,term) applyInPandas merge (hot terms only)──▶
         postings parquet partitioned by (shard, term_bucket)
       + doclens per shard, stats.json, lineage manifest.json

Scale notes (100 TB / 1000 executors):
  * doc shards bound every per-term posting list to shard_size docs, so a
    stop-word's postings can never exceed one shard's doc count — the
    structural skew cap. Salting *within* a shard then bounds the largest
    single sort-group; both knobs are explicit (AQE does not split a hot
    groupBy key for grouped-map UDFs, SURVEY.md §4.3).
  * the ONLY wide shuffles are: one range-sort for dense ids, one hash
    repartition of (term,tf) pairs (map-side pre-aggregated: tf computed
    per doc inside the tokenizer, so the shuffle carries one row per
    (doc,term), not per token), and a term-dictionary-sized merge of hot
    segments. Filters/projections stay in whole-stage codegen.
  * per-shard outputs are written with dynamic partition overwrite, which
    is what makes checkpoint-resume (M5) and incremental upsert (M7)
    partition-local instead of full rebuilds.

Maestro parity anchors: bulk partitioning 5000 docs/request
(CollectionsUtil.java:30-35, application.yml:74) → shard/partition sizing;
scatter-gather Parallel.java:53-77 → executor parallelism; per-part retry
+ failure bookkeeping (SearchAdapterHelper.java:127-142) → lineage manifest
with per-shard status; 3-shard index (file_centric.json:6) → doc shards.
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maestro_spark.functions.codec import encode_postings_batch, merge_segments
from maestro_spark.functions.tokenize import token_record_batches
from maestro_spark.operators.docids import (assign_doc_ids,
                                            assign_doc_ids_routed)
from maestro_spark.sources.tableio import (
    drop_partition_dir,
    read_manifest,
    write_manifest,
    write_partitioned,
)

TOKEN_SCHEMA = (
    "doc_id long, shard int, term string, tf long, dl long, field string"
)
TOKEN_SCHEMA_POS = TOKEN_SCHEMA + ", positions array<long>"
POSTING_SCHEMA = (
    "shard int, term_bucket int, term string, salt int, df long, "
    "doc_bytes binary, tf_bytes binary, block_last_doc array<long>, "
    "block_max_tf array<long>, block_min_dl array<long>, "
    "block_doc_off array<long>, block_tf_off array<long>, "
    "pos_bytes binary, block_pos_off array<long>"
)
# codec v2 ("for"): per-block frame-of-reference metadata — counts,
# absolute first doc, pack width and base per stream (codec.py's FOR
# section). Streams hold only packed bits; a reader detects the codec
# per row by the presence of block_n.
FOR_COLUMNS = (
    "block_n array<long>, block_doc_first array<long>, "
    "block_doc_width array<long>, block_doc_base array<long>, "
    "block_tf_width array<long>, block_tf_base array<long>, "
    "block_posf_width array<long>, block_posf_base array<long>, "
    "block_posg_width array<long>, block_posg_base array<long>"
)
POSTING_SCHEMA_FOR = POSTING_SCHEMA + ", " + FOR_COLUMNS
MERGED_SCHEMA = POSTING_SCHEMA.replace(", salt int", "") + ", merge_fanin int"
MERGED_SCHEMA_FOR = (POSTING_SCHEMA_FOR.replace(", salt int", "")
                     + ", merge_fanin int")
_FOR_KEYS = ("block_n", "block_doc_first", "block_doc_width",
             "block_doc_base", "block_tf_width", "block_tf_base",
             "block_posf_width", "block_posf_base",
             "block_posg_width", "block_posg_base")

# On-disk manifest format. POSITIONS_SEMANTICS tracks the prox-stream
# contract independently of layout: v1 placed whole-identifier tokens
# after all subtokens (consuming a slot); v2 places the whole form at the
# first subtoken's position without consuming one. A v1 positional index
# read under v2 rules would phrase-match at stale tail positions, so the
# reader refuses (ADVICE r2 #4) and resume/incremental rebuild instead of
# trusting old shards.
INDEX_FORMAT_VERSION = 2
POSITIONS_SEMANTICS = 2
# Physical posting layout per codec: 1 = varint streams, 3 = FOR packed
# doc/tf/pos streams (2 was FOR with varint positions, never released).
# Resume refuses to mix layouts in one postings dir (parquet schema
# unification would be fragment-order-dependent), so a stamp mismatch
# rebuilds every shard; incremental raises with migration guidance.
POSTING_FORMAT = {"varint": 1, "for": 3}

# Sentinel for IndexConfig.shard_size: "derive docs-per-shard from the
# corpus" (see derive_shard_size / build_index).
AUTO_SHARD = 0


def derive_shard_size(n_docs: int, avg_doc_bytes: float | None = None,
                      target_docs: int = 65_536,
                      shard_byte_budget: int = 1 << 30) -> int:
    """Default docs-per-shard from corpus stats — the ES shard-sizing
    practice (10–50 GB / shard, docs.usage guidance) re-expressed for
    this engine's doc-range sharding. Two forces, take the tighter:

      * target_docs per shard — shard COUNT then grows linearly with
        the corpus (the 10×-run config rule: 245 fixed-size shards at
        2 M docs taxed the serving floor; ~n/65k shards puts 2 M docs
        at ~31 shards and 10^9 docs at ~15k — each shard a few serving
        milliseconds, fan-out-parallel via ServingPool);
      * shard_byte_budget of stored content — production code files are
        KBs-to-MBs, so a byte cap keeps one shard's docstore + posting
        working set inside a worker's memory regardless of doc size.

    Tiny corpora need no floor: shard count = ceil(n/size) is already 1
    once n_docs < the derived size. Returns at least 1."""
    per = int(target_docs)
    if avg_doc_bytes and avg_doc_bytes > 0:
        per = min(per, max(1, int(shard_byte_budget // avg_doc_bytes)))
    return max(1, per)


def _resolve_auto_shard(docs: DataFrame, cfg: IndexConfig) -> IndexConfig:
    """Replace AUTO_SHARD with a derived concrete value: one metadata
    count + a ≤50k-row content-length sample (column-pruned; never a
    full content scan). The concrete value is what lands in the
    manifest, so readers and incremental updates see a fixed size."""
    from dataclasses import replace as _dc_replace

    n = docs.count()
    avg_bytes = None
    if n > 0:
        frac = min(1.0, 50_000 / n)
        row = (docs.sample(fraction=frac, seed=7)
               .agg(F.avg(F.length("content")).alias("b")).first())
        avg_bytes = float(row["b"]) if row and row["b"] is not None else None
    return _dc_replace(cfg, shard_size=derive_shard_size(n, avg_bytes))


def positions_compatible(manifest: dict | None, cfg: IndexConfig) -> bool:
    """True when `manifest`'s prox stream (if any) was written under the
    CURRENT positions semantics, or positions aren't stored at all."""
    if manifest is None or not cfg.store_positions:
        return True
    if not manifest.get("config", {}).get("store_positions"):
        return True  # old index had no prox stream: nothing to misread
    return manifest.get("positions_semantics") == POSITIONS_SEMANTICS


@dataclass
class IndexConfig:
    shard_size: int = 1_000_000        # docs per shard (doc-range
                                       # sharding); AUTO_SHARD (0) lets
                                       # build_index derive it from
                                       # corpus stats (derive_shard_size)
                                       # and stamp the concrete value
                                       # into the manifest
    n_buckets: int = 16                # term_bucket partitions per shard
    n_salts: int = 8                   # sub-segments for hot terms
    hot_df_fraction: float = 0.05      # term hot if df > fraction * shard N
    sample_fraction: float = 0.02      # hot-term detection sample
    tokenizer: str = "code"            # "code" | "simple"
    index_fields: tuple = ("content", "path", "lang", "repo")
    encode_partitions: int | None = None
    store_positions: bool = False      # prox stream for phrase queries
                                       # (≈ +token-stream shuffle volume)
    stored_columns: tuple = ()         # extra docstore columns, stored but
                                       # NOT indexed — the ES dynamic:false
                                       # semantics (file_centric.json:42);
                                       # may be nested array<struct> and
                                       # queried via search(doc_filter=...)
    codec: str = "for"                 # posting codec: "for" (v2 bit-
                                       # packed FOR blocks, ~3x faster
                                       # decode, 2-4x smaller, tf=1/gap-1
                                       # blocks cost ZERO stream bytes)
                                       # or "varint" (v1). One codec per
                                       # index; incremental updates adopt
                                       # the index's existing codec.
    routing_col: str | None = None     # ES custom `_routing`: shard =
                                       # md5-hash of this column instead
                                       # of an id range; a routed query
                                       # touches ONE shard. Incompatible
                                       # with id_col (ids are reassigned
                                       # per shard).
    n_routing_shards: int = 8          # shard count under routing (the
                                       # ES number_of_shards analogue);
                                       # shard_size must absorb the
                                       # hottest routing key's doc count
    index_sort: tuple | None = None    # ES index.sort.field analogue:
                                       # (col, True) records that doc ids
                                       # were assigned in (col asc, key)
                                       # order, so doc_id order ≡
                                       # (col, doc_id) order and sorted
                                       # queries early-terminate. Set by
                                       # build_index_sorted — never set
                                       # it by hand on unsorted input.

    def to_dict(self) -> dict:
        d = asdict(self)
        d["index_fields"] = list(self.index_fields)
        d["stored_columns"] = list(self.stored_columns)
        if self.index_sort is not None:
            d["index_sort"] = list(self.index_sort)
        return d


def tokenize_docs(docs: DataFrame, cfg: IndexConfig) -> DataFrame:
    """docs(doc_id, shard, repo, path, lang, content) → token tf rows.
    tf is pre-aggregated per (doc, term) INSIDE the UDF (map-side combine:
    the shuffle carries ~unique-terms-per-doc rows, not every token).
    With cfg.store_positions each row also carries the ascending position
    list of that term's occurrences (tf ints per row).

    Runs as mapInArrow over token_record_batches — terms stay
    dictionary-coded through aggregation and never touch pandas block
    consolidation (the pandas path's dominant cost); the token multiset is
    identical to functions.tokenize.doc_terms (parity-tested)."""
    use = cfg.index_fields
    tokenizer = cfg.tokenizer
    with_pos = cfg.store_positions

    def tok(batches):
        # bounded_batches: output token rows scale with content BYTES,
        # not input rows — without the slice a long-doc partition OOMs
        # executor direct memory at high parallelism (see tokenize.py)
        from maestro_spark.functions.tokenize import bounded_batches
        for b in batches:
            if b.num_rows == 0:
                continue
            for sub in bounded_batches(b):
                yield from token_record_batches(sub, use, tokenizer,
                                                with_pos)

    return docs.select("doc_id", "shard", "repo", "path", "lang", "content") \
        .mapInArrow(tok, schema=TOKEN_SCHEMA_POS if with_pos else TOKEN_SCHEMA)


def detect_hot_terms(tokens: DataFrame, n_docs: int, cfg: IndexConfig,
                     seed: int = 42) -> list[str]:
    """Estimate per-term df from a deterministic sample; a term is hot if
    its estimated df within one shard exceeds hot_df_fraction*shard docs.
    Hot terms get salted sub-segments (north rule: salted repartition-by-
    term; SURVEY.md §7.1 M4)."""
    frac = cfg.sample_fraction if n_docs * cfg.sample_fraction >= 2000 else 1.0
    sample = tokens if frac >= 1.0 else tokens.sample(fraction=frac, seed=seed)
    shard_docs = min(n_docs, cfg.shard_size)
    threshold = max(cfg.hot_df_fraction * shard_docs * frac, 1.0)
    rows = (
        sample.groupBy("term").agg(F.count("*").alias("n"))
        .where(F.col("n") > threshold)
        .select("term")
        .collect()
    )
    return sorted(r["term"] for r in rows)


def encode_tokens(tokens: DataFrame, hot_terms: list[str], cfg: IndexConfig) -> DataFrame:
    """Salted repartition → partition-local sort → streaming group encode.

    The encoder is a mapInPandas that walks (shard, term, salt, doc_id)-
    sorted batches and emits one encoded segment per (shard, term, salt)
    run — no per-group materialization beyond the current run, so a
    partition with millions of rows streams through in Arrow batches.
    """
    spark = tokens.sparkSession
    nparts = cfg.encode_partitions or spark.sparkContext.defaultParallelism
    n_salts, shard_size, n_buckets = cfg.n_salts, cfg.shard_size, cfg.n_buckets
    codec = cfg.codec

    hot_col = (
        F.col("term").isin(hot_terms) if hot_terms else F.lit(False)
    )
    # contiguous doc-range salts -> segments merge by concatenation
    salt = (
        ((F.col("doc_id") % shard_size) * n_salts / shard_size).cast("int")
    )
    t = tokens.withColumn("salt", F.when(hot_col, salt).otherwise(F.lit(0)))
    t = (
        t.repartition(nparts, "shard", "term", "salt")
        .sortWithinPartitions("shard", "term", "salt", "doc_id")
    )

    def encoder(batches):
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
            keys = pdf[["shard", "term", "salt"]]
            boundary = (keys != keys.shift()).any(axis=1).to_numpy()
            starts = np.flatnonzero(boundary)
            if len(starts) > 1:
                complete, pending = pdf.iloc[: starts[-1]], pdf.iloc[starts[-1]:]
                out = _encode_runs(complete, starts[:-1], n_buckets,
                                   codec)
                if out is not None:
                    yield out
            else:
                pending = pdf
        if pending is not None and len(pending):
            keys = pending[["shard", "term", "salt"]]
            boundary = (keys != keys.shift()).any(axis=1).to_numpy()
            out = _encode_runs(pending, np.flatnonzero(boundary),
                               n_buckets, codec)
            if out is not None:
                yield out

    return t.mapInPandas(
        encoder,
        schema=POSTING_SCHEMA_FOR if codec == "for" else POSTING_SCHEMA)


def _encode_runs(pdf: pd.DataFrame, starts: np.ndarray, n_buckets: int,
                 codec: str = "for") -> pd.DataFrame | None:
    """Encode each (shard, term, salt) run in pdf with ONE vectorized pass
    over the whole batch (codec.encode_postings_batch): per-run Python work
    is just byte slicing, so throughput depends on posting count, not on
    how many distinct terms the partition holds. starts = run start offsets
    (ascending, first is 0)."""
    if not len(pdf):
        return None
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    doc = pdf["doc_id"].to_numpy(np.int64)
    tf = pdf["tf"].to_numpy(np.int64)
    dl = pdf["dl"].to_numpy(np.int64)
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy()
    salts = pdf["salt"].to_numpy()
    if "positions" in pdf.columns:
        flat_pos = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in pdf["positions"].to_numpy()]
        ) if len(pdf) else np.empty(0, np.int64)
    else:
        flat_pos = None
    enc = encode_postings_batch(doc, tf, dl, starts, positions=flat_pos,
                                codec=codec)
    run_terms = terms[starts]
    cols = {
        "shard": shards[starts].astype(np.int64),
        "term_bucket": np.fromiter(
            (_term_bucket(t, n_buckets) for t in run_terms),
            dtype=np.int64, count=starts.size),
        "term": run_terms,
        "salt": salts[starts].astype(np.int64),
        "df": enc["df"],
        "doc_bytes": enc["doc_bytes"],
        "tf_bytes": enc["tf_bytes"],
        "block_last_doc": enc["block_last_doc"],
        "block_max_tf": enc["block_max_tf"],
        "block_min_dl": enc["block_min_dl"],
        "block_doc_off": enc["block_doc_off"],
        "block_tf_off": enc["block_tf_off"],
        "pos_bytes": enc["pos_bytes"],
        "block_pos_off": enc["block_pos_off"],
    }
    if codec == "for":
        for k in _FOR_KEYS:
            cols[k] = enc[k]
    return pd.DataFrame(cols)


def _term_bucket(term: str, n_buckets: int) -> int:
    """Stable term → bucket hash (must match query-side pruning). Python
    and Spark side both use this (not F.hash, whose seed could differ)."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def merge_hot_segments(segments: DataFrame, hot_terms: list[str],
                       codec: str = "for") -> DataFrame:
    """Distributed segment merge (M4): only salted (hot) terms have >1
    segment, so the merge shuffle moves just their compressed segments —
    everything else passes through map-side with fan-in 1. Codec-v2
    segments merge identically (widths/bases/counts are absolute per
    block; byte offsets shift like v1's)."""
    if not hot_terms:
        return segments.drop("salt").withColumn("merge_fanin", F.lit(1))
    is_hot = F.col("term").isin(hot_terms)
    singles = (
        segments.where(~is_hot).drop("salt").withColumn("merge_fanin", F.lit(1))
    )

    def merge(key, pdf):
        pdf = pdf.sort_values("salt")
        segs = pdf.to_dict("records")
        m = merge_segments(segs)
        row = {
            "shard": key[0], "term_bucket": int(pdf["term_bucket"].iloc[0]),
            "term": key[1], "df": m["df"], "doc_bytes": m["doc_bytes"],
            "tf_bytes": m["tf_bytes"], "block_last_doc": m["block_last_doc"],
            "block_max_tf": m["block_max_tf"], "block_min_dl": m["block_min_dl"],
            "block_doc_off": m["block_doc_off"], "block_tf_off": m["block_tf_off"],
            "pos_bytes": m["pos_bytes"], "block_pos_off": m["block_pos_off"],
            "merge_fanin": m["merge_fanin"],
        }
        if codec == "for":
            for k in _FOR_KEYS:
                row[k] = m[k]
        return pd.DataFrame([row])

    merged = (
        segments.where(is_hot)
        .groupBy("shard", "term")
        .applyInPandas(
            merge,
            schema=MERGED_SCHEMA_FOR if codec == "for" else MERGED_SCHEMA)
    )
    return singles.unionByName(merged)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = False,
    id_col: str | None = None,
) -> dict:
    """Full index build. Returns the lineage manifest (also written to
    {out_dir}/manifest.json). With resume=True, shards whose input
    fingerprint matches the previous manifest are SKIPPED — the rerun
    rebuilds only missing/changed shards and reproduces an identical
    manifest (SURVEY.md §5 resume test).

    id_col: column of pre-assigned non-negative doc ids to use verbatim
    (skips the global id sort — the path for sources that already carry a
    stable dense id, e.g. the driver's `documents` table)."""
    cfg = cfg or IndexConfig()
    if cfg.shard_size == AUTO_SHARD:
        cfg = _resolve_auto_shard(docs, cfg)
    t0 = time.time()

    if cfg.routing_col is not None:
        if id_col is not None:
            raise ValueError(
                "routing_col reassigns doc ids per shard; it cannot be "
                "combined with id_col (verbatim ids imply range sharding)")
        with_ids = assign_doc_ids_routed(
            docs, cfg.routing_col, cfg.n_routing_shards, cfg.shard_size)
        base = getattr(with_ids, "_maestro_persisted_base", None)
    elif id_col is not None:
        with_ids = docs if id_col == "doc_id" else docs.withColumnRenamed(id_col, "doc_id")
        base = None
    else:
        with_ids = assign_doc_ids(docs)
        base = getattr(with_ids, "_maestro_persisted_base", None)
    d = (
        with_ids
        .withColumn("shard", (F.col("doc_id") / cfg.shard_size).cast("int"))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # per-shard lineage fingerprint: order-independent sum of row hashes,
    # reduced mod 2^40 so the long sum cannot overflow (ANSI mode throws
    # on long overflow in Spark 4) even at 2^24 docs/shard.
    # This aggregation is also the MATERIALIZATION BARRIER: it computes
    # (and caches) every partition of `d` before any write below can
    # overwrite a directory `docs` might lazily read from — required on
    # the id_col path where the input may derive from {out_dir}/docs.
    shard_rows = (
        d.groupBy("shard").agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.pmod(F.xxhash64("repo", "path", "commit", "content_sha256"),
                       F.lit(1 << 40))
            ).alias("fp"),
            F.max("doc_id").alias("max_id"),
        ).collect()
    )
    fingerprints = {int(r["shard"]): (int(r["n_docs"]), int(r["fp"])) for r in shard_rows}
    max_doc_id = max((int(r["max_id"]) for r in shard_rows), default=-1)

    prev = read_manifest(os.path.join(out_dir, "manifest.json")) if resume else None
    if not positions_compatible(prev, cfg):
        prev = None  # old prox semantics: no shard is resumable, rebuild all
    if prev is not None and (
            prev.get("config", {}).get("codec", "varint") != cfg.codec
            or prev.get("posting_format") != POSTING_FORMAT[cfg.codec]):
        prev = None  # codec/layout change: resumed shards would mix
        #              posting formats in one store — rebuild every shard
    try:
        return _build_shards(spark, d, out_dir, cfg, fingerprints, prev=prev,
                             keep={}, max_doc_id=max_doc_id, t0=t0)
    finally:
        d.unpersist()
        if base is not None:
            base.unpersist()


def build_index_sorted(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    sort_col: str,
    cfg: IndexConfig | None = None,
    resume: bool = False,
) -> dict:
    """Index sorting — the ES `index.sort.field` analogue (public docs:
    index-modules-index-sorting; Lucene stores segment docs in sort
    order so a query sorted the same way early-terminates after k
    competitive hits). Here the storage order IS the doc_id order, so
    sorting the index means assigning ids in (sort_col asc, stable doc
    key) order; the one global sort this build already pays (the id
    assignment's range partition) simply changes key. The manifest
    records cfg.index_sort, and IndexReader.search_sorted serves a
    matching sort from id order alone: per-shard first-k matching ids
    (k longs per shard cross the wire), then a k-bounded broadcast
    fetch of the sort values — the docstore is never scanned for the
    match set, which is the whole point at 100 TB. Ties and
    search_after cursors keep the (sort_value, doc_id) total order
    because doc_id order ≡ that order by construction."""
    from dataclasses import replace

    from maestro_spark.operators.docids import DOC_KEY, assign_doc_ids

    cfg = cfg or IndexConfig()
    if cfg.routing_col is not None:
        raise ValueError("index_sort and routing_col are exclusive "
                         "(routing reassigns ids per shard)")
    cfg = replace(cfg, index_sort=(sort_col, True))
    with_ids = assign_doc_ids(docs, key_cols=[sort_col, *DOC_KEY])
    base = getattr(with_ids, "_maestro_persisted_base", None)
    try:
        return build_index(spark, with_ids, out_dir, cfg, resume=resume,
                           id_col="doc_id")
    finally:
        if base is not None:
            base.unpersist()


def build_index_versioned(
    spark: SparkSession,
    docs: DataFrame,
    base_dir: str,
    cfg: IndexConfig | None = None,
    keep_versions: int = 2,
    id_col: str | None = None,
) -> dict:
    """K4 alias-versioned build (blue/green): build into {base}/v{N+1},
    then atomically flip {base}/alias.json — the ES index-per-version +
    alias-swap migration contract (application.yml:59-67,
    FileCentricElasticSearchAdapter.java:232-244). Readers that opened
    the BASE dir keep serving the old version until the flip and pick up
    the new one on their next query (IndexReader re-resolves the alias);
    a reader can never observe a half-built index. Old versions beyond
    `keep_versions` are pruned (never the current one)."""
    import shutil

    from maestro_spark.sources.tableio import (
        list_versions,
        next_version,
        update_alias,
    )

    version = next_version(base_dir)
    manifest = build_index(spark, docs, os.path.join(base_dir, version),
                           cfg, resume=False, id_col=id_col)
    update_alias(base_dir, version)
    if keep_versions > 0:
        from maestro_spark.sources.tableio import pit_versions
        pinned = pit_versions(base_dir)  # live PITs retain their version
        for old in list_versions(base_dir)[:-keep_versions]:
            if old != version and old not in pinned:
                shutil.rmtree(os.path.join(base_dir, old), ignore_errors=True)
    manifest["version_dir"] = version
    return manifest


def reindex(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    cfg: IndexConfig | None = None,
    keep_ids: bool = True,
    versioned: bool = True,
) -> dict:
    """ES `_reindex` analogue (the reference's full-repository reindex +
    index-migration path, DefaultIndexer.java indexRepository /
    FileCentricElasticSearchAdapter.java:232-244 alias migration):
    rebuild an index FROM another index's docstore — the stored fields
    are the source of truth, no original source table needed.

    Use cases: an IndexConfig change (shard size, tokenizer, positions,
    indexed fields), compaction after heavy incremental churn, or a
    topology re-shard. One column-pruned pass over the source docstore;
    derived columns (shard, content_sha256) are dropped and recomputed
    by the build. cfg=None reuses the source's config (pure compaction).

    keep_ids=True preserves doc_ids, so BM25 results are IDENTICAL
    across the swap (scores use global stats; tie-breaks are id-based)
    even when shard membership changes. versioned=True builds blue/green
    under dst_dir with an atomic alias flip (build_index_versioned)."""
    from maestro_spark.sources.tableio import read_manifest, resolve_alias

    src = resolve_alias(src_dir)
    man = read_manifest(os.path.join(src, "manifest.json"))
    if man is None:
        raise FileNotFoundError(f"no manifest.json under {src}")
    if os.path.abspath(resolve_alias(dst_dir)) == os.path.abspath(src):
        raise ValueError("reindex target must differ from the source")
    if cfg is None:
        kw = dict(man["config"])
        kw["index_fields"] = tuple(kw.get("index_fields", ()))
        kw["stored_columns"] = tuple(kw.get("stored_columns", ()))
        cfg = IndexConfig(**kw)
    if not keep_ids and cfg.index_sort is not None:
        from dataclasses import replace
        # ids are reassigned in default DOC_KEY order, so the source's
        # doc_id ≡ (sort_col, doc_id) invariant does NOT carry over; a
        # manifest that kept the flag would send search_sorted's 'auto'
        # path down early-termination with wrong top-k. Rebuild through
        # build_index_sorted to re-establish the invariant instead.
        cfg = replace(cfg, index_sort=None)
    docs = spark.read.parquet(os.path.join(src, "docs")) \
        .drop("shard", "content_sha256")
    if not keep_ids:
        docs = docs.drop("doc_id")
    id_col = "doc_id" if keep_ids else None
    if versioned:
        return build_index_versioned(spark, docs, dst_dir, cfg,
                                     id_col=id_col)
    return build_index(spark, docs, dst_dir, cfg, id_col=id_col)


def _build_shards(
    spark: SparkSession,
    d: DataFrame,
    out_dir: str,
    cfg: IndexConfig,
    fingerprints: dict[int, tuple[int, int]],
    prev: dict | None,
    keep: dict[int, dict],
    max_doc_id: int,
    t0: float,
) -> dict:
    """Shard-build core shared by the batch path (build_index) and the
    incremental path (operators.incremental.incremental_update).

    d            docs(+shard,+content_sha256) for exactly the shards in
                 `fingerprints` — persisted/materialized by the caller.
    fingerprints current {shard: (n_docs, fp)} for d's shards.
    prev         previous manifest (skip-matching + hot-term carry).
    keep         {shard: manifest entry} carried verbatim for shards NOT
                 in d (incremental: the untouched rest — never scanned).

    Shards present in prev but in neither `fingerprints` nor `keep` no
    longer exist (corpus shrank / every doc of the shard deleted): their
    partition dirs are physically dropped so stale postings can never
    serve a query."""
    done_shards = set()
    if prev:
        for s, meta in prev.get("shards", {}).items():
            s = int(s)
            if (
                s in fingerprints
                and meta.get("status") == "ok"
                and meta.get("fingerprint") == fingerprints[s][1]
                and meta.get("n_docs") == fingerprints[s][0]
            ):
                done_shards.add(s)
    pending = sorted(set(fingerprints) - done_shards)

    gone: set[int] = set()
    if prev:
        gone = ({int(s) for s in prev.get("shards", {})}
                - set(fingerprints) - set(keep))
        for s in sorted(gone):
            for sub in ("docs", "doclens", "postings", "keyblooms"):
                drop_partition_dir(os.path.join(out_dir, sub), f"shard={s}")

    n_docs = (sum(n for n, _ in fingerprints.values())
              + sum(int(e.get("n_docs", 0)) for e in keep.values()))

    manifest: dict = {
        "version": INDEX_FORMAT_VERSION,
        "config": cfg.to_dict(),
        "posting_format": POSTING_FORMAT[cfg.codec],
        "n_docs": n_docs,
        "shards": {},
    }
    if cfg.store_positions:
        manifest["positions_semantics"] = POSITIONS_SEMANTICS
    if prev:
        manifest["shards"].update(
            {str(s): prev["shards"][str(s)] for s in done_shards})
    manifest["shards"].update({str(s): e for s, e in keep.items()})

    phase_ms: dict[str, int] = {}

    def _phase(name: str, t_start: float) -> None:
        phase_ms[name] = int((time.time() - t_start) * 1000)

    dynamic = bool(done_shards or keep)
    if pending:
        subset = d if not (done_shards) else d.where(F.col("shard").isin(pending))

        # A rebuilt shard may produce FEWER distinct (term_bucket) /
        # doclens partitions than before (e.g. after deletes); dynamic
        # overwrite only replaces partitions that receive rows, so stale
        # sub-partitions must be dropped up front. The write-intent
        # manifest (status=rebuilding) written first makes the drop crash-
        # safe: a resume after a mid-build crash sees a non-ok status and
        # rebuilds the shard instead of trusting dropped/partial files.
        # (Iceberg's snapshot commit subsumes both steps behind the
        # TableIO seam.)
        intent = {**manifest, "shards": dict(manifest["shards"])}
        if prev:
            for carry_key in ("stats", "hot_terms", "max_doc_id"):
                if carry_key in prev:
                    intent.setdefault(carry_key, prev[carry_key])
        for s in pending:
            intent["shards"][str(s)] = {
                "status": "rebuilding", "fingerprint": None,
                "n_docs": fingerprints[s][0],
            }
        if prev or keep:
            write_manifest(os.path.join(out_dir, "manifest.json"), intent)
        for s in pending:
            drop_partition_dir(os.path.join(out_dir, "doclens"), f"shard={s}")
            drop_partition_dir(os.path.join(out_dir, "postings"), f"shard={s}")

        t = time.time()
        write_partitioned(
            subset.select("doc_id", "shard", "repo", "path", "commit", "lang",
                          "content", "content_sha256",
                          *cfg.stored_columns),
            os.path.join(out_dir, "docs"), ["shard"], dynamic=dynamic,
        )
        _phase("write_docs", t)

        # per-shard key bloom sidecar: the incremental key probe opens
        # only shards whose bloom admits a batch key (keybloom.py — the
        # native analogue of Iceberg bloom file skipping). One tiny row
        # per rebuilt shard; untouched shards keep theirs.
        t = time.time()
        from maestro_spark.operators.keybloom import write_key_blooms
        write_key_blooms(subset, os.path.join(out_dir, "keyblooms"),
                         ["repo", "path", "commit"],
                         n_parts=len(pending), dynamic=dynamic)
        _phase("keyblooms", t)

        t = time.time()
        tokens = tokenize_docs(subset, cfg).persist(StorageLevel.MEMORY_AND_DISK)
        # repartition-by-shard before write → one file per shard dir (a
        # shard's doclens sidecar is read whole at query time; thousands of
        # small files would dominate both write and read at any scale)
        doclens = (
            tokens.groupBy("shard", "doc_id", "field").agg(F.first("dl").alias("dl"))
            .repartition(max(len(pending), 1), "shard")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        write_partitioned(doclens, os.path.join(out_dir, "doclens"), ["shard"],
                          dynamic=dynamic)
        # per-shard per-field (n_docs, Σdl) — stored in the manifest so
        # global BM25 stats fold driver-side from shard entries instead of
        # re-scanning the corpus-sized doclens table on every (incremental)
        # build; the agg reads the frame just written, still cached
        field_sums: dict[int, dict[str, list[int]]] = {}
        for r in doclens.groupBy("shard", "field").agg(
                F.count("*").alias("n"), F.sum("dl").alias("dl")).collect():
            field_sums.setdefault(int(r["shard"]), {})[r["field"]] = [
                int(r["n"]), int(r["dl"])]
        doclens.unpersist()
        _phase("tokenize_doclens", t)

        t = time.time()
        hot_terms = detect_hot_terms(tokens, n_docs, cfg)
        _phase("detect_hot", t)

        t = time.time()
        # persist segments: the hot/cold branches of the merge and the final
        # write must NOT each recompute the repartition+sort+encode pipeline
        segments = encode_tokens(tokens, hot_terms, cfg).persist(
            StorageLevel.MEMORY_AND_DISK)
        postings = merge_hot_segments(segments, hot_terms, cfg.codec)
        # final layout shuffle: one task (→ one file) per (shard, bucket)
        # partition dir. Without this, every encoder partition spills a
        # sliver into every bucket dir — O(parts × buckets) small files.
        # The shuffle moves only compressed segments, and at target sizing
        # (1M-doc shards, 16 buckets) a partition file is ~50-100 MB.
        postings = postings.repartition(
            max(len(pending), 1) * cfg.n_buckets, "shard", "term_bucket"
        # term-sorted within each (shard, bucket) file: parquet row-group
        # min/max term stats then let the query-side term predicate skip
        # whole row groups (matters once a bucket file spans many row
        # groups at production shard sizes; free here — the rows are
        # already shuffled, the sort is partition-local)
        ).sortWithinPartitions("term")
        # 8 MB row groups (not the 128 MB default): the file is term-
        # sorted, so row-group min/max term stats are the intra-file
        # index — smaller groups bound how many posting bytes one term's
        # lookup must decompress once bucket files reach production size
        write_partitioned(postings, os.path.join(out_dir, "postings"),
                          ["shard", "term_bucket"], dynamic=dynamic,
                          row_group_bytes=8 << 20)
        _phase("encode_merge_write", t)
        segments.unpersist()
        tokens.unpersist()

        # per-shard metrics from the written postings (lineage/audit rows:
        # postings count, compressed bytes, merge fan-in — north star)
        t = time.time()
        pmetrics = {
            int(r["shard"]): r
            for r in spark.read.parquet(os.path.join(out_dir, "postings"))
            .where(F.col("shard").isin(pending))
            .groupBy("shard")
            .agg(
                F.count("*").alias("n_terms"),
                F.sum("df").alias("n_postings"),
                F.sum(F.length("doc_bytes") + F.length("tf_bytes")).alias("bytes"),
                F.max("merge_fanin").alias("max_merge_fanin"),
                F.sum(F.when(F.col("merge_fanin") > 1, 1).otherwise(0)).alias("n_merged_terms"),
            )
            .collect()
        }
        for s in pending:
            m = pmetrics.get(s)
            manifest["shards"][str(s)] = {
                "fingerprint": fingerprints[s][1],
                "n_docs": fingerprints[s][0],
                "status": "ok",
                "n_terms": int(m["n_terms"]) if m else 0,
                "n_postings": int(m["n_postings"]) if m else 0,
                "bytes": int(m["bytes"]) if m else 0,
                "max_merge_fanin": int(m["max_merge_fanin"]) if m else 0,
                "n_merged_terms": int(m["n_merged_terms"]) if m else 0,
                "fields": field_sums.get(s, {}),
            }
        _phase("metrics", t)
        # hot-term bookkeeping: an incremental build detects hotness only
        # within the touched shards, so union with the carried list
        prev_hot = prev.get("hot_terms", []) if prev else []
        manifest["hot_terms"] = (sorted(set(hot_terms) | set(prev_hot))
                                 if keep else hot_terms)
    else:
        manifest["hot_terms"] = prev.get("hot_terms", []) if prev else []

    if pending or gone:
        # term dictionary sidecar: global (term → df) aggregated across
        # shards, hive-partitioned by term_bucket with one file per bucket.
        # Query planning reads it DRIVER-SIDE via pyarrow (bucket-pruned,
        # no Spark job) — the ES term-dictionary analogue. Rebuilt whole
        # on any change (it aggregates across all shards); reads only the
        # three metadata columns of the posting store — a term-dictionary-
        # sized job, not a corpus-sized one, on the incremental path too.
        t = time.time()
        termdict = (
            spark.read.parquet(os.path.join(out_dir, "postings"))
            .groupBy("term_bucket", "term")
            .agg(F.sum("df").alias("df"))
            .repartition(cfg.n_buckets, "term_bucket")
            # term-sorted files → parquet row-group min/max stats make
            # prefix lookups a RANGE scan (IndexReader.prefix_terms reads
            # [prefix, prefix+U+FFFF) driver-side with no posting bytes)
            .sortWithinPartitions("term")
        )
        write_partitioned(termdict, os.path.join(out_dir, "termdict"),
                          ["term_bucket"], row_group_bytes=4 << 20)
        _phase("termdict", t)

    # global BM25 stats: fold the per-shard (n, Σdl) field sums carried in
    # the manifest entries — pure driver arithmetic, NO corpus scan. Only
    # indexes written before these sums existed fall back to the doclens
    # aggregation (one column-pruned scan, then the next build records
    # the sums and the fallback never runs again).
    entries = manifest["shards"].values()
    if entries and all("fields" in e for e in entries):
        acc: dict[str, list[int]] = {}
        for e in entries:
            for fname, (n, dl) in e["fields"].items():
                a = acc.setdefault(fname, [0, 0])
                a[0] += int(n)
                a[1] += int(dl)
        manifest["stats"] = {
            "n_docs": n_docs,
            "fields": {
                fname: {"n_docs": n, "avgdl": float(dl) / max(n, 1)}
                for fname, (n, dl) in acc.items()
            },
        }
    else:
        stats_rows = (
            spark.read.parquet(os.path.join(out_dir, "doclens"))
            .groupBy("field")
            .agg(F.count("*").alias("n"), F.sum("dl").alias("total_dl"))
            .collect()
        )
        manifest["stats"] = {
            "n_docs": n_docs,
            "fields": {
                r["field"]: {"n_docs": int(r["n"]),
                             "avgdl": float(r["total_dl"]) / max(int(r["n"]), 1)}
                for r in stats_rows
            },
        }
    manifest["skipped_shards"] = sorted(done_shards | set(keep))
    manifest["max_doc_id"] = max_doc_id
    manifest["phase_ms"] = phase_ms
    manifest["wall_ms"] = int((time.time() - t0) * 1000)
    write_manifest(os.path.join(out_dir, "manifest.json"), manifest)
    return manifest
