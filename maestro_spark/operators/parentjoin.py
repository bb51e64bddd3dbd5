"""ES parent-join (`join` field) re-expressed Spark-first.

The reference models the analysis→files relation as NESTED documents
inside one file-centric doc (file_centric.json:224-243 via
`nested.py`); Elasticsearch's alternative modeling for independently
updatable children is the parent-join field with the `has_child` /
`has_parent` / `parent_id` queries and the `children` aggregation,
under the constraint that a parent and its children share a shard
(parent routing). Here the child corpus is its own index whose
docstore carries a `parent` doc value; when child ids derive from
parent ids (parent * stride + child_idx, the entry convention) range
sharding CO-LOCATES a parent's children exactly as ES routing does, so
every parent-key groupBy below combines map-side to one row per parent
per task before a final shuffle whose volume is |parents|, never
|children|. (An index built with IndexConfig.routing_col="parent"
gives the same co-location for ids that don't encode the parent.)

Scale shape at 100 TB: the child match set is posting-bounded (it
comes from scored_matches' pruned posting scan, never a corpus scan);
parent aggregation is one partial-agg shuffle of one row per matched
parent; has_parent's join is keyed on the parent doc value and
broadcast-eligible whenever the parent match set is small (AQE decides
from the runtime size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCORE_AGGS = {"max": F.max, "min": F.min, "sum": F.sum, "avg": F.avg}


def has_child(child_reader, query: str, k: int = 10,
              score_mode: str = "max", min_children: int = 1,
              max_children: int | None = None, mode: str = "or",
              parent_col: str = "parent") -> DataFrame:
    """ES has_child query: rank PARENTS by an aggregate of their
    matching children's BM25 scores (score_mode max|sum|avg|min|none),
    keeping only parents whose MATCHING-child count lies within
    [min_children, max_children] — the ES parameter semantics (the
    bounds count children matched by the inner query, not all
    children). Exact over the FULL scored child match set
    (scored_matches), one parent-key partial agg; ranking on
    round(score, 6) with parent-id tie-break (the cross-engine
    determinism convention used by every scoring operator here).

    Returns DataFrame(parent long, score double, n_children long)."""
    if score_mode not in ("none", *_SCORE_AGGS):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    sm = child_reader.scored_matches(query, mode=mode)
    docs = child_reader._docs().select(
        "shard", "doc_id", F.col(parent_col).alias("_parent"))
    j = sm.join(docs, ["shard", "doc_id"], "inner")
    aggs = [F.count("*").alias("n_children")]
    if score_mode != "none":
        aggs.insert(0, F.round(_SCORE_AGGS[score_mode]("score"), 6)
                    .alias("score"))
    g = j.groupBy("_parent").agg(*aggs)
    if score_mode == "none":
        # ES score_mode=none: pure existence filter, constant score
        g = g.withColumn("score", F.lit(0.0))
    g = g.where(F.col("n_children") >= int(min_children))
    if max_children is not None:
        g = g.where(F.col("n_children") <= int(max_children))
    return (g.select(F.col("_parent").alias("parent"), "score",
                     "n_children")
            .orderBy(F.desc("score"), F.asc("parent")).limit(k))


def has_child_inner_hits(child_reader, query: str, k: int = 10,
                         inner_size: int = 3, score_mode: str = "max",
                         min_children: int = 1,
                         max_children: int | None = None,
                         mode: str = "or",
                         parent_col: str = "parent") -> DataFrame:
    """ES has_child with `inner_hits`: the has_child parent ranking,
    plus — for each RETURNED parent only, the ES contract (inner hits
    are resolved in the fetch phase for the final hit page, never for
    the whole match set) — its top `inner_size` matching children
    ranked (child_score desc, child_id asc).

    Two passes over the scored child match set, exactly ES's
    query-then-fetch shape: pass 1 is has_child (parent-key partial
    agg → top-k), pass 2 re-joins the match set against the k returned
    parents (broadcast — k-bounded) and ranks children inside each
    parent's slice. The window partitions by parent over only the k
    parents' children, so its sort is per-parent-children-bounded; the
    hot-parent ceiling is one parent's matching children, the same
    bound ES's per-hit inner-hits heap has.

    Returns DataFrame(parent, score, n_children, child_id,
    child_score, child_rank), child scores rounded to 6 (the
    cross-engine determinism convention)."""
    from pyspark.sql.window import Window
    parents = has_child(child_reader, query, k, score_mode,
                        min_children, max_children, mode, parent_col)
    sm = child_reader.scored_matches(query, mode=mode)
    docs = child_reader._docs().select(
        "shard", "doc_id", F.col(parent_col).alias("_parent"))
    keep = parents.select(F.col("parent").alias("_parent"),
                          F.col("score").alias("_pscore"),
                          "n_children")
    ch = (sm.join(docs, ["shard", "doc_id"], "inner")
          .join(F.broadcast(keep), "_parent")
          .select(F.col("_parent").alias("parent"), "_pscore",
                  "n_children", F.col("doc_id").alias("child_id"),
                  F.round("score", 6).alias("child_score")))
    w = Window.partitionBy("parent").orderBy(
        F.desc("child_score"), F.asc("child_id"))
    return (ch.withColumn("child_rank",
                          F.row_number().over(w).cast("long"))
            .where(F.col("child_rank") <= int(inner_size))
            .select("parent", F.col("_pscore").alias("score"),
                    "n_children", "child_id", "child_score",
                    "child_rank")
            .orderBy(F.desc("score"), F.asc("parent"), "child_rank"))


def has_parent(child_reader, parent_reader, parent_query: str,
               k: int = 10, mode: str = "or", score: bool = True,
               parent_col: str = "parent") -> DataFrame:
    """ES has_parent query: return CHILDREN whose parent matches
    parent_query on the parent index. score=True propagates the
    parent's BM25 score to every child (ES `score: true`); score=False
    is filter context (constant 0, ES default). Ranking on the rounded
    parent score with child-id tie-break.

    Returns DataFrame(child_id long, parent long, score double)."""
    ps = (parent_reader.scored_matches(parent_query, mode=mode)
          .select(F.col("doc_id").alias("_pid"),
                  F.round("score", 6).alias("_pscore")))
    ch = child_reader._docs().select(
        F.col("doc_id").alias("child_id"),
        F.col(parent_col).cast("long").alias("_pid"))
    out = ch.join(ps, "_pid", "inner")
    score_col = F.col("_pscore") if score else F.lit(0.0)
    return (out.select("child_id", F.col("_pid").alias("parent"),
                       score_col.alias("score"))
            .orderBy(F.desc("score"), F.asc("child_id")).limit(k))


def parent_id(child_reader, parent, boost: float = 1.0,
              parent_col: str = "parent") -> DataFrame:
    """ES parent_id query: every child of ONE parent, constant score =
    boost. Under the derived-id scheme a parent's children are
    id-contiguous, so the docstore scan's parquet min/max row-group
    stats prune to one shard's worth of files — the analogue of ES
    routing the fetch to the parent's single shard.

    Returns DataFrame(child_id long, score double) in child-id order."""
    ch = child_reader._docs().where(F.col(parent_col) == parent)
    return (ch.select(F.col("doc_id").alias("child_id"),
                      F.lit(float(boost)).alias("score"))
            .orderBy("child_id"))


def parent_agg(child_reader, parent_reader, child_query: str,
               bucket_col: str = "lang", mode: str = "or",
               parent_col: str = "parent") -> DataFrame:
    """ES `parent` aggregation — the inverse of `children`: from a
    CHILD query context, step UP to the parent documents and bucket
    THEM by a parent field. Per ES semantics the bucket doc_count is
    the number of PARENT docs reached (each parent counted once no
    matter how many of its children matched); alongside it this
    returns the matched-children volume and a parent metric (mean
    parent length in chars — a stand-in for any parent sub-agg).

    Shape: the child match set is posting-bounded (match_docs' pruned
    posting scan); stepping up is one parent-key partial agg whose
    rows combine map-side under parent/child co-location (one row per
    matched parent leaves each task), then one broadcast-eligible join
    to the parent docstore and one bucket-key partial agg — child-scale
    data crosses the wire once, as parent-count-sized rows.

    Returns DataFrame(bucket, n_parents, n_matching_children,
    avg_parent_chars) ordered by bucket."""
    cm = child_reader.match_docs(child_query, mode)
    cdocs = child_reader._docs().select(
        "shard", "doc_id", F.col(parent_col).cast("long").alias("_pid"))
    per_parent = (cm.join(cdocs, ["shard", "doc_id"], "inner")
                  .groupBy("_pid").agg(F.count("*").alias("_nm")))
    pdocs = parent_reader._docs().select(
        F.col("doc_id").alias("_pid"), F.col(bucket_col).alias("bucket"),
        F.length("content").cast("double").alias("_chars"))
    out = per_parent.join(pdocs, "_pid", "inner")
    return (out.groupBy("bucket")
            .agg(F.count("*").alias("n_parents"),
                 F.sum("_nm").cast("long").alias("n_matching_children"),
                 F.round(F.avg("_chars"), 6).alias("avg_parent_chars"))
            .orderBy("bucket"))


def children_agg(child_reader, parent_reader, parent_query: str,
                 bucket_col: str = "lang", mode: str = "or",
                 parent_col: str = "parent") -> DataFrame:
    """ES `children` aggregation: bucket the PARENT match set by a
    parent field, step down to each bucket's children, and compute
    child metrics (child count + average child token count). Shape:
    children pre-aggregate on the parent key (map-side combine under
    parent/child co-location — one row per parent), then one
    broadcast-eligible join to the matched parents and one bucket-key
    partial agg; nothing corpus-scale crosses the wire twice.

    Returns DataFrame(bucket, n_parents, n_children, avg_child_tokens)
    ordered by bucket."""
    pm = parent_reader.match_docs(parent_query, mode)
    pdocs = parent_reader._docs().select("shard", "doc_id", bucket_col)
    parents = (pm.join(pdocs, ["shard", "doc_id"], "inner")
               .select(F.col("doc_id").alias("_pid"),
                       F.col(bucket_col).alias("bucket")))
    # child token count: children are space-joined simple tokens, so a
    # single split is the exact token count (no re-analysis needed)
    ch = child_reader._docs().select(
        F.col(parent_col).cast("long").alias("_pid"),
        F.size(F.split(F.col("content"), " ")).cast("long").alias("_nt"))
    chp = ch.groupBy("_pid").agg(F.count("*").alias("_nc"),
                                 F.sum("_nt").alias("_ts"))
    out = parents.join(chp, "_pid", "left")
    return (out.groupBy("bucket").agg(
                F.count("*").alias("n_parents"),
                F.sum(F.coalesce(F.col("_nc"), F.lit(0)))
                .cast("long").alias("n_children"),
                F.round(F.sum("_ts").cast("double") / F.sum("_nc"), 6)
                .alias("avg_child_tokens"))
            .orderBy("bucket"))
