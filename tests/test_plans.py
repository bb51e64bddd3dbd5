"""Physical-plan audits: assert the plans we designed for are the plans
Catalyst actually produces — predicate pushdown + partition pruning into
the posting store, column pruning on wide tables, broadcast for dim-sized
joins, and no Python in pure-relational pipelines (SURVEY.md §4)."""

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader, _term_bucket
from maestro_spark.sources.corpus import synth_docs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("planidx"))
    cfg = IndexConfig(shard_size=200, n_buckets=8, n_salts=2,
                      hot_df_fraction=0.5, sample_fraction=1.0)
    build_index(spark, synth_docs(spark, 300, seed=42, partitions=3), out, cfg)
    return out


@pytest.fixture(autouse=True)
def _fresh_plans(spark):
    """Other test modules cache() the same parquet relations; a cache hit
    would replace the scan with InMemoryTableScan and hide the pushdown/
    pruning evidence these tests assert on."""
    spark.catalog.clearCache()
    yield


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_posting_scan_pushdown_and_pruning(spark, idx):
    """A query-term posting lookup must (a) push the term predicate into
    the parquet scan and (b) prune partitions by term_bucket."""
    reader = IndexReader(spark, idx)
    bucket = _term_bucket("return", 8)
    rel = reader._postings().where(
        (F.col("term_bucket") == bucket) & (F.col("term") == "return")
    ).select("term", "df")
    plan = _plan(rel)
    assert "PushedFilters" in plan and "term" in plan
    # partition pruning: term_bucket appears as a partition filter, and the
    # scan must NOT read the posting payload columns for a df-only query
    assert "PartitionFilters" in plan
    assert "doc_bytes" not in plan.split("ReadSchema")[1].split("\n")[0], (
        "df lookup must not read posting payload bytes")


def test_docs_scan_column_pruning(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    plan = _plan(d)
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "text" not in read_schema, "projection must prune the wide text column"


def test_fetch_by_ids_broadcasts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = spark.createDataFrame([(1,), (2,)], "doc_id long")
    j = docs.join(F.broadcast(ids), "doc_id", "left_semi")
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_relational_pipeline_stays_jvm_side(spark):
    """The exclusion-filter + aggregation path must contain no Python
    evaluation nodes — pure whole-stage-codegen column expressions."""
    from maestro_spark.operators.pipeline import ExclusionRules, apply_exclusions
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = apply_exclusions(docs, ExclusionRules({"lang": ["zh"]})) \
        .groupBy("source").agg(F.count("*").alias("n"))
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the exclusion predicate must reach the parquet scan…
    assert "Not(EqualTo(lang,zh))" in plan
    # …and the aggregation must have a map-side partial phase
    assert "partial_count" in plan


def test_quality_features_jvm_side(spark):
    """textstats quality scoring is pure column expressions — no Python."""
    from maestro_spark.operators.textstats import quality_features
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(quality_features(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_exact_join_strategy(spark):
    """Exact dedup's join-back of group stats must be either broadcast
    (AQE picks this when the distinct-fingerprint side is dim-sized — the
    case here) or a fingerprint-co-partitioned shuffle join (the plan at
    scale). Either way: no Python nodes, one groupBy shuffle on the hash."""
    from maestro_spark.operators.dedup import exact_duplicates
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(exact_duplicates(docs))
    assert ("BroadcastExchange" in plan
            or "SortMergeJoin" in plan)
    assert "hashpartitioning(fingerprint" in plan  # the groupBy(fingerprint)
    assert "BatchEvalPython" not in plan

def test_collapse_plan_partial_agg_no_window(spark, idx):
    """search_collapse's per-group argmax must be ONE aggregation with a
    map-side partial phase (max of a (score, -doc_id) struct), never a
    Window sort of the match set; the global top-k must compile to
    TakeOrderedAndProject (per-partition heaps, k rows moved)."""
    reader = IndexReader(spark, idx)
    plan = _plan(reader.search_collapse("index query merge", "repo", k=10))
    assert "TakeOrderedAndProject" in plan
    assert "partial_max" in plan
    assert "Window" not in plan


def test_cardinality_sketch_plan(spark, idx):
    """approx cardinality must merge HLL sketches map-side: a
    partial_approx_count_distinct phase, one constant-size row per task
    across the single-partition exchange."""
    reader = IndexReader(spark, idx)
    plan = _plan(reader.search_cardinality("index query", "repo",
                                           exact=False))
    assert "partial_approx_count_distinct" in plan


def test_decontaminate_broadcasts_eval_side(spark):
    """The eval shingle set must broadcast (dim-sized by definition) and
    the per-doc overlap count must have a map-side partial phase; no
    corpus-scale shuffle keyed on the n-gram string."""
    from maestro_spark.operators.curation import decontaminate
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    plan = _plan(decontaminate(corpus, ev, n=8))
    assert "BroadcastExchange" in plan
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_paragraph_dedup_partial_agg(spark):
    """First-occurrence winner selection must be a partial-agg min — the
    shuffle carries one row per distinct paragraph per task, never a
    corpus-wide window sort."""
    from maestro_spark.operators.dedup import (chunk_paragraphs,
                                               dedup_paragraphs)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dedup_paragraphs(chunk_paragraphs(docs, "text")))
    assert "partial_min" in plan
    assert "Window" not in plan


def test_minhash_filter_stays_above_spread_exchange(spark):
    """minhash_signatures over a few-partition input must (a) repartition
    to cluster parallelism BEFORE the tokenize→shingle→hash projection and
    (b) keep the no-shingle filter ABOVE that exchange. Catalyst's
    PushDownPredicates otherwise substitutes the filter through the
    projections and sinks the whole hash chain below the exchange, where
    it re-runs serially on the scan side's single task (the `_pin`
    non-deterministic column in minhash_signatures blocks this — see
    dedup.pinned). The scan's detail block must carry no derived-expression
    filters: the shingle CASE WHEN / hash chain appears only above the
    exchange."""
    import re as _re
    from maestro_spark.operators.dedup import minhash_signatures
    docs = spark.read.parquet(f"{SF}/documents.parquet").coalesce(1)
    plan = _plan(minhash_signatures(docs, n_hashes=8, hash_fn="xxhash64"))
    assert "Exchange" in plan and "RoundRobinPartitioning" in plan
    m = _re.search(r"\(\d+\) Scan parquet.*?(?=\n\(\d+\) )", plan, _re.S)
    assert m, plan
    scan_block = m.group(0)
    assert "xxhash64" not in scan_block
    assert "CASE WHEN" not in scan_block
    # no pushed filters at all (the line is absent) or an empty list
    assert ("PushedFilters" not in scan_block
            or "PushedFilters: []" in scan_block)


def test_new_aggs_stay_jvm_side(spark, idx):
    """Session-4 agg family: matrix_stats / MAD / top_metrics /
    bucket_script / cumulative_cardinality / geotile / geo_centroid are
    pure column expressions over the match-set join — the only Python
    node allowed in the plan is match_docs' posting grouped-map (one
    FlatMapGroupsInPandas), never a row-wise UDF over the docstore."""
    reader = IndexReader(spark, idx)
    lat = (F.col("doc_id") % 120 - 60).cast("double")
    lon = (F.col("doc_id") % 340 - 170).cast("double")
    frames = [
        reader.search_matrix_stats(
            "index merge", {"a": F.length("content"),
                            "b": (F.col("doc_id") % 7).cast("double")}),
        reader.search_mad("index merge", F.length("content")),
        reader.search_top_metrics("index merge", F.length("content"),
                                  {"m": lat}, size=2),
        reader.search_bucket_script("index merge",
                                    F.length("content"), 100),
        reader.search_cumulative_cardinality(
            "index merge",
            F.expr("timestamp'2025-01-01' + make_interval(0,0,0,0,"
                   "CAST(doc_id % 24 AS INT),0,0)"), F.col("lang")),
        reader.search_geotile_grid("index merge", lat, lon, zoom=2),
        reader.search_geo_centroid("index merge", lat, lon),
    ]
    for df in frames:
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("simple"))
        assert "BatchEvalPython" not in plan \
            and "ArrowEvalPython" not in plan
        # every Python node is match_docs' posting grouped-map (it may
        # appear twice: once feeding the join, once inside the dynamic
        # partition-pruning subquery that shard-prunes the docstore
        # scan — re-running the bounded match to skip docstore files
        # is the trade we want); never a row-wise UDF over doc rows
        assert plan.count("FlatMapGroupsInPandas") \
            == plan.count("match_shard")


def test_mix_sources_broadcasts_counts_and_no_extra_shuffle(spark):
    from maestro_spark.operators import curation
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = curation.mix_sources(docs, {"src0": 1.0, "src1": 1.0},
                               total_docs=100)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the probe side must not shuffle: the only exchange feeds the
    # dim-sized count aggregate / broadcast, never a repartition of docs
    assert "SortMergeJoin" not in plan


def test_session5_aggs_stay_jvm_side(spark, idx):
    """Session-5 families: geohash_grid / geo_polygon / global agg /
    approx terms agg / scripted_metric / moving_percentiles /
    random_sampler are pure column expressions over the match-set join
    — same no-row-wise-Python contract as the session-4 aggs."""
    reader = IndexReader(spark, idx)
    lat = (F.col("doc_id") % 120 - 60).cast("double")
    lon = (F.col("doc_id") % 340 - 170).cast("double")
    frames = [
        reader.search_geohash_grid("index merge", lat, lon, precision=3),
        reader.search_geo_polygon(
            "index merge", lat, lon,
            [(50.0, -60.0), (55.0, 30.0), (0.0, 70.0), (-45.0, 20.0)]),
        reader.search_global_agg("index merge", "lang"),
        reader.search_terms_approx("index merge", "lang", size=3,
                                   shard_size=2),
        reader.search_scripted_metric(
            "index merge", {"v": F.length("content").cast("double")},
            [F.sum("v").alias("s")], [F.sum("s").alias("t")]),
        reader.search_moving_percentiles("index merge",
                                         F.length("content"), 100.0),
        reader.search_random_sampler("index merge", 0.5, "lang"),
    ]
    for df in frames:
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("simple"))
        assert "BatchEvalPython" not in plan \
            and "ArrowEvalPython" not in plan
        assert plan.count("FlatMapGroupsInPandas") \
            == plan.count("match_shard")


def test_has_child_one_row_per_parent_partial_agg(spark, idx, tmp_path):
    """Parent-join scale shape: the parent-key aggregation must be a
    two-phase HashAggregate (map-side partial -> exchange carries one
    row per parent), and the only Python node is scored_matches'
    posting grouped-map."""
    from maestro_spark.operators import parentjoin
    from maestro_spark.operators.dedup import chunk_paragraphs
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    pars = chunk_paragraphs(docs.select("doc_id",
                                        F.col("text").alias("text")),
                            "text", chunk=10)
    cid = (F.col("doc_id") * 100 + F.col("par_idx")).cast("long")
    children = pars.select(
        cid.alias("doc_id"), F.col("doc_id").cast("long").alias("parent"),
        F.lit("p").alias("repo"), cid.cast("string").alias("path"),
        F.lit("c").alias("commit"), F.lit("t").alias("lang"),
        F.col("paragraph").alias("content"))
    out = str(tmp_path / "pj_idx")
    build_index(spark, children, out, IndexConfig(
        shard_size=4096, n_buckets=4, n_salts=2, sample_fraction=1.0,
        tokenizer="simple", index_fields=("content",),
        stored_columns=("parent",)), id_col="doc_id")
    cr = IndexReader(spark, out)
    df = parentjoin.has_child(cr, "slow query", k=5, min_children=1)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # two-phase agg on the parent key: partial HashAggregate BEFORE the
    # exchange, final after — the exchange moves parents, not children
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan


def test_session9_plans(spark, idx):
    """Session-9 family: script_score / bucket pipelines stay JVM-side —
    the only Python nodes are the posting grouped-maps (match_shard /
    score_all), never a row-wise UDF over doc rows; script_score's
    docstore join prunes to the script's columns; ccnet_buckets is pure
    WSCG + one lang-partitioned window."""
    from maestro_spark.operators import curation
    reader = IndexReader(spark, idx)
    frames = [
        reader.search_percentiles_bucket("index merge",
                                         F.length("content"), 100.0),
        reader.search_bucket_ks_test("index merge",
                                     F.length("content"), 100.0),
        reader.search_bucket_correlation("index merge",
                                         F.length("content"), 100.0),
        reader.search_script_score(
            "index merge",
            F.col("_score") / (F.lit(1.0) + F.log1p(F.length("content"))),
            cols=("content",)),
    ]
    for df in frames:
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("simple"))
        assert "BatchEvalPython" not in plan \
            and "ArrowEvalPython" not in plan
        assert plan.count("FlatMapGroupsInPandas") \
            == plan.count("match_shard") + plan.count("score_all")
    # script_score with cols=("lang",) must not read the wide content
    # column from the docstore
    df = reader.search_script_score(
        "index merge",
        F.col("_score") * F.when(F.col("lang") == "java", 2.0)
        .otherwise(1.0), cols=("lang",))
    plan = _plan(df)
    for seg in plan.split("ReadSchema")[1:]:
        head = seg.split("\n")[0]
        assert "content" not in head, "docstore scan must prune content"
    # ccnet_buckets: no Python nodes at all (scoring is one token join)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(curation.ccnet_buckets(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
