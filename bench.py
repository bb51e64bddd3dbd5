"""Benchmark harness: index-build throughput + BM25 top-k latency on the
north-star corpus (input_hint shape, synthesized deterministically at a
size proportional to SF), plus the documents/embeddings-table operator
suite at $SPARK_GRAFT_SF_DIR. Prints ONE JSON line.

  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default all cores)
  BENCH_DOCS          override corpus size (default sf * 200_000)

The same script at two parallelism levels is the scaling-efficiency
evidence (see bench_scaling.py / BENCH.md): N vs 4N cores stand in for N
vs 4N executors, per BASELINE.md."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

from maestro_spark.operators import curation, dedup, similarity, textstats
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.session import get_spark
from maestro_spark.sources.corpus import synth_docs

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "return",
    "getUserName",
    "index query merge",
    "lang:java stream",
    "path:util",
    "repo:org0/repo0 cache",
    "fetchUpdate batchWriter",
    "error retry handler",
]

CFG = IndexConfig(
    shard_size=8192,
    n_buckets=16,
    n_salts=8,
    hot_df_fraction=0.02,
    sample_fraction=0.05,
    tokenizer="code",
    index_fields=("content", "path", "lang", "repo"),
    store_positions=True,      # full feature set: prox stream for phrases
)

PHRASES = ["get user", "token worker merge", "user request count"]


def _sf() -> float:
    base = os.path.basename(os.path.normpath(SF_DIR))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _vm_cpu_score() -> float:
    """Fixed-work single-core calibration (higher = healthier VM): the
    sandbox's delivered CPU fluctuates ~2-4× run-to-run (noisy
    neighbors), so every bench JSON carries this score — a slow
    headline number with a low score is the neighbor, not the engine.
    ~1 s of numpy matmul + hashing at nominal speed."""
    rng = np.random.default_rng(7)
    a = rng.random((512, 512))
    t0 = time.time()
    for _ in range(24):
        a = a @ a % 1.0 + 0.1
    return round(24.0 / (time.time() - t0), 2)


def main() -> None:
    sf = _sf()
    n_docs = int(os.environ.get("BENCH_DOCS", str(int(sf * 200_000))))
    spark = get_spark("maestro_bench")
    t_all = time.time()
    timings: dict[str, float] = {}

    cpu_score_pre = _vm_cpu_score()

    # ---- 1. index build over the north-star corpus -----------------------
    # best-of-N (default 2): one build can land in a bad noisy-neighbor
    # window (measured 4× swings on identical code); the min is the only
    # stable estimator of the engine's own cost. All samples reported.
    idx_dir = tempfile.mkdtemp(prefix="maestro_bench_idx_")
    repeats = int(os.environ.get("BENCH_BUILD_REPEATS", "2"))
    try:
        docs = synth_docs(spark, n_docs, seed=42)
        build_samples = []
        for rep in range(max(repeats, 1)):
            if rep:
                shutil.rmtree(idx_dir, ignore_errors=True)
            t0 = time.time()
            manifest = build_index(spark, docs, idx_dir, CFG)
            build_samples.append(time.time() - t0)
        t_build = min(build_samples)
        timings["index_build"] = round(t_build, 3)
        docs_per_sec = n_docs / t_build
        n_postings = sum(s["n_postings"] for s in manifest["shards"].values())
        postings_per_sec = n_postings / t_build
        bytes_compressed = sum(s["bytes"] for s in manifest["shards"].values())

        # ---- 2. query latency over the built index -----------------------
        # best-of-3 per query: the sandbox VM's delivered CPU fluctuates
        # ~2× (noisy neighbors), so the min is the only stable estimator
        # of the engine's own cost; mean-based percentiles are reported
        # alongside for honesty.
        reader = IndexReader(spark, idx_dir)
        reader.search("warmup", k=10).collect()  # JVM/plan warmup
        lat: list[float] = []
        for rep in range(3):
            for q in QUERIES:
                t0 = time.time()
                reader.search(q, k=10).collect()
                lat.append(time.time() - t0)
        lat_arr = np.asarray(lat).reshape(3, len(QUERIES))
        best = lat_arr.min(axis=0)
        for i, q in enumerate(QUERIES):
            timings[f"query:{q}"] = round(float(best[i]), 3)
        query_p95 = float(np.percentile(best, 95))
        query_p50 = float(np.percentile(best, 50))
        query_p95_mean = float(np.percentile(lat_arr.mean(axis=0), 95))
        for ph in PHRASES:
            samples = []
            for rep in range(2):
                t0 = time.time()
                reader.phrase_search(ph, k=10).collect()
                samples.append(time.time() - t0)
            timings[f"phrase:{ph}"] = round(min(samples), 3)

        # ---- 2a. serving path (no Spark job): per-query + msearch QPS ----
        reader.search_local("warmup", k=10)
        lat_local: list[float] = []
        for rep in range(3):
            for q in QUERIES:
                t0 = time.time()
                reader.search_local(q, k=10)
                lat_local.append(time.time() - t0)
        ll = np.asarray(lat_local).reshape(3, len(QUERIES)).min(axis=0)
        for i, q in enumerate(QUERIES):
            timings[f"query_local:{q}"] = round(float(ll[i]), 4)
        query_local_p50 = float(np.percentile(ll, 50))
        query_local_p95 = float(np.percentile(ll, 95))
        for ph in PHRASES:
            samples = []
            for rep in range(2):
                t0 = time.time()
                reader.phrase_search_local(ph, k=10)
                samples.append(time.time() - t0)
            timings[f"phrase_local:{ph}"] = round(min(samples), 4)
        batch = {f"q{i}": QUERIES[i % len(QUERIES)] for i in range(96)}
        t0 = time.time()
        reader.search_many_local(batch, k=10)
        msearch_wall = time.time() - t0
        timings["msearch_local_96"] = round(msearch_wall, 3)
        msearch_local_qps = 96.0 / msearch_wall

        # ---- 2b. shard-parallel serving tier (ServingPool, round 4):
        # W=4 worker processes each owning shards s%4, coordinator
        # merge — p50/p95 over the same query mix + the same 96-batch
        from maestro_spark.operators.serving import ServingPool
        with ServingPool(idx_dir, n_workers=4) as pool:
            for q in QUERIES:
                pool.search(q, k=10)          # warm worker caches
            pl: list[float] = []
            for rep in range(3):
                for q in QUERIES:
                    t0 = time.time()
                    pool.search(q, k=10)
                    pl.append(time.time() - t0)
            pla = np.asarray(pl).reshape(3, len(QUERIES)).min(axis=0)
            pool_p50 = float(np.percentile(pla, 50))
            pool_p95 = float(np.percentile(pla, 95))
            t0 = time.time()
            pool.msearch(batch, k=10)
            pool_msearch_qps = 96.0 / (time.time() - t0)
            # agg fan-out through the same pool (round 5): workers
            # compute associative partials over their own shards,
            # coordinator reduces exactly
            t0 = time.time()
            pool.facets("index query merge", ("lang",))
            timings["pool_facets"] = round(time.time() - t0, 4)
            t0 = time.time()
            pool.significant_terms("getUserName", size=15)
            timings["pool_sig_terms"] = round(time.time() - t0, 4)
            t0 = time.time()
            pool.top_hits("index query merge", "repo", per_group=2,
                          k_groups=5)
            timings["pool_top_hits"] = round(time.time() - t0, 4)
            t0 = time.time()
            pool.phrase("get user", k=10)
            timings["pool_phrase"] = round(time.time() - t0, 4)
        timings["pool_msearch_96"] = round(96.0 / pool_msearch_qps, 3)

        # bool/pagination/facet/count surface (round-2 additions)
        t0 = time.time()
        reader.search_local("index query merge", k=10, exclude="return",
                            min_match=2)
        timings["bool_not_msm_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        p1 = reader.search_after_local("index query merge", k=10)
        if len(p1):
            reader.search_after_local(
                "index query merge", k=10,
                after=(float(p1["score"].iloc[-1]),
                       int(p1["doc_id"].iloc[-1])))
        timings["search_after_2pages"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.count_local("index query merge")
        timings["count_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.search_facets("index query merge", facet_cols=("lang",)).collect()
        timings["facets_spark"] = round(time.time() - t0, 3)

        # fuzzy/wildcard expansion + explain/highlight (round-2 late adds)
        t0 = time.time()
        reader.search_local("merge~1 quer*", k=10)
        timings["fuzzy_wildcard_local"] = round(time.time() - t0, 4)
        top = reader.search_local("index query merge", k=10)
        ids = top["doc_id"].tolist()
        t0 = time.time()
        reader.explain_local("index query merge", ids)
        timings["explain_local_10"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.highlight_local("index query merge", ids, window=8)
        timings["highlight_local_10"] = round(time.time() - t0, 4)

        # bool-filter / query_string / dis_max / window-rescore surface
        t0 = time.time()
        reader.query_string("index query +merge -lambda", k=10,
                            engine="local")
        timings["query_string_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.multi_match_local("index java", ("content", "lang"),
                                 tie_breaker=0.3, k=10)
        timings["multi_match_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.rescore_phrase_local("index query", window=50, k=10,
                                    rescore_weight=2.0)
        timings["rescore_phrase_50"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.search_boosting("index query merge", "return",
                               negative_boost=0.4, k=10, engine="local")
        timings["boosting_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.phrase_search_local("index qu", k=10, prefix_last=True)
        timings["phrase_prefix_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.search_collapse("index query merge", "repo", k=10).collect()
        timings["collapse_by_repo"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_cardinality("index query merge", "repo",
                                  exact=False).collect()
        timings["cardinality_hll"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_percentiles("index query merge", F.length("content"),
                                  (0.5, 0.95), exact=False).collect()
        timings["percentiles_tdigest"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_top_hits("index query merge", "repo",
                               per_group=2, k_groups=5).collect()
        timings["top_hits"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.count_many_local({"a": "index query", "b": "merge",
                                 "c": "return"})
        timings["filters_counts_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        ids = reader.doc_value_ids("doc_id", ge=0, le=5000)
        reader.search_local("index query merge", k=10, within_ids=ids)
        timings["range_filter_local"] = round(time.time() - t0, 4)

        # MaxScore block skipping audit (VERDICT r3 #1): run the pruned
        # serving-path query mix and report decoded vs total posting
        # blocks — the unpruned engine would decode every block
        from maestro_spark.operators.search import reset_prune_stats
        reset_prune_stats()
        for q in QUERIES:
            reader.search_local(q, k=10)
        reader.multi_match_local("index java", ("content", "lang"),
                                 tie_breaker=0.3, k=10)
        if len(p1):
            reader.search_after_local(
                "index query merge", k=10,
                after=(float(p1["score"].iloc[-1]),
                       int(p1["doc_id"].iloc[-1])))
        reader.search_local("index query merge", k=10, within_ids=ids)
        prune_stats = reset_prune_stats()

        # full-match-set rescoring + corpus-contrast agg (round-2 adds)
        t0 = time.time()
        reader.search_function_score("index query merge",
                                     F.length("content"), k=10,
                                     factor=0.001).collect()
        timings["function_score"] = round(time.time() - t0, 3)
        t0 = time.time()
        # on_over_budget="sample": above SIG_FG_BUDGET matched docs the
        # guard auto-routes to the ES sampler composition (per-shard
        # top-N foreground) — the k-bounded cost class; under budget
        # this is the exact path, unchanged
        reader.significant_terms("error retry", size=10,
                                 on_over_budget="sample").collect()
        timings["significant_terms"] = round(time.time() - t0, 3)

        # round-3 late families: decay scoring, date/geo runtime-field
        # aggs, adjacency matrix, span_first
        t0 = time.time()
        reader.search_decay_score("index query merge", F.length("content"),
                                  origin=500.0, scale=300.0, k=10).collect()
        timings["decay_score"] = round(time.time() - t0, 3)
        mt = F.expr("timestamp'2025-01-01 00:00:00' + make_interval("
                    "0, 0, 0, 0, CAST(doc_id % 720 AS INT), 0, 0)")
        t0 = time.time()
        reader.search_date_histogram("index merge", mt, "day").collect()
        timings["date_histogram"] = round(time.time() - t0, 3)
        blat = (F.col("doc_id") % 120).cast("double") - 60.0
        blon = (F.col("doc_id") % 340).cast("double") - 170.0
        t0 = time.time()
        reader.search_geo_distance("index merge", blat, blon, 0.0, 0.0,
                                   5000.0, k=10).collect()
        timings["geo_distance"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.adjacency_matrix_local({"a": "index", "b": "merge",
                                       "c": "error retry"})
        timings["adjacency_matrix_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.phrase_search_local("get user", k=10, first_n=30)
        timings["span_first_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.span_near_local("index merge", k=10, slop=3,
                               in_order=False)
        timings["span_near_unordered_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.combined_fields_local("index merge",
                                     fields=("content", "lang"), k=10)
        timings["combined_fields_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.search_bool_prefix("index mer", k=10).collect()
        timings["bool_prefix"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_diversified_sampler(
            "index merge", sample_top=10, dedup_col=F.col("lang"),
            max_per_value=2).collect()
        timings["diversified_sampler"] = round(time.time() - t0, 3)

        # round-3 session-5 families: span containing, geohash/polygon,
        # distributed-ES terms agg, global agg, scripted_metric,
        # moving_percentiles, prefix-bounded fuzzy. (Parent-join's cost
        # components — scored_matches + one parent-key partial agg —
        # are already timed by function_score and facets_spark.)
        t0 = time.time()
        reader.span_containing_local("get user", "name", k=10, big_gaps=2)
        timings["span_containing_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.search_geohash_grid("index merge", blat, blon,
                                   precision=4).collect()
        timings["geohash_grid"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_geo_polygon(
            "index merge", blat, blon,
            [(50.0, -60.0), (55.0, 30.0), (0.0, 70.0), (-45.0, 20.0),
             (-30.0, -70.0)], k=10).collect()
        timings["geo_polygon"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_terms_approx("index merge", "lang", size=5,
                                   shard_size=3).collect()
        timings["terms_agg_approx"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_global_agg("index merge", "lang").collect()
        timings["global_agg"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_scripted_metric(
            "index merge",
            {"sv": F.length("content").cast("double")},
            [F.sum("sv").alias("s"), F.count("*").alias("n")],
            [F.sum("s").alias("total"), F.count("*").alias("n_shards")]
        ).collect()
        timings["scripted_metric"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_moving_percentiles("index merge",
                                         F.length("content"),
                                         100.0, window=3).collect()
        timings["moving_percentiles"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.fuzzy_terms("getusername", max_edits=2, prefix_length=3)
        timings["fuzzy_prefix_expand"] = round(time.time() - t0, 4)

        # round-3 session-9 families: learned-sparse dot product (both
        # engines), script_score (full-match-set rescoring), most_fields
        # combine, significant_text with 6-gram dedup, bucket pipelines
        sv_w = {"index": 2.0, "merge": 1.0, "return": 0.5}
        t0 = time.time()
        reader.search_sparse_vector(sv_w, k=10).collect()
        timings["sparse_vector"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_sparse_vector(sv_w, k=10, engine="local")
        timings["sparse_vector_local"] = round(time.time() - t0, 4)
        t0 = time.time()
        reader.search_script_score(
            "index query merge",
            F.col("_score") / (F.lit(1.0) + F.log1p(F.length("content"))),
            k=10, cols=("content",)).collect()
        timings["script_score"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.multi_match("index java", ("content", "lang"), k=10,
                           mm_type="most_fields").collect()
        timings["most_fields"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.significant_text("error retry", size=10,
                                on_over_budget="sample").collect()
        timings["significant_text_dedup"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_percentiles_bucket(
            "index merge", F.length("content"), 100.0).collect()
        timings["percentiles_bucket"] = round(time.time() - t0, 3)
        t0 = time.time()
        reader.search_bucket_ks_test(
            "index merge", F.length("content"), 100.0).collect()
        timings["bucket_ks_test"] = round(time.time() - t0, 3)

        # snapshot-clone overhead (the versioned-incremental fixed cost:
        # hardlinks only, O(#files) — must stay ~ms at any corpus size)
        from maestro_spark.sources.tableio import hardlink_clone
        clone_dir = idx_dir + "_snap"
        t0 = time.time()
        n_linked = hardlink_clone(idx_dir, clone_dir)
        timings["snapshot_clone"] = round(time.time() - t0, 4)
        shutil.rmtree(clone_dir, ignore_errors=True)

        # ---- 2b. incremental upsert: stable ids, affected shards only ----
        from pyspark.sql import functions as FF
        from maestro_spark.operators.incremental import incremental_update
        docs_stored = spark.read.parquet(os.path.join(idx_dir, "docs"))
        mod = (docs_stored.orderBy("doc_id").limit(100)
               .select("repo", "path", "commit", "lang",
                       FF.concat(FF.col("content"),
                                 FF.lit(" zzqbenchedit")).alias("content")))
        t0 = time.time()
        m_inc = incremental_update(spark, idx_dir, mod, None, CFG)
        timings["incremental_upsert_100"] = round(time.time() - t0, 3)
        inc_rebuilt = len(m_inc["shards"]) - len(m_inc.get("skipped_shards", []))
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # ---- 3. documents/embeddings operator suite at SF_DIR ---------------
    documents = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    embeddings = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    timed("dedup_exact", lambda: dedup.exact_duplicates(documents).count())
    timed("near_dup_minhash_lsh",
          lambda: dedup.near_dup_pairs(documents, 0.5, 16, 2).count())
    timed("near_dup_components",
          lambda: dedup.near_dup_components(documents, 0.5, 16, 2).count())
    timed("simhash", lambda: dedup.simhash(documents, 16).count())
    qv = [float(x) for x in embeddings.where(F.col("vec_id") == 0)
          .select("embedding").head()[0]]
    timed("cosine_topk",
          lambda: similarity.brute_force_topk(embeddings, qv, 10, exclude_id=0).collect())
    planes = similarity.random_hyperplanes(len(qv), 8)
    bucketed = similarity.hyperplane_bucket(embeddings, planes)
    timed("ann_hyperplane",
          lambda: similarity.ann_hyperplane_topk(bucketed, qv, planes, 10,
                                                 n_probe=2, exclude_id=0).collect())
    timed("quality_score", lambda: textstats.quality_features(documents)
          .agg(F.avg("quality_score")).collect())
    timed("pii_redact", lambda: textstats.redact_pii(documents)
          .agg(F.sum("n_urls")).collect())
    timed("repetition_ratio", lambda: textstats.repetition_features(documents)
          .agg(F.avg("distinct_ratio")).collect())
    timed("paragraph_dedup", lambda: dedup.dedup_paragraphs(
        dedup.chunk_paragraphs(documents, "text", chunk=10)).count())
    timed("decontaminate", lambda: curation.decontaminate(
        documents.where(F.col("doc_id") % 97 != 0),
        documents.where(F.col("doc_id") % 97 == 0), n=8)
        .agg(F.sum(F.col("contaminated").cast("long"))).collect())
    timed("dsir_weights", lambda: curation.dsir_weights(
        documents, documents.where(F.col("doc_id") % 17 == 0),
        n_buckets=1024).agg(F.avg("logratio")).collect())
    timed("ccnet_buckets", lambda: curation.ccnet_buckets(documents)
          .groupBy("lang", "bucket_name").count().collect())

    from maestro_spark.operators.percolate import percolate
    pq = spark.createDataFrame(
        [(i, q, "or", 2) for i, q in enumerate(
            ["index merge", "error retry handler", "slow query",
             "batch writer", "user request count"])],
        "query_id long, query string, mode string, min_match int")
    timed("percolate_5q", lambda: percolate(documents, pq).count())
    timed("gopher_quality",
          lambda: textstats.gopher_quality(documents).count())
    timed("bigram_logprob",
          lambda: textstats.bigram_logprob(documents).count())
    timed("mix_sources", lambda: curation.mix_sources(
        documents, {"src1": 2.0, "src3": 1.0},
        total_docs=int(documents.count() * 0.2)).count())

    # round-3 session-10 families: code-file quality filter (map-only),
    # TSDB counter rate (one series-key shuffle, window + reused-
    # distribution groupBy)
    timed("stack_quality",
          lambda: textstats.stack_quality(documents).count())
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    from maestro_spark.operators.timeseries import counter_rate
    timed("counter_rate", lambda: counter_rate(events).count())

    # session-11 families: TSDB rollup + requery, leakage matrix, reranker
    from maestro_spark.operators.timeseries import (downsample,
                                                    downsample_requery)
    timed("downsample_rollup", lambda: downsample(events).count())
    timed("downsample_requery",
          lambda: downsample_requery(events, unit="hour",
                                     requery_unit="day").count())
    timed("split_overlap",
          lambda: curation.split_overlap(documents, n=8).count())

    def _rerank():
        # the index is torn down before this section; drive the reranker
        # with a deterministic stand-in first stage over `documents` —
        # what's being measured is the window cut + broadcast doc fetch
        # + JVM-side token scoring, which is retriever-independent
        from maestro_spark.operators.similarity import text_similarity_rerank
        first = documents.select(
            "doc_id", F.col("n_chars").cast("double").alias("score"))
        return text_similarity_rerank(first, documents,
                                      "spark merge query", k=10,
                                      window=30, text_col="text").count()

    timed("rerank_text_sim", _rerank)

    def _inc_dedup():
        norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
        store = (documents.where(F.col("doc_id") % 7 == 0)
                 .select(F.md5(norm).alias("fingerprint")).distinct())
        return dedup.incremental_dedup(
            documents.where(F.col("doc_id") % 7 != 0), store
        ).agg(F.sum(F.col("keep").cast("long"))).collect()

    timed("incremental_dedup", _inc_dedup)

    def _hard_neg():
        from maestro_spark.operators.similarity import mine_hard_negatives
        qs = embeddings.where(F.col("vec_id").isin(0, 7))
        pos = (qs.select(F.col("vec_id").alias("qid"))
               .join(embeddings.select(F.col("vec_id").alias("nid")),
                     (F.col("nid") >= F.col("qid") + 1)
                     & (F.col("nid") <= F.col("qid") + 20)))
        return mine_hard_negatives(qs, embeddings, pos, k=10).count()

    timed("hard_negatives", _hard_neg)
    timed("gopher_repetition",
          lambda: textstats.gopher_repetition(documents).count())
    timed("temperature_mix", lambda: curation.temperature_mix(
        documents.select("doc_id", "source"), total_docs=300,
        temperature=0.5).count())

    total = time.time() - t_all
    out = {
        "metric": "index-build docs/sec + BM25 top-k latency + curation ops wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs_indexed": n_docs,
        "build_samples_s": [round(x, 3) for x in build_samples],
        "vm_cpu_score": [cpu_score_pre, _vm_cpu_score()],
        "docs_per_sec": round(docs_per_sec, 1),
        "postings_per_sec": round(postings_per_sec, 1),
        "posting_bytes": bytes_compressed,
        "query_p50_s": round(query_p50, 4),
        "query_p95_s": round(query_p95, 4),
        "query_p95_mean_s": round(query_p95_mean, 4),
        "query_local_p50_s": round(query_local_p50, 4),
        "query_local_p95_s": round(query_local_p95, 4),
        "msearch_local_qps": round(msearch_local_qps, 1),
        "pool4_p50_s": round(pool_p50, 4),
        "pool4_p95_s": round(pool_p95, 4),
        "pool4_msearch_qps": round(pool_msearch_qps, 1),
        "build_phase_ms": manifest.get("phase_ms", {}),
        "incremental_rebuilt_shards": inc_rebuilt,
        "snapshot_files_linked": n_linked,
        "prune_blocks_decoded": prune_stats["blocks_decoded"],
        "prune_blocks_total": prune_stats["blocks_total"],
        "parallelism": spark.sparkContext.defaultParallelism,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
