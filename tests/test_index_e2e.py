"""Golden end-to-end: deterministic corpus → distributed index build →
reference query set → top-k RANK-IDENTICAL (ids + bit-identical float64
scores) vs the pinned brute-force oracle (SURVEY.md §5 golden tier;
BASELINE.json correctness gate)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.docids import assign_doc_ids
from maestro_spark.operators.search import IndexReader
from maestro_spark.oracle import BruteForceOracle
from maestro_spark.sources.corpus import synth_docs, synth_docs_pandas

N_DOCS = 400
CFG = IndexConfig(
    shard_size=150,        # -> 3 shards at 400 docs
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,  # low threshold -> force salting of hot terms
    sample_fraction=1.0,
)

# reference query set (FIXTURES.md §2): single/multi-term, field-scoped,
# identifier-subtoken, hot-token, AND-mode
QUERIES = [
    "return",                     # hot token (salted)
    "getUserName",                # identifier subtoken expansion
    "index query merge",          # multi-term OR
    "lang:java stream",           # field-scoped + term
    "path:util",                  # path-field query
    "repo:org0/repo0 cache",      # keyword field
    "fetchUpdate batchWriter",    # compound identifiers
    "zzz_does_not_exist",         # no-hit query
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    docs = synth_docs(spark, N_DOCS, seed=42, partitions=7)
    manifest = build_index(spark, docs, out, CFG)
    return out, manifest


@pytest.fixture(scope="module")
def oracle():
    pdf = synth_docs_pandas(N_DOCS, seed=42)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pdf["doc_id"] = np.arange(len(pdf), dtype=np.int64)
    return BruteForceOracle(pdf)


def test_docids_dense_and_stable(spark):
    docs = synth_docs(spark, 120, seed=42, partitions=5)
    with_ids = assign_doc_ids(docs, num_partitions=4)
    rows = with_ids.select("doc_id", "repo", "path", "commit").collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == list(range(120))
    # ids follow the sorted key order
    by_key = sorted(rows, key=lambda r: (r["repo"], r["path"], r["commit"]))
    assert [r["doc_id"] for r in by_key] == list(range(120))
    # stability: a different partitioning yields identical assignment
    docs2 = synth_docs(spark, 120, seed=42, partitions=2).repartition(9)
    rows2 = assign_doc_ids(docs2, num_partitions=3).collect()
    m1 = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in rows}
    m2 = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in rows2}
    assert m1 == m2


def test_manifest_and_shards(built):
    out, manifest = built
    assert manifest["n_docs"] == N_DOCS
    assert set(manifest["shards"]) == {"0", "1", "2"}
    for s in manifest["shards"].values():
        assert s["status"] == "ok"
        assert s["n_postings"] > 0 and s["bytes"] > 0
    # hot terms got salted and merged (fan-in > 1 somewhere)
    assert manifest["hot_terms"], "expected hot terms at this threshold"
    assert any(s["max_merge_fanin"] > 1 for s in manifest["shards"].values())
    assert manifest["stats"]["fields"]["content"]["avgdl"] > 50


def test_content_sha_invariant(spark, built):
    """input_hint invariant: per-row sha256(content) equality between the
    input table and the indexed docstore."""
    out, _ = built
    docs = synth_docs(spark, N_DOCS, seed=42, partitions=3)
    stored = spark.read.parquet(f"{out}/docs")
    joined = (
        docs.withColumn("sha_in", F.sha2("content", 256))
        .join(stored, ["repo", "path", "commit"], "full_outer")
        .where(
            F.col("sha_in").isNull()
            | F.col("content_sha256").isNull()
            | (F.col("sha_in") != F.col("content_sha256"))
        )
    )
    assert joined.count() == 0


@pytest.mark.parametrize("query", QUERIES)
def test_topk_rank_identical(spark, built, oracle, query):
    out, _ = built
    reader = IndexReader(spark, out)
    got = reader.search_pandas(query, k=10)
    want = oracle.search(query, k=10)
    if query != "zzz_does_not_exist":
        assert len(want) > 0, f"vacuous test: oracle empty for {query!r}"
    assert got["doc_id"].tolist() == want["doc_id"].tolist(), (
        f"doc order mismatch for {query!r}:\n{got}\nvs oracle\n{want}"
    )
    np.testing.assert_array_equal(
        got["score"].to_numpy(), want["score"].to_numpy(),
        err_msg=f"scores not bit-identical for {query!r}",
    )


@pytest.mark.parametrize("query", ["index query merge", "lang:java stream"])
def test_and_mode(spark, built, oracle, query):
    out, _ = built
    reader = IndexReader(spark, out)
    got = reader.search_pandas(query, k=10, mode="and")
    want = oracle.search(query, k=10, mode="and")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def test_prune_equals_exhaustive(spark, built):
    out, _ = built
    reader = IndexReader(spark, out)
    for q in ["return index", "get user name query merge"]:
        a = reader.search_pandas(q, k=10, prune=True)
        b = reader.search_pandas(q, k=10, prune=False)
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        np.testing.assert_array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_resume_skips_unchanged(spark, built):
    out, manifest = built
    docs = synth_docs(spark, N_DOCS, seed=42, partitions=7)
    m2 = build_index(spark, docs, out, CFG, resume=True)
    assert sorted(m2["skipped_shards"]) == [0, 1, 2]
    drop = {"wall_ms", "skipped_shards", "phase_ms"}  # run-specific, not index identity
    a = {k: v for k, v in manifest.items() if k not in drop}
    b = {k: v for k, v in m2.items() if k not in drop}
    assert a == b
