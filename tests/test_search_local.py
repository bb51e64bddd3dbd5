"""Serving-path parity: search_local / search_many_local /
phrase_search_local must return RANK-IDENTICAL results with bit-identical
float64 scores vs the distributed Spark path — same scorer, same
accumulation order, different I/O engine. Also covers the engine="auto"
routing and staleness across an incremental rebuild."""

import numpy as np
import pandas as pd
import pytest

from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs

N_DOCS = 400
CFG = IndexConfig(
    shard_size=150,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
    store_positions=True,
)

QUERIES = [
    "return",
    "getUserName",
    "index query merge",
    "lang:java stream",
    "path:util",
    "repo:org0/repo0 cache",
    "fetchUpdate batchWriter",
    "zzz_does_not_exist",
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_local"))
    docs = synth_docs(spark, N_DOCS, seed=42, partitions=7)
    build_index(spark, docs, out, CFG)
    return out


def _spark_hits(reader, q, **kw) -> pd.DataFrame:
    return reader.search(q, **kw).toPandas()


@pytest.mark.parametrize("query", QUERIES)
def test_local_matches_spark(spark, built, query):
    reader = IndexReader(spark, built)
    want = _spark_hits(reader, query, k=10)
    got = reader.search_local(query, k=10)
    assert got["doc_id"].tolist() == want["doc_id"].tolist(), query
    np.testing.assert_array_equal(
        got["score"].to_numpy(), want["score"].to_numpy(), err_msg=query)


@pytest.mark.parametrize("kw", [
    {"mode": "and"},
    {"prune": False},
    {"boosts": {"lang": 2.5, "path": 0.5}},
])
def test_local_matches_spark_variants(spark, built, kw):
    reader = IndexReader(spark, built)
    for query in ("index query merge", "lang:java stream"):
        want = _spark_hits(reader, query, k=5, **kw)
        got = reader.search_local(query, k=5, **kw)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), (query, kw)
        np.testing.assert_array_equal(
            got["score"].to_numpy(), want["score"].to_numpy())


def test_msearch_local_matches_singles(spark, built):
    reader = IndexReader(spark, built)
    queries = {f"q{i}": q for i, q in enumerate(QUERIES)}
    batch = reader.search_many_local(queries, k=5)
    for qid, q in queries.items():
        single = reader.search_local(q, k=5)
        g = batch[batch["qid"] == qid]
        assert g["doc_id"].tolist() == single["doc_id"].tolist(), qid
        np.testing.assert_array_equal(
            g["score"].to_numpy(), single["score"].to_numpy())


def test_phrase_local_matches_spark(spark, built):
    reader = IndexReader(spark, built)
    for phrase in ("get user", "user request count", "zzz nope"):
        want = reader.phrase_search(phrase, k=5).toPandas()
        got = reader.phrase_search_local(phrase, k=5)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), phrase
        np.testing.assert_array_equal(
            got["score"].to_numpy(), want["score"].to_numpy())


def test_engine_auto_routes_local_and_matches(spark, built):
    reader = IndexReader(spark, built)
    # sandbox dfs are tiny -> auto must serve locally (no Spark job):
    # assert by counting Spark jobs around the call
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    auto = reader.search("index query merge", k=10, engine="auto").toPandas()
    want = _spark_hits(reader, "index query merge", k=10, engine="spark")
    assert auto["doc_id"].tolist() == want["doc_id"].tolist()
    # a forced-tiny budget must route the same query to the Spark path
    reader2 = IndexReader(spark, built)
    reader2.LOCAL_DF_BUDGET = 0
    routed = reader2.search("index query merge", k=10, engine="auto").toPandas()
    assert routed["doc_id"].tolist() == want["doc_id"].tolist()


def test_local_sees_incremental_rebuild(spark, built, tmp_path):
    """A reader's cached pyarrow dataset must not serve stale postings
    after an in-place rebuild (same staleness contract as the Spark
    relations)."""
    out = str(tmp_path / "idx2")
    docs = synth_docs(spark, 60, seed=1, partitions=3)
    build_index(spark, docs, out, IndexConfig(
        shard_size=50, n_buckets=4, sample_fraction=1.0))
    reader = IndexReader(spark, out)
    base = reader.search_local("return", k=5)
    docs2 = synth_docs(spark, 120, seed=1, partitions=3)
    build_index(spark, docs2, out, IndexConfig(
        shard_size=50, n_buckets=4, sample_fraction=1.0))
    after = reader.search_local("return", k=5)
    want = reader.search("return", k=5, engine="spark").toPandas()
    assert after["doc_id"].tolist() == want["doc_id"].tolist()
    # the corpus doubled; the result set must reflect the new index
    assert reader.manifest["n_docs"] == 120
    assert not base.equals(after) or len(base) == 0


def test_posting_row_cache_hot_terms(spark, built):
    """Repeat queries serve posting rows from the reader's LRU cache
    (absent terms cache an empty map) with identical results; the cache
    is proven to be the source by making the store unreadable."""
    import os

    reader = IndexReader(spark, built)
    first = reader.search_local("index query merge", k=5)
    # absent terms never reach the posting fetch (the PLANNER drops
    # zero-df terms via the termdict), so the cache holds exactly the
    # present query terms
    assert {"index", "query", "merge"} <= set(reader._posting_rows_cache)
    # hide the posting store: a second identical query must still answer,
    # entirely from the cache
    postings = os.path.join(built, "postings")
    hidden = postings + ".hidden"
    os.rename(postings, hidden)
    try:
        again = reader.search_local("index query merge", k=5)
    finally:
        os.rename(hidden, postings)
    assert again["doc_id"].tolist() == first["doc_id"].tolist()
    np.testing.assert_array_equal(
        again["score"].to_numpy(), first["score"].to_numpy())


def test_search_with_docs_local_matches_spark(spark, built):
    reader = IndexReader(spark, built)
    for query in ("index query merge", "zzz_does_not_exist"):
        want = reader.search_with_docs(query, k=5).toPandas()
        got = reader.search_with_docs_local(query, k=5)
        cols = ["doc_id", "score", "repo", "path", "lang"]
        assert sorted(got.columns) == sorted(want.columns)
        assert got[cols].values.tolist() == want[cols].values.tolist(), query


def test_serving_reader_without_spark(spark, built):
    """IndexReader(None, dir) is a full serving node: identical results
    with no SparkSession; distributed methods fail with a clear error."""
    ref = IndexReader(spark, built)
    srv = IndexReader(None, built)
    for q in ("index query merge", "lang:java stream"):
        want = ref.search_local(q, k=5)
        got = srv.search_local(q, k=5)
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        np.testing.assert_array_equal(
            got["score"].to_numpy(), want["score"].to_numpy())
    ph = srv.phrase_search_local("get user", k=3)
    assert ph["doc_id"].tolist() == ref.phrase_search_local("get user", k=3)["doc_id"].tolist()
    with pytest.raises(ValueError, match="serving mode"):
        srv.search("return", k=3)


def test_posting_cache_eviction_never_drops_query_terms(spark, built):
    """The posting-row cache is byte-bounded (entry caps thrash once
    shard count grows — the doclens lesson). An over-budget insert may
    evict terms of the CURRENT query from the cache, but the query must
    still score with every term: results under a 1-byte budget (every
    fetch immediately evicted) are bit-identical to the unbounded
    reader's, on repeat too (re-fetch path)."""
    ref = IndexReader(spark, built)
    want = ref.search_local("index query merge", k=10)

    tiny = IndexReader(spark, built)
    tiny._POSTING_CACHE_BYTES = 1
    for _ in range(2):
        got = tiny.search_local("index query merge", k=10)
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        np.testing.assert_array_equal(got["score"].to_numpy(),
                                      want["score"].to_numpy())
    # the budget actually evicts: at most one resident term
    assert len(tiny._posting_rows_cache) <= 1
    # and the unbounded reader accounts bytes
    assert ref._posting_cache_bytes > 0
