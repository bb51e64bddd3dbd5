"""Bool-query surface (the ES bool/_count/search_after/terms-agg
analogues — FileCentricElasticSearchAdapter.java:193-228 delegates these
to ES; here they are engine features):

  - exclude (must_not): docs containing any exclusion term never score,
    and the survivors' scores are IDENTICAL to the unexcluded search
    (exclusion removes docs, never re-weights them)
  - min_match (minimum_should_match): only docs matching >= m distinct
    query terms qualify; survivors keep their unrestricted scores
  - count_local (_count): total hits across or/and/msm/not modes
  - search_after_local: cursor pagination is exact at any depth —
    pages are disjoint, ordered, and concatenate to the deep top-k
  - search_facets: counts over the FULL match set, grouped docstore-side
  - Spark path vs serving path parity for exclude/min_match
"""

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
)

Q = "index query merge"
EX = "return"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_bool"))
    docs = synth_docs(spark, N_DOCS, seed=42, partitions=7)
    build_index(spark, docs, out, CFG)
    return out


@pytest.fixture(scope="module")
def reader(spark, built):
    return IndexReader(spark, built)


def _full(reader, q, **kw) -> pd.DataFrame:
    """Complete ranking (k = corpus size) via the serving path."""
    return reader.search_local(q, k=N_DOCS, **kw)


def test_exclude_semantics(reader):
    """exclude == set-minus on doc_ids with scores untouched."""
    base = _full(reader, Q)
    ex_ids = set(_full(reader, EX)["doc_id"])
    assert ex_ids, "exclusion term must match something"
    got = _full(reader, Q, exclude=EX)
    want = base[~base["doc_id"].isin(ex_ids)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_exclude_and_mode(reader):
    base = _full(reader, "query merge", mode="and")
    ex_ids = set(_full(reader, EX)["doc_id"])
    got = _full(reader, "query merge", mode="and", exclude=EX)
    want = base[~base["doc_id"].isin(ex_ids)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_min_match_semantics(reader):
    """min_match=2 keeps exactly the docs matching >= 2 distinct terms,
    with unchanged scores."""
    terms = Q.split()
    per_term = [set(_full(reader, t)["doc_id"]) for t in terms]
    n_match = {}
    for s in per_term:
        for d in s:
            n_match[d] = n_match.get(d, 0) + 1
    qualify = {d for d, n in n_match.items() if n >= 2}
    assert qualify and qualify != set(n_match)  # non-trivial floor
    base = _full(reader, Q)
    got = _full(reader, Q, min_match=2)
    want = base[base["doc_id"].isin(qualify)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_spark_path_parity_exclude_msm(spark, reader):
    for kw in ({"exclude": EX}, {"min_match": 2},
               {"exclude": EX, "min_match": 2},
               {"mode": "and", "exclude": EX}):
        want = reader.search_local(Q, k=10, **kw)
        got = reader.search(Q, k=10, **kw).toPandas()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), kw
        np.testing.assert_array_equal(got["score"].to_numpy(),
                                      want["score"].to_numpy())


def test_count_local_modes(reader):
    full = _full(reader, Q)
    assert reader.count_local(Q) == len(full)
    assert reader.count_local(Q, mode="and") == len(
        _full(reader, Q, mode="and"))
    assert reader.count_local(Q, min_match=2) == len(
        _full(reader, Q, min_match=2))
    assert reader.count_local(Q, exclude=EX) == len(
        _full(reader, Q, exclude=EX))
    assert reader.count_local("zzz_does_not_exist") == 0


def test_search_after_pages_tile_the_ranking(reader):
    """Pages of 7 concatenate to the full ranking, disjoint and in order."""
    full = _full(reader, Q)
    pages, cur = [], None
    for _ in range(100):
        p = reader.search_after_local(Q, k=7, after=cur)
        if not len(p):
            break
        pages.append(p)
        cur = (float(p["score"].iloc[-1]), int(p["doc_id"].iloc[-1]))
    walked = pd.concat(pages, ignore_index=True)
    pd.testing.assert_frame_equal(walked, full)


def test_search_after_first_page_matches_search(reader):
    p1 = reader.search_after_local(Q, k=10)
    direct = reader.search_local(Q, k=10)
    pd.testing.assert_frame_equal(p1, direct)


def test_search_after_with_exclude(reader):
    full = _full(reader, Q, exclude=EX)
    p1 = reader.search_after_local(Q, k=5, exclude=EX)
    cur = (float(p1["score"].iloc[-1]), int(p1["doc_id"].iloc[-1]))
    p2 = reader.search_after_local(Q, k=5, after=cur, exclude=EX)
    walked = pd.concat([p1, p2], ignore_index=True)
    pd.testing.assert_frame_equal(walked, full.head(10))


def test_facets_match_pandas_groupby(spark, built, reader):
    matches = reader.match_docs(Q).toPandas()
    assert set(matches["doc_id"]) == set(_full(reader, Q)["doc_id"])
    import os
    docs = spark.read.parquet(os.path.join(built, "docs")).select(
        "doc_id", "lang").toPandas()
    want = (docs[docs["doc_id"].isin(set(matches["doc_id"]))]
            .groupby("lang").size().reset_index(name="n_docs")
            .sort_values(["n_docs", "lang"], ascending=[False, True])
            .reset_index(drop=True))
    got = reader.search_facets(Q, facet_cols=("lang",)).toPandas()
    pd.testing.assert_frame_equal(
        got, want.astype({"n_docs": "int64"}))


def test_facets_and_mode_and_exclude(spark, built, reader):
    got = reader.search_facets(Q, facet_cols=("lang",), mode="and",
                               exclude=EX).toPandas()
    ids = set(_full(reader, Q, mode="and", exclude=EX)["doc_id"])
    import os
    docs = spark.read.parquet(os.path.join(built, "docs")).select(
        "doc_id", "lang").toPandas()
    want = (docs[docs["doc_id"].isin(ids)]
            .groupby("lang").size().reset_index(name="n_docs")
            .sort_values(["n_docs", "lang"], ascending=[False, True])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want.astype({"n_docs": "int64"}))


def test_msearch_exclude_min_match_parity(spark, reader):
    """Batched msearch with exclude/min_match equals per-query calls on
    both engines."""
    batch = {"a": Q, "b": "query merge", "c": "zzz_does_not_exist"}
    kw = {"exclude": EX, "min_match": 2}
    got_local = reader.search_many_local(batch, k=8, **kw)
    got_spark = reader.search_many(batch, k=8, **kw).toPandas()
    for qid, q in batch.items():
        want = reader.search_local(q, k=8, **kw)
        for got in (got_local, got_spark):
            part = (got[got["qid"] == qid]
                    .drop(columns="qid").reset_index(drop=True))
            assert part["doc_id"].tolist() == want["doc_id"].tolist(), qid
            np.testing.assert_array_equal(part["score"].to_numpy(),
                                          want["score"].to_numpy())


def test_min_match_prune_parity(reader):
    """MaxScore pruning under min_match is exact: the qualifying set is
    computed before scoring, so prune on == prune off."""
    a = reader.search_local(Q, k=15, min_match=2, prune=True)
    b = reader.search_local(Q, k=15, min_match=2, prune=False)
    pd.testing.assert_frame_equal(a, b)


def test_min_match_above_present_terms_empty(reader):
    assert len(reader.search_local(Q, k=10, min_match=99)) == 0
    assert reader.count_local(Q, min_match=99) == 0


def test_count_many_equals_individual_counts(reader):
    """filters agg: batched counts == per-query count_local, with and
    without bool clauses."""
    qs = {"a": Q, "b": "query merge", "c": "zzznothing"}
    got = reader.count_many_local(qs)
    for qid, q in qs.items():
        assert got[qid] == reader.count_local(q), qid
    kw = dict(exclude=EX, require="import", min_match=1)
    got2 = reader.count_many_local(qs, **kw)
    for qid, q in qs.items():
        assert got2[qid] == reader.count_local(q, **kw), qid
