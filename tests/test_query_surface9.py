"""Round-3 session-10 query-surface extensions, each checked against an
independent brute-force oracle:

  - search_bucket_sort (ES bucket_sort pipeline agg): terms buckets with
    metrics re-ordered by one metric + from/size truncation — gates
    WHICH buckets return, never how docs score; deterministic
    group-value tie-break at the sort key
  - search_sibling_bucket (ES avg_bucket / sum_bucket / max_bucket /
    min_bucket / stats_bucket sibling pipeline aggs): one row of stats
    across the per-bucket metric, keys[] = every bucket attaining the
    max/min (sorted, comma-joined), metric rounded BEFORE the sibling
    pass so key membership is cross-engine-stable
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.functions.tokenize import code_tokens
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader

N_DOCS = 300
CFG = IndexConfig(
    shard_size=128,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
    index_fields=("content", "lang"),
)

Q = "index merge"


@pytest.fixture(scope="module")
def corpus():
    from maestro_spark.sources.corpus import synth_docs_pandas
    return synth_docs_pandas(N_DOCS, seed=47).reset_index(names="doc_id")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("idx_qs9"))
    build_index(spark, spark.createDataFrame(corpus), out, CFG,
                id_col="doc_id")
    return out


@pytest.fixture(scope="module")
def reader(spark, built):
    return IndexReader(spark, built)


@pytest.fixture(scope="module")
def toks(corpus):
    return {int(d): list(ts) for d, ts in zip(
        corpus["doc_id"], code_tokens(corpus["content"]))}


def _match_set(reader, corpus, toks, query):
    terms = set(reader.plan(query).terms)
    out = set()
    for d, ts in toks.items():
        if terms & set(ts):
            out.add(d)
    for d, lang in zip(corpus["doc_id"], corpus["lang"]):
        if terms & set(code_tokens(pd.Series([lang]))[0]):
            out.add(int(d))
    return out


@pytest.fixture(scope="module")
def buckets_oracle(reader, corpus, toks):
    """Per-lang (n_docs, sum_v, avg_v) over the match set, v = len."""
    m = _match_set(reader, corpus, toks, Q)
    sub = corpus[corpus["doc_id"].isin(m)]
    v = sub["content"].str.len().astype(float)
    g = pd.DataFrame({"group_value": sub["lang"], "v": v}).groupby(
        "group_value")["v"]
    return pd.DataFrame({
        "n_docs": g.count().astype(int),
        "sum_v": g.sum().round(6),
        "avg_v": g.mean().round(6),
    }).reset_index()


# --------------------------------------------------- bucket_sort


def test_bucket_sort_order_offset_limit(reader, buckets_oracle):
    exp = buckets_oracle.sort_values(
        ["sum_v", "group_value"], ascending=[False, True])
    exp = exp.iloc[1:1 + 3].reset_index(drop=True)
    got = reader.search_bucket_sort(
        Q, "lang", F.length("content"),
        sort_by="sum_v", ascending=False, from_=1, size=3).toPandas()
    assert list(got["group_value"]) == list(exp["group_value"])
    assert list(got["n_docs"].astype(int)) == list(exp["n_docs"])
    assert [round(x, 6) for x in got["sum_v"]] == list(exp["sum_v"])
    assert [round(x, 6) for x in got["avg_v"]] == list(exp["avg_v"])


def test_bucket_sort_ascending_other_key(reader, buckets_oracle):
    exp = buckets_oracle.sort_values(
        ["n_docs", "group_value"], ascending=[True, True])
    exp = exp.iloc[:2].reset_index(drop=True)
    got = reader.search_bucket_sort(
        Q, "lang", F.length("content"),
        sort_by="n_docs", ascending=True, from_=0, size=2).toPandas()
    assert list(got["group_value"]) == list(exp["group_value"])
    assert list(got["n_docs"].astype(int)) == list(exp["n_docs"])


def test_bucket_sort_size_exceeds_buckets(reader, buckets_oracle):
    """size > |buckets| returns all buckets, no padding."""
    got = reader.search_bucket_sort(
        Q, "lang", F.length("content"), size=999).toPandas()
    assert len(got) == len(buckets_oracle)


def test_bucket_sort_bad_key_raises(reader):
    with pytest.raises(ValueError):
        reader.search_bucket_sort(Q, "lang", F.length("content"),
                                  sort_by="nope")


# --------------------------------------------------- sibling_bucket


def test_sibling_bucket_stats(reader, buckets_oracle):
    m = buckets_oracle.set_index("group_value")["avg_v"]
    got = reader.search_sibling_bucket(
        Q, "lang", F.length("content")).toPandas().iloc[0]
    assert int(got["n_buckets"]) == len(m)
    assert round(float(got["avg_bucket"]), 6) == round(float(m.mean()), 6)
    assert round(float(got["sum_bucket"]), 6) == round(float(m.sum()), 6)
    assert float(got["max_bucket"]) == float(m.max())
    assert float(got["min_bucket"]) == float(m.min())
    assert got["max_keys"] == ",".join(sorted(m.index[m == m.max()]))
    assert got["min_keys"] == ",".join(sorted(m.index[m == m.min()]))


def test_sibling_bucket_tied_keys(spark, tmp_path_factory):
    """Two langs with identical avg metric both appear in max_keys."""
    rows = [
        (0, "alpha beta", "aa"), (1, "alpha beta", "aa"),
        (2, "alpha bet1", "bb"), (3, "alpha bet2", "bb"),
        (4, "alpha", "cc"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "content", "lang"])
    pdf["repo"] = "r"
    pdf["path"] = "p" + pdf["doc_id"].astype(str)
    pdf["commit"] = "c"
    out = str(tmp_path_factory.mktemp("idx_qs9_tie"))
    build_index(spark, spark.createDataFrame(pdf), out,
                IndexConfig(shard_size=4, n_buckets=4, n_salts=2,
                            sample_fraction=1.0,
                            index_fields=("content",)),
                id_col="doc_id")
    r = IndexReader(spark, out)
    got = r.search_sibling_bucket(
        "alpha", "lang", F.length("content")).toPandas().iloc[0]
    # aa avg len = 10, bb avg len = 10, cc avg len = 5
    assert got["max_keys"] == "aa,bb"
    assert got["min_keys"] == "cc"
    assert int(got["n_buckets"]) == 3
    assert float(got["min_bucket"]) == 5.0
    assert float(got["max_bucket"]) == 10.0
