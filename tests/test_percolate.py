"""Percolate (reverse search, ES percolator analogue): registered
queries matched against incoming docs via one broadcast join."""

import re

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.percolate import analyze_queries, percolate


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


QUERIES = [
    (1, "spark merge", "and", 1),
    (2, "stream window", "or", 2),
    (3, "dup vector table", "or", 2),
    (4, "spark spark spark", "and", 1),   # dup words don't raise the bar
    (5, "zzzqqqzzz", "or", 1),
]


def _qdf(spark):
    return spark.createDataFrame(
        QUERIES, "query_id long, query string, mode string, min_match int")


def test_analyze_queries_required(spark):
    got = analyze_queries(_qdf(spark)).toPandas()
    req = got.drop_duplicates("query_id").set_index("query_id")["required"]
    assert req[1] == 2      # and: all distinct terms
    assert req[2] == 2      # or + msm 2
    assert req[3] == 2      # msm capped at n_terms? no: msm=2 of 3
    assert req[4] == 1      # 'spark spark spark' distinct = 1 term
    n = got.groupby("query_id").size()
    assert n[4] == 1        # deduped term rows


def test_percolate_vs_bruteforce(spark, docs):
    got = percolate(docs, _qdf(spark)).toPandas()
    pdf = docs.select("doc_id", "text").toPandas()
    want = set()
    qmeta = {}
    for qid, qs, mode, msm in QUERIES:
        terms = set(re.findall(r"[a-z0-9]+", qs.lower()))
        req = len(terms) if mode == "and" else min(msm, len(terms))
        qmeta[qid] = (terms, req)
    for r in pdf.itertuples():
        dtoks = set(re.findall(r"[a-z0-9]+", r.text.lower()))
        for qid, (terms, req) in qmeta.items():
            n = len(terms & dtoks)
            if n >= req:
                want.add((r.doc_id, qid, n))
    assert set(map(tuple, got[["doc_id", "query_id",
                               "n_matched"]].itertuples(index=False))) \
        == want
    assert not (got["query_id"] == 5).any()   # no-hit query absent


def test_percolate_join_is_broadcast(spark, docs):
    plan = percolate(docs, _qdf(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_percolate_phrase_mode(spark):
    """mode='phrase' requires the tokens CONSECUTIVELY; term candidates
    alone must not match."""
    from maestro_spark.operators.percolate import percolate
    docs = spark.createDataFrame(
        [(0, "the slow query ran"),        # phrase present
         (1, "query was slow today"),      # both terms, wrong order
         (2, "slow and heavy query"),      # both terms, gap
         (3, "nothing relevant here"),
         (4, "slow query slow query")],    # repeated phrase
        "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(1, "slow query", "phrase", 1),
         (2, "slow query", "and", 1)],
        "query_id long, query string, mode string, min_match int")
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(docs, qdf).collect()}
    # phrase (q1): only docs 0 and 4; AND (q2): 0, 1, 2, 4
    assert {(d, 1) for d in (0, 4)} == {x for x in got if x[1] == 1}
    assert {(d, 2) for d in (0, 1, 2, 4)} == {x for x in got if x[1] == 2}


def test_percolate_phrase_single_token_and_boundary(spark):
    from maestro_spark.operators.percolate import percolate
    docs = spark.createDataFrame(
        [(0, "queryslow mash"),   # substring of a longer token: NO match
         (1, "query slow")],
        "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(1, "query slow", "phrase", 1)],
        "query_id long, query string, mode string, min_match int")
    got = {r["doc_id"] for r in percolate(docs, qdf).collect()}
    assert got == {1}
