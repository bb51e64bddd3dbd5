"""BM25 explain (ES _explain analogue) and best-window highlighting
(plain-highlighter analogue): explain contribs must sum bit-identically
to the search score; highlight must match a brute-force pandas oracle
over the identical corpus."""

import numpy as np
import pandas as pd
import pytest

from maestro_spark.functions.tokenize import code_tokens
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs, synth_docs_pandas

N_DOCS = 300
CFG = IndexConfig(
    shard_size=128,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
)
QUERY = "user merge cache"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    # explicit id_col so engine doc_ids align 1:1 with the pandas corpus
    # row order (build_index without id_col range-sorts and reassigns)
    out = str(tmp_path_factory.mktemp("idx_explain"))
    pdf = synth_docs_pandas(N_DOCS, seed=7).reset_index(names="doc_id")
    build_index(spark, spark.createDataFrame(pdf), out, CFG,
                id_col="doc_id")
    return out


def test_explain_sums_to_search_score(spark, built):
    reader = IndexReader(spark, built)
    top = reader.search_local(QUERY, k=5)
    assert len(top) == 5
    order = {t: i for i, t in enumerate(reader.plan(QUERY).terms)}
    exp = reader.explain_local(QUERY, top["doc_id"].tolist())
    for _, hit in top.iterrows():
        rows = exp[exp["doc_id"] == hit["doc_id"]].sort_values(
            "term", key=lambda s: s.map(order))
        acc = 0.0
        for c in rows["contrib"]:  # canonical-order float64 accumulation
            acc += c
        assert acc == hit["score"]


def test_explain_fields_and_counts(spark, built):
    reader = IndexReader(spark, built)
    exp = reader.explain_local("lang:java user", [0, 1, 2, 3, 4, 5])
    assert set(exp["field"]) <= {"lang", "content"}
    kw = exp[exp["term"] == "lang:java"]
    # keyword postings are tf=1 / dl=1 by construction
    assert (kw["tf"] == 1).all() and (kw["dl"] == 1.0).all()
    # df/idf identical across docs for the same term
    assert exp.groupby("term")["idf"].nunique().le(1).all()


def test_explain_empty_cases(spark, built):
    reader = IndexReader(spark, built)
    assert len(reader.explain_local("zzznope", [1, 2, 3])) == 0
    assert len(reader.explain_local(QUERY, [])) == 0


def _brute_highlight(qset, window):
    pdf = synth_docs_pandas(N_DOCS, seed=7)
    out = {}
    for doc_id, toks in enumerate(code_tokens(pdf["content"])):
        toks = list(toks)
        if not any(t in qset for t in toks):
            continue
        best = max(
            ((len({t for t in toks[s:s + window] if t in qset}), -s)
             for s in range(len(toks))),
        )
        n, s = best[0], -best[1]
        out[doc_id] = (s, n, " ".join(toks[s:s + window]))
    return out


@pytest.mark.parametrize("window", [4, 8])
def test_highlight_matches_bruteforce(spark, built, window):
    reader = IndexReader(spark, built)
    qset = {t for t in reader.plan(QUERY).terms}
    ids = list(range(40))
    got = reader.highlight_local(QUERY, ids, window=window)
    want = _brute_highlight(qset, window)
    want = {d: v for d, v in want.items() if d in set(ids)}
    assert set(got["doc_id"]) == set(want)
    for _, r in got.iterrows():
        s, n, snip = want[int(r["doc_id"])]
        assert (int(r["start"]), int(r["n_terms"]), r["snippet"]) \
            == (s, n, snip), r["doc_id"]


def test_highlight_skips_nonmatching_docs(spark, built):
    reader = IndexReader(spark, built)
    got = reader.highlight_local("zzznope", list(range(10)))
    assert len(got) == 0
