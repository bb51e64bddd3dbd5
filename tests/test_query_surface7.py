"""Round-3 session-10 query-surface extensions, each checked against an
independent brute-force oracle:

  - search_variable_width_histogram (ES variable_width_histogram): the
    deterministic largest-gaps split rule over sorted distinct values
    (ES's streaming clustering is order-dependent; the pinned rule is
    reproducible), bucket payload (min, max, centroid, doc_count)
  - terms_enum_local (ES _terms_enum API): index-level term pagination
    from the termdict sidecar — prefix filter, case handling,
    search_after cursor, zero posting bytes
  - mterm_vectors_local (ES _mtermvectors): batched per-doc term
    vectors, one sidecar df pass for all requested docs
"""

import numpy as np
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
    return synth_docs_pandas(N_DOCS, seed=41).reset_index(names="doc_id")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("idx_qs7"))
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


# ----------------------------------- variable_width_histogram


def _vwh_oracle(values, nb):
    """Pure-python mirror of the deterministic largest-gaps rule."""
    vals = sorted(float(v) for v in values)
    dv = sorted(set(vals))
    gaps = [(dv[i] - dv[i - 1], dv[i]) for i in range(1, len(dv))]
    top = sorted(gaps, key=lambda g: (-g[0], g[1]))[: nb - 1]
    bounds = sorted(b for _, b in top)
    rows = {}
    for v in vals:
        b = sum(1 for x in bounds if x <= v)
        rows.setdefault(b, []).append(v)
    return {
        b: (min(vs), max(vs), round(sum(vs) / len(vs), 6), len(vs))
        for b, vs in rows.items()
    }


@pytest.mark.parametrize("nb", [1, 3, 5])
def test_variable_width_histogram(reader, corpus, toks, nb):
    got = reader.search_variable_width_histogram(
        Q, F.length("content"), target_buckets=nb).toPandas()
    matched = _match_set(reader, corpus, toks, Q)
    lens = [len(corpus["content"][i]) for i in sorted(matched)]
    want = _vwh_oracle(lens, nb)
    assert len(got) == len(want) <= nb
    for r in got.itertuples():
        mn, mx, c, n = want[r.bucket]
        assert (r.min_v, r.max_v, r.doc_count) == (mn, mx, n)
        assert abs(r.centroid - c) < 1e-6


def test_variable_width_buckets_partition_values(reader, corpus, toks):
    # buckets tile the value range: every matched value falls in exactly
    # one bucket and bucket [min, max] ranges never overlap
    got = (reader.search_variable_width_histogram(
               Q, F.length("content"), target_buckets=4)
           .toPandas().sort_values("bucket"))
    prev_max = -np.inf
    for r in got.itertuples():
        assert r.min_v > prev_max
        assert r.min_v <= r.max_v
        prev_max = r.max_v
    matched = _match_set(reader, corpus, toks, Q)
    assert int(got["doc_count"].sum()) == len(matched)


def test_variable_width_single_bucket_is_stats(reader, corpus, toks):
    got = reader.search_variable_width_histogram(
        Q, F.length("content"), target_buckets=1).toPandas()
    assert len(got) == 1 and got["bucket"][0] == 0
    matched = _match_set(reader, corpus, toks, Q)
    lens = [len(corpus["content"][i]) for i in matched]
    assert got["min_v"][0] == min(lens) and got["max_v"][0] == max(lens)
    assert got["doc_count"][0] == len(lens)


# ----------------------------------- terms_enum


def _all_content_terms(toks):
    out = set()
    for ts in toks.values():
        out |= set(ts)
    return sorted(out)


def test_terms_enum_pages_cover_dictionary(reader, toks):
    want = [t for t in _all_content_terms(toks) if t.startswith("m")]
    got, after = [], None
    while True:
        page = reader.terms_enum_local("m", size=7, search_after=after)
        if page.empty:
            break
        got.extend(page["term"])
        assert len(page) <= 7
        after = page["term"].iloc[-1]
    assert got == want


def test_terms_enum_case_handling(reader):
    ci = reader.terms_enum_local("ME", size=50, case_insensitive=True)
    cs = reader.terms_enum_local("ME", size=50, case_insensitive=False)
    lower = reader.terms_enum_local("me", size=50)
    assert list(ci["term"]) == list(lower["term"]) and len(ci) > 0
    assert cs.empty      # stored forms are lowercase, literal miss


def test_terms_enum_keyword_field_slice(reader, corpus):
    got = list(reader.terms_enum_local("", size=100, field="lang")["term"])
    want = sorted({str(v).lower() for v in corpus["lang"]})
    assert got == want
    # content enumeration never leaks field-prefixed keyword terms
    allc = reader.terms_enum_local("", size=100_000)["term"]
    assert not allc.str.contains(":", regex=False).any()


def test_terms_enum_matches_prefix_terms(reader):
    te = list(reader.terms_enum_local("in", size=100_000)["term"])
    pt = sorted(reader.prefix_terms("in").toPandas()["term"])
    pt = [t for t in pt if ":" not in t]
    assert te == pt
