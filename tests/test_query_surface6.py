"""Round-3 session-9 query-surface extensions, each checked against an
independent brute-force oracle:

  - multi_match mm_type="most_fields": per-field BM25 scores SUMMED
    (the bool-should rewrite ES applies) = the tie_breaker=1 point of
    the dis_max combine, inheriting its cross-field MaxScore pruning
  - search_script_score (ES script_score): the script REPLACES the
    relevance score over the FULL match set — a bottom-ranked doc can
    win, so a top-N rescore would be wrong
  - search_percentiles_bucket (ES percentiles_bucket pipeline):
    round(p/100 * (n-1)) nearest-rank selection over bucket doc counts
  - search_bucket_ks_test (ES ML bucket_count_ks_test): K-S D
    statistics vs uniform + asymptotic exp(-2*N*D^2) p-values
  - search_bucket_correlation (ES ML bucket_correlation): Pearson of
    per-bucket doc counts against the bucket key series
"""

import math

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
MM_TEXT = "index java"
MM_FIELDS = ("content", "lang")


@pytest.fixture(scope="module")
def corpus():
    from maestro_spark.sources.corpus import synth_docs_pandas
    return synth_docs_pandas(N_DOCS, seed=31).reset_index(names="doc_id")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("idx_qs6"))
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


def _full(reader, query: str) -> pd.DataFrame:
    """Full scored match set via the local path (k >> match set)."""
    return reader.search_local(query, k=10 * N_DOCS, prune=False)


# --------------------------------------------------- most_fields


def test_most_fields_is_tie1(reader):
    """mm_type='most_fields' is bit-identical to tie_breaker=1
    best_fields (same scorer, mapped combine)."""
    a = reader.multi_match_local(MM_TEXT, MM_FIELDS, k=15,
                                 mm_type="most_fields")
    b = reader.multi_match_local(MM_TEXT, MM_FIELDS, tie_breaker=1.0,
                                 k=15)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy())


def test_most_fields_is_bool_sum(reader):
    """most_fields == the plain bool-should sum over both fields' terms
    (float addition order differs, so allclose not bit-equal)."""
    got = reader.multi_match_local(MM_TEXT, MM_FIELDS, k=15,
                                   mm_type="most_fields")
    want = reader.search_local("index java lang:java", k=15, prune=False)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), rtol=1e-12)


def test_most_fields_prune_parity(reader):
    a = reader.multi_match_local(MM_TEXT, MM_FIELDS, k=12,
                                 mm_type="most_fields", prune=True)
    b = reader.multi_match_local(MM_TEXT, MM_FIELDS, k=12,
                                 mm_type="most_fields", prune=False)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy())


def test_most_fields_spark_local_parity(reader):
    loc = reader.multi_match_local(MM_TEXT, MM_FIELDS, k=12,
                                   mm_type="most_fields")
    spk = reader.multi_match(MM_TEXT, MM_FIELDS, k=12,
                             mm_type="most_fields").toPandas()
    assert spk["doc_id"].tolist() == loc["doc_id"].tolist()
    np.testing.assert_array_equal(spk["score"].to_numpy(),
                                  loc["score"].to_numpy())


def test_mm_type_invalid(reader):
    with pytest.raises(ValueError, match="mm_type"):
        reader.multi_match_local(MM_TEXT, MM_FIELDS, mm_type="phrase")


# --------------------------------------------------- script_score


def test_script_score_replaces_score(reader):
    """A score-REVERSING script: the winners are the lowest positive
    BM25 scorers — provably not a top-N rescore of the BM25 page."""
    full = _full(reader, Q)
    assert len(full) > 20
    want = full.copy()
    want["score"] = 10.0 - want["score"]
    want = want.sort_values(["score", "doc_id"],
                            ascending=[False, True],
                            kind="mergesort").head(10)
    got = reader.search_script_score(
        Q, F.lit(10.0) - F.col("_score"), k=10).toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), rtol=1e-12)


def test_script_score_doc_cols(reader, corpus):
    """Script over _score AND a docstore column (length-debiased)."""
    lens = dict(zip(corpus["doc_id"].astype(int),
                    corpus["content"].str.len()))
    full = _full(reader, Q)
    want = full.copy()
    want["score"] = [s / (1.0 + math.log1p(lens[int(d)]))
                     for d, s in zip(want["doc_id"], want["score"])]
    want = want.sort_values(["score", "doc_id"],
                            ascending=[False, True],
                            kind="mergesort").head(10)
    got = reader.search_script_score(
        Q, F.col("_score") / (F.lit(1.0) + F.log1p(F.length("content"))),
        k=10, cols=("content",)).toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), rtol=1e-12)


def test_script_score_min_score_underfills(reader):
    base = reader.search_script_score(
        Q, F.col("_score"), k=10).toPandas()
    cut = float(base["score"].iloc[2])
    got = reader.search_script_score(
        Q, F.col("_score"), k=10, min_score=cut).toPandas()
    assert len(got) == 3
    assert (got["score"] >= cut).all()


# --------------------------------------------------- bucket pipelines


def _hist(reader, toks, corpus, query: str, interval: float) -> pd.Series:
    """Pandas histogram oracle: per-bucket doc counts over the match
    set, bucket = floor(len(content)/interval)*interval, key-sorted."""
    terms = set(reader.plan(query).terms)
    lens = dict(zip(corpus["doc_id"].astype(int),
                    corpus["content"].str.len()))
    buckets: dict[float, int] = {}
    for d, ts in toks.items():
        if terms & set(ts):
            b = math.floor(lens[d] / interval) * interval
            buckets[b] = buckets.get(b, 0) + 1
    return pd.Series(buckets).sort_index()


def test_percentiles_bucket(reader, toks, corpus):
    h = _hist(reader, toks, corpus, Q, 50.0)
    v = np.sort(h.to_numpy())
    n = v.size
    got = reader.search_percentiles_bucket(
        Q, F.length("content"), 50.0,
        percents=(25.0, 50.0, 90.0)).toPandas().iloc[0]
    assert int(got["n_buckets"]) == n
    for p, key in ((25.0, "p25"), (50.0, "p50"), (90.0, "p90")):
        idx = int(math.floor(p / 100.0 * (n - 1) + 0.5))
        assert int(got[key]) == int(v[idx]), key


def test_bucket_ks_test(reader, toks, corpus):
    h = _hist(reader, toks, corpus, Q, 50.0)
    cnt = h.to_numpy(dtype=np.float64)
    tot, nb = cnt.sum(), cnt.size
    ecdf_a = np.cumsum(cnt) / tot
    ecdf_e = np.arange(1, nb + 1, dtype=np.float64) / nb
    d_less = round(float(np.max(ecdf_e - ecdf_a)), 6)
    d_greater = round(float(np.max(ecdf_a - ecdf_e)), 6)
    d_two = round(float(np.max(np.abs(ecdf_a - ecdf_e))), 6)
    got = reader.search_bucket_ks_test(
        Q, F.length("content"), 50.0).toPandas().iloc[0]
    assert int(got["n_buckets"]) == nb
    assert int(got["total_docs"]) == int(tot)
    assert float(got["d_less"]) == d_less
    assert float(got["d_greater"]) == d_greater
    assert float(got["d_two_sided"]) == d_two
    assert float(got["p_less"]) == round(
        math.exp(-2.0 * tot * d_less * d_less), 6)
    assert float(got["p_two_sided"]) == round(
        min(1.0, 2.0 * math.exp(-2.0 * tot * d_two * d_two)), 6)


def test_bucket_ks_test_fractions(reader, toks, corpus):
    """Explicit expected fractions (positional over key-sorted buckets):
    putting all expected mass on the FIRST bucket maximizes d_less."""
    h = _hist(reader, toks, corpus, Q, 50.0)
    nb = h.size
    fr = [1.0] + [0.0] * (nb - 1)
    cnt = h.to_numpy(dtype=np.float64)
    tot = cnt.sum()
    ecdf_a = np.cumsum(cnt) / tot
    d_less = round(float(np.max(1.0 - ecdf_a)), 6)
    got = reader.search_bucket_ks_test(
        Q, F.length("content"), 50.0, fractions=fr).toPandas().iloc[0]
    assert float(got["d_less"]) == d_less


def test_bucket_correlation(reader, toks, corpus):
    h = _hist(reader, toks, corpus, Q, 50.0)
    want = round(float(np.corrcoef(h.to_numpy(dtype=np.float64),
                                   h.index.to_numpy(np.float64))[0, 1]), 6)
    got = reader.search_bucket_correlation(
        Q, F.length("content"), 50.0).toPandas().iloc[0]
    assert int(got["n_buckets"]) == h.size
    assert abs(float(got["correlation"]) - want) <= 1e-6


# --------------------------------------------------- sparse_vector


SV_W = {"index": 2.0, "merge": 1.0, "slow": 0.25}


def test_sparse_vector_dot_product(reader, toks):
    want = {}
    for d, ts in toks.items():
        s = sum(w * ts.count(t) for t, w in SV_W.items())
        if s > 0:
            want[d] = s
    wdf = (pd.DataFrame({"doc_id": list(want), "score": list(want.values())})
           .sort_values(["score", "doc_id"], ascending=[False, True],
                        kind="mergesort").head(10))
    got = reader.search_sparse_vector(SV_W, k=10).toPandas()
    assert got["doc_id"].tolist() == wdf["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               wdf["score"].to_numpy(), rtol=1e-12)


def test_sparse_vector_local_parity(reader):
    loc = reader.search_sparse_vector(SV_W, k=10, engine="local")
    spk = reader.search_sparse_vector(SV_W, k=10).toPandas()
    assert spk["doc_id"].tolist() == loc["doc_id"].tolist()
    np.testing.assert_array_equal(spk["score"].to_numpy(),
                                  loc["score"].to_numpy())


def test_sparse_vector_prune_below(reader, toks):
    """prune_below drops the low-weight token BEFORE the scan: result
    equals querying without it."""
    a = reader.search_sparse_vector(SV_W, k=10, prune_below=0.5,
                                    engine="local")
    b = reader.search_sparse_vector({"index": 2.0, "merge": 1.0}, k=10,
                                    engine="local")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy())


def test_sparse_vector_negative_weight_rejected(reader):
    with pytest.raises(ValueError, match="non-negative"):
        reader.search_sparse_vector({"index": -1.0}, engine="local")


# --------------------------------------------------- significant_text


SIG_BOILER = "alpha beta gamma delta epsilon zeta"
SIG_DOCS = [
    f"{SIG_BOILER} uniqzero customer",       # d0: boilerplate + customer
    f"{SIG_BOILER} uniqone customer",        # d1: SAME boilerplate
    "customer uniqtwo hello world",          # d2: fg, no boilerplate
    "alpha hello things",                    # d3: bg only
    "beta world other",                      # d4
    "gamma words here",                      # d5
    "plain filler text",                     # d6
    "more filler words",                     # d7
]


@pytest.fixture(scope="module")
def sig_reader(spark, tmp_path_factory):
    pdf = pd.DataFrame({
        "doc_id": range(len(SIG_DOCS)),
        "repo": "r", "path": [str(i) for i in range(len(SIG_DOCS))],
        "commit": "c0", "lang": "text", "content": SIG_DOCS,
    })
    out = str(tmp_path_factory.mktemp("idx_sigtext"))
    build_index(spark, spark.createDataFrame(pdf), out, CFG,
                id_col="doc_id")
    return IndexReader(spark, out)


def _sig_text_oracle(dedup: bool, size: int = 20) -> pd.DataFrame:
    """Pure-python mirror of the significant_text rule over SIG_DOCS."""
    toks = [d.split() for d in SIG_DOCS]
    fg_ids = [i for i, ts in enumerate(toks) if "customer" in ts]
    kept: dict[int, list[str]] = {}
    seen: dict[str, tuple] = {}
    covered: dict[int, set] = {i: set() for i in fg_ids}
    if dedup:
        for d in fg_ids:
            ts = toks[d]
            for s in range(len(ts) - 5):
                gram = " ".join(ts[s:s + 6])
                if gram in seen:
                    covered[d].update(range(s, s + 6))
                else:
                    seen[gram] = (d, s)
    for d in fg_ids:
        kept[d] = [t for p, t in enumerate(toks[d])
                   if p not in covered[d]]
    fg_n, bg_n = float(len(fg_ids)), float(len(toks))
    fg_df: dict[str, int] = {}
    for d in fg_ids:
        for t in set(kept[d]):
            fg_df[t] = fg_df.get(t, 0) + 1
    bg_df = {t: sum(1 for ts in toks if t in ts)
             for t in fg_df}
    rows = []
    for t, f in fg_df.items():
        if t == "customer":
            continue
        fp, bp = f / fg_n, bg_df[t] / bg_n
        if fp > bp:
            rows.append((t, f, bg_df[t], round((fp - bp) * fp / bp, 6)))
    out = pd.DataFrame(rows, columns=["term", "fg_df", "bg_df", "score"])
    return (out.sort_values(["score", "term"], ascending=[False, True],
                            kind="mergesort").head(size)
            .reset_index(drop=True))


@pytest.mark.parametrize("dedup", [True, False])
def test_significant_text(sig_reader, dedup):
    got = sig_reader.significant_text(
        "customer", size=20, filter_duplicate_text=dedup).toPandas()
    want = _sig_text_oracle(dedup)
    assert got["term"].tolist() == want["term"].tolist()
    assert got["fg_df"].tolist() == want["fg_df"].tolist()
    assert got["bg_df"].tolist() == want["bg_df"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), atol=1e-6)


def test_significant_text_dedup_suppresses_boilerplate(sig_reader):
    """The copy-pasted 6-gram counts once: fg_df(alpha) drops 2 -> 1."""
    on = sig_reader.significant_text(
        "customer", size=20, filter_duplicate_text=True).toPandas()
    off = sig_reader.significant_text(
        "customer", size=20, filter_duplicate_text=False).toPandas()
    f_on = dict(zip(on["term"], on["fg_df"]))
    f_off = dict(zip(off["term"], off["fg_df"]))
    assert f_off.get("alpha", 0) == 2
    # alpha survives in d0 (first occurrence) only
    assert f_on.get("alpha", 0) <= 1


def test_bucket_ks_test_short_fractions_raises(reader):
    """NO silent cap: fewer fractions than buckets fails the job
    instead of dropping tail buckets from the test."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="fewer entries"):
        reader.search_bucket_ks_test(
            Q, F.length("content"), 50.0, fractions=[1.0]).collect()
