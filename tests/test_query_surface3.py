"""Round-3 query-surface extensions, each checked against an independent
brute-force oracle on the same corpus:

  - search_extended_stats (ES extended_stats agg): population
    variance/stddev + sum_of_squares over the full match set
  - search_missing (ES missing agg): matched docs whose stored
    expression IS NULL
  - search_histogram_pipeline (ES pipeline aggs): cumulative_sum +
    derivative over histogram buckets
  - export_matches (ES scroll / PIT deep export): the full match set
    with stored columns, no ranking
  - suggest_phrase_local (ES phrase-suggester core): per-position
    did-you-mean with dictionary presence + best-correction ranking
  - unigram_logprob (textstats): corpus-MLE unigram LM score per doc
"""

import math
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.functions.tokenize import code_tokens
from maestro_spark.operators import textstats
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader

N_DOCS = 300
CFG = IndexConfig(
    shard_size=128,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
    stored_columns=("maybe",),
)
Q = "index merge query"


@pytest.fixture(scope="module")
def corpus():
    from maestro_spark.sources.corpus import synth_docs_pandas
    pdf = synth_docs_pandas(N_DOCS, seed=11).reset_index(names="doc_id")
    pdf["maybe"] = np.where(pdf["doc_id"] % 3 == 0, None, pdf["lang"])
    return pdf


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("idx_qs3"))
    build_index(spark, spark.createDataFrame(corpus), out, CFG,
                id_col="doc_id")
    return out


@pytest.fixture(scope="module")
def reader(spark, built):
    return IndexReader(spark, built)


@pytest.fixture(scope="module")
def token_lists(corpus):
    return list(code_tokens(corpus["content"]))


@pytest.fixture(scope="module")
def match_ids(token_lists):
    qt = set(Q.split())
    return {i for i, toks in enumerate(token_lists) if qt & set(toks)}


def test_extended_stats(reader, corpus, match_ids):
    got = reader.search_extended_stats(Q, F.length("content")).collect()[0]
    v = corpus[corpus["doc_id"].isin(match_ids)]["content"].str.len() \
        .to_numpy(dtype=np.float64)
    assert got["n"] == len(v)
    assert got["min_v"] == v.min() and got["max_v"] == v.max()
    assert got["sum_v"] == round(float(v.sum()), 4)
    assert abs(got["avg_v"] - v.mean()) < 1e-5
    assert abs(got["sum_sq"] - float((v * v).sum())) < 1e-3
    assert abs(got["var_pop"] - float(v.var())) < 1e-3
    assert abs(got["std_pop"] - float(v.std())) < 1e-5


def test_missing_agg(reader, corpus, match_ids):
    got = reader.search_missing(Q, F.col("maybe")).collect()[0]
    sub = corpus[corpus["doc_id"].isin(match_ids)]
    assert got["n_docs"] == len(sub)
    assert got["n_missing"] == int(sub["maybe"].isna().sum())
    assert 0 < got["n_missing"] < got["n_docs"]


def test_histogram_pipeline(reader, corpus, match_ids):
    interval = 100
    got = reader.search_histogram_pipeline(
        Q, F.length("content"), interval).toPandas()
    lens = corpus[corpus["doc_id"].isin(match_ids)]["content"].str.len()
    want = (lens // interval * interval).astype(float).value_counts() \
        .sort_index()
    assert got["bucket"].tolist() == want.index.tolist()
    assert got["n_docs"].tolist() == want.tolist()
    assert got["cum_docs"].tolist() == want.cumsum().tolist()
    deriv = want.diff().fillna(want.iloc[0] - 0).astype(int)
    # first bucket: lag default 0 -> deriv = n_docs
    deriv.iloc[0] = want.iloc[0]
    assert got["deriv"].tolist() == deriv.tolist()


def test_export_matches(reader, corpus, match_ids):
    got = reader.export_matches(Q, cols=("repo", "lang")).toPandas()
    assert set(got["doc_id"]) == match_ids
    assert len(got) == len(match_ids)
    sub = corpus.set_index("doc_id")
    for r in got.itertuples():
        assert r.repo == sub.at[r.doc_id, "repo"]
        assert r.lang == sub.at[r.doc_id, "lang"]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_phrase_suggest(reader, token_lists):
    """Per-position resolution vs a brute-force dictionary oracle."""
    df_map: dict[str, int] = {}
    for toks in token_lists:
        for t in set(toks):
            df_map[t] = df_map.get(t, 0) + 1
    query = "usre merge zzzzzzzz indx"
    got = reader.suggest_phrase_local(query, max_edits=2)
    toks = []
    for part in query.split():
        toks.extend(code_tokens(pd.Series([part])).iat[0])
    assert got["pos"].tolist() == list(range(len(toks)))
    assert got["token"].tolist() == toks
    for r in got.itertuples():
        tok = r.token
        if tok in df_map:
            assert (r.suggestion, r.dist, r.df) == (tok, 0, df_map[tok])
            continue
        cands = [(d, -df_map[t], t) for t in df_map
                 if (d := _lev(t, tok)) <= 2]
        if not cands:
            assert (r.suggestion, r.dist, r.df) == (tok, 0, 0)
        else:
            d, negdf, t = min(cands)
            assert (r.suggestion, r.dist, r.df) == (t, d, -negdf)
    # 'zzzzzzzz' has no neighbors within 2 edits -> kept with df 0
    zz = got[got["token"] == "zzzzzzzz"].iloc[0]
    assert zz["suggestion"] == "zzzzzzzz" and zz["df"] == 0


def test_unigram_logprob(spark, corpus):
    docs = spark.createDataFrame(
        corpus[["doc_id", "content"]].rename(columns={"content": "text"}))
    got = textstats.unigram_logprob(docs).toPandas() \
        .set_index("doc_id").sort_index()
    tok_lists = [re.findall(r"[a-z0-9]+", t.lower())
                 for t in corpus["content"]]
    ctf: dict[str, int] = {}
    for toks in tok_lists:
        for t in toks:
            ctf[t] = ctf.get(t, 0) + 1
    total = sum(ctf.values())
    for i, toks in enumerate(tok_lists):
        if not toks:
            continue
        want = sum(math.log(ctf[t]) for t in toks) / len(toks) \
            - math.log(total)
        assert got.at[i, "n_tokens"] == len(toks)
        assert abs(got.at[i, "avg_logprob"] - want) < 1e-5
    # every doc's score is <= 0 (probabilities < 1) and rare-token docs
    # score lower than the corpus mean only if they exist; sanity bound:
    assert (got["avg_logprob"] < 0).all()


def test_percentile_ranks(reader, corpus, match_ids):
    got = reader.search_percentile_ranks(
        Q, F.length("content"), (300, 600, 900)).collect()[0]
    v = corpus[corpus["doc_id"].isin(match_ids)]["content"].str.len() \
        .to_numpy(dtype=np.float64)
    for x in (300, 600, 900):
        want = round(float((v <= x).mean()) * 100.0, 6)
        assert abs(got[f"rank_{x}"] - want) < 1e-6
    # monotone non-decreasing in the threshold, bounded in [0, 100]
    assert 0.0 <= got["rank_300"] <= got["rank_600"] \
        <= got["rank_900"] <= 100.0


def test_weighted_avg(reader, corpus, match_ids):
    got = reader.search_weighted_avg(
        Q, F.length("content"),
        (F.col("doc_id") % 7 + 1).cast("double")).collect()[0]
    sub = corpus[corpus["doc_id"].isin(match_ids)]
    v = sub["content"].str.len().to_numpy(dtype=np.float64)
    w = (sub["doc_id"].to_numpy() % 7 + 1).astype(np.float64)
    assert abs(got["w_avg"] - float((v * w).sum() / w.sum())) < 1e-5
    assert got["sum_w"] == round(float(w.sum()), 4)


def test_adjacency_matrix(reader, token_lists):
    filters = {"idx": "index", "mq": "merge query", "st": "stream"}
    got = reader.adjacency_matrix_local(filters)
    sets = {name: {i for i, toks in enumerate(token_lists)
                   if set(q.split()) & set(toks)}
            for name, q in filters.items()}
    names = sorted(sets)
    want: dict[str, int] = {}
    for i, a in enumerate(names):
        if sets[a]:
            want[a] = len(sets[a])
        for b in names[i + 1:]:
            n = len(sets[a] & sets[b])
            if n:
                want[f"{a}&{b}"] = n
    assert dict(zip(got["key"], got["doc_count"])) == want
    assert got["key"].tolist() == sorted(want)  # deterministic key order
    # the agg must drop empty buckets like ES: a no-hit filter is absent
    got2 = reader.adjacency_matrix_local({"z": "qqqzzzqqq", **filters})
    assert "z" not in set(got2["key"])


def _scored(reader):
    return reader.scored_matches(Q).toPandas().set_index("doc_id")["score"]


def test_decay_score(reader, corpus):
    got = reader.search_decay_score(
        Q, F.length("content"), origin=400.0, scale=200.0, decay=0.5,
        fn="gauss", k=15).toPandas()
    base = _scored(reader)
    lens = corpus.set_index("doc_id")["content"].str.len()
    sig2 = -(200.0 ** 2) / (2.0 * math.log(0.5))
    want = {d: s * math.exp(-((lens[d] - 400.0) ** 2) / (2 * sig2))
            for d, s in base.items()}
    rank = sorted(want, key=lambda d: (-want[d], d))[:15]
    assert got["doc_id"].tolist() == rank
    for r in got.itertuples():
        assert abs(r.score - want[r.doc_id]) < 1e-9


def test_decay_linear_clamps_to_zero(reader, corpus):
    # a doc farther than scale/(1-decay) from origin scores exactly 0
    got = reader.search_decay_score(
        Q, F.length("content"), origin=0.0, scale=10.0, decay=0.5,
        fn="linear", k=10_000).toPandas()
    lens = corpus.set_index("doc_id")["content"].str.len()
    far = got[got["doc_id"].map(lens) >= 20.0]
    assert (far["score"] == 0.0).all()


def test_rank_feature(reader, corpus):
    got = reader.search_rank_feature(
        Q, F.length("content"), pivot=300.0, boost=1.5, k=15).toPandas()
    base = _scored(reader)
    lens = corpus.set_index("doc_id")["content"].str.len()
    want = {d: s + 1.5 * lens[d] / (lens[d] + 300.0)
            for d, s in base.items()}
    rank = sorted(want, key=lambda d: (-want[d], d))[:15]
    assert got["doc_id"].tolist() == rank


def test_terms_set(reader, token_lists):
    qterms = set(Q.split())
    got = reader.search_terms_set(
        Q, (F.col("doc_id") % 2 + 1), k=10_000).toPandas()
    want = {i for i, toks in enumerate(token_lists)
            if len(qterms & set(toks)) >= (i % 2 + 1)}
    assert set(got["doc_id"]) == want
    # per-doc threshold actually bites: some matched doc is excluded
    matched = {i for i, toks in enumerate(token_lists) if qterms & set(toks)}
    assert want < matched


def test_pinned(reader):
    pinned = [42, 7, 101]
    got = reader.search_pinned(Q, pinned, k=8).toPandas()
    assert got["pos"].tolist() == list(range(1, 9))
    assert got["doc_id"].head(3).tolist() == pinned  # order given, not sorted
    assert got["pinned"].head(3).all() and not got["pinned"].tail(5).any()
    organic = reader.search_pandas(Q, k=20)
    organic = organic[~organic["doc_id"].isin(pinned)]
    assert got["doc_id"].tail(5).tolist() == \
        organic["doc_id"].head(5).tolist()


def test_rare_terms(reader, corpus, match_ids):
    got = reader.search_rare_terms(Q, "repo", max_doc_count=3).toPandas()
    counts = corpus[corpus["doc_id"].isin(match_ids)]["repo"] \
        .value_counts()
    want = counts[counts <= 3].sort_index()
    assert dict(zip(got["value"], got["n_docs"])) == want.to_dict()
    assert (got["n_docs"].diff().fillna(0) >= 0).all()  # asc order


def test_histogram_movfn(reader, corpus, match_ids):
    got = reader.search_histogram_movfn(
        Q, F.length("content"), 50, window=2, lag=1, min_docs=2) \
        .toPandas()
    lens = corpus[corpus["doc_id"].isin(match_ids)]["content"].str.len()
    h = (lens // 50 * 50).astype(float).value_counts().sort_index()
    mov = h.rolling(2, min_periods=1).mean().round(6)
    sd = h.diff().fillna(h.iloc[0]).astype(int)
    sd.iloc[0] = h.iloc[0]  # lag default 0
    keep = h[h >= 2].index
    assert got["bucket"].tolist() == keep.tolist()
    assert got["n_docs"].tolist() == h[keep].tolist()
    assert got["mov_avg"].tolist() == mov[keep].tolist()
    assert got["sdiff"].tolist() == sd[keep].tolist()


def test_bucket_stats(reader, corpus, match_ids):
    got = reader.search_bucket_stats(
        Q, F.length("content"), 50).collect()[0]
    lens = corpus[corpus["doc_id"].isin(match_ids)]["content"].str.len()
    h = (lens // 50 * 50).astype(float).value_counts().sort_index()
    assert got["n_buckets"] == len(h)
    assert got["min_docs"] == h.min() and got["max_docs"] == h.max()
    assert abs(got["avg_docs"] - round(h.mean(), 6)) < 1e-9
    assert got["sum_docs"] == h.sum()
    # argmax key, lowest bucket on ties
    best = h[h == h.max()].index.min()
    assert got["max_bucket"] == best


def test_string_stats(reader, corpus, match_ids):
    got = reader.search_string_stats(Q, "repo").collect()[0]
    vals = corpus[corpus["doc_id"].isin(match_ids)]["repo"]
    assert got["n"] == len(vals)
    assert got["min_len"] == vals.str.len().min()
    assert got["max_len"] == vals.str.len().max()
    assert abs(got["avg_len"] - round(vals.str.len().mean(), 6)) < 1e-9
    from collections import Counter
    c = Counter("".join(vals))
    tot = sum(c.values())
    ent = -sum(n / tot * math.log2(n / tot) for n in c.values())
    assert abs(got["entropy"] - ent) < 1e-5


def _mt():
    return F.expr("timestamp'2025-01-01 00:00:00' + make_interval("
                  "0, 0, 0, 0, CAST(doc_id % 48 AS INT), 0, 0)")


def test_date_histogram(reader, match_ids):
    got = reader.search_date_histogram(Q, _mt(),
                                       interval="day").toPandas()
    from collections import Counter
    want = Counter(f"2025-01-0{(i % 48) // 24 + 1} 00:00:00"
                   for i in match_ids)
    assert dict(zip(got["bucket"], got["n_docs"])) == dict(want)
    assert got["bucket"].is_monotonic_increasing


def test_date_range(reader, match_ids):
    got = reader.search_date_range(
        Q, _mt(), [("d1", None, "2025-01-02"),
                 ("d2", "2025-01-02", None),
                 ("all", None, None)]).collect()[0]
    d1 = sum(1 for i in match_ids if (i % 48) < 24)
    assert got["d1"] == d1
    assert got["d2"] == len(match_ids) - d1
    assert got["all"] == len(match_ids)  # ranges may overlap (ES allows)


def test_geo_distance(reader, match_ids):
    lat = (F.col("doc_id") % 120).cast("double") - 60.0
    lon = (F.col("doc_id") % 340).cast("double") - 170.0
    got = reader.search_geo_distance(
        Q, lat, lon, 0.0, 0.0, 5000.0, k=10_000).toPandas()

    def hav(la, lo):
        p1 = math.radians(la)
        a = (math.sin((0.0 - p1) / 2) ** 2
             + math.cos(p1) * math.cos(0.0)
             * math.sin((0.0 - math.radians(lo)) / 2) ** 2)
        return 12742.0 * math.asin(math.sqrt(a))

    want = {i: round(hav(i % 120 - 60.0, i % 340 - 170.0), 4)
            for i in match_ids}
    want = {i: d for i, d in want.items() if d <= 5000.0}
    assert dict(zip(got["doc_id"], got["dist_km"])) == want
    assert got["dist_km"].is_monotonic_increasing
    # ring agg partitions the match set exactly once
    rings = reader.search_geo_rings(Q, lat, lon, 0.0, 0.0,
                                    [5000.0, 12000.0]).collect()[0]
    assert rings["ring_0_5000"] == len(want)
    assert (rings["ring_0_5000"] + rings["ring_5000_12000"]
            + rings["ring_12000_inf"]) == len(match_ids)


def test_distance_feature(reader):
    base = _scored(reader)
    got = reader.search_distance_feature(
        Q, (F.col("doc_id") % 100), origin=50.0, pivot=10.0,
        boost=3.0, k=15).toPandas()
    want = {d: s + 3.0 * 10.0 / (10.0 + abs(d % 100 - 50.0))
            for d, s in base.items()}
    rank = sorted(want, key=lambda d: (-want[d], d))[:15]
    assert got["doc_id"].tolist() == rank
    for r in got.itertuples():
        assert abs(r.score - want[r.doc_id]) < 1e-9


def test_boxplot(reader, corpus, match_ids):
    got = reader.search_boxplot(Q, F.length("content")).collect()[0]
    v = corpus[corpus["doc_id"].isin(match_ids)]["content"].str.len() \
        .to_numpy(dtype=np.float64)
    assert got["min_v"] == v.min() and got["max_v"] == v.max()
    for name, q in (("q1", 25), ("q2", 50), ("q3", 75)):
        want = round(float(np.percentile(v, q)), 6)  # linear interp
        assert abs(got[name] - want) < 1e-6
    assert got["min_v"] <= got["q1"] <= got["q2"] <= got["q3"] \
        <= got["max_v"]


def test_t_test(reader, corpus, token_lists):
    got = reader.search_t_test("index", "merge query",
                               F.length("content")).collect()[0]

    def pop(qs):
        qt = set(qs.split())
        ids = {i for i, t in enumerate(token_lists) if qt & set(t)}
        return corpus[corpus["doc_id"].isin(ids)]["content"].str.len() \
            .to_numpy(dtype=np.float64)

    a, b = pop("index"), pop("merge query")
    assert len(a) > 1 and len(b) > 1
    sa, sb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(sa + sb)
    df = (sa + sb) ** 2 / (sa ** 2 / (len(a) - 1) + sb ** 2 / (len(b) - 1))
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert abs(got["t_stat"] - round(t, 6)) < 1e-6
    assert abs(got["t_df"] - round(df, 4)) < 1e-4


def test_geo_bounding_box(reader, match_ids):
    lat = (F.col("doc_id") % 120).cast("double") - 60.0
    lon = (F.col("doc_id") % 340).cast("double") - 170.0
    got = reader.search_geo_bounding_box(
        Q, lat, lon, top=20.0, left=-40.0, bottom=-20.0, right=90.0,
        k=100_000).toPandas()
    want = sorted(i for i in match_ids
                  if -20.0 <= (i % 120 - 60.0) <= 20.0
                  and -40.0 <= (i % 340 - 170.0) <= 90.0)
    assert got["doc_id"].tolist() == want
    with pytest.raises(ValueError, match="dateline"):
        reader.search_geo_bounding_box(Q, lat, lon, 10.0, 50.0, -10.0,
                                       -50.0)
