"""Round-2 query-surface extensions, each checked against an independent
brute-force oracle on the same corpus:

  - require (bool filter context): hard ALL-terms predicate, scores
    untouched; spark/local parity
  - query_string: +must / -must_not / should parsing maps exactly onto
    the explicit search(query, require=, exclude=) call
  - search_collapse (ES collapse): per-field-value best hit, global
    top-k of group bests — exact vs full-ranking pandas groupby
  - search_cardinality: distinct docstore values over the match set
  - multi_match dis_max (best_fields + tie_breaker): exact vs per-field
    full rankings combined in pandas; spark/local parity; tie=1
    degenerates to the bool-should sum
  - rescore_phrase_local (ES rescore): window-bounded phrase proximity
    second pass vs a pandas recomputation
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.functions import bm25
from maestro_spark.functions.tokenize import (code_tokens, phrase_terms,
                                              subtoken_streams)
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import (IndexReader, _phrase_tf_tokens,
                                            parse_query_string,
                                            parse_simple_query_string)
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
REQ = "return"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_qs2"))
    docs = synth_docs(spark, N_DOCS, seed=42, partitions=7)
    build_index(spark, docs, out, CFG)
    return out


@pytest.fixture(scope="module")
def reader(spark, built):
    return IndexReader(spark, built)


@pytest.fixture(scope="module")
def docstore(spark, built):
    return (spark.read.parquet(built + "/docs")
            .select("doc_id", "repo", "lang", "content")
            .toPandas().sort_values("doc_id").reset_index(drop=True))


def _full(reader, q, **kw) -> pd.DataFrame:
    return reader.search_local(q, k=N_DOCS, **kw)


# ------------------------------------------------------------------ require

def test_require_semantics(reader):
    """require == intersection filter on doc_ids with scores untouched."""
    base = _full(reader, Q)
    req_ids = set(_full(reader, REQ)["doc_id"])
    assert req_ids and req_ids != set(base["doc_id"])
    got = _full(reader, Q, require=REQ)
    want = base[base["doc_id"].isin(req_ids)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_require_multi_term_is_conjunctive(reader):
    a = set(_full(reader, "return")["doc_id"])
    b = set(_full(reader, "import")["doc_id"])
    got = set(_full(reader, Q, require="return import")["doc_id"])
    want = set(_full(reader, Q)["doc_id"]) & a & b
    assert got == want


def test_require_spark_local_parity(spark, reader):
    loc = reader.search_local(Q, k=20, require=REQ, exclude="lambda")
    spk = reader.search(Q, k=20, require=REQ, exclude="lambda").toPandas()
    assert spk["doc_id"].tolist() == loc["doc_id"].tolist()
    np.testing.assert_array_equal(spk["score"].to_numpy(),
                                  loc["score"].to_numpy())


def test_require_count(reader):
    n = reader.count_local(Q, require=REQ)
    assert n == len(_full(reader, Q, require=REQ))


def test_require_any_semantics(reader):
    """require_any == union filter (ES terms filter), scores untouched;
    composes with require by intersection."""
    base = _full(reader, Q)
    a = set(_full(reader, "lambda")["doc_id"])
    b = set(_full(reader, "defer")["doc_id"])
    assert a and b and a != b
    got = _full(reader, Q, require_any="lambda defer")
    want = base[base["doc_id"].isin(a | b)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    both = _full(reader, Q, require="return", require_any="lambda defer")
    r = set(_full(reader, "return")["doc_id"])
    want2 = base[base["doc_id"].isin((a | b) & r)].reset_index(drop=True)
    pd.testing.assert_frame_equal(both, want2)
    n = reader.count_local(Q, require_any="lambda defer")
    assert n == len(got)


def test_require_any_spark_local_parity(reader):
    loc = reader.search_local(Q, k=15, require_any="lambda defer")
    spk = reader.search(Q, k=15, require_any="lambda defer").toPandas()
    assert spk["doc_id"].tolist() == loc["doc_id"].tolist()
    np.testing.assert_array_equal(spk["score"].to_numpy(),
                                  loc["score"].to_numpy())


def test_percentiles_exact(reader, docstore):
    matched = set(_full(reader, Q)["doc_id"])
    vals = (docstore[docstore["doc_id"].isin(matched)]["content"]
            .str.len().to_numpy(np.float64))
    got = reader.search_percentiles(Q, F.length("content"),
                                    (0.25, 0.5, 0.75)).collect()[0]
    for p, col in ((25, "p25"), (50, "p50"), (75, "p75")):
        want = round(float(np.percentile(vals, p)), 6)  # linear interp
        assert got[col] == pytest.approx(want, abs=1e-6), (p, got[col], want)


def test_percentiles_approx_runs(reader):
    row = reader.search_percentiles(Q, F.length("content"), (0.5,),
                                    exact=False).collect()[0]
    exact = reader.search_percentiles(Q, F.length("content"),
                                      (0.5,)).collect()[0]
    assert row["p50"] == pytest.approx(exact["p50"], rel=0.1)


# ------------------------------------------------------------- query_string

def test_parse_query_string():
    c = parse_query_string("merge stream +table -lang:java")
    assert c == {"query": "merge stream table",
                 "require": "table", "exclude": "lang:java"}
    with pytest.raises(ValueError):
        parse_query_string('find "a phrase" here')
    with pytest.raises(ValueError):
        parse_query_string("merge +wild*")
    with pytest.raises(ValueError):
        parse_query_string("merge -fuzzy~1")
    # /regex/ tokens are should-only too: '+/abc/' would regex-expand on
    # the should side but analyze as the literal 'abc' in filter context,
    # silently emptying the result set.
    with pytest.raises(ValueError):
        parse_query_string("merge +/ab.*/")
    with pytest.raises(ValueError):
        parse_query_string("merge -/ab.*/")
    # pure-negative query strings have no scoring clause — reject instead
    # of silently returning empty.
    with pytest.raises(ValueError):
        parse_query_string("-lang:java -stream")
    # short '-/' body is a literal term, not a regex delimiter pair
    assert parse_query_string("x +ab/cd")["require"] == "ab/cd"


def test_query_string_equals_explicit(reader):
    qs = "index query +return -lambda"
    got = reader.query_string(qs, k=25, engine="local")
    want = reader.search_local("index query return", k=25,
                               require="return", exclude="lambda")
    pd.testing.assert_frame_equal(got, want)
    spk = reader.query_string(qs, k=25).toPandas()
    assert spk["doc_id"].tolist() == want["doc_id"].tolist()


# ------------------------------------------------- simple_query_string / CNF

def test_parse_simple_query_string():
    c = parse_simple_query_string("merge stream|table -lang:java",
                                  default_operator="and")
    assert c == {"query": "merge stream table",
                 "exclude": "lang:java",
                 "groups": ["merge", "stream table"]}
    # OR operator: only +clauses become groups
    c = parse_simple_query_string("merge +stream|table x|y")
    assert c == {"query": "merge stream table x y",
                 "exclude": "", "groups": ["stream table"]}
    # negated alternation excludes the union
    c = parse_simple_query_string("merge -a|b")
    assert c["exclude"] == "a b"
    with pytest.raises(ValueError):
        parse_simple_query_string("merge wild*", default_operator="and")
    with pytest.raises(ValueError):
        parse_simple_query_string('a "phrase b"')
    with pytest.raises(ValueError):
        parse_simple_query_string("-a -b|c")
    with pytest.raises(ValueError):
        parse_simple_query_string("a b", default_operator="xor")


def test_require_groups_cnf_semantics(reader):
    """(a|b) AND (c) filter context: allowed set is the CNF intersection
    of per-group posting unions; scores of surviving docs untouched."""
    base = _full(reader, Q)
    a = set(_full(reader, "lambda")["doc_id"])
    b = set(_full(reader, "defer")["doc_id"])
    c = set(_full(reader, "return")["doc_id"])
    want_ids = (a | b) & c
    assert want_ids and want_ids != (a | b)
    got = _full(reader, Q, require_groups=["lambda defer", "return"])
    want = base[base["doc_id"].isin(want_ids)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # composes with require / require_any by intersection
    d = set(_full(reader, "import")["doc_id"])
    got2 = _full(reader, Q, require="import",
                 require_groups=["lambda defer", "return"])
    want2 = base[base["doc_id"].isin(want_ids & d)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want2)


def test_simple_query_string_and_operator(reader):
    """default_operator=and == explicit require_groups CNF call; spark and
    local paths rank-and-score identical."""
    qs = "index|query merge -lambda"
    loc = reader.simple_query_string(qs, k=25, default_operator="and",
                                     engine="local")
    want = reader.search_local("index query merge", k=25,
                               exclude="lambda",
                               require_groups=["index query", "merge"])
    pd.testing.assert_frame_equal(loc, want)
    spk = reader.simple_query_string(qs, k=25,
                                     default_operator="and").toPandas()
    assert spk["doc_id"].tolist() == loc["doc_id"].tolist()
    np.testing.assert_array_equal(spk["score"].to_numpy(),
                                  loc["score"].to_numpy())
    # every surviving doc satisfies every clause
    idx = set(_full(reader, "index")["doc_id"])
    qry = set(_full(reader, "query")["doc_id"])
    mrg = set(_full(reader, "merge")["doc_id"])
    lam = set(_full(reader, "lambda")["doc_id"])
    for did in loc["doc_id"]:
        assert (did in idx or did in qry) and did in mrg and did not in lam


def test_simple_query_string_or_equals_plain_search(reader):
    got = reader.simple_query_string("index query merge", k=20,
                                     engine="local")
    want = reader.search_local("index query merge", k=20)
    pd.testing.assert_frame_equal(got, want)


# ----------------------------------------------------------------- collapse

def test_collapse_exact(reader, docstore):
    """Per-repo best hit + top-k of bests == pandas groupby over the full
    scored ranking (same floats: both sides are score_shard_rows sums)."""
    full = _full(reader, Q, prune=False)
    merged = full.merge(docstore[["doc_id", "repo"]], on="doc_id")
    merged = merged.sort_values(["score", "doc_id"],
                                ascending=[False, True], kind="mergesort")
    want = (merged.drop_duplicates("repo").head(8)
            .rename(columns={"repo": "collapse_value"})
            [["collapse_value", "doc_id", "score"]].reset_index(drop=True))
    got = reader.search_collapse(Q, "repo", k=8).toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["collapse_value"].tolist() == want["collapse_value"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())


def test_collapse_distinct_groups(reader):
    got = reader.search_collapse(Q, "lang", k=10).toPandas()
    assert got["collapse_value"].is_unique
    assert (got["score"].to_numpy()[:-1] >= got["score"].to_numpy()[1:]).all()


# -------------------------------------------------------------- cardinality

def test_cardinality_exact(reader, docstore):
    matched = set(_full(reader, Q)["doc_id"])
    want = docstore[docstore["doc_id"].isin(matched)]["lang"].nunique()
    got = reader.search_cardinality(Q, "lang").collect()[0]["n_values"]
    assert got == want


def test_cardinality_approx_runs(reader):
    est = reader.search_cardinality(Q, "repo", exact=False,
                                    rsd=0.05).collect()[0]["n_values"]
    exact = reader.search_cardinality(Q, "repo").collect()[0]["n_values"]
    assert est == pytest.approx(exact, rel=0.25)


# ------------------------------------------------------- multi_match/dis_max

MM_TEXT = "index java"
MM_FIELDS = ("content", "lang")


def _dismax_brute(reader, tie: float, k: int) -> pd.DataFrame:
    c = _full(reader, MM_TEXT, prune=False)
    kw = _full(reader, "lang:index lang:java", prune=False)
    m = c.merge(kw, on="doc_id", how="outer", suffixes=("_c", "_k")).fillna(0.0)
    best = m[["score_c", "score_k"]].max(axis=1)
    total = m["score_c"] + m["score_k"]
    m["score"] = best + tie * (total - best)
    m = m.sort_values(["score", "doc_id"], ascending=[False, True],
                      kind="mergesort").head(k)
    return m[["doc_id", "score"]].reset_index(drop=True)


@pytest.mark.parametrize("tie", [0.0, 0.4])
def test_multi_match_exact(reader, tie):
    want = _dismax_brute(reader, tie, 12)
    got = reader.multi_match_local(MM_TEXT, MM_FIELDS, tie_breaker=tie, k=12)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), rtol=1e-12)


def test_multi_match_spark_local_parity(reader):
    loc = reader.multi_match_local(MM_TEXT, MM_FIELDS, tie_breaker=0.3, k=12)
    spk = reader.multi_match(MM_TEXT, MM_FIELDS, tie_breaker=0.3, k=12).toPandas()
    assert spk["doc_id"].tolist() == loc["doc_id"].tolist()
    np.testing.assert_array_equal(spk["score"].to_numpy(),
                                  loc["score"].to_numpy())


def test_multi_match_tie1_is_bool_sum(reader):
    """tie_breaker=1 == the plain bool should sum over both fields'
    terms (float addition order differs, so allclose not bit-equal)."""
    got = reader.multi_match_local(MM_TEXT, MM_FIELDS, tie_breaker=1.0, k=15)
    want = reader.search_local("index java lang:java", k=15, prune=False)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), rtol=1e-12)


# ------------------------------------------------------------ boosting query

def test_boosting_exact(reader):
    """Demotion scales each CONTRIBUTION by nb as it accumulates (the
    pruning-exact convention) — rebuild the sum per doc from single-term
    searches in canonical plan order and compare bit-identically."""
    neg_ids = set(_full(reader, "lambda")["doc_id"])
    assert neg_ids, "demotion set must be non-empty"
    plan_terms = reader.plan(Q).terms
    acc: dict[int, float] = {}
    for t in plan_terms:
        for _, r in _full(reader, t, prune=False).iterrows():
            d = int(r["doc_id"])
            c = float(r["score"])
            if d in neg_ids:
                c *= 0.4
            acc[d] = acc.get(d, 0.0) + c
    ids = np.fromiter(acc.keys(), np.int64, len(acc))
    scores = np.fromiter(acc.values(), np.float64, len(acc))
    order = np.lexsort((ids, -scores))[:20]
    got = reader.search_boosting(Q, "lambda", negative_boost=0.4, k=20,
                                 engine="local")
    assert got["doc_id"].tolist() == ids[order].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(), scores[order])


def test_boosting_prune_parity(reader):
    """MaxScore pruning under demotion is exact: prune on == prune off."""
    a = reader.search_boosting(Q, "lambda", negative_boost=0.3, k=15,
                               prune=True, engine="local")
    b = reader.search_boosting(Q, "lambda", negative_boost=0.3, k=15,
                               prune=False, engine="local")
    pd.testing.assert_frame_equal(a, b)


def test_boosting_spark_local_parity(reader):
    loc = reader.search_boosting(Q, "lambda", negative_boost=0.4, k=15,
                                 engine="local")
    spk = reader.search_boosting(Q, "lambda", negative_boost=0.4,
                                 k=15).toPandas()
    assert spk["doc_id"].tolist() == loc["doc_id"].tolist()
    np.testing.assert_array_equal(spk["score"].to_numpy(),
                                  loc["score"].to_numpy())


def test_boosting_validates(reader):
    with pytest.raises(ValueError):
        reader.search_boosting(Q, "lambda", negative_boost=1.5)


def test_boosting_nb1_is_plain_search(reader):
    got = reader.search_boosting(Q, "lambda", negative_boost=1.0, k=10,
                                 engine="local")
    want = _full(reader, Q).head(10).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------------------- boundary-tie top-k

def test_keyword_only_tiebreak_deterministic(reader, docstore):
    """Every lang:java doc scores bit-identically (single keyword term),
    so top-k is purely the doc_id tie-break — the argpartition-arbitrary
    subset regression guard. Spark path must agree."""
    java_ids = sorted(docstore[docstore["lang"] == "java"]["doc_id"])
    assert len(java_ids) > 5
    got = reader.search_local("lang:java", k=5)
    assert got["doc_id"].tolist() == java_ids[:5]
    assert got["score"].nunique() == 1
    spk = reader.search("lang:java", k=5).toPandas()
    assert spk["doc_id"].tolist() == java_ids[:5]


# ------------------------------------------------------------------ rescore

RS_Q = "index query"


def _rescore_brute(reader, docstore, window, k, qw, rw, slop):
    first = _full(reader, RS_Q).head(window).reset_index(drop=True)
    seq = phrase_terms(RS_Q, "code")
    sub = docstore[docstore["doc_id"].isin(set(first["doc_id"]))]
    # span tf over the pure subtoken stream (index position semantics:
    # whole-identifier tokens share their first subtoken's position and
    # never consume a slot); dl over the full code_tokens multiset.
    toks = {int(r["doc_id"]): list(code_tokens(pd.Series([r["content"]])).iat[0])
            for _, r in sub.iterrows()}
    strm = {int(r["doc_id"]):
            list(subtoken_streams(pd.Series([r["content"]])).iat[0])
            for _, r in sub.iterrows()}
    tf = {d: _phrase_tf_tokens(ts, seq, slop) for d, ts in strm.items()}
    dfw = sum(1 for v in tf.values() if v > 0)
    avgdl = float(reader.stats["fields"]["content"]["avgdl"])
    idf_w = float(bm25.idf(dfw, len(first))) if dfw else 0.0
    phr = {d: (idf_w * float(bm25.tfnorm(np.array([float(v)]),
                                         np.array([float(len(toks[d]))]),
                                         avgdl)[0])
               if v > 0 else 0.0)
           for d, v in tf.items()}
    out = first.assign(score=[qw * s + rw * phr[int(d)]
                              for d, s in zip(first["doc_id"], first["score"])])
    out = out.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True)


@pytest.mark.parametrize("slop,rw", [(0, 2.0), (2, 1.5)])
def test_rescore_exact(reader, docstore, slop, rw):
    want = _rescore_brute(reader, docstore, 40, 10, 1.0, rw, slop)
    got = reader.rescore_phrase_local(RS_Q, window=40, k=10,
                                      rescore_weight=rw, slop=slop)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), rtol=1e-12)


def test_rescore_weight_zero_is_first_pass(reader):
    got = reader.rescore_phrase_local(RS_Q, window=40, k=10,
                                      rescore_weight=0.0)
    want = _full(reader, RS_Q).head(10).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())


def test_rescore_stream_crosses_compound_boundary():
    """Regression: the rescore tf stream must mirror INDEX positions.
    'getUserRequest foo' indexes as subtokens get,user,request at
    positions 0,1,2 (whole form getuserrequest shares position 0) and
    foo at position 3 — phrase 'request foo' is adjacent (slop=0).
    code_tokens() interleaves the whole form into the list
    ([get,user,request,getuserrequest,foo]) which would report tf=0."""
    text = "getUserRequest foo"
    seq = phrase_terms("request foo", "code")
    stream = list(subtoken_streams(pd.Series([text])).iat[0])
    assert stream == ["get", "user", "request", "foo"]
    assert _phrase_tf_tokens(stream, seq, 0) == 1
    # the buggy stream (guards against regressing to code_tokens)
    ct = list(code_tokens(pd.Series([text])).iat[0])
    assert _phrase_tf_tokens(ct, seq, 0) == 0


def test_rescore_subset_of_window(reader):
    got = reader.rescore_phrase_local(RS_Q, window=25, k=25)
    window = set(_full(reader, RS_Q).head(25)["doc_id"])
    assert set(got["doc_id"]) <= window


def test_msearch_require_parity(reader):
    """msearch with bool filter clauses == per-query search with the
    same clauses, bit-identically, on both engines."""
    qs = {"a": Q, "b": "index merge"}
    kw = dict(require="return", require_any="lambda defer", exclude="none")
    many = reader.search_many_local(qs, k=8, **kw)
    for qid, q in qs.items():
        one = reader.search_local(q, k=8, **kw)
        part = many[many["qid"] == qid].reset_index(drop=True)
        assert part["doc_id"].tolist() == one["doc_id"].tolist()
        np.testing.assert_array_equal(part["score"].to_numpy(),
                                      one["score"].to_numpy())
    spk = reader.search_many(qs, k=8, **kw).toPandas()
    spk = spk.sort_values(["qid", "score", "doc_id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    many_s = many.sort_values(["qid", "score", "doc_id"],
                              ascending=[True, False, True]).reset_index(drop=True)
    assert spk["doc_id"].tolist() == many_s["doc_id"].tolist()


def test_explain_query_plan(reader):
    """_validate?explain analogue: canonical order (idf desc, term asc),
    df/idf consistent with the scorer's plan, boosts folded."""
    df = reader.explain_query(Q).toPandas()
    plan = reader.plan(Q)
    assert df["term"].tolist() == plan.terms
    assert (df["idf"].to_numpy()[:-1] >= df["idf"].to_numpy()[1:] - 1e-9).all()
    boosted = reader.explain_query(Q, boosts={"content": 2.0}).toPandas()
    m = df.merge(boosted, on="term", suffixes=("", "_b"))
    # both sides are rounded to 6 decimals before the compare
    np.testing.assert_allclose(m["idf_b"], 2.0 * m["idf"], atol=3e-6)


def test_top_hits_exact(reader, docstore):
    """top_hits == pandas groupby over the full ranking: top-3 hits of
    the best-5 repos, ranked by each repo's best hit."""
    full = _full(reader, Q, prune=False)
    m = full.merge(docstore[["doc_id", "repo"]], on="doc_id")
    m = m.sort_values(["score", "doc_id"], ascending=[False, True],
                      kind="mergesort")
    m["grp_rank"] = m.groupby("repo").cumcount() + 1
    best = (m[m["grp_rank"] == 1]
            .sort_values(["score", "doc_id"], ascending=[False, True],
                         kind="mergesort").head(5))
    keep = m[(m["repo"].isin(set(best["repo"]))) & (m["grp_rank"] <= 3)]
    order = {g: i for i, g in enumerate(best["repo"])}
    keep = keep.assign(_o=keep["repo"].map(order)).sort_values(
        ["_o", "grp_rank"], kind="mergesort")
    want = keep[["repo", "grp_rank", "doc_id", "score"]].reset_index(drop=True)
    got = reader.search_top_hits(Q, "repo", per_group=3,
                                 k_groups=5).toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["group_value"].tolist() == want["repo"].tolist()
    assert got["grp_rank"].tolist() == want["grp_rank"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())


def test_top_hits_collapse_consistency(reader):
    """per_group=1 top_hits == search_collapse (same bucket bests)."""
    th = reader.search_top_hits(Q, "lang", per_group=1,
                                k_groups=10).toPandas()
    cl = reader.search_collapse(Q, "lang", k=10).toPandas()
    assert th["doc_id"].tolist() == cl["doc_id"].tolist()
    np.testing.assert_array_equal(th["score"].to_numpy(),
                                  cl["score"].to_numpy())


def test_top_hits_skew(reader, docstore):
    """Hot-bucket skew (one bucket ≈ 50 % of all matches): results stay
    exact and the plan contains NO window over the match set — the
    per-bucket selection is a map-side bounded heap (mapInPandas) plus a
    grouped reduce over ≤ per_group rows per bucket per task, so the hot
    bucket never sorts inside a single task."""
    gcol = F.when(F.col("doc_id") % 2 == 0, F.lit("hot")) \
        .otherwise(F.col("repo"))
    rel = reader.search_top_hits(Q, gcol, per_group=3, k_groups=5)
    plan = rel._jdf.queryExecution().toString()
    assert "Window" not in plan, "top_hits must not window the match set"
    got = rel.toPandas()
    # pandas oracle under the same skewed bucket expression
    full = _full(reader, Q, prune=False)
    m = full.merge(docstore[["doc_id", "repo"]], on="doc_id")
    m["g"] = np.where(m["doc_id"] % 2 == 0, "hot", m["repo"])
    m = m.sort_values(["score", "doc_id"], ascending=[False, True],
                      kind="mergesort")
    m["grp_rank"] = m.groupby("g").cumcount() + 1
    best = (m[m["grp_rank"] == 1]
            .sort_values(["score", "doc_id"], ascending=[False, True],
                         kind="mergesort").head(5))
    assert (m[m["g"] == "hot"].shape[0] / len(m)) > 0.4  # genuinely hot
    keep = m[(m["g"].isin(set(best["g"]))) & (m["grp_rank"] <= 3)]
    order = {g: i for i, g in enumerate(best["g"])}
    keep = keep.assign(_o=keep["g"].map(order)).sort_values(
        ["_o", "grp_rank"], kind="mergesort")
    assert got["doc_id"].tolist() == keep["doc_id"].tolist()
    assert got["group_value"].tolist() == keep["g"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  keep["score"].to_numpy())


def test_sorted_pagination_tiles(reader):
    """sort + search_after pages are disjoint, ordered, and concatenate
    to the deep sorted top-k (both directions)."""
    for asc in (True, False):
        deep = reader.search_sorted(Q, F.length("content"), ascending=asc,
                                    k=30).toPandas()
        pages, after = [], None
        for _ in range(3):
            p = reader.search_sorted(Q, F.length("content"), ascending=asc,
                                     k=10, after=after).toPandas()
            if not len(p):
                break
            pages.append(p)
            after = (p["sort_value"].iloc[-1], int(p["doc_id"].iloc[-1]))
        got = pd.concat(pages, ignore_index=True)
        assert got["doc_id"].tolist() == deep["doc_id"].tolist(), asc
        np.testing.assert_array_equal(got["sort_value"].to_numpy(),
                                      deep["sort_value"].to_numpy())


def test_doc_values_range_filter(reader, spark):
    """Serving-path range filter: within_ids == post-filter of the full
    ranking; parity with the Spark doc_filter path."""
    ids = reader.doc_value_ids("doc_id", ge=50, le=250)
    assert (ids >= 50).all() and (ids <= 250).all() and len(ids) == 201
    got = reader.search_local(Q, k=20, within_ids=ids)
    base = _full(reader, Q)
    want = base[(base["doc_id"] >= 50) & (base["doc_id"] <= 250)] \
        .head(20).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    spk = reader.search(Q, k=20,
                        doc_filter=(F.col("doc_id") >= 50)
                        & (F.col("doc_id") <= 250)).toPandas()
    assert spk["doc_id"].tolist() == got["doc_id"].tolist()
    np.testing.assert_array_equal(spk["score"].to_numpy(),
                                  got["score"].to_numpy())


def test_doc_values_eq_filter(reader, docstore):
    ids = reader.doc_value_ids("lang", eq="java")
    want = sorted(docstore[docstore["lang"] == "java"]["doc_id"])
    assert ids.tolist() == want
    with pytest.raises(ValueError):
        reader.doc_value_ids("lang")


def test_doc_values_budget_routes_to_spark_path(reader):
    """Budget discipline (VERDICT r2 #2): an unselective filter must not
    materialize a corpus-sized id set in the serving process — the
    row-group-stats estimate trips the budget BEFORE any data page is
    read, and the raised error names the Spark doc_filter path, which
    produces the identical ranking."""
    # under budget: the whole corpus fits the default cap at test scale
    ids = reader.doc_value_ids("doc_id", ge=0, le=N_DOCS)
    assert len(ids) == N_DOCS
    # over budget: same filter, tiny cap -> raise with routing guidance
    with pytest.raises(ValueError, match="doc_filter"):
        reader.doc_value_ids("doc_id", ge=0, le=N_DOCS, budget=100)
    # a selective filter passes the same tiny cap (stats-pruned estimate)
    sel = reader.doc_value_ids("doc_id", ge=10, le=40, budget=400)
    assert sel.tolist() == list(range(10, 41))
    # and the documented corpus-scale alternative returns the same hits
    loc = reader.search_local(Q, k=10, within_ids=sel)
    spk = reader.search(Q, k=10, doc_filter=(F.col("doc_id") >= 10)
                        & (F.col("doc_id") <= 40)).toPandas()
    assert spk["doc_id"].tolist() == loc["doc_id"].tolist()
    np.testing.assert_array_equal(spk["score"].to_numpy(),
                                  loc["score"].to_numpy())
