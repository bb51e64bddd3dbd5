"""more_like_this (ES MLT analogue) and match-set histogram / stats
aggregations: brute-force pandas oracles over the identical corpus on a
code-tokenized index (exercises the analyzer-stable candidate filter
that the simple-tokenized entry oracle can't)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.functions.tokenize import analyze_query, code_tokens
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs_pandas

N_DOCS = 300
CFG = IndexConfig(
    shard_size=128,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
)


@pytest.fixture(scope="module")
def corpus():
    return synth_docs_pandas(N_DOCS, seed=7).reset_index(names="doc_id")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("idx_mlt"))
    build_index(spark, spark.createDataFrame(corpus), out, CFG,
                id_col="doc_id")
    return out


@pytest.fixture(scope="module")
def token_lists(corpus):
    return list(code_tokens(corpus["content"]))


def _brute_select(token_lists, src, n_terms):
    """Mirror of the MLT selection rule: analyzer-stable candidates
    ranked (tf desc, df asc, term asc)."""
    tf: dict[str, int] = {}
    for t in token_lists[src]:
        tf[t] = tf.get(t, 0) + 1
    df: dict[str, int] = {}
    for toks in token_lists:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    cand = [t for t in tf if analyze_query(t) == [t]]
    cand.sort(key=lambda t: (-tf[t], df[t], t))
    return cand[:n_terms]


@pytest.mark.parametrize("src", [0, 21, 137])
def test_mlt_matches_explicit_query(spark, built, token_lists, src):
    reader = IndexReader(spark, built)
    sel = _brute_select(token_lists, src, 6)
    assert len(sel) == 6
    got = reader.more_like_this_local(src, k=10, max_query_terms=6)
    want = reader.search_local(" ".join(sel), k=11)
    want = want[want["doc_id"] != src].head(10).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())
    assert src not in set(got["doc_id"])


def test_mlt_excludes_compound_terms(spark, built, token_lists):
    """Compound originals (writer_user, parse58) never get selected even
    at a high term budget — their re-analysis would expand the query."""
    reader = IndexReader(spark, built)
    for src in (0, 21):
        sel = _brute_select(token_lists, src, 10_000)
        assert all(analyze_query(t) == [t] for t in sel)
        hits = reader.more_like_this_local(src, k=5,
                                           max_query_terms=10_000)
        assert len(hits) == 5


def _match_set(token_lists, terms):
    qs = set(terms)
    return {i for i, toks in enumerate(token_lists)
            if qs & set(toks)}


def test_histogram_matches_bruteforce(spark, built, corpus, token_lists):
    reader = IndexReader(spark, built)
    got = reader.search_histogram("user merge", F.length("content"), 50) \
        .toPandas().set_index("bucket")["n_docs"].to_dict()
    matched = _match_set(token_lists, reader.plan("user merge").terms)
    want: dict[float, int] = {}
    for i in matched:
        b = float(len(corpus["content"][i]) // 50 * 50)
        want[b] = want.get(b, 0) + 1
    assert got == want


def test_stats_matches_bruteforce(spark, built, corpus, token_lists):
    reader = IndexReader(spark, built)
    row = reader.search_stats("user merge", F.length("content")) \
        .collect()[0]
    matched = _match_set(token_lists, reader.plan("user merge").terms)
    lens = np.array([len(corpus["content"][i]) for i in sorted(matched)],
                    dtype=np.float64)
    assert row["n"] == lens.size
    assert row["min_v"] == lens.min() and row["max_v"] == lens.max()
    assert row["sum_v"] == round(float(lens.sum()), 4)


def test_mlt_missing_doc_is_empty(spark, built):
    reader = IndexReader(spark, built)
    assert len(reader.more_like_this_local(10_000_000)) == 0


def test_search_sorted_matches_bruteforce(spark, built, corpus, token_lists):
    reader = IndexReader(spark, built)
    got = reader.search_sorted("user merge", F.length("content"),
                               ascending=False, k=7).toPandas()
    matched = _match_set(token_lists, reader.plan("user merge").terms)
    want = sorted(((len(corpus["content"][i]), i) for i in matched),
                  key=lambda x: (-x[0], x[1]))[:7]
    assert [(int(r["sort_value"]), int(r["doc_id"]))
            for _, r in got.iterrows()] == want
    # plan shape: global sort+limit compiles to TakeOrderedAndProject
    plan = reader.search_sorted("user merge", F.length("content"), k=7) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_suggest_terms(spark, built, token_lists, corpus):
    reader = IndexReader(spark, built)
    got = reader.suggest_terms_local("usre merge zzzzzzzz", max_edits=2,
                                     per_term=3)
    # 'merge' is present -> no suggestions; 'zzzzzzzz' has no neighbors
    assert set(got["token"]) == {"usre"}
    df: dict[str, int] = {}
    for toks in token_lists:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    cands = sorted(
        (min(e for e in (1, 2) if _lev2(t, "usre") <= e), -d, t)
        for t, d in df.items() if _lev2(t, "usre") <= 2)
    want = [(t, dist, -negdf) for dist, negdf, t in cands[:3]]
    assert [(r["suggestion"], int(r["dist"]), int(r["df"]))
            for _, r in got.iterrows()] == want


def _lev2(a: str, b: str) -> int:
    import functools

    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                   d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))

    return d(len(a), len(b))


def test_composite_pages_tile_buckets(spark, built, corpus, token_lists):
    """ES composite-agg analogue: after-key pages tile the full
    (lang, repo) bucket list in ascending tuple order with exact
    counts; the ordered page compiles to TakeOrderedAndProject."""
    reader = IndexReader(spark, built)
    matched = _match_set(token_lists, reader.plan("user merge").terms)
    want: dict[tuple, int] = {}
    for i in matched:
        key = (corpus["lang"][i], corpus["repo"][i])
        want[key] = want.get(key, 0) + 1
    full = sorted(want.items())
    pages, after = [], None
    for _ in range(100):
        got = reader.search_composite("user merge", ("lang", "repo"),
                                      size=3, after=after).toPandas()
        if got.empty:
            break
        pages.extend(((r["lang"], r["repo"]), int(r["n_docs"]))
                     for _, r in got.iterrows())
        after = (got["lang"].iloc[-1], got["repo"].iloc[-1])
    assert pages == full
    plan = reader.search_composite("user merge", ("lang", "repo"),
                                   size=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_composite_validation(spark, built):
    reader = IndexReader(spark, built)
    with pytest.raises(ValueError):
        reader.search_composite("user", ())
    with pytest.raises(ValueError):
        reader.search_composite("user", ("lang", "repo"), after=("a",))


def test_range_agg_matches_bruteforce(spark, built, corpus, token_lists):
    """ES range-agg analogue: half-open [lo, hi), overlapping ranges
    each count the doc, empty ranges appear with n_docs=0, rows come
    back in (lo, hi) order."""
    reader = IndexReader(spark, built)
    ranges = (("a_short", None, 120), ("b_mid", 120, 300),
              ("wide", 100, 400), ("c_long", 300, None),
              ("empty", 99999, None))
    got = reader.search_range("user merge", F.length("content"),
                              ranges).toPandas()
    matched = _match_set(token_lists, reader.plan("user merge").terms)
    lens = [len(corpus["content"][i]) for i in matched]
    want = {lb: sum(1 for v in lens
                    if (lo is None or v >= lo) and (hi is None or v < hi))
            for (lb, lo, hi) in ranges}
    assert got.set_index("label")["n_docs"].to_dict() == want
    assert int(got.set_index("label")["n_docs"]["empty"]) == 0
    assert got["label"].tolist() == ["a_short", "wide", "b_mid",
                                     "c_long", "empty"]


def test_constant_score_matches_bruteforce(spark, built, token_lists):
    """ES constant_score analogue: every matching doc scores exactly
    boost; ranking is the doc_id tie-break alone."""
    reader = IndexReader(spark, built)
    got = reader.search_constant_score("user merge", boost=2.5,
                                       k=7).toPandas()
    matched = sorted(_match_set(token_lists,
                                reader.plan("user merge").terms))
    assert got["doc_id"].tolist() == matched[:7]
    assert (got["score"] == 2.5).all()


def test_term_vectors_matches_bruteforce(spark, built, corpus, token_lists):
    """ES _termvectors analogue: per-doc (term, tf) from re-analysis of
    the stored content, corpus df attached when with_stats."""
    reader = IndexReader(spark, built)
    targets = [0, 21, 137]
    got = reader.term_vectors_local(targets, with_stats=True)
    df_map: dict[str, int] = {}
    for toks in token_lists:
        for t in set(toks):
            df_map[t] = df_map.get(t, 0) + 1
    want = []
    for i in targets:
        tf: dict[str, int] = {}
        for t in token_lists[i]:
            tf[t] = tf.get(t, 0) + 1
        want.extend((i, t, c, df_map[t]) for t, c in sorted(tf.items()))
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_term_vectors_empty_and_missing(spark, built):
    reader = IndexReader(spark, built)
    got = reader.term_vectors_local([10_000_000])
    assert len(got) == 0 and list(got.columns) == ["doc_id", "term", "tf"]


def test_index_stats_matches_corpus(spark, built, corpus, token_lists):
    """ES _stats analogue: manifest per-shard integers equal the corpus
    recomputation (shard_size=128 here) — the cheap lineage gate."""
    reader = IndexReader(spark, built)
    got = reader.index_stats_local()
    want_n: dict[int, int] = {}
    want_dl: dict[int, int] = {}
    for i, toks in enumerate(token_lists):
        sh = i // 128
        want_n[sh] = want_n.get(sh, 0) + 1
        want_dl[sh] = want_dl.get(sh, 0) + len(toks)
    assert got["shard"].tolist() == sorted(want_n)
    assert got.set_index("shard")["n_docs"].to_dict() == want_n
    assert got.set_index("shard")["content_dl"].to_dict() == want_dl
    assert (got["n_terms"] > 0).all() and (got["posting_bytes"] > 0).all()


def test_analyze_api_position_convention(spark, built):
    """ES _analyze analogue under the CODE analyzer: whole-identifier
    tokens share their first subtoken's position slot (the prox-stream
    convention phrase matching relies on)."""
    reader = IndexReader(spark, built)
    got = reader.analyze_text_local("def getUserName(): pass")
    rows = [(int(r["pos"]), r["token"]) for _, r in got.iterrows()]
    assert rows == [(0, "def"), (1, "get"), (1, "getusername"),
                    (2, "user"), (3, "name"), (4, "pass")]
    assert len(reader.analyze_text_local("")) == 0
