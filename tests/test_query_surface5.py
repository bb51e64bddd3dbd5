"""Round-3 query-surface extensions (batch: bool_prefix / combined
fields / rank_eval / linear fusion), each checked against an
independent brute-force oracle:

  - search_bool_prefix (ES match_bool_prefix / search_as_you_type):
    scoring term clauses + constant-score prefix on the last token
  - combined_fields_local (ES combined_fields / Lucene
    CombinedFieldQuery): BM25 over query-time-merged per-field term
    and length statistics (union df*, summed tf*/dl*)
  - rank_eval (ES _rank_eval API): precision@k, recall@k, MRR, DCG,
    NDCG against graded judgements
  - linear_fuse (ES retriever.linear): weighted min-max-normalized
    score fusion, degenerate-range and absent-doc conventions
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.functions import bm25
from maestro_spark.functions.tokenize import code_tokens
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.operators.similarity import linear_fuse

N_DOCS = 300
CFG = IndexConfig(
    shard_size=128,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
    index_fields=("content", "lang"),
)


@pytest.fixture(scope="module")
def corpus():
    from maestro_spark.sources.corpus import synth_docs_pandas
    return synth_docs_pandas(N_DOCS, seed=29).reset_index(names="doc_id")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("idx_qs5"))
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


def _content_scores(toks, terms, avgdl):
    """Brute-force BM25 over content for a term set: {doc_id: score}."""
    n = len(toks)
    dfs = {t: sum(1 for ts in toks.values() if t in ts) for t in terms}
    out = {}
    for d, ts in toks.items():
        s = 0.0
        for t in terms:
            tf = ts.count(t)
            if tf == 0 or dfs[t] == 0:
                continue
            s += float(bm25.idf(dfs[t], n)) * float(
                bm25.tfnorm(np.array([float(tf)]),
                            np.array([float(len(ts))]), avgdl)[0])
        if s > 0:
            out[d] = s
    return out


def test_bool_prefix(reader, toks):
    got = reader.search_bool_prefix("merge str", k=10).toPandas()
    avgdl = float(reader.stats["fields"]["content"]["avgdl"])
    base = _content_scores(toks, ["merge"], avgdl)
    vocab = sorted({t for ts in toks.values() for t in ts
                    if t.startswith("str")})[:50]
    want = dict(base)
    for d, ts in toks.items():
        if set(ts) & set(vocab):
            want[d] = want.get(d, 0.0) + 1.0
    wdf = pd.DataFrame(
        {"doc_id": list(want), "score": [round(v, 6)
                                         for v in want.values()]})
    wdf = wdf.sort_values(["score", "doc_id"],
                          ascending=[False, True],
                          kind="mergesort").head(10)
    assert list(got["doc_id"]) == list(wdf["doc_id"])
    assert list(got["score"]) == list(wdf["score"])


def test_bool_prefix_prefix_only_doc_matches(reader, toks):
    # a doc containing only the prefix expansion (none of the leading
    # terms) must still match with exactly the constant score 1.0
    got = reader.search_bool_prefix("zzzznotaterm str", k=300).toPandas()
    assert not got.empty
    assert set(np.round(got["score"], 6)) == {1.0}


@pytest.mark.parametrize("w_lang", [1.0, 2.0])
def test_combined_fields(reader, corpus, toks, w_lang):
    text = "java merge"
    got = reader.combined_fields_local(
        text, fields=("content", "lang"),
        weights={"content": 1.0, "lang": w_lang}, k=300)
    langs = dict(zip(corpus["doc_id"], corpus["lang"]))
    n = len(corpus)
    avgdl_star = (float(reader.stats["fields"]["content"]["avgdl"])
                  + w_lang * float(reader.stats["fields"]["lang"]["avgdl"]))
    terms = sorted(set(text.split()))
    want = {}
    for t in terms:
        per = {}
        for d, ts in toks.items():
            tf = float(ts.count(t))
            if langs[d] == t:
                tf += w_lang
            if tf > 0:
                per[d] = tf
        idf_t = float(bm25.idf(len(per), n))
        for d, tf in per.items():
            dl_star = len(toks[d]) + w_lang * 1.0
            want[d] = want.get(d, 0.0) + idf_t * float(
                bm25.tfnorm(np.array([tf]), np.array([dl_star]),
                            avgdl_star)[0])
    gm = dict(zip(got["doc_id"], got["score"]))
    assert set(gm) == set(want)
    for d in want:
        assert gm[d] == pytest.approx(want[d], rel=1e-12)


def test_combined_fields_vs_content_only(reader, toks):
    # with a single field the pseudo-field degenerates to plain BM25
    got = reader.combined_fields_local("index merge",
                                       fields=("content",), k=300)
    avgdl = float(reader.stats["fields"]["content"]["avgdl"])
    want = _content_scores(toks, ["index", "merge"], avgdl)
    gm = dict(zip(got["doc_id"], got["score"]))
    assert set(gm) == set(want)
    for d in want:
        assert gm[d] == pytest.approx(want[d], rel=1e-12)


def _cross_fields_brute(toks, langs, terms, n, avgdl_c, avgdl_l,
                        tie, msm=1):
    df_c = {t: sum(1 for ts in toks.values() if t in ts) for t in terms}
    df_l = {t: sum(1 for v in langs.values() if v == t) for t in terms}
    want = {}
    for d, ts in toks.items():
        total, matched = 0.0, 0
        for t in terms:
            df_star = max(df_c[t], df_l[t])
            if df_star == 0:
                continue
            idf = float(bm25.idf(df_star, n))
            scores = []
            tf = float(ts.count(t))
            if tf:
                scores.append(idf * float(bm25.tfnorm(
                    np.array([tf]), np.array([float(len(ts))]),
                    avgdl_c)[0]))
            if langs[d] == t:
                scores.append(idf * float(bm25.tfnorm(
                    np.array([1.0]), np.array([1.0]), avgdl_l)[0]))
            if scores:
                total += max(scores) + tie * (sum(scores) - max(scores))
                matched += 1
        if matched >= msm:
            want[d] = total
    return want


@pytest.mark.parametrize("tie", [0.0, 0.3])
def test_cross_fields(reader, corpus, toks, tie):
    # 'java' is frequent as a lang keyword, rarer in content: the
    # blended df* = max(df_content, df_lang) is exercised both ways
    got = reader.cross_fields_local(
        "java merge", fields=("content", "lang"), tie_breaker=tie,
        k=300)
    langs = dict(zip(corpus["doc_id"], corpus["lang"]))
    want = _cross_fields_brute(
        toks, langs, ["java", "merge"], len(corpus),
        float(reader.stats["fields"]["content"]["avgdl"]),
        float(reader.stats["fields"]["lang"]["avgdl"]), tie)
    gm = dict(zip(got["doc_id"], got["score"]))
    assert set(gm) == set(want)
    for d in want:
        assert gm[d] == pytest.approx(want[d], rel=1e-12)


def test_cross_fields_blends_df(spark, tmp_path):
    # the signature cross_fields behavior: a term RARE in one field but
    # COMMON in another gets ONE blended idf = idf(max df). Planted:
    # 'ada' appears in 1 doc's content but is the lang of 8 of 10 docs,
    # so a doc matching ONLY in content must be scored with df*=8, not
    # df=1 — a content-only scorer disagrees by exactly the idf ratio.
    rows = []
    for i in range(10):
        lang = "ada" if i < 8 else "cobol"
        text = "ada merge table" if i == 9 else "merge stream table"
        rows.append((i, "r", f"f{i}", "c", lang, text))
    df = spark.createDataFrame(
        rows, "doc_id long, repo string, path string, commit string, "
              "lang string, content string")
    out = str(tmp_path / "xf_idx")
    build_index(spark, df, out,
                IndexConfig(tokenizer="simple",
                            index_fields=("content", "lang")),
                id_col="doc_id")
    r = IndexReader(spark, out)
    got = r.cross_fields_local("ada", fields=("content", "lang"), k=20)
    gm = dict(zip(got["doc_id"], got["score"]))
    assert 9 in gm                       # content-only match
    avgdl = float(r.stats["fields"]["content"]["avgdl"])
    plain = float(bm25.idf(1, 10)) * float(bm25.tfnorm(
        np.array([1.0]), np.array([3.0]), avgdl)[0])
    blended = float(bm25.idf(8, 10)) * float(bm25.tfnorm(
        np.array([1.0]), np.array([3.0]), avgdl)[0])
    assert gm[9] == pytest.approx(blended, rel=1e-12)
    assert gm[9] != pytest.approx(plain, rel=1e-9)


def test_cross_fields_msm_counts_terms(reader, corpus, toks):
    # minimum_should_match=2: each term must match SOMEWHERE (any
    # field) — the term-centric semantics cross_fields exists for
    langs = dict(zip(corpus["doc_id"], corpus["lang"]))
    got = reader.cross_fields_local(
        "java merge", fields=("content", "lang"),
        minimum_should_match=2, k=300)
    want = _cross_fields_brute(
        toks, langs, ["java", "merge"], len(corpus),
        float(reader.stats["fields"]["content"]["avgdl"]),
        float(reader.stats["fields"]["lang"]["avgdl"]), 0.0, msm=2)
    assert set(got["doc_id"]) == set(want)
    assert set(want)  # non-degenerate
    # and every matched doc has both terms somewhere
    for d in want:
        assert ("java" in toks[d] or langs[d] == "java")
        assert ("merge" in toks[d] or langs[d] == "merge")


def test_rank_eval(reader, toks):
    avgdl = float(reader.stats["fields"]["content"]["avgdl"])
    rated = {d: (2 if d % 7 == 0 else 1)
             for d in toks if d % 7 == 0 or d % 3 == 0}
    k = 10
    got = reader.rank_eval({"q": "index merge"}, {"q": rated}, k=k)
    r = got.iloc[0]
    sc = _content_scores(toks, ["index", "merge"], avgdl)
    top = sorted(sc, key=lambda d: (-round(sc[d], 6), d))[:k]
    rel = [rated.get(d, 0) for d in top]
    n_rel = sum(1 for x in rel if x >= 1)
    assert r["n_hits"] == len(top)
    assert r["precision_k"] == round(n_rel / len(top), 6)
    assert r["recall_k"] == round(n_rel / len(rated), 6)
    first = next((i for i, x in enumerate(rel, 1) if x >= 1), None)
    assert r["mrr"] == round(1.0 / first, 6) if first else r["mrr"] == 0.0
    dcg = sum((2.0 ** x - 1) / np.log2(i + 1)
              for i, x in enumerate(rel, 1))
    ideal = sorted(rated.values(), reverse=True)[:k]
    idcg = sum((2.0 ** x - 1) / np.log2(i + 1)
               for i, x in enumerate(ideal, 1))
    assert r["dcg"] == round(dcg, 6)
    assert r["ndcg"] == round(dcg / idcg, 6)


def test_rank_eval_no_relevant(reader):
    # a query whose top-k hits nothing rated: all metrics 0, no crash
    got = reader.rank_eval({"q": "index"}, {"q": {999999: 2}}, k=5)
    r = got.iloc[0]
    assert r["precision_k"] == 0.0 and r["mrr"] == 0.0
    assert r["dcg"] == 0.0 and r["ndcg"] == 0.0


def test_linear_fuse(spark):
    a = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], "doc_id long, score double")
    b = spark.createDataFrame(
        [(2, 0.9), (4, 0.4)], "doc_id long, score double")
    got = {r["doc_id"]: (r["lin_score"], r["n_retrievers"])
           for r in linear_fuse([a, b], weights=[0.6, 0.4],
                                k=10).collect()}
    # minmax within each list; absent docs contribute 0
    want = {
        1: (round(0.6 * 1.0, 6), 1),
        2: (round(0.6 * 0.5 + 0.4 * 1.0, 6), 2),
        3: (0.0, 1),
        4: (round(0.4 * 0.0, 6), 1),
    }
    assert got == want


def test_linear_fuse_degenerate_range(spark):
    # single-row retriever: max == min -> normalized 1.0
    a = spark.createDataFrame([(7, 3.3)], "doc_id long, score double")
    b = spark.createDataFrame(
        [(7, 1.0), (8, 2.0)], "doc_id long, score double")
    got = {r["doc_id"]: r["lin_score"]
           for r in linear_fuse([a, b], weights=[0.5, 0.5],
                                k=10).collect()}
    assert got[7] == round(0.5 * 1.0 + 0.5 * 0.0, 6)
    assert got[8] == round(0.5 * 1.0, 6)


def test_linear_fuse_weight_arity(spark):
    a = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    with pytest.raises(ValueError):
        linear_fuse([a], weights=[1.0, 2.0])
