"""Curation operators: deterministic sampling (stable across runs and
partitionings), greedy token-budget capping, exact quantiles."""

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators import curation


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_stratified_sample_deterministic_and_proportional(spark, docs):
    mix = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    a = curation.stratified_sample(docs, mix).select("doc_id").toPandas()
    # identical under a different partitioning (no RNG/partition coupling)
    b = curation.stratified_sample(docs.repartition(13), mix) \
        .select("doc_id").toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    kept = docs.sparkSession.createDataFrame(a).join(docs, "doc_id")
    per = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n0 = docs.where(F.col("source") == "src0").count()
    assert per.get("src0") == n0          # fraction 1.0 keeps all
    assert "src2" not in per              # fraction 0.0 drops all
    assert "src3" not in per              # absent stratum drops all
    # fraction 0.5 keeps roughly half (16-bit uniform; loose bound)
    assert 0.2 * n0 <= per.get("src1", 0) <= 0.8 * n0


def test_token_budget_cap_greedy_prefix(spark, docs):
    out = curation.token_budget_cap(docs, 10_000).toPandas()
    assert (out["cum_tokens"] <= 10_000).all()
    for src, grp in out.groupby("source"):
        grp = grp.sort_values("cum_tokens")
        # running sum consistent with members' own sizes
        sizes = docs.where(F.col("source") == src).toPandas() \
            .set_index("doc_id")["n_chars"]
        assert grp["cum_tokens"].iloc[-1] == sum(sizes[i] for i in grp["doc_id"])
        # greedy: the kept set is the largest-first prefix — every kept
        # doc is >= every dropped doc (ties broken by id)
        dropped = set(sizes.index) - set(grp["doc_id"])
        if dropped:
            worst_kept = min((sizes[i], -i) for i in grp["doc_id"])
            best_drop = max((sizes[i], -i) for i in dropped)
            assert best_drop <= worst_kept


def test_column_quantiles_exact(spark, docs):
    out = curation.column_quantiles(docs, "n_chars", "lang", (0.0, 0.5, 1.0))
    pdf = out.toPandas()
    import numpy as np
    ref = docs.select("lang", "n_chars").toPandas()
    for lang, grp in ref.groupby("lang"):
        vals = np.sort(grp["n_chars"].to_numpy())
        got = pdf[pdf["stratum"] == lang].set_index("q")["value"]
        assert got[0.0] == vals.min()
        assert got[1.0] == vals.max()
        assert got[0.5] == round(float(np.percentile(vals, 50)), 6)


def test_pack_sequences_greedy(spark, docs):
    """Greedy packing brute force: sequential by id within each
    stratum, never split, reset when the budget would be exceeded."""
    budget = 900
    got = curation.pack_sequences(docs, budget, "n_chars", "source",
                                  "doc_id").toPandas()
    pdf = docs.select("source", "doc_id", "n_chars").toPandas()
    want = {}
    for src, grp in pdf.groupby("source"):
        grp = grp.sort_values("doc_id")
        pid = fill = 0
        first = True
        for _, r in grp.iterrows():
            t = int(r["n_chars"])
            if not first and fill + t > budget:
                pid += 1
                fill = 0
            fill += t
            first = False
            want[(src, int(r["doc_id"]))] = (pid, fill)
    gotmap = {(r["source"], int(r["doc_id"])):
              (int(r["pack_id"]), int(r["pack_fill"]))
              for _, r in got.iterrows()}
    assert gotmap == want
    # every pack within budget unless it is a single oversize doc
    per = got.groupby(["source", "pack_id"])
    for (_, _), g in per:
        assert int(g["pack_fill"].max()) <= budget or len(g) == 1


def test_pack_sequences_oversize_doc_own_pack(spark):
    import pandas as pd
    pdf = pd.DataFrame({
        "source": ["s"] * 5,
        "doc_id": [1, 2, 3, 4, 5],
        "n_chars": [50, 500, 30, 40, 60],
    })
    got = (curation.pack_sequences(spark.createDataFrame(pdf), 100,
                                   "n_chars", "source", "doc_id")
           .toPandas().sort_values("doc_id"))
    assert got["pack_id"].tolist() == [0, 1, 2, 2, 3]
    assert got["pack_fill"].tolist() == [50, 500, 30, 70, 60]
    with pytest.raises(ValueError):
        curation.pack_sequences(spark.createDataFrame(pdf), 0)


def test_dsir_weights_vs_bruteforce(spark, docs):
    import hashlib
    import math
    import re

    from collections import Counter

    B = 64
    target = docs.where(F.col("doc_id") % 7 == 0)
    got = curation.dsir_weights(docs, target, n_buckets=B) \
        .toPandas().set_index("doc_id").sort_index()

    pdf = docs.select("doc_id", "text").toPandas()

    def buckets(text):
        return [int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % B
                for t in re.findall(r"[a-z0-9]+", text.lower())]

    bg = Counter()
    tg = Counter()
    per_doc = {}
    for r in pdf.itertuples():
        bs = buckets(r.text)
        per_doc[r.doc_id] = bs
        bg.update(bs)
        if r.doc_id % 7 == 0:
            tg.update(bs)
    bg_tot, tg_tot = sum(bg.values()), sum(tg.values())
    w = {b: math.log((tg.get(b, 0) + 1.0) / (tg_tot + B))
         - math.log((bg[b] + 1.0) / (bg_tot + B)) for b in bg}
    for doc_id, bs in per_doc.items():
        if not bs:
            assert doc_id not in got.index
            continue
        assert got.at[doc_id, "n_tokens"] == len(bs)
        assert abs(got.at[doc_id, "logratio"]
                   - round(sum(w[b] for b in bs), 6)) < 1e-5
    # target-slice docs score higher on average than the background
    t_mean = got.loc[[i for i in got.index if i % 7 == 0], "logratio"].mean()
    b_mean = got.loc[[i for i in got.index if i % 7 != 0], "logratio"].mean()
    assert t_mean > b_mean


def test_dsir_weight_join_is_broadcast(spark, docs):
    target = docs.where(F.col("doc_id") % 7 == 0)
    plan = curation.dsir_weights(docs, target, n_buckets=64) \
        ._jdf.queryExecution().executedPlan().toString()
    # the bucket-keyed weight join must broadcast (n_buckets rows), never
    # shuffle the corpus token stream on the bucket key
    assert "BroadcastHashJoin" in plan


def test_mix_sources_rates_and_determinism(spark, docs):
    import hashlib
    out = curation.mix_sources(docs, {"src0": 3.0, "src1": 1.0},
                               total_docs=40).toPandas()
    # unlisted sources drop
    assert set(out["source"]) <= {"src0", "src1"}
    # identical under a different partitioning
    out2 = curation.mix_sources(docs.repartition(7),
                                {"src0": 3.0, "src1": 1.0},
                                total_docs=40).toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # brute-force membership: u(doc) < min(1, total*w/n)
    pdf = docs.select("doc_id", "source").toPandas()
    n = pdf.groupby("source").size()
    for s, w in (("src0", 0.75), ("src1", 0.25)):
        rate = min(1.0, 40 * w / n[s])
        ids = pdf.loc[pdf["source"] == s, "doc_id"]
        want = {int(d) for d in ids if int(hashlib.md5(
            f"mix{d}".encode()).hexdigest()[:4], 16) / 65536.0 < rate}
        got = set(out.loc[out["source"] == s, "doc_id"])
        assert got == want
        got_rate = set(out.loc[out["source"] == s, "mix_rate"])
        assert got_rate == {round(rate, 6)}


def test_mix_sources_undersupplied_caps_at_one(spark, docs):
    # demand far above supply: rate caps at 1.0 and every doc survives
    out = curation.mix_sources(docs, {"src0": 1.0},
                               total_docs=10**9).toPandas()
    n0 = docs.where(F.col("source") == "src0").count()
    assert len(out) == n0 and set(out["mix_rate"]) == {1.0}


# --------------------------------------------- frequent_item_sets

def _brute_fis(texts, min_support, top):
    import itertools, math, re
    sets = [sorted(set(re.findall(r"[a-z0-9]+", t.lower())))
            for t in texts]
    n = len(texts)
    thr = math.ceil(min_support * n)
    cnt = {}
    for ts in sets:
        for a, b in itertools.combinations(ts, 2):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    rows = [(a, b, c, round(c / n, 6))
            for (a, b), c in cnt.items() if c >= thr]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:top]


def test_frequent_item_sets_planted(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta delta"),
        (2, "alpha beta"),
        (3, "alpha gamma zeta"),
        (4, "beta gamma eta eta eta"),   # repeats don't inflate counts
        (5, "unrelated words only"),
        (6, "alpha beta theta"),
        (7, "omega psi chi"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in curation.frequent_item_sets(
        d, min_support=0.5, top=10).collect()]
    want = _brute_fis([t for _, t in rows], 0.5, 10)
    assert got == want
    # (alpha, beta) co-occurs in docs 0,1,2,6 = 4/8 = exactly 0.5
    assert ("alpha", "beta", 4, 0.5) in got


def test_frequent_item_sets_corpus_matches_brute(spark, docs):
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _brute_fis(texts, 0.25, 15)
    got = [tuple(r) for r in curation.frequent_item_sets(
        docs, min_support=0.25, top=15).collect()]
    assert got == want and len(got) == 15


# ----------------------------------------------------------- c4_quality

def test_c4_quality_planted(spark):
    rows = [
        # keeps: 3 terminal-punct >=5-word lines, no lorem/brace
        (0, "The first good sentence sits here.\n"
            "Another entirely reasonable sentence follows it!\n"
            "Is this a third qualifying sentence? yes\n"
            "short one."),
        # line filter: too short / no punct / javascript all drop
        (1, "tiny line.\n"
            "this line has no terminal punctuation at all\n"
            "This line mentions javascript so it must go away.\n"
            "Only this surviving line gives one single sentence."),
        # page gates: lorem ipsum kills an otherwise-perfect page
        (2, "A perfectly fine long sentence number one stands here.\n"
            "A perfectly fine long sentence number two stands here.\n"
            "Lorem ipsum dolor sit amet is a classic filler phrase.\n"
            "A perfectly fine long sentence number three stands here."),
        # curly brace kills the page
        (3, "function f() { return 1; }\n"
            "A perfectly fine long sentence number one stands here.\n"
            "A perfectly fine long sentence number two stands here.\n"
            "A perfectly fine long sentence number three stands here."),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in curation.c4_quality(d).collect()}
    r0 = out[0]
    # line 'Is this...? yes' ends in 's' -> dropped; 'short one.' <5 words
    assert (r0["total_lines"], r0["kept_lines"]) == (4, 2)
    assert r0["n_sentences"] == 2 and not r0["keep"]
    r1 = out[1]
    assert r1["kept_lines"] == 1 and not r1["keep"]
    assert "javascript" not in r1["clean_text"]
    r2 = out[2]
    assert r2["has_lorem"] and not r2["keep"] and r2["n_sentences"] >= 3
    r3 = out[3]
    assert r3["has_brace"] and not r3["keep"]
    # and the brace line itself was already dropped by the line filter
    assert "{" not in r3["clean_text"]


def test_c4_quality_keep_path(spark):
    d = spark.createDataFrame(
        [(0, "One good long sentence stands right here today.\n"
             "Two good long sentences stand right here today.\n"
             "Three good long sentences stand right here today.")],
        "doc_id long, text string")
    r = curation.c4_quality(d).collect()[0]
    assert r["keep"] and r["n_sentences"] == 3 and r["kept_lines"] == 3
    assert r["clean_text"].count("\n") == 2


def test_c4_quality_corpus_matches_brute(spark, docs):
    import re
    pdf = docs.select("doc_id", "text").toPandas()
    # synthesize multi-line pages the same way the entry query does
    def page(i, t):
        a = ("This line has more than five words, clearly."
             if i % 3 == 0 else
             "short line." if i % 3 == 1 else
             "no terminal punctuation here at all")
        b = ("Lorem ipsum dolor sit amet for the filter!" if i % 5 == 0
             else "This sentence mentions javascript twice, javascript "
                  "indeed." if i % 7 == 0
             else "Another good sentence appears right here today. "
                  "And one more follows it!")
        return f"{t}\n{a}\n{b}"
    want = {}
    for i, t in zip(pdf["doc_id"], pdf["text"]):
        p = page(int(i), t)
        lines = [l.strip() for l in p.split("\n") if l.strip()]
        kept = [l for l in lines
                if re.search(r'[.!?"]$', l) and len(l.split()) >= 5
                and "javascript" not in l.lower()]
        clean = "\n".join(kept)
        ns = len(re.findall(r"[.!?]", clean))
        want[int(i)] = (len(lines), len(kept), ns,
                        "lorem ipsum" in p.lower(), "{" in p,
                        ns >= 3 and "lorem ipsum" not in p.lower()
                        and "{" not in p, clean)
    sdf = spark.createDataFrame(
        [(int(i), page(int(i), t))
         for i, t in zip(pdf["doc_id"], pdf["text"])],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["total_lines"], r["kept_lines"],
                         r["n_sentences"], r["has_lorem"],
                         r["has_brace"], r["keep"], r["clean_text"])
           for r in curation.c4_quality(sdf).collect()}
    assert got == want


def test_ccnet_buckets_per_lang_tertiles(spark, docs):
    """CCNet head/middle/tail: per-language equal-count ntile over
    (rounded LM score desc, doc_id) — recompute the expected bucket
    from the returned scores and the standard ntile rule."""
    out = curation.ccnet_buckets(docs).toPandas()
    assert len(out) == docs.count()
    for lang, g in out.groupby("lang"):
        g = g.sort_values(["avg_logprob", "doc_id"],
                          ascending=[False, True], kind="mergesort")
        n = len(g)
        base, extra = divmod(n, 3)
        sizes = [base + (1 if i < extra else 0) for i in range(3)]
        want = [b + 1 for b, sz in enumerate(sizes) for _ in range(sz)]
        assert g["bucket"].tolist() == want, lang
        names = {1: "head", 2: "middle", 3: "tail"}
        assert g["bucket_name"].tolist() == [names[b] for b in want]


def test_ccnet_buckets_deterministic(spark, docs):
    a = curation.ccnet_buckets(docs).toPandas().sort_values("doc_id")
    b = (curation.ccnet_buckets(docs.repartition(7)).toPandas()
         .sort_values("doc_id"))
    assert a["bucket"].tolist() == b["bucket"].tolist()


def test_chunk_windows_matches_bruteforce(spark, docs):
    import re

    out = curation.chunk_windows(docs, window=12, overlap=4).toPandas()
    ref = docs.select("doc_id", "text").toPandas()
    stride = 8
    want = {}
    for r in ref.itertuples():
        ts = [t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t]
        if not ts:
            continue
        n = len(ts)
        k = 1 if n <= 12 else -(-(n - 12) // stride) + 1
        for i in range(k):
            w = ts[i * stride: i * stride + 12]
            want[(r.doc_id, i)] = (i * stride, len(w), " ".join(w))
    got = {(r.doc_id, r.chunk_idx): (r.start_tok, r.n_toks, r.chunk)
           for r in out.itertuples()}
    assert got == want


def test_chunk_windows_covers_every_token(spark, docs):
    # strided reconstruction: dropping each chunk's first `overlap`
    # tokens (except chunk 0) rebuilds the original token stream
    out = (curation.chunk_windows(docs, window=10, overlap=3)
           .toPandas().sort_values(["doc_id", "chunk_idx"]))
    import re
    ref = docs.select("doc_id", "text").toPandas().set_index("doc_id")
    for doc_id, g in out.groupby("doc_id"):
        rebuilt = []
        for r in g.itertuples():
            toks = r.chunk.split(" ")
            rebuilt.extend(toks if r.chunk_idx == 0 else toks[3:])
        ts = [t for t in re.split(
            r"[^a-z0-9]+", ref.loc[doc_id, "text"].lower()) if t]
        assert rebuilt == ts, doc_id


def test_chunk_windows_is_shuffle_free(spark, docs):
    plan = (curation.chunk_windows(docs, window=16, overlap=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_chunk_windows_param_guards(spark, docs):
    with pytest.raises(ValueError):
        curation.chunk_windows(docs, window=0)
    with pytest.raises(ValueError):
        curation.chunk_windows(docs, window=10, overlap=10)
