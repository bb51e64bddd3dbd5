"""Round-3 session-11 additions, each vs an independent brute force:

  - timeseries.downsample / downsample_requery (ES TSDB downsampling):
    per (series, calendar bucket) min/max/sum/value_count/last_value
    rollup vs a pandas groupby with (ts, id)-ordered last; and the
    mergeability proof — a day-level re-aggregation OF THE HOURLY
    ROLLUP equals the same aggregation computed from raw events
  - curation.split_overlap (train/test leakage audit): pairwise
    distinct-n-gram overlap matrix vs python set intersections
  - similarity.text_similarity_rerank (ES retriever.text_similarity_
    reranker shape): rounded-rank window cut, deterministic Jaccard
    rerank vs python brute force, window exclusion, scorer seam
"""

import datetime as dt
import itertools
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.curation import split_overlap
from maestro_spark.operators.similarity import text_similarity_rerank
from maestro_spark.operators.timeseries import downsample, downsample_requery

# --------------------------------------------------- downsample

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _events():
    rows = []
    for i in range(240):
        series = i % 5
        ts = T0 + dt.timedelta(minutes=17 * i + series)
        val = round(((i * 37) % 100) + series * 0.25, 2)
        rows.append((i, ts, series, val))
    # planted tie: two events in the same (series, hour) with equal ts —
    # last_value must pin on the event id (the higher id wins)
    rows.append((1000, T0 + dt.timedelta(minutes=5), 0, 1.5))
    rows.append((1001, T0 + dt.timedelta(minutes=5), 0, 2.5))
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])


def _brute_rollup(pdf, unit="hour"):
    trunc = {"hour": "h", "day": "D", "minute": "min"}[unit]
    g = pdf.assign(bucket=pdf["ts"].dt.floor(trunc).dt.strftime(
        "%Y-%m-%d %H:%M:%S"))
    out = {}
    for (s, b), grp in g.groupby(["user_id", "bucket"]):
        grp = grp.sort_values(["ts", "event_id"])
        out[(s, b)] = (len(grp), round(grp["value"].min(), 6),
                       round(grp["value"].max(), 6),
                       round(grp["value"].sum(), 6), len(grp),
                       round(grp["value"].iloc[-1], 6))
    return out


def test_downsample_matches_brute(spark):
    pdf = _events()
    got = {(r["series"], r["bucket"]):
           (r["doc_count"], r["v_min"], r["v_max"], r["v_sum"],
            r["v_count"], r["last_value"])
           for r in downsample(spark.createDataFrame(pdf)).collect()}
    assert got == _brute_rollup(pdf)


def test_downsample_requery_equals_raw(spark):
    """Day-level stats FROM the hourly rollup == day-level from raw —
    the mergeability contract downsampling rests on."""
    pdf = _events()
    df = spark.createDataFrame(pdf)
    got = {(r["series"], r["bucket"]):
           (r["doc_count"], r["v_min"], r["v_max"], r["v_sum"],
            r["v_count"], r["v_avg"], r["last_value"])
           for r in downsample_requery(df, unit="hour",
                                       requery_unit="day").collect()}
    raw = {}
    for (s, b), (n, lo, hi, sm, c, last) in _brute_rollup(pdf, "day").items():
        raw[(s, b)] = (n, lo, hi, sm, c,
                       round(pdf[(pdf.user_id == s)
                                 & (pdf.ts.dt.floor("D").dt.strftime(
                                     "%Y-%m-%d %H:%M:%S") == b)]
                             ["value"].mean(), 6), last)
    assert got == raw


def test_downsample_guards(spark):
    df = spark.createDataFrame(_events())
    with pytest.raises(ValueError, match="unit"):
        downsample(df, unit="week")
    with pytest.raises(ValueError, match="coarser"):
        downsample_requery(df, unit="hour", requery_unit="hour")
    with pytest.raises(ValueError, match="coarser"):
        downsample_requery(df, unit="day", requery_unit="hour")


# --------------------------------------------------- split_overlap

WORDS = ["red", "blue", "green", "fox", "jump", "run", "walk", "code",
         "tree", "leaf"]


def _odocs():
    rows = []
    for i in range(30):
        split = f"s{i % 3}"
        toks = [WORDS[(i * 3 + j) % len(WORDS)] for j in range(8 + i % 5)]
        rows.append((i, split, " ".join(toks)))
    # planted identical text across s0/s1 → guaranteed shared grams
    rows.append((100, "s0", "alpha beta gamma delta alpha beta"))
    rows.append((101, "s1", "alpha beta gamma delta alpha beta"))
    return rows


def _brute_overlap(rows, n):
    grams = {}
    for _i, split, text in rows:
        ts = re.findall(r"[a-z0-9]+", text.lower())
        g = {tuple(ts[j:j + n]) for j in range(len(ts) - n + 1)}
        grams.setdefault(split, set()).update(g)
    out = {}
    for a, b in itertools.permutations(sorted(grams), 2):
        shared = len(grams[a] & grams[b])
        if shared:
            out[(a, b)] = (shared, len(grams[a]),
                           round(shared / len(grams[a]), 6))
    return out


@pytest.mark.parametrize("n", [3, 5])
def test_split_overlap_matches_brute(spark, n):
    rows = _odocs()
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r["split_a"], r["split_b"]):
           (r["n_shared"], r["n_a"], r["frac_of_a"])
           for r in split_overlap(df, n=n).collect()}
    assert got == _brute_overlap(rows, n)


def test_split_overlap_asymmetric(spark):
    """frac is relative to the LEFT split: a tiny split fully contained
    in a big one shows frac_of_a = 1.0 one way, < 1 the other."""
    rows = [(0, "big", "a b c d e f g h i j k l"),
            (1, "small", "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r["split_a"], r["split_b"]): r["frac_of_a"]
           for r in split_overlap(df, n=3).collect()}
    assert got[("small", "big")] == 1.0
    assert got[("big", "small")] < 1.0


# --------------------------------------------- text_similarity_rerank

RDOCS = [
    (0, "spark merge query fast index"),
    (1, "merge merge merge merge merge merge merge"),   # high bm25, low sim
    (2, "spark merge query"),                            # exact-ish match
    (3, "unrelated words entirely here"),
    (4, "spark query merge extra token pad pad pad"),
    (5, "spark merge query"),                            # tie with 2 on sim
]
RQUERY = "spark merge query"


def _brute_rerank(first, k, window):
    cut = sorted(first, key=lambda r: (-round(r[1], 6), r[0]))[:window]
    qt = set(re.findall(r"[a-z0-9]+", RQUERY.lower()))
    out = []
    for did, s in cut:
        dt_ = set(re.findall(r"[a-z0-9]+", dict(RDOCS)[did].lower()))
        sim = len(qt & dt_) / len(qt | dt_) if (qt | dt_) else 0.0
        out.append((did, round(sim, 6), round(s, 6)))
    out.sort(key=lambda r: (-r[1], -r[2], r[0]))
    return out[:k]


FIRST = [(0, 3.5), (1, 9.9), (2, 2.2), (3, 1.1), (4, 2.9), (5, 2.2)]


def test_rerank_matches_brute(spark):
    docs = spark.createDataFrame(RDOCS, "doc_id long, content string")
    first = spark.createDataFrame(FIRST, "doc_id long, score double")
    got = [(r["doc_id"], r["sim"], r["score"])
           for r in text_similarity_rerank(first, docs, RQUERY,
                                           k=4, window=10).collect()]
    assert got == _brute_rerank(FIRST, 4, 10)
    # the sim ordering must actually beat the bm25 ordering: doc 1 is
    # the bm25 winner but reranks below the exact matches
    assert got[0][0] in (2, 5) and all(g[0] != 1 for g in got[:2])


def test_rerank_window_cut_excludes(spark):
    """A doc outside the rank window never returns, however similar."""
    docs = spark.createDataFrame(RDOCS, "doc_id long, content string")
    first = spark.createDataFrame(FIRST, "doc_id long, score double")
    got = [(r["doc_id"], r["sim"], r["score"])
           for r in text_similarity_rerank(first, docs, RQUERY,
                                           k=4, window=2).collect()]
    assert got == _brute_rerank(FIRST, 4, 2)
    assert {g[0] for g in got} == {0, 1}  # window 2 = bm25 top-2 only


def test_rerank_scorer_seam(spark):
    """A custom scorer Column drops in without changing the plumbing."""
    docs = spark.createDataFrame(RDOCS, "doc_id long, content string")
    first = spark.createDataFrame(FIRST, "doc_id long, score double")
    got = [r["doc_id"] for r in text_similarity_rerank(
        first, docs, RQUERY, k=3, window=10,
        scorer=lambda q, d: F.size(d).cast("double")).collect()]
    # longest distinct-token doc first under the custom scorer
    lens = {did: len(set(re.findall(r"[a-z0-9]+", t.lower())))
            for did, t in RDOCS}
    want = sorted(FIRST, key=lambda r: (-lens[r[0]], -round(r[1], 6),
                                        r[0]))[:3]
    assert got == [w[0] for w in want]


# --------------------------------------------------- plan audits


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_downsample_plan_single_pass(spark):
    """One corpus scan, ONE exchange (the (series, bucket) partial agg);
    last_value rides the same agg as a struct-max — no window, no join,
    no Python nodes."""
    p = _plan(downsample(spark.createDataFrame(_events())))
    assert p.count("Exchange") == 1
    assert "Python" not in p


def test_requery_plan_reaggregates_rollup(spark):
    """The coarser re-query adds one partial agg over ALREADY-REDUCED
    rollup rows — never a second pass over raw events (one scan)."""
    df = spark.createDataFrame(_events())
    p = _plan(downsample_requery(df, unit="hour", requery_unit="day"))
    assert p.count("Exchange") == 2
    assert "Python" not in p


def test_split_overlap_plan_single_scan(spark):
    """The totals come from the self-pair rows via a window over the
    reduced pair matrix — the corpus gram shuffle runs ONCE (a totals
    join branch would physically duplicate it)."""
    rows = _odocs()
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    p = _plan(split_overlap(df, n=3))
    assert p.count("Scan ExistingRDD") + p.count("Scan parquet") <= 1
    assert "Python" not in p


# --------------------------------------------- index sorting (ES
# index.sort.field): ids assigned in (sort_col, key) order; sorted
# queries answer from id order with a k-bounded docstore fetch


@pytest.fixture(scope="module")
def sorted_idx(spark, tmp_path_factory):
    from maestro_spark.operators.build import IndexConfig, build_index, \
        build_index_sorted
    from maestro_spark.sources.corpus import synth_docs

    docs = synth_docs(spark, 150, seed=11, partitions=4)
    cfg = IndexConfig(shard_size=64, n_buckets=4, n_salts=2,
                      sample_fraction=1.0)
    sdir = str(tmp_path_factory.mktemp("idx_sorted"))
    build_index_sorted(spark, docs, sdir, "lang", cfg)
    fdir = str(tmp_path_factory.mktemp("idx_flat"))
    build_index(spark, docs, fdir, cfg)
    return sdir, fdir


def test_index_sort_invariant(spark, sorted_idx):
    """doc_id order ≡ (lang, repo, path, commit) order index-wide."""
    from maestro_spark.operators.search import IndexReader
    sdir, _ = sorted_idx
    rows = (IndexReader(spark, sdir)._docs()
            .select("doc_id", "lang", "repo", "path", "commit")
            .orderBy("doc_id").collect())
    keys = [(r["lang"], r["repo"], r["path"], r["commit"]) for r in rows]
    assert keys == sorted(keys)
    assert [r["doc_id"] for r in rows] == list(range(len(rows)))


@pytest.mark.parametrize("after", [None, "page2"])
def test_index_sorted_query_parity(spark, sorted_idx, after):
    """force (early-termination) ≡ never (full match-set sort), incl.
    the search_after cursor, on several queries."""
    from maestro_spark.operators.search import IndexReader
    sdir, _ = sorted_idx
    r = IndexReader(spark, sdir)
    for q in ("user merge", "error", "stream window"):
        kw = {}
        if after == "page2":
            first = r.search_sorted(q, "lang", k=3,
                                    use_index_sort="never").collect()
            if not first:
                continue
            kw["after"] = (first[-1]["sort_value"], first[-1]["doc_id"])
        a = [(x["doc_id"], x["sort_value"]) for x in
             r.search_sorted(q, "lang", k=5, use_index_sort="force",
                             **kw).collect()]
        b = [(x["doc_id"], x["sort_value"]) for x in
             r.search_sorted(q, "lang", k=5, use_index_sort="never",
                             **kw).collect()]
        assert a == b and a


def test_index_sort_force_guards(spark, sorted_idx):
    from maestro_spark.operators.search import IndexReader
    sdir, fdir = sorted_idx
    with pytest.raises(ValueError, match="not sorted"):
        IndexReader(spark, fdir).search_sorted(
            "user", "lang", use_index_sort="force")
    # wrong direction / wrong column refuse too; auto falls back
    r = IndexReader(spark, sdir)
    with pytest.raises(ValueError, match="not sorted"):
        r.search_sorted("user", "lang", ascending=False,
                        use_index_sort="force")
    with pytest.raises(ValueError, match="not sorted"):
        r.search_sorted("user", "repo", use_index_sort="force")
    desc_auto = r.search_sorted("user", "lang", ascending=False, k=3)
    desc_never = r.search_sorted("user", "lang", ascending=False, k=3,
                                 use_index_sort="never")
    assert [tuple(x) for x in desc_auto.collect()] == \
        [tuple(x) for x in desc_never.collect()]


def test_index_sorted_plan_k_bounded_fetch(spark, sorted_idx):
    """The early path's docstore join must be a BROADCAST of the k-row
    id head (point-lookup-class fetch), never a shuffle join of the
    full match set against the docstore."""
    from maestro_spark.operators.search import IndexReader
    sdir, _ = sorted_idx
    df = IndexReader(spark, sdir).search_sorted(
        "user merge", "lang", k=5, use_index_sort="force")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


# ------------------------------------------- incremental (store) dedup


def test_incremental_dedup_matches_brute(spark):
    from maestro_spark.operators.dedup import (incremental_dedup,
                                               updated_fingerprint_store)
    import hashlib

    texts = ["aa bb", "cc dd", "aa bb", "ee", "cc  dd", "ff", "aa   bb"]
    batch_rows = [(i, t) for i, t in enumerate(texts)]
    store_texts = ["ee", "gg"]

    def fp(t):
        import re as _re
        return hashlib.md5(
            _re.sub(r"\s+", " ", t.lower()).strip().encode()).hexdigest()

    store = spark.createDataFrame([(fp(t),) for t in store_texts],
                                  "fingerprint string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["dup_of_store"], r["dup_in_batch"], r["keep"])
           for r in incremental_dedup(batch, store).collect()}
    seen_store = {fp(t) for t in store_texts}
    mins = {}
    for i, t in batch_rows:
        mins.setdefault(fp(t), i)
    want = {i: (fp(t) in seen_store, i != mins[fp(t)],
                fp(t) not in seen_store and i == mins[fp(t)])
            for i, t in batch_rows}
    assert got == want
    # normalization folds whitespace: docs 0/2/6 are one group, 1/4 too
    assert want[2] == (False, True, False) and want[4] == (False, True, False)
    # store hit: doc 3 ('ee') is dup_of_store, never kept
    assert want[3][0] is True and want[3][2] is False

    # the updated store admits exactly store ∪ kept fingerprints, and a
    # REPLAY of the same batch against it keeps nothing (idempotence)
    dec = incremental_dedup(batch, store)
    new_store = updated_fingerprint_store(dec, store)
    replay = incremental_dedup(batch, new_store)
    assert replay.where(F.col("keep")).count() == 0
    assert new_store.count() == len({fp(t) for t in texts} | seen_store)


def test_incremental_dedup_empty_store(spark):
    """store=None degenerates to exact_duplicates' keep rule."""
    from maestro_spark.operators.dedup import (exact_duplicates,
                                               incremental_dedup)
    rows = [(i, t) for i, t in enumerate(["x y", "z", "x  y", "w", "z"])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inc = {r["doc_id"]: r["keep"]
           for r in incremental_dedup(df, None).collect()}
    ex = {r["doc_id"]: not r["is_dup"]
          for r in exact_duplicates(df).collect()}
    assert inc == ex
    assert all(not r["dup_of_store"]
               for r in incremental_dedup(df, None).collect())


# ------------------------------------------- hard-negative mining


def test_hard_negatives_matches_brute(spark):
    import numpy as np
    from maestro_spark.operators.similarity import mine_hard_negatives

    rng = np.random.RandomState(7)
    vecs = {i: rng.randn(8).tolist() for i in range(30)}
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    qids = [0, 9]
    pos_pairs = [(0, 3), (0, 5), (9, 2), (9, 28)]
    qs = emb.where(F.col("vec_id").isin(qids))
    pos = spark.createDataFrame(pos_pairs, "qid long, nid long")
    got = [(r["qid"], r["nid"], r["rank"])
           for r in mine_hard_negatives(qs, emb, pos, k=4)
           .orderBy("qid", "rank").collect()]

    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    want = []
    for q in qids:
        banned = {n for qq, n in pos_pairs if qq == q} | {q}
        sc = sorted(((cos(vecs[q], vecs[n]), n) for n in vecs
                     if n not in banned), key=lambda t: (-t[0], t[1]))
        want += [(q, n, i + 1) for i, (_c, n) in enumerate(sc[:4])]
    assert got == want
    # a positive never appears, and exclusion happened BEFORE the rank:
    # rank k is still filled (4 per query)
    assert all((q, n) not in pos_pairs for q, n, _ in got)
    assert [sum(1 for g in got if g[0] == q) for q in qids] == [4, 4]


# ------------------------------------------- gopher repetition battery


GOP_DOCS = [
    (0, "the cat sat on the mat the cat sat again and again and again"),
    (1, "a a a a a a"),                        # overlapping self-repeat
    (2, "x y z w"),                            # nothing repeats
    (3, ""),                                   # empty doc
    (4, "one two"),                            # shorter than every dup n
    (5, ("alpha beta gamma delta " * 4) + "omega"),  # long repeated block
]
TOP_NS = (2, 3)
DUP_NS = (4, 5)


def _gopher_brute(text):
    ts = re.findall(r"[a-z0-9]+", text.lower())
    out = {}
    for n in sorted(set(TOP_NS) | set(DUP_NS)):
        occ = {}
        for i in range(max(len(ts) - n + 1, 0)):
            occ.setdefault(" ".join(ts[i:i + n]), []).append(i)
        if n in TOP_NS:
            if not occ:
                out[f"top_{n}gram_frac"] = 0.0
                continue
            best = max(occ.items(), key=lambda kv: (len(kv[1]), kv[0]))
            positions = best[1]
        else:
            positions = sorted(p for ps in occ.values()
                               if len(ps) >= 2 for p in ps)
            if not positions:
                out[f"dup_{n}gram_frac"] = 0.0
                continue
        covered = set()
        for p in positions:
            covered.update(range(p, p + n))
        key = (f"top_{n}gram_frac" if n in TOP_NS else f"dup_{n}gram_frac")
        out[key] = round(len(covered) / max(len(ts), 1), 6)
    out["n_tokens"] = len(ts)
    return out


def test_gopher_repetition_matches_brute(spark):
    from maestro_spark.operators.textstats import gopher_repetition

    df = spark.createDataFrame(GOP_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in gopher_repetition(df, top_ns=TOP_NS,
                                      dup_ns=DUP_NS).collect()}
    for did, text in GOP_DOCS:
        want = _gopher_brute(text)
        g = got[did]
        for k, v in want.items():
            assert g[k] == v, (did, k, g[k], v)
    # sanity: the self-overlapping doc 1 has dup_4gram covering all
    assert got[1]["dup_4gram_frac"] == 1.0
    # doc 2: top 2-gram covers exactly one bigram span
    assert got[2]["top_2gram_frac"] == 0.5
    # empty / short docs present with zeros
    assert got[3]["n_tokens"] == 0 and got[3]["dup_5gram_frac"] == 0.0
    assert got[4]["dup_4gram_frac"] == 0.0


# ------------------------------------------- distinct-n diversity


def test_ngram_diversity_matches_brute(spark):
    from maestro_spark.operators.textstats import ngram_diversity

    rows = [(0, "g0", "a b a b a b"),          # highly repetitive
            (1, "g0", "a b c d"),
            (2, "g1", "p q r s t u"),          # all distinct
            (3, "g1", "p q"),
            (4, "g2", "")]                     # empty group
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r["group"], r["n"]): (r["n_occurrences"], r["n_distinct"],
                                  r["distinct_ratio"])
           for r in ngram_diversity(df, ns=(1, 2)).collect()}
    want = {}
    for grp in ("g0", "g1"):
        for n in (1, 2):
            occ = []
            for _i, g, t in rows:
                if g != grp:
                    continue
                ts = re.findall(r"[a-z0-9]+", t)
                occ += [" ".join(ts[j:j + n])
                        for j in range(len(ts) - n + 1)]
            want[(grp, n)] = (len(occ), len(set(occ)),
                              round(len(set(occ)) / len(occ), 6))
    assert got == want
    # empty group emits no rows (no occurrences to take a ratio of)
    assert not any(g == "g2" for g, _n in got)
    # repetitive group collapses faster than the distinct one
    assert got[("g0", 2)][2] < got[("g1", 2)][2]


# ------------------------------------------- shuffle-shard export


def test_shuffle_shard_assign_matches_brute(spark):
    import hashlib
    from maestro_spark.operators.curation import shuffle_shard_assign

    ids = list(range(97))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: (r["shard"], r["pos"])
           for r in shuffle_shard_assign(df, n_shards=4).collect()}

    def hex16(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)

    by_shard = {}
    for i in ids:
        sh = hex16(f"shufs{i}") % 4
        rk = hashlib.md5(f"shufr{i}".encode()).hexdigest()
        by_shard.setdefault(sh, []).append((rk, i))
    want = {}
    for sh, rows in by_shard.items():
        for pos, (_rk, i) in enumerate(sorted(rows)):
            want[i] = (sh, pos)
    assert got == want
    # a permutation: every (shard, pos) slot unique, positions dense
    assert len(set(got.values())) == len(ids)
    for sh in {s for s, _p in got.values()}:
        ps = sorted(p for s, p in got.values() if s == sh)
        assert ps == list(range(len(ps)))


def test_shuffle_shard_assign_repartition_invariant(spark):
    from maestro_spark.operators.curation import shuffle_shard_assign

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = sorted(map(tuple, shuffle_shard_assign(df, 4).collect()))
    b = sorted(map(tuple,
                   shuffle_shard_assign(df.repartition(7), 4).collect()))
    assert a == b
    # and it actually shuffles: in-shard order != id order
    shard0 = [i for i, s, p in sorted(a, key=lambda t: (t[1], t[2]))
              if s == a[0][1]]
    assert shard0 != sorted(shard0)


# ------------------------------------------- classifier PR curve


def test_pr_curve_matches_brute(spark):
    from maestro_spark.operators.classifier import pr_curve

    rows = [(i, 0.05 * i, 1 if i % 3 == 0 else (2 if i % 7 == 0 else 0))
            for i in range(40)]   # multi-class labels: only 1 is positive
    df = spark.createDataFrame(rows, "id long, score double, label int")
    ths = (0.25, 0.8, 1.5, 99.0)
    got = {r["threshold"]: (r["tp"], r["fp"], r["fn"], r["precision"],
                            r["recall"], r["f1"], r["kept_frac"])
           for r in pr_curve(df, thresholds=ths).collect()}
    npos = sum(1 for _i, _s, y in rows if y == 1)
    for t in ths:
        tp = sum(1 for _i, s, y in rows if s >= t and y == 1)
        pp = sum(1 for _i, s, y in rows if s >= t)
        prec = tp / pp if pp else 0.0
        rec = tp / npos if npos else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        want = (tp, pp - tp, npos - tp, round(prec, 6), round(rec, 6),
                round(f1, 6), round(pp / len(rows), 6))
        assert got[t] == want, (t, got[t], want)
    # the empty-prediction threshold (99.0) hits every zero guard
    assert got[99.0][:3] == (0, 0, npos) and got[99.0][3:] == (0.0, 0.0,
                                                              0.0, 0.0)


def test_write_shuffled_shards_layout(spark, tmp_path):
    """The written layout honors the permutation: each shard dir read
    back in file order yields rows in `pos` order (the sequential-
    reader contract), and the union is exactly the corpus."""
    import os
    from maestro_spark.operators.curation import (shuffle_shard_assign,
                                                  write_shuffled_shards)

    rows = [(i, f"t{i}") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "shards")
    write_shuffled_shards(df, out, n_shards=4)
    asg = {r["doc_id"]: (r["shard"], r["pos"])
           for r in shuffle_shard_assign(df, 4).collect()}
    seen = []
    for d in sorted(os.listdir(out)):
        if not d.startswith("shard="):
            continue
        sh = int(d.split("=")[1])
        back = spark.read.parquet(os.path.join(out, d)).collect()
        ids = [int(r["doc_id"]) for r in back]
        assert ids == sorted(ids, key=lambda i: asg[i][1])  # pos order
        assert all(asg[i][0] == sh for i in ids)
        seen += ids
    assert sorted(seen) == [i for i, _t in rows]
