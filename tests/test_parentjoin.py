"""ES parent-join family (operators/parentjoin.py): has_child /
has_parent / parent_id / children aggregation vs a pure-Python brute
force over the chunked child corpus, plus the co-location guarantee
(a parent's children never span shards under the derived-id scheme —
the ES parent-routing invariant the scale story relies on)."""

import re

import pytest
from pyspark.sql import functions as F

from maestro_spark.functions import bm25
from maestro_spark.operators import parentjoin
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.dedup import chunk_paragraphs
from maestro_spark.operators.search import IndexReader

VOCAB = ["alpha", "beta", "gamma", "delta", "merge", "query", "slow",
         "fast", "index", "shard", "token", "batch"]
N_PARENTS = 60
CHUNK = 10
STRIDE = 10          # child id = parent * STRIDE + chunk_idx
SHARD = 100          # STRIDE divides SHARD → children never span shards


def _text(i: int) -> str:
    n = 5 + (i * 11) % 30
    return " ".join(VOCAB[(i * 7 + j * 3) % len(VOCAB)] for j in range(n))


def _tok(s: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", s.lower())


def _chunks(i: int) -> dict[int, list[str]]:
    ts = _tok(_text(i))
    return {i * STRIDE + c: ts[c * CHUNK:(c + 1) * CHUNK]
            for c in range((len(ts) + CHUNK - 1) // CHUNK)}


CHILDREN = {cid: toks for i in range(N_PARENTS)
            for cid, toks in _chunks(i).items()}
PARENT_OF = {cid: cid // STRIDE for cid in CHILDREN}


def _scores(corpus: dict[int, list[str]], query: str) -> dict[int, float]:
    """Brute-force BM25 (shared bm25.idf/tfnorm math) over a token-list
    corpus; only docs matching >= 1 distinct query term appear."""
    terms = sorted(set(_tok(query)))
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    out = {}
    for did, toks in corpus.items():
        s, hit = 0.0, False
        for t in terms:
            tf = toks.count(t)
            if tf:
                hit = True
                df = sum(1 for x in corpus.values() if t in x)
                s += float(bm25.idf(float(df), n)
                           * bm25.tfnorm(float(tf), float(len(toks)), avgdl))
        if hit:
            out[did] = s
    return out


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    parents = spark.createDataFrame(
        [(i, "r", str(i), "c0", "java" if i % 3 else "py", _text(i))
         for i in range(N_PARENTS)],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string")
    pdir = str(tmp_path_factory.mktemp("pj_parent"))
    build_index(spark, parents, pdir, IndexConfig(
        shard_size=32, n_buckets=4, n_salts=2, sample_fraction=1.0,
        tokenizer="simple", index_fields=("content",)), id_col="doc_id")

    chunks = chunk_paragraphs(
        parents.select("doc_id", F.col("content").alias("text")),
        "text", chunk=CHUNK)
    cid = (F.col("doc_id") * STRIDE + F.col("par_idx")).cast("long")
    children = chunks.select(
        cid.alias("doc_id"), F.col("doc_id").cast("long").alias("parent"),
        F.lit("pars").alias("repo"), cid.cast("string").alias("path"),
        F.lit("c0").alias("commit"), F.lit("text").alias("lang"),
        F.col("paragraph").alias("content"))
    cdir = str(tmp_path_factory.mktemp("pj_child"))
    build_index(spark, children, cdir, IndexConfig(
        shard_size=SHARD, n_buckets=4, n_salts=2, sample_fraction=1.0,
        tokenizer="simple", index_fields=("content",),
        stored_columns=("parent",)), id_col="doc_id")
    return pdir, cdir


def test_chunking_matches_brute(spark, built):
    _, cdir = built
    got = {int(r["doc_id"]): _tok(r["content"])
           for r in IndexReader(spark, cdir)._docs().collect()}
    assert got == CHILDREN


def test_children_colocated_with_parent(spark, built):
    """The ES routing invariant: all children of a parent on one shard."""
    _, cdir = built
    spread = (IndexReader(spark, cdir)._docs()
              .groupBy("parent")
              .agg(F.countDistinct("shard").alias("n"))
              .agg(F.max("n").alias("m")).head()["m"])
    assert spread == 1


def _brute_has_child(query, score_mode, min_children=1, max_children=None,
                     k=10):
    cs = _scores(CHILDREN, query)
    per = {}
    for cid, s in cs.items():
        per.setdefault(PARENT_OF[cid], []).append(s)
    rows = []
    for p, ss in per.items():
        if len(ss) < min_children:
            continue
        if max_children is not None and len(ss) > max_children:
            continue
        agg = {"max": max, "min": min, "sum": sum,
               "avg": lambda v: sum(v) / len(v),
               "none": lambda v: 0.0}[score_mode](ss)
        rows.append((p, round(agg, 6), len(ss)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


@pytest.mark.parametrize("score_mode", ["max", "sum", "avg", "min", "none"])
def test_has_child_score_modes(spark, built, score_mode):
    _, cdir = built
    cr = IndexReader(spark, cdir)
    got = [(int(r["parent"]), float(r["score"]), int(r["n_children"]))
           for r in parentjoin.has_child(
               cr, "merge query", score_mode=score_mode, k=8).collect()]
    assert got == _brute_has_child("merge query", score_mode, k=8)


def test_has_child_children_bounds(spark, built):
    _, cdir = built
    cr = IndexReader(spark, cdir)
    got = [(int(r["parent"]), float(r["score"]), int(r["n_children"]))
           for r in parentjoin.has_child(
               cr, "merge query slow", min_children=2, max_children=3,
               k=20).collect()]
    want = _brute_has_child("merge query slow", "max", 2, 3, k=20)
    assert got == want and any(r[2] >= 2 for r in want)


def test_has_child_no_match_is_empty(spark, built):
    _, cdir = built
    cr = IndexReader(spark, cdir)
    assert parentjoin.has_child(cr, "zzznope").count() == 0


def test_has_child_inner_hits(spark, built):
    _, cdir = built
    cr = IndexReader(spark, cdir)
    got = [(int(r["parent"]), float(r["score"]), int(r["n_children"]),
            int(r["child_id"]), float(r["child_score"]),
            int(r["child_rank"]))
           for r in parentjoin.has_child_inner_hits(
               cr, "merge query", k=5, inner_size=2,
               score_mode="max").collect()]
    parents = _brute_has_child("merge query", "max", k=5)
    cs = _scores(CHILDREN, "merge query")
    want = []
    for p, score, n in parents:
        kids = sorted(((round(s, 6), cid) for cid, s in cs.items()
                       if PARENT_OF[cid] == p),
                      key=lambda t: (-t[0], t[1]))[:2]
        for rk, (s, cid) in enumerate(kids, 1):
            want.append((p, score, n, cid, s, rk))
    assert got == want
    # inner hits exist ONLY for returned parents
    assert {g[0] for g in got} == {p for p, _, _ in parents}


def test_has_parent_score_propagation(spark, built):
    pdir, cdir = built
    cr, pr = IndexReader(spark, cdir), IndexReader(spark, pdir)
    parents = {i: _tok(_text(i)) for i in range(N_PARENTS)}
    ps = {p: round(s, 6) for p, s in _scores(parents, "slow fast").items()}
    want = sorted(((cid, PARENT_OF[cid], ps[PARENT_OF[cid]])
                   for cid in CHILDREN if PARENT_OF[cid] in ps),
                  key=lambda r: (-r[2], r[0]))[:15]
    got = [(int(r["child_id"]), int(r["parent"]), float(r["score"]))
           for r in parentjoin.has_parent(
               cr, pr, "slow fast", k=15).collect()]
    assert got == want


def test_has_parent_filter_context(spark, built):
    pdir, cdir = built
    cr, pr = IndexReader(spark, cdir), IndexReader(spark, pdir)
    got = parentjoin.has_parent(cr, pr, "slow fast", k=15,
                                score=False).collect()
    assert got and all(float(r["score"]) == 0.0 for r in got)
    assert [int(r["child_id"]) for r in got] == sorted(
        int(r["child_id"]) for r in got)


def test_parent_id_query(spark, built):
    _, cdir = built
    cr = IndexReader(spark, cdir)
    got = [(int(r["child_id"]), float(r["score"]))
           for r in parentjoin.parent_id(cr, 7, boost=2.5).collect()]
    assert got == [(cid, 2.5) for cid in sorted(_chunks(7))]


def test_children_agg(spark, built):
    pdir, cdir = built
    cr, pr = IndexReader(spark, cdir), IndexReader(spark, pdir)
    parents = {i: _tok(_text(i)) for i in range(N_PARENTS)}
    matched = sorted(_scores(parents, "slow fast"))
    want = {}
    for p in matched:
        lang = "java" if p % 3 else "py"
        kids = _chunks(p)
        b = want.setdefault(lang, [0, 0, 0])
        b[0] += 1
        b[1] += len(kids)
        b[2] += sum(len(t) for t in kids.values())
    got = {r["bucket"]: (int(r["n_parents"]), int(r["n_children"]),
                         float(r["avg_child_tokens"]))
           for r in parentjoin.children_agg(cr, pr, "slow fast",
                                            "lang").collect()}
    assert got == {lang: (np_, nc, round(ts / nc, 6))
                   for lang, (np_, nc, ts) in want.items()}


def test_parent_agg(spark, built):
    """ES `parent` agg (inverse of children): CHILD query context
    stepped up to parents, bucketed by a parent field; n_parents counts
    each reached parent once, n_matching_children counts the matched
    child docs, avg_parent_chars averages the parent text length."""
    pdir, cdir = built
    cr, pr = IndexReader(spark, cdir), IndexReader(spark, pdir)
    cs = _scores(CHILDREN, "merge slow")
    per = {}
    for cid in cs:
        per[PARENT_OF[cid]] = per.get(PARENT_OF[cid], 0) + 1
    want = {}
    for p, nm in per.items():
        lang = "java" if p % 3 else "py"
        b = want.setdefault(lang, [0, 0, 0.0])
        b[0] += 1
        b[1] += nm
        b[2] += len(_text(p))
    got = {r["bucket"]: (int(r["n_parents"]),
                         int(r["n_matching_children"]),
                         float(r["avg_parent_chars"]))
           for r in parentjoin.parent_agg(cr, pr, "merge slow",
                                          "lang").collect()}
    assert got == {lang: (np_, nc, round(chars / np_, 6))
                   for lang, (np_, nc, chars) in want.items()}
    # every parent counted once regardless of how many children matched
    assert sum(v[0] for v in got.values()) == len(per)
    assert sum(v[1] for v in got.values()) == len(cs)
