"""Bound-aware pruning for the formerly prune-off scorers (VERDICT r2 #1):

  - dis_max / multi_match: cross-field MaxScore via per-field max-of-sums
    block-max bounds — pruned output must be BIT-IDENTICAL to prune=False
    at every tie_breaker, and must actually skip posting blocks.
  - search_after cursor pagination: ceiling-aware MaxScore — every page,
    at any depth, with and without score_round / exclude / min_match,
    bit-identical to the unpruned scorer; deep pages skip blocks.
  - doc-filter / within_ids restriction (restrict_blocks): the allowed
    set seeds the candidate set, so selective filters decode only
    intersecting blocks while scores stay bit-identical.
"""

import numpy as np
import pandas as pd
import pytest

from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import (IndexReader, reset_prune_stats)
from maestro_spark.sources.corpus import synth_docs

# postings are block-coded at 128 docs/block (codec.BLOCK): a term needs
# several hundred postings per shard before block skipping is observable,
# hence the wider shards here
N_DOCS = 2000
CFG = IndexConfig(
    shard_size=1000,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_prune"))
    docs = synth_docs(spark, N_DOCS, seed=7, partitions=6)
    build_index(spark, docs, out, CFG)
    return out


@pytest.fixture(scope="module")
def reader(spark, built):
    return IndexReader(spark, built)


Q = "index query merge"
MM = "stream merge java"


# ------------------------------------------------------------- dis_max

@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
@pytest.mark.parametrize("fields", [("content", "lang"),
                                    ("content", "lang", "repo")])
def test_dismax_prune_parity(reader, tie, fields):
    """Pruned dis_max ≡ unpruned, ids and float64 scores bit-identical."""
    a = reader.multi_match_local(MM, fields, tie_breaker=tie, k=12,
                                 prune=True)
    b = reader.multi_match_local(MM, fields, tie_breaker=tie, k=12,
                                 prune=False)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy())


def test_dismax_prune_parity_spark(reader):
    a = reader.multi_match(MM, ("content", "lang"), tie_breaker=0.3,
                           k=12, prune=True).toPandas()
    b = reader.multi_match(MM, ("content", "lang"), tie_breaker=0.3,
                           k=12, prune=False).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy())


def test_dismax_skips_blocks(reader):
    """A discriminative content subquery forms theta above the weaker
    fields' bounds, so their postings decode only candidate blocks: the
    pruned run must touch strictly fewer blocks than the unpruned run.
    (A query whose weak field ties AT theta — e.g. a keyword field
    dominating the ranking — legitimately cannot restrict; that case is
    covered by the parity tests.)"""
    text = "atomic visitor java"
    reader.multi_match_local(text, ("content", "lang"), tie_breaker=0.0,
                             k=3, prune=False)  # warm caches
    reset_prune_stats()
    reader.multi_match_local(text, ("content", "lang"), tie_breaker=0.0,
                             k=3, prune=False)
    full = reset_prune_stats()
    reader.multi_match_local(text, ("content", "lang"), tie_breaker=0.0,
                             k=3, prune=True)
    pruned = reset_prune_stats()
    assert full["blocks_decoded"] == full["blocks_total"]
    assert pruned["blocks_decoded"] < full["blocks_decoded"], (pruned, full)


# -------------------------------------------------------- search_after

def _all_pages(reader, query, k, **kw):
    pages, cur = [], None
    while True:
        p = reader.search_after_local(query, k=k, after=cur, **kw)
        if not len(p):
            break
        pages.append(p)
        cur = (float(p["score"].iloc[-1]), int(p["doc_id"].iloc[-1]))
        if len(p) < k:
            break
    return pd.concat(pages, ignore_index=True) if pages else \
        pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                      "score": pd.array([], dtype="float64")})


@pytest.mark.parametrize("kw", [
    {},
    {"score_round": 6},
    {"mode": "and"},
    {"exclude": "lambda"},
    {"min_match": 2},
])
def test_search_after_prune_parity(reader, kw):
    """Walking EVERY page with pruning on reproduces the full unpruned
    ranking bit-identically (rounded ranking when score_round is set)."""
    deep = reader.search_local(Q, k=N_DOCS, prune=False, **{
        k: v for k, v in kw.items() if k != "score_round"})
    if "score_round" in kw:
        deep = deep.assign(score=deep["score"].round(6))
        deep = deep.sort_values(["score", "doc_id"],
                                ascending=[False, True],
                                kind="mergesort").reset_index(drop=True)
    got = _all_pages(reader, Q, 7, **kw)
    assert got["doc_id"].tolist() == deep["doc_id"].tolist(), kw
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  deep["score"].to_numpy())


@pytest.fixture(scope="module")
def clustered_reader(spark, tmp_path_factory):
    """Corpus where a rare term ('needle') occupies a contiguous doc-id
    band while a hot term ('common') appears everywhere with varying tf:
    once the cursor bounds the candidate band, the hot term's posting
    should decode only the band's blocks. (Uniformly-spread candidates —
    the synth corpus — legitimately touch every 128-doc block at this
    scale; clustering is what makes the skip observable.)"""
    rows = []
    for i in range(2000):
        toks = ["common"] * (1 + i % 7) + ["filler%d" % (i % 31)] * 3
        if i < 100:
            toks = ["needle"] * (1 + i % 3) + toks
        # zero-padded path: doc_id assignment sorts by (repo, path,
        # commit), so padding keeps the needle band contiguous in ids
        rows.append(("repo0", f"f{i:05d}.py", "c0", "python",
                     " ".join(toks)))
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                      "content"])
    docs = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("idx_clustered"))
    build_index(spark, docs, out, CFG)
    return IndexReader(spark, out)


def test_search_after_skips_blocks(clustered_reader):
    """Deep page under the cursor decodes strictly fewer posting blocks
    than the full-accumulation scorer (the r2 behavior, every block on
    every page): after the rare term scores, theta bounds the page to
    the needle band and the hot term reads only its blocks."""
    r = clustered_reader
    qs = "needle common"
    p1 = r.search_after_local(qs, k=10)
    assert len(p1) == 10
    cur = (float(p1["score"].iloc[-1]), int(p1["doc_id"].iloc[-1]))
    r.search_local(qs, k=2000, prune=False)  # warm posting cache
    reset_prune_stats()
    r.search_local(qs, k=2000, prune=False)
    base = reset_prune_stats()
    p2 = r.search_after_local(qs, k=10, after=cur)
    paged = reset_prune_stats()
    assert len(p2) == 10
    assert paged["blocks_decoded"] < base["blocks_decoded"], (paged, base)
    # and the page itself is exact vs the unpruned deep ranking
    deep = r.search_local(qs, k=2000, prune=False)
    want = deep[(deep["score"] < cur[0])
                | ((deep["score"] == cur[0]) & (deep["doc_id"] > cur[1]))]
    assert p2["doc_id"].tolist() == want.head(10)["doc_id"].tolist()
    np.testing.assert_array_equal(
        p2["score"].to_numpy(), want.head(10)["score"].to_numpy())


def test_search_after_page1_equals_search(reader):
    a = reader.search_after_local(Q, k=10)
    b = reader.search_local(Q, k=10)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy())


# ------------------------------------------------- restricted filters

def test_within_ids_restrict_parity_and_skip(reader):
    """Selective id filter: bit-identical scores vs prune=False, and
    strictly fewer blocks decoded than an unfiltered unpruned scan."""
    ids = np.arange(100, 140, dtype=np.int64)  # one narrow doc range
    a = reader.search_local(Q, k=20, within_ids=ids, prune=True)
    b = reader.search_local(Q, k=20, within_ids=ids, prune=False)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy())
    reader.search_local(Q, k=20, prune=False)  # warm
    reset_prune_stats()
    reader.search_local(Q, k=20, prune=False)
    full = reset_prune_stats()
    reader.search_local(Q, k=20, within_ids=ids, prune=True)
    narrow = reset_prune_stats()
    assert narrow["blocks_decoded"] < full["blocks_decoded"], (narrow, full)


def test_doc_filter_spark_restrict_parity(reader, spark):
    from pyspark.sql import functions as F
    flt = (F.col("doc_id") >= 100) & (F.col("doc_id") < 140)
    a = reader.search(Q, k=20, doc_filter=flt, prune=True).toPandas()
    b = reader.search(Q, k=20, doc_filter=flt, prune=False).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy())


@pytest.fixture(scope="module")
def skewtf_reader(spark, tmp_path_factory):
    """Corpus where the single term 'hot' has strongly banded impact:
    docs 0-99 carry tf=20 in short docs (high per-block upper bound),
    the other 3900 carry tf=1 in long docs. Single-term block-max
    skipping should decode the high band and stop."""
    rows = []
    for i in range(4000):
        if i < 100:
            toks = ["hot"] * 20 + ["pad%d" % (i % 13)] * 2
        else:
            toks = ["hot"] + ["pad%d" % (i % 13)] * 60
        rows.append(("repo0", f"f{i:05d}.py", "c0", "python",
                     " ".join(toks)))
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                      "content"])
    out = str(tmp_path_factory.mktemp("idx_skewtf"))
    build_index(spark, spark.createDataFrame(pdf), out, CFG)
    return out


def test_single_term_block_skip_exact(spark, skewtf_reader):
    """Single-term queries get BMW-style per-block skipping (MaxScore's
    term split can't skip with one term): blocks decode in upper-bound
    order and stop at the kth true score. Results are bit-identical to
    the full decode, on repeat too (partial decodes are never memoized
    as full)."""
    full = IndexReader(spark, skewtf_reader).search_local(
        "hot", k=10, prune=False)
    pruned = IndexReader(spark, skewtf_reader)
    reset_prune_stats()
    got = pruned.search_local("hot", k=10)
    st = reset_prune_stats()
    assert st["blocks_decoded"] < st["blocks_total"], st
    assert got["doc_id"].tolist() == full["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  full["score"].to_numpy())
    got2 = pruned.search_local("hot", k=10)
    assert got2["doc_id"].tolist() == full["doc_id"].tolist()


def test_single_term_prune_parity_flat_corpus(spark, built):
    """On the flat synth corpus (block maxima barely discriminate) the
    single-term fast path must still be bit-identical to the unpruned
    scorer — including boundary ties — and a full-decode round memoizes
    so repeats take the cached-array path."""
    for q in ("return", "lang:java", "getUserName"):
        a = IndexReader(spark, built).search_local(q, k=10, prune=False)
        b = IndexReader(spark, built).search_local(q, k=10)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), q
        np.testing.assert_array_equal(a["score"].to_numpy(),
                                      b["score"].to_numpy(), err_msg=q)
