"""Serving-path agg family (facets / significant_terms / top_hits) and
its ServingPool fan-out (VERDICT r4 #5): the ES model where aggs run on
data nodes and the coordinator reduces. Parity contract:

  Spark path (search_facets / significant_terms / search_top_hits)
    == X_local (single serving process)
    == pool.X at every W        (bit-identical merges)
"""

import numpy as np
import pandas as pd
import pytest

from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.operators.serving import ServingPool
from maestro_spark.sources.corpus import synth_docs

N_DOCS = 400
CFG = IndexConfig(
    shard_size=32,            # -> 13 shards: real fan-out
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
)
QUERIES = ["user merge", "error retry", "stream window", "token"]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_aggs"))
    build_index(spark, synth_docs(spark, N_DOCS, seed=37, partitions=4),
                out, CFG)
    return out


@pytest.fixture(scope="module")
def sreader(spark, idx):
    return IndexReader(spark, idx)


@pytest.fixture(scope="module")
def lreader(idx):
    return IndexReader(None, idx)


@pytest.fixture(scope="module")
def pool(idx):
    with ServingPool(idx, n_workers=3) as p:
        yield p


def _frames_equal(a: pd.DataFrame, b: pd.DataFrame, float_cols=(),
                  msg=""):
    assert list(a.columns) == list(b.columns), msg
    assert len(a) == len(b), f"{msg}: {len(a)} vs {len(b)} rows"
    for c in a.columns:
        if c in float_cols:
            np.testing.assert_array_equal(
                a[c].to_numpy(np.float64), b[c].to_numpy(np.float64),
                err_msg=f"{msg}:{c}")
        else:
            assert a[c].tolist() == b[c].tolist(), f"{msg}:{c}"


# ------------------------------------------------------------- facets


def test_facets_local_matches_spark(sreader, lreader):
    for q in QUERIES:
        want = sreader.search_facets(q, ("lang",)).toPandas()
        got = lreader.facets_local(q, ("lang",))
        _frames_equal(got, want, msg=f"facets {q}")


def test_facets_local_multicol_and_kwargs(sreader, lreader):
    want = sreader.search_facets("user merge", ("lang", "repo"),
                                 mode="or", exclude="java").toPandas()
    got = lreader.facets_local("user merge", ("lang", "repo"),
                               mode="or", exclude="java")
    _frames_equal(got, want, msg="facets multicol")
    want = sreader.search_facets("user merge stream", ("lang",),
                                 min_match=2).toPandas()
    got = lreader.facets_local("user merge stream", ("lang",),
                               min_match=2)
    _frames_equal(got, want, msg="facets min_match")


def test_pool_facets_parity(lreader, pool, idx):
    for q in QUERIES:
        want = lreader.facets_local(q, ("lang",))
        got = pool.facets(q, ("lang",))
        _frames_equal(got, want, msg=f"pool facets {q}")
    for w in (1, 4):
        with ServingPool(idx, n_workers=w) as p:
            _frames_equal(p.facets("user merge", ("lang", "repo")),
                          lreader.facets_local("user merge",
                                               ("lang", "repo")),
                          msg=f"pool facets W={w}")


def test_facets_no_match_empty(lreader, pool):
    got = lreader.facets_local("zzqfoo", ("lang",))
    assert len(got) == 0 and list(got.columns) == ["lang", "n_docs"]
    assert len(pool.facets("zzqfoo", ("lang",))) == 0


# --------------------------------------------------------- count_many


def test_pool_count_many_parity(lreader, pool, idx):
    qs = {"a": "user merge", "b": "error retry", "c": "zzqfoo",
          "d": "token"}
    want = lreader.count_many_local(qs)
    assert pool.count_many(qs) == want
    assert pool.count_many(qs, mode="and") == \
        lreader.count_many_local(qs, mode="and")
    assert pool.count_many(qs, exclude="java") == \
        lreader.count_many_local(qs, exclude="java")
    for w in (1, 4):
        with ServingPool(idx, n_workers=w) as p:
            assert p.count_many(qs) == want, f"W={w}"


# --------------------------------------------------------- search_after


def test_pool_search_after_pagination_parity(lreader, pool):
    """Three pages through the pool == three pages single-process, at
    any cursor depth (the cursor compare happens shard-side)."""
    q = "user merge"
    after = None
    for page in range(3):
        want = lreader.search_after_local(q, k=7, after=after)
        got = pool.search_after(q, k=7, after=after)
        _frames_equal(got, want, float_cols=("score",),
                      msg=f"page {page}")
        if not len(want):
            break
        after = (float(want["score"].iloc[-1]),
                 int(want["doc_id"].iloc[-1]))


def test_pool_search_after_worker_invariance(lreader, idx):
    q = "error retry"
    p1 = lreader.search_after_local(q, k=5)
    after = (float(p1["score"].iloc[-1]), int(p1["doc_id"].iloc[-1]))
    want = lreader.search_after_local(q, k=5, after=after)
    for w in (1, 4):
        with ServingPool(idx, n_workers=w) as p:
            _frames_equal(p.search_after(q, k=5, after=after), want,
                          float_cols=("score",), msg=f"W={w}")


# ---------------------------------------------------------- histogram


def test_histogram_local_matches_spark(spark, sreader, lreader):
    from pyspark.sql import functions as F
    for q in ("user merge", "token"):
        want = sreader.search_histogram(q, F.length("content"),
                                        50).toPandas()
        got = lreader.histogram_local(q, "length:content", 50)
        _frames_equal(got, want, float_cols=("bucket",),
                      msg=f"histogram {q}")


def test_pool_histogram_parity(lreader, pool, idx):
    want = lreader.histogram_local("user merge", "length:content", 50)
    got = pool.histogram("user merge", "length:content", 50)
    _frames_equal(got, want, float_cols=("bucket",), msg="pool histo")
    for w in (1, 4):
        with ServingPool(idx, n_workers=w) as p:
            _frames_equal(p.histogram("token", "length:content", 50),
                          lreader.histogram_local("token",
                                                  "length:content", 50),
                          float_cols=("bucket",), msg=f"pool histo W={w}")


# --------------------------------------------------- significant_terms


@pytest.mark.parametrize("heuristic",
                         ["jlh", "chi_square", "mutual_information"])
def test_sig_terms_local_matches_spark(sreader, lreader, heuristic):
    q = "user merge"
    want = sreader.significant_terms(q, size=12,
                                     heuristic=heuristic).toPandas()
    got = lreader.significant_terms_local(q, size=12,
                                          heuristic=heuristic)
    _frames_equal(got, want, float_cols=("score",),
                  msg=f"sig {heuristic}")


def test_sig_terms_local_sampled_matches_spark(sreader, lreader):
    q = "user merge"
    want = sreader.significant_terms(q, size=12, sample_top=5,
                                     score_round=6).toPandas()
    got = lreader.significant_terms_local(q, size=12, sample_top=5,
                                          score_round=6)
    _frames_equal(got, want, float_cols=("score",), msg="sig sampled")


def test_pool_sig_terms_parity(lreader, pool, idx):
    q = "user merge"
    for heuristic in ("jlh", "chi_square"):
        want = lreader.significant_terms_local(q, size=12,
                                               heuristic=heuristic)
        got = pool.significant_terms(q, size=12, heuristic=heuristic)
        _frames_equal(got, want, float_cols=("score",),
                      msg=f"pool sig {heuristic}")
    for w in (1, 4):
        with ServingPool(idx, n_workers=w) as p:
            _frames_equal(p.significant_terms(q, size=12),
                          lreader.significant_terms_local(q, size=12),
                          float_cols=("score",), msg=f"pool sig W={w}")


def test_pool_sig_terms_sampled_parity(lreader, pool):
    """The sampler foreground is per-shard, so any worker partitioning
    reproduces the exact same sample."""
    q = "user merge"
    want = lreader.significant_terms_local(q, size=12, sample_top=5,
                                           score_round=6)
    got = pool.significant_terms(q, size=12, sample_top=5,
                                 score_round=6)
    _frames_equal(got, want, float_cols=("score",), msg="pool sampled")


def test_sig_sampler_pruned_equals_full_scan(lreader):
    """The unrounded sampler cut uses the PRUNED top-k scorer; MaxScore
    top-k is exact, so the picked foreground — and therefore the whole
    agg — must equal ranking the full scored match set."""
    q = "user merge"
    got = lreader._sig_sampled_ids(q, 5, "or", None, 1, None)
    sc = lreader._scored_ids_by_shard(q, "or", None, None, 1)
    want = {s: np.sort(ids[:5]) for s, (ids, _) in sc.items()}
    want = {s: v for s, v in want.items() if v.size}
    assert set(got) == set(want)
    for s in want:
        np.testing.assert_array_equal(got[s], want[s], err_msg=str(s))


def test_pool_sig_budget_routes_to_sampler(lreader, pool):
    """Over-budget foreground auto-routes to the sampler pool-wide, with
    the budget decided on the POOL-WIDE count (same decision as the
    single-process path)."""
    q = "user merge"
    want = lreader.significant_terms_local(q, size=12, fg_budget=1)
    got = pool.significant_terms(q, size=12, fg_budget=1)
    _frames_equal(got, want, float_cols=("score",), msg="pool budget")
    with pytest.raises(ValueError, match="re-analysis budget"):
        pool.significant_terms(q, size=5, fg_budget=1,
                               on_over_budget="raise")


# ------------------------------------------------------------ top_hits


def test_top_hits_local_matches_spark(sreader, lreader):
    for q in ("user merge", "error retry"):
        want = sreader.search_top_hits(q, "lang", per_group=3,
                                       k_groups=5).toPandas()
        got = lreader.top_hits_local(q, "lang", per_group=3, k_groups=5)
        _frames_equal(got, want, float_cols=("score",),
                      msg=f"top_hits {q}")


def test_top_hits_local_kwargs_match_spark(sreader, lreader):
    want = sreader.search_top_hits(
        "user merge", "repo", per_group=2, k_groups=4,
        boosts={"content": 1.0, "path": 2.0}, score_round=6).toPandas()
    got = lreader.top_hits_local(
        "user merge", "repo", per_group=2, k_groups=4,
        boosts={"content": 1.0, "path": 2.0}, score_round=6)
    _frames_equal(got, want, float_cols=("score",), msg="top_hits kw")


def test_pool_top_hits_parity(lreader, pool, idx):
    for q in ("user merge", "error retry"):
        want = lreader.top_hits_local(q, "lang", per_group=3, k_groups=5)
        got = pool.top_hits(q, "lang", per_group=3, k_groups=5)
        _frames_equal(got, want, float_cols=("score",),
                      msg=f"pool top_hits {q}")
    for w in (1, 4):
        with ServingPool(idx, n_workers=w) as p:
            _frames_equal(
                p.top_hits("user merge", "repo", per_group=2, k_groups=4),
                lreader.top_hits_local("user merge", "repo",
                                       per_group=2, k_groups=4),
                float_cols=("score",), msg=f"pool top_hits W={w}")


def test_top_hits_no_match_empty(lreader, pool):
    got = lreader.top_hits_local("zzqfoo", "lang")
    assert len(got) == 0
    assert list(got.columns) == ["group_value", "grp_rank", "doc_id",
                                 "score"]
    assert len(pool.top_hits("zzqfoo", "lang")) == 0
