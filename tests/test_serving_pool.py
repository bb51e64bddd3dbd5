"""ServingPool (shard-parallel serving tier): bit-identical parity with
the single-process serving path, shard-subset disjointness, worker-count
invariance, msearch/count surfaces, and error propagation."""

import numpy as np
import pandas as pd
import pytest

from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.operators.serving import ServingPool
from maestro_spark.sources.corpus import synth_docs

N_DOCS = 300
CFG = IndexConfig(
    shard_size=32,            # -> 10 shards: real fan-out even at W=4
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
    store_positions=True,     # phrase fan-out (dfs_query_then_fetch)
)
QUERIES = ["user merge", "getUserName", "error retry", "stream window",
           "lang:java cache", "token"]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_pool"))
    build_index(spark, synth_docs(spark, N_DOCS, seed=23, partitions=4),
                out, CFG)
    return out


@pytest.fixture(scope="module")
def pool(idx):
    with ServingPool(idx, n_workers=3) as p:
        yield p


def _assert_hits_equal(a: pd.DataFrame, b: pd.DataFrame, msg=""):
    assert a["doc_id"].tolist() == b["doc_id"].tolist(), msg
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy(), err_msg=msg)


def test_pool_search_parity_bit_identical(idx, pool):
    seq = IndexReader(None, idx)
    for q in QUERIES:
        _assert_hits_equal(pool.search(q, k=10), seq.search_local(q, k=10),
                           msg=q)


def test_pool_search_kwargs_passthrough(idx, pool):
    seq = IndexReader(None, idx)
    a = pool.search("user merge stream", k=8, mode="or", min_match=2,
                    exclude="java")
    b = seq.search_local("user merge stream", k=8, mode="or", min_match=2,
                         exclude="java")
    _assert_hits_equal(a, b)
    _assert_hits_equal(pool.search("user merge", k=5, mode="and"),
                       seq.search_local("user merge", k=5, mode="and"))


def test_pool_worker_count_invariance(idx):
    """W=1, W=4, W>n_shards all produce the identical top-k (empty
    subsets included)."""
    seq = IndexReader(None, idx)
    for w in (1, 4, 16):
        with ServingPool(idx, n_workers=w) as p:
            for q in ("user merge", "error retry"):
                _assert_hits_equal(p.search(q, k=10),
                                   seq.search_local(q, k=10),
                                   msg=f"W={w} {q}")


def test_pool_msearch_parity(idx, pool):
    seq = IndexReader(None, idx)
    qs = {"a": "user merge", "b": "getUserName", "c": "zzzznotaterm"}
    got = pool.msearch(qs, k=6)
    want = seq.search_many_local(qs, k=6)
    assert sorted(got["qid"].unique()) == sorted(want["qid"].unique())
    for qid in got["qid"].unique():
        _assert_hits_equal(got[got["qid"] == qid].reset_index(drop=True),
                           want[want["qid"] == qid].reset_index(drop=True),
                           msg=qid)


def test_pool_count_sums_disjoint_shards(idx, pool):
    seq = IndexReader(None, idx)
    for q in QUERIES:
        assert pool.count(q) == seq.count_local(q), q
    assert pool.count("user merge", mode="and") == \
        seq.count_local("user merge", mode="and")


def test_pool_shard_ownership_disjoint_and_complete(idx, pool):
    stats = pool.stats()
    owned = [s for st in stats for s in st["shards"]]
    assert len(owned) == len(set(owned)), "shard owned twice"
    all_shards = set(int(s) for s in IndexReader(None, idx)
                     .manifest["shards"])
    assert set(owned) == all_shards
    pids = {st["pid"] for st in stats}
    assert len(pids) == 3, "workers share a process"


def test_subset_reader_fetch_restricted(idx):
    """A (w, W) reader's posting fetch returns ONLY its own shards —
    the partition-pruned read the data-node contract promises."""
    r = IndexReader(None, idx, shard_subset=(1, 3))
    by_shard = r._fetch_posting_rows(["user", "merge"])
    assert by_shard, "subset reader fetched nothing"
    assert all(s % 3 == 1 for s in by_shard)
    full = IndexReader(None, idx)._fetch_posting_rows(["user", "merge"])
    assert set(by_shard) == {s for s in full if s % 3 == 1}


def test_pool_error_propagates(pool):
    with pytest.raises(RuntimeError, match="serving worker"):
        pool._broadcast("bogus-method", {})
    with pytest.raises(RuntimeError, match="serving worker"):
        pool.search("user", k=10, no_such_kwarg=1)
    # the pool survives a failed request
    assert len(pool.search("user merge", k=3)) > 0


def test_pool_empty_query_and_absent_term(pool, idx):
    seq = IndexReader(None, idx)
    _assert_hits_equal(pool.search("zzzznotaterm", k=5),
                       seq.search_local("zzzznotaterm", k=5))


# ------------------------------------- phrase fan-out (dfs_query_then_fetch)


def test_pool_phrase_parity_bit_identical(idx, pool):
    """Two-phase global-df protocol == the single-process path, which
    computes the same df by concatenating all shards in one process."""
    seq = IndexReader(None, idx)
    for ph, kw in [("user merge", {}), ("get user", {}),
                   ("user merge", {"slop": 2}),
                   ("big s", {"prefix_last": True})]:
        _assert_hits_equal(pool.phrase(ph, k=10, **kw),
                           seq.phrase_search_local(ph, k=10, **kw),
                           msg=f"{ph} {kw}")


def test_pool_phrase_single_term_fallback(idx, pool):
    seq = IndexReader(None, idx)
    _assert_hits_equal(pool.phrase("user", k=8),
                       seq.phrase_search_local("user", k=8))


def test_pool_phrase_no_match_empty(idx, pool):
    out = pool.phrase("zzqfoo zzqbar", k=5)
    assert len(out) == 0 and list(out.columns) == ["doc_id", "score"]
    # pool still healthy afterwards (phase-2 release ran)
    assert len(pool.search("user merge", k=3)) > 0


def test_pool_phrase_df_is_global(idx, pool):
    """The scored idf must come from the SUMMED df: check against a
    manual recomputation from the sequential match."""
    seq = IndexReader(None, idx)
    m = seq._phrase_match_arrays("user merge")
    assert m is not None and m[0].size > 0
    got = pool.phrase("user merge", k=5)
    want = seq._phrase_score_topk(*m, k=5)
    _assert_hits_equal(got, want)


def test_pool_expansion_and_boosts_parity(idx, pool):
    """fuzzy/wildcard expansion + BM25F boosts run in plan() per worker
    against the GLOBAL termdict/stats, so fan-out stays bit-identical."""
    seq = IndexReader(None, idx)
    for q, kw in [("getUserNam~1", {}), ("get*", {}),
                  ("user merge", {"boosts": {"content": 1.0, "path": 2.0}})]:
        _assert_hits_equal(pool.search(q, k=10, **kw),
                           seq.search_local(q, k=10, **kw),
                           msg=f"{q} {kw}")
