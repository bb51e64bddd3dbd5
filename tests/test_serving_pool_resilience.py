"""ServingPool fault tolerance (VERDICT r4 #2 / ADVICE r4) and routed-
query correctness under shard-subset workers (ADVICE r4 medium).

The reference's query side is an ES *cluster*
(maestro-app/src/main/resources/file_centric.json:6) that reroutes when
a data node dies; ServingPool mirrors that with respawn-and-resend in
_broadcast. These tests SIGKILL workers (idle and mid-request), assert
the pool still answers bit-identically, assert the degraded-pool
timeout fires instead of deadlocking, and assert routed queries are
answered exactly once (only the owning worker scores the routed shard).
"""

import os
import signal
import threading
import time

import numpy as np
import pandas as pd
import pytest

from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.operators.serving import ServingPool
from maestro_spark.sources.corpus import synth_docs

N_DOCS = 300
CFG = IndexConfig(
    shard_size=32,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
    store_positions=True,
)
ROUTED_CFG = IndexConfig(
    shard_size=512,
    n_buckets=8,
    n_salts=2,
    sample_fraction=1.0,
    routing_col="lang",
    n_routing_shards=6,
)
Q = "user merge"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_resil"))
    build_index(spark, synth_docs(spark, N_DOCS, seed=29, partitions=4),
                out, CFG)
    return out


@pytest.fixture(scope="module")
def routed_idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_resil_routed"))
    build_index(spark, synth_docs(spark, N_DOCS, seed=31, partitions=4),
                out, ROUTED_CFG)
    return out


def _assert_hits_equal(a: pd.DataFrame, b: pd.DataFrame, msg=""):
    assert a["doc_id"].tolist() == b["doc_id"].tolist(), msg
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy(), err_msg=msg)


# ------------------------------------------------- routed fan-out (ADVICE)


def test_pool_routed_search_parity_no_duplicates(routed_idx):
    """Every worker used to fetch and score the SAME routed shard, so
    pool.search(routing=...) returned hits duplicated up to W times —
    now only the owning worker (rshard % W == w) answers."""
    seq = IndexReader(None, routed_idx)
    langs = ["java", "python", "scala", "js", "go", "md", "yaml"]
    with ServingPool(routed_idx, n_workers=3) as pool:
        for r in langs:
            got = pool.search(Q, k=10, routing=r)
            want = seq.search_local(Q, k=10, routing=r)
            assert got["doc_id"].is_unique, f"duplicated hits routing={r}"
            _assert_hits_equal(got, want, msg=f"routing={r}")


def test_pool_routed_count_not_multiplied(routed_idx):
    seq = IndexReader(None, routed_idx)
    for w in (1, 3, 4):
        with ServingPool(routed_idx, n_workers=w) as pool:
            for r in ("java", "py", "go"):
                assert pool.count(Q, routing=r) == \
                    seq.count_local(Q, routing=r), f"W={w} routing={r}"


def test_subset_reader_routed_fetch_owner_only(routed_idx):
    """Direct unit check on the data-node contract: a (w, W) reader
    returns routed postings ONLY for shards it owns."""
    seq = IndexReader(None, routed_idx)
    terms = seq.plan(Q).terms
    for rshard in range(ROUTED_CFG.n_routing_shards):
        owners = 0
        for w in range(3):
            r = IndexReader(None, routed_idx, shard_subset=(w, 3))
            got = r._fetch_posting_rows_routed(terms, rshard)
            if got:
                owners += 1
                assert set(got) == {rshard}
                assert rshard % 3 == w
        full = seq._fetch_posting_rows_routed(terms, rshard)
        assert owners == (1 if full else 0), f"rshard={rshard}"


# --------------------------------------------- worker death / no deadlock


def test_pool_recovers_from_idle_worker_sigkill(idx):
    seq = IndexReader(None, idx)
    want = seq.search_local(Q, k=10)
    with ServingPool(idx, n_workers=3) as pool:
        base = pool.search(Q, k=10)
        _assert_hits_equal(base, want)
        victim = pool._procs[1]
        os.kill(victim.pid, signal.SIGKILL)
        victim.join(timeout=10)
        got = pool.search(Q, k=10)     # must respawn, not deadlock
        _assert_hits_equal(got, want, msg="post-SIGKILL search")
        assert pool._last_respawned == [1]
        assert pool._procs[1].pid != victim.pid
        assert pool.count(Q) == seq.count_local(Q)
        # subsequent requests need no further respawn
        pool.search(Q, k=10)
        assert pool._last_respawned == []


def test_pool_recovers_from_midrequest_sigkill(idx):
    """Kill a worker WHILE it is serving a request: the coordinator's
    liveness sweep respawns it and re-sends the in-flight request, so
    the call completes with a full (bit-identical) answer."""
    seq = IndexReader(None, idx)
    with ServingPool(idx, n_workers=3) as pool:
        pool.search(Q, k=10)            # warm / prove healthy
        victim_pid = pool._procs[2].pid
        outs = {}

        def _req():
            outs["pong"] = pool._broadcast("ping", {"delay": 4.0})

        t = threading.Thread(target=_req)
        t.start()
        time.sleep(1.0)                 # worker 2 is mid-sleep
        os.kill(victim_pid, signal.SIGKILL)
        t.join(timeout=60)
        assert not t.is_alive(), "coordinator deadlocked on dead worker"
        assert len(outs["pong"]) == 3 and all(outs["pong"])
        assert 2 in pool._last_respawned
        _assert_hits_equal(pool.search(Q, k=10),
                           seq.search_local(Q, k=10),
                           msg="post-midrequest-SIGKILL search")


def test_pool_phrase_survives_worker_death_between_phases(idx):
    """Deterministically kill a worker BETWEEN phase 1 and phase 2: the
    worker-side phrase cache dies with it, the respawned worker raises
    in phase 2, and pool.phrase retries the whole two-phase protocol —
    result still bit-identical."""
    seq = IndexReader(None, idx)
    want = seq.phrase_search_local(Q, k=10)
    with ServingPool(idx, n_workers=3) as pool:
        orig = pool._broadcast
        state = {"killed": False}

        def patched(method, kwargs, timeout=None):
            out = orig(method, kwargs, timeout)
            if method == "phrase_count" and not state["killed"]:
                state["killed"] = True
                victim = pool._procs[0]
                os.kill(victim.pid, signal.SIGKILL)
                victim.join(timeout=10)
            return out

        pool._broadcast = patched
        try:
            got = pool.phrase(Q, k=10)
        finally:
            pool._broadcast = orig
        assert state["killed"], "kill hook never fired"
        _assert_hits_equal(got, want, msg="phrase after inter-phase kill")
        # pool fully healthy afterwards
        _assert_hits_equal(pool.search(Q, k=10),
                           seq.search_local(Q, k=10))


def test_pool_follows_alias_flip_without_restart(spark, tmp_path):
    """Blue/green retargeting through a LIVE pool: workers re-resolve
    the index alias per request, so an incremental build that flips
    {base}/vN retargets every worker — no restarts, cache-consistent
    (the ES alias-swap contract the docstring promises)."""
    import pyspark.sql.functions as F

    from maestro_spark.operators.build import build_index_versioned
    from maestro_spark.operators.incremental import \
        incremental_update_versioned
    from maestro_spark.sources.tableio import resolve_alias

    vcfg = IndexConfig(shard_size=64, n_buckets=8, n_salts=4,
                       hot_df_fraction=0.02, sample_fraction=1.0)
    base = str(tmp_path / "idx_pool_alias")
    build_index_versioned(spark, synth_docs(spark, 200, seed=41,
                                            partitions=4), base, vcfg)
    with ServingPool(base, n_workers=3) as pool:
        assert pool.count("zzqflip") == 0
        baseline = pool.search("user merge", k=10)
        docs = spark.read.parquet(os.path.join(resolve_alias(base),
                                               "docs"))
        batch = (docs.orderBy("doc_id").limit(5)
                 .select("repo", "path", "commit", "lang",
                         F.concat(F.col("content"),
                                  F.lit(" zzqflip")).alias("content")))
        incremental_update_versioned(spark, base, batch, None, vcfg)
        assert resolve_alias(base).endswith("v2")
        # the SAME pool, no restart: sees v2
        assert pool.count("zzqflip") == 5
        seq = IndexReader(None, base)
        _assert_hits_equal(pool.search("zzqflip", k=5),
                           seq.search_local("zzqflip", k=5),
                           msg="post-flip parity")
        _assert_hits_equal(pool.search("user merge", k=10),
                           seq.search_local("user merge", k=10),
                           msg="post-flip main query")
        assert len(baseline) == 10   # pre-flip result was served


def test_pool_degraded_raises_instead_of_deadlock(idx):
    """A worker that is alive-but-silent past the request timeout yields
    a clear pool-degraded error, never an infinite block; its late
    (stale) reply must not be mis-collected by the next request."""
    seq = IndexReader(None, idx)
    with ServingPool(idx, n_workers=3) as pool:
        with pytest.raises(RuntimeError, match="ServingPool degraded"):
            pool._broadcast("ping", {"delay": 8.0}, timeout=2.0)
        # the three late pongs are stale replies for the NEXT request;
        # it must still collect exactly one fresh reply per worker
        assert pool.count(Q) == seq.count_local(Q)
        _assert_hits_equal(pool.search(Q, k=10),
                           seq.search_local(Q, k=10),
                           msg="post-timeout search")
