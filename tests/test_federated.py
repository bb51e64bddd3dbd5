"""Federated (cross-index) search: the Maestro/ES pattern of one request
spanning the file-centric + analysis-centric sibling indices. Each index
scores with its own stats; the coordinator merge is a deterministic
total order and equals the manual merge of per-index results."""

import pandas as pd
import pytest

from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import (IndexReader,
                                            count_federated_local,
                                            search_federated_local)
from maestro_spark.sources.corpus import synth_docs

CFG = IndexConfig(shard_size=150, n_buckets=8, n_salts=4,
                  hot_df_fraction=0.05, sample_fraction=1.0)

Q = "index query merge"


@pytest.fixture(scope="module")
def readers(spark, tmp_path_factory):
    out = {}
    for name, (n, seed) in {"file_centric": (300, 42),
                            "analysis_centric": (180, 7)}.items():
        d = str(tmp_path_factory.mktemp(f"fed_{name}"))
        build_index(spark, synth_docs(spark, n, seed=seed, partitions=4),
                    d, CFG)
        out[name] = IndexReader(None, d)  # serving mode: no JVM needed
    return out


def test_federated_equals_manual_merge(readers):
    k = 12
    got = search_federated_local(readers, Q, k=k)
    parts = []
    for name, r in readers.items():
        h = r.search_local(Q, k=k)
        h.insert(0, "index", name)
        parts.append(h)
    want = (pd.concat(parts, ignore_index=True)
            .sort_values(["score", "index", "doc_id"],
                         ascending=[False, True, True], kind="mergesort")
            .head(k).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # both indices contribute somewhere in a deep page (the smaller
    # corpus dominates the very top: higher idf — the per-index-stats
    # contract, same as ES cross-index defaults)
    deep = search_federated_local(readers, Q, k=480)
    assert set(deep["index"]) == {"file_centric", "analysis_centric"}


def test_federated_scores_match_single_index(readers):
    got = search_federated_local(readers, Q, k=50)
    for name, r in readers.items():
        solo = r.search_local(Q, k=50)
        sub = got[got["index"] == name]
        merged = sub.merge(solo, on="doc_id", suffixes=("_fed", "_solo"))
        assert (merged["score_fed"] == merged["score_solo"]).all()


def test_federated_count_and_bool(readers):
    counts = count_federated_local(readers, Q)
    assert counts == {name: r.count_local(Q)
                      for name, r in readers.items()}
    ex = search_federated_local(readers, Q, k=200, exclude="return")
    base = search_federated_local(readers, Q, k=200)
    ex_keys = set(zip(ex["index"], ex["doc_id"]))
    # exclusion only removes rows, never reorders survivors: the
    # survivors within base's page are a PREFIX of the excluded ranking
    # (ex continues deeper than base's cut, so compare prefixes)
    survivors = base[[(i, d) in ex_keys
                      for i, d in zip(base["index"], base["doc_id"])]]
    n = len(survivors)
    assert n > 0
    pd.testing.assert_frame_equal(
        survivors.reset_index(drop=True), ex.head(n))


# ---------------------------------------------------------------- dfs
# search_type=dfs_query_then_fetch: global statistics gathered first,
# so federated scores are comparable across indexes and — for disjoint
# indexes — bit-identical to one combined index.

from maestro_spark.operators.search import (  # noqa: E402
    federated_global_plans, search_federated_dfs_local)
from maestro_spark.sources.corpus import synth_docs_pandas  # noqa: E402


@pytest.fixture(scope="module")
def split_readers(spark, tmp_path_factory):
    """One 300-doc corpus split into disjoint halves (ids preserved via
    id_col) plus the combined index — the dfs oracle."""
    corpus = synth_docs_pandas(300, seed=11).reset_index(names="doc_id")
    out = {}
    for name, part in {
        "a_lo": corpus[corpus["doc_id"] < 150],
        "b_hi": corpus[corpus["doc_id"] >= 150],
        "combined": corpus,
    }.items():
        d = str(tmp_path_factory.mktemp(f"dfs_{name}"))
        build_index(spark, spark.createDataFrame(part), d, CFG,
                    id_col="doc_id")
        out[name] = IndexReader(None, d)
    return out


def test_dfs_bit_identical_to_combined_index(split_readers):
    halves = {n: r for n, r in split_readers.items() if n != "combined"}
    combined = split_readers["combined"]
    for q, kw in ((Q, {}), ("merge stream", {"min_match": 2}),
                  ("index query merge", {"exclude": "return"}),
                  ("lang:java stream", {})):
        got = search_federated_dfs_local(halves, q, k=25, **kw)
        want = combined.search_local(q, k=25, **kw)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
        assert got["score"].tolist() == want["score"].tolist(), q


def test_dfs_global_plan_stats(split_readers):
    """The DFS phase reproduces the combined index's idf/avgdl floats
    exactly (integer sums, then one division — same arithmetic as
    build_index's stats fold)."""
    halves = {n: r for n, r in split_readers.items() if n != "combined"}
    plans = federated_global_plans(halves, Q)
    want = split_readers["combined"].plan(Q)
    for name, p in plans.items():
        for t in p.terms:
            assert p.idfs[t] == want.idfs[t], (name, t)
        for f, a in p.avgdl.items():
            assert a == want.avgdl[f], (name, f)
            assert p.n_docs[f] == want.n_docs[f], (name, f)


def test_dfs_boosts_ride_global_idf(split_readers):
    halves = {n: r for n, r in split_readers.items() if n != "combined"}
    combined = split_readers["combined"]
    boosts = {"content": 1.0, "lang": 2.5}
    got = search_federated_dfs_local(halves, "lang:java stream", k=20,
                                     boosts=boosts)
    want = combined.search_local("lang:java stream", k=20, boosts=boosts)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()


def test_dfs_differs_from_per_index_stats(split_readers):
    """Sanity: the default per-index-stats path scores differently
    (otherwise dfs would be a no-op) while dfs matches the combined
    ranking even where the default diverges."""
    halves = {n: r for n, r in split_readers.items() if n != "combined"}
    dfs = search_federated_dfs_local(halves, Q, k=50)
    default = search_federated_local(halves, Q, k=50)
    merged = dfs.merge(default, on=["index", "doc_id"],
                       suffixes=("_dfs", "_def"))
    assert (merged["score_dfs"] != merged["score_def"]).any()
