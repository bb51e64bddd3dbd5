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
