"""reindex (ES _reindex analogue): rebuild from a source index's
docstore. keep_ids must make results IDENTICAL across a shard-size
change; a config change (positions on, tokenizer swap) must take
effect; the alias flip must retarget an open reader."""

import numpy as np
import pytest

from maestro_spark.operators.build import IndexConfig, build_index, reindex
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs

N_DOCS = 250
CFG = IndexConfig(
    shard_size=100,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
)
QUERIES = ["user merge", "getUserName", "lang:java stream", "cache"]


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_src"))
    build_index(spark, synth_docs(spark, N_DOCS, seed=7, partitions=5),
                out, CFG)
    return out


def test_reindex_reshard_identical_results(spark, src, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("idx_resharded"))
    cfg2 = IndexConfig(**{**CFG.to_dict(),
                          "index_fields": CFG.index_fields,
                          "stored_columns": CFG.stored_columns,
                          "shard_size": 37, "n_buckets": 4})
    m = reindex(spark, src, dst, cfg2, keep_ids=True, versioned=True)
    assert m["n_docs"] == N_DOCS
    r_src = IndexReader(spark, src)
    r_dst = IndexReader(spark, dst)  # alias base dir resolves to v1
    for q in QUERIES:
        a = r_src.search_local(q, k=10)
        b = r_dst.search_local(q, k=10)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), q
        np.testing.assert_array_equal(a["score"].to_numpy(),
                                      b["score"].to_numpy(), err_msg=q)


def test_reindex_default_cfg_is_compaction(spark, src, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("idx_compacted"))
    reindex(spark, src, dst, versioned=False)
    r_src = IndexReader(spark, src)
    r_dst = IndexReader(spark, dst)
    assert r_dst.cfg == r_src.cfg
    a = r_src.search_local("user merge", k=10)
    b = r_dst.search_local("user merge", k=10)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_reindex_enables_positions(spark, src, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("idx_positions"))
    cfg2 = IndexConfig(**{**CFG.to_dict(),
                          "index_fields": CFG.index_fields,
                          "stored_columns": CFG.stored_columns,
                          "store_positions": True})
    reindex(spark, src, dst, cfg2)
    r_src = IndexReader(spark, src)
    r_dst = IndexReader(spark, dst)
    with pytest.raises(ValueError):
        r_src.phrase_search_local("get user", k=3)
    hits = r_dst.phrase_search_local("get user", k=3)
    assert len(hits) > 0


def test_reindex_rejects_self_target(spark, src):
    with pytest.raises(ValueError):
        reindex(spark, src, src)
