"""ES data stream + rollover (operators/datastream.py): append routes
to the write index, the max_docs condition seals it, and a stream
search with global stats (dfs) is bit-identical to one combined index —
so rollover never changes relevance."""

import os

import pytest

from maestro_spark.operators import datastream as ds
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs_pandas

CFG = IndexConfig(shard_size=64, n_buckets=8, n_salts=2,
                  hot_df_fraction=0.05, sample_fraction=1.0)

N = 180
Q = "user merge"


@pytest.fixture(scope="module")
def stream(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    ds.create_stream(base, max_docs=100)
    corpus = synth_docs_pandas(N, seed=9)
    results = []
    for lo in (0, 60, 120):
        batch = spark.createDataFrame(corpus.iloc[lo:lo + 60])
        results.append(ds.append(spark, base, batch, CFG))
    cdir = str(tmp_path_factory.mktemp("stream_combined"))
    build_index(spark, spark.createDataFrame(corpus), cdir, CFG)
    return base, cdir, results


def test_rollover_condition(stream):
    base, _cdir, results = stream
    assert [r["rolled"] for r in results] == [False, True, False]
    m = ds.read_manifest(ds._stream_path(base))
    assert m["backing"] == ["ds-000001", "ds-000002"]
    assert m["write"] == "ds-000002"
    assert m["sealed"]["ds-000001"]["n_docs"] == 120  # sealed at 120 >= 100
    assert ds._doc_count(base, "ds-000002") == 60


def test_create_and_append_guards(spark, stream, tmp_path):
    base, _c, _r = stream
    with pytest.raises(ValueError, match="exists"):
        ds.create_stream(base)
    with pytest.raises(ValueError, match="no stream"):
        ds.append(spark, str(tmp_path / "nostream"),
                  spark.createDataFrame(synth_docs_pandas(5, seed=1)), CFG)


def _path_of(spark, idx_dir):
    rows = spark.read.parquet(os.path.join(idx_dir, "docs")) \
        .select("doc_id", "path").collect()
    return {int(r["doc_id"]): r["path"] for r in rows}


def test_stream_search_bit_identical_to_combined(spark, stream):
    """Global-stats stream search ≡ one combined index: same docs (by
    key) in the same order with bit-identical float64 scores."""
    base, cdir, _r = stream
    got = ds.search_stream(base, Q, k=25)
    want = IndexReader(None, cdir).search_local(Q, k=25)
    assert got["score"].tolist() == want["score"].tolist()
    maps = {b: _path_of(spark, os.path.join(base, b))
            for b in ds.read_manifest(ds._stream_path(base))["backing"]}
    cmap = _path_of(spark, cdir)
    got_paths = [maps[r["index"]][int(r["doc_id"])]
                 for _, r in got.iterrows()]
    want_paths = [cmap[int(d)] for d in want["doc_id"]]
    assert got_paths == want_paths


def test_stream_count(stream):
    base, cdir, _r = stream
    per = ds.count_stream(base, Q)
    assert set(per) == {"ds-000001", "ds-000002"}
    assert sum(per.values()) == IndexReader(None, cdir).count_local(Q)
