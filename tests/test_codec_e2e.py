"""Codec v2 (FOR bit-packing) end-to-end: an index built with
codec="for" must answer every query bit-identically to the varint twin
over the same corpus, at a smaller posting footprint; incremental
updates must adopt the existing index's codec (one codec per index)."""

import json
import os

import numpy as np
import pytest

from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.incremental import incremental_update
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs_pandas

N_DOCS = 400
_BASE = dict(shard_size=128, n_buckets=8, n_salts=4,
             hot_df_fraction=0.02, sample_fraction=1.0,
             store_positions=True)


@pytest.fixture(scope="module")
def twin(spark, tmp_path_factory):
    corpus = synth_docs_pandas(N_DOCS, seed=5)
    out = {}
    for codec in ("for", "varint"):
        d = str(tmp_path_factory.mktemp(f"idx_{codec}"))
        build_index(spark, spark.createDataFrame(corpus), d,
                    IndexConfig(codec=codec, **_BASE))
        out[codec] = d
    return out


def test_for_search_bit_identical_to_varint(spark, twin):
    rf = IndexReader(spark, twin["for"])
    rv = IndexReader(spark, twin["varint"])
    assert rf.manifest["config"]["codec"] == "for"
    assert rv.manifest["config"]["codec"] == "varint"
    for q, kw in (("return", {}), ("user merge stream", {}),
                  ("user merge stream", {"mode": "and"}),
                  ("user merge stream", {"min_match": 2}),
                  ("parse stream", {"exclude": "return"}),
                  ("lang:java merge", {})):
        a = rf.search_local(q, k=15, **kw)
        b = rv.search_local(q, k=15, **kw)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), (q, kw)
        np.testing.assert_array_equal(a["score"].to_numpy(),
                                      b["score"].to_numpy(),
                                      err_msg=str((q, kw)))
    pa = rf.phrase_search_local("writer user", k=10)
    pb = rv.phrase_search_local("writer user", k=10)
    assert pa["doc_id"].tolist() == pb["doc_id"].tolist()
    np.testing.assert_array_equal(pa["score"].to_numpy(),
                                  pb["score"].to_numpy())


def test_for_posting_bytes_smaller(twin):
    """doc+tf STREAM bytes (the decode-path cost, what the manifest
    'bytes' lineage metric tracks) shrink ~2x under FOR. Parquet file
    totals are NOT asserted: at this toy scale they are dominated by the
    unchanged positions stream plus per-row metadata-array overhead that
    amortizes to <0.4 B/posting once lists span full 128-posting
    blocks."""
    mf = json.load(open(os.path.join(twin["for"], "manifest.json")))
    mv = json.load(open(os.path.join(twin["varint"], "manifest.json")))
    s_for = sum(e["bytes"] for e in mf["shards"].values())
    s_var = sum(e["bytes"] for e in mv["shards"].values())
    assert s_for < 0.7 * s_var, (s_for, s_var)


def test_incremental_adopts_index_codec(spark, twin):
    """An incremental batch against a varint index must NOT write FOR
    rows (mixed posting schemas in one store): the update adopts the
    manifest's codec even though the caller's cfg defaults to 'for'."""
    upd = synth_docs_pandas(8, seed=99)
    upd["path"] = [f"newdoc{i}.py" for i in range(len(upd))]
    for codec in ("varint", "for"):
        d = twin[codec]
        before = IndexReader(spark, d).search_local("user merge", k=10)
        incremental_update(spark, d, spark.createDataFrame(upd),
                           cfg=IndexConfig(**_BASE))  # default codec=for
        man = json.load(open(os.path.join(d, "manifest.json")))
        assert man["config"]["codec"] == codec
        after = IndexReader(spark, d).search_local("user merge", k=10)
        assert len(after) >= len(before) - 8
