"""Index integrity audit: a freshly built index passes every check; each
corruption kind (docstore content flip, posting file removal, doclens
orphan) is detected in the right column, localized to the right shard."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from maestro_spark.operators.audit import audit_index
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.sources.corpus import synth_docs

CFG = IndexConfig(shard_size=150, n_buckets=8, n_salts=4,
                  hot_df_fraction=0.05, sample_fraction=1.0)


@pytest.fixture()
def built(spark, tmp_path):
    out = str(tmp_path / "idx")
    docs = synth_docs(spark, 400, seed=42, partitions=5)
    build_index(spark, docs, out, CFG)
    return out


def test_clean_index_passes(spark, built):
    rep, ok = audit_index(spark, built)
    assert ok
    rows = rep.collect()
    assert len(rows) == 3  # 400 docs / 150 per shard
    assert all(all(r[c] for c in rep.columns if c != "shard") for r in rows)


def _one_file(d):
    return [os.path.join(p, f) for p, _, fs in os.walk(d)
            for f in fs if f.endswith(".parquet")][0]


def _drop_crc(f):
    # hadoop's local-FS checksum sidecar would reject the tampered file
    # before the audit gets to see it; drop it so the audit is what runs
    crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_detects_docstore_tamper(spark, built):
    # flip one doc's content behind the manifest's back (shard=1 dir)
    f = _one_file(os.path.join(built, "docs", "shard=1"))
    t = pq.read_table(f).to_pandas()
    t.loc[0, "content"] = "tampered " + t.loc[0, "content"]
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    _drop_crc(f)
    rep, ok = audit_index(spark, built)
    assert not ok
    by_shard = {r["shard"]: r for r in rep.collect()}
    assert not by_shard[1]["content_sha_ok"]
    # the stored sha column is untouched, so the key/sha fingerprint is
    # legitimately intact — content integrity is the sha check's job
    assert by_shard[1]["fingerprint_ok"]
    # other shards untouched
    assert by_shard[0]["ok"] and by_shard[2]["ok"]


def test_detects_sha_column_tamper(spark, built):
    # rewriting the STORED sha (a doc replaced behind the manifest's
    # back, sha kept self-consistent) must flip the shard fingerprint
    f = _one_file(os.path.join(built, "docs", "shard=1"))
    t = pq.read_table(f).to_pandas()
    t.loc[0, "content"] = "swapped content"
    import hashlib
    t.loc[0, "content_sha256"] = hashlib.sha256(
        b"swapped content").hexdigest()
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    _drop_crc(f)
    rep, ok = audit_index(spark, built)
    assert not ok
    by_shard = {r["shard"]: r for r in rep.collect()}
    assert by_shard[1]["content_sha_ok"]      # self-consistent sha
    assert not by_shard[1]["fingerprint_ok"]  # but not the build's docs
    assert by_shard[0]["ok"] and by_shard[2]["ok"]


def test_detects_missing_postings(spark, built):
    shutil.rmtree(os.path.join(built, "postings", "shard=2"))
    rep, ok = audit_index(spark, built)
    assert not ok
    by_shard = {r["shard"]: r for r in rep.collect()}
    assert not by_shard[2]["postings_ok"]
    assert by_shard[0]["ok"] and by_shard[1]["ok"]


def test_detects_doclens_orphan(spark, built):
    f = _one_file(os.path.join(built, "doclens", "shard=0"))
    t = pq.read_table(f).to_pandas()
    t.loc[0, "doc_id"] = 149_999  # not in the docstore
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    _drop_crc(f)
    rep, ok = audit_index(spark, built)
    assert not ok
    by_shard = {r["shard"]: r for r in rep.collect()}
    assert not by_shard[0]["doclens_ok"]
