"""Multimodal plumbing + text-analysis module tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.operators import multimodal as mm
from maestro_spark.operators import textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


# ------------------------------------------------------------- multimodal

def test_media_schema_and_features(spark, documents):
    media = mm.media_from_documents(documents.limit(50))
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "meta"]
    feats = mm.extract_features(media, feature_dim=16, decoder=mm.fake_decode)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"]
             for r in mm.extract_features(media, 16, mm.fake_decode).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_feature_content_sensitivity():
    a = mm.fake_decode(pd.Series([b"hello", b"hello", b"world"]), 8)
    assert np.array_equal(a[0], a[1])
    assert not np.array_equal(a[0], a[2])


def test_unavailable_decoder_raises(spark, documents):
    media = mm.media_from_documents(documents.limit(3))
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        mm.extract_features(media, 16).collect()


def test_byte_bounded_rechunk(spark, documents):
    """A tiny max_batch_bytes still yields every row exactly once."""
    media = mm.media_from_documents(documents.limit(40))
    feats = mm.extract_features(media, 8, mm.fake_decode, max_batch_bytes=256)
    assert feats.count() == 40
    assert feats.select("media_id").distinct().count() == 40


def test_frame_sample(spark, documents):
    media = mm.media_from_documents(documents.limit(60))
    frames = mm.frame_sample(media, every_n=10).collect()
    vids = {r["media_id"] for r in frames}
    assert vids  # kind round-robins -> ~1/3 are video
    for r in frames:
        assert r["frame_idx"] % 10 == 0
    # frame count per video = ceil(n_frames / 10)
    meta = {r["media_id"]: int(r["meta"]["n_frames"])
            for r in media.where(F.col("kind") == "video").collect()}
    from collections import Counter
    per = Counter(r["media_id"] for r in frames)
    for mid, n_frames in meta.items():
        assert per[mid] == (n_frames + 9) // 10


# -------------------------------------------------------------- textstats

def test_token_counts_handmade(spark):
    d = spark.createDataFrame(
        [(1, "Hello, world! x2"), (2, "  "), (3, "a a a b")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.token_counts(d).collect()}
    assert out[1]["ws_tokens"] == 3
    assert out[1]["bpe_tokens"] == 6       # Hello , world ! x 2
    assert out[1]["simple_tokens"] == 3    # hello world x2 (alnum runs)
    assert out[1]["distinct_tokens"] == 3
    assert out[2]["simple_tokens"] == 0
    assert out[3]["simple_tokens"] == 4 and out[3]["distinct_tokens"] == 2


def test_quality_monotone(spark):
    d = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 20),
         (2, "@@ ## !! %% ^^ && **")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.quality_features(d).collect()}
    assert out[1]["quality_score"] > out[2]["quality_score"]
    assert out[2]["punct_ratio"] > 0.5


def test_lang_id_ngram_vs_pandas(spark):
    profiles = {
        "aa": {"aba": 1.0, "bab": 0.5},
        "bb": {"xyx": 1.0, "yxy": 0.5},
    }
    rows = [(1, "abababab"), (2, "xyxyxyxy"), (3, "ababxy")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"]
           for r in textstats.lang_id_ngram(d, profiles).collect()}
    assert got[1] == "aa" and got[2] == "bb" and got[3] == "aa"


def test_fingerprint_order_sensitivity(spark):
    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha  beta gamma")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.doc_fingerprint(d).collect()}
    # bag-equal but order-different: same md5-of-sorted? no — md5 differs AND
    # rolling differs; whitespace-normalized identical: same everything
    assert out[1]["fingerprint"] == out[3]["fingerprint"]
    assert out[1]["rolling_hash"] == out[3]["rolling_hash"]
    assert out[1]["rolling_hash"] != out[2]["rolling_hash"]


def test_redact_pii_replaces_and_counts(spark):
    d = spark.createDataFrame(
        [(1, "mail a@b.io and c.d+x@e-f.org, ip 10.0.0.1, "
             "see https://x.io/p?q=1 end"),
         (2, "clean text with no pii at all"),
         (3, "url with embedded email https://x.io/u/a@b.io tail")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.redact_pii(d).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_ips"] == 1 \
        and out[1]["n_urls"] == 1
    red = out[1]["redacted"]
    assert "<EMAIL>" in red and "<IP>" in red and "<URL>" in red
    assert "a@b.io" not in red and "10.0.0.1" not in red
    assert out[2]["n_emails"] == out[2]["n_ips"] == out[2]["n_urls"] == 0
    assert out[2]["redacted"] == "clean text with no pii at all"
    # URL redaction runs first: the embedded email is part of the URL
    assert out[3]["n_urls"] == 1 and out[3]["n_emails"] == 0
    assert out[3]["redacted"] == "url with embedded email <URL> tail"


def test_repetition_features(spark):
    d = spark.createDataFrame(
        [(1, "spam spam spam spam ham"),        # 5 tokens, 2 distinct
         (2, "all words here are unique")],     # 5 tokens, 5 distinct
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.repetition_features(d).collect()}
    assert out[1]["n_tokens"] == 5 and out[1]["distinct_ratio"] == 0.4
    assert out[1]["top_token_ratio"] == 0.8
    assert out[2]["distinct_ratio"] == 1.0 and out[2]["top_token_ratio"] == 0.2
