"""Hashed logistic quality classifier: numpy-reference parity for the
multi-step gradient descent, separation on separable data, and
partitioning determinism."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from maestro_spark.operators import classifier as clf


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(120):
        if i % 2 == 0:
            rows.append((i, "good clean prose with the usual words "
                            "and helpful structure", 1))
        else:
            rows.append((i, "zzq qqz xxj jjx garbled noise blob "
                            "spam spam spam", 0))
    return spark.createDataFrame(rows,
                                 "doc_id long, text string, label int")


def _hash16(t: str) -> int:
    return int(hashlib.md5(t.encode()).hexdigest()[:4], 16)


def _numpy_reference(pdf, n_features, iters, lr, l2):
    """Dense batch GD mirroring train_logistic's update rule."""
    ids = sorted(pdf["doc_id"].unique())
    idx = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), n_features))
    y = np.zeros(len(ids))
    for _, r in pdf.iterrows():
        X[idx[int(r["doc_id"])], int(r["bucket"])] = r["x"]
        y[idx[int(r["doc_id"])]] = r["label"]
    n = len(ids)
    w = np.zeros(n_features)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        grad = X.T @ (p - y) / n
        w = w * (1.0 - lr * l2) - lr * grad
    return X, w, ids


@pytest.mark.parametrize("iters,l2", [(1, 0.0), (5, 0.01)])
def test_train_matches_numpy_reference(spark, docs, iters, l2):
    nf = 512
    feats = clf.hashed_token_features(docs, n_features=nf)
    labels = docs.select("doc_id",
                         F.col("label").cast("double").alias("label"))
    w = clf.train_logistic(feats, labels, iters=iters, lr=0.8, l2=l2)
    got = clf.score_logistic(feats, w).toPandas()
    pdf = feats.join(labels, "doc_id").toPandas()
    X, wref, ids = _numpy_reference(pdf, nf, iters, 0.8, l2)
    margins = X @ wref
    gm = dict(zip(got["doc_id"], got["margin"]))
    for d, m in zip(ids, margins):
        assert gm[d] == pytest.approx(round(m, 6), abs=2e-6)


def test_feature_hash_matches_md5(spark, docs):
    feats = clf.hashed_token_features(docs, n_features=256).toPandas()
    assert set(feats["bucket"]) <= set(range(256))
    # 'spam' lands where md5 says it lands
    b = _hash16("spam") % 256
    spam_docs = feats[(feats["bucket"] == b)]
    assert (spam_docs["doc_id"] % 2 == 1).any()


def test_separable_corpus_separates(spark, docs):
    out = clf.quality_classifier_scores(
        docs, (F.col("label") == 1), n_features=512, iters=40, lr=5.0
    ).toPandas()
    pos = out[out["doc_id"] % 2 == 0]["prob"]
    neg = out[out["doc_id"] % 2 == 1]["prob"]
    assert pos.min() > neg.max()
    assert pos.mean() > 0.7 and neg.mean() < 0.3


def test_training_partition_invariance(spark, docs):
    nf = 256
    labels = docs.select("doc_id",
                         F.col("label").cast("double").alias("label"))
    a = clf.score_logistic(
        clf.hashed_token_features(docs, nf),
        clf.train_logistic(clf.hashed_token_features(docs, nf),
                           labels, iters=3, lr=0.5)).toPandas()
    docs2 = docs.repartition(13)
    b = clf.score_logistic(
        clf.hashed_token_features(docs2, nf),
        clf.train_logistic(clf.hashed_token_features(docs2, nf),
                           labels, iters=3, lr=0.5)).toPandas()
    am = dict(zip(a["doc_id"], a["prob"]))
    bm = dict(zip(b["doc_id"], b["prob"]))
    assert set(am) == set(bm)
    for d in am:
        assert am[d] == pytest.approx(bm[d], abs=2e-6)
