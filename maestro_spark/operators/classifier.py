"""Hashed linear quality classifier — the GPT-3/WebText-style quality
filter (public: Brown et al. 2020 Appendix A trains a logistic
classifier on "high-quality" reference text and keeps documents by
score; fastText's hashed bag-of-words is the standard cheap feature
map). Everything is DataFrame ops — no per-row Python, no RDDs:

  hashed_token_features   docs → (id, bucket, x) sparse rows: tokens
                          md5-hashed into n_features buckets, x =
                          bucket count / doc length (map-side groupBy)
  train_logistic          batch gradient descent; each iteration is
                          two partial-agg shuffles (per-doc margin,
                          per-bucket gradient) + a broadcast of the
                          n_features-row weight table — weights never
                          exceed dim size, nothing corpus-scale leaves
                          the executors
  score_logistic          one broadcast join + per-doc partial agg →
                          sigmoid margin

Determinism: the feature hash is md5-derived (textstats.hex16_col — the
same run/partition/engine-stable convention as curation.uniform01), the
iteration count is fixed, and ties never arise (no sampling). Floating
sums are partial-agg ordered like every other aggregate here; scores
are rounded for cross-engine comparison. A SINGLE gradient step from
w = 0 is closed-form (sigmoid(0) = 1/2 → w = lr·Xᵀ(y − ½)/n), which is
what the SQL oracle checks; multi-step runs are pytest-verified against
a numpy reference.

Scale shape at 100 TB: the exploded feature frame is |tokens| rows but
reduces per (doc, bucket) map-side before its one shuffle; it is
persisted across iterations (localCheckpoint) so each step re-reads the
reduced sparse matrix, not the corpus. The weight table is n_features
rows (dim-sized) and broadcasts. This is the classic "LR on a hashed
vocabulary" layout every curation pipeline uses for its quality model.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maestro_spark.operators.textstats import hex16_col, simple_token_col


def hashed_token_features(docs: DataFrame, n_features: int = 4096,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Sparse hashed bag-of-words: (id, bucket, x) with
    bucket = md5_16(term) % n_features and x = count/doclen (length
    normalization keeps long docs from dominating the gradient). One
    map-side-combining groupBy; output rows ≤ min(|tokens|,
    n_docs·n_features)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(simple_token_col(F.col(text_col))).alias("term"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("_dl"))
    feat = (toks.withColumn(
        "bucket", (hex16_col(F.col("term"))
                   % F.lit(int(n_features))).cast("int"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("double").alias("_c")))
    return (feat.join(dl, id_col)
            .select(F.col(id_col), "bucket",
                    (F.col("_c") / F.col("_dl")).alias("x")))


def train_logistic(features: DataFrame, labels: DataFrame,
                   iters: int = 1, lr: float = 1.0,
                   l2: float = 0.0,
                   id_col: str = "doc_id") -> DataFrame:
    """Batch gradient descent for logistic regression over the sparse
    feature rows. labels: (id, label∈{0,1}). Returns (bucket, w).

    Per iteration: margin_d = Σ_j x_dj·w_j (broadcast join + per-doc
    partial agg), p_d = sigmoid(margin), then
    grad_j = Σ_d x_dj·(p_d − y_d)/n + l2·w_j and w ← w − lr·grad — one
    per-bucket partial agg. n = |labels| (docs with no features keep
    p = ½ and zero gradient contribution, consistent with x = 0).
    The weight frame is dim-sized: it localCheckpoints per iteration to
    cut the lineage (iterative plans otherwise double per step)."""
    n = labels.count()
    if n == 0:
        raise ValueError("train_logistic needs labeled docs")
    feats = features.join(labels.select(id_col, "label"), id_col) \
        .localCheckpoint()
    w = None  # None == all-zero weights (first margin is 0 everywhere)
    for _ in range(int(iters)):
        if w is None:
            scored = feats.withColumn("_p", F.lit(0.5))
        else:
            margins = (feats.join(F.broadcast(w), "bucket", "left")
                       .groupBy(id_col)
                       .agg(F.sum(F.col("x")
                                  * F.coalesce("w", F.lit(0.0)))
                            .alias("_m")))
            scored = feats.join(margins, id_col).withColumn(
                "_p", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m"))))
        grad = (scored.groupBy("bucket")
                .agg((F.sum(F.col("x") * (F.col("_p") - F.col("label")))
                      / F.lit(float(n))).alias("_g")))
        if w is None:
            w = grad.select(
                "bucket", (-F.lit(float(lr)) * F.col("_g")).alias("w"))
        else:
            w = (w.join(grad, "bucket", "full_outer")
                 .select("bucket",
                         (F.coalesce("w", F.lit(0.0))
                          * F.lit(1.0 - lr * l2)
                          - F.lit(float(lr))
                          * F.coalesce("_g", F.lit(0.0))).alias("w")))
        w = w.localCheckpoint()
    return w


def score_logistic(features: DataFrame, weights: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """(id, margin, prob): one broadcast join of the dim-sized weight
    table + a per-doc partial agg; prob = sigmoid(margin), rounded 6."""
    return (features.join(F.broadcast(weights), "bucket", "left")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.coalesce("w", F.lit(0.0)))
                 .alias("_m"))
            .select(F.col(id_col), F.round("_m", 6).alias("margin"),
                    F.round(F.lit(1.0)
                            / (F.lit(1.0) + F.exp(-F.col("_m"))), 6)
                    .alias("prob")))


def quality_classifier_scores(docs: DataFrame, label_col,
                              n_features: int = 4096, iters: int = 1,
                              lr: float = 1.0, text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """End-to-end convenience: train on (docs, label expression) and
    score the SAME corpus — the self-training quality-filter loop
    (train on reference-vs-rest labels, keep by score)."""
    feats = hashed_token_features(docs, n_features, text_col, id_col)
    labels = docs.select(F.col(id_col),
                         label_col.cast("double").alias("label"))
    w = train_logistic(feats, labels, iters=iters, lr=lr, id_col=id_col)
    return score_logistic(feats, w, id_col=id_col)


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def pr_curve(scored: DataFrame, score_col: str = "score",
             label_col: str = "label",
             thresholds: tuple = (0.1, 0.2, 0.3, 0.4, 0.5,
                                  0.6, 0.7, 0.8, 0.9)) -> DataFrame:
    """Precision/recall calibration of a quality classifier (or any
    scored filter) against labels — the audit every
    classifier-filtered corpus ships with (GPT-3 WebText filter,
    FineWeb-Edu: the kept-fraction/precision trade-off IS the
    filtering decision). For each threshold t: predictions are
    score >= t;

        precision = tp/(tp+fp), recall = tp/(tp+fn),
        f1 = 2pr/(p+r), kept_frac = (tp+fp)/n

    Fixed threshold GRID on purpose: the sklearn-style every-distinct-
    score curve needs one global score sort (a single-partition window
    at corpus scale); the grid form is ONE partial agg — |thresholds|
    conditional sums that combine map-side — and is what you act on
    anyway. Zero-denominator cells return 0.0 (documented, matches the
    oracle). Returns one row per threshold, ordered by threshold."""
    from pyspark.sql import functions as F

    s = F.col(score_col)
    # positive = label == 1 (an indicator, never the raw value — label
    # columns are routinely multi-class)
    y = (F.col(label_col) == 1).cast("int")
    aggs = [F.count("*").alias("n"),
            F.sum(y).alias("n_pos")]
    for i, t in enumerate(thresholds):
        pred = (s >= F.lit(float(t))).cast("int")
        aggs.append(F.sum(pred * y).alias(f"_tp{i}"))
        aggs.append(F.sum(pred).alias(f"_pp{i}"))
    row = scored.agg(*aggs)
    parts = []
    for i, t in enumerate(thresholds):
        tp, pp = F.col(f"_tp{i}"), F.col(f"_pp{i}")
        fn = F.col("n_pos") - tp
        prec = F.when(pp > 0, tp / pp).otherwise(F.lit(0.0))
        rec = F.when((tp + fn) > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
        f1 = F.when((prec + rec) > 0,
                    2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
        parts.append(F.struct(
            F.lit(float(t)).alias("threshold"),
            tp.cast("long").alias("tp"),
            (pp - tp).cast("long").alias("fp"),
            fn.cast("long").alias("fn"),
            F.round(prec, 6).alias("precision"),
            F.round(rec, 6).alias("recall"),
            F.round(f1, 6).alias("f1"),
            F.round(F.when(F.col("n") > 0, pp / F.col("n"))
                    .otherwise(F.lit(0.0)), 6).alias("kept_frac")))
    return (row.select(F.explode(F.array(*parts)).alias("r"))
            .select("r.*").orderBy("threshold"))
