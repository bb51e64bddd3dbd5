"""Similarity search over an embedding column (array<float>): brute-force
cosine top-k as the exactness baseline, coordinate-sign / random-hyperplane
LSH bucketing and an IVF (inverted-file) coarse quantizer as the scale
paths, plus embedding-cosine near-duplicate pairs for dedup.

Scale design:
  * brute-force top-k is a narrow map (zip_with/aggregate — JVM-side,
    whole-stage codegen) + a global top-k; exact, O(N·d) per query. Fine
    for reranking, not for 10^12 rows.
  * LSH/IVF assign each vector to a bucket map-side, then a query touches
    only its probe buckets — the posting-store idea (SURVEY.md §2.10)
    applied to vectors: bucket = term, member list = postings. Buckets are
    the partition key, so a query is a partition-pruned scan.
  * matrix math (hyperplane projections, centroid assignment) runs in
    Arrow-batched pandas UDFs over numpy — batch-vectorized, no per-row
    Python (BASELINE.json input_hint requirement).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in float64 via zip_with + left-to-right aggregate (the fold
    order is deterministic, so scores reproduce across runs/engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_to_query(emb: DataFrame, query_vec: list[float],
                    vec_col: str = "embedding") -> DataFrame:
    """Adds a `cos` column: cosine(embedding, query_vec). The query vector
    becomes a literal array — constant-folded by Catalyst, no join."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return emb.withColumn(
        "cos",
        F.round(_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q)), 6),
    )


def brute_force_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_id: int | None = None,
                     min_sim: float | None = None) -> DataFrame:
    """Exact cosine top-k: narrow map + orderBy(cos desc, id asc).limit(k).
    Spark's TakeOrdered keeps only k rows per partition — no global sort
    materialization. min_sim is the ES knn `similarity` threshold:
    candidates below the cutoff are dropped AFTER ranking (the ES
    semantics — the result may under-fill k, never back-fill)."""
    d = cosine_to_query(emb, query_vec, vec_col)
    if exclude_id is not None:
        d = d.where(F.col(id_col) != exclude_id)
    out = (
        d.select(id_col, "cos")
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )
    if min_sim is not None:
        out = out.where(F.col("cos") >= float(min_sim))
    return out


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 3,
             qid_col: str = "vec_id", cid_col: str = "vec_id",
             vec_col: str = "embedding",
             exclude: DataFrame | None = None) -> DataFrame:
    """Brute-force k-NN join: every query row against every corpus row,
    per-query top-k via window rank. The exactness baseline for ANN; at
    scale the corpus side must be bucketed (see lsh/ivf below) — a true
    cross join of 10^12×10^6 is never the plan.

    exclude: optional (qid, nid) pairs removed BEFORE ranking (the
    filtered-kNN rule — ranking first and dropping after would
    under-fill k), via a left-anti join that broadcasts when the
    exclusion list is label-sized."""
    from pyspark.sql import Window

    q = queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(cid_col).alias("nid"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("qid") != F.col("nid"))
    )
    if exclude is not None:
        scored = scored.join(F.broadcast(exclude.select("qid", "nid")),
                             ["qid", "nid"], "left_anti")
    scored = scored.withColumn(
        "cos", F.round(_dot(F.col("qv"), F.col("cv"))
                       / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "cos", "rank")
    )


def mine_hard_negatives(queries: DataFrame, corpus: DataFrame,
                        positives: DataFrame, k: int = 5,
                        qid_col: str = "vec_id", cid_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Hard-negative mining for dense-retriever training (DPR, Karpukhin
    2020 §5.2; Contriever): for each training query, the k corpus
    vectors MOST similar to it that are NOT labeled positives — the
    negatives that actually move a contrastive loss. `positives` is the
    (qid, nid) label table; exclusion happens BEFORE the rank so a
    positive never displaces the k-th negative (knn_join's filtered-kNN
    rule).

    Scale path: swap the brute-force join for the IVF/LSH bucketed
    variants above once the corpus outgrows it — the exclusion and rank
    stages are unchanged. Returns (qid, nid, cos, rank)."""
    return knn_join(queries, corpus, k, qid_col, cid_col, vec_col,
                    exclude=positives)


# ------------------------------------------------------------- sign-bit LSH

def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Coordinate-sign hash: bit b = (vec[b+1] > 0). The SQL-reproducible
    LSH used by the oracle contract; production uses random hyperplanes
    (hyperplane_bucket) which are strictly better but not SQL-expressible."""
    out = F.lit(0)
    for b in range(n_bits):
        out = out + F.when(F.element_at(vec, b + 1) > 0.0, F.lit(1 << b)).otherwise(F.lit(0))
    return out


def ann_sign_bucket_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                         n_bits: int = 8, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         exclude_id: int | None = None) -> DataFrame:
    """ANN: restrict to the query's sign-bucket, exact-rank inside it.
    With the bucket as a partition key this is a partition-pruned scan."""
    qbucket = sum((1 << b) for b in range(n_bits) if query_vec[b] > 0.0)
    d = emb.where(sign_bucket(F.col(vec_col), n_bits) == qbucket)
    return brute_force_topk(d, query_vec, k, id_col, vec_col, exclude_id)


# ------------------------------------------------------ hyperplane LSH / IVF

def random_hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes (n_bits × dim), seeded."""
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n_bits, dim))
    return h / np.linalg.norm(h, axis=1, keepdims=True)


def hyperplane_bucket(emb: DataFrame, planes: np.ndarray,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH (Charikar 2002): bucket = sign bits of H·v.
    One matrix multiply per Arrow batch — vectorized, no per-row Python."""
    pt = planes.T.astype(np.float64)  # dim × bits
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (m @ pt) > 0.0
            out = pdf[[id_col, vec_col]].copy()
            out["bucket"] = (bits @ weights).astype(np.int64)
            yield out

    # pass-through columns instead of a join-back: bucketing is a NARROW
    # map; rejoining on id would force a shuffle of the whole vector table
    return emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} array<float>, bucket long"
    )


def ann_hyperplane_topk(emb_bucketed: DataFrame, query_vec: list[float],
                        planes: np.ndarray, k: int = 10, n_probe: int = 2,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        exclude_id: int | None = None) -> DataFrame:
    """Multi-probe hyperplane ANN: probe the query bucket plus the n_probe−1
    buckets from flipping the lowest-margin bits (the classic multiprobe
    trick — recovers recall without more hyperplanes)."""
    q = np.asarray(query_vec, dtype=np.float64)
    proj = planes @ q
    base_bits = proj > 0.0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    buckets = [int(base_bits @ weights)]
    for bit in np.argsort(np.abs(proj))[: max(n_probe - 1, 0)]:
        flipped = base_bits.copy()
        flipped[bit] = ~flipped[bit]
        buckets.append(int(flipped @ weights))
    d = emb_bucketed.where(F.col("bucket").isin(sorted(set(buckets))))
    return brute_force_topk(d, query_vec, k, id_col, vec_col, exclude_id)


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: nearest centroid per vector (argmax cosine),
    batch matrix multiply in Arrow. Centroids come from a driver-side
    sample k-means (fit_ivf_centroids) — the IVF index's training step."""
    c = centroids.astype(np.float64)
    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "centroid": np.argmax(m @ c.T, axis=1).astype(np.int32),
            })

    out = emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, centroid int"
    )
    return emb.join(out, id_col)


def fit_ivf_centroids(emb: DataFrame, n_centroids: int = 16, iters: int = 5,
                      sample: int = 10_000, seed: int = 42,
                      vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means on a driver-side sample (IVF training is always a
    sample-fit; the full corpus only gets assigned). Deterministic."""
    n = emb.count()
    frac = min(1.0, sample / max(n, 1))
    rows = emb.select(vec_col).sample(fraction=frac, seed=seed).collect()
    x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        a = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            m = x[a == j]
            if len(m):
                v = m.mean(axis=0)
                c[j] = v / max(np.linalg.norm(v), 1e-12)
    return c


def ann_ivf_topk(emb_assigned: DataFrame, query_vec: list[float],
                 centroids: np.ndarray, k: int = 10, n_probe: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 exclude_id: int | None = None) -> DataFrame:
    """IVF search: rank centroids by cosine to the query, scan the top
    n_probe cells, exact-rank within them."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(c @ q))[:n_probe].tolist()
    d = emb_assigned.where(F.col("centroid").isin([int(p) for p in probe]))
    return brute_force_topk(d, query_vec, k, id_col, vec_col, exclude_id)


# ----------------------------------------------------------------- IVF-PQ

def fit_pq_codebooks(emb: DataFrame, centroids: np.ndarray,
                     n_subvectors: int = 8, n_codes: int = 16,
                     iters: int = 8, sample: int = 10_000, seed: int = 42,
                     vec_col: str = "embedding") -> np.ndarray:
    """Train product-quantization codebooks on IVF RESIDUALS (Jégou et al.
    2011, public): sample driver-side, normalize, assign to the coarse
    centroid, split the residual v − c into n_subvectors contiguous
    sub-vectors, k-means each independently. Returns codebooks of shape
    (n_subvectors, n_codes, dim // n_subvectors). Deterministic (seeded).

    Training is always a sample-fit (like fit_ivf_centroids); only the
    cheap encode pass touches the full corpus."""
    n = emb.count()
    frac = min(1.0, sample / max(n, 1))
    rows = emb.select(vec_col).sample(fraction=frac, seed=seed).collect()
    x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    resid = x - c[np.argmax(x @ c.T, axis=1)]
    dim = x.shape[1]
    if dim % n_subvectors:
        raise ValueError(f"dim {dim} not divisible by n_subvectors {n_subvectors}")
    sub = dim // n_subvectors
    rng = np.random.default_rng(seed)
    books = np.empty((n_subvectors, n_codes, sub), dtype=np.float64)
    for m in range(n_subvectors):
        xm = resid[:, m * sub:(m + 1) * sub]
        k = min(n_codes, len(xm))
        cb = xm[rng.choice(len(xm), size=k, replace=False)]
        for _ in range(iters):
            d2 = ((xm[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for j in range(k):
                mask = a == j
                if mask.any():
                    cb[j] = xm[mask].mean(axis=0)
        if k < n_codes:  # degenerate tiny sample: pad with repeats
            cb = np.concatenate([cb, np.repeat(cb[:1], n_codes - k, axis=0)])
        books[m] = cb
    return books


def pq_encode(emb_assigned: DataFrame, centroids: np.ndarray,
              codebooks: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode each vector's IVF residual as n_subvectors uint8 codes packed
    into a BINARY column — dim·4 bytes shrink to n_subvectors bytes (e.g.
    32× at dim=64, M=8). Narrow Arrow-batched map, no shuffle; `centroid`
    stays as the cell/partition key, the raw vector column is DROPPED —
    that is the point at 100 TB (cells hold codes, not vectors).

    Output: (id, centroid, codes binary)."""
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    books = codebooks.astype(np.float64)
    n_sub, n_codes, sub = books.shape

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            cells = pdf["centroid"].to_numpy()
            resid = m - c[cells]
            codes = np.empty((len(m), n_sub), dtype=np.uint8)
            for s in range(n_sub):
                r = resid[:, s * sub:(s + 1) * sub]
                # ||r - cb||² argmin == argmax (r·cb - ||cb||²/2)
                scores = r @ books[s].T - 0.5 * (books[s] ** 2).sum(axis=1)
                codes[:, s] = np.argmax(scores, axis=1).astype(np.uint8)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "centroid": cells,
                "codes": [row.tobytes() for row in codes],
            })

    return emb_assigned.select(id_col, "centroid", vec_col).mapInPandas(
        enc, schema=f"{id_col} long, centroid int, codes binary")


def ann_ivf_pq_topk(encoded: DataFrame, query_vec: list[float],
                    centroids: np.ndarray, codebooks: np.ndarray,
                    k: int = 10, n_probe: int = 2,
                    id_col: str = "vec_id",
                    exclude_id: int | None = None) -> DataFrame:
    """IVF-PQ asymmetric-distance search: probe the n_probe nearest cells,
    score every member from its codes with a per-query lookup table —
    q·v ≈ q·c_cell + Σ_m LUT[m, code_m] where LUT[m, j] = q_m · codebook[m, j].
    The LUT (n_subvectors × n_codes floats) broadcasts with the closure;
    scoring a cell is one uint8 gather + sum per member — no vectors are
    read at all. Exactness caveat is inherent to PQ: scores are
    approximations; recall is tested against the brute-force oracle, and a
    production flow re-ranks the top candidates with stored vectors."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(c @ q))[:n_probe]
    n_sub, n_codes, sub = codebooks.shape
    lut = np.einsum("mjs,ms->mj", codebooks,
                    q.reshape(n_sub, sub)).astype(np.float64)
    qc = (c @ q).astype(np.float64)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8).reshape(-1, n_sub)
            approx = qc[pdf["centroid"].to_numpy()] + \
                lut[np.arange(n_sub)[None, :], codes].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "score": np.round(approx, 6)})

    d = encoded.where(F.col("centroid").isin([int(p) for p in probe]))
    if exclude_id is not None:
        d = d.where(F.col(id_col) != exclude_id)
    out = d.mapInPandas(score, schema=f"{id_col} long, score double")
    return out.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


# ------------------------------------------- late interaction (multi-vector)

def split_subvectors(vec: Column, n_sub: int, sub_dim: int) -> Column:
    """array<float>[n_sub*sub_dim] → array<array<float>>[n_sub] by
    contiguous slicing — the deterministic stand-in for a true
    multi-vector column (ES `rank_vectors` field / ColBERT per-token
    embeddings). A real array<array<float>> column bypasses this and
    feeds maxsim_score directly."""
    return F.array(*[F.slice(vec, j * sub_dim + 1, sub_dim)
                     for j in range(n_sub)])


def maxsim_score(doc_subvecs: Column, query_vecs: list[list[float]]) -> Column:
    """Late-interaction maxSim (ES 8.16 `rank_vectors` +
    maxSimDotProduct in script_score; ColBERT — Khattab & Zaharia,
    SIGIR 2020, public):

        score(q, d) = Σ_i  max_j  dot(q_i, d_j)

    — every query sub-vector picks its best-matching doc sub-vector and
    the per-query maxima are summed. Query sub-vectors become literal
    arrays (constant-folded); the max/dot are array HOFs over the doc's
    multi-vector column, float64 left-to-right fold — entirely inside
    WholeStageCodegen, no UDF, no join.

    100 TB shape: map-only over the vector column (zero shuffle); top-k
    consumption is a TakeOrderedAndProject. The ANN scale path is the
    usual two-stage ColBERT serve: single-vector ANN recall (ann_ivf_*)
    → exact maxsim rescore of the candidates with this expression."""
    q_arrays = [F.array(*[F.lit(float(x)) for x in qv]) for qv in query_vecs]
    score = None
    for qa in q_arrays:
        best = F.array_max(F.transform(doc_subvecs, lambda dv: _dot(dv, qa)))
        score = best if score is None else score + best
    return score


def maxsim_topk(emb: DataFrame, query_vecs: list[list[float]], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact maxSim top-k over single-vector rows sliced into
    len(query_vecs[0])-dim sub-vectors (see split_subvectors)."""
    n_sub = len(query_vecs)
    sub_dim = len(query_vecs[0])
    subs = split_subvectors(F.col(vec_col).cast("array<double>"),
                            n_sub, sub_dim)
    return (emb.select(F.col(id_col),
                       F.round(maxsim_score(subs, query_vecs), 6)
                       .alias("maxsim"))
            .orderBy(F.desc("maxsim"), F.asc(id_col)).limit(k))


# ------------------------------------------------------- embedding near-dup

def semantic_dedup_pairs(emb: DataFrame, threshold: float = 0.8,
                         n_bits: int = 8, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster the embedding space, then emit within-cluster pairs whose
    exact cosine ≥ threshold — by construction only same-cluster docs
    are compared, which is the SemDeDup semantics (not an approximation
    of all-pairs). The cluster here is the deterministic coordinate-sign
    bucket (SQL-reproducible, so the operator is oracle-exact); swap in
    `hyperplane_bucket` or the IVF cells (`ivf_assign`) for production
    clustering — the plan shape is identical.

    Scale shape: one shuffle keyed on the cluster id (never an
    all-pairs cross join), exact cosine verification inside each
    cluster's partition; a pathologically hot cluster is the same skew
    story as LSH near-dup and takes the same salting remedy."""
    b = emb.select(F.col(id_col), F.col(vec_col),
                   sign_bucket(F.col(vec_col), n_bits).alias("bucket"))
    a1 = b.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"),
                  "bucket")
    a2 = b.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"),
                  "bucket")
    return (
        a1.join(a2, "bucket")
        .where(F.col("id1") < F.col("id2"))
        .withColumn("cos", F.round(_dot(F.col("v1"), F.col("v2"))
                                   / (_norm(F.col("v1")) * _norm(F.col("v2"))), 6))
        .where(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95,
                        n_bits: int = 8, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        planes: np.ndarray | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket with hyperplane LSH
    (near-identical vectors collide with prob ≈ 1), pair within buckets,
    verify exact cosine ≥ threshold. The vector analogue of MinHash+LSH
    dedup — same shuffle shape, same skew story."""
    if planes is None:
        dim = len(emb.select(vec_col).head()[0])
        planes = random_hyperplanes(dim, n_bits)
    b = hyperplane_bucket(emb, planes, id_col, vec_col)
    a1 = b.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"), "bucket")
    a2 = b.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"), "bucket")
    return (
        a1.join(a2, "bucket")
        .where(F.col("id1") < F.col("id2"))
        .withColumn("cos", F.round(_dot(F.col("v1"), F.col("v2"))
                                   / (_norm(F.col("v1")) * _norm(F.col("v2"))), 6))
        .where(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
        .distinct()
    )


def rrf_fuse(rankings: list[DataFrame], k: int = 10,
             rank_constant: int = 60, id_col: str = "doc_id",
             score_col: str = "score") -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009 — the ES 8.x
    `retriever.rrf` analogue for hybrid BM25 + kNN search):

        rrf(d) = Σ_retrievers 1 / (rank_constant + rank_r(d))

    over the retrievers' top-N lists; a doc absent from a retriever
    contributes nothing from it. Each input frame is an (id, score)
    top-N; rank_r = dense position under (score desc, id asc) — rank on
    the ROUNDED score upstream for cross-engine determinism.

    Scale shape: inputs are top-N result lists (coordinator-sized, ≤ N
    rows each — never corpus-scale), so the per-retriever rank window
    and the fusion groupBy run on k·|retrievers| rows; this is the same
    cost class as ES's coordinating-node RRF merge. Returns (id,
    rrf_score, n_retrievers) ordered (rrf_score desc, id asc) top-k."""
    from pyspark.sql.window import Window

    ranked = []
    for i, df in enumerate(rankings):
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        ranked.append(df.select(
            F.col(id_col).alias("_id"),
            F.row_number().over(w).alias("_rank")))
    u = ranked[0]
    for r in ranked[1:]:
        u = u.unionByName(r)
    return (u.groupBy(F.col("_id").alias(id_col))
            .agg(F.round(F.sum(1.0 / (F.lit(float(rank_constant))
                                      + F.col("_rank"))), 6)
                 .alias("rrf_score"),
                 F.count("*").cast("long").alias("n_retrievers"))
            .orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k))


def linear_fuse(rankings: list[DataFrame], weights: list[float],
                k: int = 10, id_col: str = "doc_id",
                score_col: str = "score") -> DataFrame:
    """Linear score fusion (the ES 8.18 `retriever.linear` analogue
    with normalizer=minmax for hybrid BM25 + kNN search):

        lin(d) = Σ_retrievers w_r · (s_r(d) − min_r) / (max_r − min_r)

    where min/max are over retriever r's OWN top-N list and a doc
    absent from a retriever contributes 0 from it. A degenerate range
    (max == min, e.g. a single-row list) normalizes to 1.0 — the doc is
    that retriever's best. Fuse on ROUNDED upstream scores for
    cross-engine determinism; the fused score is rounded to 6.

    Scale shape: same as rrf_fuse — inputs are coordinator-sized top-N
    lists, so each min/max is a window over the retriever's own rows
    (never a second run of the retriever) and the fusion groupBy runs
    on k·|retrievers| rows (ES's coordinating-node merge cost class).
    Returns (id, lin_score, n_retrievers) ordered
    (lin_score desc, id asc) top-k."""
    if len(weights) != len(rankings):
        raise ValueError("one weight per retriever")
    from pyspark.sql import Window
    parts = []
    for df, w in zip(rankings, weights):
        # min/max ride a single-partition window over the retriever's
        # OWN (top-N-bounded) rows — the agg-then-crossJoin shape
        # physically re-ran the upstream retriever (a full BM25/kNN
        # query) a second time per extreme
        _wall = Window.partitionBy(F.lit(0))
        lo = F.min(score_col).over(_wall)
        hi = F.max(score_col).over(_wall)
        norm = F.when(hi == lo, F.lit(1.0)) \
            .otherwise((F.col(score_col) - lo) / (hi - lo))
        parts.append(df.select(
            F.col(id_col).alias("_id"),
            (F.lit(float(w)) * norm).alias("_ws")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy(F.col("_id").alias(id_col))
            .agg(F.round(F.sum("_ws"), 6).alias("lin_score"),
                 F.count("*").cast("long").alias("n_retrievers"))
            .orderBy(F.desc("lin_score"), F.asc(id_col)).limit(k))


def text_similarity_rerank(first_stage: DataFrame, docs: DataFrame,
                           query_text: str, k: int = 10,
                           window: int = 50, id_col: str = "doc_id",
                           score_col: str = "score",
                           text_col: str = "content",
                           scorer=None) -> DataFrame:
    """The ES 8.15 `retriever.text_similarity_reranker` shape: a first-
    stage retriever's top `rank_window_size` hits are re-scored by a
    (query, document-text) similarity model and the top-k of the NEW
    ordering returns. ES calls an inference endpoint (a cross-encoder);
    this engine keeps the retrieval plumbing real and makes the model a
    `scorer` seam — a callable (query_tokens_col, doc_tokens_col) ->
    score Column. The default is deterministic lexical Jaccard
    |q ∩ d| / |q ∪ d| over distinct simple tokens (so the oracle can
    reproduce it exactly); a real model drops in as an Arrow-batched
    pandas_udf over the raw strings without touching the plan shape.

    Plan shape: the window cut is a rounded-rank head of the first
    stage's (top-bounded) result; the k-bounded id list BROADCASTS into
    the docstore join, so the text fetch reads only the window's docs
    (row-group pruned on id at the parquet scan — never a corpus scan);
    token HOFs stay JVM-side. Final order: (round(sim, 6) desc,
    first-stage rounded score desc, id asc).

    Returns DataFrame(doc_id, sim, score) — `score` is the first-stage
    rounded score carried through (ES returns both under `_rank`)."""
    from maestro_spark.operators.textstats import simple_token_col

    cut = (first_stage
           .select(F.col(id_col).alias("_id"),
                   F.round(score_col, 6).alias("_s1"))
           .orderBy(F.desc("_s1"), F.asc("_id")).limit(int(window)))
    qtoks = sorted(set(re.findall(r"[a-z0-9]+", query_text.lower())))
    qarr = F.array(*[F.lit(t) for t in qtoks])
    dtoks = F.array_distinct(simple_token_col(F.col(text_col)))
    if scorer is None:
        inter = F.size(F.array_intersect(dtoks, qarr))
        union = F.size(F.array_union(dtoks, qarr))
        sim = F.when(union > 0, inter.cast("double") / union) \
            .otherwise(F.lit(0.0))
    else:
        sim = scorer(qarr, dtoks)
    joined = docs.join(
        F.broadcast(cut), docs[id_col] == F.col("_id"), "inner")
    return (joined.select(F.col("_id").alias(id_col),
                          F.round(sim, 6).alias("sim"),
                          F.col("_s1").alias("score"))
            .orderBy(F.desc("sim"), F.desc("score"), F.asc(id_col))
            .limit(k))
