"""Similarity-search tests: brute-force cosine vs numpy reference, ANN
(hyperplane LSH multiprobe + IVF) recall against the exact baseline,
embedding near-dup detection."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from maestro_spark.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, m


def _np_topk(ids, m, q, k, exclude=None):
    qn = np.asarray(q, dtype=np.float64)
    cos = (m @ qn) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qn))
    cos = np.round(cos, 6)
    mask = ids != exclude if exclude is not None else np.ones(len(ids), bool)
    cand = np.flatnonzero(mask)
    order = sorted(cand, key=lambda i: (-cos[i], ids[i]))[:k]
    return [(int(ids[i]), float(cos[i])) for i in order]


def test_brute_force_matches_numpy(emb, emb_np):
    ids, m = emb_np
    q = m[ids.tolist().index(0)].tolist()
    got = [(r["vec_id"], r["cos"])
           for r in similarity.brute_force_topk(emb, q, 10, exclude_id=0).collect()]
    assert got == _np_topk(ids, m, q, 10, exclude=0)


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus with TRUE near neighbors: 200 random base vectors, the last
    20 of which get a planted perturbed twin (cos ≈ 0.995). The driver's
    embeddings table is uniformly random (measured top-1 cos ≈ 0.36), where
    no sublinear ANN can have recall — LSH recall is only defined for
    genuinely near pairs, so we plant them."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((200, 32))
    twins = base[-20:] + 0.05 * rng.standard_normal((20, 32))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(1000 + i, [float(x) for x in v]) for i, v in enumerate(twins)]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return d.cache(), base, twins


def test_hyperplane_ann_recall(planted):
    d, base, twins = planted
    planes = similarity.random_hyperplanes(32, 8, seed=42)
    bucketed = similarity.hyperplane_bucket(d, planes).cache()
    hits = 0
    for i in range(20):
        q = [float(x) for x in twins[i]]
        got = {r["vec_id"] for r in similarity.ann_hyperplane_topk(
            bucketed, q, planes, 5, n_probe=4, exclude_id=1000 + i).collect()}
        hits += (180 + i) in got  # the planted twin's base vector
    assert hits >= 16, f"recall {hits}/20 too low"


def test_ivf_ann_recall(spark, planted):
    d, base, twins = planted
    cents = similarity.fit_ivf_centroids(d, n_centroids=8, iters=4, seed=42)
    assigned = similarity.ivf_assign(d, cents).cache()
    assert assigned.count() == 220  # every vector in exactly one cell
    hits = 0
    for i in range(20):
        q = [float(x) for x in twins[i]]
        got = {r["vec_id"] for r in similarity.ann_ivf_topk(
            assigned, q, cents, 5, n_probe=2, exclude_id=1000 + i).collect()}
        hits += (180 + i) in got
    assert hits >= 18, f"IVF recall {hits}/20 too low"


def test_embedding_near_dups(spark):
    """A vector and its tiny perturbation must pair; orthogonal must not."""
    base = np.random.default_rng(7).standard_normal(16).astype(np.float32)
    near = base + 1e-4
    orth = np.roll(base, 1) * np.array([1, -1] * 8, dtype=np.float32)
    rows = [(0, [float(x) for x in base]), (1, [float(x) for x in near]),
            (2, [float(x) for x in orth])]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id1"], r["id2"]): r["cos"]
             for r in similarity.embedding_near_dups(d, 0.99, n_bits=4).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.99
    assert (0, 2) not in pairs


def test_semantic_dedup_pairs(emb, emb_np):
    """SemDeDup within-cluster pairs vs a numpy brute force: same sign
    buckets, same exact cosines, same (id1 < id2) pair set."""
    ids, m = emb_np
    buckets = (np.where(m[:, :8] > 0, 1, 0)
               * (1 << np.arange(8))).sum(axis=1)
    t = 0.25
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] >= ids[j] or buckets[i] != buckets[j]:
                continue
            cos = round(float(m[i] @ m[j]
                              / (np.linalg.norm(m[i]) * np.linalg.norm(m[j]))), 6)
            if cos >= t:
                want.add((int(ids[i]), int(ids[j])))
    got = {(r["id1"], r["id2"])
           for r in similarity.semantic_dedup_pairs(emb, t, n_bits=8).collect()}
    assert got == want and len(want) > 0


def test_semantic_dedup_only_same_cluster(spark):
    """A near-identical pair in the same sign bucket pairs; an equally
    similar pair split across buckets (first component sign flipped)
    does NOT — the SemDeDup semantics, not an all-pairs approximation."""
    base = np.random.default_rng(3).standard_normal(16).astype(np.float32)
    base[0] = 0.5
    near = base + 1e-4
    flipped = base.copy()
    flipped[0] = -1e-3  # other-bucket twin: cosine still ~1
    rows = [(0, [float(x) for x in base]), (1, [float(x) for x in near]),
            (2, [float(x) for x in flipped])]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id1"], r["id2"])
             for r in similarity.semantic_dedup_pairs(d, 0.9, n_bits=8).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs and (1, 2) not in pairs


def test_knn_join_shape(emb, emb_np):
    ids, m = emb_np
    out = similarity.knn_join(emb.where(F.col("vec_id") < 4), emb, k=3).collect()
    assert len(out) == 12
    for r in out:
        assert r["qid"] != r["nid"] and 1 <= r["rank"] <= 3


def test_ivf_pq_recall_and_compression(spark, planted):
    """IVF-PQ: codes are n_subvectors bytes (32x smaller than float32
    vectors at dim=32, M=4), ADC scoring still finds the planted twins,
    and approx scores track exact cosine on near-identical pairs."""
    d, base, twins = planted
    cents = similarity.fit_ivf_centroids(d, n_centroids=8, iters=4, seed=42)
    assigned = similarity.ivf_assign(d, cents).cache()
    books = similarity.fit_pq_codebooks(d, cents, n_subvectors=4,
                                        n_codes=32, seed=42)
    assert books.shape == (4, 32, 8)
    enc = similarity.pq_encode(assigned, cents, books).cache()
    rows = enc.collect()
    assert len(rows) == 220
    assert all(len(r["codes"]) == 4 for r in rows)  # 4 bytes vs 128
    assert "embedding" not in enc.columns            # vectors dropped
    hits = 0
    for i in range(20):
        q = [float(x) for x in twins[i]]
        got = {r["vec_id"] for r in similarity.ann_ivf_pq_topk(
            enc, q, cents, books, k=5, n_probe=2,
            exclude_id=1000 + i).collect()}
        hits += (180 + i) in got
    assert hits >= 15, f"IVF-PQ recall {hits}/20 too low"


def test_ivf_pq_deterministic(spark, planted):
    d, base, twins = planted
    cents = similarity.fit_ivf_centroids(d, n_centroids=8, iters=4, seed=42)
    b1 = similarity.fit_pq_codebooks(d, cents, n_subvectors=4, n_codes=16, seed=42)
    b2 = similarity.fit_pq_codebooks(d, cents, n_subvectors=4, n_codes=16, seed=42)
    assert np.array_equal(b1, b2)
    with pytest.raises(ValueError):
        similarity.fit_pq_codebooks(d, cents, n_subvectors=5)


def test_rrf_fuse(spark):
    """RRF vs hand-computed fusion; absence contributes nothing; ties on
    the fused score break by id."""
    from maestro_spark.operators.similarity import rrf_fuse
    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double")
    b = spark.createDataFrame(
        [(3, 0.9), (4, 0.8), (1, 0.7)], "doc_id long, score double")
    got = rrf_fuse([a, b], k=10, rank_constant=60).toPandas()
    want = {
        1: round(1 / 61 + 1 / 63, 6),   # rank 1 in a, rank 3 in b
        2: round(1 / 62, 6),
        3: round(1 / 63 + 1 / 61, 6),
        4: round(1 / 62, 6),
    }
    assert dict(zip(got["doc_id"], got["rrf_score"])) == want
    # doc 1 and 3 tie exactly -> id order; 2 and 4 tie -> id order
    assert got["doc_id"].tolist() == [1, 3, 2, 4]
    nr = dict(zip(got["doc_id"], got["n_retrievers"]))
    assert nr == {1: 2, 3: 2, 2: 1, 4: 1}


def test_brute_force_min_sim_cutoff(emb, emb_np):
    """ES knn `similarity` threshold: top-k first, cutoff after —
    under-fills, never back-fills."""
    ids, m = emb_np
    q = m[ids.tolist().index(0)].tolist()
    full = _np_topk(ids, m, q, 10, exclude=0)
    thr = full[5][1] + 1e-9          # between ranks 5 and 6
    got = [(r["vec_id"], r["cos"]) for r in similarity.brute_force_topk(
        emb, q, 10, exclude_id=0, min_sim=thr).collect()]
    assert got == [r for r in full if r[1] >= thr]
    assert 0 < len(got) < 10


def test_maxsim_matches_numpy(emb, emb_np):
    """Late-interaction maxSim (ColBERT / ES rank_vectors
    maxSimDotProduct): score = sum over query sub-vectors of the best
    doc-sub-vector dot product. Oracle: straight numpy over the same
    4 x 16 contiguous slicing."""
    ids, m = emb_np
    full = m[ids.tolist().index(0)]
    qvs = [full[g * 16:(g + 1) * 16].tolist() for g in range(4)]

    docs = m.reshape(len(ids), 4, 16)          # (n, j, dim)
    q = np.asarray(qvs)                        # (g, dim)
    dots = np.einsum("njd,gd->ngj", docs, q)   # (n, g, j)
    score = np.round(dots.max(axis=2).sum(axis=1), 6)
    mask = ids != 0
    order = sorted(np.flatnonzero(mask), key=lambda i: (-score[i], ids[i]))[:10]
    want = [(int(ids[i]), float(score[i])) for i in order]

    got = [(r["vec_id"], r["maxsim"]) for r in similarity.maxsim_topk(
        emb.where(F.col("vec_id") != 0), qvs, k=10).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=2e-6)


def test_maxsim_degenerate_single_sub_is_dot(emb, emb_np):
    """With one query sub-vector spanning the whole embedding, maxSim
    reduces to a plain dot product."""
    ids, m = emb_np
    q = m[ids.tolist().index(0)]
    score = np.round(m @ q, 6)
    mask = ids != 0
    order = sorted(np.flatnonzero(mask), key=lambda i: (-score[i], ids[i]))[:5]
    want = [int(ids[i]) for i in order]
    got = [r["vec_id"] for r in similarity.maxsim_topk(
        emb.where(F.col("vec_id") != 0), [q.tolist()], k=5).collect()]
    assert got == want
