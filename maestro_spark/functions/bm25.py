"""Okapi BM25 scoring math — defined EXACTLY ONCE, imported by both the
distributed engine and the pytest brute-force oracle so scores are
bit-for-bit identical (SURVEY.md §7.2 "rank-identical" requirement).

Formula (Lucene's BM25Similarity, public):
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q,d)  = sum over t in q of idf(t) * tfnorm(t,d)

The reference (overture-stack/maestro) never overrides ES's similarity, so
its three ``text`` fields score with exactly this default BM25
(file_centric.json:45-62 declares the fields; similarity is ES default).
k1=1.2, b=0.75 per BASELINE.json.

All functions are numpy-vectorized (no per-row Python — BASELINE.json
input_hint). Accumulation is float64 throughout; summation order across
query terms is CANONICAL_TERM_ORDER (descending idf, then term asc) in
every code path, making float sums reproducible.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    """Lucene BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return np.log1p((n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tfnorm(
    tf: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """tf / (tf + k1*(1 - b + b*dl/avgdl)), float64-vectorized."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / float(avgdl)))


def term_score(
    tf: np.ndarray,
    dl: np.ndarray,
    df: float,
    n_docs: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """Per-posting BM25 contribution of one term: idf * tfnorm."""
    return float(idf(df, n_docs)) * tfnorm(tf, dl, avgdl, k1, b)


def max_tfnorm(tf_max: float, dl_min: float, avgdl: float, k1: float = K1, b: float = B) -> float:
    """Upper bound of tfnorm within a posting block, used for block-max
    pruning. tfnorm is increasing in tf and decreasing in dl, so the max
    over a block is bounded by (max tf, min dl) in that block."""
    return float(tf_max / (tf_max + k1 * (1.0 - b + b * dl_min / float(avgdl))))


def canonical_term_order(terms: list[str], dfs: dict[str, int], n_docs: int) -> list[str]:
    """The ONE summation order used by engine and oracle: descending idf
    (equivalently ascending df), ties broken by term asc. Deduplicates."""
    uniq = sorted(set(terms))
    return sorted(uniq, key=lambda t: (-float(idf(dfs.get(t, 0), n_docs)), t))
