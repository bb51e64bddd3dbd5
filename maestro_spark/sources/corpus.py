"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Shape is the BASELINE.json input_hint table, exactly:
    docs(repo string, path string, commit string, lang string, content string)

Determinism contract: every random choice for row *i* derives from
splitmix64(seed, i, stream) — NO RNG state shared across rows — so the
corpus is identical under any partitioning / parallelism / Arrow batch
size. That is what lets the two-parallelism scaling benchmark (local[8]
vs local[32]) run on byte-identical input without materializing it.

Skew is intentional (FIXTURES.md): Zipf token frequencies (hot tokens
like `return`, `import` to exercise salting), Zipf repo sizes, log-normal
doc lengths 50..5000 tokens.

Plays the role of Maestro's SONG source (SongStudyDAO.java:101-146
paginated fetch) for tests: pagination becomes partition-sized scans.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["java", "python", "scala", "js", "go", "md", "yaml"]
EXT = {"java": "java", "python": "py", "scala": "scala", "js": "js",
       "go": "go", "md": "md", "yaml": "yaml"}
KEYWORDS = {
    "java": ["public", "class", "void", "static", "import", "return", "new", "final"],
    "python": ["def", "import", "return", "class", "self", "none", "true", "lambda"],
    "scala": ["val", "def", "object", "case", "match", "import", "return", "implicit"],
    "js": ["function", "const", "let", "return", "import", "export", "async", "await"],
    "go": ["func", "package", "import", "return", "defer", "struct", "interface", "chan"],
    "md": ["the", "and", "for", "with", "this", "usage", "example", "install"],
    "yaml": ["name", "version", "config", "value", "true", "false", "spec", "metadata"],
}
_WORDS = [
    "get", "set", "user", "name", "index", "query", "token", "parse", "build",
    "merge", "shard", "batch", "record", "stream", "handler", "client", "server",
    "request", "response", "filter", "mapper", "writer", "reader", "buffer",
    "cache", "store", "fetch", "update", "delete", "create", "list", "count",
    "hash", "key", "value", "node", "edge", "graph", "tree", "heap", "stack",
    "queue", "event", "task", "job", "worker", "pool", "lock", "mutex", "atomic",
    "field", "column", "row", "table", "schema", "type", "meta", "info", "data",
    "util", "helper", "factory", "builder", "adapter", "proxy", "visitor",
    "config", "option", "param", "arg", "result", "status", "error", "retry",
]

ZIPF_S = 1.07
VOCAB_SIZE = 4096
MIN_TOKENS, MAX_TOKENS = 50, 5000


def _vocab() -> list[str]:
    """Deterministic ~4k identifier vocabulary: singles, camelCase pairs,
    snake_case pairs, numbered variants."""
    v: list[str] = list(_WORDS)
    n = len(_WORDS)
    i = 0
    while len(v) < VOCAB_SIZE:
        a = _WORDS[i % n]
        b = _WORDS[(i * 7 + 3) % n]
        c = _WORDS[(i * 13 + 5) % n]
        style = i % 4
        if style == 0:
            v.append(a + b.capitalize())            # camelCase
        elif style == 1:
            v.append(f"{a}_{b}")                     # snake_case
        elif style == 2:
            v.append(a + b.capitalize() + c.capitalize())
        else:
            v.append(f"{a}{i % 97}")                 # digit suffix
        i += 1
    return v[:VOCAB_SIZE]


VOCAB = _vocab()
# Zipf inverse-CDF over vocab ranks (hot head: the/import/return-style skew)
_ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_probs = (1.0 / _ranks**ZIPF_S)
_probs /= _probs.sum()
ZIPF_CDF = np.cumsum(_probs)

_SM64_1 = np.uint64(0x9E3779B97F4A7C15)
_SM64_2 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the per-row counter RNG (public
    constant set, Steele et al. 2014)."""
    z = (x.astype(np.uint64) + _SM64_1)
    z = (z ^ (z >> np.uint64(30))) * _SM64_2
    z = (z ^ (z >> np.uint64(27))) * _SM64_3
    return z ^ (z >> np.uint64(31))


def _u01(ids: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """Uniform [0,1) for each id on an independent stream."""
    h = splitmix64(ids.astype(np.uint64) * np.uint64(0x10001)
                   + np.uint64(seed) * np.uint64(0x5DEECE66D)
                   + np.uint64(stream) * np.uint64(0x927694A1))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def generate_batch(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate corpus rows for the given global row ids (vectorized)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = ids.size
    # repo: Zipf over 53 repos inside 7 orgs -> a few giant repos
    repo_rank = np.searchsorted(
        np.cumsum(_zipf_probs(53, 1.2)), _u01(ids, seed, 1), side="right"
    )
    org = repo_rank % 7
    # language correlated with repo
    lang_idx = (repo_rank * 5 + (_u01(ids, seed, 2) * 3).astype(np.int64)) % len(LANGS)
    # doc length: log-normal clipped
    z = np.sqrt(-2.0 * np.log(np.clip(_u01(ids, seed, 3), 1e-12, 1))) * np.cos(
        2 * np.pi * _u01(ids, seed, 4)
    )
    n_tokens = np.clip(np.exp(5.0 + 1.0 * z), MIN_TOKENS, MAX_TOKENS).astype(np.int64)

    # tokens: counter-based per (id, position)
    total = int(n_tokens.sum())
    doc_idx = np.repeat(np.arange(n), n_tokens)
    pos_in_doc = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(n_tokens)[:-1])), n_tokens
    )
    tok_u = _u01(ids[doc_idx] * np.int64(1_000_003) + pos_in_doc, seed, 5)
    tok_rank = np.searchsorted(ZIPF_CDF, tok_u, side="right")
    vocab_arr = np.array(VOCAB, dtype=object)
    kw_mask = tok_u < 0.15  # 15% language keywords -> per-lang hot tokens
    toks = vocab_arr[np.minimum(tok_rank, VOCAB_SIZE - 1)]
    if kw_mask.any():
        # independent stream: which of the 8 keywords (NOT derived from
        # tok_u, which is conditioned < 0.15 and would pin the choice)
        kw_u = _u01(ids[doc_idx[kw_mask]] * np.int64(1_000_003)
                    + pos_in_doc[kw_mask], seed, 8)
        kw_choice = (kw_u * 8).astype(np.int64)
        langs_per_tok = np.array(LANGS, dtype=object)[lang_idx[doc_idx[kw_mask]]]
        toks[kw_mask] = [KEYWORDS[la][k] for la, k in zip(langs_per_tok, kw_choice)]

    bounds = np.concatenate(([0], np.cumsum(n_tokens)))
    contents = [" ".join(toks[bounds[i]:bounds[i + 1]]) for i in range(n)]

    pkg = vocab_arr[(splitmix64(ids.astype(np.uint64) + np.uint64(seed * 31 + 6)) % np.uint64(len(_WORDS))).astype(np.int64)]
    name_a = (splitmix64(ids.astype(np.uint64) + np.uint64(seed * 31 + 7)) % np.uint64(len(_WORDS))).astype(np.int64)
    langs = np.array(LANGS, dtype=object)[lang_idx]
    repo = np.array([f"org{o}/repo{r}" for o, r in zip(org, repo_rank)], dtype=object)
    path = np.array(
        [
            f"src/{p}/{_WORDS[a].capitalize()}{int(i) % 211}.{EXT[la]}"
            for p, a, i, la in zip(pkg, name_a, ids, langs)
        ],
        dtype=object,
    )
    commit = np.array(
        [hashlib.sha1(f"{r}:{pa}:{int(i)//17}".encode()).hexdigest()
         for r, pa, i in zip(repo, path, ids)],
        dtype=object,
    )
    return pd.DataFrame(
        {"repo": repo, "path": path, "commit": commit, "lang": langs,
         "content": contents}
    )


def _zipf_probs(n: int, s: float) -> np.ndarray:
    r = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / r**s
    return p / p.sum()


def synth_docs(spark: SparkSession, n_docs: int, seed: int = 42,
               partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus as a DataFrame with the exact
    BASELINE input_hint schema (repo, path, commit, lang, content)."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield generate_batch(pdf["id"].to_numpy(), seed)

    base = spark.range(0, n_docs, 1, numPartitions=partitions)
    return base.mapInPandas(
        gen,
        schema="repo string, path string, commit string, lang string, content string",
    )


def synth_docs_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side corpus for the pytest oracle — identical rows to
    synth_docs by construction (same id-derived randomness)."""
    return generate_batch(np.arange(n_docs, dtype=np.int64), seed)
