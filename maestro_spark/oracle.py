"""Pinned brute-force BM25 oracle (pure pandas/numpy, no Spark).

Plays the role Elasticsearch plays in Maestro's integration tier
(SURVEY.md §5: embedded-ES golden tests, MaestroIntegrationTest.java:44-52)
— the independent implementation the engine must match RANK-IDENTICALLY
(same top-k doc_ids AND bit-identical float64 scores).

Shares ONLY the pure math/tokenizer functions with the engine; the
retrieval itself is the naive full-scan: tokenize every doc, build a flat
tf table, score every matching doc per term in canonical order, full sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from maestro_spark.functions import bm25
from maestro_spark.functions.tokenize import analyze_query, doc_terms, term_frequencies, simple_tokens


class BruteForceOracle:
    def __init__(self, docs: pd.DataFrame, tokenizer: str = "code",
                 fields: tuple = ("content", "path", "lang", "repo")):
        """docs: pandas frame with doc_id, repo, path, lang, content."""
        self.tokenizer = tokenizer
        docs = docs.reset_index(drop=True)
        tf = doc_terms(
            content=docs["content"],
            path=docs["path"] if "path" in fields and "path" in docs else None,
            lang=docs["lang"] if "lang" in fields and "lang" in docs else None,
            repo=docs["repo"] if "repo" in fields and "repo" in docs else None,
            tokenizer=tokenizer,
        )
        tf["doc_id"] = docs["doc_id"].to_numpy()[tf["pos"].to_numpy()]
        self.tf = tf
        # per-field stats: N = docs containing the field, avgdl
        fl = tf.groupby(["field", "doc_id"])["dl"].first().reset_index()
        g = fl.groupby("field")["dl"].agg(["count", "sum"])
        self.field_n = g["count"].to_dict()
        self.field_avgdl = (g["sum"] / g["count"]).to_dict()
        self.dfs = tf.groupby("term")["doc_id"].nunique().to_dict()
        self.doc_ids = np.sort(docs["doc_id"].to_numpy())

    def _field(self, term: str) -> str:
        for p in ("path:", "lang:", "repo:"):
            if term.startswith(p):
                return p[:-1]
        return "content"

    def search(self, query: str, k: int = 10, mode: str = "or") -> pd.DataFrame:
        """Top-k (doc_id, score), (score desc, doc_id asc)-ordered —
        accumulation per term in the SAME canonical order as the engine."""
        raw = analyze_query(query, tokenizer=self.tokenizer)
        present = [t for t in sorted(set(raw)) if self.dfs.get(t, 0) > 0]
        if not present:
            return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                 "score": pd.array([], dtype="float64")})
        idfs = {
            t: float(bm25.idf(self.dfs[t], self.field_n[self._field(t)]))
            for t in present
        }
        ordered = sorted(present, key=lambda t: (-idfs[t], t))

        acc: dict[int, float] = {}
        seen_per_term: dict[str, set] = {}
        for t in ordered:
            rows = self.tf[self.tf["term"] == t]
            f = self._field(t)
            contrib = idfs[t] * bm25.tfnorm(
                rows["tf"].to_numpy(), rows["dl"].to_numpy(), self.field_avgdl[f]
            )
            seen_per_term[t] = set(rows["doc_id"].tolist())
            # deterministic per-doc accumulation (dict adds, one per term)
            for d, c in zip(rows["doc_id"].to_numpy(), contrib):
                acc[int(d)] = acc.get(int(d), 0.0) + float(c)

        items = acc.items()
        if mode == "and":
            keep = set.intersection(*seen_per_term.values())
            items = [(d, s) for d, s in items if d in keep]
        out = pd.DataFrame(sorted(items, key=lambda x: (-x[1], x[0]))[:k],
                           columns=["doc_id", "score"])
        return out.astype({"doc_id": "int64", "score": "float64"})
