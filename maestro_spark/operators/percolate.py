"""Percolate — reverse search (the ES percolator analogue,
`percolate` query over an index of REGISTERED queries): instead of one
query against many documents, many stored queries are matched against
each incoming document. The alerting/subscription primitive — the
reference's notification subscriptions (SubscriptionService) are
one-query-per-subscriber percolation at heart.

Spark-first shape: registered queries analyze to a (query_id, term,
n_terms) table that is tiny next to the corpus (thousands of alerts),
so it BROADCASTS; incoming docs tokenize once, join the broadcast on
term, and one partial-agg groupBy((doc, query)) counts distinct matched
terms — match iff the count clears the query's own threshold (AND = all
terms, OR = minimum_should_match). No corpus-scale shuffle on the term
key; the only shuffle is (doc, query) match CANDIDATES, bounded by how
many registered queries share the doc's vocabulary — the same cost
model as ES walking its percolator's candidate-term index.

Phrase/positional percolation is out of scope (document-side positions
would be needed per candidate; ES runs the full query on a 1-doc
in-memory index — the analogue here would be a rescore pass over
candidates with functions.tokenize positions)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maestro_spark.operators.textstats import simple_token_col


def analyze_queries(queries: DataFrame, query_col: str = "query",
                    id_col: str = "query_id",
                    mode_col: str | None = "mode",
                    min_match_col: str | None = "min_match") -> DataFrame:
    """Registered queries → the percolator's term table:
    (query_id, term, n_terms, required) with `required` = how many
    DISTINCT terms a doc must contain (n_terms when mode='and', else
    min_match, default 1). Distinct terms per query — duplicate query
    words don't raise the bar."""
    mode = (F.col(mode_col) if mode_col in queries.columns
            else F.lit("or")) if mode_col else F.lit("or")
    msm = (F.col(min_match_col).cast("int")
           if min_match_col and min_match_col in queries.columns
           else F.lit(1))
    base = queries.select(
        F.col(id_col).alias("query_id"),
        F.array_distinct(simple_token_col(F.col(query_col)))
        .alias("_terms"),
        mode.alias("_mode"), msm.alias("_msm"))
    base = base.select(
        "query_id", "_terms",
        # 'phrase' candidates need every distinct term (the AND bar);
        # order is verified in percolate()'s second stage
        F.when(F.col("_mode").isin("and", "phrase"), F.size("_terms"))
        .otherwise(F.least(F.col("_msm"), F.size("_terms")))
        .alias("required"),
        F.size("_terms").alias("n_terms"))
    return base.select("query_id", "required", "n_terms",
                       F.explode("_terms").alias("term"))


def percolate(docs: DataFrame, queries: DataFrame,
              text_col: str = "text", doc_id_col: str = "doc_id",
              **q_cols) -> DataFrame:
    """Match every doc against every registered query: returns
    (doc_id, query_id, n_matched) for each (doc, query) pair where the
    doc contains ≥ `required` distinct query terms. One broadcast join
    + one partial-agg groupBy; see module docstring for the cost
    model."""
    qterms = analyze_queries(queries, **q_cols)
    dtok = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(F.array_distinct(simple_token_col(F.col(text_col))))
        .alias("term"))
    hits = dtok.join(F.broadcast(qterms), "term", "inner")
    cands = (hits.groupBy("doc_id", "query_id")
             .agg(F.count("*").alias("n_matched"),
                  F.first("required").alias("_req"))
             .where(F.col("n_matched") >= F.col("_req"))
             .select("doc_id", "query_id",
                     F.col("n_matched").cast("long").alias("n_matched")))

    # phrase verify stage (the ES percolator's memory-index re-check):
    # queries registered with mode='phrase' additionally require their
    # tokens CONSECUTIVELY. Tokens contain no separators, so consecutive
    # subsequence ≡ substring of the space-joined token stream — a pure
    # contains() over candidate pairs only (candidate-bounded work,
    # whole-stage codegen; never doc × query).
    id_col = q_cols.get("id_col", "query_id")
    query_col = q_cols.get("query_col", "query")
    mode_col = q_cols.get("mode_col", "mode")
    if mode_col and mode_col in queries.columns:
        ph = (queries.where(F.col(mode_col) == "phrase")
              .select(F.col(id_col).alias("query_id"),
                      F.array_join(simple_token_col(F.col(query_col)),
                                   " ").alias("_ph")))
        if ph.limit(1).count():
            dj = docs.select(
                F.col(doc_id_col).alias("doc_id"),
                F.concat(F.lit(" "),
                         F.array_join(simple_token_col(F.col(text_col)),
                                      " "),
                         F.lit(" ")).alias("_dj"))
            cands = (cands.join(F.broadcast(ph), "query_id", "left")
                     .join(dj, "doc_id")
                     .where(F.col("_ph").isNull()
                            | F.col("_dj").contains(
                                F.concat(F.lit(" "), F.col("_ph"),
                                         F.lit(" "))))
                     .select("doc_id", "query_id", "n_matched"))
    return cands
