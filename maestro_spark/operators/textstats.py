"""Text-analysis operators over a document table — the training-data-
pipeline side of the engine (language ID, quality scoring, token counting,
fingerprinting). These generalize the analyzer operators the reference
declares in its ES mapping (SURVEY.md §2.10 X1-X6: tokenization + per-field
statistics executed by Lucene) into standalone, SQL-checkable DataFrame
operators.

Scale notes: every function here is a narrow map over the docs table —
pure column expressions (whole-stage codegen, no shuffle, no Python) except
`lang_id_ngram`, which is an Arrow-batched pandas UDF (vectorized char
n-gram profile scoring; never per-row Python). All are safe at 100 TB: they
pipeline with the parquet scan and prune to the referenced columns only.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# BPE-ish word-piece pattern: letter runs, digit runs, single punctuation
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

# default stopword set (intersection-friendly with synthetic corpora; real
# deployments pass their own)
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for")


def simple_token_col(text: Column) -> Column:
    """array<string> of lowercase [a-z0-9]+ tokens — identical semantics to
    functions.tokenize.simple_tokens and to the DuckDB oracle expression
    list_filter(regexp_split_to_array(lower(x),'[^a-z0-9]+'), t -> t<>'')."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counting: whitespace tokens, regex word-pieces (BPE-ish
    pre-tokenization), distinct simple tokens. Pure column expressions."""
    toks = simple_token_col(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != ""))
        .alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_RE)).alias("bpe_tokens"),
        F.size(toks).alias("simple_tokens"),
        F.size(F.array_distinct(toks)).alias("distinct_tokens"),
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Unigram language-model quality score — the KenLM-perplexity-filter
    analogue (CCNet-style, public) with corpus-MLE probabilities: per doc,
    the mean natural-log probability of its tokens under the corpus's own
    unigram distribution (avg ln(ctf) − ln(total_tokens)). Low scores mark
    rare-token-heavy docs (garbled text, boilerplate symbol soup).

    Scale shape: one partial-agg groupBy for the corpus term frequencies
    (vocabulary-sized output), one term-keyed sort-merge join of the token
    stream against it, one partial-agg groupBy per doc. The token total
    rides a single-partition window over the REDUCED vocabulary rows
    (sorting the vocabulary once beats the agg-then-crossJoin shape,
    which physically re-runs the corpus tokenization subtree — no
    planner exchange reuse across branches); the learn-then-score two
    passes over the token stream are the algorithm."""
    from pyspark.sql.window import Window
    tok = docs.select(F.col(id_col),
                      F.explode(simple_token_col(F.col(text_col)))
                      .alias("term"))
    freq = (tok.groupBy("term")
            .agg(F.count("*").cast("double").alias("ctf"))
            .withColumn("_total", F.sum("ctf").over(
                Window.partitionBy(F.lit(0)))))
    per_doc = (tok.join(freq, "term")
               .groupBy(id_col)
               .agg(F.count("*").alias("n_tokens"),
                    F.sum(F.log("ctf")).alias("sum_log_ctf"),
                    F.first("_total").alias("total")))
    return per_doc.select(
        F.col(id_col), "n_tokens",
        F.round(F.col("sum_log_ctf") / F.col("n_tokens")
                - F.log("total"), 6).alias("avg_logprob"))


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     stopwords: tuple = STOPWORDS) -> DataFrame:
    """Heuristic document-quality features + a composite score in [0,1]:
    length saturation, non-alphanumeric (punctuation/noise) ratio, stopword
    ratio, mean token length. The formula is fixed so the DuckDB oracle can
    reproduce it bit-for-bit after round(…, 6)."""
    text = F.col(text_col)
    toks = simple_token_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    clean_len = F.length(F.regexp_replace(F.lower(text), "[a-z0-9 ]", ""))
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    punct_ratio = clean_len / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    mean_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tok, F.lit(1))
    score = (
        0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.lit(1.0) - punct_ratio)
        + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(score, 6).alias("quality_score"),
    )


def hex16_col(term: Column) -> Column:
    """16-bit integer hash of a string via the first 4 hex chars of md5 —
    chosen over crc32/xxhash because DuckDB computes the identical value
    (oracle parity); used by doc_fingerprint and dedup.simhash."""
    hex4 = F.substring(F.md5(term), 1, 4)

    def hexval(i: int) -> Column:
        c = F.ascii(F.substring(hex4, i + 1, 1))
        return c - F.when(c >= 97, F.lit(87)).otherwise(F.lit(48))

    return hexval(0) * 4096 + hexval(1) * 256 + hexval(2) * 16 + hexval(3)


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Content fingerprinting: md5 of whitespace-normalized lowercase text
    (the exact-dedup key) + a positional rolling checksum (order-sensitive —
    catches shuffled-token plagiarism that the bag-of-words md5 misses):
    sum(position_i · hex16(token_i)) mod 2^31−1, pure integer math."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    toks = simple_token_col(F.col(text_col))
    weighted = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.size(toks)),
        lambda t, i: hex16_col(t).cast("long") * i,
    )
    rolling = F.when(
        F.size(toks) > 0,
        F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x)
        % F.lit(2147483647),
    ).otherwise(F.lit(0).cast("long"))
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        rolling.alias("rolling_hash"),
        F.length(norm).alias("norm_len"),
    )


# --------------------------------------------------------------- language ID

def marker_lang_id(docs: DataFrame, markers: dict[str, tuple],
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword/marker-list language ID: count marker hits per language,
    argmax with deterministic tie-break (first language in dict order wins).
    SQL-reproducible (the queries()/oracle_sql() variant)."""
    toks = simple_token_col(F.col(text_col))
    langs = list(markers)

    def contains(arr):
        return lambda t: F.array_contains(arr, t)

    counts = [
        F.size(F.filter(toks, contains(F.array(*[F.lit(w) for w in markers[la]]))))
        .alias(f"c_{la}")
        for la in langs
    ]
    d = docs.select(F.col(id_col), *counts)
    pred = F.lit(langs[-1])
    for la in reversed(langs[:-1]):
        cond = F.lit(True)
        for other in langs[langs.index(la) + 1:]:
            cond = cond & (F.col(f"c_{la}") >= F.col(f"c_{other}"))
        pred = F.when(cond, F.lit(la)).otherwise(pred)
    return d.select(F.col(id_col), *[F.col(f"c_{la}") for la in langs],
                    pred.alias("lang_pred"))


def lang_id_ngram(docs: DataFrame, profiles: dict[str, dict[str, float]],
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """Char-n-gram profile language ID (the real heuristic — Cavnar & Trenkle
    1994 style): cosine between a doc's char-trigram frequency vector and
    per-language profiles. Vectorized pandas UDF (Arrow batches) — the only
    non-pure-SQL op in this module, hence exercised by pytest (profile
    parity vs a pure-pandas reference), not the DuckDB oracle."""
    langs = sorted(profiles)
    vocab = sorted({g for p in profiles.values() for g in p})
    gram_ix = {g: i for i, g in enumerate(vocab)}
    pm = np.zeros((len(langs), len(vocab)), dtype=np.float64)
    for li, la in enumerate(langs):
        for g, w in profiles[la].items():
            pm[li, gram_ix[g]] = w
    pm /= np.maximum(np.linalg.norm(pm, axis=1, keepdims=True), 1e-12)

    def score(batches):
        for pdf in batches:
            texts = pdf[text_col].fillna("").str.lower()
            rows = np.zeros((len(pdf), len(vocab)), dtype=np.float64)
            for gi, g in enumerate(vocab):  # loop over PROFILE grams, not rows
                rows[:, gi] = texts.str.count(re.escape(g))
            norms = np.maximum(np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)
            sims = (rows / norms) @ pm.T
            best = np.argmax(sims, axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "lang_pred": np.asarray(langs, dtype=object)[best],
                "confidence": np.round(sims[np.arange(len(pdf)), best], 6),
            })

    return docs.select(id_col, text_col).mapInPandas(
        score, schema=f"{id_col} long, lang_pred string, confidence double"
    )


# --------------------------------------------------------------- PII / URLs

# Patterns are deliberately RE2-compatible (no backrefs/lookaround) so the
# SAME regex runs in Spark (Java regex) and the DuckDB oracle (RE2), and a
# production port to Hyperscan/re2 stays possible. Order matters: URLs are
# redacted FIRST so an email-or-ip-looking substring inside a URL is part
# of the URL's redaction, not double-counted.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_STEPS = (("url", URL_RE, "<URL>"),
              ("email", EMAIL_RE, "<EMAIL>"),
              ("ip", IPV4_RE, "<IP>"))


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Training-data PII scrubbing: replace URLs, emails, and IPv4
    addresses with typed placeholders and count each kind. Pure
    regexp_replace/regexp_count column expressions — whole-stage codegen,
    zero shuffle, linear in bytes scanned; at 100 TB this is a map-only
    pass whose cost is the scan itself. Returns (id, redacted text,
    n_urls, n_emails, n_ips)."""
    redacted = F.col(text_col)
    counts = []
    for name, pat, token in _PII_STEPS:
        counts.append(F.regexp_count(redacted, F.lit(pat))
                      .alias(f"n_{name}s"))
        redacted = F.regexp_replace(redacted, pat, token)
    return docs.select(F.col(id_col), *counts,
                       redacted.alias("redacted"))


def repetition_features(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Repetition-based quality signals (the boilerplate/spam detector a
    pretraining pipeline runs next to quality_score): per-doc distinct-
    token ratio and the mass fraction of the single most frequent token.

    Shape at scale: explode → two-level aggregation. Both groupBys
    partial-aggregate map-side; the shuffled key (doc_id, term) is
    near-unique so there is no hot key, and the second agg shuffles one
    row per doc. No UDF, no driver work."""
    toks = simple_token_col(F.col(text_col))
    tf = (docs.select(F.col(id_col), F.explode(toks).alias("term"))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    return (tf.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("tf").alias("top_tf"))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6)
            .alias("distinct_ratio"),
            F.round(F.col("top_tf") / F.col("n_tokens"), 6)
            .alias("top_token_ratio")))


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   min_alpha_ratio: float = 0.8,
                   min_stop_hits: int = 2,
                   stopwords: tuple = GOPHER_STOPS) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021 §A1.1.1, public) —
    the heuristic document filter of the MassiveText pipeline, per doc:

      n_words        whitespace word count, kept in [min_words, max_words]
      mean_word_len  mean word length, kept in [min_mean_len, max_mean_len]
      symbol_ratio   ('#' + '...' occurrences) / n_words, kept <= max
      alpha_ratio    fraction of words containing an alphabetic char,
                     kept >= min_alpha_ratio
      stop_hits      how many of the 8 Gopher stop words appear, kept >=
                     min_stop_hits
      keep           AND of the five rules

    Scale shape: pure per-row column expressions over array HOFs —
    map-only, zero shuffle, whole-stage codegen (the same class as
    quality_features); a 100-TB corpus filters at scan speed. Thresholds
    are the paper's defaults."""
    text = F.lower(F.col(text_col))
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    sum_len = F.aggregate(words, F.lit(0.0),
                          lambda acc, w: acc + F.length(w))
    mean_len = sum_len / n_words
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ell = (F.length(text)
             - F.length(F.regexp_replace(text, r"\.\.\.", ""))) / 3
    symbol_ratio = (n_hash + n_ell) / n_words
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    alpha_ratio = n_alpha.cast("double") / n_words
    stop_hits = sum(
        (F.array_contains(words, F.lit(s)).cast("int") for s in stopwords),
        start=F.lit(0))
    keep = ((n_words >= min_words) & (n_words <= max_words)
            & (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
            & (symbol_ratio <= max_symbol_ratio)
            & (alpha_ratio >= min_alpha_ratio)
            & (stop_hits >= min_stop_hits))
    return docs.select(
        F.col(id_col), n_words.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
        keep.alias("keep"))


def bigram_logprob(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", lam: float = 0.9) -> DataFrame:
    """Interpolated bigram language-model score — the CCNet/KenLM
    perplexity-filter analogue one order up from unigram_logprob: per
    doc, the mean natural-log probability of its bigram positions under

        P(w | v) = lam · c(v,w)/c(v,·) + (1 − lam) · ctf(w)/total

    with corpus-MLE counts (c(v,·) = the bigram-prefix marginal, so the
    conditional rows sum to 1). Low scores mark token sequences the
    corpus's own short-range statistics find improbable (shuffled text,
    symbol soup) that unigram frequency alone cannot see.

    Scale shape: the bigram count table is one partial-agg groupBy
    (|bigram vocab| rows, Zipf-bounded far below the token stream), its
    prefix marginal a WINDOW over those reduced rows (partitioned on
    the prefix — distributed, no second corpus pass; likewise the
    unigram total rides a single-partition window over the vocabulary
    rows: the agg-then-join/crossJoin shapes physically re-ran the
    corpus explode subtrees); the doc bigram stream joins both on
    their count keys (sort-merge/hash joins — broadcast them instead
    when the vocabulary fits, as a real LM's would after pruning) and
    reduces per doc with one partial agg. Nothing corpus-sized reaches
    the driver."""
    from pyspark.sql.window import Window
    ts = simple_token_col(F.col(text_col))
    toks = docs.select(F.col(id_col), ts.alias("ts"))
    bg = toks.select(
        F.col(id_col),
        F.explode(F.zip_with(
            F.slice("ts", 1, F.greatest(F.size("ts") - 1, F.lit(0))),
            F.slice("ts", 2, F.greatest(F.size("ts") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("v"), b.alias("w"))))
        .alias("p")).select(F.col(id_col), "p.v", "p.w")
    bgc = (bg.groupBy("v", "w")
           .agg(F.count("*").cast("double").alias("cvw"))
           .withColumn("cv", F.sum("cvw").over(Window.partitionBy("v"))))
    uni = (docs.select(F.explode(ts).alias("term"))
           .groupBy("term").agg(F.count("*").cast("double").alias("ctf"))
           .withColumn("total", F.sum("ctf").over(
               Window.partitionBy(F.lit(0)))))
    lp = F.log(F.lit(float(lam)) * F.col("cvw") / F.col("cv")
               + F.lit(1.0 - float(lam)) * F.col("ctf") / F.col("total"))
    return (bg.join(bgc, ["v", "w"])
            .join(uni, F.col("w") == F.col("term"))
            .groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.avg(lp), 6).alias("avg_logprob")))


def categorize_text(docs: DataFrame, max_matched_tokens: int = 5,
                    min_doc_count: int = 1, top: int = 20,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """ES categorize_text aggregation (8.x, public API) at
    similarity_threshold=100 — the deterministic exact-key case: docs
    cluster by their token signature after the ML-categorizer's token
    filtering (tokens containing a digit are treated as variable parts
    and dropped — timestamps, ids, counters), capped at the first
    `max_matched_tokens` stable tokens. Returns one row per category:
    (category, doc_count, max_matching_length), the `top` largest,
    ordered (doc_count desc, category asc).

    At thresholds < 100 ES merges near-identical keys with a
    drain-style token-tree walk whose result is insertion-order
    dependent; the exact case is the deterministic, oracle-checkable
    contract and the one that matters for training-data boilerplate
    clustering (identical templates collapse regardless of the
    variable parts).

    100 TB shape: key extraction is a pure column expression (WSCG,
    map-only); ONE groupBy on the category key — template-heavy
    corpora collapse in the map-side combiner exactly like exact
    dedup; top-N is a TakeOrderedAndProject, never a full sort.
    max_matching_length (ES: the char budget a message may occupy and
    still match the category) folds as a max() in the same partial agg.
    """
    toks = simple_token_col(F.col(text_col))
    stable = F.slice(
        F.filter(toks, lambda t: ~t.rlike("[0-9]")),
        1, int(max_matched_tokens))
    key = F.array_join(stable, " ")
    return (docs
            .select(F.col(id_col),
                    key.alias("category"),
                    F.length(F.col(text_col)).alias("_len"))
            .where(F.col("category") != "")
            .groupBy("category")
            .agg(F.count("*").alias("doc_count"),
                 F.max("_len").cast("long").alias("max_matching_length"))
            .where(F.col("doc_count") >= int(min_doc_count))
            .orderBy(F.desc("doc_count"), "category")
            .limit(int(top)))


def stack_quality(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  max_line_len: int = 1000,
                  max_avg_line_len: float = 100.0,
                  min_alnum_frac: float = 0.25) -> DataFrame:
    """The Stack / StarCoder source-file quality filter (Kocetkov et al.
    2022 §II-B, Li et al. 2023 — public): the standard pre-training
    hygiene pass for CODE corpora (the engine's north-star payload —
    auto-generated bundles, minified JS, and binary-ish blobs all trip
    these), per file:

      n_lines       number of newline-split lines (empty lines count —
                    they are real lines of the file and lower the mean)
      max_line_len  longest line, kept <= max_line_len (default 1000)
      avg_line_len  mean line length, kept <= max_avg_line_len (100)
      alnum_frac    alphanumeric characters / total characters, kept >=
                    min_alnum_frac (0.25); empty file -> 0.0
      keep          AND of the three rules

    Scale shape: pure per-row column expressions over array HOFs —
    map-only, zero shuffle, whole-stage codegen; a 100-TB corpus
    filters at scan speed. Thresholds are the papers' defaults."""
    text = F.col(text_col)
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    max_len = F.array_max(F.transform(lines, F.length))
    sum_len = F.aggregate(lines, F.lit(0.0),
                          lambda acc, ln: acc + F.length(ln))
    avg_len = sum_len / n_lines
    n_alnum = F.length(F.regexp_replace(text, "[^A-Za-z0-9]", ""))
    alnum_frac = F.when(F.length(text) > 0,
                        n_alnum.cast("double") / F.length(text)
                        ).otherwise(F.lit(0.0))
    keep = ((max_len <= max_line_len)
            & (avg_len <= max_avg_line_len)
            & (alnum_frac >= min_alnum_frac))
    return docs.select(
        F.col(id_col), n_lines.cast("long").alias("n_lines"),
        max_len.cast("long").alias("max_line_len"),
        F.round(avg_len, 6).alias("avg_line_len"),
        F.round(alnum_frac, 6).alias("alnum_frac"),
        keep.alias("keep"))


def gopher_repetition(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      top_ns: tuple = (2, 3, 4),
                      dup_ns: tuple = (5, 6, 7, 8, 9, 10)) -> DataFrame:
    """The full Gopher repetition battery (Rae et al. 2021, Table A1 —
    the n-gram half; line/paragraph duplication lives in
    dedup.dedup_paragraphs): per document,

      top_{n}gram_frac  (n ∈ top_ns): fraction of TOKEN positions
          covered by occurrences of the single most frequent n-gram
          (count ties broken by the lexicographically greatest gram —
          pinned so both engines pick the same one); Gopher drops docs
          where the top 2/3/4-gram covers > 0.20/0.18/0.16.
      dup_{n}gram_frac  (n ∈ dup_ns): fraction of token positions
          covered by ANY n-gram occurring ≥ 2 times; thresholds
          0.15…0.10 for n = 5…10.

    Coverage is the UNION of the occurrences' [p, p+n-1] spans
    (overlapping repeats never double-count — the DataTrove/NeMo
    reproduction semantics, token-weighted rather than char-weighted:
    deterministic and analyzer-consistent with every other operator
    here).

    Scale shape: ONE doc-key window pass derives all nine gram columns
    via lead() offsets (the significant_text trick), a map-side ×9
    fan-out stacks them into (doc, n, pos, gram) rows, and everything
    after runs on windows over (doc, n[, gram]) partitions — counts
    attach via a window (never a join back), span-union collapses to
    sum(min(gap, n)) under a lag, and the per-(doc, n) sums reuse the
    lag's partitioning (superset key, no extra exchange). No UDF, no
    driver work; the ×9 token-stream fan-out is the knob (drop dup_ns
    entries to cut it)."""
    from pyspark.sql.window import Window

    all_ns = sorted(set(top_ns) | set(dup_ns))
    max_n = max(all_ns)
    toks = simple_token_col(F.col(text_col))
    pos = docs.select(F.col(id_col),
                      F.posexplode(toks).alias("p", "t"))
    w_doc = Window.partitionBy(id_col).orderBy("p")
    w_all = Window.partitionBy(id_col)
    # window exprs (lead/count) materialize in their own select — a
    # generator (explode) cannot share an operator with them
    led = pos.select(
        id_col, "p",
        F.count("*").over(w_all).alias("ntok"),
        *[leads_c.alias(f"_l{j}") for j, leads_c in enumerate(
            [F.col("t")] + [F.lead("t", j).over(w_doc)
                            for j in range(1, max_n)])])
    lead_cols = [F.col(f"_l{j}") for j in range(max_n)]
    grams = [F.struct(F.lit(n).alias("n"),
                      F.when(lead_cols[n - 1].isNotNull(),
                             F.concat_ws(" ", *lead_cols[:n])).alias("gram"))
             for n in all_ns]
    # n=0 pseudo-row (one per non-empty doc, at p=0): carries ntok
    # through the SAME pipeline so n_tokens never needs a second branch
    # off the scan+window subtree (Spark re-executes branches — the
    # session-10 duplicated-subtree rule; this is what kept the text
    # column read twice)
    grams.append(F.struct(
        F.lit(0).alias("n"),
        F.when(F.col("p") == 0, F.lit("")).alias("gram")))
    rows = (led
            .select(id_col, "p", "ntok",
                    F.explode(F.array(*grams)).alias("g"))
            .select(id_col, "p", "ntok",
                    F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
            .where(F.col("gram").isNotNull()))
    w_g = Window.partitionBy(id_col, "n", "gram")
    w_n = Window.partitionBy(id_col, "n")
    rows = rows.withColumn("cnt", F.count("*").over(w_g))
    # window results materialize as columns before the filter (window
    # exprs are illegal inside WHERE)
    rows = rows.withColumn(
        "_top", F.struct("cnt", "gram")
        == F.max(F.struct("cnt", "gram")).over(w_n))
    keep = ((F.col("n").isin(list(top_ns)) & F.col("_top"))
            | (F.col("n").isin(list(dup_ns)) & (F.col("cnt") >= 2))
            | (F.col("n") == 0))
    kept = rows.where(keep)
    w_cov = Window.partitionBy(id_col, "n").orderBy("p")
    prev = F.lag("p").over(w_cov)
    cover = F.when(prev.isNull(), F.col("n")) \
        .otherwise(F.least(F.col("p") - prev, F.col("n")))
    sums = (kept.withColumn("_c", cover)
            .groupBy(id_col, "n")
            .agg(F.max("ntok").alias("ntok"),
                 F.sum("_c").alias("cov")))
    frac = F.round(F.col("cov") / F.greatest(F.col("ntok"), F.lit(1)), 6)
    aggs = []
    for n in top_ns:
        aggs.append(F.coalesce(
            F.max(F.when(F.col("n") == n, frac)), F.lit(0.0))
            .alias(f"top_{n}gram_frac"))
    for n in dup_ns:
        aggs.append(F.coalesce(
            F.max(F.when(F.col("n") == n, frac)), F.lit(0.0))
            .alias(f"dup_{n}gram_frac"))
    # n_tokens rides the n=0 pseudo-rows through the same chain — the
    # text column is scanned ONCE; only 0-token docs (no pos rows at
    # all) come from the id-only base scan, with zeros.
    aggs.append(F.max("ntok").cast("long").alias("n_tokens"))
    per_doc = sums.groupBy(id_col).agg(*aggs)
    base = docs.select(F.col(id_col))
    out_cols = ([F.col(id_col),
                 F.coalesce("n_tokens", F.lit(0)).alias("n_tokens")]
                + [F.coalesce(F.col(f"top_{n}gram_frac"), F.lit(0.0))
                   .alias(f"top_{n}gram_frac") for n in top_ns]
                + [F.coalesce(F.col(f"dup_{n}gram_frac"), F.lit(0.0))
                   .alias(f"dup_{n}gram_frac") for n in dup_ns])
    return base.join(per_doc, id_col, "left").select(*out_cols)


def ngram_diversity(docs: DataFrame, ns: tuple = (1, 2, 3),
                    text_col: str = "text",
                    group_col: str = "source") -> DataFrame:
    """Corpus diversity audit — distinct-n (Li et al. 2016, the standard
    repetitiveness metric in data-quality reports): per group (source /
    language / shard),

        distinct_ratio(n) = |distinct n-grams| / |n-gram occurrences|

    A collapsing ratio as n grows flags a templated or boilerplate-heavy
    source before it poisons a training mix (the corpus-level complement
    of gopher_repetition's per-doc battery).

    Shape: grams build MAP-SIDE per doc (array slice HOFs, no window),
    fan out ×|ns|; ONE shuffle on (group, n, gram) reduces occurrences,
    then the (group, n) re-agg runs over already-reduced gram rows.
    Returns (group, n, n_occurrences, n_distinct, distinct_ratio)
    ordered by (group, n)."""
    toks = simple_token_col(F.col(text_col))

    def _grams(n: int) -> Column:
        # single-arg lambda on purpose: a two-arg lambda makes
        # F.transform pass (element, array_index) and the index would
        # shadow n
        return F.when(
            F.size(toks) >= n,
            F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                        lambda i: F.struct(
                            F.lit(n).alias("n"),
                            F.concat_ws(" ", F.slice(toks, i, n))
                            .alias("gram")))
        ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))

    per_n = [_grams(n) for n in ns]
    rows = docs.select(
        F.col(group_col).alias("group"),
        F.explode(F.flatten(F.array(*per_n))).alias("g"))
    occ = (rows.select("group", F.col("g.n").alias("n"),
                       F.col("g.gram").alias("gram"))
           .groupBy("group", "n", "gram")
           .agg(F.count("*").alias("c")))
    return (occ.groupBy("group", "n")
            .agg(F.sum("c").cast("long").alias("n_occurrences"),
                 F.count("*").cast("long").alias("n_distinct"))
            .select("group", "n", "n_occurrences", "n_distinct",
                    F.round(F.col("n_distinct") / F.col("n_occurrences"),
                            6).alias("distinct_ratio"))
            .orderBy("group", "n"))
