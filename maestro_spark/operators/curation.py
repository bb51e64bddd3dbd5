"""Corpus curation operators for training-data assembly: deterministic
stratified sampling, per-stratum token-budget capping, and distribution
statistics. These are the "data mixing" steps between dedup/quality
scoring and training (beyond the reference's scope — Maestro only
upserts/filters documents; SURVEY.md "beyond the reference" family).

Design rules shared by all three:

  * DETERMINISTIC, not pseudo-random. Sampling uses an md5-derived
    uniform of (salt, id) — identical on every run, engine, partition
    layout, and cluster size, so a 100 TB mix is resumable and auditable
    (and SQL-reproducible for the oracle). Spark's sample()/sampleBy()
    are seed-dependent on partitioning and unusable for reproducible
    curation.
  * One narrow pass each: the sampler is a filter (no shuffle at all);
    the budget cap is one window over (stratum) — a single hash
    shuffle on the stratum key; quantiles are one groupBy aggregation.
  * Skew: strata counts are pipeline-chosen (languages, sources —
    dozens), so a per-stratum window is safe; a pathological single
    stratum degrades to a sort of that stratum only.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from maestro_spark.operators.textstats import hex16_col


def uniform01(id_col: str, salt: str = "s1") -> "F.Column":
    """Deterministic uniform in [0, 1) from an id column: the first 16
    bits of md5(salt || id) over 65536. 16-bit resolution bounds the
    fraction granularity at 1/65536 — ample for mix ratios, and exactly
    reproducible in ANSI SQL (oracle parity, textstats.hex16_col)."""
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    return hex16_col(key) / F.lit(65536.0)


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      strata_col: str = "source", id_col: str = "doc_id",
                      salt: str = "s1") -> DataFrame:
    """Keep each doc with its stratum's probability, deterministically:
    doc survives iff uniform01(id) < fractions[stratum]. Strata absent
    from `fractions` are dropped (a mix is an explicit allowlist).
    Pure filter — no shuffle, no RNG state, stable under retries and
    repartitioning."""
    u = uniform01(id_col, salt)
    frac = reduce(
        lambda acc, kv: acc.when(F.col(strata_col) == kv[0], F.lit(kv[1])),
        fractions.items(),
        F.when(F.lit(False), F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    return docs.where(u < frac)


def token_budget_cap(docs: DataFrame, budget: int,
                     token_col: str = "n_chars",
                     strata_col: str = "source",
                     order_col: str = "n_chars",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-stratum budget cap: rank docs inside each stratum by
    (order_col desc, id asc — deterministic ties) and keep the prefix
    whose running token sum stays within `budget`. The greedy
    best-first fill every mix pipeline runs ("top documents by quality
    until N tokens per source"). One window = one hash shuffle on the
    stratum key. Adds `cum_tokens` (the running sum, long)."""
    w = (Window.partitionBy(strata_col)
         .orderBy(F.desc(order_col), F.asc(id_col)))
    cum = F.sum(token_col).over(w).cast("long")
    return (docs.withColumn("cum_tokens", cum)
            .where(F.col("cum_tokens") <= budget))


def column_quantiles(docs: DataFrame, value_col: str = "n_chars",
                     strata_col: str = "lang",
                     qs: tuple = (0.25, 0.5, 0.75, 0.9)) -> DataFrame:
    """Exact per-stratum quantiles (linear interpolation) of a numeric
    column → (stratum, q, value). The length/token distribution audit
    every curation run records. Uses Spark's exact `percentile`
    aggregate (one groupBy shuffle); at 100 TB swap in
    `approx_percentile` for the same shape at sketch cost — kept exact
    here so the result is oracle-checkable."""
    arr = F.percentile(F.col(value_col), F.array(*[F.lit(float(q)) for q in qs]))
    g = docs.groupBy(F.col(strata_col).alias("stratum")).agg(arr.alias("qv"))
    return (g.select("stratum", F.posexplode("qv").alias("pos", "value"))
            .select(
                "stratum",
                F.element_at(F.array(*[F.lit(float(q)) for q in qs]),
                             F.col("pos") + 1).alias("q"),
                F.round("value", 6).alias("value"),
            ))


def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str = "text",
                  hash_shingles: bool = True) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM appendix rule): flag
    training docs sharing any word n-gram with the evaluation set.
    Returns (id, n_bad, contaminated): n_bad = number of the doc's
    DISTINCT n-grams that appear anywhere in the eval set.

    100 TB shape: the eval side is dim-sized by definition — its distinct
    shingle set BROADCASTS; the corpus side dedupes per doc MAP-SIDE
    (array_distinct before the explode) and the overlap check is a
    broadcast semi-join, so the corpus reaches the join with ZERO shuffle
    and only the surviving hits shuffle for the per-doc count. If the eval set ever outgrows broadcast, drop the broadcast()
    hint and the same plan becomes a shuffle join on the shingle hash.

    hash_shingles=True (default) hashes each n-gram WINDOW directly
    (xxhash64 over the token-array slice — no n-gram string is ever
    built, and the corpus-scale distinct/join moves 8-byte longs instead
    of ~n-word strings). Tokens contain no separator characters, so
    array-window distinctness ≡ joined-string distinctness. A 64-bit
    collision would miscount one doc's n_bad (birthday odds ~1e-6 at
    10^7 shingles; rerun with hash_shingles=False to verify a specific
    hit)."""
    from maestro_spark.operators.dedup import shingle_col
    from maestro_spark.operators.textstats import simple_token_col

    def keyed(frame, col, with_id):
        if hash_shingles:
            toks = simple_token_col(F.col(col))
            arr = F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.xxhash64(F.slice(toks, i, n)),
                ),
            ).otherwise(F.array().cast("array<long>"))
        else:
            arr = shingle_col(F.col(col), n)
        if with_id:
            # per-doc distinct is MAP-SIDE (array_distinct before the
            # explode): the corpus side reaches the broadcast semi-join
            # with zero shuffle; only the post-join per-doc counts (hits
            # only) ever shuffle
            return frame.select(
                F.col(id_col),
                F.explode(F.array_distinct(arr)).alias("shingle"))
        # eval side: global distinct over a dim-sized set (broadcast prep)
        return frame.select(F.explode(arr).alias("shingle")).distinct()

    from maestro_spark.operators.dedup import spread

    ev = keyed(eval_docs, eval_text_col, with_id=False)
    corp = keyed(spread(docs), text_col, with_id=True)
    hits = (corp.join(F.broadcast(ev), "shingle", "left_semi")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_bad")))
    return (docs.select(id_col).join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_bad", F.lit(0)).alias("n_bad"),
                    (F.coalesce("n_bad", F.lit(0)) > 0).alias("contaminated")))


def split_overlap(docs: DataFrame, n: int = 8,
                  text_col: str = "text",
                  split_col: str = "source") -> DataFrame:
    """Cross-split n-gram overlap matrix — the train/test leakage audit
    a training-data pipeline runs BEFORE decontaminate() tells it what
    to drop (same n-gram membership rule as the GPT-3/PaLM appendix,
    lifted from one eval set to every split×split pair): for each
    ordered pair of splits,

        n_shared  = |distinct n-grams in a ∩ distinct n-grams in b|
        frac_of_a = n_shared / |distinct n-grams in a|

    so a high frac_of_a with small a (an eval split) is leakage, and
    the matrix is asymmetric on purpose.

    100 TB shape: grams travel as xxhash64 of the token window (8-byte
    longs, no gram strings — decontaminate's trick, same ~1e-6 birthday
    caveat); per-doc distinct collapses map-side (array_distinct before
    the explode), then ONE corpus-scale shuffle on the gram hash builds
    gram → sorted set of splits (bounded by the split count). Everything
    after — per-split totals, pair expansion via array HOFs, the pair
    counts — runs over those already-reduced rows; pair rows are
    |splits|²-bounded. Pairs that share nothing are absent (inner-join
    semantics, mirrored by the oracle).

    Returns DataFrame(split_a, split_b, n_shared, n_a, frac_of_a)
    ordered by (split_a, split_b)."""
    from maestro_spark.operators.textstats import simple_token_col

    toks = simple_token_col(F.col(text_col))
    arr = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.xxhash64(F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<long>"))
    g = docs.select(F.col(split_col).alias("split"),
                    F.explode(F.array_distinct(arr)).alias("gram"))
    sets = g.groupBy("gram").agg(
        F.sort_array(F.collect_set("split")).alias("splits"))
    # ONE pair expansion serves both the totals and the intersections:
    # the self-pair (a,a) counts a's distinct grams (every gram of a
    # emits it), the cross pair (a,b) counts shared grams — so the whole
    # matrix reduces in a single pass with no second branch re-running
    # the corpus shuffle (the session-10 duplicated-subtree rule)
    counts = (sets.select(F.explode(F.flatten(F.transform(
                  "splits",
                  lambda a: F.transform(
                      "splits",
                      lambda b: F.struct(a.alias("a"), b.alias("b")))))
              ).alias("p"))
              .groupBy(F.col("p.a").alias("split_a"),
                       F.col("p.b").alias("split_b"))
              .agg(F.count("*").alias("n_shared")))
    # n_a = the self-pair row's count, lifted over each split_a group by
    # a window over the ALREADY-REDUCED pair rows (a totals-join branch
    # would physically re-run the corpus gram shuffle — Spark does not
    # share exchanges across DataFrame branches)
    w = Window.partitionBy("split_a")
    n_a = F.max(F.when(F.col("split_a") == F.col("split_b"),
                       F.col("n_shared"))).over(w)
    return (counts.withColumn("n_a", n_a)
            .where(F.col("split_a") != F.col("split_b"))
            .select("split_a", "split_b", "n_shared", "n_a",
                    F.round(F.col("n_shared") / F.col("n_a"), 6)
                    .alias("frac_of_a"))
            .orderBy("split_a", "split_b"))


def pack_sequences(docs: DataFrame, budget: int,
                   token_col: str = "n_chars",
                   strata_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Greedy sequence packing — the training-batch assembly step that
    follows curation (GPT-3/T5-style example packing, public): within
    each stratum, walk docs in ascending id order and append each to
    the current pack unless it would push the pack past `budget`
    tokens; then start a new pack. Docs are never split; a doc larger
    than the budget gets a pack of its own. Deterministic (pure
    function of the sorted group), so the assignment is reproducible on
    any cluster layout and SQL-checkable (recursive-CTE oracle).

    Returns (strata_col, id_col, token_col, pack_id, pack_fill):
    pack_id is stratum-local 0-based, pack_fill the running token sum
    within the doc's pack.

    Scale shape: one applyInPandas per stratum — the same single hash
    shuffle token_budget_cap pays. The scan-with-reset inside a group
    is NOT a per-row Python loop: one cumsum, then one searchsorted per
    PACK boundary — O(n + #packs·log n), and #packs ≪ n whenever the
    budget holds multiple docs."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    import numpy as np
    import pandas as pd

    schema = (f"{strata_col} string, {id_col} long, {token_col} long, "
              "pack_id long, pack_fill long")

    def pack_group(key, pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort")
        t = pdf[token_col].to_numpy(np.int64)
        c = np.cumsum(t)
        n = t.size
        pack = np.empty(n, dtype=np.int64)
        fill = np.empty(n, dtype=np.int64)
        s, offset, pid = 0, 0, 0
        while s < n:
            j = int(np.searchsorted(c, offset + budget, side="right")) - 1
            if j < s:
                j = s  # single doc over budget: its own pack
            pack[s:j + 1] = pid
            fill[s:j + 1] = c[s:j + 1] - offset
            offset = int(c[j])
            s, pid = j + 1, pid + 1
        return pd.DataFrame({
            strata_col: pdf[strata_col].to_numpy(),
            id_col: pdf[id_col].to_numpy(np.int64),
            token_col: t,
            "pack_id": pack,
            "pack_fill": fill,
        })

    return (docs.select(strata_col, id_col, token_col)
            .groupBy(strata_col)
            .applyInPandas(pack_group, schema=schema))


def dsir_weights(docs: DataFrame, target: DataFrame,
                 n_buckets: int = 1024, text_col: str = "text",
                 id_col: str = "doc_id",
                 target_text_col: str = "text") -> DataFrame:
    """DSIR importance weights — Data Selection via Importance Resampling
    (Xie et al. 2023, public): score every corpus doc by how much more
    likely its tokens are under a small TARGET domain sample than under
    the background corpus, using hashed-unigram bag-of-words LMs:

        w(doc) = Σ_t  ln p_tgt(h(t)) − ln p_bg(h(t))

    with h = 16-bit md5 bucket (mod n_buckets, SQL-reproducible) and
    add-one smoothing over the bucket vocabulary. High w = target-like;
    a mix pipeline keeps the top fraction (or samples ∝ exp w).

    Scale shape: the two LMs reduce to ≤ n_buckets rows each (one
    partial-agg groupBy per side; the target is sample-sized anyway);
    the per-bucket log-ratio table joins the corpus token stream as a
    BROADCAST (n_buckets rows — never a corpus-keyed shuffle), then one
    partial-agg groupBy(doc) sums. Nothing corpus-scale shuffles on a
    term key. Returns (doc_id, n_tokens, logratio rounded 6)."""
    from pyspark.sql.functions import broadcast

    from maestro_spark.operators.textstats import (hex16_col,
                                                   simple_token_col)

    def tok(df: DataFrame, tcol: str, icol) -> DataFrame:
        return df.select(
            *( [F.col(icol).alias("_id")] if icol else [] ),
            F.explode(simple_token_col(F.col(tcol))).alias("term"),
        ).withColumn("bucket", hex16_col(F.col("term")) % n_buckets) \
         .drop("term")

    bg = tok(docs, text_col, id_col)
    tg = tok(target, target_text_col, None)
    bg_counts = bg.groupBy("bucket").agg(F.count("*").alias("bg_n"))
    tg_counts = tg.groupBy("bucket").agg(F.count("*").alias("tg_n"))
    # the LM totals ride a single-partition window over the reduced
    # (≤ n_buckets-row) joined frame — the full outer join keeps every
    # bucket from both sides, so the coalesced sums ARE the totals. The
    # agg-then-crossJoin alternative physically re-runs the corpus
    # tokenization subtree once per total (no planner exchange reuse
    # across branches).
    _wall = Window.partitionBy(F.lit(0))
    weights = (
        bg_counts.join(tg_counts, "bucket", "full_outer")
        .withColumn("bg_tot",
                    F.sum(F.coalesce("bg_n", F.lit(0))).over(_wall))
        .withColumn("tg_tot",
                    F.sum(F.coalesce("tg_n", F.lit(0))).over(_wall))
        .select(
            "bucket",
            (F.log((F.coalesce("tg_n", F.lit(0)) + 1.0)
                   / (F.col("tg_tot") + float(n_buckets)))
             - F.log((F.coalesce("bg_n", F.lit(0)) + 1.0)
                     / (F.col("bg_tot") + float(n_buckets))))
            .alias("w"),
        )
    )
    return (bg.join(broadcast(weights), "bucket", "inner")
            .groupBy(F.col("_id").alias(id_col))
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.sum("w"), 6).alias("logratio")))


def mix_sources(docs: DataFrame, weights: dict[str, float],
                total_docs: int, strata_col: str = "source",
                id_col: str = "doc_id", salt: str = "mix") -> DataFrame:
    """Dataset mixing to target proportions — the static-weight mix
    step of LLM-corpus assembly (the Pile/DoReMi recipe applied with
    fixed weights, public): sample source s at

        rate_s = min(1, total_docs · w_s / n_s)

    (w normalized over the listed sources; unlisted sources drop), so
    the output approximates total_docs docs at the target mix.
    Undersupplied sources cap at rate 1.0 and keep everything — the
    cap is visible in the emitted mix_rate column rather than silently
    redistributed (no silent caps).

    Scale shape: ONE partial-agg count per listed source (|sources|
    rows, broadcast back onto the scan), then uniform01's md5 pure
    filter — deterministic under retries/repartitioning, no RNG state,
    no extra shuffle. Output: the sampled rows + their source's
    mix_rate (rounded 6) for downstream reweighting audits."""
    wsum = float(sum(weights.values()))
    tgt = {s: float(w) / wsum for s, w in weights.items()}
    counts = (docs.where(F.col(strata_col).isin(list(weights)))
              .groupBy(strata_col)
              .agg(F.count("*").cast("double").alias("_n")))
    tgt_col = reduce(
        lambda acc, kv: acc.when(F.col(strata_col) == kv[0],
                                 F.lit(kv[1])),
        tgt.items(), F.when(F.lit(False), F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    rate = F.least(F.lit(1.0),
                   F.lit(float(total_docs)) * tgt_col / F.col("_n"))
    u = uniform01(id_col, salt)
    return (docs.join(F.broadcast(counts), strata_col)
            .where(u < rate)
            .withColumn("mix_rate", F.round(rate, 6))
            .drop("_n"))


def temperature_mix(docs: DataFrame, total_docs: int,
                    temperature: float = 0.7,
                    strata_col: str = "source",
                    id_col: str = "doc_id",
                    salt: str = "tmix") -> DataFrame:
    """Temperature-scaled mixture sampling — the multilingual/multi-
    source reweighting rule of mBERT/XLM-R/mT5 (public: Conneau 2020
    §3.1, Xue 2021 §3.2): source s is sampled with probability

        p_s ∝ n_s^T        (T = temperature, 0 < T ≤ 1)

    so T=1 keeps natural proportions and T→0 approaches uniform over
    sources — the standard fix for low-resource sources being drowned
    out. Weights DERIVE FROM THE DATA (one count agg), unlike
    mix_sources' caller-fixed weights; sampling is the same
    deterministic md5 pure filter (rate_s = min(1, total·p_s / n_s),
    caps visible in mix_rate, never silently redistributed).

    Same 100 TB shape as mix_sources: one |sources|-row partial agg
    broadcast back onto the scan, zero extra shuffle, no RNG state."""
    if not (0.0 < temperature <= 1.0):
        raise ValueError("temperature must be in (0, 1]")
    counts = (docs.groupBy(strata_col)
              .agg(F.count("*").cast("double").alias("_n")))
    # p_s = n_s^T / Σ n^T via a window over the |sources|-row agg (an
    # agg-then-crossJoin total would re-run the corpus count branch)
    wall = Window.partitionBy(F.lit(0))
    p = (F.pow(F.col("_n"), F.lit(float(temperature)))
         / F.sum(F.pow(F.col("_n"), F.lit(float(temperature)))).over(wall))
    rated = counts.withColumn(
        "_rate", F.least(F.lit(1.0), F.lit(float(total_docs)) * p / F.col("_n")))
    u = uniform01(id_col, salt)
    return (docs.join(F.broadcast(rated), strata_col)
            .where(u < F.col("_rate"))
            .withColumn("mix_rate", F.round(F.col("_rate"), 6))
            .drop("_n", "_rate"))


def shuffle_shard_assign(docs: DataFrame, n_shards: int,
                         id_col: str = "doc_id",
                         salt: str = "shuf") -> DataFrame:
    """The LAST step of every training-data pipeline: a DETERMINISTIC
    global shuffle + sharding of the final corpus (training frameworks
    read shards sequentially, so upstream ordering bias — by source, by
    crawl date, by dedup cluster — must be destroyed here, and the
    permutation must be reproducible for resume/audit; the
    webdataset/t5-style pre-shuffled shard layout, public practice).

      shard = first-16-md5-bits(salt‖'s'‖id) mod n_shards
      pos   = rank of md5(salt‖'r'‖id) within the shard (ties by id)

    Both derive from the id alone — no RNG state, identical under
    retries and repartitioning, and exactly reproducible in SQL (the
    oracle recomputes the full assignment).

    Scale shape: assignment is a pure map; the position rank is one
    window per shard partition — at 10^12 docs that is n_shards
    balanced sorts of |corpus|/n_shards keys each (the shuffle you are
    buying — it IS the product). Writing is
    tableio.write_partitioned(out, ["shard"]) over this frame with
    sortWithinPartitions("pos"): one exchange, shard files land in
    shuffled order. Returns (id, shard, pos)."""
    d = docs.select(F.col(id_col))
    sid = F.concat(F.lit(salt + "s"), F.col(id_col).cast("string"))
    rid = F.concat(F.lit(salt + "r"), F.col(id_col).cast("string"))
    shard = (hex16_col(sid) % F.lit(int(n_shards))).alias("shard")
    rank_key = F.md5(rid)
    w = Window.partitionBy("shard").orderBy("_rk", id_col)
    return (d.select(id_col, shard, rank_key.alias("_rk"))
            .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
            .select(id_col, F.col("shard").cast("int").alias("shard"),
                    "pos"))


def write_shuffled_shards(docs: DataFrame, out_dir: str, n_shards: int,
                          id_col: str = "doc_id",
                          salt: str = "shuf") -> None:
    """Materialize the shuffled corpus: shuffle_shard_assign's
    permutation joined back to the rows, ONE exchange on the shard key,
    rows sorted by `pos` inside each shard partition, written as
    shard=N hive dirs (parquet preserves in-file row order, so a
    sequential reader of shard files streams the corpus in shuffled
    order — the webdataset contract). The assignment join is on the id
    (both sides derive from `docs`, so AQE picks the local strategy);
    at 10^12 docs the repartition IS the one unavoidable full shuffle
    of this pipeline stage."""
    from maestro_spark.sources.tableio import write_partitioned

    asg = shuffle_shard_assign(docs, n_shards, id_col, salt)
    joined = docs.join(asg, id_col)
    out = (joined.repartition(n_shards, F.col("shard"))
           .sortWithinPartitions("shard", "pos"))
    write_partitioned(out, out_dir, ["shard"])


def ccnet_buckets(docs: DataFrame, text_col: str = "text",
                  lang_col: str = "lang", id_col: str = "doc_id",
                  n_buckets: int = 3) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    §3.3, public): score each document with a language-model fluency
    score — here the corpus unigram LM (textstats.unigram_logprob, the
    KenLM stand-in this repo uses throughout) — then split EACH
    LANGUAGE into `n_buckets` equal-count buckets by score order.
    Bucket 1 ("head") is the most fluent third, "tail" the least; LLM
    pipelines train on head+middle and drop or downweight tail.

    Deterministic: ntile over (rounded score desc, doc_id) — a total
    order, so buckets are identical across runs, partitionings, and
    engines (the DuckDB oracle reproduces them exactly).

    Scale shape: LM scoring is two partial-agg groupBys + one
    term-keyed sort-merge join (see unigram_logprob — nothing
    corpus-sized on the driver); the split is ONE window partitioned by
    language, so each language sorts in its own tasks, no global sort.
    Caveat at 100 TB: a dominant language funnels through one task's
    sort — swap the ntile for approx_percentile score cutoffs computed
    in a first pass (two-phase, buckets identical up to quantile
    error); kept exact here for the oracle contract."""
    from maestro_spark.operators.textstats import unigram_logprob
    scores = unigram_logprob(docs, text_col=text_col, id_col=id_col)
    w = (Window.partitionBy(lang_col)
         .orderBy(F.desc("avg_logprob"), F.asc(id_col)))
    bucket = F.ntile(n_buckets).over(w)
    name = bucket.cast("string")
    if n_buckets == 3:
        name = (F.when(bucket == 1, "head")
                .when(bucket == 2, "middle")
                .otherwise("tail"))
    return (docs.select(id_col, lang_col)
            .join(scores, id_col)
            .select(id_col, lang_col, "avg_logprob",
                    bucket.alias("bucket"), name.alias("bucket_name")))


def frequent_item_sets(docs: DataFrame, min_support: float = 0.25,
                       top: int = 20, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """ES frequent_item_sets aggregation (8.x, public API; the classic
    apriori pair-mining step): item = a distinct token of the doc, a
    PAIR is frequent when >= min_support of ALL docs contain both.
    Returns (item1, item2, doc_count, support), the `top` most frequent
    pairs, ordered (doc_count desc, item1, item2) — fully deterministic.

    100 TB shape:
      * singleton pass: ONE partial-agg groupBy(item) over distinct
        (doc, item) — uniform key, combiner-collapsed.
      * apriori prune: only items with df >= ceil(s*N) survive; that set
        is SMALL by construction (<= avg_items_per_doc / s entries), so
        the item filter is a BROADCAST semi-join — no shuffle.
      * pair generation is map-side: per-doc sorted frequent-item arrays
        (one doc-keyed groupBy) explode to i<j combinations with array
        HOFs (JVM, no Python). Per-doc cost is O(m^2) where m is the
        doc's FREQUENT-item count — bounded by the prune, not by doc
        length.
      * pair counting: ONE groupBy on the (item1, item2) key; hot pairs
        (stop-word pairs) collapse in the combiner.
      * min_support should be a binary fraction (0.25, 0.125) if oracle
        cross-checking matters: ceil(s*N) is then ulp-exact on every
        engine.
    """
    from maestro_spark.operators.dedup import spread
    from maestro_spark.operators.textstats import simple_token_col

    dt = (spread(docs)
          .select(F.col(id_col),
                  F.explode(F.array_distinct(
                      simple_token_col(F.col(text_col)))).alias("item")))
    nd = docs.agg(F.count("*").alias("_n"))
    thr = F.ceil(F.lit(min_support) * F.col("_n"))
    f1 = (dt.groupBy("item").agg(F.count("*").alias("_df"))
          .crossJoin(F.broadcast(nd))
          .where(F.col("_df") >= thr)
          .select("item"))
    arr = (dt.join(F.broadcast(f1), "item")
           .groupBy(id_col)
           .agg(F.sort_array(F.collect_set("item")).alias("_a")))
    a = F.col("_a")
    combos = F.flatten(F.transform(
        a,
        lambda x, i: F.transform(
            F.slice(a, i + F.lit(2),
                    F.greatest(F.size(a) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("item1"), y.alias("item2")),
        ),
    ))
    pairs = arr.select(F.explode(combos).alias("p")).select("p.*")
    return (
        pairs.groupBy("item1", "item2")
        .agg(F.count("*").alias("doc_count"))
        .crossJoin(F.broadcast(nd))
        .where(F.col("doc_count") >= thr)
        .select("item1", "item2", F.col("doc_count").cast("long")
                .alias("doc_count"),
                F.round(F.col("doc_count") / F.col("_n"), 6)
                .alias("support"))
        .orderBy(F.desc("doc_count"), "item1", "item2")
        .limit(top)
    )


def chunk_windows(docs: DataFrame, window: int = 250, overlap: int = 100,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Overlapping token-window chunking — the retrieval/embedding prep
    step (RAG chunking, public practice) and the ES `semantic_text`
    field's "word" chunking strategy (max_chunk_size words per chunk,
    the next chunk re-reading `overlap` words of the previous one, i.e.
    stride = window - overlap; the final chunk is whatever remains).

    Chunk count per doc: 1 if n <= window else
    ceil((n - window) / stride) + 1 — every token is covered, chunk i
    starts at i*stride, and only the last chunk may be short.

    Returns (doc_id, chunk_idx, start_tok, n_toks, chunk) — chunk is
    the space-joined token window the embedder consumes.

    100 TB shape: tokenize/sequence/transform/slice are all array HOFs
    over one text column inside WholeStageCodegen — map-only, ZERO
    shuffle, and the explode multiplies rows by ~n/stride without ever
    re-reading the source text (each output row carries only its own
    window's text)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if not 0 <= overlap < window:
        raise ValueError("overlap must satisfy 0 <= overlap < window")
    stride = window - overlap
    from maestro_spark.operators.textstats import simple_token_col
    ts = simple_token_col(F.col(text_col))
    n = F.size(ts)
    n_chunks = F.when(
        n <= window, F.lit(1)
    ).otherwise(F.ceil((n - window) / F.lit(float(stride))) + 1)
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            (i * stride).cast("long").alias("start_tok"),
            F.slice(ts, i * stride + 1, window).alias("_w")))
    return (docs
            .where(F.size(ts) > 0)   # token-free docs emit no chunks
            .select(F.col(id_col), F.explode(chunks).alias("c"))
            .select(
                id_col,
                F.col("c.chunk_idx").alias("chunk_idx"),
                F.col("c.start_tok").alias("start_tok"),
                F.size("c._w").cast("long").alias("n_toks"),
                F.array_join("c._w", " ").alias("chunk")))


def c4_quality(docs: DataFrame, min_words_per_line: int = 5,
               min_sentences: int = 3, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2, public recipe),
    line-level filtering + page-level gating:

      line kept  iff it ends in a terminal punctuation mark (. ! ? ")
                 AND has >= min_words_per_line whitespace words
                 AND does not mention 'javascript' (case-insensitive)
      page kept  iff the kept text has >= min_sentences terminal marks
                 AND the page has no 'lorem ipsum'
                 AND the page has no curly brace '{'

    Returns one row per doc: (doc_id, total_lines, kept_lines,
    n_sentences, has_lorem, has_brace, keep, clean_text) where
    clean_text is the newline-join of the kept lines — the artifact a
    pipeline trains on.

    100 TB shape: pure column expressions over one text column — split /
    filter / rlike array HOFs, all inside WholeStageCodegen, map-only,
    ZERO shuffle. The page decision never leaves the row it reads. (The
    recipe's fourth rule — three-sentence dedup across pages — is the
    corpus-wide step and lives in paragraph_dedup / substring_dedup.)
    """
    trimmed = F.transform(F.split(F.col(text_col), "\n"),
                          lambda l: F.trim(l))
    lines = F.filter(trimmed, lambda l: l != "")
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]$')
        & (F.size(F.filter(F.split(l, "\\s+"), lambda w: w != ""))
           >= int(min_words_per_line))
        & ~F.lower(l).contains("javascript"))
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit("[.!?]"))
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("total_lines"),
        F.size(kept).cast("long").alias("kept_lines"),
        n_sent.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        ((n_sent >= int(min_sentences)) & ~has_lorem & ~has_brace)
        .alias("keep"),
        clean.alias("clean_text"))
