"""Deduplication operators for large-scale corpus curation: exact,
MinHash+LSH, n-gram Jaccard, SimHash, and embedding-cosine near-dup.

Relationship to the reference: Maestro's idempotent upsert keyed by doc id
(SearchAdapterHelper.java:48-154) IS exact dedup at the id level; its
conflict detection (DefaultIndexer.findConflicts:759-768 — same id,
different content) is content-hash dedup. The near-dup family below extends
that to the fuzzy regimes a 100 TB training-data pipeline needs.

Scale design (the part the small-SF oracle can't see):
  * exact dedup = one hash-partitioned groupBy on the md5 — the minimal
    shuffle; at 10^12 rows the key is uniform by construction (no skew).
  * MinHash LSH: signatures are computed map-side (one pass over shingles,
    pre-aggregated per doc), then ONE shuffle per band keyed by
    (band_id, band_hash). Hot buckets (boilerplate docs) are capped with
    `max_bucket` — a bucket with B docs emits B·(B−1)/2 pairs, so a single
    10^6-doc bucket would emit 5·10^11 pairs; capping + reporting is the
    salting analogue for pair-joins (the north rule's skew handling applied
    to dedup).
  * candidate verification joins back to shingle sets ONLY for candidate
    pairs (semi-join pruning) — never an all-pairs join.
  * the md5-string MinHash variant exists for DuckDB-oracle parity; the
    production path is the same dataflow with xxhash64 (8-byte ints,
    4× narrower shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from maestro_spark.operators.textstats import simple_token_col


# spread/pinned live in operators.partitioning (textstats also needs
# spread and dedup imports FROM textstats — a dedup-side definition would
# be circular); re-exported here because dedup is their historical home.
from maestro_spark.operators.partitioning import pinned, spread  # noqa: F401


# ------------------------------------------------------------------ exact

def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     normalize: bool = True) -> DataFrame:
    """Exact dedup via content hash: every doc mapped to its group keeper
    (min id among identical texts). One groupBy-shuffle on the hash.
    Returns (doc_id, fingerprint, keeper_id, group_size, is_dup)."""
    text = F.col(text_col)
    if normalize:
        text = F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))
    d = spread(docs).select(F.col(id_col), F.md5(text).alias("fingerprint"))
    g = d.groupBy("fingerprint").agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("group_size")
    )
    return (
        d.join(g, "fingerprint")
        .select(
            id_col, "fingerprint", "keeper_id", "group_size",
            (F.col(id_col) != F.col("keeper_id")).alias("is_dup"),
        )
    )


def incremental_dedup(batch: DataFrame, store: DataFrame | None,
                      text_col: str = "text", id_col: str = "doc_id",
                      normalize: bool = True) -> DataFrame:
    """Batch-vs-store exact dedup — the shape a PRODUCTION training-data
    pipeline actually runs: each ingest batch dedups against a
    persistent fingerprint store of everything already accepted (the
    daily CommonCrawl-dump pattern), not against itself alone. A batch
    doc is kept iff its fingerprint is absent from the store AND it is
    the min-id holder among the batch's own copies.

    `store` is a frame with a `fingerprint` column (the accumulated
    md5 set; None = empty store → degenerates to exact_duplicates'
    keep rule). Returns (doc_id, fingerprint, dup_of_store,
    dup_in_batch, keep); feed the kept rows' fingerprints back with
    updated_fingerprint_store for the next batch.

    100 TB shape: ONE shuffle on the fingerprint key — store rows and
    batch rows union-tag and reduce under a fingerprint-partitioned
    window (per-fingerprint groups are duplicate-sized; a same-text
    flood concentrates one key, the exact_duplicates caveat). In
    production the store is a bucketed-by-fingerprint table, so this
    shuffle co-locates with the store's layout and only the batch side
    moves."""
    text = F.col(text_col)
    if normalize:
        text = F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))
    b = spread(batch).select(F.col(id_col), F.md5(text).alias("fingerprint"))
    u = b.select(id_col, "fingerprint", F.lit(False).alias("_st"))
    if store is not None:
        # store rows carry no id; type the null placeholder to the
        # BATCH frame's id type (not a hardcoded long) so unionByName
        # works for string/int ids too
        id_type = batch.schema[id_col].dataType
        u = u.unionByName(
            store.select(F.lit(None).cast(id_type).alias(id_col),
                         "fingerprint", F.lit(True).alias("_st")))
    w = Window.partitionBy("fingerprint")
    in_store = F.max(F.col("_st")).over(w)
    min_id = F.min(id_col).over(w)  # nulls (store rows) ignored by min
    return (u.withColumn("dup_of_store", in_store)
            .withColumn("_mi", min_id)
            .where(~F.col("_st"))
            .select(id_col, "fingerprint", "dup_of_store",
                    (F.col(id_col) != F.col("_mi")).alias("dup_in_batch"),
                    (~F.col("dup_of_store")
                     & (F.col(id_col) == F.col("_mi"))).alias("keep")))


def updated_fingerprint_store(decisions: DataFrame,
                              store: DataFrame | None) -> DataFrame:
    """store ∪ the kept batch fingerprints — the next batch's `store`.
    In production this is a MERGE INTO / dynamic-partition append to the
    bucketed fingerprint table, not a rewrite."""
    kept = decisions.where(F.col("keep")).select("fingerprint")
    if store is None:
        return kept
    return store.select("fingerprint").unionByName(kept).distinct()


# --------------------------------------------------------------- shingles

def shingle_col(text: Column, n: int = 3) -> Column:
    """array<string> of word n-gram shingles (space-joined), empty if the
    doc has fewer than n tokens. 1-based element_at matches DuckDB list
    indexing so the oracle expression is structurally identical."""
    toks = simple_token_col(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct — the set representation for Jaccard.
    Dedup is per-doc, so it runs MAP-SIDE (array_distinct before the
    explode): zero shuffle, vs a corpus-wide distinct() that would shuffle
    the entire shingle stream at 100 TB."""
    return docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingle_col(F.col(text_col), n)))
        .alias("shingle"),
    )


# ---------------------------------------------------------------- MinHash

def minhash_signatures(docs: DataFrame, n_hashes: int = 8,
                       text_col: str = "text", id_col: str = "doc_id",
                       shingle_n: int = 3, hash_fn: str = "md5") -> DataFrame:
    """Per-doc MinHash signature as n_hashes columns h0..h{n-1}.

    hash_fn="md5": h_i = min over shingles of md5(i || ':' || shingle) — a
    string-min MinHash, chosen because DuckDB computes the identical value
    (oracle parity). hash_fn="xxhash64": production variant, 8-byte ints.
    Signatures are computed entirely MAP-SIDE: the per-doc shingle set
    stays an array and each h_i is array_min(transform(...)) — no explode,
    no groupBy, ZERO shuffle (the previous explode+groupBy shape shuffled
    a pre-aggregated row per doc; this shuffles nothing). Docs with no
    shingle (< n tokens) yield no row, matching the exploded semantics."""
    arr = F.array_distinct(shingle_col(F.col(text_col), shingle_n))

    # NB: the hash index must be captured by CLOSURE, not a lambda default:
    # a two-arg lambda makes F.transform pass the array POSITION as the
    # second argument, silently replacing the hash index.
    def _h(i: int):
        if hash_fn == "md5":
            return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))
        return lambda s: F.xxhash64(F.lit(i), s)

    sigs = [
        F.array_min(F.transform(F.col("_sh"), _h(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    # The no-shingle filter tests h0 (array_min of empty → null) AFTER the
    # projection, pinned via the `_pin` column — a plain filter here is
    # substituted through the Projects and sunk below the spread() exchange,
    # where it re-runs the whole tokenize→shingle→hash chain on the scan
    # side's (few) input partitions, serializing the heaviest work onto one
    # task. Materializing spark_partition_id() in the SAME projection as
    # `_sh` makes that projection non-deterministic, so the filter stops
    # immediately above it and re-evaluates only h0's array_min over the
    # already-computed `_sh` attribute (1 of n_hashes passes), not the
    # shingle expression itself.
    base = spread(docs).select(
        F.col(id_col), arr.alias("_sh"),
        F.spark_partition_id().alias("_pin"),
    )
    return (
        base.select(id_col, *sigs, "_pin")
        .where(F.col("h0").isNotNull() | (F.col("_pin") < 0))
        .drop("_pin")
    )


def lsh_candidate_pairs(signatures: DataFrame, n_hashes: int = 8,
                        band_size: int = 2, id_col: str = "doc_id",
                        max_bucket: int = 1000) -> DataFrame:
    """LSH banding: split the signature into bands of `band_size` rows;
    docs agreeing on ANY full band become a candidate pair (id1 < id2,
    distinct). P(candidate) = 1 − (1 − J^r)^b.

    Skew guard: buckets larger than max_bucket are dropped AND surfaced in
    the `oversized` column of lsh_bucket_stats — at web scale a single
    boilerplate bucket would otherwise emit O(B²) pairs (see module doc).
    """
    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{b * band_size + r}") for r in range(band_size)]
        bands.append(F.struct(F.lit(b).alias("band"),
                              F.concat_ws("|", *cols).alias("sig")))
    e = signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    sized = e.join(
        e.groupBy("band", "sig").agg(F.count("*").alias("bn")),
        ["band", "sig"],
    ).where(F.col("bn") <= max_bucket)
    a = sized.select(F.col(id_col).alias("id1"), "band", "sig")
    b_ = sized.select(F.col(id_col).alias("id2"), "band", "sig")
    return (
        a.join(b_, ["band", "sig"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def lsh_bucket_stats(signatures: DataFrame, n_hashes: int = 8,
                     band_size: int = 2, id_col: str = "doc_id",
                     max_bucket: int = 1000) -> DataFrame:
    """Per-band bucket histogram + oversized-bucket count (the 'no silent
    caps' audit row: what lsh_candidate_pairs dropped)."""
    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{b * band_size + r}") for r in range(band_size)]
        bands.append(F.struct(F.lit(b).alias("band"),
                              F.concat_ws("|", *cols).alias("sig")))
    e = signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bs")
    ).select(F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    return (
        e.groupBy("band", "sig").agg(F.count("*").alias("bucket_size"))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("bucket_size").alias("max_bucket_size"),
            F.sum(F.when(F.col("bucket_size") > max_bucket, 1).otherwise(0))
            .alias("oversized"),
        )
    )


# ----------------------------------------------------------- exact Jaccard

def jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                  text_col: str = "text", id_col: str = "doc_id",
                  shingle_n: int = 3,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    Without `candidates`: shingle-inverted-index self-join (each shared
    shingle proposes a pair; groupBy counts the intersection) — correct but
    O(Σ bucket²); at web scale ALWAYS pass LSH candidates, which reduces
    the join to the candidate set (semi-join pruning).
    Returns (id1, id2, n_inter, n_union, jaccard) with jaccard rounded to 6.
    """
    if candidates is not None:
        # prune DOCS before shingling: tokenize/shingle cost is then
        # ∝ |candidate docs|, not corpus size (the previous shape shingled
        # the whole corpus and semi-joined the exploded stream)
        pair_docs = (
            candidates.select(F.col("id1").alias(id_col))
            .union(candidates.select("id2"))
            .distinct()
        )
        docs = docs.join(pair_docs, id_col, "left_semi")
    sh = doc_shingles(spread(docs), text_col, id_col, shingle_n)
    # sh feeds three consumers (sizes + both sides of the intersection
    # join); persist so tokenize→shingle→distinct runs once. When pruned by
    # candidates this is tiny; unpruned it is the shingle inverted index.
    sh = sh.persist()
    # per-doc set sizes — computed AFTER candidate pruning (a doc's shingle
    # count is unaffected by dropping other docs)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"),
              (F.col("a.shingle") == F.col("b.shingle"))
              & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id1"),
                 F.col(f"b.{id_col}").alias("id2"))
        .agg(F.count("*").alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id1", "id2"], "left_semi")
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id1")
                   .withColumnRenamed("n", "n1"), "id1")
        .join(sizes.withColumnRenamed(id_col, "id2")
              .withColumnRenamed("n", "n2"), "id2")
        .withColumn("n_union", F.col("n1") + F.col("n2") - F.col("n_inter"))
        .withColumn("jaccard", F.round(F.col("n_inter") / F.col("n_union"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id1", "id2", "n_inter", "n_union", "jaccard")
    )
    return out


def near_dup_pairs(docs: DataFrame, threshold: float = 0.5,
                   n_hashes: int = 8, band_size: int = 2,
                   text_col: str = "text", id_col: str = "doc_id",
                   shingle_n: int = 3, hash_fn: str = "xxhash64") -> DataFrame:
    """The full MinHash→LSH→verify pipeline: signatures → banded candidate
    pairs → exact Jaccard filter ≥ threshold. The production dedup entry
    point (probabilistic recall from banding, exact precision from verify)."""
    # persist signatures: the banding stage fans them into three plan
    # branches (bucket sizing join + both sides of the bucket self-join);
    # unpersisted, each branch would re-tokenize + re-hash the corpus
    # (signatures are map-side but not free). The cached frame is tiny
    # (n_docs × n_hashes ints).
    sigs = minhash_signatures(docs, n_hashes, text_col, id_col, shingle_n,
                              hash_fn).persist()
    # persist candidates: the verify stage consumes them twice (doc-set
    # semi-join + pair semi-join); without this the whole shingle→minhash
    # →band pipeline would be recomputed per consumer
    cands = lsh_candidate_pairs(sigs, n_hashes, band_size, id_col).persist()
    return jaccard_pairs(docs, threshold, text_col, id_col, shingle_n,
                         candidates=cands)


# ----------------------------------------------------------------- SimHash

def simhash(docs: DataFrame, bits: int = 16, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint (Charikar 2002): per token-with-tf, take `bits`
    hash bits; each bit contributes +tf/−tf to its lane; fingerprint bit =
    sign of the lane sum. Near-dups have small Hamming distance.

    Implemented with pure integer column math on the first 4 hex chars of
    md5(term) (16-bit lane source) so the DuckDB oracle reproduces it
    exactly; integer sums → no FP ambiguity. One groupBy(doc) shuffle of
    (doc, term, tf) rows."""
    if bits > 16:
        raise ValueError("oracle-parity simhash supports ≤16 bits")
    toks = simple_token_col(F.col(text_col))
    tf = (
        spread(docs).select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    hex4 = F.substring(F.md5(F.col("term")), 1, 4)

    def hexval(i: int) -> Column:
        c = F.ascii(F.substring(hex4, i + 1, 1))
        return c - F.when(c >= 97, F.lit(87)).otherwise(F.lit(48))

    hv = hexval(0) * 4096 + hexval(1) * 256 + hexval(2) * 16 + hexval(3)
    lanes = [
        F.sum(F.col("tf") * (2 * (F.floor(hv / F.lit(float(1 << j))).cast("int") % 2) - 1))
        .alias(f"l{j}")
        for j in range(bits)
    ]
    lane_df = tf.withColumn("_hv", hv).groupBy(id_col).agg(*lanes)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"l{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return lane_df.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 2, bits: int = 16,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash near-dup pairs with pigeonhole blocking: the fingerprint is
    split into max_hamming+1 bit-blocks — any pair within Hamming distance
    ≤ max_hamming must agree EXACTLY on at least one block — candidates
    pair within blocks, then popcount verifies. Avoids the all-pairs join
    the same way LSH banding does. (At 16 bits small blocks collide often;
    production uses bits=64 where each block still carries ≥16 bits.)"""
    s = simhash(docs, bits, text_col, id_col)
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    sides = []
    for bl in range(n_blocks):
        lo_bit = bl * width
        w = width if bl < n_blocks - 1 else bits - lo_bit  # last takes rest
        blk = (
            F.floor(F.col("simhash") / F.lit(float(1 << lo_bit))).cast("long")
            % (1 << w)
        ).alias("blk")
        sides.append(s.select(id_col, "simhash", blk, F.lit(bl).alias("side")))
    blocks = sides[0]
    for extra in sides[1:]:
        blocks = blocks.union(extra)
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.side") == F.col("b.side"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id1"),
                F.col(f"b.{id_col}").alias("id2"),
                F.col("a.simhash").alias("s1"),
                F.col("b.simhash").alias("s2"))
        .distinct()
    )
    xor = F.col("s1").bitwiseXOR(F.col("s2"))
    ham = sum(
        (F.floor(xor / F.lit(float(1 << j))).cast("int") % 2) for j in range(bits)
    )
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )


# ----------------------------------------------- dedup cluster assembly

def winnow_fingerprints(docs: DataFrame, k: int = 5, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm, public): hash every k-gram of the
    token stream, slide a window of w consecutive gram hashes, and in
    each window select the MINIMUM hash (rightmost on ties — the
    paper's rule, which makes selection depend only on local context).
    Guarantees: any shared substring of >= w + k - 1 tokens yields a
    shared fingerprint, and expected density is 2/(w+1) — the
    position-robust upgrade to doc_fingerprint's whole-doc rolling
    hash, and the standard plagiarism/clone-detection key (join on fp
    across docs).

    Gram hash = first 48 bits of md5 over the space-joined gram, the
    widened hex16 convention (DuckDB computes the identical value, so
    winnow SELECTION — not just equality — is oracle-exact); the
    production swap is xxhash64 over the token slice (the
    significant_text convention: no gram string built). A doc with
    fewer than k tokens has no grams and is absent; with fewer than w
    grams, one window covers all grams (every gram-bearing doc keeps
    >= 1 fingerprint).

    Returns (doc_id, pos, fp): pos = 1-based token index where the
    selected k-gram starts, fp = the 48-bit gram hash, one row per
    DISTINCT selection (overlapping windows re-selecting the same gram
    collapse, as in the paper).

    100 TB shape: everything is array HOFs over one text column inside
    WholeStageCodegen — map-only, ZERO shuffle; output is ~2n/(w+1)
    rows per n-token doc. The cross-doc match join that consumes this
    output is one hash-partitioned join on fp (uniform by
    construction)."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    ts = simple_token_col(F.col(text_col))
    n = F.size(ts)
    m = n - (k - 1)                      # number of k-grams
    grams = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(ts, i, k))),
                        1, 12), 16, 10).cast("long"))
    n_win = F.greatest(m - (w - 1), F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda j: F.struct(
            j.alias("j"),
            F.array_min(F.slice(grams, j, w)).alias("fp")))
    sels = F.transform(
        wins,
        lambda s: F.struct(
            # rightmost position of the window minimum (ties -> later
            # gram wins: the fold keeps overwriting with matches)
            F.aggregate(
                F.sequence(s["j"],
                           F.least(s["j"] + (w - 1), m)),
                F.lit(0),
                lambda acc, o: F.when(
                    F.element_at(grams, o) == s["fp"], o
                ).otherwise(acc)).cast("long").alias("pos"),
            s["fp"].alias("fp")))
    return (docs.where(m >= 1)
            .select(F.col(id_col),
                    F.explode(F.array_distinct(sels)).alias("s"))
            .select(id_col, F.col("s.pos").alias("pos"),
                    F.col("s.fp").alias("fp")))


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 50) -> DataFrame:
    """Connected components over a pair/edge frame → (id, component) for
    every node that appears in an edge; component = the minimum node id
    reachable. This is the cluster-assembly step after any near-dup pair
    generator (LSH, SimHash, embedding): pairs only say "these two are
    dups"; curation needs the transitive closure to keep ONE canonical
    doc per group.

    Algorithm: min-label propagation with POINTER JUMPING — each round
    (a) takes the min label over neighbors+self (one hash-shuffle join +
    aggregation) and (b) replaces every label by its label's label (a
    self-join), which squares the propagation distance, so rounds =
    O(log diameter) like the alternating star contractions of the public
    MapReduce-CC literature (Kiveris et al., "Connected Components in
    MapReduce and Beyond"), expressed in joins Catalyst/AQE can plan.
    Near-dup graphs are near-cliques (diameter 2-4) → 2-3 rounds.

    Scale notes: every join is hash-partitioned on id (uniform keys —
    labels are doc ids); per-round frames are localCheckpointed to cut
    the iterative lineage (physical plans otherwise grow with every
    round) and the convergence check is a one-number aggregate (Σ label
    strictly decreases until fixpoint; no extra join). The giant-
    component worst case (all docs boilerplate-identical) is bounded
    upstream by the LSH hot-bucket cap, the same skew contract as the
    pair join itself."""
    e = pairs.select(F.col(src).cast("long").alias("a"),
                     F.col(dst).cast("long").alias("b"))
    edges = (e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
             .where(F.col("a") != F.col("b"))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("a").alias("id")).distinct()
              .withColumn("label", F.col("id"))
              .localCheckpoint(eager=True))
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = (
            labels.join(nbr_min, "id", "left")
            .select("id", F.least("label", "nbr_label").alias("label"))
        )
        # pointer jump: label <- label(label); every label IS a node id,
        # so the self-join always resolves (coalesce is belt-and-braces)
        x, y = prop.alias("x"), prop.alias("y")
        labels = (
            x.join(y, F.col("x.label") == F.col("y.id"), "left")
            .select(F.col("x.id").alias("id"),
                    F.coalesce(F.col("y.label"), F.col("x.label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("label").alias("component"))


def near_dup_components(docs: DataFrame, threshold: float = 0.5,
                        n_hashes: int = 8, band_size: int = 2,
                        text_col: str = "text", id_col: str = "doc_id"
                        ) -> DataFrame:
    """End-to-end near-dup clustering: MinHash+LSH candidate pairs →
    exact-Jaccard verify at `threshold` → connected components → every
    doc labeled (doc_id, component, is_canonical). Docs in no surviving
    pair are their own singleton component; the canonical doc of a group
    is its min id (deterministic — swap in a quality score upstream by
    remapping ids). This is the materialization step a training-data
    pipeline runs before dropping `is_canonical = false` rows."""
    pairs = near_dup_pairs(docs, threshold, n_hashes, band_size,
                           text_col=text_col, id_col=id_col)
    comp = connected_components(pairs, "id1", "id2")
    return (
        docs.select(id_col)
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("component"))
    )


# ------------------------------------------------ paragraph-level dedup

def split_paragraphs(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     delim: str = r"\n{2,}") -> DataFrame:
    """(id, par_idx, paragraph) by structural separator — the normal
    paragraph source for web/text corpora. Empty segments are dropped;
    par_idx is the 0-based ORIGINAL position (survives the filter), so
    first-occurrence order is the document's real reading order."""
    parts = F.posexplode(F.split(F.col(text_col), delim))
    return (spread(docs).select(F.col(id_col), parts)
            .withColumnRenamed("pos", "par_idx")
            .withColumnRenamed("col", "paragraph")
            .where(F.trim("paragraph") != ""))


def chunk_paragraphs(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", chunk: int = 10) -> DataFrame:
    """(id, par_idx, paragraph) by chunking the simple-token stream into
    fixed windows of `chunk` tokens — the paragraph stand-in for corpora
    without structural separators. 1-based list ops mirror DuckDB so the
    oracle expression is structurally identical."""
    toks = simple_token_col(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk)).cast("int")
    chunks = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda i: F.concat_ws(
                " ", F.slice(toks, (i - 1) * chunk + 1, chunk)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    parts = F.posexplode(chunks)
    return (spread(docs).select(F.col(id_col), parts)
            .withColumnRenamed("pos", "par_idx")
            .withColumnRenamed("col", "paragraph"))


def dedup_paragraphs(pars: DataFrame, id_col: str = "doc_id",
                     idx_col: str = "par_idx",
                     par_col: str = "paragraph",
                     hash_fn: str = "xxhash64") -> DataFrame:
    """Global first-occurrence paragraph dedup (the CCNet/RefinedWeb
    training-data step: repeated boilerplate survives exactly once,
    corpus-wide): among rows with identical paragraph content, only the
    earliest (id, idx) is kept. Returns the kept rows (same columns).

    100 TB shape: ONE partial-agg min(struct(id, idx)) per content hash
    (map-side combine — the shuffle carries one row per distinct
    paragraph per task) + one hash-partitioned join back; no window over
    the corpus, no driver-side state. Boilerplate paragraphs repeated
    millions of times collapse map-side — the skew lands on the combiner,
    not the shuffle. hash_fn: xxhash64 (production) or md5 (64 hex bits,
    SQL-oracle-reproducible); the winner join re-checks nothing — a hash
    collision would merge distinct paragraphs (md5/xxhash64 collision at
    corpus scale: negligible / possible-but-rare; use md5 at 100 TB if
    that risk matters)."""
    h = (F.md5(F.col(par_col)) if hash_fn == "md5"
         else F.xxhash64(F.col(par_col)))
    keyed = pars.withColumn("_phash", h)
    winners = (keyed.groupBy("_phash")
               .agg(F.min(F.struct(F.col(id_col).alias("i"),
                                   F.col(idx_col).alias("x"))).alias("w"))
               .select("_phash", F.col("w.i").alias("_wi"),
                       F.col("w.x").alias("_wx")))
    kept = keyed.join(winners, "_phash").where(
        (F.col(id_col) == F.col("_wi")) & (F.col(idx_col) == F.col("_wx")))
    return kept.drop("_phash", "_wi", "_wx")


# --------------------------------------------- exact substring dedup

def substring_dup_stats(docs: DataFrame, n: int = 8,
                        min_count: int = 2,
                        text_col: str = "text", id_col: str = "doc_id",
                        hash_fn: str = "xxhash64") -> DataFrame:
    """Exact duplicated-substring detection (the ExactSubstr dedup of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — public): a token window of length `n` is *duplicated* when
    the identical window occurs at ≥ `min_count` positions corpus-wide
    (across docs or repeated within one doc). Per doc, the duplicated
    windows' [start, start+n) intervals are unioned and the covered token
    count reported — the span a training pipeline would cut out.

    Returns (doc_id, n_tokens, dup_windows, dup_tokens, dup_fraction),
    one row per doc (zeros when nothing is duplicated).

    100 TB shape (the paper builds a suffix array; the distributed
    equivalent below reproduces its fixed-length-window variant with
    pure DataFrame ops):
      * windows are emitted map-side as (key, doc, start) where key =
        xxhash64 of the window text — an 8-byte uniform shuffle key; the
        window STRING never shuffles (hash_fn="text" keeps the string
        key for SQL-oracle parity at test scale).
      * ONE groupBy(key) with map-side partial counts finds duplicated
        keys; boilerplate windows repeated 10^6× collapse in the
        combiner, so the skew lands on partial agg, not the exchange.
      * the dup-key filter joins back hash-partitioned on the same key
        (no broadcast assumption — the dup-key set at corpus scale is
        itself corpus-sized).
      * interval union is a lead() window partitioned BY DOC (bounded by
        the longest document, never corpus-wide): with starts sorted,
        covered = Σ min(n, next_start − start) over dup windows, + n for
        the last — exact union of overlapping fixed-length intervals.
    """
    toks = simple_token_col(F.col(text_col))
    base = spread(docs).select(
        F.col(id_col), toks.alias("_ts"), F.size(toks).alias("n_tokens"))
    starts = F.when(
        F.col("n_tokens") >= n,
        F.sequence(F.lit(1), F.col("n_tokens") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    gram = F.concat_ws(" ", F.slice(F.col("_ts"), F.col("start"), n))
    key = F.md5(gram) if hash_fn == "md5" else (
        gram if hash_fn == "text" else F.xxhash64(gram))
    w = (base.select(id_col, "_ts", F.explode(starts).alias("start"))
         .select(id_col, "start", key.alias("_k")))
    dup_keys = (w.groupBy("_k").agg(F.count("*").alias("_c"))
                .where(F.col("_c") >= min_count).select("_k"))
    dupw = w.join(dup_keys, "_k").select(id_col, "start")
    nxt = F.lead("start").over(
        Window.partitionBy(id_col).orderBy("start"))
    cov = (dupw.withColumn("_nxt", nxt)
           .groupBy(id_col)
           .agg(F.count("*").alias("dup_windows"),
                F.sum(F.least(F.lit(n), F.coalesce(
                    F.col("_nxt") - F.col("start"), F.lit(n))))
                .alias("dup_tokens")))
    return (
        base.select(id_col, "n_tokens")
        .join(cov, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("dup_windows", F.lit(0)).cast("long")
            .alias("dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long")
            .alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)), 6)
            .alias("dup_fraction"),
        )
    )


def substring_dedup_clean(docs: DataFrame, n: int = 8,
                          min_count: int = 2,
                          text_col: str = "text", id_col: str = "doc_id",
                          hash_fn: str = "xxhash64") -> DataFrame:
    """ExactSubstr dedup MATERIALIZATION (Lee et al. 2022 — the step
    their released tool performs after detection): excise every
    duplicated window occurrence EXCEPT the first, producing the
    cleaned corpus a training pipeline actually feeds the tokenizer.
    Deterministic keep-first rule: a token position p of doc d is
    removed iff some window (d, s), s ≤ p < s+n, has a corpus-wide
    duplicated key (count ≥ min_count) and (d, s) is not that key's
    first occurrence in (doc_id, start) order — so one copy of every
    duplicated passage survives, boilerplate repeated 10⁶× survives
    exactly once.

    Returns (doc_id, n_tokens, kept_tokens, clean_text); clean_text is
    the kept tokens rejoined with single spaces (the simple tokenizer
    is not invertible — whitespace/punctuation normalize away, as in
    the paper's token-level variant).

    100 TB shape — same skeleton as substring_dup_stats plus one
    partial-agg: window keys shuffle as 8-byte hashes (hash_fn="text"
    keeps strings for SQL-oracle parity at test scale); first
    occurrences come from ONE min(struct(doc, start)) per duplicated
    key (map-side combine — the paragraph_dedup shape, no corpus
    window); covered positions and the text rebuild are per-doc
    (bounded by the longest document). The rebuild's
    sort_array(collect_list(struct(pos, term))) is doc-length-bounded,
    never corpus-bounded."""
    toks = simple_token_col(F.col(text_col))
    base = spread(docs).select(
        F.col(id_col), toks.alias("_ts"), F.size(toks).alias("n_tokens"))
    starts = F.when(
        F.col("n_tokens") >= n,
        F.sequence(F.lit(1), F.col("n_tokens") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    gram = F.concat_ws(" ", F.slice(F.col("_ts"), F.col("start"), n))
    key = F.md5(gram) if hash_fn == "md5" else (
        gram if hash_fn == "text" else F.xxhash64(gram))
    w = (base.select(id_col, "_ts", F.explode(starts).alias("start"))
         .select(id_col, "start", key.alias("_k"))).persist()
    dup_keys = (w.groupBy("_k").agg(F.count("*").alias("_c"))
                .where(F.col("_c") >= min_count).select("_k"))
    dupw = w.join(dup_keys, "_k")
    first = (dupw.groupBy("_k")
             .agg(F.min(F.struct(F.col(id_col).alias("d"),
                                 F.col("start").alias("s"))).alias("f"))
             .select("_k", F.col("f.d").alias("_fd"),
                     F.col("f.s").alias("_fs")))
    later = (dupw.join(first, "_k")
             .where((F.col(id_col) > F.col("_fd"))
                    | ((F.col(id_col) == F.col("_fd"))
                       & (F.col("start") > F.col("_fs")))))
    covered = (later.select(
                   F.col(id_col),
                   F.explode(F.sequence(
                       F.col("start"),
                       F.col("start") + F.lit(n - 1))).alias("pos"))
               .distinct())
    tok_rows = base.select(
        id_col, "n_tokens",
        F.posexplode("_ts").alias("pos0", "term")
    ).withColumn("pos", F.col("pos0") + 1).drop("pos0")
    kept = tok_rows.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = (kept.groupBy(id_col, "n_tokens")
               .agg(F.sort_array(F.collect_list(
                        F.struct("pos", "term"))).alias("_kt"))
               .select(
                   id_col,
                   F.col("n_tokens").cast("long").alias("n_tokens"),
                   F.size("_kt").cast("long").alias("kept_tokens"),
                   F.concat_ws(
                       " ", F.transform(F.col("_kt"), lambda s: s["term"])
                   ).alias("clean_text")))
    # a doc absent from `rebuilt` had NO surviving token rows — either
    # empty to begin with or fully excised; both get kept_tokens = 0
    return (base.select(id_col,
                        F.col("n_tokens").cast("long").alias("n_tokens"))
            .join(rebuilt.drop("n_tokens"), id_col, "left")
            .select(id_col, "n_tokens",
                    F.coalesce("kept_tokens", F.lit(0).cast("long"))
                    .alias("kept_tokens"),
                    F.coalesce("clean_text", F.lit(""))
                    .alias("clean_text")))
