"""Dedup operator tests: exact groups, MinHash+LSH recall vs exact
Jaccard ground truth on the driver's documents table (which contains
planted near-duplicate pairs), SimHash blocking, and skew guards."""

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_exact_duplicates_planted(spark):
    rows = [(0, "aaa bbb ccc"), (1, "aaa  bbb\tccc"), (2, "xxx yyy"), (3, "zzz")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.exact_duplicates(d).collect()}
    # whitespace-normalized: 0 and 1 are the same group
    assert out[0]["keeper_id"] == 0 and not out[0]["is_dup"]
    assert out[1]["keeper_id"] == 0 and out[1]["is_dup"]
    assert out[1]["group_size"] == 2
    assert not out[2]["is_dup"] and not out[3]["is_dup"]


def test_near_dup_lsh_matches_exact_jaccard(spark, documents):
    """Production path (xxhash64 MinHash, 16 hashes × band 2) must recover
    every pair the exhaustive shingle Jaccard finds at threshold 0.5 —
    on this corpus the planted near-dups are J≥0.97, so banding recall
    (1-(1-J^2)^8 ≈ 1) makes the sets exactly equal."""
    exact = {
        (r["id1"], r["id2"])
        for r in dedup.jaccard_pairs(documents, 0.5).collect()
    }
    lsh = {
        (r["id1"], r["id2"])
        for r in dedup.near_dup_pairs(documents, 0.5, 16, 2,
                                      hash_fn="xxhash64").collect()
    }
    assert exact, "corpus should contain planted near-dup pairs"
    assert lsh == exact


def test_jaccard_values_sane(documents):
    for r in dedup.jaccard_pairs(documents, 0.5).collect():
        assert 0.5 <= r["jaccard"] <= 1.0
        assert r["n_inter"] <= r["n_union"]


def test_simhash_blocks_near_dups(spark, documents):
    """Planted near-dup pairs have near-identical token multisets, so their
    16-bit simhash fingerprints are within small Hamming distance."""
    pairs = dedup.jaccard_pairs(documents, 0.9).collect()
    assert pairs
    sim = {r["doc_id"]: r["simhash"] for r in
           dedup.simhash(documents, 16).collect()}
    for r in pairs:
        x = sim[r["id1"]] ^ sim[r["id2"]]
        assert bin(x).count("1") <= 4, (
            f"pair ({r['id1']},{r['id2']}) J={r['jaccard']} hamming too large"
        )


def test_simhash_pairs_pigeonhole(spark):
    # diverse tf profile (no symmetric zero-sum lanes) + one small edit
    base = " ".join(w for i, w in enumerate(
        ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    ) for _ in range(20 - 2 * i))
    rows = [
        (0, base),
        (1, base + " iota"),
        (2, "one two three four five six seven eight " * 10),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sim = {r["doc_id"]: r["simhash"] for r in dedup.simhash(d, 16).collect()}
    h01 = bin(sim[0] ^ sim[1]).count("1")
    assert h01 <= 3, f"perturbed pair drifted too far: hamming {h01}"
    got = {(r["id1"], r["id2"]): r["hamming"]
           for r in dedup.simhash_pairs(d, max_hamming=3).collect()}
    assert got.get((0, 1)) == h01
    assert (0, 2) not in got and (1, 2) not in got


def test_lsh_bucket_cap_drops_oversized(spark):
    # every doc identical -> one bucket of size 6 > max_bucket=5 -> dropped
    rows = [(i, "same same same tokens here every time") for i in range(6)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(d, 8, hash_fn="xxhash64")
    pairs = dedup.lsh_candidate_pairs(sigs, 8, 2, max_bucket=5).collect()
    assert pairs == []
    stats = dedup.lsh_bucket_stats(sigs, 8, 2, max_bucket=5).collect()
    assert all(r["oversized"] == 1 for r in stats)
    assert all(r["max_bucket_size"] == 6 for r in stats)


def test_minhash_variants_agree_on_pairs(spark, documents):
    """md5-string and xxhash64 MinHash are different hash families but both
    must recover the same high-J pairs after exact verification."""
    a = {(r["id1"], r["id2"]) for r in dedup.near_dup_pairs(
        documents, 0.8, 8, 2, hash_fn="md5").collect()}
    b = {(r["id1"], r["id2"]) for r in dedup.near_dup_pairs(
        documents, 0.8, 8, 2, hash_fn="xxhash64").collect()}
    assert a == b and a


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = dedup.connected_components(pairs).toPandas()
    return dict(zip(got["id"], got["component"]))


def test_connected_components_chain_star_merge(spark):
    # long chain (exercises pointer jumping past one-hop propagation),
    # a star, a merged pair of chains, and an isolated edge
    chain = [(i, i + 1) for i in range(10, 20)]           # 10..20
    star = [(100, x) for x in (101, 102, 103, 104)]       # 100..104
    merge = [(200, 201), (202, 203), (201, 202)]          # 200..203
    iso = [(300, 301)]
    comp = _cc(spark, chain + star + merge + iso)
    assert all(comp[i] == 10 for i in range(10, 21))
    assert all(comp[i] == 100 for i in range(100, 105))
    assert all(comp[i] == 200 for i in range(200, 204))
    assert comp[300] == comp[301] == 300
    # reversed/duplicated edges change nothing
    comp2 = _cc(spark, [(b, a) for a, b in chain] + chain + star + merge + iso)
    assert comp2 == comp


def test_connected_components_converges_fast(spark, monkeypatch):
    """Pointer jumping must close a 16-node chain in O(log d) rounds —
    cap max_iter at 6 and require the exact answer."""
    edges = [(i, i + 1) for i in range(16)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = dedup.connected_components(pairs, max_iter=6).toPandas()
    assert set(got["component"]) == {0}


def test_near_dup_components_end_to_end(spark, documents):
    out = dedup.near_dup_components(documents, threshold=0.5).toPandas()
    assert len(out) == documents.count()
    by_id = dict(zip(out["doc_id"], out["component"]))
    # component labels are members' min id, and canonical flags agree
    import collections
    members = collections.defaultdict(list)
    for i, c in by_id.items():
        members[c].append(i)
    for c, ms in members.items():
        assert c == min(ms)
    canon = dict(zip(out["doc_id"], out["is_canonical"]))
    assert all(canon[i] == (by_id[i] == i) for i in by_id)
    # clustering must be consistent with the pair set's transitive closure
    pairs = dedup.near_dup_pairs(documents, 0.5).select("id1", "id2").collect()
    for r in pairs:
        assert by_id[r["id1"]] == by_id[r["id2"]]


# ------------------------------------------------ paragraph-level dedup

def test_split_paragraphs_preserves_original_index(spark):
    df = spark.createDataFrame(
        [(1, "aa bb\n\n\n\ncc dd\n\n\n\nee"), (2, "")],
        "doc_id long, text string")
    got = dedup.split_paragraphs(df).orderBy("doc_id", "par_idx").collect()
    assert [(r["doc_id"], r["par_idx"], r["paragraph"]) for r in got] == [
        (1, 0, "aa bb"), (1, 1, "cc dd"), (1, 2, "ee")]


def test_chunk_paragraphs_fixed_windows(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "")],
        "doc_id long, text string")
    got = dedup.chunk_paragraphs(df, chunk=3).orderBy(
        "doc_id", "par_idx").collect()
    assert [(r["doc_id"], r["par_idx"], r["paragraph"]) for r in got] == [
        (1, 0, "a b c"), (1, 1, "d e f"), (1, 2, "g"), (2, 0, "x y")]


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
def test_dedup_paragraphs_first_occurrence(spark, hash_fn):
    """Global first-occurrence wins under (doc_id, par_idx) order —
    brute-forced in pandas over the same exploded frame."""
    rows = [(1, "dup par\n\n\n\nunique one\n\n\n\ndup par"),
            (2, "dup par\n\n\n\nanother text"),
            (3, "another text\n\n\n\nlast bit")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pars = dedup.split_paragraphs(df)
    got = (dedup.dedup_paragraphs(pars, hash_fn=hash_fn)
           .orderBy("doc_id", "par_idx").toPandas())
    pdf = pars.toPandas().sort_values(["doc_id", "par_idx"])
    seen, keep = set(), []
    for _, r in pdf.iterrows():
        if r["paragraph"] not in seen:
            seen.add(r["paragraph"])
            keep.append((r["doc_id"], r["par_idx"], r["paragraph"]))
    assert list(map(tuple, got[["doc_id", "par_idx", "paragraph"]]
                    .itertuples(index=False))) == keep
    # the duplicate mass is gone: every surviving paragraph is unique
    assert got["paragraph"].is_unique


def test_decontaminate_overlap(spark):
    from maestro_spark.operators.curation import decontaminate
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h extra words here"),   # contains eval 8-gram
         (2, "totally different content with no overlap at all okay")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "a b c d e f g h")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bad"], r["contaminated"])
           for r in decontaminate(corpus, ev, n=8).collect()}
    assert got[1][0] >= 1 and got[1][1] is True
    assert got[2] == (0, False)


# ------------------------------------------- exact substring dedup

def _brute_substring_stats(texts: dict[int, str], n: int,
                           min_count: int = 2) -> dict[int, tuple]:
    """Python oracle for substring_dup_stats: count every window
    occurrence corpus-wide, union dup-window intervals per doc."""
    import re as _re
    toks = {d: _re.findall(r"[a-z0-9]+", t.lower()) for d, t in texts.items()}
    occ: dict[tuple, int] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            g = tuple(ts[i:i + n])
            occ[g] = occ.get(g, 0) + 1
    out = {}
    for d, ts in toks.items():
        starts = [i for i in range(len(ts) - n + 1)
                  if occ[tuple(ts[i:i + n])] >= min_count]
        covered = set()
        for s in starts:
            covered.update(range(s, s + n))
        frac = round(len(covered) / max(len(ts), 1), 6)
        out[d] = (len(ts), len(starts), len(covered), frac)
    return out


@pytest.mark.parametrize("hash_fn", ["xxhash64", "text", "md5"])
def test_substring_dup_stats_planted(spark, hash_fn):
    # doc 0/1 share an 8-token run; doc 2 repeats its own run twice;
    # doc 3 is clean; doc 4 is shorter than the window
    run = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (0, f"intro {run} outro zero"),
        (1, f"{run} tail one two"),
        (2, f"{run} mid {run}"),
        (3, "nothing shared here at all in this document body text"),
        (4, "too short"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.substring_dup_stats(d, n=8, hash_fn=hash_fn).collect()}
    want = _brute_substring_stats(dict((i, t) for i, t in rows), 8)
    assert set(got) == set(want)
    for doc, (ntok, nwin, ncov, frac) in want.items():
        r = got[doc]
        assert r["n_tokens"] == ntok, doc
        assert r["dup_windows"] == nwin, doc
        assert r["dup_tokens"] == ncov, doc
        assert r["dup_fraction"] == pytest.approx(frac, abs=1e-9), doc
    # the planted run IS duplicated: docs 0-2 covered, 3-4 zero
    assert got[0]["dup_tokens"] == 8 and got[3]["dup_tokens"] == 0
    assert got[4]["dup_windows"] == 0


def test_substring_dup_overlap_union(spark):
    """Overlapping dup windows union, not sum: a 9-token shared run has
    two overlapping 8-windows but only 9 covered tokens."""
    run = "a1 b2 c3 d4 e5 f6 g7 h8 i9"
    d = spark.createDataFrame(
        [(0, f"{run} xxx"), (1, f"yyy {run}")],
        "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in dedup.substring_dup_stats(d, n=8).collect()}
    assert got[0]["dup_windows"] == 2
    assert got[0]["dup_tokens"] == 9
    assert got[1]["dup_tokens"] == 9


def test_substring_dup_corpus_matches_brute(spark, documents):
    """Full corpus (sf0.001) vs the Python oracle, production hash."""
    texts = {r["doc_id"]: r["text"]
             for r in documents.select("doc_id", "text").collect()}
    want = _brute_substring_stats(texts, 8)
    got = {r["doc_id"]: r for r in
           dedup.substring_dup_stats(documents, n=8).collect()}
    assert set(got) == set(want)
    mism = [d for d in want
            if (got[d]["n_tokens"], got[d]["dup_windows"],
                got[d]["dup_tokens"]) != want[d][:3]]
    assert not mism, mism[:5]
    assert any(v[1] > 0 for v in want.values()), "corpus has no dups?"


@pytest.mark.parametrize("hash_fn", ["xxhash64", "text"])
def test_substring_dedup_clean_planted(spark, hash_fn):
    """ExactSubstr excision keeps the FIRST occurrence of a duplicated
    run (in (doc, start) order) and excises every later one."""
    run = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (0, f"intro {run} outro zero"),
        (1, f"{run} tail one two"),
        (2, f"{run} mid {run}"),
        (3, "nothing shared here at all in this document body text"),
        (4, "too short"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.substring_dedup_clean(d, n=8, hash_fn=hash_fn).collect()}
    # doc 0 is the first occurrence: everything survives
    assert got[0]["kept_tokens"] == got[0]["n_tokens"]
    assert got[0]["clean_text"] == f"intro {run} outro zero"
    # doc 1's copy is later: the 8-token run is excised
    assert got[1]["clean_text"] == "tail one two"
    assert got[1]["kept_tokens"] == 3
    # doc 2: both of its copies are later than doc 0's -> only 'mid'
    assert got[2]["clean_text"] == "mid"
    # clean docs untouched
    assert got[3]["clean_text"] == rows[3][1]
    assert got[4]["clean_text"] == "too short"


def test_substring_dedup_clean_fully_excised(spark):
    """A doc that is exactly one later duplicated window keeps nothing."""
    run = "a1 b2 c3 d4 e5 f6 g7 h8"
    d = spark.createDataFrame([(0, f"{run} x"), (1, run)],
                              "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in dedup.substring_dedup_clean(d, n=8).collect()}
    assert got[1]["kept_tokens"] == 0 and got[1]["clean_text"] == ""
    assert got[0]["kept_tokens"] == 9


# ------------------------------------------------------------- winnowing


def _winnow_brute(text, k, w):
    import hashlib
    import re
    ts = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    m = len(ts) - (k - 1)
    if m < 1:
        return set()
    grams = [int(hashlib.md5(
        " ".join(ts[i:i + k]).encode()).hexdigest()[:12], 16)
        for i in range(m)]
    sel = set()
    for j in range(max(m - (w - 1), 1)):
        win = grams[j:j + w]
        mn = min(win)
        # rightmost minimum (the MOSS tie rule)
        pos = j + max(i for i, g in enumerate(win) if g == mn)
        sel.add((pos + 1, mn))      # 1-based
    return sel


@pytest.mark.parametrize("k,w", [(5, 4), (3, 2), (4, 8)])
def test_winnow_matches_bruteforce(spark, documents, k, w):
    got = dedup.winnow_fingerprints(documents, k=k, w=w).toPandas()
    ref = documents.select("doc_id", "text").toPandas()
    want = {(int(r.doc_id), p, f) for r in ref.itertuples()
            for p, f in _winnow_brute(r.text, k, w)}
    assert {(int(r.doc_id), int(r.pos), int(r.fp))
            for r in got.itertuples()} == want


def test_winnow_detects_shared_substring(spark):
    """The paper's guarantee: a shared run of >= w + k - 1 tokens yields
    a shared fingerprint; unrelated docs share nothing."""
    run = " ".join(f"tok{i}" for i in range(8))      # 8 >= 4 + 5 - 1
    rows = [(0, "alpha beta " + run + " gamma delta"),
            (1, run + " epsilon zeta eta theta iota"),
            (2, "totally different words here entirely unrelated stuff")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    fp = dedup.winnow_fingerprints(d, k=5, w=4).toPandas()
    by = {i: set(fp[fp["doc_id"] == i]["fp"]) for i in (0, 1, 2)}
    assert by[0] & by[1]
    assert not (by[0] & by[2]) and not (by[1] & by[2])


def test_winnow_short_docs(spark):
    d = spark.createDataFrame(
        [(0, "a b c"),              # 3 toks < k=5: no grams, absent
         (1, "a b c d e f")],       # 2 grams < w=4: one window, 1 fp
        "doc_id long, text string")
    fp = dedup.winnow_fingerprints(d, k=5, w=4).toPandas()
    assert set(fp["doc_id"]) == {1}
    assert len(fp) == 1


def test_winnow_is_shuffle_free(spark, documents):
    plan = (dedup.winnow_fingerprints(documents)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
