"""Phrase-query tests: positional index build → exact-phrase top-k,
rank-identical (ids + bit-identical float64 scores) vs a pandas
brute-force oracle that shares only the math functions."""

import re

import numpy as np
import pandas as pd
import pytest

from maestro_spark.functions import bm25
from maestro_spark.functions.tokenize import (
    IDENT_RE,
    SUBTOKEN_RE,
    code_tokens,
    phrase_terms,
)
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs, synth_docs_pandas

N_DOCS = 300
CFG = IndexConfig(shard_size=120, n_buckets=8, n_salts=4,
                  hot_df_fraction=0.05, sample_fraction=1.0,
                  store_positions=True)

PHRASES = [
    "get user",              # common subtoken bigram
    "userRequestCount",      # compound in vocab → 3-term subtoken phrase
    "token worker merge",    # trigram (matches tokenWorkerMerge idents)
    "return return",         # repeated hot token
    "zzz qqq",               # no match
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("phraseidx"))
    build_index(spark, synth_docs(spark, N_DOCS, seed=42, partitions=5), out, CFG)
    return out


@pytest.fixture(scope="module")
def corpus():
    pdf = synth_docs_pandas(N_DOCS, seed=42)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pdf["doc_id"] = np.arange(len(pdf), dtype=np.int64)
    return pdf


def _subtoken_stream(text: str) -> list[str]:
    out = []
    for ident in re.findall(IDENT_RE, text):
        out.extend(t.lower() for t in re.findall(SUBTOKEN_RE, ident))
    return out


def brute_phrase(corpus: pd.DataFrame, phrase: str, k: int = 10) -> pd.DataFrame:
    seq = phrase_terms(phrase, "code")
    rows = []
    for _, r in corpus.iterrows():
        stream = _subtoken_stream(r["content"])
        tf = sum(
            1 for i in range(len(stream) - len(seq) + 1)
            if stream[i : i + len(seq)] == seq
        )
        if tf:
            dl = len(code_tokens(pd.Series([r["content"]])).iat[0])
            rows.append((r["doc_id"], tf, dl))
    if not rows:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    m = pd.DataFrame(rows, columns=["doc_id", "tf", "dl"])
    n_docs = len(corpus)
    # content avgdl exactly as the manifest computes it: exact int total
    # over docs, ONE float division (np.mean's pairwise sum could differ
    # in the last ulp)
    total_dl = sum(len(code_tokens(pd.Series([c])).iat[0])
                   for c in corpus["content"])
    avgdl = float(total_dl) / n_docs
    idf = float(bm25.idf(len(m), n_docs))
    m["score"] = idf * (
        m["tf"].to_numpy(np.float64)
        / (m["tf"].to_numpy(np.float64)
           + bm25.K1 * (1.0 - bm25.B + bm25.B * m["dl"].to_numpy(np.float64) / avgdl))
    )
    return (m.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k)[["doc_id", "score"]].reset_index(drop=True))


@pytest.mark.parametrize("phrase", [p for p in PHRASES if len(phrase_terms(p, "code")) > 1])
def test_phrase_rank_identical(spark, built, corpus, phrase):
    reader = IndexReader(spark, built)
    got = reader.phrase_search(phrase, k=10).toPandas()
    want = brute_phrase(corpus, phrase, k=10)
    if phrase not in ("zzz qqq",):
        assert len(want) > 0, f"vacuous: oracle empty for {phrase!r}"
    assert got["doc_id"].tolist() == want["doc_id"].tolist(), (
        f"{phrase!r}:\n{got}\nvs\n{want}")
    np.testing.assert_array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def brute_span_near(corpus: pd.DataFrame, phrase: str, slop: int,
                    k: int = 10) -> pd.DataFrame:
    """In-order span_near oracle: tf = count of start positions p0 of
    seq[0] with a strictly-increasing completion whose span ≤ n−1+slop.
    Exhaustive DP per start (not greedy) — independent of the engine's
    greedy shortcut."""
    seq = phrase_terms(phrase, "code")
    n = len(seq)
    rows = []
    for _, r in corpus.iterrows():
        stream = _subtoken_stream(r["content"])
        tf = 0
        for p0, tok in enumerate(stream):
            if tok != seq[0]:
                continue
            # frontier of reachable positions after matching prefix i
            frontier = [p0]
            for t in seq[1:]:
                frontier = [j for p in frontier
                            for j in range(p + 1, min(len(stream),
                                                      p0 + n + slop))
                            if stream[j] == t and j > p]
                if not frontier:
                    break
            if frontier and min(frontier) - p0 <= n - 1 + slop:
                tf += 1
        if tf:
            dl = len(code_tokens(pd.Series([r["content"]])).iat[0])
            rows.append((r["doc_id"], tf, dl))
    if not rows:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    m = pd.DataFrame(rows, columns=["doc_id", "tf", "dl"])
    n_docs = len(corpus)
    total_dl = sum(len(code_tokens(pd.Series([c])).iat[0])
                   for c in corpus["content"])
    avgdl = float(total_dl) / n_docs
    idf = float(bm25.idf(len(m), n_docs))
    m["score"] = idf * (
        m["tf"].to_numpy(np.float64)
        / (m["tf"].to_numpy(np.float64)
           + bm25.K1 * (1.0 - bm25.B + bm25.B * m["dl"].to_numpy(np.float64) / avgdl))
    )
    return (m.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k)[["doc_id", "score"]].reset_index(drop=True))


@pytest.mark.parametrize("phrase,slop", [
    ("get user", 2),           # relaxed bigram — superset of exact
    ("token merge", 3),        # skips the middle of tokenWorkerMerge
    ("user count", 1),         # userRequestCount: exactly one gap
    ("return return", 2),      # repeated token, overlapping starts
])
def test_span_near_rank_identical(spark, built, corpus, phrase, slop):
    reader = IndexReader(spark, built)
    got = reader.phrase_search(phrase, k=10, slop=slop).toPandas()
    want = brute_span_near(corpus, phrase, slop, k=10)
    assert len(want) > 0, f"vacuous: oracle empty for {phrase!r}~{slop}"
    assert got["doc_id"].tolist() == want["doc_id"].tolist(), (
        f"{phrase!r}~{slop}:\n{got}\nvs\n{want}")
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())
    # serving path agrees bit-identically
    loc = reader.phrase_search_local(phrase, k=10, slop=slop)
    assert loc["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(loc["score"].to_numpy(),
                                  want["score"].to_numpy())


def test_span_near_superset_of_exact(spark, built):
    """slop=0 via the slop path ≡ exact phrase; slop>0 only adds docs."""
    reader = IndexReader(spark, built)
    exact = set(reader.phrase_search("get user", k=300).toPandas()["doc_id"])
    slopped = set(reader.phrase_search("get user", k=300, slop=2)
                  .toPandas()["doc_id"])
    assert exact <= slopped


def _position_slots(text: str) -> list[set]:
    """Positional token model of the code analyzer: one slot per subtoken
    in textual order; a compound identifier's whole lowered form joins its
    FIRST subtoken's slot (doc_terms position semantics)."""
    slots: list[set] = []
    for ident in re.findall(IDENT_RE, text):
        subs = [t.lower() for t in re.findall(SUBTOKEN_RE, ident)]
        start = len(slots)
        slots.extend({s} for s in subs)
        if len(subs) > 1:
            slots[start].add(ident.lower())
    return slots


def _span_tf(slots: list[set], preds, slop: int) -> int:
    """Exhaustive (any-chain) span tf over position slots: #start
    positions p0 with preds[0] matching a token in slot p0 and an
    in-order completion within total span ≤ len(preds)−1+slop.
    Independent of the engine's greedy shortcut; position-level (a slot
    matching via several tokens counts once — ES MultiPhrase)."""
    n = len(preds)
    tf = 0
    hit = [[any(pr(t) for t in s) for s in slots] for pr in preds]
    for p0 in range(len(slots)):
        if not hit[0][p0]:
            continue
        frontier = [p0]
        for hi in hit[1:]:
            frontier = [j for p in frontier
                        for j in range(p + 1, min(len(slots), p0 + n + slop))
                        if hi[j] and j > p]
            if not frontier:
                break
        if frontier and min(frontier) - p0 <= n - 1 + slop:
            tf += 1
    return tf


def brute_phrase_prefix(corpus: pd.DataFrame, phrase: str, k: int = 10,
                        slop: int = 0) -> pd.DataFrame:
    """match_phrase_prefix oracle: last token is a prefix predicate
    (uncapped — pair with a large max_expansions on the engine side)."""
    seq_full = phrase_terms(phrase, "code")
    seq, pfx = seq_full[:-1], seq_full[-1]
    preds = [(lambda want: lambda t: t == want)(w) for w in seq]
    preds.append(lambda t: t.startswith(pfx))
    rows = []
    for _, r in corpus.iterrows():
        slots = _position_slots(r["content"])
        tf = _span_tf(slots, preds, slop)
        if tf:
            dl = len(code_tokens(pd.Series([r["content"]])).iat[0])
            rows.append((r["doc_id"], tf, dl))
    if not rows:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    m = pd.DataFrame(rows, columns=["doc_id", "tf", "dl"])
    n_docs = len(corpus)
    total_dl = sum(len(code_tokens(pd.Series([c])).iat[0])
                   for c in corpus["content"])
    avgdl = float(total_dl) / n_docs
    idf = float(bm25.idf(len(m), n_docs))
    m["score"] = idf * (
        m["tf"].to_numpy(np.float64)
        / (m["tf"].to_numpy(np.float64)
           + bm25.K1 * (1.0 - bm25.B + bm25.B * m["dl"].to_numpy(np.float64) / avgdl))
    )
    return (m.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k)[["doc_id", "score"]].reset_index(drop=True))


@pytest.mark.parametrize("phrase,slop", [
    ("get us", 0),       # bigram, prefix expands user/util/...
    ("token work", 0),   # worker/workers compounds
    ("user re", 2),      # sloppy prefix (request/reader/record...)
    ("hand", 0),         # single prefix token (handler...)
    ("get userre", 0),   # prefix SPANNING a subtoken boundary: only the
                         # whole-ident form (userrequest…@first-sub
                         # position) can match — the ES synonym-position
                         # behavior the tail-position scheme couldn't give
])
def test_phrase_prefix_rank_identical(spark, built, corpus, phrase, slop):
    reader = IndexReader(spark, built)
    want = brute_phrase_prefix(corpus, phrase, k=10, slop=slop)
    assert len(want) > 0, f"vacuous: oracle empty for {phrase!r}*"
    got = reader.phrase_search(phrase, k=10, slop=slop, prefix_last=True,
                               max_expansions=10 ** 6).toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist(), (
        f"{phrase!r}*~{slop}:\n{got}\nvs\n{want}")
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())
    loc = reader.phrase_search_local(phrase, k=10, slop=slop,
                                     prefix_last=True,
                                     max_expansions=10 ** 6)
    assert loc["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(loc["score"].to_numpy(),
                                  want["score"].to_numpy())


def test_phrase_prefix_expansion_cap_deterministic(spark, built):
    reader = IndexReader(spark, built)
    full = reader._prefix_alts("us", 10 ** 6)
    assert full == sorted(full)
    assert reader._prefix_alts("us", 2) == full[:2]
    # a complete term is its own expansion
    assert "user" in full


def test_phrase_prefix_complete_term_superset(spark, built):
    """'get user' as prefix query matches at least the exact-phrase set
    (user itself is in the expansion of 'user')."""
    reader = IndexReader(spark, built)
    exact = set(reader.phrase_search_local("get user", k=300)["doc_id"])
    pfx = set(reader.phrase_search_local("get user", k=300, prefix_last=True,
                                         max_expansions=10 ** 6)["doc_id"])
    assert exact <= pfx


def test_single_term_phrase_delegates(spark, built):
    reader = IndexReader(spark, built)
    a = reader.phrase_search("getUserName", k=5).toPandas()
    # the compound splits to get,user,name — a 3-term phrase; whereas a
    # one-subtoken phrase delegates to plain term search
    b = reader.search_pandas("merge", k=5)
    c = reader.phrase_search("merge", k=5).toPandas()
    assert b["doc_id"].tolist() == c["doc_id"].tolist()
    assert isinstance(a, pd.DataFrame)


def test_compound_identifier_matches_phrase(spark, built, corpus):
    """Docs containing userRequestCount as ONE identifier must match the
    phrase 'user request count' (subtoken adjacency — the code-search
    killer feature)."""
    reader = IndexReader(spark, built)
    got = set(reader.phrase_search("user request count", k=300).toPandas()["doc_id"])
    has_compound = {
        int(r["doc_id"]) for _, r in corpus.iterrows()
        if "userRequestCount" in r["content"]
    }
    assert has_compound, "corpus should contain userRequestCount occurrences"
    assert has_compound <= got

def test_rescore_stream_matches_posting_phrase_membership(spark, built, corpus):
    """The rescore pass's span tf (subtoken_streams + _phrase_tf_tokens,
    slop=0) must agree doc-by-doc with the posting-side positional engine
    (phrase_search over index positions) — the compound-identifier
    boundary case code_tokens-based streams get wrong."""
    from maestro_spark.functions.tokenize import subtoken_streams
    from maestro_spark.operators.search import _phrase_tf_tokens

    reader = IndexReader(spark, built)
    for phrase in ("user request", "token worker merge", "get user"):
        seq = phrase_terms(phrase, "code")
        posting_docs = set(
            reader.phrase_search(phrase, k=N_DOCS).toPandas()["doc_id"]
            .astype(int))
        streams = subtoken_streams(corpus["content"])
        for doc_id, strm in zip(corpus["doc_id"], streams):
            tf = _phrase_tf_tokens(list(strm), seq, 0)
            assert (tf > 0) == (int(doc_id) in posting_docs), (phrase, doc_id)


def test_reader_refuses_stale_positions_semantics(spark, built, tmp_path):
    """ADVICE r2 #4: a positional index whose manifest predates the
    current prox-stream semantics must be REFUSED by the reader (wrong
    phrase answers otherwise), resumed builds must rebuild rather than
    skip-match old shards, and incremental must raise."""
    import json
    import shutil

    from maestro_spark.operators.build import POSITIONS_SEMANTICS
    from maestro_spark.operators.incremental import incremental_update

    assert POSITIONS_SEMANTICS >= 2
    man_path = f"{built}/manifest.json"
    fresh = json.load(open(man_path))
    assert fresh["positions_semantics"] == POSITIONS_SEMANTICS
    assert fresh["version"] >= 2

    old = str(tmp_path / "oldidx")
    shutil.copytree(built, old)
    stale = dict(fresh)
    del stale["positions_semantics"]   # pre-stamp manifest (v1 semantics)
    stale["version"] = 1
    json.dump(stale, open(f"{old}/manifest.json", "w"))

    with pytest.raises(ValueError, match="positions_semantics"):
        IndexReader(spark, old)

    up = synth_docs(spark, 3, seed=9, partitions=1)
    with pytest.raises(ValueError, match="positions semantics"):
        incremental_update(spark, old, up, None, CFG)

    # resume over the stale index: identical input fingerprints would
    # normally skip-match every shard, but stale semantics force a real
    # rebuild (postings rewritten); the result is stamped current and
    # readable again
    import glob
    import os

    from maestro_spark.operators.build import build_index as bi
    before = {f: os.path.getmtime(f)
              for f in glob.glob(f"{old}/postings/**/*.parquet",
                                 recursive=True)}
    m = bi(spark, synth_docs(spark, N_DOCS, seed=42, partitions=5), old,
           CFG, resume=True)
    assert m["positions_semantics"] == POSITIONS_SEMANTICS
    assert all(e["status"] == "ok" for e in m["shards"].values())
    after = {f: os.path.getmtime(f)
             for f in glob.glob(f"{old}/postings/**/*.parquet",
                                recursive=True)}
    assert after != before, "stale-semantics shards were skip-matched"
    r = IndexReader(spark, old)
    assert len(r.phrase_search("get user", k=5).collect()) > 0

    # a NON-positional legacy index (no prox stream) is still readable:
    # nothing to misread
    flat = str(tmp_path / "flatidx")
    cfg_flat = IndexConfig(shard_size=120, n_buckets=8, n_salts=4,
                           hot_df_fraction=0.05, sample_fraction=1.0)
    bi(spark, synth_docs(spark, 50, seed=1, partitions=2), flat, cfg_flat)
    man2 = json.load(open(f"{flat}/manifest.json"))
    man2.pop("positions_semantics", None)
    man2["version"] = 1
    json.dump(man2, open(f"{flat}/manifest.json", "w"))
    assert IndexReader(spark, flat).search_pandas("def", k=3) is not None


def test_phrase_engine_routing_identical(spark, built):
    reader = IndexReader(spark, built)
    """phrase_search(engine=...) mirrors search()'s routing: local and
    auto return bit-identical results to the Spark path (same scorer),
    and auto under a zero budget distributes (still identical)."""
    want = reader.phrase_search("get user", k=10).toPandas()
    loc = reader.phrase_search("get user", k=10, engine="local").toPandas()
    assert want["doc_id"].tolist() == loc["doc_id"].tolist()
    np.testing.assert_array_equal(want["score"].to_numpy(),
                                  loc["score"].to_numpy())
    auto = reader.phrase_search("get user", k=10, engine="auto").toPandas()
    assert want["doc_id"].tolist() == auto["doc_id"].tolist()
    old = reader.LOCAL_DF_BUDGET
    try:
        reader.LOCAL_DF_BUDGET = 0  # force the distributed branch
        dist = reader.phrase_search("get user", k=10,
                                    engine="auto").toPandas()
    finally:
        reader.LOCAL_DF_BUDGET = old
    assert want["doc_id"].tolist() == dist["doc_id"].tolist()
    np.testing.assert_array_equal(want["score"].to_numpy(),
                                  dist["score"].to_numpy())


def brute_span_first(corpus: pd.DataFrame, phrase: str, first_n: int,
                     k: int = 10) -> pd.DataFrame:
    """brute_phrase restricted to spans ENDING within the first first_n
    slots (0-indexed end = start + len(seq), Lucene SpanFirst contract)."""
    seq = phrase_terms(phrase, "code")
    rows = []
    for _, r in corpus.iterrows():
        stream = _subtoken_stream(r["content"])
        tf = sum(
            1 for i in range(len(stream) - len(seq) + 1)
            if stream[i: i + len(seq)] == seq and i + len(seq) <= first_n
        )
        if tf:
            dl = len(code_tokens(pd.Series([r["content"]])).iat[0])
            rows.append((r["doc_id"], tf, dl))
    if not rows:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    m = pd.DataFrame(rows, columns=["doc_id", "tf", "dl"])
    n_docs = len(corpus)
    total_dl = sum(len(code_tokens(pd.Series([c])).iat[0])
                   for c in corpus["content"])
    avgdl = float(total_dl) / n_docs
    idf = float(bm25.idf(len(m), n_docs))
    m["score"] = idf * (
        m["tf"].to_numpy(np.float64)
        / (m["tf"].to_numpy(np.float64)
           + bm25.K1 * (1.0 - bm25.B + bm25.B
                        * m["dl"].to_numpy(np.float64) / avgdl)))
    return (m.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k)[["doc_id", "score"]].reset_index(drop=True))


@pytest.mark.parametrize("phrase,first_n", [
    ("get user", 6), ("get user", 20), ("token worker merge", 12),
    ("userRequestCount", 10), ("return return", 8)])
def test_span_first_rank_identical(spark, built, corpus, phrase, first_n):
    reader = IndexReader(spark, built)
    want = brute_span_first(corpus, phrase, first_n, k=10)
    got_local = reader.phrase_search_local(phrase, k=10, first_n=first_n)
    pd.testing.assert_frame_equal(
        got_local.reset_index(drop=True), want, check_exact=True)
    got_spark = reader.phrase_search(phrase, k=10, first_n=first_n) \
        .toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got_spark, want, check_exact=True)


def test_span_first_actually_restricts(spark, built, corpus):
    """The first_n bound must bite: for a common bigram some doc matches
    the phrase only past the window, so the restricted doc set is a
    PROPER subset of the unrestricted one."""
    reader = IndexReader(spark, built)
    # derive a window that is non-degenerate by construction: the median
    # first-occurrence END of the phrase across matching docs
    ends = []
    for _, r in corpus.iterrows():
        st = _subtoken_stream(r["content"])
        for i in range(len(st) - 1):
            if st[i: i + 2] == ["get", "user"]:
                ends.append(i + 2)
                break
    assert len(ends) >= 3
    n = sorted(ends)[len(ends) // 2]
    full = set(reader.phrase_search_local("get user", k=10_000)["doc_id"])
    first = set(reader.phrase_search_local("get user", k=10_000,
                                           first_n=n)["doc_id"])
    assert first < full
    assert first  # and non-empty — the window is not degenerate


def test_span_first_single_term(spark, built, corpus):
    """A 1-term phrase with first_n goes through the positional path
    (no delegation to plain search): doc must contain the term in the
    first N slots."""
    reader = IndexReader(spark, built)
    got = reader.phrase_search_local("return", k=10_000, first_n=3)
    want = {int(r["doc_id"]) for _, r in corpus.iterrows()
            if "return" in _subtoken_stream(r["content"])[:3]}
    assert set(got["doc_id"]) == want


# ---------------------------------------------------------------- span_near
# unordered (in_order=false): minimal-window tf vs a naive enumerator

def _naive_min_windows(plists, cap):
    """Independent minimal-window enumeration: for every merged start,
    take the FIRST right end that covers all lists; the window counts
    when its leftmost element is required and the width fits."""
    merged = sorted((int(p), i) for i, ps in enumerate(plists)
                    for p in ps)
    n = len(plists)
    wins = 0
    for a in range(len(merged)):
        seen = {}
        for b in range(a, len(merged)):
            seen[merged[b][1]] = seen.get(merged[b][1], 0) + 1
            if len(seen) == n:
                if seen[merged[a][1]] == 1 \
                        and merged[b][0] - merged[a][0] <= cap:
                    wins += 1
                break
    return wins


def test_count_min_windows_unit():
    from maestro_spark.operators.search import _count_min_windows
    A = np.array([1, 2]); B = np.array([5])
    assert _count_min_windows([A, B], 4) == 1      # only [2,5]
    assert _count_min_windows([A, B], 2) == 0
    assert _count_min_windows([np.array([5]), np.array([1, 9])], 4) == 2
    three = [np.array([0, 10]), np.array([2]), np.array([4, 11])]
    # minimal windows covering all three: [0..4] (w=4), [2..10]? not
    # minimal at right-first enumeration -> [2,4,10]? naive agrees:
    assert _count_min_windows(three, 20) == _naive_min_windows(three, 20)
    assert _count_min_windows(three, 4) == _naive_min_windows(three, 4)


@pytest.mark.parametrize("phrase,slop", [
    ("merge worker", 2),
    ("user token", 0),
    ("get user request", 3),
])
def test_span_near_unordered_vs_brute(spark, built, corpus, phrase, slop):
    reader = IndexReader(spark, built)
    got = reader.span_near_local(phrase, k=N_DOCS, slop=slop,
                                 in_order=False)
    terms = sorted(set(phrase_terms(phrase, "code")))
    cap = len(terms) - 1 + slop
    st = reader.stats["fields"]["content"]
    want = {}
    for _, row in corpus.iterrows():
        stream = _subtoken_stream(row["content"])
        plists = [np.array([i for i, t in enumerate(stream) if t == q],
                           dtype=np.int64) for q in terms]
        if any(p.size == 0 for p in plists):
            continue
        tf = _naive_min_windows(plists, cap)
        if tf:
            want[int(row["doc_id"])] = (
                tf, float(len(code_tokens(
                    pd.Series([row["content"]])).iat[0])))
    gm = dict(zip(got["doc_id"], got["score"]))
    assert set(gm) == set(want)
    dfm = len(want)
    for d, (tf, dl) in want.items():
        exp = float(bm25.idf(dfm, st["n_docs"])) * (
            tf / (tf + bm25.K1 * (1 - bm25.B + bm25.B * dl / st["avgdl"])))
        assert gm[d] == pytest.approx(exp, rel=1e-12)


def test_span_near_unordered_superset_of_ordered(spark, built):
    reader = IndexReader(spark, built)
    ordered = reader.span_near_local("get user", k=N_DOCS, slop=2,
                                     in_order=True)
    unordered = reader.span_near_local("get user", k=N_DOCS, slop=2,
                                       in_order=False)
    assert set(ordered["doc_id"]) <= set(unordered["doc_id"])


def _exact_starts_brute(stream, seq):
    return [i for i in range(len(stream) - len(seq) + 1)
            if stream[i:i + len(seq)] == seq]


@pytest.mark.parametrize("pre,post", [(0, 0), (1, 2)])
def test_span_not_vs_brute(spark, built, corpus, pre, post):
    reader = IndexReader(spark, built)
    inc, exc = "get user", "return"
    got = reader.span_not_local(inc, exc, pre=pre, post=post, k=N_DOCS)
    iseq = phrase_terms(inc, "code")
    eseq = phrase_terms(exc, "code")
    st = reader.stats["fields"]["content"]
    want = {}
    for _, row in corpus.iterrows():
        stream = _subtoken_stream(row["content"])
        starts = _exact_starts_brute(stream, iseq)
        if not starts:
            continue
        ex = _exact_starts_brute(stream, eseq)
        lo_off = pre + (len(eseq) - 1)
        hi_off = (len(iseq) - 1) + post
        surv = [p for p in starts
                if not any(p - lo_off <= q <= p + hi_off for q in ex)]
        if surv:
            want[int(row["doc_id"])] = (
                len(surv),
                float(len(code_tokens(pd.Series([row["content"]])).iat[0])))
    gm = dict(zip(got["doc_id"], got["score"]))
    assert set(gm) == set(want)
    for d, (tf, dl) in want.items():
        exp = float(bm25.idf(len(want), st["n_docs"])) * (
            tf / (tf + bm25.K1 * (1 - bm25.B + bm25.B * dl / st["avgdl"])))
        assert gm[d] == pytest.approx(exp, rel=1e-12)


def test_span_not_excludes_everything_when_wide(spark, built):
    # a kill window covering the whole doc empties the result
    reader = IndexReader(spark, built)
    base = reader.span_not_local("get user", "return", k=N_DOCS)
    wide = reader.span_not_local("get user", "return",
                                 pre=10**6, post=10**6, k=N_DOCS)
    # docs keeping spans under the wide window are exactly those with
    # NO 'return' at all; they form a subset of the base survivors
    assert set(wide["doc_id"]) <= set(base["doc_id"])


def test_span_or_vs_brute(spark, built, corpus):
    reader = IndexReader(spark, built)
    clauses = ["get user", "token worker"]
    got = reader.span_or_local(clauses, k=N_DOCS)
    seqs = [phrase_terms(c, "code") for c in clauses]
    st = reader.stats["fields"]["content"]
    want = {}
    for _, row in corpus.iterrows():
        stream = _subtoken_stream(row["content"])
        tf = sum(len(_exact_starts_brute(stream, s)) for s in seqs)
        if tf:
            want[int(row["doc_id"])] = (
                tf, float(len(code_tokens(pd.Series([row["content"]])).iat[0])))
    gm = dict(zip(got["doc_id"], got["score"]))
    assert set(gm) == set(want)
    for d, (tf, dl) in want.items():
        exp = float(bm25.idf(len(want), st["n_docs"])) * (
            tf / (tf + bm25.K1 * (1 - bm25.B + bm25.B * dl / st["avgdl"])))
        assert gm[d] == pytest.approx(exp, rel=1e-12)


# ------------------------------------ span_containing / span_within

def _brute_big_chains(stream, seq, gaps):
    """ordered_iv reference: greedy chain per first-term position,
    total-gap filter, then minimal-envelope reduction."""
    pos = [[i for i, t in enumerate(stream) if t == w] for w in seq]
    if any(not p for p in pos):
        return []
    out = []
    for p in pos[0]:
        prev, width, ok = p, 1, True
        for lst in pos[1:]:
            nxt = [x for x in lst if x > prev]
            if not nxt:
                ok = False
                break
            prev = nxt[0]
            width += 1
        if ok and (prev - p + 1 - width) <= gaps:
            out.append((p, prev))
    return sorted({iv for iv in out
                   if not any(jv != iv and jv[0] >= iv[0] and jv[1] <= iv[1]
                              for jv in out)})


def _span_contain_brute(corpus, big, lit, gaps, keep):
    bseq = phrase_terms(big, "code")
    lseq = phrase_terms(lit, "code")
    want = {}
    for _, row in corpus.iterrows():
        stream = _subtoken_stream(row["content"])
        chains = _brute_big_chains(stream, bseq, gaps)
        lstarts = _exact_starts_brute(stream, lseq)
        lend = len(lseq) - 1
        if keep == "containing":
            kept = [c for c in chains
                    if any(c[0] <= q and q + lend <= c[1] for q in lstarts)]
        else:
            kept = [q for q in lstarts
                    if any(c[0] <= q and q + lend <= c[1] for c in chains)]
        if kept:
            dl = float(len(code_tokens(pd.Series([row["content"]])).iat[0]))
            want[int(row["doc_id"])] = (len(kept), dl)
    return want


def _assert_span_scores(reader, got, want):
    st = reader.stats["fields"]["content"]
    gm = dict(zip(got["doc_id"], got["score"]))
    assert set(gm) == set(want)
    for d, (tf, dl) in want.items():
        exp = float(bm25.idf(len(want), st["n_docs"])) * (
            tf / (tf + bm25.K1 * (1 - bm25.B + bm25.B * dl / st["avgdl"])))
        assert gm[d] == pytest.approx(exp, rel=1e-12), d


@pytest.mark.parametrize("gaps", [0, 1, 3])
def test_span_containing_vs_brute(spark, built, corpus, gaps):
    reader = IndexReader(spark, built)
    got = reader.span_containing_local("value name", "filter", k=N_DOCS,
                                       big_gaps=gaps)
    want = _span_contain_brute(corpus, "value name", "filter", gaps,
                               "containing")
    if gaps >= 1:
        assert want  # the gapped case must actually fire on this corpus
    _assert_span_scores(reader, got, want)


@pytest.mark.parametrize("gaps", [1, 3])
def test_span_within_vs_brute(spark, built, corpus, gaps):
    reader = IndexReader(spark, built)
    got = reader.span_within_local("filter", "value name", k=N_DOCS,
                                   big_gaps=gaps)
    want = _span_contain_brute(corpus, "value name", "filter", gaps, "within")
    assert want
    _assert_span_scores(reader, got, want)


def test_span_containing_impossible_is_empty(spark, built):
    reader = IndexReader(spark, built)
    # a 3-term little cannot fit inside a gap-0 2-term big
    got = reader.span_containing_local("value name", "value filter name",
                                       k=N_DOCS, big_gaps=0)
    assert len(got) == 0
