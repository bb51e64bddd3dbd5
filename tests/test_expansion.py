"""Fuzzy / wildcard term expansion (the ES fuzzy & wildcard query
analogue, rewrite=scoring_boolean): dictionary expansion vs a
brute-force pandas oracle over the identical corpus, query-path
equivalence with the explicit expanded-term query, serving/distributed
parity, and the deterministic max_expansions cap."""

import fnmatch
import functools
import random

import numpy as np
import pandas as pd
import pytest

from maestro_spark.functions.tokenize import code_tokens
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader, _edit_distance_le
from maestro_spark.sources.corpus import synth_docs, synth_docs_pandas

N_DOCS = 300
CFG = IndexConfig(
    shard_size=128,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_expand"))
    build_index(spark, synth_docs(spark, N_DOCS, seed=7, partitions=5),
                out, CFG)
    return out


@pytest.fixture(scope="module")
def content_df():
    """Brute-force content-field term -> df from the IDENTICAL corpus."""
    pdf = synth_docs_pandas(N_DOCS, seed=7)
    vocab: dict[str, int] = {}
    for ts in code_tokens(pdf["content"]):
        for t in set(ts):
            vocab[t] = vocab.get(t, 0) + 1
    return vocab


def _lev(a: str, b: str) -> int:
    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                   d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))

    return d(len(a), len(b))


def test_edit_distance_le_randomized():
    rng = random.Random(11)
    alpha = "abc"
    for _ in range(400):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 7)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 7)))
        for k in (0, 1, 2, 3):
            assert _edit_distance_le(a, b, k) == (_lev(a, b) <= k), (a, b, k)


@pytest.mark.parametrize("probe,edits", [("cache", 2), ("user", 1),
                                         ("getname", 2)])
def test_fuzzy_terms_vs_bruteforce(spark, built, content_df, probe, edits):
    got = IndexReader(spark, built).fuzzy_terms(
        probe, max_edits=edits, max_expansions=10_000).toPandas()
    want = {t: df for t, df in content_df.items() if _lev(t, probe) <= edits}
    assert dict(zip(got["term"], got["df"])) == want


@pytest.mark.parametrize("pattern", ["get*", "user*", "?ache", "*quest*"])
def test_wildcard_terms_vs_bruteforce(spark, built, content_df, pattern):
    got = IndexReader(spark, built).wildcard_terms(
        pattern, max_expansions=10_000).toPandas()
    want = {t: df for t, df in content_df.items()
            if fnmatch.fnmatchcase(t, pattern)}
    assert dict(zip(got["term"], got["df"])) == want


def test_max_expansions_cap_deterministic(spark, built):
    reader = IndexReader(spark, built)
    full = reader.wildcard_terms("user*", max_expansions=10_000).toPandas()
    top2 = reader.wildcard_terms("user*", max_expansions=2).toPandas()
    want = full.sort_values(["df", "term"], ascending=[False, True]).head(2)
    assert sorted(zip(top2["term"], top2["df"])) \
        == sorted(zip(want["term"], want["df"]))


def test_fuzzy_query_equals_explicit_expansion(spark, built):
    """A query with a fuzzy token scores bit-identically to the same
    query with the expansion written out as plain tokens."""
    reader = IndexReader(spark, built)
    exp = reader.fuzzy_terms("cache", max_edits=2).toPandas()["term"].tolist()
    assert len(exp) > 1  # multi-term expansion, and far below the cap
    got = reader.search_local("cache~2 merge", k=10)
    want = reader.search_local(" ".join(sorted(exp)) + " merge", k=10)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())


def test_wildcard_query_serving_matches_spark(spark, built):
    reader = IndexReader(spark, built)
    want = reader.search("get* user", k=10, engine="spark").toPandas()
    got = reader.search_local("get* user", k=10)
    assert len(got) > 0
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())


def test_no_match_expansion_is_empty(spark, built):
    reader = IndexReader(spark, built)
    assert reader.fuzzy_terms("zzzzzzzzz", max_edits=1).count() == 0
    assert reader.wildcard_terms("zzz*zzz").count() == 0
    # a query made only of non-matching expansions returns no hits
    assert len(reader.search_local("zzzzzzzzz~1", k=5)) == 0


# --------------------------------------------------------------- regexp

import re as _re


@pytest.mark.parametrize("pattern", [
    "get[a-z]*",          # prefix-prunable
    "us(er|age)[a-z0-9]*",  # alternation inside a group (prefix 'us' safe)
    "cach?e",             # quantifier invalidates last literal char
    "(merge|stream)",     # top-level alternation: full dictionary scan
])
def test_regex_terms_vs_bruteforce(spark, built, content_df, pattern):
    reader = IndexReader(spark, built)
    got = {r["term"]: r["df"]
           for r in reader.regex_terms(pattern, 10 ** 6).collect()}
    rx = _re.compile(pattern)
    want = {t: df for t, df in content_df.items() if rx.fullmatch(t)}
    assert got == want and got, pattern


def test_regex_query_equals_explicit_expansion(spark, built):
    reader = IndexReader(spark, built)
    exp = reader.regex_terms("cach[a-z]*").toPandas()["term"].tolist()
    assert len(exp) >= 1
    got = reader.search_local("/cach[a-z]*/ merge", k=10)
    want = reader.search_local(" ".join(sorted(exp)) + " merge", k=10)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())


def test_regex_query_serving_matches_spark(spark, built):
    reader = IndexReader(spark, built)
    want = reader.search("/st.*m/ user", k=10, engine="spark").toPandas()
    got = reader.search_local("/st.*m/ user", k=10)
    assert len(got) > 0
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())


def test_regex_bad_pattern_raises(spark, built):
    reader = IndexReader(spark, built)
    with pytest.raises(ValueError):
        reader.regex_terms("st[")


def test_regex_casefold_preserves_escape_classes(spark, built, content_df):
    """Case folding must only fold LITERALS: a blanket .lower() turns
    \\S into \\s (etc.), inverting the class. ``get\\S*`` over an all-
    lowercase dictionary must behave like ``get.*`` / ``get\\w*``, and
    the uppercase input GET\\S* must fold the literal 'GET' but keep
    the escape."""
    from maestro_spark.operators.search import _casefold_regex

    assert _casefold_regex("GET\\S*") == "get\\S*"
    assert _casefold_regex("A\\Wb\\D\\B") == "a\\Wb\\D\\B"
    assert _casefold_regex("ab\\\\CD") == "ab\\\\cd"  # escaped backslash
    rx = _re.compile("get\\S*")
    want = {t: df for t, df in content_df.items() if rx.fullmatch(t)}
    got = {r["term"]: r["df"]
           for r in reader_terms(spark, built, "GET\\S*")}
    assert got == want and got


def reader_terms(spark, built, pattern):
    return IndexReader(spark, built).regex_terms(pattern, 10 ** 6).collect()


# ------------------------------------------- automaton walk sublinearity

from maestro_spark.functions.automata import (GlobAutomaton,
                                              LevenshteinAutomaton,
                                              dfs_expand,
                                              regex_literal_prefixes,
                                              reset_expand_stats)


def _synthetic_vocab(n: int) -> np.ndarray:
    """Deterministic n-term sorted dictionary shaped like a code
    vocabulary: word-pair identifiers with digit suffixes (independent
    index arithmetic so every i yields a distinct term)."""
    words = ["get", "set", "user", "name", "index", "query", "token",
             "parse", "build", "merge", "shard", "batch", "record",
             "stream", "handler", "client", "server", "request",
             "response", "filter"]
    terms = {f"{words[i % 20]}{words[(i // 20) % 20]}{i // 400}"
             for i in range(n)}
    return np.array(sorted(terms), dtype=object)


def test_expansion_sublinear_fuzzy_million_terms():
    """VERDICT r2 #3 done-gate: on a 10^6-term dictionary, a fuzzy walk
    must visit orders of magnitude fewer trie nodes than terms (the r2
    behavior scanned all 10^6 rows per pattern)."""
    vocab = _synthetic_vocab(1_000_000)
    reset_expand_stats()
    idx = dfs_expand(vocab, LevenshteinAutomaton("getuser123", 1))
    stats = reset_expand_stats()
    lens = np.fromiter((len(t) for t in vocab), np.int64, len(vocab))
    band = vocab[np.abs(lens - 10) <= 1]
    want = [t for t in band if _edit_distance_le(t, "getuser123", 1)]
    assert sorted(vocab[idx]) == sorted(want) and len(want) >= 1
    assert stats["nodes"] < len(vocab) / 1000, stats


def test_expansion_sublinear_wildcard_million_terms():
    vocab = _synthetic_vocab(1_000_000)
    reset_expand_stats()
    idx = dfs_expand(vocab, GlobAutomaton("mergeindex1*"))
    stats = reset_expand_stats()
    rx = _re.compile("mergeindex1[0-9]*")
    want = [t for t in vocab if rx.fullmatch(t)]
    assert sorted(vocab[idx]) == sorted(want) and len(want) >= 1
    assert stats["nodes"] < len(vocab) / 100, stats


def test_levenshtein_automaton_randomized():
    """DFS over a small dictionary == brute-force banded Levenshtein for
    every (pattern, k)."""
    vocab = _synthetic_vocab(3000)
    for pat, k in [("getuser1", 1), ("setname2", 2), ("querytoken77", 1),
                   ("zzz", 2), ("mergeshard12", 2)]:
        idx = dfs_expand(vocab, LevenshteinAutomaton(pat, k))
        want = [t for t in vocab if _edit_distance_le(t, pat, k)]
        assert sorted(vocab[idx]) == sorted(want), (pat, k)


def _osa_distance(a: str, b: str) -> int:
    """Brute-force OSA (restricted Damerau-Levenshtein) DP oracle:
    adjacent transposition costs 1, no substring is edited twice."""
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[m][n]


def test_osa_automaton_transposed_pattern():
    """fuzzy_transpositions semantics: adjacent swap is ONE edit with
    the t-state automaton, TWO without (plain Levenshtein)."""
    vocab = np.array(sorted(["sort", "sore", "short", "osrt", "ost"]),
                     dtype=object)
    with_t = set(vocab[dfs_expand(
        vocab, LevenshteinAutomaton("osrt", 1, transpositions=True))])
    without = set(vocab[dfs_expand(vocab, LevenshteinAutomaton("osrt", 1))])
    assert "sort" in with_t and "sort" not in without
    assert "osrt" in with_t and "osrt" in without  # exact always matches
    assert "ost" in with_t and "ost" in without    # one deletion


def test_osa_automaton_randomized():
    """DFS with transpositions == brute-force OSA DP for every
    (pattern, k), including patterns seeded with adjacent swaps."""
    vocab = _synthetic_vocab(3000)
    cases = [("egtuser1", 1), ("esttname2", 2), ("queryotken77", 1),
             ("mergeshadr12", 2), ("getuser1", 1), ("abab", 2)]
    for pat, k in cases:
        idx = dfs_expand(vocab, LevenshteinAutomaton(
            pat, k, transpositions=True))
        want = [t for t in vocab if _osa_distance(t, pat) <= k]
        assert sorted(vocab[idx]) == sorted(want), (pat, k)


def test_osa_automaton_plain_unchanged():
    """transpositions=False must stay exactly plain Levenshtein (the
    pre-existing oracle rows depend on it)."""
    vocab = _synthetic_vocab(3000)
    for pat, k in [("egtuser1", 1), ("setname2", 2)]:
        idx = dfs_expand(vocab, LevenshteinAutomaton(pat, k))
        want = [t for t in vocab if _edit_distance_le(t, pat, k)]
        assert sorted(vocab[idx]) == sorted(want), (pat, k)


def test_glob_automaton_randomized():
    vocab = _synthetic_vocab(3000)
    cases = [("get*", "get.*"), ("*user*", ".*user.*"),
             ("s?t*9", "s.t.*9"), ("merge*7?", "merge.*7.")]
    for glob, rxs in cases:
        idx = dfs_expand(vocab, GlobAutomaton(glob))
        rx = _re.compile(rxs)
        want = [t for t in vocab if rx.fullmatch(t)]
        assert sorted(vocab[idx]) == sorted(want), glob


def test_regex_literal_prefixes():
    assert regex_literal_prefixes("s(can|ort|mall)") == ["scan", "small",
                                                         "sort"]
    assert regex_literal_prefixes("us(er|age)[a-z0-9]*") == ["usage",
                                                             "user"]
    assert regex_literal_prefixes("(merge|stream)x") == ["mergex",
                                                         "streamx"]
    assert regex_literal_prefixes("get[a-z]*") == ["get"]
    assert regex_literal_prefixes("cach?e") == ["cac"]
    assert regex_literal_prefixes("(ab)+c") == ["ab"]
    assert regex_literal_prefixes("[a-z]+x") is None   # no literal lead
    assert regex_literal_prefixes("a?bc") is None      # empty-matchable
    assert regex_literal_prefixes("\\S*x") is None


def test_regex_expansion_prunes_candidates(spark, built, content_df):
    """Alternation patterns verify only their prefix intervals: the
    candidate count must be far below the dictionary size, results
    unchanged."""
    from maestro_spark.functions.automata import EXPAND_STATS
    reader = IndexReader(spark, built)
    reader.regex_terms("zzzqqq.*")  # force the termdict arrays load
    reset_expand_stats()
    got = {r["term"]: r["df"]
           for r in reader.regex_terms("us(er|age)[a-z0-9]*",
                                       10 ** 6).collect()}
    stats = reset_expand_stats()
    rx = _re.compile("us(er|age)[a-z0-9]*")
    want = {t: df for t, df in content_df.items() if rx.fullmatch(t)}
    assert got == want and got
    n_vocab = len(reader._content_terms_arrays()[0])
    assert 0 < stats["candidates"] < n_vocab / 2, (stats, n_vocab)


def test_prefixed_automaton_suffix_distance():
    """ES fuzzy prefix_length: first P chars exact, Levenshtein on the
    remainders (Lucene FuzzyQuery semantics) — brute-force parity."""
    from maestro_spark.functions.automata import PrefixedAutomaton
    vocab = _synthetic_vocab(3000)
    for pat, k, p in [("getuser1", 1, 3), ("setname2", 2, 2),
                      ("querytoken7", 1, 5), ("merge", 2, 5)]:
        auto = PrefixedAutomaton(LevenshteinAutomaton(pat[p:], k), pat[:p])
        idx = dfs_expand(vocab, auto)
        want = [t for t in vocab
                if t.startswith(pat[:p]) and _lev(t[p:], pat[p:]) <= k]
        assert sorted(vocab[idx]) == sorted(want), (pat, k, p)


def test_prefixed_automaton_bounds_walk():
    """The prefix must bound the trie walk to its subtrie: strictly
    fewer nodes than the unprefixed walk (this vocab's first-char
    branching is only ~20, so the reduction is a small factor here;
    on a real vocabulary the walk shrinks to the prefix interval) and
    every accepted term starts with the prefix."""
    from maestro_spark.functions.automata import PrefixedAutomaton
    vocab = _synthetic_vocab(1_000_000)
    reset_expand_stats()
    free_idx = dfs_expand(vocab, LevenshteinAutomaton("userget0", 2))
    free = reset_expand_stats()["nodes"]
    auto = PrefixedAutomaton(LevenshteinAutomaton("get0", 2), "user")
    pre_idx = dfs_expand(vocab, auto)
    bounded = reset_expand_stats()["nodes"]
    assert bounded < free, (bounded, free)
    assert all(t.startswith("user") for t in vocab[pre_idx])
    # prefixed hits with unchanged-suffix distance are a subset of the
    # free hits only on terms sharing the prefix — sanity, not identity
    assert len(pre_idx) >= 1 and len(free_idx) >= 1


# ---------------------------- ES regexp operators (Lucene flags)

def test_regex_intersection_operator(spark, built, content_df):
    got = {r["term"]: r["df"] for r in IndexReader(spark, built)
           .regex_terms("get.*&.*e", 10 ** 6).collect()}
    want = {t: df for t, df in content_df.items()
            if _re.fullmatch("get.*", t) and _re.fullmatch(".*e", t)}
    assert got == want and got
    # a conjunct that matches nothing empties the intersection
    assert IndexReader(spark, built).regex_terms(
        "get.*&zzz.*", 10 ** 6).count() == 0


def test_regex_interval_operator(spark, built, content_df):
    # terms like handler7 / server12: <5-20> matches the decimal range
    got = {r["term"]: r["df"] for r in IndexReader(spark, built)
           .regex_terms("[a-z]+<5-20>", 10 ** 6).collect()}
    rx = _re.compile("[a-z]+(" + "|".join(str(v) for v in range(5, 21))
                     + ")")
    want = {t: df for t, df in content_df.items() if rx.fullmatch(t)}
    assert got == want and got


def test_regex_interval_guards():
    from maestro_spark.functions.automata import expand_regex_intervals
    assert expand_regex_intervals("a<2-4>b") == "a(2|3|4)b"
    assert expand_regex_intervals(r"a\<2-4>b") == r"a\<2-4>b"  # escaped
    with pytest.raises(ValueError):
        expand_regex_intervals("a<9-2>b")
    with pytest.raises(ValueError):
        expand_regex_intervals("a<0-99999>b")


def test_regex_intersection_split_nesting():
    from maestro_spark.functions.automata import split_regex_intersection
    assert split_regex_intersection("a.*&.*b") == ["a.*", ".*b"]
    assert split_regex_intersection("a[&]b") == ["a[&]b"]      # class
    assert split_regex_intersection("a(x&y)b") == ["a(x&y)b"]  # group
    assert split_regex_intersection(r"a\&b") == [r"a\&b"]      # escape
    assert split_regex_intersection("plain") == ["plain"]
