"""Tokenizer golden tests (SURVEY.md §5: tokenizer golden cases; mirrors the
reference's analyzer declarations file_centric.json:9-38)."""

import pandas as pd

from maestro_spark.functions.tokenize import (
    analyze_query,
    code_tokens,
    doc_terms,
    edge_ngrams,
    simple_tokens,
    term_frequencies,
)


def test_simple_tokens_golden():
    s = pd.Series(["Hello, World! x2", "", None, "a_b"])
    out = simple_tokens(s).tolist()
    # '_' splits: [a-z0-9]+ runs only, mirroring the duckdb oracle regex
    assert out == [["hello", "world", "x2"], [], [], ["a", "b"]]


def test_code_tokens_camel_snake_digits():
    s = pd.Series(
        [
            "getUserName",
            "parse_http_response2",
            "HTTPServer",
            "plain",
            "XMLHttpRequest x86_64",
        ]
    )
    out = code_tokens(s).tolist()
    assert out[0] == ["get", "user", "name", "getusername"]
    assert out[1] == ["parse", "http", "response", "2", "parse_http_response2"]
    assert out[2] == ["http", "server", "httpserver"]
    assert out[3] == ["plain"]
    assert out[4] == ["xml", "http", "request", "xmlhttprequest", "x", "86", "64", "x86_64"]


def test_code_tokens_empty_and_null():
    s = pd.Series(["", None, "   "])
    assert code_tokens(s).tolist() == [[], [], []]


def test_term_frequencies_counts_and_dl():
    lists = pd.Series([["a", "b", "a"], [], ["b"]])
    tf = term_frequencies(lists)
    rows = {(r.pos, r.term): (r.tf, r.dl) for r in tf.itertuples()}
    assert rows[(0, "a")] == (2, 3)
    assert rows[(0, "b")] == (1, 3)
    assert rows[(2, "b")] == (1, 1)
    assert len(rows) == 3


def test_doc_terms_field_prefixes():
    df = doc_terms(
        content=pd.Series(["def fooBar(): return fooBar"]),
        path=pd.Series(["src/utils/FooBar.py"]),
        lang=pd.Series(["Python"]),
        repo=pd.Series(["org1/repoA"]),
    )
    terms = set(df["term"])
    assert {"def", "foo", "bar", "foobar", "return"} <= terms
    assert {"path:src", "path:utils", "path:foo", "path:bar", "path:py"} <= terms
    assert "lang:python" in terms
    assert "repo:org1/repoa" in terms
    # per-field dl: lang/repo are keyword fields with dl=1
    lang_row = df[df["term"] == "lang:python"].iloc[0]
    assert lang_row.tf == 1 and lang_row.dl == 1
    # content dl counts content tokens only
    crow = df[df["term"] == "def"].iloc[0]
    content_total = int(df[df["field"] == "content"].tf.sum())
    assert crow.dl == content_total


def test_edge_ngrams_bounds():
    assert edge_ngrams(["foo"], 1, 20) == ["f", "fo", "foo"]
    assert edge_ngrams(["abcd"], 2, 3) == ["ab", "abc"]


def test_analyze_query_field_scoped_and_subtokens():
    assert analyze_query("lang:Java") == ["lang:java"]
    assert analyze_query("getUserName") == ["get", "user", "name", "getusername"]
    assert analyze_query("path:FooBar") == ["path:foo", "path:bar", "path:foobar"]
    assert analyze_query("repo:Org1/RepoA hash") == ["repo:org1/repoa", "hash"]
