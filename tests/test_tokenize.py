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


def test_arrow_tokenizer_parity_with_pandas():
    """token_record_batches (the mapInArrow build path) must produce the
    EXACT token multiset of doc_terms — per (row, term, tf, dl, field),
    including position lists — on a skewed synthetic corpus, both
    tokenizers, with and without positions, plus null/empty edge rows."""
    import numpy as np
    import pyarrow as pa

    from maestro_spark.functions.tokenize import token_record_batches
    from maestro_spark.sources.corpus import generate_batch

    pdf = generate_batch(np.arange(500, dtype=np.int64), seed=7)
    pdf.loc[3, "content"] = ""          # empty doc
    pdf.loc[4, "content"] = None        # null doc
    pdf.loc[5, "lang"] = "  "           # blank keyword
    pdf = pdf.reset_index(drop=True)
    pdf["doc_id"] = np.arange(len(pdf), dtype=np.int64)
    pdf["shard"] = (pdf["doc_id"] // 100).astype("int32")

    for tokenizer in ("code", "simple"):
        for with_pos in (False, True):
            ref = doc_terms(pdf["content"], pdf["path"], pdf["lang"],
                            pdf["repo"], tokenizer=tokenizer,
                            with_positions=with_pos)

            def key_of(row_pos, term, tf, dl, field, positions=None):
                p = tuple(int(x) for x in positions) if positions is not None else ()
                return (int(row_pos), str(term), int(tf), int(dl), str(field), p)

            want = sorted(
                key_of(r.pos, r.term, r.tf, r.dl, r.field,
                       r.positions if with_pos else None)
                for r in ref.itertuples())

            batch = pa.RecordBatch.from_pandas(
                pdf[["doc_id", "shard", "repo", "path", "lang", "content"]],
                preserve_index=False)
            got = []
            for b in token_record_batches(
                    batch, ("content", "path", "lang", "repo"),
                    tokenizer, with_pos):
                t = b.to_pydict()
                for i in range(b.num_rows):
                    got.append(key_of(
                        t["doc_id"][i], t["term"][i], t["tf"][i], t["dl"][i],
                        t["field"][i],
                        t["positions"][i] if with_pos else None))
            assert sorted(got) == want, (tokenizer, with_pos)


def test_lowercase_convention_unicode():
    """All analyzer paths must share ONE lowercase convention (Arrow
    utf8proc). Python's 'İ'.lower() is 'i'+U+0307 while utf8proc gives
    'i' — a mixed convention would tokenize a query differently from the
    index. Regression for the hypothesis-found 'İ0' case."""
    import pandas as pd

    from maestro_spark.functions.tokenize import (
        analyze_query, doc_terms, phrase_terms, simple_tokens)

    s = pd.Series(["İ0"])
    assert simple_tokens(s).iat[0] == ["i0"]
    tf = doc_terms(s, tokenizer="simple")
    assert sorted(tf[tf["field"] == "content"]["term"]) == ["i0"]
    assert phrase_terms("İ0", tokenizer="simple") == ["i0"]
    assert analyze_query("İ0", tokenizer="simple") == ["i0"]
    assert analyze_query("lang:İ") == ["lang:i"]
    # keyword-field indexing side agrees with the query side
    kw = doc_terms(pd.Series(["x"]), lang=pd.Series(["İ"]))
    assert kw[kw["field"] == "lang"]["term"].tolist() == ["lang:i"]


def test_bounded_batches_parity_and_bounds():
    """Byte-bounded input slicing: token multiset identical to the whole
    batch, every slice's content payload within budget (single over-budget
    docs excepted — a doc can't split), zero rows lost."""
    import numpy as np
    import pyarrow as pa

    from maestro_spark.functions.tokenize import (bounded_batches,
                                                  token_record_batches)

    rng = np.random.default_rng(5)
    docs = [" ".join(f"tok{rng.integers(50)}"
                     for _ in range(int(rng.integers(1, 200))))
            for _ in range(300)]
    b = pa.RecordBatch.from_arrays(
        [pa.array(np.arange(300)), pa.array(np.zeros(300, np.int32)),
         pa.array(["r"] * 300), pa.array(["p"] * 300),
         pa.array(["java"] * 300), pa.array(docs)],
        names=["doc_id", "shard", "repo", "path", "lang", "content"])
    subs = list(bounded_batches(b, budget_bytes=2048))
    assert len(subs) > 1
    assert sum(s.num_rows for s in subs) == 300
    for s in subs:
        lens = sum(len(x.as_py()) for x in s.column("content"))
        assert lens <= 2048 or s.num_rows == 1

    def collect(batches):
        rows = []
        for rb in batches:
            for out in token_record_batches(rb, ("content",), "code", True):
                t = out.to_pydict()
                rows += list(zip(t["doc_id"], t["term"], t["tf"], t["dl"],
                                 [tuple(p) for p in t["positions"]]))
        return sorted(rows)

    assert collect([b]) == collect(subs)
