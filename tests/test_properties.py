"""Property-based tests (hypothesis): codec round-trips, tokenizer
invariants, BM25 bounds — no Spark session needed, pure function layer."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from maestro_spark.functions import bm25
from maestro_spark.functions.codec import (
    decode_positions,
    decode_postings,
    encode_postings,
    merge_segments,
    varint_decode,
    varint_encode,
)
from maestro_spark.functions.tokenize import (
    _flat_term_stats,
    analyze_query,
    code_tokens,
    doc_terms,
    simple_tokens,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.asarray(values, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


posting_lists = st.integers(min_value=1, max_value=300).flatmap(
    lambda n: st.tuples(
        st.lists(st.integers(0, 50_000), min_size=n, max_size=n, unique=True),
        st.lists(st.integers(1, 9), min_size=n, max_size=n),
        st.lists(st.integers(1, 5000), min_size=n, max_size=n),
    )
)


@given(posting_lists, st.integers(4, 64))
@settings(max_examples=60, deadline=None)
def test_posting_roundtrip_any_block_size(data, block):
    docs, tfs, dls = data
    docs = np.sort(np.asarray(docs, dtype=np.int64))
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    rng = np.random.default_rng(int(docs.sum()) % 2**32)
    pos = np.concatenate([
        np.sort(rng.choice(10_000, size=t, replace=False)) for t in tfs
    ]).astype(np.int64)
    enc = encode_postings(docs, tfs, dls, block=block, positions=pos)
    pl = decode_postings(enc)
    assert np.array_equal(pl.doc_ids, docs)
    assert np.array_equal(pl.tfs, tfs)
    p2, t2 = decode_positions(enc)
    assert np.array_equal(p2, pos) and np.array_equal(t2, tfs)
    # block metadata invariants (the WAND bounds must be valid bounds)
    starts = np.arange(0, len(docs), block)
    for bi, s in enumerate(starts):
        e = min(s + block, len(docs))
        assert enc["block_last_doc"][bi] == docs[e - 1]
        assert enc["block_max_tf"][bi] == tfs[s:e].max()
        assert enc["block_min_dl"][bi] == dls[s:e].min()


@given(st.integers(2, 5), st.integers(1, 60))
@settings(max_examples=30, deadline=None)
def test_merge_equals_single_encode(n_segs, seg_size):
    """Merging doc-range-disjoint segments must equal encoding the
    concatenation directly (modulo block boundaries: same decoded data)."""
    rng = np.random.default_rng(n_segs * 1000 + seg_size)
    segs, all_docs, all_tfs, all_pos = [], [], [], []
    base = 0
    for _ in range(n_segs):
        n = int(rng.integers(1, seg_size + 1))
        docs = base + np.sort(rng.choice(1000, size=n, replace=False))
        base = int(docs.max()) + 1
        tfs = rng.integers(1, 5, size=n).astype(np.int64)
        dls = rng.integers(1, 100, size=n).astype(np.int64)
        pos = np.concatenate([
            np.sort(rng.choice(500, size=t, replace=False)) for t in tfs
        ]).astype(np.int64)
        segs.append(encode_postings(docs, tfs, dls, block=8, positions=pos))
        all_docs.append(docs); all_tfs.append(tfs); all_pos.append(pos)
    m = merge_segments(segs)
    pl = decode_postings(m)
    assert np.array_equal(pl.doc_ids, np.concatenate(all_docs))
    assert np.array_equal(pl.tfs, np.concatenate(all_tfs))
    p2, _ = decode_positions(m)
    assert np.array_equal(p2, np.concatenate(all_pos))
    assert m["df"] == sum(s["df"] for s in segs)


texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            max_size=80),
    min_size=1, max_size=20,
)


@given(texts)
@settings(max_examples=100, deadline=None)
def test_tokenizer_invariants(rows):
    s = pd.Series(rows)
    for tokenizer, fn in (("code", code_tokens), ("simple", simple_tokens)):
        tf = doc_terms(s, tokenizer=tokenizer, with_positions=True)
        tf = tf[tf["field"] == "content"]
        lists = fn(s)
        for p, grp in tf.groupby("pos"):
            toks = lists.iat[int(p)]
            # dl = token count; tf sums to dl; positions within [0, dl)
            assert grp["dl"].iloc[0] == len(toks)
            assert grp["tf"].sum() == len(toks)
            allpos = np.concatenate([np.asarray(x) for x in grp["positions"]])
            assert len(allpos) == len(toks)
            assert allpos.min() >= 0 and allpos.max() < len(toks)
            # positions are unique per TERM (ascending lists); across terms
            # a slot holds at most 2 tokens — a subtoken plus the compound
            # whole-ident form sharing its first subtoken's position (the
            # ES synonym-position convention; doc_terms docstring)
            for plist in grp["positions"]:
                arr = np.asarray(plist)
                assert (np.diff(arr) > 0).all()
            assert np.bincount(allpos).max() <= 2
            if tokenizer == "simple":
                assert len(np.unique(allpos)) == len(allpos)
            # multiset equality
            from collections import Counter
            got = Counter()
            for t, n in zip(grp["term"], grp["tf"]):
                got[t] += int(n)
            assert got == Counter(toks)
        # rows with zero tokens appear in NO tf rows
        empty_rows = {i for i, lst in enumerate(lists) if not lst}
        assert empty_rows.isdisjoint(set(tf["pos"].astype(int)))


@given(st.text(max_size=60))
@settings(max_examples=100, deadline=None)
def test_analyze_query_total(q):
    for tok in ("code", "simple"):
        terms = analyze_query(q, tokenizer=tok)
        assert all(isinstance(t, str) and t for t in terms)


@given(st.integers(1, 10**6), st.integers(0, 10**6))
@settings(max_examples=200, deadline=None)
def test_idf_positive_and_monotone(n, df):
    df = min(df, n)
    v = float(bm25.idf(df, n))
    assert v >= 0.0
    if df + 1 <= n:
        assert float(bm25.idf(df + 1, n)) <= v


@given(st.integers(1, 1000), st.integers(1, 5000), st.floats(1.0, 5000.0))
@settings(max_examples=200, deadline=None)
def test_tfnorm_bounded(tf, dl, avgdl):
    v = float(bm25.tfnorm(np.array([tf]), np.array([dl]), avgdl)[0])
    assert 0.0 < v < 1.0

@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                min_size=1, max_size=30))
@settings(max_examples=8, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    """dedup.connected_components vs a pure-Python union-find on random
    small graphs (self-loops and duplicate/reversed edges included)."""
    from maestro_spark.operators import dedup

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nodes = set()
    for a, b in edges:
        if a != b:
            union(a, b)
            nodes.update((a, b))
    want = {n: find(n) for n in sorted(nodes)}
    if not nodes:
        return
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b] or [(0, 0)],
        "id_a long, id_b long")
    got = dedup.connected_components(pairs).toPandas()
    assert dict(zip(got["id"], got["component"])) == want
