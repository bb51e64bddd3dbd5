"""ES/Lucene `intervals` query — algebra brute-force parity + serving
path. The pure algebra (maestro_spark/functions/intervals.py) is tested
against O(n^k) enumerations that implement the minimal-interval
semantics from first principles; the serving path is cross-checked
against the span family on the shared sub-surface (unordered match ==
span_near in_order=false) and against hand-computed goldens."""
import itertools

import numpy as np
import pytest

from maestro_spark.functions import intervals as ivx


def _brute_minimize(cands):
    """All (s,e) candidates -> minimal set (no proper containment)."""
    cs = sorted(set(map(tuple, cands)))
    out = [c for c in cs
           if not any(o != c and c[0] <= o[0] and o[1] <= c[1]
                      for o in cs)]
    return np.asarray(out, np.int64).reshape(-1, 2)


def _brute_ordered(lists, max_gaps):
    """Greedy-chain contract: per first-clause interval complete the
    chain with the earliest legal interval each step (the Lucene
    OrderedIntervalsSource walk), gap-filter, minimize."""
    out = []
    for s1, e1 in lists[0]:
        prev, width, ok = e1, e1 - s1 + 1, True
        for lst in lists[1:]:
            nxt = [iv for iv in lst if iv[0] > prev]
            if not nxt:
                ok = False
                break
            s, e = min(nxt, key=lambda iv: iv[0])
            width += e - s + 1
            prev = e
        if ok and (max_gaps < 0 or prev - s1 + 1 - width <= max_gaps):
            out.append((s1, prev))
    return _brute_minimize(out)


def _brute_unordered_terms(plists, max_gaps):
    """Width-1 clauses: every combination (one position per clause)
    whose envelope has <= max_gaps internal gaps, minimized. The
    cursor-advance enumeration must agree after minimization."""
    out = []
    for combo in itertools.product(*plists):
        s, e = min(combo), max(combo)
        if max_gaps < 0 or e - s + 1 - len(combo) <= max_gaps:
            out.append((s, e))
    return _brute_minimize(out)


def _brute_filter(src, ref, rule):
    neg = rule.startswith("not_")
    base = rule[4:] if neg else rule
    rel = {
        "containing": lambda a, b: a[0] <= b[0] and b[1] <= a[1],
        "contained_by": lambda a, b: b[0] <= a[0] and a[1] <= b[1],
        "overlapping": lambda a, b: not (b[1] < a[0] or b[0] > a[1]),
        "before": lambda a, b: a[1] < b[0],
        "after": lambda a, b: a[0] > b[1],
    }[base]
    keep = [a for a in src
            if any(rel(a, b) for b in ref) != neg]
    return np.asarray(keep, np.int64).reshape(-1, 2)


def _rand_positions(rng, n, hi):
    return np.unique(rng.integers(0, hi, size=n)).astype(np.int64)


def _rand_minimal(rng, n, hi):
    s = rng.integers(0, hi, size=n)
    w = rng.integers(0, 4, size=n)
    return ivx.minimize(np.stack([s, s + w], axis=1).astype(np.int64))


# ------------------------------------------------------------- algebra

def test_minimize_matches_brute():
    rng = np.random.default_rng(7)
    for _ in range(200):
        iv = np.stack([rng.integers(0, 20, 8),
                       rng.integers(0, 6, 8)], axis=1)
        iv = np.stack([iv[:, 0], iv[:, 0] + iv[:, 1]], axis=1
                      ).astype(np.int64)
        got = ivx.minimize(iv)
        want = _brute_minimize(iv.tolist())
        assert np.array_equal(got, want)
        # canonical: strictly increasing starts AND ends
        assert (np.diff(got[:, 0]) > 0).all()
        assert (np.diff(got[:, 1]) > 0).all()


@pytest.mark.parametrize("max_gaps", [-1, 0, 1, 3])
def test_ordered_matches_brute(max_gaps):
    rng = np.random.default_rng(11)
    for _ in range(150):
        nclauses = rng.integers(2, 4)
        lists = [_rand_minimal(rng, rng.integers(1, 6), 30)
                 for _ in range(nclauses)]
        if any(l.shape[0] == 0 for l in lists):
            continue
        got = ivx.ordered_iv(lists, max_gaps)
        want = _brute_ordered([l.tolist() for l in lists], max_gaps)
        assert np.array_equal(got, want), (lists, max_gaps)


@pytest.mark.parametrize("max_gaps", [-1, 0, 2, 5])
def test_unordered_terms_matches_brute(max_gaps):
    rng = np.random.default_rng(13)
    for _ in range(150):
        nclauses = int(rng.integers(2, 4))
        plists = [_rand_positions(rng, int(rng.integers(1, 7)), 25)
                  for _ in range(nclauses)]
        if any(p.size == 0 for p in plists):
            continue
        lists = [ivx.term_iv(p) for p in plists]
        got = ivx.unordered_iv(lists, max_gaps)
        want = _brute_unordered_terms([p.tolist() for p in plists],
                                      max_gaps)
        assert np.array_equal(got, want), (plists, max_gaps)


@pytest.mark.parametrize("rule", [
    "containing", "contained_by", "overlapping", "before", "after",
    "not_containing", "not_contained_by", "not_overlapping"])
def test_filter_matches_brute(rule):
    rng = np.random.default_rng(17)
    for _ in range(200):
        src = _rand_minimal(rng, int(rng.integers(1, 8)), 30)
        ref = _rand_minimal(rng, int(rng.integers(0, 5)), 30)
        got = ivx.filter_iv(src, ref, rule)
        want = _brute_filter(src.tolist(), ref.tolist(), rule)
        assert np.array_equal(got, want), (src, ref, rule)


def test_any_of_unions_and_minimizes():
    a = np.array([[1, 4], [8, 9]], np.int64)
    b = np.array([[2, 3], [8, 9]], np.int64)
    got = ivx.any_of_iv([a, b])
    assert got.tolist() == [[2, 3], [8, 9]]   # (1,4) contains (2,3)


def test_parse_rejects_wide_expansion():
    expand = lambda kind, pat: [f"t{i}" for i in range(200)]
    with pytest.raises(ValueError, match="128"):
        ivx.parse_intervals({"prefix": {"prefix": "t"}},
                            lambda s: s.split(), expand)


def test_candidate_docs_shapes():
    docs = {"a": np.array([1, 2, 3]), "b": np.array([2, 3, 4]),
            "c": np.array([9])}
    g = lambda t: docs.get(t, np.empty(0, np.int64))
    parse = lambda e: ivx.parse_intervals(e, lambda s: s.split(), None)
    n_and = parse({"match": {"query": "a b"}})
    assert ivx.candidate_docs(n_and, g).tolist() == [2, 3]
    n_or = parse({"any_of": {"intervals": [
        {"match": {"query": "a"}}, {"match": {"query": "c"}}]}})
    assert ivx.candidate_docs(n_or, g).tolist() == [1, 2, 3, 9]
    # positive filter narrows to the reference's docs; not_* cannot
    n_f = parse({"match": {"query": "a",
                           "filter": {"containing": {"match": {"query": "c"}}}}})
    assert ivx.candidate_docs(n_f, g).tolist() == []
    n_nf = parse({"match": {"query": "a",
                            "filter": {"not_containing": {"match": {"query": "c"}}}}})
    assert ivx.candidate_docs(n_nf, g).tolist() == [1, 2, 3]


def test_eval_golden_tree():
    P = {"slow": np.array([1, 5, 9]), "query": np.array([3, 10]),
         "scan": np.array([6])}
    g = lambda t: P.get(t, np.empty(0, np.int64))
    parse = lambda e: ivx.parse_intervals(e, lambda s: s.split(), None)
    got = ivx.eval_node(parse(
        {"all_of": {"ordered": True, "max_gaps": 2, "intervals": [
            {"match": {"query": "slow"}},
            {"any_of": {"intervals": [{"match": {"query": "query"}},
                                      {"match": {"query": "scan"}}]}}]}}),
        g)
    assert got.tolist() == [[1, 3], [5, 6], [9, 10]]
    got = ivx.eval_node(parse(
        {"match": {"query": "slow query", "ordered": True, "max_gaps": 3,
                   "filter": {"not_containing":
                              {"match": {"query": "scan"}}}}}), g)
    assert got.tolist() == [[1, 3], [9, 10]]


# -------------------------------------------------------- serving path

@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    from maestro_spark.operators.build import IndexConfig, build_index
    from maestro_spark.operators.search import IndexReader
    texts = [
        "slow query on the merge table",
        "query slow slow query fast scan",
        "the scan was slow but the query was fast",
        "fast merge fast merge",
        "slow scan slow scan slow query",
        "nothing relevant here at all",
        "query engines: slow query planners make slow query plans",
    ]
    df = spark.createDataFrame(
        [(i, "r1", f"f{i}", "c0", "py", t) for i, t in enumerate(texts)],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string")
    out = str(tmp_path_factory.mktemp("iv_idx"))
    build_index(spark, df, out,
                IndexConfig(shard_size=4, store_positions=True,
                            tokenizer="simple"),
                id_col="doc_id")
    return IndexReader(spark, out), texts


def _brute_corpus(texts, expr, max_gaps_key=None):
    """Evaluate the expression per doc over the simple whitespace
    stream via the pure algebra on brute-extracted positions."""
    import re
    out = {}
    for d, t in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        pos = {}
        for i, w in enumerate(toks):
            pos.setdefault(w, []).append(i)
        g = lambda w: np.asarray(pos.get(w, []), np.int64)
        node = ivx.parse_intervals(expr, lambda s: s.split(), None)
        tf = ivx.eval_node(node, g).shape[0]
        if tf:
            out[d] = tf
    return out


def test_intervals_local_matches_algebra_on_corpus(reader):
    r, texts = reader
    expr = {"all_of": {"ordered": True, "max_gaps": 2, "intervals": [
        {"match": {"query": "slow"}},
        {"any_of": {"intervals": [{"match": {"query": "query"}},
                                  {"match": {"query": "scan"}}]}}]}}
    pdf = r.intervals_local(expr, k=20)
    want_tf = _brute_corpus(texts, expr)
    assert set(pdf["doc_id"]) == set(want_tf)
    # scores must be the span-family pseudo-term BM25 over these tfs
    import re

    from maestro_spark.functions import bm25
    dls = {d: len(re.findall(r"[a-z0-9]+", t.lower()))
           for d, t in enumerate(texts)}
    n = len(texts)
    avgdl = sum(dls.values()) / n
    idf = bm25.idf(len(want_tf), n)
    for _, row in pdf.iterrows():
        tf = want_tf[row["doc_id"]]
        want = idf * tf / (tf + bm25.K1 * (
            1 - bm25.B + bm25.B * dls[row["doc_id"]] / avgdl))
        assert row["score"] == pytest.approx(want, rel=1e-12)


def test_intervals_unordered_equals_span_near(reader):
    r, _ = reader
    a = r.span_near_local("slow query", k=20, slop=3, in_order=False)
    b = r.intervals_local(
        {"match": {"query": "slow query", "max_gaps": 3}}, k=20)
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))


def test_intervals_filter_on_corpus(reader):
    r, texts = reader
    expr = {"match": {"query": "slow query", "ordered": True,
                      "max_gaps": 3,
                      "filter": {"not_containing":
                                 {"match": {"query": "fast"}}}}}
    pdf = r.intervals_local(expr, k=20)
    want = _brute_corpus(texts, expr)
    got = dict(zip(pdf["doc_id"], pdf["score"]))
    assert set(got) == set(want)


def test_intervals_prefix_rule(reader):
    r, texts = reader
    # sc* expands over the index dictionary (scan); unordered window
    expr = {"all_of": {"max_gaps": 4, "intervals": [
        {"match": {"query": "slow"}}, {"prefix": {"prefix": "sc"}}]}}
    pdf = r.intervals_local(expr, k=20)
    want = _brute_corpus(texts, {"all_of": {"max_gaps": 4, "intervals": [
        {"match": {"query": "slow"}}, {"match": {"query": "scan"}}]}})
    assert set(pdf["doc_id"]) == set(want)


def test_intervals_requires_positions(spark, tmp_path):
    from maestro_spark.operators.build import IndexConfig, build_index
    from maestro_spark.operators.search import IndexReader
    df = spark.createDataFrame(
        [(0, "r", "f", "c", "py", "a b c")],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string")
    out = str(tmp_path / "noprox")
    build_index(spark, df, out,
                IndexConfig(store_positions=False, tokenizer="simple"),
                id_col="doc_id")
    with pytest.raises(ValueError, match="store_positions"):
        IndexReader(spark, out).intervals_local(
            {"match": {"query": "a b"}})
