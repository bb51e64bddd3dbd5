"""Minimal-interval algebra — the Lucene/ES `intervals` query semantics.

The reference delegates search to Elasticsearch (SURVEY §2 X6 family);
ES's `intervals` query (public API, backed by Lucene's IntervalsSource)
is the most expressive positional query: a composable algebra of
sources (match / prefix / wildcard / fuzzy / all_of / any_of) and
positional filters (containing / contained_by / not_containing /
not_contained_by / overlapping / not_overlapping / before / after).

This module is the PURE per-document algebra: every function consumes
and produces an ``(m, 2)`` int64 ndarray of ``[start, end]`` intervals.
A MINIMAL interval list (no interval properly contains another) sorted
by start has strictly increasing starts AND ends — every combinator
here returns that canonical form, which is what makes the vectorized
searchsorted filter checks below correct.

Scoring is NOT here: the serving path (`IndexReader.intervals_local`)
counts minimal intervals per doc as the pseudo-term tf and scores with
the span family's restricted-df BM25 — the same documented convention
as span_near/span_or (Lucene's IntervalQuery uses a 1/width saturation
instead; the convention here keeps the whole span/interval family
mutually consistent and exactly oracle-checkable).

No Spark imports: unit-testable without a JVM.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_EMPTY = np.empty((0, 2), dtype=np.int64)

# ES refuses intervals prefix/wildcard/fuzzy rules that expand past this
# (IndexSearcher's maxClauseCount guard specialized to 128 for intervals)
MAX_EXPANSIONS = 128


# --------------------------------------------------------------- algebra

def term_iv(pos: np.ndarray) -> np.ndarray:
    """Width-1 intervals of a term's (sorted, distinct) positions."""
    p = np.asarray(pos, dtype=np.int64)
    return np.stack([p, p], axis=1) if p.size else _EMPTY


def minimize(iv: np.ndarray) -> np.ndarray:
    """Canonical minimal list: drop duplicates and every interval that
    properly contains another. Output sorted by start with strictly
    increasing starts and ends."""
    if iv.shape[0] <= 1:
        return iv
    iv = np.unique(iv, axis=0)                  # sorts by (start, end)
    # per start keep the smallest end (larger same-start ends contain it)
    first = np.ones(iv.shape[0], dtype=bool)
    first[1:] = iv[1:, 0] != iv[:-1, 0]
    iv = iv[first]
    # starts now strictly increase; i survives iff its end is strictly
    # below every later end (else some later, narrower interval nests)
    ends = iv[:, 1]
    suff = np.minimum.accumulate(ends[::-1])[::-1]
    keep = np.ones(iv.shape[0], dtype=bool)
    keep[:-1] = ends[:-1] < suff[1:]
    return iv[keep]


def any_of_iv(lists: list[np.ndarray]) -> np.ndarray:
    """Disjunction: union of the clause intervals, minimized."""
    lists = [l for l in lists if l.shape[0]]
    if not lists:
        return _EMPTY
    return minimize(np.concatenate(lists, axis=0))


def ordered_iv(lists: list[np.ndarray], max_gaps: int = -1) -> np.ndarray:
    """Ordered conjunction (Lucene OrderedIntervalsSource): one interval
    per chain of sub-intervals appearing in clause order WITHOUT overlap
    (each starts after the previous ends). For every first-clause
    interval the chain is completed greedily (each step takes the
    earliest legal sub-interval — in a minimal list that is also the one
    with the smallest end), the chain's internal gap total is checked
    against max_gaps (< 0 = unlimited), and the surviving (start, end)
    envelopes are minimized."""
    if any(l.shape[0] == 0 for l in lists):
        return _EMPTY
    if len(lists) == 1:
        return lists[0]
    out = []
    rest = lists[1:]
    for s1, e1 in lists[0]:
        prev_e = e1
        width = e1 - s1 + 1
        ok = True
        for lst in rest:
            j = int(np.searchsorted(lst[:, 0], prev_e + 1))
            if j == lst.shape[0]:
                ok = False
                break
            s, e = lst[j]
            width += e - s + 1
            prev_e = e
        if ok and (max_gaps < 0 or prev_e - s1 + 1 - width <= max_gaps):
            out.append((s1, prev_e))
    if not out:
        return _EMPTY
    return minimize(np.asarray(out, dtype=np.int64))


def unordered_iv(lists: list[np.ndarray], max_gaps: int = -1) -> np.ndarray:
    """Unordered conjunction (Lucene UnorderedIntervalsSource): windows
    covering one interval from every clause, enumerated by repeatedly
    taking the envelope of the clause cursors and advancing the clause
    whose cursor starts earliest; gaps = envelope width − Σ clause
    widths (overlap allowed, so gaps can go negative); minimized."""
    if any(l.shape[0] == 0 for l in lists):
        return _EMPTY
    if len(lists) == 1:
        return lists[0]
    idx = [0] * len(lists)
    out = []
    while True:
        cur = [lst[i] for lst, i in zip(lists, idx)]
        start = min(int(c[0]) for c in cur)
        end = max(int(c[1]) for c in cur)
        width = sum(int(c[1]) - int(c[0]) + 1 for c in cur)
        if max_gaps < 0 or end - start + 1 - width <= max_gaps:
            out.append((start, end))
        # advance the earliest-starting cursor; ties by clause order
        adv = min(range(len(cur)), key=lambda i: int(cur[i][0]))
        idx[adv] += 1
        if idx[adv] == lists[adv].shape[0]:
            break
    if not out:
        return _EMPTY
    return minimize(np.asarray(out, dtype=np.int64))


def filter_iv(src: np.ndarray, ref: np.ndarray, rule: str) -> np.ndarray:
    """Positional filter: keep source intervals standing in `rule`
    relation to at least one reference interval (not_* = to none).
    Both inputs are canonical minimal lists; all checks are vectorized
    searchsorted against the reference's monotone starts/ends."""
    if src.shape[0] == 0:
        return src
    neg = rule.startswith("not_")
    base = rule[4:] if neg else rule
    if ref.shape[0] == 0:
        return src if neg else _EMPTY   # no reference: not_* vacuously true
    rs, re_ = ref[:, 0], ref[:, 1]
    a_s, a_e = src[:, 0], src[:, 1]
    if base == "containing":
        # some ref nested inside src: earliest ref starting >= a_s has
        # the smallest end among those — nested iff that end <= a_e
        lo = np.searchsorted(rs, a_s, side="left")
        hit = (lo < ref.shape[0]) & (
            re_[np.minimum(lo, ref.shape[0] - 1)] <= a_e)
    elif base == "contained_by":
        # some ref enclosing src: latest ref starting <= a_s has the
        # largest end among those — encloses iff that end >= a_e
        j = np.searchsorted(rs, a_s, side="right") - 1
        hit = (j >= 0) & (re_[np.maximum(j, 0)] >= a_e)
    elif base == "overlapping":
        # some ref with rs <= a_e and re >= a_s; among refs starting
        # <= a_e the largest end is the last one's
        j = np.searchsorted(rs, a_e, side="right") - 1
        hit = (j >= 0) & (re_[np.maximum(j, 0)] >= a_s)
    elif base == "before":
        hit = a_e < rs[-1]            # some ref starts after src ends
    elif base == "after":
        hit = a_s > re_[0]            # some ref ends before src starts
    else:
        raise ValueError(f"unknown intervals filter rule: {rule!r}")
    return src[~hit if neg else hit]


# ------------------------------------------------------------ expression

@dataclass
class Node:
    """Compiled intervals expression. kind ∈ {seq, all_of, any_of}:
    seq     — clause term lists (each an any_of of expanded terms) from
              a match/prefix/wildcard/fuzzy rule
    all_of  — child Nodes
    any_of  — child Nodes
    """
    kind: str
    clauses: list  # list[list[str]] for seq; list[Node] otherwise
    ordered: bool = True
    max_gaps: int = -1
    filt: tuple[str, "Node"] | None = None
    terms: set = field(default_factory=set)


def parse_intervals(expr: dict, analyze, expand) -> Node:
    """Compile the ES-style rule dict. `analyze(text) -> [terms]` is the
    index analyzer; `expand(kind, pattern) -> [terms]` resolves prefix /
    wildcard / fuzzy against the term dictionary (capped at
    MAX_EXPANSIONS — ES fails such queries rather than truncating)."""
    if not isinstance(expr, dict) or len(expr) != 1:
        raise ValueError("intervals rule must be a single-key dict")
    (kind, body), = expr.items()
    filt = None
    if isinstance(body, dict) and "filter" in body:
        (frule, fexpr), = body["filter"].items()
        filt = (frule, parse_intervals(fexpr, analyze, expand))
    if kind == "match":
        terms = analyze(body["query"])
        if not terms:
            raise ValueError("intervals match analyzed to no terms")
        node = Node("seq", [[t] for t in terms],
                    ordered=bool(body.get("ordered", False)),
                    max_gaps=int(body.get("max_gaps", -1)), filt=filt)
    elif kind in ("prefix", "wildcard", "fuzzy"):
        pat = body[kind] if kind != "fuzzy" else body["term"]
        terms = expand(kind, pat)
        if len(terms) > MAX_EXPANSIONS:
            raise ValueError(
                f"intervals {kind} rule {pat!r} expands to {len(terms)} "
                f"terms (> {MAX_EXPANSIONS}); narrow the pattern")
        node = Node("seq", [sorted(terms)], filt=filt)
    elif kind == "all_of":
        kids = [parse_intervals(e, analyze, expand)
                for e in body["intervals"]]
        node = Node("all_of", kids,
                    ordered=bool(body.get("ordered", False)),
                    max_gaps=int(body.get("max_gaps", -1)), filt=filt)
    elif kind == "any_of":
        kids = [parse_intervals(e, analyze, expand)
                for e in body["intervals"]]
        node = Node("any_of", kids, filt=filt)
    else:
        raise ValueError(f"unknown intervals rule: {kind!r}")
    if node.kind == "seq":
        node.terms = {t for alts in node.clauses for t in alts}
    else:
        node.terms = set().union(*(k.terms for k in node.clauses))
    if filt is not None:
        node.terms |= filt[1].terms
    return node


def eval_node(node: Node, getpos) -> np.ndarray:
    """Evaluate per doc: `getpos(term) -> sorted int64 positions` (empty
    array when absent). Returns the node's canonical interval list."""
    if node.kind == "seq":
        lists = [any_of_iv([term_iv(getpos(t)) for t in alts])
                 for alts in node.clauses]
        iv = (ordered_iv if node.ordered else unordered_iv)(
            lists, node.max_gaps)
    else:
        kids = [eval_node(k, getpos) for k in node.clauses]
        if node.kind == "any_of":
            iv = any_of_iv(kids)
        else:
            iv = (ordered_iv if node.ordered else unordered_iv)(
                kids, node.max_gaps)
    if node.filt is not None and iv.shape[0]:
        iv = filter_iv(iv, eval_node(node.filt[1], getpos), node.filt[0])
    return iv


def candidate_docs(node: Node, docs_of) -> np.ndarray:
    """Posting-bounded superset of docs where the node CAN produce an
    interval: conjunctions intersect child candidates, disjunctions
    union them, positive filters (and before/after, which need a
    reference hit to exist) intersect with the reference's candidates;
    not_* filters can't narrow. `docs_of(term) -> sorted doc ids`."""
    if node.kind == "seq":
        sets = [np.unique(np.concatenate(
                    [docs_of(t) for t in alts]) if len(alts) > 1
                else docs_of(alts[0]))
                for alts in node.clauses]
        cand = sets[0]
        for s in sets[1:]:
            cand = cand[np.isin(cand, s, assume_unique=True)]
    elif node.kind == "any_of":
        kids = [candidate_docs(k, docs_of) for k in node.clauses]
        cand = np.unique(np.concatenate(kids)) if kids else \
            np.empty(0, np.int64)
    else:
        cand = None
        for k in node.clauses:
            s = candidate_docs(k, docs_of)
            cand = s if cand is None else cand[
                np.isin(cand, s, assume_unique=True)]
    if node.filt is not None and not node.filt[0].startswith("not_"):
        ref = candidate_docs(node.filt[1], docs_of)
        cand = cand[np.isin(cand, ref, assume_unique=True)]
    return cand
