"""Bounded multi-term expansion: automaton walks over the SORTED term
dictionary (VERDICT r2 #3 / the Lucene FST ∩ automaton model, public —
Schulz & Mihov 2002 for Levenshtein; Thompson-style position sets for
globs). The reference's ES delegate resolves fuzzy/wildcard/regexp this
way; a full-vocabulary scan per pattern is the behavior being replaced.

The dictionary trie is IMPLICIT in the sorted term array: the terms
sharing a prefix form one contiguous interval, each child edge is found
by binary search (np.searchsorted), and a whole subtree dies the moment
the automaton has no viable state — so the walk touches O(viable trie
nodes · log n) instead of O(n) terms. The array itself loads once per
reader per index version (the FST-load analogue) from the termdict
sidecar; EXPAND_STATS counts nodes visited and terms accepted so tests
can assert sub-linearity on a 10^6-term dictionary.

Regex patterns don't get a full automaton here; instead
regex_literal_prefixes() structurally extracts the set of literal
prefixes every match must start with (walking the stdlib parse tree —
handles alternation like `s(can|ort|mall)`), so the fullmatch
verification runs only over those binary-searched prefix intervals.
"""

from __future__ import annotations

import re

import numpy as np

# audit counters (reset_expand_stats in tests/bench): nodes = implicit
# trie nodes visited; candidates = terms whose full match was evaluated
EXPAND_STATS = {"nodes": 0, "candidates": 0}


def reset_expand_stats() -> dict:
    out = dict(EXPAND_STATS)
    EXPAND_STATS["nodes"] = 0
    EXPAND_STATS["candidates"] = 0
    return out


class LevenshteinAutomaton:
    """Position-set NFA for Levenshtein distance ≤ k from `pattern`
    (Schulz & Mihov 2002, run NFA-style without the DFA tabulation —
    state = frozenset of (i, e): i pattern chars consumed with e edits,
    subsumption-reduced so |state| ≤ 2k+1).

    transpositions=True adds the OSA (optimal string alignment /
    restricted Damerau) transposition primitive — adjacent-swap costs
    ONE edit — matching Lucene's LevenshteinAutomata with
    transpositions, i.e. the ES `fuzzy_transpositions: true` default.
    Schulz & Mihov §7 t-states: on c == w[i+1] a state (i, e) may enter
    (i, e+1, T), which consumes the NEXT char only if it equals w[i],
    landing on (i+2, e+1). A t-state lives exactly one step and is
    always accompanied by the plain insertion state (i, e+1) (created
    under the same e < k guard), so finality needs no t-state case."""

    def __init__(self, pattern: str, k: int, transpositions: bool = False):
        self.w = pattern
        self.k = int(k)
        self.t = bool(transpositions)

    def start(self):
        # ε-closure over deletions: skipping j pattern chars costs j
        return self._reduce([(j, j, 0) for j in range(self.k + 1)])

    def _reduce(self, states):
        # drop subsumed states: (i, e, f) is useless if some (i, e', f)
        # with e' < e. Plain states never subsume t-states (a t-state
        # reaches (i+2, e) only on the NEXT step, after consuming one
        # more char — dominance doesn't transfer across time).
        best: dict[tuple[int, int], int] = {}
        for i, e, f in states:
            if e <= self.k and ((i, f) not in best or e < best[(i, f)]):
                best[(i, f)] = e
        return tuple(sorted((i, e, f) for (i, f), e in best.items()))

    def step(self, state, c: str):
        """Consume one term character; returns the new state or None
        when no viable continuation exists."""
        w, k = self.w, self.k
        nxt: list[tuple[int, int, int]] = []
        for i, e, f in state:
            if f:                               # t-state: finish swap
                if c == w[i]:
                    nxt.append((i + 2, e, 0))
                continue
            if i < len(w) and w[i] == c:
                nxt.append((i + 1, e, 0))          # match
            if e < k:
                nxt.append((i, e + 1, 0))          # insertion into term
                if i < len(w):
                    nxt.append((i + 1, e + 1, 0))  # substitution
                if (self.t and i + 1 < len(w) and c == w[i + 1]
                        and w[i] != c):
                    nxt.append((i, e + 1, 1))      # begin transposition
        # ε-closure over deletions (skip pattern chars; plain states)
        out = []
        for i, e, f in nxt:
            if f:
                out.append((i, e, f))
                continue
            j = 0
            while e + j <= k and i + j <= len(w):
                out.append((i + j, e + j, 0))
                j += 1
        red = self._reduce(out)
        return red or None

    def is_final(self, state) -> bool:
        """Accept if the (ended) term is within k of the full pattern."""
        return any(e + (len(self.w) - i) <= self.k
                   for i, e, f in state if not f)


class PrefixedAutomaton:
    """Mandatory-literal-prefix wrapper (Lucene FuzzyQuery's
    prefixLength / ES fuzzy `prefix_length`): the first len(prefix)
    term characters must equal the prefix exactly (no edits there —
    they are "not fuzzified"); the inner automaton runs over the
    REMAINDER only, matching Lucene's suffix-distance semantics. In a
    dfs_expand walk the prefix check kills every subtree outside the
    prefix's interval after at most len(prefix) nodes — the expansion
    cost becomes proportional to the prefix subtrie, which is why ES
    recommends the parameter at large vocabularies."""

    def __init__(self, inner, prefix: str):
        self.inner = inner
        self.p = prefix

    def start(self):
        return (0, self.inner.start())

    def step(self, state, c: str):
        i, s = state
        if i < len(self.p):
            return (i + 1, s) if c == self.p[i] else None
        s2 = self.inner.step(s, c)
        return None if s2 is None else (i, s2)

    def is_final(self, state) -> bool:
        i, s = state
        return i >= len(self.p) and self.inner.is_final(s)


class GlobAutomaton:
    """Position-set NFA for shell-style wildcards (`*` any run, `?` one
    char) — the ES wildcard query's language."""

    def __init__(self, pattern: str):
        self.p = pattern

    def _closure(self, states):
        # ε-advance through '*' (zero-width match)
        p = self.p
        out = set()
        stack = list(states)
        while stack:
            i = stack.pop()
            if i in out:
                continue
            out.add(i)
            if i < len(p) and p[i] == "*":
                stack.append(i + 1)
        return frozenset(out)

    def start(self):
        return self._closure({0})

    def step(self, state, c: str):
        p = self.p
        nxt = set()
        for i in state:
            if i >= len(p):
                continue
            ch = p[i]
            if ch == "*":
                nxt.add(i)          # '*' consumes c, stays
            elif ch == "?" or ch == c:
                nxt.add(i + 1)
        if not nxt:
            return None
        return self._closure(nxt)

    def is_final(self, state) -> bool:
        return len(self.p) in state


def dfs_expand(terms: np.ndarray, automaton, max_nodes: int = 2_000_000
               ) -> np.ndarray:
    """Indices of `terms` (a SORTED np.ndarray of str) accepted by the
    automaton. Walks the implicit trie: each viable (prefix, state) node
    locates its child-character runs by binary search, so dead prefixes
    prune whole intervals without reading them. Returns ascending
    indices; cost O(viable nodes · log n)."""
    out: list[int] = []
    n = len(terms)
    if n == 0:
        return np.empty(0, np.int64)
    st0 = automaton.start()
    if st0 is None:
        return np.empty(0, np.int64)
    # stack of (lo, hi, depth, prefix, state)
    stack = [(0, n, 0, "", st0)]
    nodes = 0
    while stack:
        lo, hi, d, prefix, st = stack.pop()
        nodes += 1
        if nodes > max_nodes:
            raise RuntimeError("dfs_expand node budget exceeded")
        # the term equal to the prefix itself ends here
        if len(terms[lo]) == d:
            EXPAND_STATS["candidates"] += 1
            if automaton.is_final(st):
                out.append(lo)
            lo += 1
        while lo < hi:
            c = terms[lo][d]
            run_hi = int(np.searchsorted(terms[lo:hi],
                                         prefix + c + "\U0010ffff",
                                         side="right")) + lo
            st2 = automaton.step(st, c)
            if st2 is not None:
                stack.append((lo, run_hi, d + 1, prefix + c, st2))
            lo = run_hi
    EXPAND_STATS["nodes"] += nodes
    out.sort()
    return np.asarray(out, dtype=np.int64)


def regex_literal_prefixes(pattern: str, budget: int = 64
                           ) -> list[str] | None:
    """The set of literal prefixes every match of `pattern` must start
    with, extracted structurally from the stdlib regex parse tree —
    `s(can|ort|mall)x` → ['scanx', 'sortx', 'smallx'] (fully literal),
    `us(er|age)[a-z]*` → ['user', 'usage'] (stops at the class). Returns
    None when no non-empty prefix set is derivable (leading class /
    quantifier / too many alternatives), meaning: scan everything."""
    try:
        import re._parser as sre  # Python ≥3.11
    except ImportError:  # pragma: no cover
        import sre_parse as sre
    try:
        tree = sre.parse(pattern)
    except Exception:
        return None

    def walk(seq) -> tuple[set[str], bool]:
        """(prefixes, complete): complete=False means the walk stopped
        at a non-literal element — the prefixes still hold."""
        prefixes = {""}
        for op, av in seq:
            name = str(op)
            if name == "LITERAL":
                prefixes = {p + chr(av) for p in prefixes}
            elif name == "SUBPATTERN":
                sub, complete = walk(av[3])
                prefixes = {p + s for p in prefixes for s in sub}
                if not complete:
                    return prefixes, False
            elif name == "BRANCH":
                subs = [walk(b) for b in av[1]]
                prefixes = {p + s for p in prefixes
                            for sp, _ in subs for s in sp}
                if not all(c for _, c in subs):
                    return prefixes, False
            elif name == "MAX_REPEAT" and av[0] >= 1:
                # x+ / x{2,}: at least one mandatory copy of the body —
                # take ONE copy as prefix material, then stop (the rest
                # is variable)
                sub, complete = walk(av[2])
                prefixes = {p + s for p in prefixes for s in sub}
                return prefixes, False
            else:
                return prefixes, False
            if len(prefixes) > budget:
                return {""}, False
        return prefixes, True

    prefixes, _ = walk(tree)
    if not prefixes or "" in prefixes:
        return None
    return sorted(prefixes)


# ------------------------- ES/Lucene RegExp syntax operators (flags)

def split_regex_intersection(pattern: str) -> list[str]:
    """Split on TOP-LEVEL `&` — the Lucene RegExp INTERSECTION operator
    ES enables by default (`a.+&.+b` = match both sides). `&` inside
    character classes, groups, or after a backslash is literal/nested
    and never splits. Returns [pattern] when no operator is present."""
    parts, buf = [], []
    depth = brack = 0
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            buf.append(pattern[i:i + 2])
            i += 2
            continue
        if brack:
            if c == "]":
                brack = 0
        elif c == "[":
            brack = 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif c == "&" and depth == 0:
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def expand_regex_intervals(pattern: str, cap: int = 1024) -> str:
    """Translate Lucene RegExp INTERVAL operators `<m-n>` (numeric
    range, ES regexp syntax) into an explicit decimal alternation
    `(m|m+1|...|n)` — plain representations, no leading zeros (the
    Lucene behavior). Ranges wider than `cap` values are rejected
    rather than silently truncated. Escaped `\\<` stays literal."""
    out, i = [], 0
    rx = re.compile(r"<(\d+)-(\d+)>")
    while i < len(pattern):
        if pattern[i] == "\\" and i + 1 < len(pattern):
            out.append(pattern[i:i + 2])
            i += 2
            continue
        m = rx.match(pattern, i)
        if m:
            lo, hi = int(m.group(1)), int(m.group(2))
            if lo > hi:
                raise ValueError(f"bad interval {m.group(0)}: min > max")
            if hi - lo + 1 > cap:
                raise ValueError(
                    f"interval {m.group(0)} expands to {hi - lo + 1} "
                    f"alternatives (cap {cap})")
            out.append("(" + "|".join(str(v) for v in range(lo, hi + 1))
                       + ")")
            i = m.end()
            continue
        out.append(pattern[i])
        i += 1
    return "".join(out)
