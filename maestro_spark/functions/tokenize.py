"""Code-aware tokenization — the native rebuild of the analyzers the
reference declares in its ES mapping (SURVEY.md §2.10):

  X1 keyword terms          -> field-prefixed exact tokens ("lang:java")
  X2 copy_to composite      -> path/lang terms share one index namespace
  X3 standard+lowercase     -> identifier extraction + lowercase
     (+ code-aware identifier splitting per BASELINE.json north_star)
  X4/X5 edge-ngram prefix   -> edge_ngrams() (query side lowercases only —
     the asymmetric analyze of file_centric.json:24-29)

Reference analyzer definitions: /root/reference/maestro-app/src/main/
resources/file_centric.json:9-38 (autocomplete_analyzed: standard tokenizer
+ lowercase + edge_ngram 1..20; lowercase_keyword search analyzer).

All operations are pandas/numpy vectorized (Series.str regex ops + numpy
repeat/groupby) — no per-row Python UDFs. These functions run inside
Spark's mapInPandas on executors AND inside the pytest oracle, so index
and oracle tokenize identically by construction.

Term namespace: content tokens are bare; other fields are prefixed
"path:", "lang:", "repo:". Doc length (dl) is PER FIELD, mirroring
Lucene's per-field norms, so BM25 over "path:" terms normalizes by path
token count, not content length.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

IDENT_RE = r"[A-Za-z0-9_]+"
# camelCase / UPPERCASE-run / digit sub-token split (public convention,
# same shape as Lucene's WordDelimiterGraphFilter rules)
SUBTOKEN_RE = r"[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+"
SIMPLE_SPLIT_RE = r"[^a-z0-9]+"

FIELD_CONTENT = "content"
FIELD_PATH = "path"
FIELD_LANG = "lang"
FIELD_REPO = "repo"


def _lower_series(texts: pd.Series) -> pd.Series:
    """Canonical lowercase for ALL analyzer paths: Arrow's utf8_lower
    (utf8proc simple case-folding). Python's str.lower() diverges on
    special-cased codepoints (e.g. U+0130 'İ' → 'i'+U+0307 in Python but
    'i' in utf8proc); mixing conventions would let a query tokenize
    differently from the index. Arrow is the convention because the
    production build path (token_record_batches) is Arrow-native."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lowered = pc.utf8_lower(pa.Array.from_pandas(texts.fillna("")))
    return pd.Series(lowered.to_pandas().to_numpy(), index=texts.index)


def _lower_str(text: str) -> str:
    """Scalar variant of _lower_series for query-side analysis."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.utf8_lower(pa.scalar(text)).as_py()


def simple_tokens(texts: pd.Series) -> pd.Series:
    """Baseline SQL-reproducible tokenizer: lowercase, split on any run of
    non-[a-z0-9]. Exactly mirrors the duckdb oracle expression
    ``unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))`` minus
    empty strings (ASCII-identical; non-ASCII case-folds per utf8proc —
    see _lower_series). Returns a Series of lists."""
    return _lower_series(texts).str.findall(r"[a-z0-9]+")


def code_tokens(texts: pd.Series) -> pd.Series:
    """Code-aware tokens per text: every identifier is split on case/digit/
    underscore boundaries and lowercased; compound identifiers ALSO emit
    their whole lowercased form (so the query `getUserName` matches via
    subtokens AND exact identifier — ES multi-field keyword+text analogue).
    Returns a Series of lists (token order = appearance order)."""
    texts = texts.fillna("")
    idents = texts.str.findall(IDENT_RE)
    counts = idents.str.len().to_numpy(dtype=np.int64)
    flat = pd.Series(
        [t for lst in idents for t in lst], dtype="object"
    )
    if flat.empty:
        return pd.Series([[] for _ in range(len(texts))], index=texts.index)
    subs = flat.str.findall(SUBTOKEN_RE)
    lowered_whole = flat.str.lower()
    n_subs = subs.str.len().to_numpy(dtype=np.int64)
    out_lists: list[list[str]] = []
    k = 0
    # assemble per original row (loop over rows, not tokens; token work
    # above is vectorized)
    per_row = np.split(np.arange(len(flat)), np.cumsum(counts)[:-1])
    for row_ids in per_row:
        toks: list[str] = []
        for i in row_ids:
            s = subs.iat[i]
            toks.extend(t.lower() for t in s)
            if n_subs[i] > 1:
                toks.append(lowered_whole.iat[i])
        out_lists.append(toks)
        k += 1
    return pd.Series(out_lists, index=texts.index)


def subtoken_streams(texts: pd.Series) -> pd.Series:
    """Pure subtoken stream per text for the code tokenizer, where the
    LIST INDEX equals the index position: subtokens occupy consecutive
    positions; whole-identifier tokens are OMITTED because in the index
    position stream they share their first subtoken's position and never
    consume a slot (_flat_code_tokens docstring). Positional (phrase/
    span) matching over stored content must run on THIS stream —
    code_tokens() interleaves whole forms into the list, shifting every
    position after a compound identifier and breaking spans that cross
    its boundary (e.g. 'getUserRequest foo': phrase 'request foo' is
    adjacent at index positions 2,3 but code_tokens yields
    [get,user,request,getuserrequest,foo], span 2→4). Returns a Series
    of lists; dl for BM25 normalization still comes from the full token
    multiset (code_tokens / index doclens), which includes whole forms."""
    texts = texts.fillna("")
    idents = texts.str.findall(IDENT_RE)
    counts = idents.str.len().to_numpy(dtype=np.int64)
    flat = pd.Series([t for lst in idents for t in lst], dtype="object")
    if flat.empty:
        return pd.Series([[] for _ in range(len(texts))], index=texts.index)
    subs = flat.str.findall(SUBTOKEN_RE)
    per_row = np.split(np.arange(len(flat)), np.cumsum(counts)[:-1])
    out_lists: list[list[str]] = []
    for row_ids in per_row:
        toks: list[str] = []
        for i in row_ids:
            toks.extend(t.lower() for t in subs.iat[i])
        out_lists.append(toks)
    return pd.Series(out_lists, index=texts.index)


def _flat_code_tokens(texts: pd.Series
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_pos, token, occ) flat arrays for the code tokenizer — the zero-
    Python-loop path (itertools.chain is C; everything else numpy/pandas
    vectorized). Token MULTISET per row is identical to code_tokens();
    only intra-row order differs (whole-identifier tokens emitted after
    all subtokens instead of interleaved), which is irrelevant to tf/dl.

    occ is the POSITION stream: subtokens take consecutive textual
    positions (0,1,2,… counting subtokens only); a compound identifier's
    whole-form token takes its FIRST subtoken's position — the ES
    synonym-token-at-same-position semantics, so whole forms participate
    in positional (phrase/prefix) matching exactly where the identifier
    occurs instead of at an artificial tail offset."""
    from itertools import chain

    import pyarrow as pa
    import pyarrow.compute as pc

    # identifier extraction + dedup in Arrow C++ (8× the pandas regex
    # path): split on the identifier-complement, drop edge empties,
    # dictionary-encode so the camelCase/snake_case regex only ever runs
    # on UNIQUE identifiers (code vocabularies are tiny vs occurrences).
    arr = pa.Array.from_pandas(texts.fillna(""))
    split = pc.split_pattern_regex(arr, "[^A-Za-z0-9_]+")
    flat_a = pc.list_flatten(split)
    parents = pc.list_parent_indices(split)
    mask = pc.not_equal(flat_a, "")
    flat_a = flat_a.filter(mask)
    if len(flat_a) == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64))
    row_of_ident = parents.filter(mask).to_numpy().astype(np.int64)
    dic = pc.dictionary_encode(flat_a)
    codes = dic.indices.to_numpy().astype(np.int64)
    uni = dic.dictionary.to_pandas().astype(object)
    subs_u = uni.str.findall(SUBTOKEN_RE)
    nsubs_u = subs_u.str.len().to_numpy(dtype=np.int64)
    pool = pd.Series(list(chain.from_iterable(subs_u)), dtype="object").str.lower().to_numpy()
    offsets_u = np.concatenate(([0], np.cumsum(nsubs_u)[:-1]))

    occ_len = nsubs_u[codes]
    total = int(occ_len.sum())
    occ_start = offsets_u[codes]
    first_of_occ = np.concatenate(([0], np.cumsum(occ_len)[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(first_of_occ, occ_len)
    sub_tokens = pool[np.repeat(occ_start, occ_len) + within]
    sub_rows = np.repeat(row_of_ident, occ_len)

    whole_u = nsubs_u > 1
    whole_pool = uni.str.lower().to_numpy()
    occ_whole = whole_u[codes]
    whole_tokens = whole_pool[codes[occ_whole]]
    whole_rows = row_of_ident[occ_whole]

    sub_occ = _row_sequence(sub_rows)
    whole_occ = sub_occ[first_of_occ[occ_whole]]
    toks = np.concatenate([sub_tokens, whole_tokens])
    pos = np.concatenate([sub_rows, whole_rows])
    occ = np.concatenate([sub_occ, whole_occ])
    return pos, toks, occ


def _flat_simple_tokens(texts: pd.Series
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_pos, token, occ) flat arrays for the simple tokenizer —
    Arrow-native lower + split (same token stream as
    lower().findall('[a-z0-9]+')); occ = exact textual positions."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pc.utf8_lower(pa.Array.from_pandas(texts.fillna("")))
    split = pc.split_pattern_regex(arr, "[^a-z0-9]+")
    flat = pc.list_flatten(split)
    parents = pc.list_parent_indices(split)
    mask = pc.not_equal(flat, "")
    toks = flat.filter(mask).to_numpy(zero_copy_only=False)
    pos = parents.filter(mask).to_numpy().astype(np.int64)
    return pos, toks, _row_sequence(pos)


def _row_sequence(rows: np.ndarray) -> np.ndarray:
    """Within-row occurrence index (0,1,2,…) for a flat row-id array, in
    array order — the token POSITION stream. Stable sort keeps the array's
    emission order within each row."""
    order = np.argsort(rows, kind="stable")
    r = rows[order]
    if r.size == 0:
        return np.empty(0, np.int64)
    new_run = np.concatenate(([True], r[1:] != r[:-1]))
    starts = np.flatnonzero(new_run)
    grp = np.cumsum(new_run) - 1
    seq_sorted = np.arange(r.size, dtype=np.int64) - starts[grp]
    seq = np.empty(r.size, dtype=np.int64)
    seq[order] = seq_sorted
    return seq


def _flat_term_stats(pos: np.ndarray, toks: np.ndarray,
                     occ: np.ndarray | None = None) -> pd.DataFrame:
    """Flat (pos, token) occurrences → (pos, term, tf, dl)[, positions].
    With occ (per-occurrence position indices), adds a ``positions`` column
    of ascending in-document position lists per (doc, term)."""
    if pos.size == 0:
        cols = {"pos": pd.array([], dtype="int64"),
                "term": pd.array([], dtype="string"),
                "tf": pd.array([], dtype="int64"),
                "dl": pd.array([], dtype="int64")}
        if occ is not None:
            cols["positions"] = pd.array([], dtype="object")
        return pd.DataFrame(cols)
    dl = np.bincount(pos)
    # integer-keyed aggregation: factorize terms once, then one C-level
    # np.unique over the combined (pos, term_code) key — far cheaper than a
    # pandas string groupby
    codes, uniques = pd.factorize(toks)
    key = pos.astype(np.int64) * np.int64(len(uniques)) + codes
    uniq_key, tf = np.unique(key, return_counts=True)
    out_pos = uniq_key // len(uniques)
    out_code = uniq_key % len(uniques)
    out = pd.DataFrame({
        "pos": out_pos,
        "term": np.asarray(uniques, dtype=object)[out_code],
        "tf": tf.astype(np.int64),
        "dl": dl[out_pos],
    })
    if occ is not None:
        # sorted (pos, code, occ) runs align exactly with np.unique's
        # ascending key order, so one lexsort + split yields the lists
        order = np.lexsort((occ, codes, pos))
        out["positions"] = np.split(occ[order], np.cumsum(tf)[:-1])
    return out


def term_frequencies(token_lists: pd.Series) -> pd.DataFrame:
    """Vectorized (row_position, term, tf, dl) from a Series of token lists.
    dl = total token count of the row's field (BM25 doc length)."""
    counts = token_lists.str.len().to_numpy(dtype=np.int64)
    n = len(token_lists)
    if n == 0 or counts.sum() == 0:
        return pd.DataFrame({"pos": pd.array([], dtype="int64"),
                             "term": pd.array([], dtype="string"),
                             "tf": pd.array([], dtype="int64"),
                             "dl": pd.array([], dtype="int64")})
    pos = np.repeat(np.arange(n, dtype=np.int64), counts)
    flat = np.concatenate([np.asarray(lst, dtype=object) if lst else np.empty(0, object)
                           for lst in token_lists])
    df = (
        pd.DataFrame({"pos": pos, "term": flat})
        .groupby(["pos", "term"], sort=False)
        .size()
        .rename("tf")
        .reset_index()
    )
    dl_by_pos = counts[df["pos"].to_numpy()]
    df["dl"] = dl_by_pos
    df["tf"] = df["tf"].astype("int64")
    return df


def doc_terms(
    content: pd.Series,
    path: pd.Series | None = None,
    lang: pd.Series | None = None,
    repo: pd.Series | None = None,
    tokenizer: str = "code",
    with_positions: bool = False,
) -> pd.DataFrame:
    """Full per-document term extraction across fields → one DataFrame
    (pos, term, tf, dl, field[, positions]). Content terms are bare; path
    terms use the code tokenizer on path segments with "path:" prefix;
    lang/repo are keyword fields (single exact lowercase token, X1).

    with_positions adds ascending in-document token positions per
    (doc, term) — the prox stream for phrase queries. Position semantics:
    simple tokenizer = exact textual order; code tokenizer = subtokens in
    textual order with a compound identifier's whole-form token sharing
    its FIRST subtoken's position (the ES synonym-token-at-same-position
    convention — subtoken adjacency is preserved AND whole forms match
    positionally where the identifier occurs, e.g. match_phrase_prefix
    `get userreq*` hits `getUserRequest`); keyword fields = position 0."""
    flat = _flat_code_tokens if tokenizer == "code" else _flat_simple_tokens
    parts = [_field_tf(*flat(content), prefix="", field=FIELD_CONTENT,
                       with_positions=with_positions)]
    if path is not None:
        parts.append(_field_tf(*_flat_code_tokens(path), prefix="path:",
                               field=FIELD_PATH, with_positions=with_positions))
    if lang is not None:
        parts.append(_keyword_tf(lang, prefix="lang:", field=FIELD_LANG,
                                 with_positions=with_positions))
    if repo is not None:
        parts.append(_keyword_tf(repo, prefix="repo:", field=FIELD_REPO,
                                 with_positions=with_positions))
    return pd.concat(parts, ignore_index=True)


def _field_tf(pos: np.ndarray, toks: np.ndarray, occ: np.ndarray,
              prefix: str, field: str,
              with_positions: bool = False) -> pd.DataFrame:
    tf = _flat_term_stats(pos, toks, occ if with_positions else None)
    if prefix and len(tf):
        tf["term"] = prefix + tf["term"].astype(str)
    tf["field"] = field
    return tf


def _keyword_tf(values: pd.Series, prefix: str, field: str,
                with_positions: bool = False) -> pd.DataFrame:
    """X1 keyword indexing: whole value, lowercased, tf=1, dl=1."""
    vals = _lower_series(values).str.strip()
    mask = vals != ""
    pos = np.flatnonzero(mask.to_numpy())
    out = pd.DataFrame({
        "pos": pos.astype(np.int64),
        "term": (prefix + vals[mask]).to_numpy(dtype=object),
        "tf": np.ones(pos.size, dtype=np.int64),
        "dl": np.ones(pos.size, dtype=np.int64),
        "field": field,
    })
    if with_positions:
        out["positions"] = [np.zeros(1, dtype=np.int64) for _ in range(len(out))]
    return out


# --------------------------------------------------- Arrow-native fast path

def _coded_code_tokens(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row, code, dictionary) for the code tokenizer — the fully
    dictionary-coded variant of _flat_code_tokens: occurrences stay int64
    codes end-to-end; token STRINGS exist only in the returned (deduped,
    lowered) dictionary. Emission order per row is identical to
    _flat_code_tokens (all subtokens, then whole-identifier tokens), so
    position semantics are preserved."""
    from itertools import chain

    import pyarrow as pa
    import pyarrow.compute as pc

    split = pc.split_pattern_regex(pc.fill_null(arr, ""), "[^A-Za-z0-9_]+")
    flat_a = pc.list_flatten(split)
    parents = pc.list_parent_indices(split)
    mask = pc.not_equal(flat_a, "")
    flat_a = flat_a.filter(mask)
    if len(flat_a) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, object))
    row_of_ident = parents.filter(mask).to_numpy().astype(np.int64)
    dic = pc.dictionary_encode(flat_a)
    codes = dic.indices.to_numpy().astype(np.int64)
    uni = dic.dictionary.to_pandas().astype(object)
    subs_u = uni.str.findall(SUBTOKEN_RE)
    nsubs_u = subs_u.str.len().to_numpy(dtype=np.int64)
    # dedup the (unique-identifier × subtoken) pool and the compound whole
    # forms into ONE dictionary; all remapping is dictionary-sized
    pool = pd.Series(list(chain.from_iterable(subs_u)),
                     dtype="object").str.lower().to_numpy()
    pcodes, puniq = pd.factorize(pool)
    whole_low = uni.str.lower().to_numpy()
    compound = nsubs_u > 1
    fcodes, funiq = pd.factorize(
        np.concatenate([np.asarray(puniq, object), whole_low[compound]]))
    sub_final = fcodes[:len(puniq)][pcodes]        # pool entry -> dict code
    wmap = np.full(len(uni), -1, np.int64)
    wmap[compound] = fcodes[len(puniq):]

    offsets_u = np.concatenate(([0], np.cumsum(nsubs_u)[:-1]))
    occ_len = nsubs_u[codes]
    total = int(occ_len.sum())
    occ_start = offsets_u[codes]
    first_of_occ = np.concatenate(([0], np.cumsum(occ_len)[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(first_of_occ, occ_len)
    sub_codes = sub_final[np.repeat(occ_start, occ_len) + within]
    sub_rows = np.repeat(row_of_ident, occ_len)

    occ_whole = compound[codes]
    whole_codes = wmap[codes[occ_whole]]
    whole_rows = row_of_ident[occ_whole]
    sub_occ = _row_sequence(sub_rows)
    whole_occ = sub_occ[first_of_occ[occ_whole]]
    return (np.concatenate([sub_rows, whole_rows]),
            np.concatenate([sub_codes, whole_codes]),
            np.asarray(funiq, object),
            np.concatenate([sub_occ, whole_occ]))


def _coded_simple_tokens(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                       np.ndarray]:
    """(row, code, dictionary, occ) for the simple tokenizer —
    Arrow-native lower + split + dictionary encode; occ = exact textual
    positions."""
    import pyarrow.compute as pc

    split = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(arr, "")), "[^a-z0-9]+")
    flat = pc.list_flatten(split)
    parents = pc.list_parent_indices(split)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    if len(flat) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, object), np.empty(0, np.int64))
    dic = pc.dictionary_encode(flat)
    rows = parents.filter(mask).to_numpy().astype(np.int64)
    return (rows,
            dic.indices.to_numpy().astype(np.int64),
            dic.dictionary.to_pandas().astype(object).to_numpy(),
            _row_sequence(rows))


def _coded_keyword(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray]:
    """(row, code, dictionary, occ) for keyword fields: whole value,
    lowered, trimmed; empty/null values emit nothing (X1 semantics);
    positions are all 0."""
    import pyarrow.compute as pc

    vals = pc.utf8_trim_whitespace(pc.utf8_lower(pc.fill_null(arr, "")))
    mask = pc.not_equal(vals, "")
    vals = vals.filter(mask)
    if len(vals) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, object), np.empty(0, np.int64))
    rows = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    dic = pc.dictionary_encode(vals)
    return (rows.astype(np.int64),
            dic.indices.to_numpy().astype(np.int64),
            dic.dictionary.to_pandas().astype(object).to_numpy(),
            np.zeros(len(rows), np.int64))


def _coded_term_stats(rows: np.ndarray, cds: np.ndarray, dict_size: int,
                      with_positions: bool, occ: np.ndarray | None = None):
    """Aggregate coded occurrences → (out_row, out_code, tf, dl
    [, pos_values, pos_offsets]). Pure int64 numpy; positions are returned
    flat + offsets, ready for a zero-copy Arrow ListArray. occ carries the
    tokenizer's position stream (whole-ident tokens share their first
    subtoken's position — doc_terms semantics)."""
    dl = np.bincount(rows)
    key = rows * np.int64(dict_size) + cds
    uniq_key, tf = np.unique(key, return_counts=True)
    out_row = uniq_key // dict_size
    out_code = uniq_key % dict_size
    if not with_positions:
        return out_row, out_code, tf.astype(np.int64), dl[out_row], None, None
    if occ is None:
        occ = _row_sequence(rows)
    order = np.lexsort((occ, cds, rows))
    pos_values = occ[order]
    pos_offsets = np.concatenate(([0], np.cumsum(tf))).astype(np.int32)
    return (out_row, out_code, tf.astype(np.int64), dl[out_row],
            pos_values, pos_offsets)


# Content-byte budget per tokenizer input slice. Arrow's
# maxRecordsPerBatch bounds input ROW count, but token-row output scales
# with content BYTES (~500× row expansion for long files): at a 2M-doc
# local[32] build a single 31k-doc input batch produced ~350 MB token
# allocations per task, and 32 concurrent tasks blew the executor's
# 8.5 GB direct-memory cap. 8 MB of content ≈ 1-1.5M token rows ≈ tens
# of MB of output buffers per slice — bounded regardless of doc length
# or partition size.
TOKEN_BATCH_CONTENT_BYTES = 8 << 20


def bounded_batches(batch, content_col: str = "content",
                    budget_bytes: int = TOKEN_BATCH_CONTENT_BYTES):
    """Slice an input RecordBatch so each slice's `content` payload stays
    under `budget_bytes` (a single over-budget doc gets its own slice —
    a doc can't be split). Zero-copy: pyarrow slices share buffers."""
    import pyarrow.compute as pc
    n = batch.num_rows
    if n <= 1:
        yield batch
        return
    lens = (pc.binary_length(batch.column(content_col))
            .to_numpy(zero_copy_only=False).astype(np.int64))
    csum = np.cumsum(lens)
    if int(csum[-1]) <= budget_bytes:
        yield batch
        return
    start = 0
    while start < n:
        base = int(csum[start - 1]) if start else 0
        end = int(np.searchsorted(csum, base + budget_bytes, side="right"))
        end = max(end, start + 1)
        yield batch.slice(start, end - start)
        start = end


def token_record_batches(batch, use_fields: tuple, tokenizer: str,
                         with_positions: bool):
    """Arrow-native tokenizer for the index build: one input RecordBatch of
    docs → one OUTPUT RecordBatch PER FIELD with columns (doc_id, shard,
    term, tf, dl, field[, positions]).

    Token/tf/dl/position multisets are identical to the pandas doc_terms
    path (parity-tested); the difference is purely mechanical: terms stay
    dictionary-coded through aggregation (one pd.factorize over the
    dictionary instead of 3M-row string factorize), term strings
    materialize via ONE Arrow C++ take per field, field prefixes apply to
    the dictionary not the occurrences, and position lists are zero-copy
    ListArrays — no pandas block consolidation anywhere (~2× the
    single-thread throughput of the pandas path)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    doc_id = batch.column("doc_id").to_numpy()
    shard = batch.column("shard").to_numpy()

    def emit(rows, cds, dictionary, occ, field: str, prefix: str = "",
             keyword: bool = False):
        if rows.size == 0:
            return None
        if keyword:
            out_row, out_code = rows, cds
            tf = np.ones(rows.size, np.int64)
            dl = np.ones(rows.size, np.int64)
            pos_values = np.zeros(rows.size, np.int64) if with_positions else None
            pos_offsets = (np.arange(rows.size + 1, dtype=np.int32)
                           if with_positions else None)
        else:
            out_row, out_code, tf, dl, pos_values, pos_offsets = \
                _coded_term_stats(rows, cds, len(dictionary),
                                  with_positions, occ)
        if prefix:
            dictionary = np.array([prefix + t for t in dictionary], object)
        term = pc.take(pa.array(dictionary, type=pa.string()),
                       pa.array(out_code))
        n = len(out_row)
        cols = [
            pa.array(doc_id[out_row]),
            pa.array(shard[out_row]),
            term,
            pa.array(tf),
            pa.array(dl),
            pc.take(pa.array([field], type=pa.string()),
                    pa.array(np.zeros(n, np.int64))),
        ]
        names = ["doc_id", "shard", "term", "tf", "dl", "field"]
        if with_positions:
            cols.append(pa.ListArray.from_arrays(
                pa.array(pos_offsets, type=pa.int32()), pa.array(pos_values)))
            names.append("positions")
        return pa.RecordBatch.from_arrays(cols, names=names)

    coded = _coded_code_tokens if tokenizer == "code" else _coded_simple_tokens
    out = [emit(*coded(batch.column("content")), field=FIELD_CONTENT)]
    if FIELD_PATH in use_fields:
        out.append(emit(*_coded_code_tokens(batch.column("path")),
                        field=FIELD_PATH, prefix="path:"))
    if FIELD_LANG in use_fields:
        out.append(emit(*_coded_keyword(batch.column("lang")),
                        field=FIELD_LANG, prefix="lang:", keyword=True))
    if FIELD_REPO in use_fields:
        out.append(emit(*_coded_keyword(batch.column("repo")),
                        field=FIELD_REPO, prefix="repo:", keyword=True))
    return [b for b in out if b is not None]


def phrase_terms(query: str, tokenizer: str = "code") -> list[str]:
    """Query analysis for PHRASE matching: the pure subtoken stream in
    textual order (no whole-identifier tokens, no field scoping) — matches
    the adjacency-preserving position semantics of doc_terms."""
    if tokenizer == "code":
        out: list[str] = []
        for ident in re.findall(IDENT_RE, query):
            out.extend(t.lower() for t in re.findall(SUBTOKEN_RE, ident))
        return out
    return re.findall(r"[a-z0-9]+", _lower_str(query))


def edge_ngrams(tokens: list[str], lo: int = 1, hi: int = 20) -> list[str]:
    """Front edge-ngrams (autocomplete_analyzed, file_centric.json:31-38).
    Query side must NOT expand (X5 asymmetric analyze: lowercase only)."""
    out = []
    for t in tokens:
        for k in range(lo, min(hi, len(t)) + 1):
            out.append(t[:k])
    return out


def analyze_query(query: str, tokenizer: str = "code") -> list[str]:
    """Query-side analysis (X5 asymmetry: same tokenization as index side,
    no ngram expansion). Field-scoped syntax: `lang:java`, `path:util`,
    `repo:org/name` pass through with their field prefix."""
    terms: list[str] = []
    for part in query.split():
        m = re.match(r"^(lang|repo):(.*)$", part)
        if m:
            terms.append(f"{m.group(1)}:{_lower_str(m.group(2))}")
            continue
        m = re.match(r"^path:(.*)$", part)
        if m:
            toks = code_tokens(pd.Series([m.group(1)])).iat[0]
            terms.extend(f"path:{t}" for t in toks)
            continue
        fn = code_tokens if tokenizer == "code" else simple_tokens
        terms.extend(fn(pd.Series([part])).iat[0])
    return terms
