"""Posting-list compression: docID-gap + varint in fixed-size blocks with
per-block skip offsets and block-max score bounds (for block-max WAND /
MaxScore pruning at query time).

This natively rebuilds what the reference delegates to Elasticsearch/Lucene
posting storage (SURVEY.md §2.10 X6, §4.2 "Compression"). Everything here
is numpy-vectorized — no per-element Python loops over postings (the only
Python-level loops are over the ≤10 byte positions of a varint and over
segments at merge time).

Wire format per posting list (one term within one doc shard):
  doc_bytes : varint stream; per block the first value is the ABSOLUTE
              doc_id, the rest are gaps (doc[i] - doc[i-1], >= 1). Blocks
              are self-contained, so segment merge = byte concatenation.
  tf_bytes  : varint stream of term frequencies, same blocking.
  block_last_doc[]: last (absolute) doc_id per block   -> skip pointers
  block_max_tf[] / block_min_dl[]: per-block max term frequency and min
              doc length. tfnorm is increasing in tf and decreasing in dl,
              so tfnorm(max_tf, min_dl, avgdl) is a valid upper bound for
              every posting in the block under ANY avgdl — the block-max
              WAND bound is computed at QUERY time (bound = idf * that),
              keeping the encoder independent of global corpus stats (no
              second pass over the token stream at build time).
  block_doc_off[] / block_tf_off[]: byte offset of each block's start
              (block i spans [off[i], off[i+1]) with off[n_blocks] = len).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK = 128  # postings per block (Lucene uses 128 for FOR blocks — public)


# ---------------------------------------------------------------- varint

def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style unsigned varint, vectorized. values: non-negative ints."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (1..10), vectorized
    nb = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    maxb = int(nb.max())
    mat = np.zeros((v.size, maxb), dtype=np.uint8)
    for i in range(maxb):
        mat[:, i] = ((v >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
        # continuation bit on every byte except the last of each value
        mat[:, i] |= np.where(i < nb - 1, 0x80, 0).astype(np.uint8)
    mask = np.arange(maxb)[None, :] < nb[:, None]
    return mat[mask].tobytes()


def varint_decode(buf: bytes | np.ndarray, offset: int = 0, length: int | None = None) -> np.ndarray:
    """Decode a varint stream (or a byte-slice of one) to uint64, vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if length is not None:
        b = b[offset : offset + length]
    elif offset:
        b = b[offset:]
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    terminal = (b & 0x80) == 0
    ends = np.flatnonzero(terminal)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


# ------------------------------------------------------------- postings

@dataclass
class PostingList:
    """Decoded posting list: sorted absolute doc ids + term frequencies."""

    doc_ids: np.ndarray  # int64, strictly ascending
    tfs: np.ndarray  # int64, >= 1


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block: int = BLOCK,
    positions: np.ndarray | None = None,
) -> dict:
    """Encode one posting list (already sorted by doc_id asc).

    dls = doc length of each posting's document (for the per-block
    (max_tf, min_dl) WAND bound metadata).
    positions: optional flat int64 array of in-document token positions,
    concatenated in posting order (len == tfs.sum(), ascending within each
    document) — the Lucene prox-stream analogue enabling phrase queries.
    Encoded as per-document gaps (first absolute) with per-posting-block
    byte offsets, so block-skipped queries never touch skipped positions.
    Returns a dict of plain-python/bytes values ready to become a Spark row.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = doc_ids.size
    if n > 1 and not (doc_ids[1:] > doc_ids[:-1]).all():
        raise ValueError("encode_postings requires strictly ascending doc_ids")
    if n and doc_ids[0] < 0:
        raise ValueError("doc_ids must be non-negative")
    if n == 0:
        return {
            "df": 0, "doc_bytes": b"", "tf_bytes": b"",
            "block_last_doc": [], "block_max_tf": [], "block_min_dl": [],
            "block_doc_off": [], "block_tf_off": [],
            "pos_bytes": b"", "block_pos_off": [],
        }
    n_blocks = (n + block - 1) // block
    block_starts = np.arange(n_blocks, dtype=np.int64) * block
    block_ends = np.minimum(block_starts + block, n)  # exclusive

    # gap-transform: first of each block stays absolute
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = doc_ids[0]
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    deltas[block_starts] = doc_ids[block_starts]

    # per-block byte offsets: encode per block to know boundaries cheaply —
    # encode the whole stream once, then compute per-value byte lengths to
    # derive block offsets (vectorized, no per-block re-encode).
    doc_bytes = varint_encode(deltas)
    tf_bytes = varint_encode(tfs)
    doc_lens = _varint_lengths(deltas)
    tf_lens = _varint_lengths(tfs)
    doc_cum = np.concatenate(([0], np.cumsum(doc_lens)))
    tf_cum = np.concatenate(([0], np.cumsum(tf_lens)))
    block_doc_off = doc_cum[block_starts]
    block_tf_off = tf_cum[block_starts]

    dls = np.ascontiguousarray(dls, dtype=np.int64)
    block_max_tf = np.maximum.reduceat(tfs, block_starts)
    block_min_dl = np.minimum.reduceat(dls, block_starts)
    block_last_doc = doc_ids[block_ends - 1]

    pos_bytes = b""
    block_pos_off: list[int] = []
    if positions is not None:
        positions = np.ascontiguousarray(positions, dtype=np.int64)
        if positions.size != int(tfs.sum()):
            raise ValueError("positions length must equal sum(tfs)")
        doc_pos_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
        pdeltas = np.empty(positions.size, dtype=np.int64)
        if positions.size:
            pdeltas[0] = positions[0]
            pdeltas[1:] = positions[1:] - positions[:-1]
            pdeltas[doc_pos_starts] = positions[doc_pos_starts]
        pos_bytes = varint_encode(pdeltas)
        pos_cum = np.concatenate(([0], np.cumsum(_varint_lengths(pdeltas))))
        # byte offset where each posting BLOCK's positions begin
        block_pos_off = pos_cum[doc_pos_starts[block_starts]].tolist()

    return {
        "df": int(n),
        "doc_bytes": doc_bytes,
        "tf_bytes": tf_bytes,
        "block_last_doc": block_last_doc.tolist(),
        "block_max_tf": block_max_tf.tolist(),
        "block_min_dl": block_min_dl.tolist(),
        "block_doc_off": block_doc_off.tolist(),
        "block_tf_off": block_tf_off.tolist(),
        "pos_bytes": pos_bytes,
        "block_pos_off": block_pos_off,
    }


def encode_postings_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    run_starts: np.ndarray,
    block: int = BLOCK,
    positions: np.ndarray | None = None,
) -> dict:
    """Encode MANY posting lists in one vectorized pass.

    The flat arrays hold all runs back-to-back; run_starts marks where each
    posting list begins (ascending, first 0). Output is byte-identical to
    calling encode_postings on each run: the varint streams, blocking, and
    per-block metadata all reset at run boundaries. One varint encode +
    one length scan covers the whole partition, so per-run Python cost
    drops to two byte-slices — the encoder's throughput no longer depends
    on how many terms a partition holds, only on how many postings.

    Returns dict of per-run sequences, aligned with run_starts:
      df            int64 array (run sizes)
      doc_bytes / tf_bytes [/ pos_bytes]   list[bytes]
      block_last_doc / block_max_tf / block_min_dl / block_doc_off /
      block_tf_off [/ block_pos_off]       list[np.ndarray int64]
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    run_starts = np.ascontiguousarray(run_starts, dtype=np.int64)
    n = doc_ids.size
    n_runs = run_starts.size
    if n == 0 or n_runs == 0:
        return {"df": np.empty(0, np.int64), "doc_bytes": [], "tf_bytes": [],
                "block_last_doc": [], "block_max_tf": [], "block_min_dl": [],
                "block_doc_off": [], "block_tf_off": [],
                "pos_bytes": [], "block_pos_off": []}
    run_ends = np.concatenate((run_starts[1:], [n]))
    sizes = run_ends - run_starts
    if (doc_ids < 0).any():
        raise ValueError("doc_ids must be non-negative")
    is_start = np.zeros(n, dtype=bool)
    is_start[run_starts] = True
    if n > 1 and not ((doc_ids[1:] > doc_ids[:-1]) | is_start[1:]).all():
        raise ValueError("encode_postings requires strictly ascending doc_ids")

    # global block-start index: every run restarts blocking at its first
    # posting; blocks tile each run in `block`-sized strides
    nb_run = (sizes + block - 1) // block                  # blocks per run
    total_blocks = int(nb_run.sum())
    blk_run = np.repeat(np.arange(n_runs, dtype=np.int64), nb_run)
    blk_cum = np.concatenate(([0], np.cumsum(nb_run)))
    within = np.arange(total_blocks, dtype=np.int64) - blk_cum[blk_run]
    blk_first = run_starts[blk_run] + within * block
    blk_end = np.minimum(blk_first + block, run_ends[blk_run])  # exclusive

    # gap transform, absolute at every block start (run starts included)
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = doc_ids[0]
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    deltas[blk_first] = doc_ids[blk_first]

    doc_all = varint_encode(deltas)
    tf_all = varint_encode(tfs)
    doc_cum = np.concatenate(([0], np.cumsum(_varint_lengths(deltas))))
    tf_cum = np.concatenate(([0], np.cumsum(_varint_lengths(tfs))))

    block_last_doc = doc_ids[blk_end - 1]
    block_max_tf = np.maximum.reduceat(tfs, blk_first)
    block_min_dl = np.minimum.reduceat(dls, blk_first)
    # per-block byte offsets RELATIVE to the block's run byte start
    blk_doc_off = doc_cum[blk_first] - doc_cum[run_starts[blk_run]]
    blk_tf_off = tf_cum[blk_first] - tf_cum[run_starts[blk_run]]

    splits = blk_cum[1:-1]
    out = {
        "df": sizes,
        "block_last_doc": np.split(block_last_doc, splits),
        "block_max_tf": np.split(block_max_tf, splits),
        "block_min_dl": np.split(block_min_dl, splits),
        "block_doc_off": np.split(blk_doc_off, splits),
        "block_tf_off": np.split(blk_tf_off, splits),
    }
    dmv, tmv = memoryview(doc_all), memoryview(tf_all)
    out["doc_bytes"] = [bytes(dmv[doc_cum[a]:doc_cum[b]])
                        for a, b in zip(run_starts, run_ends)]
    out["tf_bytes"] = [bytes(tmv[tf_cum[a]:tf_cum[b]])
                       for a, b in zip(run_starts, run_ends)]

    if positions is None:
        out["pos_bytes"] = [b""] * n_runs
        out["block_pos_off"] = [np.empty(0, np.int64)] * n_runs
        return out
    positions = np.ascontiguousarray(positions, dtype=np.int64)
    if positions.size != int(tfs.sum()):
        raise ValueError("positions length must equal sum(tfs)")
    # first-position index of each posting (document); every document's
    # first position is stored absolute, so runs can't contaminate
    doc_pos_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    pdeltas = np.empty(positions.size, dtype=np.int64)
    if positions.size:
        pdeltas[0] = positions[0]
        pdeltas[1:] = positions[1:] - positions[:-1]
        pdeltas[doc_pos_starts] = positions[doc_pos_starts]
    pos_all = varint_encode(pdeltas)
    pos_cum = np.concatenate(([0], np.cumsum(_varint_lengths(pdeltas))))
    run_pos_byte = pos_cum[doc_pos_starts[run_starts]]
    run_pos_end = np.concatenate((run_pos_byte[1:], [len(pos_all)]))
    pmv = memoryview(pos_all)
    out["pos_bytes"] = [bytes(pmv[a:b])
                        for a, b in zip(run_pos_byte, run_pos_end)]
    out["block_pos_off"] = np.split(
        pos_cum[doc_pos_starts[blk_first]] - run_pos_byte[blk_run], splits)
    return out


def _varint_lengths(values: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    return nb


def decode_postings(row: dict, block_idx: np.ndarray | None = None) -> PostingList:
    """Decode a whole posting list, or only the selected blocks.

    row: the dict/Row produced by encode_postings (or a merged segment).
    block_idx: optional ascending array of block indices to decode
    (block-max WAND skips the rest without touching their bytes).
    """
    doc_buf = np.frombuffer(row["doc_bytes"], dtype=np.uint8)
    tf_buf = np.frombuffer(row["tf_bytes"], dtype=np.uint8)
    doc_off = np.asarray(row["block_doc_off"], dtype=np.int64)
    tf_off = np.asarray(row["block_tf_off"], dtype=np.int64)
    n_blocks = doc_off.size
    if n_blocks == 0:
        return PostingList(np.empty(0, np.int64), np.empty(0, np.int64))
    doc_bounds = np.concatenate((doc_off, [doc_buf.size]))
    tf_bounds = np.concatenate((tf_off, [tf_buf.size]))

    if block_idx is None:
        deltas = varint_decode(doc_buf).astype(np.int64)
        tfs = varint_decode(tf_buf).astype(np.int64)
        starts = _block_value_starts(doc_buf, doc_off)
        doc_ids = _undelta(deltas, starts)
        return PostingList(doc_ids, tfs)

    block_idx = np.asarray(block_idx, dtype=np.int64)
    if block_idx.size == 0:
        return PostingList(np.empty(0, np.int64), np.empty(0, np.int64))
    doc_parts, tf_parts = [], []
    for bi in block_idx:  # loop over BLOCKS (n/128), not postings
        d = varint_decode(doc_buf[doc_bounds[bi] : doc_bounds[bi + 1]]).astype(np.int64)
        doc_parts.append(np.cumsum(d))
        tf_parts.append(varint_decode(tf_buf[tf_bounds[bi] : tf_bounds[bi + 1]]).astype(np.int64))
    return PostingList(np.concatenate(doc_parts), np.concatenate(tf_parts))


def _block_value_starts(doc_buf: np.ndarray, doc_off: np.ndarray) -> np.ndarray:
    """Value-index (not byte-index) where each block starts in the stream."""
    terminal_pos = np.flatnonzero((doc_buf & 0x80) == 0)  # byte pos of each value end
    value_start_bytes = np.concatenate(([0], terminal_pos[:-1] + 1))
    return np.searchsorted(value_start_bytes, doc_off)


def _undelta(deltas: np.ndarray, block_value_starts: np.ndarray) -> np.ndarray:
    """Invert per-block gap encoding: cumsum that restarts at block starts."""
    out = np.cumsum(deltas)
    if block_value_starts.size <= 1:
        return out
    # subtract, for every block after the first, the running total just
    # before the block (its first value was absolute, not a gap)
    corrections = out[block_value_starts[1:] - 1]
    seg = np.zeros(deltas.size, dtype=np.int64)
    seg[block_value_starts[1:]] = np.diff(np.concatenate(([0], corrections)))
    return out - np.cumsum(seg)


def decode_positions(row: dict, block_idx: np.ndarray | None = None
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Decode the position stream for the selected posting blocks.

    Returns (positions, tfs): flat absolute in-doc positions and the tf of
    each decoded posting — ``np.split(positions, np.cumsum(tfs)[:-1])``
    yields the per-document position lists, aligned with the doc_ids that
    ``decode_postings(row, block_idx)`` returns for the same blocks."""
    pos_buf = np.frombuffer(row["pos_bytes"], dtype=np.uint8)
    tf_buf = np.frombuffer(row["tf_bytes"], dtype=np.uint8)
    pos_off = np.asarray(row["block_pos_off"], dtype=np.int64)
    tf_off = np.asarray(row["block_tf_off"], dtype=np.int64)
    n_blocks = pos_off.size
    if n_blocks == 0 or pos_buf.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pos_bounds = np.concatenate((pos_off, [pos_buf.size]))
    tf_bounds = np.concatenate((tf_off, [tf_buf.size]))
    if block_idx is None:
        block_idx = np.arange(n_blocks, dtype=np.int64)
    else:
        block_idx = np.asarray(block_idx, dtype=np.int64)
    pos_parts, tf_parts = [], []
    for bi in block_idx:  # loop over BLOCKS, not postings
        tf_b = varint_decode(tf_buf[tf_bounds[bi]:tf_bounds[bi + 1]]).astype(np.int64)
        deltas = varint_decode(pos_buf[pos_bounds[bi]:pos_bounds[bi + 1]]).astype(np.int64)
        doc_starts = np.concatenate(([0], np.cumsum(tf_b)[:-1]))
        pos_parts.append(_undelta(deltas, doc_starts))
        tf_parts.append(tf_b)
    return np.concatenate(pos_parts), np.concatenate(tf_parts)


def merge_segments(segments: list[dict]) -> dict:
    """Merge pre-encoded, doc-range-DISJOINT segments of one term (the
    salted-build path, SURVEY.md §7.1 M4). Segments must be sorted by
    first doc_id ascending; since every block is self-contained (absolute
    first doc), the merge is pure byte/array concatenation — no decode.

    Mirrors Maestro's scatter-gather bulk partitioning (Parallel.java:53-77)
    turned into a distributed segment merge; fan-in = len(segments).
    """
    if len(segments) == 1:
        s = dict(segments[0])
        s["merge_fanin"] = 1
        return s
    def _pos_parts(s: dict) -> tuple[bytes, list]:
        # explicit None checks: values arrive as numpy arrays from pandas
        # records, and a 1-element array([0]) is FALSY — `or` would
        # silently drop real offsets
        pb = s.get("pos_bytes")
        po = s.get("block_pos_off")
        return (b"" if pb is None else bytes(pb),
                [] if po is None else list(po))

    doc_bytes = b"".join(s["doc_bytes"] for s in segments)
    tf_bytes = b"".join(s["tf_bytes"] for s in segments)
    pos_bytes = b"".join(_pos_parts(s)[0] for s in segments)
    block_last, block_max_tf, block_min_dl = [], [], []
    block_doc_off, block_tf_off, block_pos_off = [], [], []
    dpos = tpos = ppos = 0
    df = 0
    for s in segments:
        pb, po = _pos_parts(s)
        block_last.extend(s["block_last_doc"])
        block_max_tf.extend(s["block_max_tf"])
        block_min_dl.extend(s["block_min_dl"])
        block_doc_off.extend([o + dpos for o in s["block_doc_off"]])
        block_tf_off.extend([o + tpos for o in s["block_tf_off"]])
        block_pos_off.extend([int(o) + ppos for o in po])
        dpos += len(s["doc_bytes"])
        tpos += len(s["tf_bytes"])
        ppos += len(pb)
        df += s["df"]
    return {
        "df": df,
        "doc_bytes": doc_bytes,
        "tf_bytes": tf_bytes,
        "pos_bytes": pos_bytes,
        "block_last_doc": block_last,
        "block_max_tf": block_max_tf,
        "block_min_dl": block_min_dl,
        "block_doc_off": block_doc_off,
        "block_tf_off": block_tf_off,
        "block_pos_off": block_pos_off,
        "merge_fanin": len(segments),
    }
