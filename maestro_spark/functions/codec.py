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


# ----------------------------------------------------- FOR bit-packing
#
# Codec v2 ("for"): per-block frame-of-reference bit packing — the
# PForDelta/Lucene-FOR family (public), restricted to shift-kernel
# widths {0,1,2,4,8,16,32,64} so pack/unpack stay pure numpy shift/mask
# (no per-bit work): ~40x faster decode than the varint stream at equal
# or smaller size for the dense lists that dominate query cost. Every
# block stores (n, first_doc, width, base) in the posting row's METADATA
# arrays — not in-stream headers — so segment merge remains pure
# byte/array concatenation and selective block decode needs no parsing.
# Streams hold only the packed bits: doc stream packs (gap - base) for
# the n-1 gaps (first doc absolute in block_doc_first), tf stream packs
# (tf - base) for all n values. Width 0 = all values equal base = ZERO
# stream bytes (tf=1 runs and gap-1 stopword runs — the hottest lists —
# cost metadata only). The prox stream packs per posting block in TWO
# regions — per-doc absolute first positions, then in-doc gaps — each
# with its own width/base (block_posf_*/block_posg_*), so a large first
# position can't widen the small-gap region; region A's byte span
# derives from (block_n, width), keeping one offset per block.

_FOR_THRESHOLDS = np.array([1, 2, 4, 16, 256, 4096, 65536, 2 ** 24,
                            2 ** 32], dtype=np.uint64)
_FOR_WIDTHS = np.array([0, 1, 2, 4, 8, 12, 16, 24, 32, 64],
                       dtype=np.int64)
# pad-granularity: values per byte-aligned unit at each width
_FOR_PAD_UNIT = {1: 8, 2: 4, 4: 2, 8: 1, 12: 2, 16: 1, 24: 1, 32: 1,
                 64: 1}


def _snap_width(maxval: np.ndarray) -> np.ndarray:
    """Smallest shift-kernel width that holds every value in [0, maxval]."""
    mv = np.ascontiguousarray(maxval, dtype=np.uint64)
    return _FOR_WIDTHS[np.searchsorted(_FOR_THRESHOLDS, mv, side="right")]


def _within(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated — the repeat+arange index trick."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _seg_reduce(ufunc, values: np.ndarray, starts: np.ndarray,
                counts: np.ndarray) -> np.ndarray:
    """Per-segment ufunc.reduceat that tolerates EMPTY segments (returns
    0 for them). Segments must tile `values` (starts = exclusive cumsum
    of counts)."""
    out = np.zeros(starts.size, dtype=np.int64)
    nz = counts > 0
    if nz.any():
        out[nz] = ufunc.reduceat(values, starts[nz])
    return out


def _pack_w(padded: np.ndarray, w: int) -> np.ndarray:
    """Pack `padded` (uint64, length a multiple of the per-byte value
    granularity) at width w into a little-endian uint8 stream."""
    if w == 8:
        return padded.astype(np.uint8)
    if w == 16:
        return padded.astype("<u2").view(np.uint8)
    if w == 32:
        return padded.astype("<u4").view(np.uint8)
    if w == 64:
        return padded.astype("<u8").view(np.uint8)
    if w == 12:
        v = padded.astype(np.uint32)
        v0, v1 = v[0::2], v[1::2]
        out = np.empty(v0.size * 3, dtype=np.uint8)
        out[0::3] = v0 & 0xFF
        out[1::3] = ((v0 >> 8) & 0x0F) | ((v1 & 0x0F) << 4)
        out[2::3] = (v1 >> 4) & 0xFF
        return out
    if w == 24:
        v = padded.astype(np.uint32)
        out = np.empty(v.size * 3, dtype=np.uint8)
        out[0::3] = v & 0xFF
        out[1::3] = (v >> 8) & 0xFF
        out[2::3] = (v >> 16) & 0xFF
        return out
    a = padded.astype(np.uint8)
    if w == 4:
        return a[0::2] | (a[1::2] << 4)
    if w == 2:
        return a[0::4] | (a[1::4] << 2) | (a[2::4] << 4) | (a[3::4] << 6)
    if w == 1:
        return np.packbits(a, bitorder="little")
    raise ValueError(f"unsupported width {w}")


def _unpack_w(buf: np.ndarray, w: int) -> np.ndarray:
    """Inverse of _pack_w: uint8 stream -> padded uint64 values."""
    if w == 8:
        return buf.astype(np.uint64)
    if w == 16:
        return np.ascontiguousarray(buf).view("<u2").astype(np.uint64)
    if w == 32:
        return np.ascontiguousarray(buf).view("<u4").astype(np.uint64)
    if w == 64:
        return np.ascontiguousarray(buf).view("<u8").astype(np.uint64)
    if w == 12:
        b0 = buf[0::3].astype(np.uint32)
        b1 = buf[1::3].astype(np.uint32)
        b2 = buf[2::3].astype(np.uint32)
        out = np.empty(b0.size * 2, dtype=np.uint32)
        out[0::2] = b0 | ((b1 & 0x0F) << 8)
        out[1::2] = (b1 >> 4) | (b2 << 4)
        return out.astype(np.uint64)
    if w == 24:
        b0 = buf[0::3].astype(np.uint32)
        b1 = buf[1::3].astype(np.uint32)
        b2 = buf[2::3].astype(np.uint32)
        return (b0 | (b1 << 8) | (b2 << 16)).astype(np.uint64)
    if w == 4:
        out = np.empty(buf.size * 2, dtype=np.uint8)
        out[0::2] = buf & 0x0F
        out[1::2] = buf >> 4
        return out.astype(np.uint64)
    if w == 2:
        out = np.empty(buf.size * 4, dtype=np.uint8)
        out[0::4] = buf & 0x03
        out[1::4] = (buf >> 2) & 0x03
        out[2::4] = (buf >> 4) & 0x03
        out[3::4] = buf >> 6
        return out.astype(np.uint64)
    if w == 1:
        return np.unpackbits(buf, bitorder="little").astype(np.uint64)
    raise ValueError(f"unsupported width {w}")


def _for_pad_counts(counts: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Per-block value counts padded to the per-byte granularity of each
    block's width (so every block's packed bytes are byte-aligned and
    self-contained)."""
    vpb = np.ones(widths.size, dtype=np.int64)
    for w, u in _FOR_PAD_UNIT.items():
        if u > 1:
            vpb[widths == w] = u
    return np.where(widths == 0, 0, ((counts + vpb - 1) // vpb) * vpb)


def _for_byte_lens(counts: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Packed byte length of each block — derivable from (count, width)
    alone, so selective decode never needs the next block's offset."""
    return _for_pad_counts(counts, widths) * widths // 8


def _pack_blocks(values: np.ndarray, starts: np.ndarray,
                 counts: np.ndarray, widths: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Pack per-block runs of `values` (starts/counts tile it) at each
    block's width. Returns (uint8 stream, per-block byte lengths); blocks
    are byte-aligned and laid out in block order. Fully vectorized per
    distinct width (a handful of kernel calls per stream)."""
    blen = _for_byte_lens(counts, widths)
    off = np.concatenate(([0], np.cumsum(blen)))
    out = np.zeros(int(off[-1]), dtype=np.uint8)
    pad_n = _for_pad_counts(counts, widths)
    for w in np.unique(widths):
        if w == 0:
            continue
        sel = np.flatnonzero(widths == w)
        cj, pj, bj = counts[sel], pad_n[sel], blen[sel]
        padded = np.zeros(int(pj.sum()), dtype=np.uint64)
        pstart = np.concatenate(([0], np.cumsum(pj)))[:-1]
        padded[np.repeat(pstart, cj) + _within(cj)] = \
            values[np.repeat(starts[sel], cj) + _within(cj)].astype(np.uint64)
        packed = _pack_w(padded, int(w))
        out[np.repeat(off[sel], bj) + _within(bj)] = packed
    return out, blen


def _unpack_blocks(buf: np.ndarray, off: np.ndarray, counts: np.ndarray,
                   widths: np.ndarray, base: np.ndarray) -> np.ndarray:
    """Decode selected blocks: gather each block's packed bytes, unpack
    per distinct width, strip padding, add the per-block base. Returns
    values concatenated in the given block order.

    Fast path (the overwhelmingly common full-list decode): one width,
    byte-contiguous blocks, uniform interior block size — unpack the
    whole span with ONE kernel call and strip padding by reshape, no
    index arrays at all. Everything else (mixed widths after merges,
    scattered block_idx selections) takes the general gather path."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    w0 = int(widths[0])
    if (widths == w0).all():
        add = (int(base[0])
               if bool((base == base[0]).all()) else
               np.repeat(base, counts))
        if w0 == 0:
            out = np.zeros(total, dtype=np.int64)
            return out + add
        blen = _for_byte_lens(counts, widths)
        if bool(np.array_equal(off[1:], off[:-1] + blen[:-1])):
            cat = buf[int(off[0]): int(off[-1] + blen[-1])]
            vals = _unpack_w(cat, w0)
            pad_n = _for_pad_counts(counts, widths)
            if bool((pad_n == counts).all()):
                return vals[:total].astype(np.int64) + add
            nb = counts.size
            c0, p0 = int(counts[0]), int(pad_n[0])
            if nb == 1:
                return vals[:c0].astype(np.int64) + add
            if (bool((counts[:-1] == c0).all())
                    and bool((pad_n[:-1] == p0).all())):
                body = vals[:(nb - 1) * p0].reshape(nb - 1, p0)[:, :c0]
                tail = vals[(nb - 1) * p0:(nb - 1) * p0 + int(counts[-1])]
                return np.concatenate(
                    (body.ravel(), tail)).astype(np.int64) + add
    out = np.empty(total, dtype=np.int64)
    vstart = np.concatenate(([0], np.cumsum(counts)))[:-1]
    blen = _for_byte_lens(counts, widths)
    pad_n = _for_pad_counts(counts, widths)
    for w in np.unique(widths):
        sel = np.flatnonzero(widths == w)
        cj = counts[sel]
        dest = np.repeat(vstart[sel], cj) + _within(cj)
        if w == 0:
            out[dest] = np.repeat(base[sel], cj)
            continue
        bj, pj = blen[sel], pad_n[sel]
        cat = buf[np.repeat(off[sel], bj) + _within(bj)]
        vals = _unpack_w(cat, int(w))
        ppos = np.concatenate(([0], np.cumsum(pj)))[:-1]
        out[dest] = (vals[np.repeat(ppos, cj) + _within(cj)].astype(np.int64)
                     + np.repeat(base[sel], cj))
    return out


def _is_for_row(row: dict) -> bool:
    """Codec v2 rows carry block_n metadata; v1 rows don't (missing key
    or per-row null when a mixed-schema dataset unifies columns)."""
    bn = row.get("block_n")
    return bn is not None and len(bn) == len(row["block_doc_off"])


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
    codec: str = "varint",
) -> dict:
    """Encode one posting list (already sorted by doc_id asc).

    dls = doc length of each posting's document (for the per-block
    (max_tf, min_dl) WAND bound metadata).
    positions: optional flat int64 array of in-document token positions,
    concatenated in posting order (len == tfs.sum(), ascending within each
    document) — the Lucene prox-stream analogue enabling phrase queries.
    Encoded as per-document gaps (first absolute) with per-posting-block
    byte offsets, so block-skipped queries never touch skipped positions.
    codec: "varint" (v1 streams) or "for" (v2 bit-packed blocks — see the
    FOR section above). Returns a dict of plain-python/bytes values ready
    to become a Spark row.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = doc_ids.size
    if n > 1 and not (doc_ids[1:] > doc_ids[:-1]).all():
        raise ValueError("encode_postings requires strictly ascending doc_ids")
    if n and doc_ids[0] < 0:
        raise ValueError("doc_ids must be non-negative")
    if n == 0:
        out = {
            "df": 0, "doc_bytes": b"", "tf_bytes": b"",
            "block_last_doc": [], "block_max_tf": [], "block_min_dl": [],
            "block_doc_off": [], "block_tf_off": [],
            "pos_bytes": b"", "block_pos_off": [],
        }
        if codec == "for":
            out.update({"block_n": [], "block_doc_first": [],
                        "block_doc_width": [], "block_doc_base": [],
                        "block_tf_width": [], "block_tf_base": [],
                        "block_posf_width": [], "block_posf_base": [],
                        "block_posg_width": [], "block_posg_base": []})
        return out
    if codec == "for":
        # single run through the batch encoder (byte-identical by
        # construction — the batch path is the only FOR implementation)
        b = encode_postings_batch(doc_ids, tfs, dls,
                                  np.zeros(1, np.int64), block=block,
                                  positions=positions, codec="for")
        out = {"df": int(b["df"][0])}
        for key in ("doc_bytes", "tf_bytes", "pos_bytes"):
            out[key] = b[key][0]
        for key in ("block_last_doc", "block_max_tf", "block_min_dl",
                    "block_doc_off", "block_tf_off", "block_pos_off",
                    "block_n", "block_doc_first", "block_doc_width",
                    "block_doc_base", "block_tf_width", "block_tf_base",
                    "block_posf_width", "block_posf_base",
                    "block_posg_width", "block_posg_base"):
            out[key] = np.asarray(b[key][0]).tolist()
        return out
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
    codec: str = "varint",
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
        out = {"df": np.empty(0, np.int64), "doc_bytes": [], "tf_bytes": [],
               "block_last_doc": [], "block_max_tf": [], "block_min_dl": [],
               "block_doc_off": [], "block_tf_off": [],
               "pos_bytes": [], "block_pos_off": []}
        if codec == "for":
            out.update({"block_n": [], "block_doc_first": [],
                        "block_doc_width": [], "block_doc_base": [],
                        "block_tf_width": [], "block_tf_base": [],
                        "block_posf_width": [], "block_posf_base": [],
                        "block_posg_width": [], "block_posg_base": []})
        return out
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

    block_last_doc = doc_ids[blk_end - 1]
    block_max_tf = np.maximum.reduceat(tfs, blk_first)
    block_min_dl = np.minimum.reduceat(dls, blk_first)
    splits = blk_cum[1:-1]
    out = {
        "df": sizes,
        "block_last_doc": np.split(block_last_doc, splits),
        "block_max_tf": np.split(block_max_tf, splits),
        "block_min_dl": np.split(block_min_dl, splits),
    }

    if codec == "for":
        n_b = blk_end - blk_first
        # doc stream: per-block FOR over the n-1 gaps (first is absolute
        # in block_doc_first, never packed — a 40-bit doc id would force
        # the whole block wide)
        is_first = np.zeros(n, dtype=bool)
        is_first[blk_first] = True
        gaps = deltas[~is_first]
        g_counts = n_b - 1
        g_starts = np.concatenate(([0], np.cumsum(g_counts)))[:-1]
        base_d = _seg_reduce(np.minimum, gaps, g_starts, g_counts)
        rel_d = gaps - np.repeat(base_d, g_counts)
        w_d = _snap_width(_seg_reduce(np.maximum, rel_d, g_starts,
                                      g_counts))
        doc_all, dlen = _pack_blocks(rel_d, g_starts, g_counts, w_d)
        # tf stream: per-block FOR over ALL n values (tf=1-everywhere
        # blocks pack to zero bytes: width 0, base 1)
        base_t = _seg_reduce(np.minimum, tfs, blk_first, n_b)
        rel_t = tfs - np.repeat(base_t, n_b)
        w_t = _snap_width(_seg_reduce(np.maximum, rel_t, blk_first, n_b))
        tf_all, tlen = _pack_blocks(rel_t, blk_first, n_b, w_t)

        doc_cum = np.concatenate(([0], np.cumsum(dlen)))
        tf_cum = np.concatenate(([0], np.cumsum(tlen)))
        run_first_blk = blk_cum[:-1]
        blk_doc_off = doc_cum[:-1] - doc_cum[run_first_blk][blk_run]
        blk_tf_off = tf_cum[:-1] - tf_cum[run_first_blk][blk_run]
        out["block_doc_off"] = np.split(blk_doc_off, splits)
        out["block_tf_off"] = np.split(blk_tf_off, splits)
        out["block_n"] = np.split(n_b, splits)
        out["block_doc_first"] = np.split(doc_ids[blk_first], splits)
        out["block_doc_width"] = np.split(w_d, splits)
        out["block_doc_base"] = np.split(base_d, splits)
        out["block_tf_width"] = np.split(w_t, splits)
        out["block_tf_base"] = np.split(base_t, splits)
        dmv, tmv = memoryview(doc_all.tobytes()), memoryview(tf_all.tobytes())
        run_doc_byte = doc_cum[run_first_blk]
        run_tf_byte = tf_cum[run_first_blk]
        run_doc_end = np.concatenate((run_doc_byte[1:], [doc_cum[-1]]))
        run_tf_end = np.concatenate((run_tf_byte[1:], [tf_cum[-1]]))
        out["doc_bytes"] = [bytes(dmv[a:b])
                            for a, b in zip(run_doc_byte, run_doc_end)]
        out["tf_bytes"] = [bytes(tmv[a:b])
                           for a, b in zip(run_tf_byte, run_tf_end)]
    else:
        doc_all = varint_encode(deltas)
        tf_all = varint_encode(tfs)
        doc_cum = np.concatenate(([0], np.cumsum(_varint_lengths(deltas))))
        tf_cum = np.concatenate(([0], np.cumsum(_varint_lengths(tfs))))
        # per-block byte offsets RELATIVE to the block's run byte start
        blk_doc_off = doc_cum[blk_first] - doc_cum[run_starts[blk_run]]
        blk_tf_off = tf_cum[blk_first] - tf_cum[run_starts[blk_run]]
        out["block_doc_off"] = np.split(blk_doc_off, splits)
        out["block_tf_off"] = np.split(blk_tf_off, splits)
        dmv, tmv = memoryview(doc_all), memoryview(tf_all)
        out["doc_bytes"] = [bytes(dmv[doc_cum[a]:doc_cum[b]])
                            for a, b in zip(run_starts, run_ends)]
        out["tf_bytes"] = [bytes(tmv[tf_cum[a]:tf_cum[b]])
                           for a, b in zip(run_starts, run_ends)]

    if positions is None:
        out["pos_bytes"] = [b""] * n_runs
        out["block_pos_off"] = [np.empty(0, np.int64)] * n_runs
        if codec == "for":
            for k in ("block_posf_width", "block_posf_base",
                      "block_posg_width", "block_posg_base"):
                out[k] = [np.empty(0, np.int64)] * n_runs
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
    if codec == "for":
        # FOR-pack the prox stream per POSTING block, in TWO regions per
        # block so widths adapt to each distribution separately: region
        # A = every doc's ABSOLUTE first position (count = block_n,
        # ~dl-sized values), region B = the in-doc gaps (count = tfsum -
        # block_n, small values → 1-4 bit widths). One mixed block would
        # inherit region A's width for everything. Region A's byte span
        # derives from (block_n, width), so one offset per block still
        # suffices; decode recovers counts from the tf stream.
        n_b = blk_end - blk_first
        is_doc_start = np.zeros(positions.size, dtype=bool)
        is_doc_start[doc_pos_starts] = True
        firsts = pdeltas[is_doc_start]      # one per doc, block order
        gapsp = pdeltas[~is_doc_start]
        tfsum_b = _seg_reduce(np.add, tfs, blk_first, n_b)
        g_cnt = tfsum_b - n_b
        f_starts = np.concatenate(([0], np.cumsum(n_b)))[:-1]
        g_starts = np.concatenate(([0], np.cumsum(g_cnt)))[:-1]
        base_f = _seg_reduce(np.minimum, firsts, f_starts, n_b)
        w_f = _snap_width(_seg_reduce(
            np.maximum, firsts - np.repeat(base_f, n_b), f_starts, n_b))
        base_g = _seg_reduce(np.minimum, gapsp, g_starts, g_cnt)
        w_g = _snap_width(_seg_reduce(
            np.maximum, gapsp - np.repeat(base_g, g_cnt), g_starts,
            g_cnt))
        sa, la = _pack_blocks(firsts - np.repeat(base_f, n_b),
                              f_starts, n_b, w_f)
        sb, lb = _pack_blocks(gapsp - np.repeat(base_g, g_cnt),
                              g_starts, g_cnt, w_g)
        plen = la + lb
        pos_cum = np.concatenate(([0], np.cumsum(plen)))
        pos_all = np.empty(int(pos_cum[-1]), dtype=np.uint8)
        a_cum = np.concatenate(([0], np.cumsum(la)))[:-1]
        b_cum = np.concatenate(([0], np.cumsum(lb)))[:-1]
        pos_all[np.repeat(pos_cum[:-1], la) + _within(la)] = \
            sa[np.repeat(a_cum, la) + _within(la)]
        pos_all[np.repeat(pos_cum[:-1] + la, lb) + _within(lb)] = \
            sb[np.repeat(b_cum, lb) + _within(lb)]
        run_first_blk = blk_cum[:-1]
        run_pos_byte = pos_cum[run_first_blk]
        run_pos_end = np.concatenate((run_pos_byte[1:], [pos_cum[-1]]))
        pmv = memoryview(pos_all.tobytes())
        out["pos_bytes"] = [bytes(pmv[a:b])
                            for a, b in zip(run_pos_byte, run_pos_end)]
        out["block_pos_off"] = np.split(
            pos_cum[:-1] - run_pos_byte[blk_run], splits)
        out["block_posf_width"] = np.split(w_f, splits)
        out["block_posf_base"] = np.split(base_f, splits)
        out["block_posg_width"] = np.split(w_g, splits)
        out["block_posg_base"] = np.split(base_g, splits)
        return out
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

    if _is_for_row(row):
        return _decode_for(row, doc_buf, tf_buf, doc_off, tf_off,
                           block_idx)

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


def _decode_for(row: dict, doc_buf: np.ndarray, tf_buf: np.ndarray,
                doc_off: np.ndarray, tf_off: np.ndarray,
                block_idx: np.ndarray | None) -> PostingList:
    """Codec-v2 decode: one vectorized unpack per distinct width per
    stream (no per-posting and no per-block Python work beyond array
    slicing) — whole-list and selected-blocks share the same path since
    every block's byte length derives from its (count, width) metadata."""
    n_b = np.asarray(row["block_n"], dtype=np.int64)
    first = np.asarray(row["block_doc_first"], dtype=np.int64)
    w_d = np.asarray(row["block_doc_width"], dtype=np.int64)
    b_d = np.asarray(row["block_doc_base"], dtype=np.int64)
    w_t = np.asarray(row["block_tf_width"], dtype=np.int64)
    b_t = np.asarray(row["block_tf_base"], dtype=np.int64)
    if block_idx is not None:
        sel = np.asarray(block_idx, dtype=np.int64)
        if sel.size == 0:
            return PostingList(np.empty(0, np.int64),
                               np.empty(0, np.int64))
        n_b, first = n_b[sel], first[sel]
        w_d, b_d = w_d[sel], b_d[sel]
        w_t, b_t = w_t[sel], b_t[sel]
        doc_off, tf_off = doc_off[sel], tf_off[sel]
    gaps = _unpack_blocks(doc_buf, doc_off, n_b - 1, w_d, b_d)
    tfs = _unpack_blocks(tf_buf, tf_off, n_b, w_t, b_t)
    starts = np.concatenate(([0], np.cumsum(n_b)))[:-1]
    deltas = np.empty(int(n_b.sum()), dtype=np.int64)
    mask = np.zeros(deltas.size, dtype=bool)
    mask[starts] = True
    deltas[starts] = first
    deltas[~mask] = gaps
    return PostingList(_undelta(deltas, starts), tfs)


def _block_tfs_for(row: dict, tf_buf: np.ndarray, tf_off: np.ndarray,
                   block_idx: np.ndarray) -> np.ndarray:
    """tf values of the selected blocks of a codec-v2 row (the phrase
    path needs tfs to delimit the per-doc position runs)."""
    n_b = np.asarray(row["block_n"], dtype=np.int64)[block_idx]
    w_t = np.asarray(row["block_tf_width"], dtype=np.int64)[block_idx]
    b_t = np.asarray(row["block_tf_base"], dtype=np.int64)[block_idx]
    return _unpack_blocks(tf_buf, tf_off[block_idx], n_b, w_t, b_t)


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
    # positions-absent rows have an EMPTY block_pos_off; a zero-byte
    # stream alone is not absence — FOR width-0 blocks (every pdelta in
    # a block equal) pack real positions into zero bytes
    if n_blocks == 0 or (pos_buf.size == 0
                         and row.get("block_posf_width") is None):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pos_bounds = np.concatenate((pos_off, [pos_buf.size]))
    tf_bounds = np.concatenate((tf_off, [tf_buf.size]))
    if block_idx is None:
        block_idx = np.arange(n_blocks, dtype=np.int64)
    else:
        block_idx = np.asarray(block_idx, dtype=np.int64)
    is_for = _is_for_row(row)
    if is_for:
        # v2: tfs unpack in one vectorized pass
        tfs = _block_tfs_for(row, tf_buf, tf_off, block_idx)
        n_b = np.asarray(row["block_n"], dtype=np.int64)[block_idx]
        tf_splits = np.cumsum(n_b)[:-1]
        tf_parts = np.split(tfs, tf_splits)
    else:
        tf_parts = [varint_decode(
            tf_buf[tf_bounds[bi]:tf_bounds[bi + 1]]).astype(np.int64)
            for bi in block_idx]
        tfs = np.concatenate(tf_parts)
    pw = row.get("block_posf_width")
    if is_for and pw is not None and len(pw) == n_blocks:
        # FOR-packed prox stream, two regions per block (per-doc
        # absolute firsts, then in-doc gaps — region A's byte span
        # derives from (block_n, width)); every doc's first position is
        # absolute, so ONE global _undelta over the selected blocks
        # reconstructs all positions — zero per-block Python work
        w_f = np.asarray(pw, dtype=np.int64)[block_idx]
        b_f = np.asarray(row["block_posf_base"],
                         dtype=np.int64)[block_idx]
        w_g = np.asarray(row["block_posg_width"],
                         dtype=np.int64)[block_idx]
        b_g = np.asarray(row["block_posg_base"],
                         dtype=np.int64)[block_idx]
        tfsum_b = np.array([int(t.sum()) for t in tf_parts],
                           dtype=np.int64)
        g_cnt = tfsum_b - n_b
        off = pos_off[block_idx]
        firsts = _unpack_blocks(pos_buf, off, n_b, w_f, b_f)
        gaps = _unpack_blocks(pos_buf, off + _for_byte_lens(n_b, w_f),
                              g_cnt, w_g, b_g)
        doc_starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
        deltas = np.empty(int(tfs.sum()), dtype=np.int64)
        m = np.zeros(deltas.size, dtype=bool)
        m[doc_starts] = True
        deltas[m] = firsts
        deltas[~m] = gaps
        return _undelta(deltas, doc_starts), tfs
    pos_parts = []
    for bi, tf_b in zip(block_idx, tf_parts):  # loop over BLOCKS
        deltas = varint_decode(pos_buf[pos_bounds[bi]:pos_bounds[bi + 1]]).astype(np.int64)
        doc_starts = np.concatenate(([0], np.cumsum(tf_b)[:-1]))
        pos_parts.append(_undelta(deltas, doc_starts))
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

    is_for = [_is_for_row(s) for s in segments]
    if any(is_for) and not all(is_for):
        raise ValueError("cannot merge mixed-codec segments")
    doc_bytes = b"".join(s["doc_bytes"] for s in segments)
    tf_bytes = b"".join(s["tf_bytes"] for s in segments)
    pos_bytes = b"".join(_pos_parts(s)[0] for s in segments)
    block_last, block_max_tf, block_min_dl = [], [], []
    block_doc_off, block_tf_off, block_pos_off = [], [], []
    # codec-v2 per-block metadata: widths/bases/counts are absolute, so
    # the merge concatenates them exactly like the bound arrays
    FOR_KEYS = ("block_n", "block_doc_first", "block_doc_width",
                "block_doc_base", "block_tf_width", "block_tf_base",
                "block_posf_width", "block_posf_base",
                    "block_posg_width", "block_posg_base")
    for_meta: dict[str, list] = {k: [] for k in FOR_KEYS}
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
        if is_for[0]:
            for k in FOR_KEYS:
                for_meta[k].extend(s[k])
        dpos += len(s["doc_bytes"])
        tpos += len(s["tf_bytes"])
        ppos += len(pb)
        df += s["df"]
    out = {
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
    if is_for[0]:
        out.update(for_meta)
    return out
