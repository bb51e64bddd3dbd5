"""Varint / posting-block codec round-trip tests (SURVEY.md §5 unit tier)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from maestro_spark.functions.codec import (
    BLOCK,
    decode_postings,
    encode_postings,
    merge_segments,
    varint_decode,
    varint_encode,
)


def test_varint_edges():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**53, 2**63 - 1], dtype=np.uint64)
    buf = varint_encode(vals)
    out = varint_decode(buf)
    assert out.tolist() == vals.tolist()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.int64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


def _mk(n, seed=0, id_stride_max=1000):
    rng = np.random.default_rng(seed)
    gaps = rng.integers(1, id_stride_max, size=n)
    doc_ids = np.cumsum(gaps).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(5, 5000, size=n).astype(np.int64)
    return doc_ids, tfs, dls


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 300, 1000])
def test_posting_roundtrip(n):
    doc_ids, tfs, dls = _mk(n, seed=n)
    enc = encode_postings(doc_ids, tfs, dls)
    assert enc["df"] == n
    assert len(enc["block_last_doc"]) == (n + BLOCK - 1) // BLOCK
    pl = decode_postings(enc)
    assert pl.doc_ids.tolist() == doc_ids.tolist()
    assert pl.tfs.tolist() == tfs.tolist()


def test_posting_block_subset_decode():
    doc_ids, tfs, dls = _mk(1000, seed=7)
    enc = encode_postings(doc_ids, tfs, dls)
    for blocks in ([0], [1, 3], [7], [0, 7]):
        pl = decode_postings(enc, block_idx=np.array(blocks))
        expect_idx = np.concatenate(
            [np.arange(b * BLOCK, min((b + 1) * BLOCK, 1000)) for b in blocks]
        )
        assert pl.doc_ids.tolist() == doc_ids[expect_idx].tolist()
        assert pl.tfs.tolist() == tfs[expect_idx].tolist()


def test_block_max_is_upper_bound():
    from maestro_spark.functions.bm25 import max_tfnorm, tfnorm

    doc_ids, tfs, dls = _mk(500, seed=3)
    enc = encode_postings(doc_ids, tfs, dls)
    # the (max_tf, min_dl) bound must dominate every true tfnorm in the
    # block under ANY avgdl (it's computed at query time)
    for avgdl in (50.0, 123.0, 4000.0):
        tfn = tfnorm(tfs, dls, avgdl)
        for b in range(len(enc["block_last_doc"])):
            lo, hi = b * BLOCK, min((b + 1) * BLOCK, 500)
            bound = max_tfnorm(enc["block_max_tf"][b], enc["block_min_dl"][b], avgdl)
            assert bound >= tfn[lo:hi].max() - 1e-15


def test_encode_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([5, 3, 9]), np.array([1, 1, 1]), np.array([1, 1, 1]))
    with pytest.raises(ValueError):
        encode_postings(np.array([-1, 3]), np.array([1, 1]), np.array([1, 1]))


def test_merge_segments_equals_single_encode():
    doc_ids, tfs, dls = _mk(700, seed=11)
    whole = encode_postings(doc_ids, tfs, dls)
    cuts = [0, 130, 256, 700]
    segs = [
        encode_postings(doc_ids[a:b], tfs[a:b], dls[a:b])
        for a, b in zip(cuts[:-1], cuts[1:])
    ]
    merged = merge_segments(segs)
    assert merged["df"] == whole["df"] == 700
    assert merged["merge_fanin"] == 3
    pl_m, pl_w = decode_postings(merged), decode_postings(whole)
    assert pl_m.doc_ids.tolist() == pl_w.doc_ids.tolist()
    assert pl_m.tfs.tolist() == pl_w.tfs.tolist()
    # block-subset decode still works on merged lists
    sub = decode_postings(merged, block_idx=np.array([2]))
    assert sub.doc_ids.size > 0


# ----------------------------------------------------- batch encoder parity

def _random_runs(rng, n_runs, with_pos, max_docs=5000):
    """Flat (doc, tf, dl, positions, run_starts) with per-run sorted docs."""
    sizes = rng.integers(1, 200, n_runs)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1])).astype(np.int64)
    docs = np.concatenate([
        np.sort(rng.choice(max_docs, s, replace=False)) for s in sizes
    ]).astype(np.int64)
    tfs = rng.integers(1, 30, int(sizes.sum())).astype(np.int64)
    dls = rng.integers(1, 4000, int(sizes.sum())).astype(np.int64)
    pos = None
    if with_pos:
        # ascending positions per posting document
        pos = np.concatenate([
            np.sort(rng.choice(10000, t, replace=False)) for t in tfs
        ]).astype(np.int64)
    return docs, tfs, dls, pos, starts, sizes


@pytest.mark.parametrize("with_pos", [False, True])
@pytest.mark.parametrize("block", [8, BLOCK])
def test_batch_encode_matches_per_run(with_pos, block):
    from maestro_spark.functions.codec import encode_postings_batch

    rng = np.random.default_rng(7)
    docs, tfs, dls, pos, starts, sizes = _random_runs(rng, 37, with_pos)
    out = encode_postings_batch(docs, tfs, dls, starts, block=block,
                                positions=pos)
    ends = np.concatenate((starts[1:], [docs.size]))
    pcum = np.concatenate(([0], np.cumsum(tfs)))
    for r, (a, b) in enumerate(zip(starts, ends)):
        p = pos[pcum[a]:pcum[b]] if with_pos else None
        ref = encode_postings(docs[a:b], tfs[a:b], dls[a:b], block=block,
                              positions=p)
        assert int(out["df"][r]) == ref["df"]
        assert out["doc_bytes"][r] == ref["doc_bytes"]
        assert out["tf_bytes"][r] == ref["tf_bytes"]
        assert out["pos_bytes"][r] == ref["pos_bytes"]
        for k in ("block_last_doc", "block_max_tf", "block_min_dl",
                  "block_doc_off", "block_tf_off", "block_pos_off"):
            assert list(out[k][r]) == list(ref[k]), (r, k)


def test_batch_encode_single_and_empty():
    from maestro_spark.functions.codec import encode_postings_batch

    out = encode_postings_batch(np.empty(0, np.int64), np.empty(0, np.int64),
                                np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(out["doc_bytes"]) == 0 and out["df"].size == 0
    one = encode_postings_batch(np.array([5]), np.array([2]), np.array([9]),
                                np.array([0]))
    ref = encode_postings(np.array([5]), np.array([2]), np.array([9]))
    assert one["doc_bytes"][0] == ref["doc_bytes"]
    assert int(one["df"][0]) == 1


def test_batch_encode_rejects_unsorted_within_run():
    from maestro_spark.functions.codec import encode_postings_batch

    with pytest.raises(ValueError):
        encode_postings_batch(np.array([1, 3, 2]), np.ones(3, np.int64),
                              np.ones(3, np.int64), np.array([0]))
    # descending ACROSS a run boundary is fine (runs are independent)
    out = encode_postings_batch(np.array([5, 9, 2, 4]), np.ones(4, np.int64),
                                np.ones(4, np.int64), np.array([0, 2]))
    assert int(out["df"][0]) == 2 and int(out["df"][1]) == 2
