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


# ---------------------------------------------------------------- codec v2

def _parity(doc_ids, tfs, dls, positions=None):
    """v2 must decode identically to v1 — whole list, every single block,
    a scattered subset, and (when present) positions."""
    from maestro_spark.functions.codec import decode_positions
    v1 = encode_postings(doc_ids, tfs, dls, positions=positions)
    v2 = encode_postings(doc_ids, tfs, dls, positions=positions,
                         codec="for")
    a, b = decode_postings(v1), decode_postings(v2)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.tfs, b.tfs)
    nb = len(v2["block_doc_off"])
    subsets = [[i] for i in range(nb)] + [list(range(nb))]
    if nb > 2:
        subsets.append([0, nb - 1])
    for blocks in subsets:
        bi = np.array(blocks, dtype=np.int64)
        a = decode_postings(v1, block_idx=bi)
        b = decode_postings(v2, block_idx=bi)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(a.tfs, b.tfs)
        if positions is not None:
            pa, ta = decode_positions(v1, bi)
            pb, tb = decode_positions(v2, bi)
            np.testing.assert_array_equal(pa, pb)
            np.testing.assert_array_equal(ta, tb)
    return v1, v2


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 300, 1000])
@pytest.mark.parametrize("stride,tfmax", [(2, 2), (9, 4), (1000, 50),
                                          (10**7, 2000)])
def test_for_decode_parity(n, stride, tfmax):
    rng = np.random.default_rng(n * 1000 + stride)
    doc_ids = np.cumsum(rng.integers(1, stride + 1, n)).astype(np.int64)
    tfs = rng.integers(1, tfmax, n).astype(np.int64)
    dls = rng.integers(5, 5000, n).astype(np.int64)
    _parity(doc_ids, tfs, dls)


def test_for_zero_width_blocks_cost_zero_bytes():
    """gap-1 / tf-1 runs (the hottest stop-word lists) pack to width 0:
    ZERO stream bytes, metadata only."""
    n = 1000
    doc_ids = np.arange(5, 5 + n, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 60, dtype=np.int64)
    _, v2 = _parity(doc_ids, tfs, dls)
    assert len(v2["doc_bytes"]) == 0
    assert len(v2["tf_bytes"]) == 0
    assert all(w == 0 for w in v2["block_doc_width"])
    assert all(w == 0 for w in v2["block_tf_width"])


def test_for_positions_parity():
    rng = np.random.default_rng(3)
    n = 700
    doc_ids = np.cumsum(rng.integers(1, 50, n)).astype(np.int64)
    tfs = rng.integers(1, 6, n).astype(np.int64)
    dls = rng.integers(5, 500, n).astype(np.int64)
    pos = np.concatenate([np.sort(rng.choice(500, t, replace=False))
                          for t in tfs]).astype(np.int64)
    _parity(doc_ids, tfs, dls, positions=pos)


def test_for_merge_equals_single_encode():
    doc_ids, tfs, dls = _mk(1200, seed=9, id_stride_max=100)
    whole = encode_postings(doc_ids, tfs, dls, codec="for")
    cuts = [0, 250, 700, 1200]
    segs = [encode_postings(doc_ids[a:b], tfs[a:b], dls[a:b], codec="for")
            for a, b in zip(cuts, cuts[1:])]
    merged = merge_segments(segs)
    pm, pw = decode_postings(merged), decode_postings(whole)
    np.testing.assert_array_equal(pm.doc_ids, pw.doc_ids)
    np.testing.assert_array_equal(pm.tfs, pw.tfs)
    sub = decode_postings(merged, block_idx=np.array([1, 3]))
    assert sub.doc_ids.size and (np.isin(sub.doc_ids, pw.doc_ids)).all()


def test_for_mixed_codec_merge_rejected():
    doc_ids, tfs, dls = _mk(300, seed=2)
    s1 = encode_postings(doc_ids[:150], tfs[:150], dls[:150])
    s2 = encode_postings(doc_ids[150:], tfs[150:], dls[150:], codec="for")
    with pytest.raises(ValueError, match="mixed-codec"):
        merge_segments([s1, s2])


@settings(deadline=None, max_examples=60)
@given(st.lists(st.tuples(st.integers(1, 2**33), st.integers(1, 2**17)),
                min_size=1, max_size=400))
def test_for_roundtrip_property(pairs):
    gaps = np.array([g for g, _ in pairs], dtype=np.int64)
    tfs = np.array([t for _, t in pairs], dtype=np.int64)
    doc_ids = np.cumsum(gaps).astype(np.int64)
    dls = np.maximum(tfs, 1)
    v2 = encode_postings(doc_ids, tfs, dls, codec="for")
    pl = decode_postings(v2)
    np.testing.assert_array_equal(pl.doc_ids, doc_ids)
    np.testing.assert_array_equal(pl.tfs, tfs)


def test_for_batch_matches_single():
    from maestro_spark.functions.codec import encode_postings_batch
    rng = np.random.default_rng(11)
    runs = []
    for i in range(25):
        n = int(rng.integers(1, 400))
        ids = np.cumsum(rng.integers(1, 30, n)).astype(np.int64)
        tfs = rng.integers(1, 5, n).astype(np.int64)
        dls = rng.integers(5, 500, n).astype(np.int64)
        runs.append((ids, tfs, dls))
    docs = np.concatenate([r[0] for r in runs])
    tfs = np.concatenate([r[1] for r in runs])
    dls = np.concatenate([r[2] for r in runs])
    starts = np.concatenate(
        ([0], np.cumsum([r[0].size for r in runs])[:-1]))
    out = encode_postings_batch(docs, tfs, dls, starts, codec="for")
    for i, (ids_i, tfs_i, dls_i) in enumerate(runs):
        ref = encode_postings(ids_i, tfs_i, dls_i, codec="for")
        assert out["doc_bytes"][i] == ref["doc_bytes"], i
        assert out["tf_bytes"][i] == ref["tf_bytes"], i
        for k in ("block_n", "block_doc_first", "block_doc_width",
                  "block_doc_base", "block_tf_width", "block_tf_base",
                  "block_doc_off", "block_tf_off", "block_last_doc"):
            assert np.asarray(out[k][i]).tolist() == list(ref[k]), (i, k)


def test_for_positions_split_regions():
    """FOR prox stream: per-doc absolute firsts and in-doc gaps pack in
    separate per-block regions with independent widths — a doc's large
    first position can't widen the gap region. Uniform streams pack to
    zero bytes."""
    from maestro_spark.functions.codec import decode_positions
    rng = np.random.default_rng(13)
    n = 900
    doc_ids = np.cumsum(rng.integers(1, 30, n)).astype(np.int64)
    tfs = rng.integers(1, 5, n).astype(np.int64)
    dls = rng.integers(5, 4000, n).astype(np.int64)
    # firsts up to ~4000 (w12 territory), gaps 1-3 (w2)
    pos = np.concatenate([
        int(rng.integers(0, 4000)) + np.cumsum(rng.integers(1, 4, t))
        for t in tfs]).astype(np.int64)
    v1 = encode_postings(doc_ids, tfs, dls, positions=pos)
    v2 = encode_postings(doc_ids, tfs, dls, positions=pos, codec="for")
    for blocks in (None, np.array([0]),
                   np.arange(len(v2["block_doc_off"]))):
        a, b = decode_positions(v1, blocks), decode_positions(v2, blocks)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
    assert max(v2["block_posg_width"]) <= 2   # gaps never inherit w12
    # uniform positions -> zero-byte prox stream
    z = encode_postings(np.arange(500, dtype=np.int64),
                        np.ones(500, np.int64), np.full(500, 9, np.int64),
                        positions=np.zeros(500, np.int64), codec="for")
    assert len(z["pos_bytes"]) == 0
    p, t = decode_positions(z)
    assert p.size == 500 and (p == 0).all()


@pytest.mark.parametrize("maxval,width", [(3, 2), (200, 8), (4000, 12),
                                          (60000, 16), (10**7, 24),
                                          (2**40, 64)])
def test_for_width_snap_kernels(maxval, width):
    from maestro_spark.functions.codec import (_pack_blocks,
                                               _unpack_blocks,
                                               _snap_width)
    rng = np.random.default_rng(maxval % 97)
    vals = rng.integers(0, maxval + 1, 777).astype(np.int64)
    vals[5] = maxval  # pin the max
    w = _snap_width(np.array([maxval]))
    assert int(w[0]) == width
    starts = np.array([0, 300, 700])
    counts = np.array([300, 400, 77])
    widths = np.repeat(w, 3)
    stream, blen = _pack_blocks(vals, starts, counts, widths)
    off = np.concatenate(([0], np.cumsum(blen)))[:-1]
    out = _unpack_blocks(stream, off, counts, widths,
                         np.zeros(3, np.int64))
    np.testing.assert_array_equal(out, vals)
