"""Bit-plane count kernel (ops/bcount) vs the dense XLA reference counts.

Runs the Pallas kernel in interpret mode (CPU backend); the real-TPU parity
gate for the compiled kernel lives in bench.py.
"""

import numpy as np
import jax.numpy as jnp

from niqki_tpu.ops import bcount
from niqki_tpu.ops.count import match_counts


def _ref_counts(q, g):
    return (q[:, None, :] == g[None, :, :]).sum(-1, dtype=np.int32)


def test_pack_bitplanes_roundtrip():
    rng = np.random.default_rng(0)
    W = 12
    m = rng.integers(0, 1 << W, size=(4, 4096), dtype=np.int32)
    planes = np.asarray(bcount.pack_bitplanes(jnp.asarray(m), W=W,
                                              query=False))
    assert planes.shape == (W + 1, 4, 128)   # (planes, rows, packed-f)
    # reconstruct values from the planes
    rec = np.zeros_like(m)
    for p in range(W):
        for f in range(m.shape[1]):
            rec[:, f] |= (((planes[p][:, f // 32] >> (f % 32)) & 1)
                          << p).astype(np.int32)
    np.testing.assert_array_equal(rec, m)
    assert not planes[W].any()  # all valid


def test_bitplane_counts_match_dense():
    rng = np.random.default_rng(1)
    W, F, G, Q = 12, 4096, 256, 5
    g = rng.integers(0, 1 << W, size=(G, F)).astype(np.int32)
    q = rng.integers(0, 1 << W, size=(Q, F)).astype(np.int32)
    # force real collisions so counts are nonzero
    q[0] = g[3]
    q[1, :2048] = g[100, :2048]
    got = np.asarray(bcount.match_counts_bitplane(q, g, W, interpret=True))
    np.testing.assert_array_equal(got, _ref_counts(q, g))
    assert got[0, 3] == F and got[1, 100] >= 2048


def test_bitplane_sentinels_never_match():
    """Stored -2 (empty/out-of-range) and query -3 rows match nothing —
    including each other (reference: neither side puts them in buckets)."""
    W, F = 12, 4096
    g = np.zeros((128, F), np.int32)
    g[1] = -2
    q = np.zeros((2, F), np.int32)
    q[1] = -3
    got = np.asarray(bcount.match_counts_bitplane(q, g, W, interpret=True))
    assert got[0, 0] == F          # valid matches valid
    assert got[0, 1] == 0          # valid vs stored-invalid
    assert got[1, 0] == 0          # query-invalid vs valid
    assert got[1, 1] == 0          # query-invalid vs stored-invalid


def test_bitplane_wide_W():
    """W > 14 works (beyond pcount's int16 limit)."""
    rng = np.random.default_rng(2)
    W, F, G, Q = 16, 4096, 128, 3
    g = rng.integers(0, 1 << W, size=(G, F)).astype(np.int32)
    q = rng.integers(0, 1 << W, size=(Q, F)).astype(np.int32)
    q[2] = g[77]
    got = np.asarray(bcount.match_counts_bitplane(q, g, W, interpret=True))
    np.testing.assert_array_equal(got, _ref_counts(q, g))


def test_bitplane_row_and_query_padding():
    """G not a TILE_G multiple and Q not a BLOCK_Q multiple both pad away."""
    rng = np.random.default_rng(3)
    W, F, G, Q = 12, 4096, 130, 33
    g = rng.integers(0, 1 << W, size=(G, F)).astype(np.int32)
    q = rng.integers(0, 1 << W, size=(Q, F)).astype(np.int32)
    q[32] = g[129]
    got = np.asarray(bcount.match_counts_bitplane(q, g, W, interpret=True))
    assert got.shape == (Q, G)
    np.testing.assert_array_equal(got, _ref_counts(q, g))


def test_index_counts_bcount_routing(monkeypatch):
    """SketchIndex.counts through the bit-plane path (interpret mode) must
    equal the XLA path on real sketches, including sentinel slots."""
    from niqki_tpu import SketchIndex, SketchParams
    rng = np.random.default_rng(5)
    p = SketchParams(lF=12, K=21)      # F=4096
    idx = SketchIndex(p)
    for g in range(6):
        sk = rng.integers(0, p.fingerprint_range, p.F).astype(np.int32)
        sk[rng.choice(p.F, 17, replace=False)] = -1   # empty slots survive
        idx.insert_sketch(sk, f"g{g}")
    q = idx.matrix()[:3].copy()
    monkeypatch.setenv("NIQKI_TPU_COUNT", "xla")
    want = idx.counts(q)
    monkeypatch.setenv("NIQKI_TPU_COUNT", "bcount-interpret")
    idx._device_planes = None
    got = idx.counts(q)
    np.testing.assert_array_equal(got, want)


def test_bitplane_multi_chunk_F():
    """F large enough to span multiple CHUNK_LANES f-chunks accumulates."""
    rng = np.random.default_rng(4)
    W, F, G, Q = 12, 32768, 128, 2   # F/32 = 1024 lanes = 2 chunks of 512
    g = rng.integers(0, 1 << W, size=(G, F)).astype(np.int32)
    q = rng.integers(0, 1 << W, size=(Q, F)).astype(np.int32)
    q[0] = g[5]
    got = np.asarray(bcount.match_counts_bitplane(q, g, W, interpret=True))
    np.testing.assert_array_equal(got, _ref_counts(q, g))
    assert got[0, 5] == F


def test_pipelined_multiblock_matches_dense():
    """Q > 2*BLOCK_Q exercises the pipelined ship-thread path of
    match_counts_planes (overlapped per-block h2d + fused pack+count);
    results must be identical to the dense compare, including the padded
    tail block and sentinel queries inside the stream."""
    rng = np.random.default_rng(5)
    W, F, G = 12, 4096, 130
    Q = 2 * bcount.BLOCK_Q + 17          # 3 blocks, padded tail
    g = rng.integers(0, 1 << W, size=(G, F)).astype(np.int32)
    q = rng.integers(-4, 1 << W, size=(Q, F)).astype(np.int32)
    q[97] = g[77]                        # exact row match in block 2
    got = np.asarray(bcount.match_counts_bitplane(q, g, W, interpret=True))
    assert got.shape == (Q, G)
    np.testing.assert_array_equal(got, _ref_counts(q, g))
    assert got[97, 77] == F


import pytest


@pytest.mark.parametrize("wire", ["int16", "split"])
def test_wire_formats_match_dense(wire, monkeypatch):
    """Both query wire formats (NIQKI_TPU_WIRE) produce identical counts:
    the split wire (mantissa bytes + nibble exponents + validity bitmask,
    ops/bcount._split_wire_block) is a pure layout change."""
    monkeypatch.setenv("NIQKI_TPU_WIRE", wire)
    rng = np.random.default_rng(11)
    W, F, G = 12, 4096, 130
    Q = 2 * bcount.BLOCK_Q + 5
    g = rng.integers(0, 1 << W, size=(G, F)).astype(np.int32)
    q = rng.integers(-4, 1 << W, size=(Q, F)).astype(np.int32)
    q[3] = g[129]
    q[bcount.BLOCK_Q + 1] = -3            # whole-row sentinel in block 2
    got = np.asarray(bcount.match_counts_bitplane(q, g, W, interpret=True))
    np.testing.assert_array_equal(got, _ref_counts(np.where(q < 0, -9, q), g))
    assert got[3, 129] == F


def test_split_wire_block_roundtrip():
    """Host split -> device-side reconstruction is exact, sentinels included."""
    import jax.numpy as jnp
    rng = np.random.default_rng(12)
    W, F, B = 12, 4096, 3
    blk = rng.integers(0, 1 << W, size=(B, F)).astype(np.int16)
    blk[0, :7] = -3
    blk[2, ::3] = -3
    buf = bcount._split_wire_block(blk)
    assert buf.shape == (B * F + B * F // 2 + B * F // 8,)
    lo = buf[:B * F].reshape(B, F)
    nib = buf[B * F:B * F + B * F // 2].reshape(B, F // 2)
    mask = buf[B * F + B * F // 2:].reshape(B, F // 8)
    n = nib.astype(np.int32)
    exp = np.stack([n & 15, n >> 4], axis=-1).reshape(B, -1)
    m = mask.astype(np.int32)
    bits = np.stack([(m >> k) & 1 for k in range(8)], axis=-1).reshape(B, -1)
    rec = np.where(bits == 1, lo.astype(np.int32) | (exp << 8), -3)
    np.testing.assert_array_equal(rec, blk.astype(np.int32))
