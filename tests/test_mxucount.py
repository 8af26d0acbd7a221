"""MXU one-hot-matmul count route (ops/mxucount): exactness vs the dense
reference compare, sentinel semantics, and the NIQKI_TPU_COUNT=mxu routing.

The on-chip throughput verdict (114x slower than bcount — structural, see
the module docstring) is measured by tools/mxu_probe.py; these tests pin
the parity contract that makes the verdict meaningful.
"""

import numpy as np

from niqki_tpu.ops import mxucount


def _ref_counts(q, g):
    return (q[:, None, :] == g[None, :, :]).sum(-1, dtype=np.int32)


def test_mxu_counts_match_dense():
    rng = np.random.default_rng(21)
    W, F, G, Q = 12, 64, 130, 5          # F spans multiple FC blocks
    g = rng.integers(0, 1 << W, size=(G, F)).astype(np.int32)
    q = rng.integers(0, 1 << W, size=(Q, F)).astype(np.int32)
    q[0] = g[3]
    got = mxucount.match_counts_mxu(q, g, W)
    np.testing.assert_array_equal(got, _ref_counts(q, g))
    assert got[0, 3] == F


def test_mxu_sentinels_never_match():
    W, F = 12, 32
    g = np.zeros((4, F), np.int32)
    g[1] = -2
    q = np.zeros((2, F), np.int32)
    q[1] = -3
    got = mxucount.match_counts_mxu(q, g, W)
    assert got[0, 0] == F and got[0, 1] == 0
    assert got[1, 0] == 0 and got[1, 1] == 0


def test_mxu_tile_boundaries():
    """Q and G crossing Q_TILE/G_TILE boundaries assemble correctly."""
    rng = np.random.default_rng(22)
    W, F = 12, 16
    Q = mxucount.Q_TILE + 3
    G = 70
    g = rng.integers(0, 1 << W, size=(G, F)).astype(np.int32)
    q = rng.integers(0, 1 << W, size=(Q, F)).astype(np.int32)
    q[mxucount.Q_TILE + 1] = g[69]
    got = mxucount.match_counts_mxu(q, g, W)
    np.testing.assert_array_equal(got, _ref_counts(q, g))


def test_index_counts_mxu_routing(monkeypatch):
    """SketchIndex.counts via NIQKI_TPU_COUNT=mxu equals the XLA route."""
    from niqki_tpu import SketchIndex, SketchParams
    rng = np.random.default_rng(23)
    p = SketchParams(lF=6, K=21)         # F=64: keep the 2^W one-hots tiny
    idx = SketchIndex(p)
    for i in range(5):
        sk = rng.integers(0, p.fingerprint_range, p.F).astype(np.int32)
        sk[rng.choice(p.F, 3, replace=False)] = -1
        idx.insert_sketch(sk, f"g{i}")
    q = idx.matrix()[:2].copy()
    monkeypatch.setenv("NIQKI_TPU_COUNT", "xla")
    want = idx.counts(q)
    monkeypatch.setenv("NIQKI_TPU_COUNT", "mxu")
    got = idx.counts(q)
    np.testing.assert_array_equal(got, want)
