"""Checkpoint v3 (persisted bit-planes) + mesh-direct serving restart.

ShardedIndex.from_checkpoint must place each 'tp' shard's planes on its
owning device with no global host matrix, for both v3 (persisted planes)
and v2 (row ranges host-packed on the fly), and count identically to the
single-device engine. Also: np_pack_bitplanes is bit-identical with the
device pack, and load_sharded(mesh=...) keeps the host matrix lazy.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from niqki_tpu import SketchIndex, SketchParams
from niqki_tpu.ops import bcount
from niqki_tpu.parallel.mesh import make_mesh
from niqki_tpu.parallel.serving import ShardedIndex


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(dp=2, tp=4)


def _build_index(G=70, seed=5, lF=12):
    rng = np.random.default_rng(seed)
    p = SketchParams(lF=lF, K=21, min_fract=0.05)
    idx = SketchIndex(p)
    for i in range(G):
        sk = rng.integers(0, p.fingerprint_range, p.F).astype(np.int32)
        sk[rng.choice(p.F, 11, replace=False)] = -1   # empty slots
        idx.insert_sketch(sk, f"g{i}")
    return idx


def test_np_pack_bitplanes_matches_device_pack():
    rng = np.random.default_rng(6)
    W, F = 12, 4096
    m = rng.integers(-3, 1 << W, size=(130, F)).astype(np.int32)
    want = np.asarray(bcount.pack_bitplanes(jnp.asarray(m), W=W,
                                            query=False))
    got = bcount.np_pack_bitplanes(m, W, row_chunk=64)
    np.testing.assert_array_equal(got, want)


def test_native_pack_bitplanes_matches_numpy():
    """The AVX-512 nq_pack_bitplanes fast path is bit-identical with the
    pure-numpy tree pack, including the strided-view case the checkpoint
    loaders use (packing into a row slice of a bigger planes buffer)."""
    from niqki_tpu import native
    if not native.available():
        pytest.skip("native lib unavailable")
    from unittest import mock
    rng = np.random.default_rng(12)
    for (N, F, W) in [(130, 4096, 12), (64, 1024, 7), (37, 2048, 30)]:
        m = rng.integers(-3, 1 << W, size=(N, F)).astype(np.int32)
        got = bcount.np_pack_bitplanes(m, W)          # native route
        with mock.patch.object(native, "pack_bitplanes",
                               lambda *a: False):     # numpy route
            want = bcount.np_pack_bitplanes(m, W)
        np.testing.assert_array_equal(got, want)
        big = np.zeros((W + 1, N + 40, F // 32), np.uint32)
        assert native.pack_bitplanes(m, W, big[:, 9:9 + N])
        np.testing.assert_array_equal(big[:, 9:9 + N], want)
        assert not big[:, :9].any() and not big[:, 9 + N:].any()


@pytest.mark.parametrize("planes", [True, False])
def test_from_checkpoint_counts_match(tmp_path, mesh, planes):
    idx = _build_index()
    ck = str(tmp_path / "ck")
    idx.save_sharded(ck, num_shards=3, compress=False, planes=planes)
    srv = ShardedIndex.from_checkpoint(ck, mesh)
    assert srv.G == idx.G and srv.names == idx.names
    q = idx.matrix()[:5].copy()
    q[1, ::7] = -3
    got = srv.counts(q)
    want = idx.counts(q)
    np.testing.assert_array_equal(got, want)


def test_from_checkpoint_gz_rows(tmp_path, mesh):
    """v2 compressed row shards still load mesh-direct (whole-shard
    inflate, no ranged IO)."""
    idx = _build_index(G=40, seed=8)
    ck = str(tmp_path / "ckgz")
    idx.save_sharded(ck, num_shards=2, compress=True)
    srv = ShardedIndex.from_checkpoint(ck, mesh)
    q = idx.matrix()[:3]
    np.testing.assert_array_equal(srv.counts(q), idx.counts(q))


def test_load_sharded_mesh_lazy_matrix(tmp_path, mesh):
    idx = _build_index(G=33, seed=9)
    ck = str(tmp_path / "cklazy")
    idx.save_sharded(ck, num_shards=2, compress=False, planes=True)
    idx2 = SketchIndex.load_sharded(ck, mesh=mesh)
    assert idx2._mat is None and idx2._sharded is not None
    assert idx2.G == 33
    # serving works without ever touching the host matrix
    q = idx.matrix()[:2]
    np.testing.assert_array_equal(idx2._sharded.counts(q), idx.counts(q))
    assert idx2._mat is None
    # matrix() materializes lazily and matches
    np.testing.assert_array_equal(idx2.matrix(), idx.matrix())


def test_v3_roundtrip_via_load_sharded(tmp_path):
    """A v3 checkpoint loads through the plain (host) loader too — the
    planes files are additive."""
    idx = _build_index(G=12, seed=10)
    ck = str(tmp_path / "ckv3")
    idx.save_sharded(ck, num_shards=2, compress=False, planes=True)
    assert os.path.exists(os.path.join(ck, "planes_00000.bin"))
    idx2 = SketchIndex.load_sharded(ck)
    np.testing.assert_array_equal(idx2.matrix(), idx.matrix())
    assert idx2.names == idx.names
