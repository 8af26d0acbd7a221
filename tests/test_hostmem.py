"""hostmem: hugepage-backed allocation + O_DIRECT checkpoint IO.

These guard byte-identity of the fast paths (the perf claims live in the
README); the fallbacks make behavior identical on hosts without O_DIRECT
or hugepages, so correctness here covers both."""

import os

import numpy as np
import pytest

from niqki_tpu import hostmem
from niqki_tpu.index import SketchIndex
from niqki_tpu.params import SketchParams


def test_big_empty_shapes_and_write():
    for shape, dt in [((3, 5), np.int32), (7, np.int16),
                      ((1200, 4096), np.int32)]:  # > 2MB: mmap path
        a = hostmem.big_empty(shape, dt)
        assert a.shape == (shape if isinstance(shape, tuple) else (shape,))
        assert a.dtype == dt
        a[...] = 3  # must be writable
        assert (a == 3).all()


def test_big_copy_downcast():
    rng = np.random.default_rng(0)
    m = rng.integers(0, 1 << 14, (700, 1024), np.int32)
    c = hostmem.big_copy(m, np.int16)
    assert c.dtype == np.int16
    assert np.array_equal(c, m.astype(np.int16))


@pytest.mark.parametrize("n_bytes", [0, 100, 4096, 4096 * 300 + 17])
def test_direct_roundtrip(tmp_path, n_bytes):
    rng = np.random.default_rng(n_bytes)
    a = rng.integers(0, 256, n_bytes, np.uint8)
    src = hostmem.big_empty(n_bytes, np.uint8)
    src[:] = a
    p = str(tmp_path / "x.bin")
    hostmem.write_direct(p, src)
    assert os.path.getsize(p) == n_bytes
    assert np.array_equal(np.fromfile(p, np.uint8), a)
    dst = hostmem.big_empty(n_bytes, np.uint8)
    dst[:] = 0
    hostmem.read_direct(p, dst)
    assert np.array_equal(dst, a)


def test_direct_unaligned_buffer_falls_back(tmp_path):
    a = np.arange(4096 * 2 + 3, dtype=np.uint8)[3:]  # misaligned view
    p = str(tmp_path / "y.bin")
    hostmem.write_direct(p, a)
    assert np.array_equal(np.fromfile(p, np.uint8), a)
    dst = np.empty_like(a)
    hostmem.read_direct(p, dst)
    assert np.array_equal(dst, a)


def test_truncated_shard_raises(tmp_path):
    """A checkpoint shard truncated by a crash must fail the load — raw v2
    blocks have no CRC, and fingerprint 0 is valid, so a silent zero-fill
    would count against garbage rows."""
    import os
    import pytest
    p = SketchParams(lF=12)
    idx = SketchIndex(p)
    rng = np.random.default_rng(7)
    for i in range(8):
        idx.insert_sketch(rng.integers(-1, 1 << p.W, p.F, np.int32), f"g{i}")
    d = str(tmp_path / "ck")
    idx.save_sharded(d, num_shards=2, compress=False)
    shard = os.path.join(d, "shard_00001.bin")
    os.truncate(shard, os.path.getsize(shard) - 4096)
    with pytest.raises(OSError, match="short"):
        SketchIndex.load_sharded(d)


def test_sharded_checkpoint_uses_direct_io(tmp_path):
    """Uncompressed sharded checkpoints roundtrip byte-identically through
    the O_DIRECT path (small F exercises the unaligned-tail fallback too)."""
    for lF in (6, 12):   # 256 B rows (unaligned) and 16 KB rows (aligned)
        p = SketchParams(lF=lF)
        idx = SketchIndex(p)
        rng = np.random.default_rng(lF)
        for i in range(37):
            idx.insert_sketch(
                rng.integers(-1, 1 << p.W, p.F, np.int32), f"g{i}")
        d = str(tmp_path / f"ck{lF}")
        idx.save_sharded(d, num_shards=3, compress=False)
        idx2 = SketchIndex.load_sharded(d)
        assert idx2.names == idx.names
        assert np.array_equal(idx2.matrix(), idx.matrix())
