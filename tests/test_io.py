import gzip

import numpy as np

from niqki_tpu.dumpfmt import load_dump, save_dump
from niqki_tpu.io.fasta import data_type_of, read_fof, read_records
from niqki_tpu.params import SketchParams
from niqki_tpu.io.writers import format_double


def test_data_type_of():
    assert data_type_of("x.fa.gz") == "A"
    assert data_type_of("x.fq") == "Q"
    assert data_type_of("x.fastq.gz") == "Q"
    assert data_type_of("my.fquirky.fa") == "Q"  # substring quirk, as reference


def test_read_multiline_fasta(fixtures):
    recs = list(read_records(str(fixtures / "tiny3.fa"), 31))
    assert len(recs) == 1
    assert recs[0][0] == ">tiny3"
    assert len(recs[0][1]) == 250


def test_read_fastq(fixtures):
    recs = list(read_records(str(fixtures / "tiny.fq"), 31))
    assert len(recs) == 3
    assert recs[0][0] == "@read0"
    assert all(len(s) == 120 for _, s in recs)


def test_length_filter(tmp_path):
    f = tmp_path / "t.fa"
    f.write_text(">a\n" + "A" * 31 + "\n>b\n" + "A" * 32 + "\n")
    recs = list(read_records(str(f), 31))
    assert [h for h, _ in recs] == [">b"]  # len == K is dropped, len > K kept


def test_read_fof(tmp_path):
    f = tmp_path / "fof.txt"
    f.write_text("abc.fa\nxy\n\nlonger/path.fa.gz\n")
    assert read_fof(str(f)) == ["abc.fa", "longer/path.fa.gz"]


def test_dump_roundtrip(tmp_path):
    p = SketchParams(lF=4, W=8, H=3)
    rng = np.random.default_rng(1)
    sk = rng.integers(0, p.fingerprint_range, size=(5, p.F)).astype(np.int32)
    path = str(tmp_path / "d.bin")
    save_dump(path, p, sk, [f"g{i}" for i in range(5)])
    hdr, sk2, names = load_dump(path)
    assert (hdr.lF, hdr.K, hdr.W, hdr.H) == (4, 31, 8, 3)
    np.testing.assert_array_equal(sk, sk2)
    assert names == [f"g{i}" for i in range(5)]


def test_truncated_dump_raises(tmp_path, monkeypatch):
    """A dump cut mid-bucket-stream must raise, not load a silently
    incomplete index (both the native scanner and the numpy fallback)."""
    import pytest
    from niqki_tpu import native
    p = SketchParams(lF=4, W=8, H=3)
    rng = np.random.default_rng(2)
    sk = rng.integers(0, p.fingerprint_range, size=(5, p.F)).astype(np.int32)
    path = str(tmp_path / "d.bin")
    save_dump(path, p, sk, [f"g{i}" for i in range(5)])
    raw = gzip.open(path, "rb").read()
    cut = str(tmp_path / "cut.bin")
    with gzip.open(cut, "wb") as f:
        f.write(raw[:len(raw) // 2])     # inside the bucket stream
    with pytest.raises(ValueError, match="truncated dump"):
        load_dump(cut)
    monkeypatch.setattr(native, "available", lambda: False)
    with pytest.raises(ValueError, match="truncated dump"):
        load_dump(cut)


def test_dump_matches_reference_bytes(fixtures, tmp_path):
    """Re-serializing a reference dump reproduces it byte-for-byte."""
    path = str(fixtures / "dump_tiny_s5.bin")
    hdr, sk, names = load_dump(path)
    out = str(tmp_path / "_tmp_redump.bin")
    save_dump(out, hdr.params(), sk, names)
    a = gzip.open(path, "rb").read()
    b = gzip.open(out, "rb").read()
    assert a == b


def test_format_double():
    assert format_double(1.0) == "1"
    assert format_double(0.0) == "0"
    assert format_double(0.8720703125) == "0.87207"
    assert format_double(0.967773437) == "0.967773"
    assert format_double(0.5) == "0.5"


def test_sharded_checkpoint_preserves_stale_constants(tmp_path):
    """A -G-tuned index must reload with the same fingerprint constants."""
    import numpy as np
    from niqki_tpu import SketchIndex, SketchParams

    p = SketchParams(lF=5).with_best_H(1e8)   # H=5, stale mask/rem from H=4
    assert p.stale_mask_M is not None
    idx = SketchIndex(p, backend="numpy")
    idx.insert_sketch(np.arange(p.F, dtype=np.int32), "g0")
    idx.save_sharded(str(tmp_path / "ck"), 2)
    back = SketchIndex.load_sharded(str(tmp_path / "ck"), backend="numpy")
    q = back.params
    assert (q.H, q.mask_M, q.maximal_remainder) == \
        (p.H, p.mask_M, p.maximal_remainder)
    assert np.array_equal(back.matrix(), idx.matrix())


def test_binary_hits_layout(tmp_path):
    """Binary hits bytes: name, newline, uint32 nhits, per hit uint32 gid
    then uint32 count (the reference's dead-via-CLI format, kept for
    library parity)."""
    import gzip
    import struct
    from niqki_tpu.io.writers import GzTextWriter, write_binary_hits

    path = tmp_path / "b.gz"
    with GzTextWriter(str(path)) as out:
        write_binary_hits(out, "queryX", [(7, 2), (5, 0)])
    raw = gzip.open(path).read()
    assert raw.startswith(b"queryX\n")
    body = raw[len(b"queryX\n"):]
    nhits, g0, c0, g1, c1 = struct.unpack("<5I", body)
    assert (nhits, g0, c0, g1, c1) == (2, 2, 7, 0, 5)


def test_gz_writer_members_decompress_identically(tmp_path):
    """GzTextWriter's multi-member stream (libdeflate members when the
    native lib is built, zlib otherwise) must decompress to exactly the
    written bytes across member boundaries, mixed write granularities,
    mutable buffers, and the empty-file single-member case — and every
    member must be a valid standalone gzip stream cut at exactly BLOCK
    input bytes (the deterministic-boundary contract)."""
    import gzip
    import zlib
    import numpy as np
    from niqki_tpu import native
    from niqki_tpu.io.writers import GzTextWriter

    rng = np.random.default_rng(11)
    parts = [bytes(rng.integers(32, 127, rng.integers(1, 200_000),
                                dtype=np.uint8)) for _ in range(99)]
    parts.append(bytearray(b"mutable-buffer-coerced-to-bytes\n"))
    want = b"".join(bytes(s) for s in parts)
    path = tmp_path / "mm.gz"
    with GzTextWriter(str(path), level=1) as out:
        for s in parts:
            out.write(s)
    raw = path.read_bytes()
    assert gzip.decompress(raw) == want
    # count the members and check each inflates to exactly BLOCK bytes
    # (bar the tail): boundaries must not depend on write() granularity
    sizes, off = [], 0
    while off < len(raw):
        d = zlib.decompressobj(31)
        body = d.decompress(raw[off:])
        sizes.append(len(body))
        off = len(raw) - len(d.unused_data)
    assert sum(sizes) == len(want)
    assert all(s == GzTextWriter.BLOCK for s in sizes[:-1])

    empty = tmp_path / "empty.gz"
    with GzTextWriter(str(empty)) as out:
        pass
    assert gzip.decompress(empty.read_bytes()) == b""

    if native.available():
        # the native one-shot member compressor round-trips on its own
        for data in (b"", want[: 1 << 20]):
            for lvl in (1, 6, 9):
                m = native.gzip_member(data, lvl)
                assert m is not None and gzip.decompress(m) == data


def test_sharded_checkpoint_raw_and_legacy_v1(tmp_path):
    """compress=False writes raw row blocks; v1 npz checkpoints still load."""
    import json
    import numpy as np
    from niqki_tpu import SketchIndex, SketchParams

    p = SketchParams(lF=5)
    idx = SketchIndex(p, backend="numpy")
    for g in range(5):
        idx.insert_sketch(np.arange(p.F, dtype=np.int32) + g, f"g{g}")
    ck = tmp_path / "raw"
    idx.save_sharded(str(ck), 3, compress=False)
    back = SketchIndex.load_sharded(str(ck), backend="numpy")
    assert back.names == idx.names
    assert np.array_equal(back.matrix(), idx.matrix())

    # hand-built legacy v1 layout (what round-1 checkpoints look like)
    v1 = tmp_path / "v1"
    v1.mkdir()
    np.savez(v1 / "shard_00000.npz", sketches=idx.matrix(),
             names=np.array(idx.names, dtype=object))
    (v1 / "manifest.json").write_text(json.dumps({
        "format": "niqki_tpu.sharded.v1",
        "params": {"lF": p.lF, "K": p.K, "W": p.W, "H": p.H,
                   "min_fract": p.min_fract, "stale_mask_M": None,
                   "stale_maximal_remainder": None},
        "genomes": 5,
        "shards": [{"file": "shard_00000.npz", "lo": 0, "hi": 5}],
    }))
    old = SketchIndex.load_sharded(str(v1), backend="numpy")
    assert old.names == idx.names
    assert np.array_equal(old.matrix(), idx.matrix())
