"""Native C++ host runtime vs the pure-Python implementations, bit-for-bit.

The native library (native/niqki_host.cpp) re-implements the host hot path:
gzip decode + FASTA/FASTQ parse + 2-bit encode, plus densification and a
rolling CPU sketcher. Each must agree exactly with io.fasta/oracle, which are
themselves parity-tested against the reference binary's golden outputs.
"""

import numpy as np
import pytest

from niqki_tpu import native, oracle
from niqki_tpu.io.fasta import read_records
from niqki_tpu.params import SketchParams

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

FIXDIR = __file__.rsplit("/", 1)[0] + "/fixtures"
ECOLI = "/root/reference/resources/ecoli01p.fa.gz"
needs_ref = pytest.mark.skipif(not __import__("os").path.exists(ECOLI),
                               reason="reference resources not mounted")


def _python_records(path, K):
    for header, seq in read_records(path, K):
        ef, er = oracle.encode_record(seq, K)
        yield header, ef, er


@pytest.mark.parametrize("path,K", [
    (FIXDIR + "/tiny1.fa", 21),
    (FIXDIR + "/multi.fa", 21),
    (FIXDIR + "/tiny.fq", 21),
    pytest.param(ECOLI, 31, marks=needs_ref),
])
def test_reader_matches_python(path, K):
    nat = list(native.read_encoded_records(path, K))
    ref = list(_python_records(path, K))
    assert len(nat) == len(ref)
    for (nh, nf, nr), (rh, rf, rr) in zip(nat, ref):
        assert nh == rh
        assert np.array_equal(nf, rf)
        assert np.array_equal(nr, rr)


@pytest.mark.parametrize("path,K", [
    (FIXDIR + "/tiny1.fa", 21),
    (FIXDIR + "/multi.fa", 21),
    pytest.param(ECOLI, 31, marks=needs_ref),
])
def test_packed_reader_matches_python_packer(path, K):
    from niqki_tpu.ops.sketch import pack_codes
    nat = list(native.read_packed_records(path, K))
    ref = list(_python_records(path, K))
    assert len(nat) == len(ref)
    for (nh, nw, nn, ne), (rh, rf, rr) in zip(nat, ref):
        ww, n, exc = pack_codes(rf, rr, K)
        assert nh == rh and nn == n
        assert np.array_equal(nw, ww)
        assert np.array_equal(ne, exc)


def test_packed_reader_vectorized_packer_adversarial(tmp_path):
    """The AVX-512 pack body (64 chars/iteration, 128-entry vpermi2b LUT,
    4-compare exception mask) vs the Python packer on adversarial content:
    bytes >= 0x80 (which alias low-7 LUT slots and must still code 0 +
    exception), lowercase acgt, digits/symbols, and record lengths that
    land exactly on/around the 64-char vector boundary and the 16-char
    alignment head."""
    from niqki_tpu.ops.sketch import pack_codes
    rng = np.random.default_rng(23)
    K = 21
    alphabet = np.frombuffer(b"ACGTacgtNnRy0>\x80\xc1\xc3\xd4\xff\x01", np.uint8)
    f = tmp_path / "adv.fa"
    lens = [K + 1, 63, 64, 65, 64 + 15, 64 + 16, 64 + 17, 127, 128, 129,
            int(rng.integers(200, 5000))]
    with open(f, "wb") as fh:
        for i, ln in enumerate(lens):
            # first body char pinned: a leading '>' would (correctly, on
            # both sides) start a new record and shift the census
            body = b"A" + rng.choice(alphabet, ln - 1).tobytes()
            fh.write(b">r%d\n" % i + body + b"\n")
    nat = list(native.read_packed_records(str(f), K))
    ref = list(_python_records(str(f), K))
    assert len(nat) == len(ref) == len(lens)
    for (nh, nw, nn, ne), (rh, rf, rr) in zip(nat, ref):
        ww, n, exc = pack_codes(rf, rr, K)
        assert nh == rh and nn == n
        assert np.array_equal(nw, ww)
        assert np.array_equal(ne, exc)


def test_packed_roundtrip_with_exceptions():
    """Non-ACGT and lowercase characters: the packed wire format plus the
    exception list must reproduce the exact eff_fwd/eff_rc arrays."""
    from niqki_tpu.ops.sketch import pack_codes
    K = 9
    seq = b"ACGTNNGTACGTacgtACGTRYKMGGGGTTTTCCCCNAAA" * 4
    ef, er = oracle.encode_record(seq, K)
    words, n, exc = pack_codes(ef, er, K)
    codes = np.zeros(len(words) * 16, np.uint8)
    for j in range(16):
        codes[j::16] = (words >> np.uint32(2 * j)) & 3
    codes = codes[:n]
    assert np.array_equal(codes, ef)
    rc = (3 - codes).astype(np.uint8)
    rc[exc] = 0
    assert np.array_equal(rc, er)


def test_densify_matches_oracle():
    p = SketchParams(lF=8)
    rng = np.random.default_rng(0)
    for density in (0.1, 0.5, 0.9, 0.99):
        sk = rng.integers(0, p.fingerprint_range, p.F).astype(np.int32)
        sk[rng.random(p.F) > density] = -1
        if (sk == -1).all():
            sk[0] = 7
        a = sk.copy()
        b = sk.copy()
        oracle.densify(a, p)
        native.densify(b)
        assert np.array_equal(a, b)


def test_cpu_sketcher_matches_oracle():
    p = SketchParams(lF=7, K=21)
    rng = np.random.default_rng(1)
    seq = bytes(rng.choice(list(b"ACGTNacgt"), 5000))
    ef, er = oracle.encode_record(seq, p.K)
    table = native.sketch_codes_cpu(ef, er, p.lF, p.K, p.W, p.H)
    # oracle path
    fwd, rc = oracle.kmers_from_codes(ef, er, p.K)
    canon = np.minimum(fwd, rc)
    slot, fp = oracle.slots_and_fingerprints(canon, p)
    want = np.full(p.F, np.iinfo(np.int32).max, np.int64)
    np.minimum.at(want, slot, fp)
    assert np.array_equal(table.astype(np.int64), want)


@needs_ref
def test_cpu_sketcher_whole_genome():
    p = SketchParams(lF=10, K=31)
    (_, ef, er), = native.read_encoded_records(ECOLI, p.K)
    table = native.sketch_codes_cpu(ef, er, p.lF, p.K, p.W, p.H)
    sk = np.where(table == np.iinfo(np.int32).max, -1, table).astype(np.int32)
    native.densify(sk)
    want = oracle.sketch_records(
        [s for _, s in read_records(ECOLI, p.K)], p)
    assert np.array_equal(sk, want)


def test_densify_matches_oracle_randomized():
    """The by-distinct-value densify reduction vs the oracle's literal
    sequential scan, across fill densities, duplicate-heavy values, zeros
    (the pinned-probe case), and multiple F/W shapes."""
    rng = np.random.default_rng(42)
    for trial in range(120):
        lF = int(rng.integers(3, 9))
        W = int(rng.integers(4, 15))
        p = SketchParams(lF=lF, W=W, K=31, H=4)
        nfill = int(rng.integers(0, p.F + 1))
        sk = np.full(p.F, -1, np.int32)
        if nfill:
            slots = rng.choice(p.F, nfill, replace=False)
            vals = (rng.integers(0, 4, nfill) if rng.random() < 0.3
                    else rng.integers(0, 1 << W, nfill))
            sk[slots] = vals
        a, b = sk.copy(), sk.copy()
        native.densify(a)
        oracle.densify(b, p)
        assert np.array_equal(a, b), (trial, lF, W, nfill)


def test_count_eq_matches_numpy_backend():
    """Host equality counts vs the numpy-backend path, including
    out-of-range fingerprints on both sides (query side is sanitized
    inside nq_count_eq; stored side by index._stored)."""
    from niqki_tpu.index import SketchIndex
    rng = np.random.default_rng(7)
    p = SketchParams(lF=7, W=10)
    idx = SketchIndex(p, backend="numpy")
    for g in range(23):
        sk = rng.integers(-1, p.fingerprint_range + 100, p.F).astype(np.int32)
        idx.insert_sketch(sk, f"g{g}")
    q = rng.integers(-5, p.fingerprint_range + 100, (61, p.F)).astype(np.int32)
    want = idx.counts(q)
    got = native.count_eq(q, idx._stored(), p.fingerprint_range)
    assert np.array_equal(want, got)


def test_hits_formatter_matches_python_writer():
    """nq_format_hits vs write_pretty_hits + hits_from_counts_batch,
    byte-for-byte (ordering: count desc then gid desc; %.6g floats;
    trailing space before newline)."""
    from niqki_tpu.index import hits_from_counts_batch
    from niqki_tpu.io.writers import write_pretty_hits

    class Buf:
        def __init__(self):
            self.b = bytearray()

        def write(self, s):
            self.b += s.encode() if isinstance(s, str) else s

    rng = np.random.default_rng(3)
    for trial in range(25):
        B = int(rng.integers(1, 40))
        G = int(rng.integers(1, 30))
        F = int(2 ** rng.integers(3, 16))
        ms = int(rng.integers(0, F // 2 + 1))
        counts = rng.integers(0, F + 1, (B, G)).astype(np.int32)
        names = [f"genome_{i}.fa.gz" for i in range(G)]
        headers = [f"@read{i}/xx" for i in range(B)]
        ref = Buf()
        for h, hits in zip(headers, hits_from_counts_batch(counts, ms)):
            write_pretty_hits(ref, h, hits, names, F)
        fmt = native.HitsFormatter(names, F, ms)
        assert bytes(ref.b) == fmt.format(counts, headers), trial


@pytest.mark.parametrize("path,K", [
    (FIXDIR + "/tiny1.fa", 21),
    (FIXDIR + "/multi.fa", 21),
    (FIXDIR + "/tiny.fq", 21),
    pytest.param(ECOLI, 31, marks=needs_ref),
])
def test_chunked_reader_matches_per_record(path, K):
    a = list(native.read_packed_records(path, K))
    for max_records in (1, 3, 1 << 15):
        b = list(native.read_packed_records_chunked(
            path, K, max_records=max_records))
        assert len(a) == len(b)
        for (h1, w1, n1, e1), (h2, w2, n2, e2) in zip(a, b):
            assert h1 == h2 and n1 == n2
            assert np.array_equal(w1, w2) and np.array_equal(e1, e2)


def test_sketch_packed_whole_matches_oracle():
    """Host whole-file sketcher (per-record min-merge + densify-after-each,
    the reference's compute_sketch accumulation) vs oracle.sketch_records,
    including multi-record files and non-ACGT characters."""
    from niqki_tpu.ops.sketch import pack_codes
    rng = np.random.default_rng(11)
    p = SketchParams(lF=8, K=21)
    for trial in range(10):
        n_rec = int(rng.integers(1, 5))
        seqs = ["".join(rng.choice(list("ACGTNacgt"), rng.integers(30, 3000)))
                for _ in range(n_rec)]
        recs = [pack_codes(*oracle.encode_record(s, p.K), p.K) for s in seqs]
        got = native.sketch_packed_whole(recs, p.lF, p.K, p.W, p.H)
        want = oracle.sketch_records(seqs, p)
        assert np.array_equal(got, want), trial


def test_sketch_packed_whole_mt_matches_single_thread():
    """The multithreaded whole-file sketcher (per-record window range split
    across C++ threads, chunked roll + per-slot min-merge) is bit-identical
    to the single-thread path — records long enough to actually chunk
    (> 2^19 windows/thread), multi-record accumulation, non-ACGT bases,
    and thread counts past the chunk cap."""
    from niqki_tpu.ops.sketch import pack_codes
    rng = np.random.default_rng(17)
    for trial in range(4):
        K = int(rng.choice([5, 21, 31]))
        lF = int(rng.choice([4, 8, 12]))
        p = SketchParams(lF=lF, K=K)
        n_rec = int(rng.integers(1, 3))
        seqs = ["".join(rng.choice(list("ACGTN"),
                                   rng.integers(K + 1, 2_500_000),
                                   p=[.24, .24, .24, .24, .04]))
                for _ in range(n_rec)]
        recs = [pack_codes(*oracle.encode_record(s, p.K), p.K) for s in seqs]
        want = native.sketch_packed_whole(recs, p.lF, p.K, p.W, p.H)
        for threads in (2, 4, 16):
            got = native.sketch_packed_whole(recs, p.lF, p.K, p.W, p.H,
                                             threads=threads)
            assert np.array_equal(got, want), (trial, threads)


def test_host_sketch_route_env(monkeypatch, tmp_path):
    """NIQKI_TPU_SKETCH=host routes sketch_files/sketch_file through the
    native whole-file sketcher with identical results to the device route."""
    from niqki_tpu.index import SketchIndex
    rng = np.random.default_rng(13)
    paths = []
    for i in range(3):
        f = tmp_path / f"g{i}.fa"
        f.write_text(f">g{i}\n" +
                     "".join(rng.choice(list("ACGT"), 5000)) + "\n")
        paths.append(str(f))
    p = SketchParams(lF=7, K=21)
    monkeypatch.setenv("NIQKI_TPU_SKETCH", "device")
    want = SketchIndex(p).sketch_files(paths)
    monkeypatch.setenv("NIQKI_TPU_SKETCH", "host")
    got = SketchIndex(p).sketch_files(paths)
    for a, b in zip(want, got):
        assert np.array_equal(a, b)
