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
