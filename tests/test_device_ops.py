"""Device kernels (u32-pair hashing, sketch, densify, count) vs the oracle."""

import numpy as np
import jax.numpy as jnp

from niqki_tpu import oracle
from niqki_tpu.ops import u32pair as u
from niqki_tpu.ops.sketch import sketch_codes, INT32_MAX
from niqki_tpu.ops.densify import densify_device
from niqki_tpu.ops.count import match_counts, match_counts_blocked
from niqki_tpu.params import SketchParams


def _pairs(x64):
    x64 = np.asarray(x64, np.uint64)
    return (x64 >> np.uint64(32)).astype(np.uint32), \
           (x64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def _join(hi, lo):
    return (np.asarray(hi, np.uint64) << np.uint64(32)) | np.asarray(lo, np.uint64)


def test_hash_pair_matches_uint64():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**64, size=4096, dtype=np.uint64)
    x[:4] = [0, 1, 2**32 - 1, 2**63]
    hi, lo = _pairs(x)
    rh, rl = u.revhash64_u32(jnp.asarray(hi), jnp.asarray(lo))
    uh, ul = u.unrevhash64_u32(jnp.asarray(hi), jnp.asarray(lo))
    np.testing.assert_array_equal(_join(rh, rl), oracle.revhash64(x))
    np.testing.assert_array_equal(_join(uh, ul), oracle.unrevhash64(x))


def test_umulhi32():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**32, size=2048, dtype=np.uint32)
    b = rng.integers(0, 2**32, size=2048, dtype=np.uint32)
    got = np.asarray(u.umulhi32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> np.uint64(32)
            ).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_clz64_pair():
    vals = np.array([0, 1, 2**31, 2**32 - 1, 2**32, 2**63, 2**64 - 1],
                    dtype=np.uint64)
    hi, lo = _pairs(vals)
    got = np.asarray(u.clz64_u32(jnp.asarray(hi), jnp.asarray(lo)))
    np.testing.assert_array_equal(got, oracle.clz64(vals))


def test_device_sketch_matches_oracle():
    p = SketchParams(lF=7, W=12, H=4, K=31)
    rng = np.random.default_rng(2)
    seq = bytes(rng.choice(list(b"ACGTacgtN"), 5000,
                           p=[.23] * 4 + [.015] * 4 + [.02]))
    eff_fwd, eff_rc = oracle.encode_record(seq, p.K)
    table = sketch_codes(eff_fwd, eff_rc, p)
    # oracle pre-densification table
    fwd, rc = oracle.kmers_from_codes(eff_fwd, eff_rc, p.K)
    canon = np.minimum(fwd, rc)
    slot, fp = oracle.slots_and_fingerprints(canon, p)
    want = np.full(p.F, np.iinfo(np.int32).max, np.int32)
    np.minimum.at(want, slot, fp)
    np.testing.assert_array_equal(table, want)


def test_device_densify_matches_oracle():
    p = SketchParams(lF=8)
    rng = np.random.default_rng(3)
    sk = np.full(p.F, -1, np.int32)
    pos = rng.choice(p.F, 40, replace=False)
    sk[pos] = rng.integers(0, p.fingerprint_range, 40)
    want = sk.copy()
    oracle.densify(want, p)
    dev_in = np.where(sk == -1, np.iinfo(np.int32).max, sk).astype(np.int32)
    got = np.asarray(densify_device(jnp.asarray(dev_in), lF=p.lF))
    got = np.where(got == np.iinfo(np.int32).max, -1, got)
    np.testing.assert_array_equal(got, want)


def test_match_counts():
    rng = np.random.default_rng(4)
    q = rng.integers(0, 7, size=(5, 64)).astype(np.int32)
    g = rng.integers(0, 7, size=(9, 64)).astype(np.int32)
    want = (q[:, None, :] == g[None, :, :]).sum(-1)
    np.testing.assert_array_equal(np.asarray(match_counts(q, g)), want)
    np.testing.assert_array_equal(
        np.asarray(match_counts_blocked(jnp.asarray(q), jnp.asarray(g),
                                        block_q=2)), want)


def test_full_device_pipeline_matches_reference_sketch(fixtures):
    """encode -> device sketch -> device densify == reference dump sketch."""
    from niqki_tpu.dumpfmt import load_dump
    from niqki_tpu.io.fasta import read_records
    hdr, sk_ref, names = load_dump(str(fixtures / "dump_tiny_s5.bin"))
    p = SketchParams(lF=5)
    for gid, name in enumerate(names):
        (_, seq), = list(read_records(str(fixtures / name), p.K))
        eff_fwd, eff_rc = oracle.encode_record(seq, p.K)
        table = sketch_codes(eff_fwd, eff_rc, p)
        dense = np.asarray(densify_device(jnp.asarray(table), lF=p.lF))
        dense = np.where(dense == np.iinfo(np.int32).max, -1, dense)
        np.testing.assert_array_equal(dense, sk_ref[gid], err_msg=name)
