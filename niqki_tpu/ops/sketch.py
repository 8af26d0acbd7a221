"""Device sketching: vectorized k-mer hashing + segmented min-reduction.

TPU-first redesign of the reference's sequential rolling loop
(/root/reference/src/niqki_index.cpp:335-358): a k-mer window is just a
weighted sum of 2-bit codes, so ALL windows are computed at once as uint32
pairs (no sequential state), hashed with the u32-pair xorshift-multiply
family, fingerprinted, and min-scattered into the F sketch slots.

The sketch table uses INT32_MAX as the "empty" sentinel on device (host code
converts to the reference's -1). Densification is inherently sequential and
value-dependent, so it stays on the host (oracle.densify / native ext).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import SketchParams
from . import u32pair as u

INT32_MAX = np.int32(np.iinfo(np.int32).max)


def padded_size(n: int, minimum: int = 1 << 14) -> int:
    """Pad sequence lengths to limit jit recompiles: next power of two, with
    a floor; beyond 2^20 pad to the next multiple of 2^20 instead (within
    ~6% waste) to keep the number of distinct compiled shapes tiny."""
    n = max(n, minimum)
    if n <= 1 << 20:
        return 1 << (n - 1).bit_length()
    m = 1 << 20
    return (n + m - 1) // m * m


def _kmer_pairs(codes: jnp.ndarray, K: int, reverse: bool):
    """uint32 (hi, lo) k-mer values for all len(codes) - K window positions.

    forward:  kmer[i] = sum_j codes[i+j] << 2*(K-1-j)
    reverse:  kmer[i] = sum_j codes[i+j] << 2*j
    2-bit codes at even shifts never straddle the 32-bit boundary, so hi/lo
    split cleanly.
    """
    n = codes.shape[0] - K
    hi = jnp.zeros((n,), jnp.uint32)
    lo = jnp.zeros((n,), jnp.uint32)
    for j in range(K):
        c = jax.lax.dynamic_slice_in_dim(codes, j, n).astype(jnp.uint32)
        shift = 2 * j if reverse else 2 * (K - 1 - j)
        if shift < 32:
            lo = lo | (c << shift)
        else:
            hi = hi | (c << (shift - 32))
    return hi, lo


@functools.partial(jax.jit, static_argnames=("lF", "K", "W", "H"))
def _sketch_codes_impl(eff_fwd, eff_rc, n_kmers, *, lF, K, W, H):
    F = 1 << lF
    M = W - H
    maximal_remainder = (1 << H) - 1
    mask_M = jnp.uint32((1 << M) - 1)

    fwd_hi, fwd_lo = _kmer_pairs(eff_fwd, K, reverse=False)
    rc_hi, rc_lo = _kmer_pairs(eff_rc, K, reverse=True)

    # canonical k-mer = min(fwd, rc) as a 64-bit value
    swap = (rc_hi < fwd_hi) | ((rc_hi == fwd_hi) & (rc_lo < fwd_lo))
    canon_hi = jnp.where(swap, rc_hi, fwd_hi)
    canon_lo = jnp.where(swap, rc_lo, fwd_lo)

    h_hi, h_lo = u.revhash64_u32(canon_hi, canon_lo)        # fingerprint hash
    b_hi, _ = u.unrevhash64_u32(canon_hi, canon_lo)         # slot selector
    slot = (b_hi >> (32 - lF)).astype(jnp.int32)

    # HyperMinHash fingerprint: saturated (2^H-1 - clz64) exponent | mantissa
    lz = u.clz64_u32(h_hi, h_lo)
    rem = jnp.maximum(0, maximal_remainder - lz)
    fp = ((rem << M) | (h_lo & mask_M).astype(jnp.int32)).astype(jnp.int32)

    # mask padding, then segmented min into the F slots
    idx = jnp.arange(fp.shape[0], dtype=jnp.int32)
    fp = jnp.where(idx < n_kmers, fp, INT32_MAX)
    table = jnp.full((F,), INT32_MAX, jnp.int32)
    return table.at[slot].min(fp, mode="drop")


def sketch_codes(eff_fwd: np.ndarray, eff_rc: np.ndarray, p: SketchParams):
    """Sketch one record's effective code arrays on device.

    Returns an (F,) int32 numpy array of per-slot min fingerprints with
    INT32_MAX for empty slots (pre-densification).
    """
    n = len(eff_fwd)
    n_kmers = n - p.K
    if n_kmers <= 0:
        return np.full(p.F, np.iinfo(np.int32).max, np.int32)
    P = padded_size(n)
    f = np.zeros(P, np.uint8)
    r = np.zeros(P, np.uint8)
    f[:n] = eff_fwd
    r[:n] = eff_rc
    out = _sketch_codes_impl(
        jnp.asarray(f), jnp.asarray(r), jnp.int32(n_kmers),
        lF=p.lF, K=p.K, W=p.W, H=p.H)
    return np.asarray(out)


def make_sketcher(p: SketchParams):
    """Returns sketch_fn(eff_fwd, eff_rc, n_kmers) closed over the params,
    suitable for jit composition (e.g. inside shard_map pipelines)."""
    def fn(eff_fwd, eff_rc, n_kmers):
        return _sketch_codes_impl(
            eff_fwd, eff_rc, n_kmers, lF=p.lF, K=p.K, W=p.W, H=p.H)
    return fn
