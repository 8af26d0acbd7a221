"""Bit-plane fingerprint-match count kernel — 32 compares per lane-op.

Replaces ops/pcount.py's pair-packed compare (2 fingerprints per i32 lane,
~5 VPU ops per compare) as the query engine's hot op wherever its shape
constraints hold. The index is stored bit-sliced: plane p of X holds bit p of
every fingerprint, packed 32 fingerprints per uint32 lane, plus one validity
plane. Equality over all W+1 planes is then

    match = AND_p XNOR(Qp[p], Xp[p])        (one bit per fingerprint)
    counts[q, g] = sum_lanes popcount(match)

i.e. ~2(W+1) bit-ops + a popcount per 32 fingerprint compares — ~0.9 VPU
lane-ops per compare, a ~5x arithmetic-intensity win over pair-packing, and
(W+1)/16 the HBM traffic of the int16 layout.

Counts are exactly the reference's posting-list scan results
(/root/reference/src/niqki_index.cpp:633-687): the sentinel plane makes
stored-empty (-2) and query-invalid (-3) slots match nothing, including each
other (their value planes are complementary constants).

Constraints: F % 4096 == 0 (the packed lane axis must tile into 128-lane
vregs) and 1 <= W <= 30. Works for ANY W (pcount needs W <= 14).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_G = 128        # index rows per x tile (sublane dim; also count lanes)
BLOCK_Q = 96        # queries per kernel launch (amortizes the per-tile DMA;
                    # measured optimum on v5e — 509 q/s vs 373 at 32)
CHUNK_LANES = 512   # packed u32 lanes per F-chunk (16384 fingerprints)


# ---------------------------------------------------------------------------
# bit-plane packing (device, jit)

def _pack_bits(b):
    """(N, F) uint32 of 0/1 -> (N, F/32) uint32, bit f%32 of lane f//32 =
    value at f. log2 pairwise combine: never materializes a 32x intermediate."""
    c = b
    w = 1
    while w < 32:
        c = c[:, 0::2] | (c[:, 1::2] << np.uint32(w))
        w *= 2
    return c


@functools.partial(jax.jit, static_argnames=("W", "query"))
def pack_bitplanes(mat, *, W: int, query: bool):
    """(N, F) int fingerprints -> (W+1, N, F/32) uint32 bit-planes.

    Plane p < W = bit p of the value; plane W = 1 iff the slot is invalid
    (empty/out-of-range). Invalid value planes are all-0 on the stored side
    and all-1 on the query side, so invalid never matches invalid.

    Row-major (rows on sublanes, packed-f on LANES): Mosaic issues the
    elementwise xor/and chain ~2x faster over long lane vectors than over
    the transposed (f-sublane) layout, and the lane reduction + row write
    per query is cheap (measured on v5e; the transposed variant and a
    register-blocked fori_loop variant both lose).
    """
    m = mat.astype(jnp.int32)
    valid = (m >= 0) & (m < (1 << W))
    fill = (1 << W) - 1 if query else 0
    v = jnp.where(valid, m, fill).astype(jnp.uint32)
    planes = [_pack_bits((v >> np.uint32(p)) & np.uint32(1)) for p in range(W)]
    planes.append(_pack_bits(jnp.where(valid, 0, 1).astype(jnp.uint32)))
    return jnp.stack(planes)


# ---------------------------------------------------------------------------
# the kernel

def _bcount_kernel(qb: int, P: int):
    def kern(q_ref, x_ref, o_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        for qi in range(qb):
            # XNOR(x, q) == x ^ ~q; ~q folded in here (Mosaic fuses the
            # NOT into the xor: a pre-inverted-query-planes variant
            # measured NEUTRAL on v5e — 1635 vs 1651 q/s at G=100k — so
            # each plane really is 2 ops). q slices are (1, cl):
            # sublane-broadcast against the (TILE_G, cl) x planes.
            m = x_ref[0] ^ ~q_ref[0, qi:qi + 1, :]
            for p in range(1, P):
                m &= x_ref[p] ^ ~q_ref[p, qi:qi + 1, :]
            pc = jax.lax.population_count(m).astype(jnp.int32)
            o_ref[qi, :] += jnp.sum(pc, axis=1)   # lane reduce
    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bcount_call(qp, xp, *, interpret: bool = False):
    P, Qb, L = qp.shape            # L = F/32 packed lanes
    G = xp.shape[1]
    cl = min(CHUNK_LANES, L)
    assert L % cl == 0 and G % TILE_G == 0
    grid = (G // TILE_G, L // cl)
    return pl.pallas_call(
        _bcount_kernel(Qb, P),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, Qb, cl), lambda g, f: (0, 0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, TILE_G, cl), lambda g, f: (0, g, f),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Qb, TILE_G), lambda g, f: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qb, G), jnp.int32),
        interpret=interpret,
    )(qp, xp)


# ---------------------------------------------------------------------------
# host-facing API

def available(F: int, W: int | None = None) -> bool:
    """Shape gate: the packed lane axis (F/32) must tile into 128-lane vregs."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return F % 4096 == 0 and (W is None or 1 <= W <= 30)


def pad_rows(mat16: np.ndarray, tile: int = TILE_G) -> np.ndarray:
    """Pad index rows to a TILE_G multiple with the never-matching -2.

    Hugepage-backed destination: a GB-scale np.vstack first-touches fresh
    4K pages at ~22 MB/s on this host class (niqki_tpu/hostmem.py)."""
    G, F = mat16.shape
    Gp = -(-G // tile) * tile
    if Gp == G:
        return mat16
    from ..hostmem import big_empty
    out = big_empty((Gp, F), mat16.dtype)
    out[:G] = mat16
    out[G:] = -2
    return out


def build_index_planes(mat: np.ndarray, W: int, row_chunk: int | None = None,
                       sanitized: bool = False):
    """(G, F) host int matrix -> (W+1, Gp, F/32) uint32 device bit-planes.

    Rows are shipped and packed in chunks so peak HBM overhead stays at one
    chunk of the unpacked form. ``sanitized=True`` promises every value is
    in [-2, 2^W) (index._stored() output); that makes an int16 narrowing
    lossless for W <= 14, halving the raw h2d bytes (the tunnel transport
    is raw-byte scan-bound when congested). Unsanitized input keeps its
    dtype — an out-of-range value must reach pack_bitplanes' range check
    un-aliased."""
    m = pad_rows(np.asarray(mat))
    if row_chunk is None:
        # Bound the unpacked on-device chunk (+ the pack's per-plane
        # temps) by element count, not row count: 16384 rows at F=32768
        # is a 2 GB int32 chunk whose pack graph blew HBM at compile time.
        row_chunk = max(TILE_G, (1 << 26) // m.shape[1])
    if sanitized and W <= 14 and m.dtype != np.int16:
        from ..hostmem import big_copy
        m = big_copy(m, np.int16)
    chunks = [pack_bitplanes(jnp.asarray(m[lo:lo + row_chunk]), W=W,
                             query=False)
              for lo in range(0, m.shape[0], row_chunk)]
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
    return jax.block_until_ready(out)


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def _pack_count_call(qblk, xp, *, W: int, interpret: bool = False):
    """One fused per-block dispatch: device-side bit-plane pack of a query
    block + the Pallas count. Keeping pack+count in one jit halves the
    per-block RPC round-trips on the remote transport."""
    qp = pack_bitplanes(qblk, W=W, query=True)
    return _bcount_call(qp, xp, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("B", "W", "interpret"))
def _pack_count_call_split(wirebuf, xp, *, B: int, W: int,
                           interpret: bool = False):
    """Split-wire variant of _pack_count_call: reconstruct W<=12-bit
    fingerprints from the single-buffer 3-stream wire (mantissa bytes,
    nibble-packed exponents, validity bitmask), then pack + count in the
    same dispatch. The reconstruction is all elementwise/reshape — XLA
    fuses it into the pack; no extra HBM round trip."""
    F = wirebuf.size * 8 // (13 * B)
    lo = wirebuf[:B * F].reshape(B, F)
    nib = wirebuf[B * F:B * F + B * F // 2].reshape(B, F // 2)
    mask = wirebuf[B * F + B * F // 2:].reshape(B, F // 8)
    n = nib.astype(jnp.int32)
    exp = jnp.stack([n & 15, n >> 4], axis=-1).reshape(B, -1)
    m = mask.astype(jnp.int32)
    bits = jnp.stack([(m >> k) & 1 for k in range(8)],
                     axis=-1).reshape(B, -1)
    q12 = lo.astype(jnp.int32) | (exp << 8)
    qv = jnp.where(bits == 1, q12, -3)
    qp = pack_bitplanes(qv, W=W, query=True)
    return _bcount_call(qp, xp, interpret=interpret)


def _split_wire_block(blk: np.ndarray) -> np.ndarray:
    """int16 sanitized block (B, F) -> one 1-D uint8 wire buffer holding
    three contiguous streams:

    lo   B*F     mantissa bytes (uniform — the irreducible wire content)
    nib  B*F/2   two 4-bit exponents per byte (low-entropy stream)
    mask B*F/8   validity bits, little bit-order (near-all-ones: the
                 transport's compressor eats it)

    1.625 bytes/slot raw vs int16's 2.0, with the compressible content
    segregated from the uniform mantissa so the transport's stream
    compressor sees homogeneous streams — and ONE h2d RPC per block
    instead of three. Requires the sanitized contract (values in
    [-3, 2^W), W <= 12): the only negatives are the -3 sentinel, so
    validity is just (blk >= 0), and the 0xFF high byte of a sentinel is
    masked to 4 bits before nibble packing."""
    B, F = blk.shape
    b = blk.view(np.uint8).reshape(B, F, 2)  # little-endian
    out = np.empty(B * F + B * F // 2 + B * F // 8, np.uint8)
    out[:B * F] = b[..., 0].ravel()
    hi = b[..., 1] & np.uint8(0xF)
    nv = out[B * F:B * F + B * F // 2].reshape(B, F // 2)
    np.bitwise_or(hi[:, 0::2], hi[:, 1::2] << np.uint8(4), out=nv)
    out[B * F + B * F // 2:] = np.packbits(blk >= 0, axis=1,
                                           bitorder="little").ravel()
    return out


def _mask_topk(vals, idx, min_score):
    """Zero out sub-threshold top-k entries ON DEVICE: the (B, cap) d2h
    arrays become mostly zeros for sparse-hit rows, which the tunnel
    transport's stream compressor eats (raw random sub-threshold counts
    would ship at the incompressible rate). (0, gid 0) pairs are ignored
    by every consumer (min_score >= 1 on this path)."""
    keep = vals >= min_score
    return jnp.where(keep, vals, 0), jnp.where(keep, idx, 0)


@functools.partial(jax.jit, static_argnames=("B", "W", "cap", "interpret"))
def _pack_count_topk_split(wirebuf, xp, min_score, *, B: int, W: int,
                           cap: int, interpret: bool = False):
    c = _pack_count_call_split(wirebuf, xp, B=B, W=W, interpret=interpret)
    return _mask_topk(*jax.lax.top_k(c, cap), min_score)


@functools.partial(jax.jit, static_argnames=("W", "cap", "interpret"))
def _pack_count_topk(qblk, xp, min_score, *, W: int, cap: int,
                     interpret: bool = False):
    c = _pack_count_call(qblk, xp, W=W, interpret=interpret)
    return _mask_topk(*jax.lax.top_k(c, cap), min_score)


def match_counts_planes(q_np: np.ndarray, xp, G: int, W: int,
                        interpret: bool = False,
                        sanitized: bool = False,
                        topk: int | None = None,
                        min_score: int = 1):
    """counts (Q, G) int32 of host queries q_np (Q, F) against pre-packed
    device bit-planes xp (W+1, Gp, F/32).

    Queries ship one BLOCK_Q block per transfer, with the next block's h2d
    overlapping the current block's kernel (a dedicated ship thread keeps
    two transfers in flight). Wire format (NIQKI_TPU_WIRE): the default
    ``split`` ships three segregated streams per block — mantissa bytes,
    nibble-packed exponents, validity bitmask (1.625 B/slot raw) — and
    ``int16`` ships one (B, F) int16 array (2.0 B/slot). MEASURED on the
    tunnel transport (tools/wire_probe.py, tools/e2e_probe.py, 2026-08):
    the transport compresses its stream to ~order-0 entropy either way, so
    at full transport speed the two tie (634 vs 637 q/s e2e at G=100k);
    on congested days the transport is scan-bound on RAW bytes and the
    split wire is ~2x faster (0.58 s vs 1.16 s per 288 queries). Both lose
    less than pre-packed bit-planes (81% of the int16 bytes but
    incompressible — a measured LOSS). The wire FLOOR is the sketch's own
    entropy: 8 uniform mantissa bits + ~2.8 exponent-entropy bits per slot
    = ~12.7 MB per 288 queries at F=32768, which at the tunnel's ~38 MB/s
    compressed-byte rate bounds e2e below ~735 q/s at Q=288 regardless of
    format.

    ``sanitized=True`` promises every value is already in [-3, 2^W)
    (index._query_side output) and skips the range pass — the sanitize
    would otherwise materialize extra (Q, F) temporaries of fresh
    first-touch pages (the hostmem pathology).

    ``topk=cap`` fuses a per-row jax.lax.top_k(cap) into each dispatch and
    returns (vals, idx) (Q, cap) int32 instead of dense counts: only
    surviving hit candidates cross the ~15 MB/s d2h — the dense (Q, G)
    int32 block at G=100k is 115 MB and dominates hit-dense query walls
    (measured: 62 -> 300+ q/s e2e with 1000 hits/query). Rows with >= cap
    survivors must be re-fetched dense by the caller (vals[:, -1] tells)."""
    dt = np.int16 if W <= 14 else np.int32
    q = np.asarray(q_np)
    if q.dtype not in (np.int16, np.int32, np.int64):
        q = q.astype(np.int64)  # widest: no aliasing before the range pass
    if sanitized and os.environ.get("NIQKI_TPU_DEBUG"):
        # The sanitized=True contract is an unchecked caller promise: an
        # out-of-range value here would alias a valid fingerprint through
        # the int16 narrowing below. Cheap debug-mode verification.
        assert q.size == 0 or (q.min() >= -3 and q.max() < (1 << W)), \
            "sanitized=True caller broke the [-3, 2^W) contract"
    if not sanitized:
        # sanitize BEFORE any narrowing cast: an out-of-range value must
        # not alias a valid fingerprint through int16 wraparound
        q = np.where((q < 0) | (q >= (1 << W)), q.dtype.type(-3), q)
    q = np.ascontiguousarray(q, dt)
    Q, F = q.shape
    Qp = -(-Q // BLOCK_Q) * BLOCK_Q
    if Qp != Q:
        q = np.vstack([q, np.full((Qp - Q, F), -3, dt)])
    blocks = list(range(0, Qp, BLOCK_Q))

    # Wire format: NIQKI_TPU_WIRE=int16|split (default split for W<=12).
    # Both are measured on the tunnel transport (tools/wire_probe.py +
    # bench_scale); the split wire ships 1.625 bytes/slot in segregated
    # streams, int16 ships 2.0 with exponent bytes interleaved. The
    # transport's own compressor narrows the gap (it eats the low-entropy
    # exponent bytes either way), so both stay selectable.
    wire = os.environ.get("NIQKI_TPU_WIRE", "split")
    use_split = wire == "split" and W <= 12 and dt == np.int16

    if use_split:
        def ship(lo_):
            return jax.device_put(_split_wire_block(q[lo_:lo_ + BLOCK_Q]))

        def dispatch(dev):
            if topk is not None:
                return _pack_count_topk_split(dev, xp, min_score,
                                              B=BLOCK_Q, W=W, cap=topk,
                                              interpret=interpret)
            return _pack_count_call_split(dev, xp, B=BLOCK_Q, W=W,
                                          interpret=interpret)
    else:
        def ship(lo_):
            return jax.device_put(q[lo_:lo_ + BLOCK_Q])

        def dispatch(dev):
            if topk is not None:
                return _pack_count_topk(dev, xp, min_score, W=W, cap=topk,
                                        interpret=interpret)
            return _pack_count_call(dev, xp, W=W, interpret=interpret)

    def finish(outs):
        if topk is not None:
            vals = jnp.concatenate([o[0] for o in outs], axis=0)
            idx = jnp.concatenate([o[1] for o in outs], axis=0)
            return vals[:Q], idx[:Q]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return out[:Q, :G]

    if len(blocks) == 1:
        return finish([dispatch(ship(0))])
    # Pipelined: ship block i+1 while block i's kernel runs. On the remote
    # transport this hides all but the LAST block's kernel behind the wire
    # (measured 487 -> 650 q/s at Q=288, G=100k); on local backends the
    # ship thread is harmless (device_put is cheap). The host-side split
    # pack (view/strided copies, ~5 MB/block) also runs in the ship
    # thread, overlapped with the current block's kernel.
    from concurrent.futures import ThreadPoolExecutor
    outs = []
    with ThreadPoolExecutor(1) as shipper:
        futs = [shipper.submit(ship, lo) for lo in blocks[:2]]
        for i, lo in enumerate(blocks):
            dev = futs.pop(0).result()
            if i + 2 < len(blocks):
                futs.append(shipper.submit(ship, blocks[i + 2]))
            outs.append(dispatch(dev))
    return finish(outs)


def np_pack_bitplanes(mat: np.ndarray, W: int,
                      out: np.ndarray | None = None,
                      row_chunk: int = 2048) -> np.ndarray:
    """Host (numpy) twin of pack_bitplanes(query=False) — bit-identical
    (tested), used by checkpoint v3 to persist packed planes and by the
    mesh-direct loader to assemble per-device planes without a device
    round trip. Chunked so temporaries stay ~row_chunk*F."""
    m = np.asarray(mat)
    N, F = m.shape
    L = F // 32
    assert F % 32 == 0
    if out is None:
        # hugepage-backed: a 100k-row S=15 plane pack is 1.7 GB of fresh
        # first-touch pages on the plain np.empty path (hostmem pathology)
        from ..hostmem import big_empty
        out = big_empty((W + 1, N, L), np.uint32)

    # Native AVX-512 fast path (two vptestmd per plane per 32 values —
    # the numpy tree pack below was the measured wall of the v3 planes
    # save); bit-identical, falls through on layout/lib misfit.
    from .. import native
    if native.available() and native.pack_bitplanes(m, W, out):
        return out

    def pack_bits(b):
        c = b
        w = 1
        while w < 32:
            c = c[:, 0::2] | (c[:, 1::2] << np.uint32(w))
            w *= 2
        return c

    for lo in range(0, N, row_chunk):
        blk = m[lo:lo + row_chunk].astype(np.int32, copy=False)
        valid = (blk >= 0) & (blk < (1 << W))
        v = np.where(valid, blk, 0).astype(np.uint32)
        for p in range(W):
            out[p, lo:lo + row_chunk] = pack_bits((v >> np.uint32(p))
                                                  & np.uint32(1))
        out[W, lo:lo + row_chunk] = pack_bits((~valid).astype(np.uint32))
    return out


# ---------------------------------------------------------------------------
# all-vs-all self-join (matrix mode)

MATRIX_BLOCK = 8 * BLOCK_Q   # index rows per self-join dispatch


def _planes_as_queries(xp, lo: int, B: int):
    """Slice B stored rows out of the index planes and re-encode them as
    QUERY planes — the all-vs-all matrix needs zero query h2d because the
    queries ARE the index. Stored-invalid slots have all-0 value planes +
    sentinel 1; query-invalid needs all-1 value planes + sentinel 1, so
    the conversion is value |= sentinel. Valid slots (sentinel 0) pass
    through — the result is exactly pack_bitplanes(values, query=True) of
    the same fingerprints."""
    P = xp.shape[0]
    qs = jax.lax.dynamic_slice(
        xp, (0, lo, 0), (P, B, xp.shape[2]))
    return jnp.concatenate([qs[:P - 1] | qs[P - 1:], qs[P - 1:]], axis=0)


@functools.partial(jax.jit, static_argnames=("B", "cap", "interpret"))
def _self_join_topk(xp, lo, min_score, *, B: int, cap: int,
                    interpret: bool = False):
    """counts of index rows [lo, lo+B) against the whole index, wrapped to
    the reference's uint16 matrix counters, then top-cap compacted per row
    so only (count, gid) survivors cross the d2h wire. Returns (vals, idx)
    each (B, cap) int32, count-descending, with sub-min_score entries
    masked to (0, 0) ON DEVICE — unmasked top-k idx entries are random
    gids, i.e. incompressible bytes on the tunnel's ~15 MB/s d2h, and the
    d2h (not the kernel, not the top_k) is the self-join's measured wall
    (tools/matrix_probe.py: kern 47 ms/block, +top_k free, +unmasked d2h
    236 ms/block at G=10240)."""
    qp = _planes_as_queries(xp, lo, B)
    outs = [_bcount_call(qp[:, o:o + BLOCK_Q], xp, interpret=interpret)
            for o in range(0, B, BLOCK_Q)]
    c = (outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0))
    c = c & 0xFFFF   # reference uint16 counters (niqki_index.cpp:572)
    v, g = _mask_topk(*jax.lax.top_k(c, cap), min_score)
    # wrapped counts fit uint16 exactly: 25% fewer d2h bytes on the
    # self-join's (B, cap) survivor wire (the d2h leg is ~40% of the
    # per-block device chain at G=102k; consumers compare/convert host-side)
    return v.astype(jnp.uint16), g


def extend_planes(xp, extra: int):
    """Append ``extra`` never-matching stored-invalid rows (all-0 value
    planes + all-1 sentinel) to index planes — the symmetric sweep's
    quantized windows may read past Gp, and padding rows count 0 against
    everything (masked out by min_score >= 1 on that path)."""
    if extra <= 0:
        return xp
    P, _, L = xp.shape
    pad_v = jnp.zeros((P - 1, extra, L), jnp.uint32)
    pad_s = jnp.full((1, extra, L), 0xFFFFFFFF, jnp.uint32)
    return jnp.concatenate([xp, jnp.concatenate([pad_v, pad_s], 0)], axis=1)


@functools.partial(jax.jit, static_argnames=("B", "w", "cap", "interpret"))
def _self_join_window_topk(xp, lo, min_score, *, B: int, w: int, cap: int,
                           interpret: bool = False):
    """Symmetric-sweep step: counts of index rows [lo, lo+B) against the
    UPPER-TRIANGLE column window [lo, lo+w*B) of the extended planes only
    — the strictly-lower tiles are recovered host-side by mirroring
    (counts[a, b] == counts[b, a]; equality counts are symmetric), so each
    unordered pair is computed exactly once and the per-dispatch kernel,
    top_k, and survivor d2h all scale with the window instead of the full
    Gp (measured at G=102400/lF=12: kern 90 + top_k 120 + d2h 160 ms per
    full-width block — every term halves over the sweep). Returns (vals,
    gids) (B, min(cap, w*B)) int32 wrapped counts with GLOBAL gids,
    sub-min_score entries masked to (0, 0) on device. The reference's own
    sweep is the full G x G query_range loop
    (/root/reference/src/niqki_index.cpp:570-610)."""
    P = xp.shape[0]
    qp = _planes_as_queries(xp, lo, B)
    xwin = jax.lax.dynamic_slice(xp, (0, lo, 0), (P, w * B, xp.shape[2]))
    outs = [_bcount_call(qp[:, o:o + BLOCK_Q], xwin, interpret=interpret)
            for o in range(0, B, BLOCK_Q)]
    c = (outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0))
    c = c & 0xFFFF   # reference uint16 counters (niqki_index.cpp:572)
    vals, pos = jax.lax.top_k(c, min(cap, w * B))
    v, g = _mask_topk(vals, lo + pos, min_score)
    return v.astype(jnp.uint16), g   # see _self_join_topk: uint16 wire


@functools.partial(jax.jit, static_argnames=("B", "interpret"))
def _self_join_dense(xp, lo, *, B: int, interpret: bool = False):
    """Dense variant: (B, Gp) uint16 wrapped counts (min_score == 0 rows
    print every cell, so there is nothing to compact — uint16 halves the
    d2h bytes and IS the reference's counter width)."""
    qp = _planes_as_queries(xp, lo, B)
    outs = [_bcount_call(qp[:, o:o + BLOCK_Q], xp, interpret=interpret)
            for o in range(0, B, BLOCK_Q)]
    c = (outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0))
    return (c & 0xFFFF).astype(jnp.uint16)


def match_counts_bitplane(q_sk, g_sk, W: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Convenience wrapper packing both sides; for a resident index use
    build_index_planes + match_counts_planes."""
    g = np.asarray(g_sk)
    xp = build_index_planes(g, W)
    return match_counts_planes(np.asarray(q_sk), xp, g.shape[0], W,
                               interpret=interpret)
