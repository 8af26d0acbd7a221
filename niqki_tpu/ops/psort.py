"""Pallas bitonic sort for int32 keys — the sketch engine's hot reduction.

The per-slot min-reduction (sketch.py) is sort + binary-search; XLA's TPU
sort measures ~6ns/element (42ms for 5M keys) — about 400x off the
HBM-bandwidth bound. This kernel sorts 2^m keys with the classic bitonic
network laid out for the VPU:

  * element i lives at row i//128, lane i%128 of an (N/128, 128) i32 array;
  * stages with stride >= 128 are row-pair compare-exchanges — full-width
    vector min/max over sublane-reshaped views;
  * stages with stride < 128 are lane shuffles via pltpu.roll + masks;
  * each 2^17-element chunk (CHUNK_LOG) is sorted entirely in VMEM (one HBM
    read+write covers all stages with stride < 2^17), then cross-chunk merge
    stages stream row blocks, then in-chunk merge tails run VMEM-resident
    again.

Total HBM traffic is ~(2 + 2*(m-17) passes) instead of one pass per network
stage. All control flow is static; direction bits come from program ids and
broadcasted iotas, matching the textbook network exactly (ascending iff bit
k of the element index is 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LOG_LANES = 7
CHUNK_LOG = 17           # 2^17 elements = 512 KiB i32 chunk resident in VMEM


def _stage(x, k: int, j: int, base_rows: int, row_iota, lane_iota):
    """One compare-exchange stage at stride 2^j; x: (R, 128).

    Both lane-stride (j < 7) and row-stride (j >= 7) stages are expressed as
    two pltpu.rolls + elementwise select — no reshapes, no concatenates, so
    the fully unrolled network stays cheap for Mosaic to compile.
    base_rows: global row offset of x[0] (direction bits use global indices).
    """
    if j < LOG_LANES:
        d = 1 << j
        fwd = pltpu.roll(x, LANES - d, axis=1)  # value from lane l+d
        bwd = pltpu.roll(x, d, axis=1)
        low = (lane_iota & d) == 0
    else:
        dr = 1 << (j - LOG_LANES)
        R = x.shape[0]
        fwd = pltpu.roll(x, R - dr, axis=0)     # value from row r+dr
        bwd = pltpu.roll(x, dr, axis=0)
        low = (row_iota & dr) == 0
    partner = jnp.where(low, fwd, bwd)
    if (1 << k) >= LANES:
        asc = (((row_iota + base_rows) >> (k - LOG_LANES)) & 1) == 0
    else:
        gidx = (row_iota + base_rows) * LANES + lane_iota
        asc = ((gidx >> k) & 1) == 0
    keep_min = low == asc
    return jnp.where(keep_min, jnp.minimum(x, partner),
                     jnp.maximum(x, partner))


def _local_sort_kernel(chunk_log: int):
    """Kernel: full bitonic sort of one VMEM-resident 2^chunk_log chunk.

    Direction bits for k <= chunk_log depend only on local indices (the chunk
    base is a multiple of the chunk size), so every chunk runs the identical
    network and ends ascending-iff-even in the enclosing k=chunk_log+1 block.
    Grid is (batch, chunks); each batch row sorts independently.
    """
    rows = (1 << chunk_log) // LANES

    def kern(x_ref, o_ref):
        base = pl.program_id(1) * rows
        x = x_ref[0]
        ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        li = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        for k in range(1, chunk_log + 1):
            for j in range(k - 1, -1, -1):
                x = _stage(x, k, j, base, ri, li)
        o_ref[0] = x

    return kern


def _merge_tail_kernel(chunk_log: int, k: int):
    """Kernel: the in-chunk tail (j = chunk_log-1 .. 0) of merge round k."""
    rows = (1 << chunk_log) // LANES

    def kern(x_ref, o_ref):
        base = pl.program_id(1) * rows
        x = x_ref[0]
        ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        li = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        for j in range(chunk_log - 1, -1, -1):
            x = _stage(x, k, j, base, ri, li)
        o_ref[0] = x

    return kern


def _cross_kernel(k: int, j: int):
    """Kernel: one cross-chunk stage (stride 2^j >= chunk size); operates on
    a (1, 1, 2, blk_rows, 128) block pair of the (B, N/2d, 2, d/128, 128)
    view. Direction is constant per outer program."""

    def kern(x_ref, o_ref):
        lo = x_ref[0, 0, 0]
        hi = x_ref[0, 0, 1]
        mn = jnp.minimum(lo, hi)
        mx = jnp.maximum(lo, hi)
        asc = ((pl.program_id(1) >> (k - j - 1)) & 1) == 0
        o_ref[0, 0, 0] = jnp.where(asc, mn, mx)
        o_ref[0, 0, 1] = jnp.where(asc, mx, mn)

    return kern


@functools.partial(jax.jit, static_argnames=("interpret", "chunk_log"))
def sort_i32_pow2_batch(x: jnp.ndarray, interpret: bool = False,
                        chunk_log: int | None = None) -> jnp.ndarray:
    """Ascending sort of each row of a (B, N) int32 array; N a power of two
    (>= 2^10). Rows sort independently (batch = leading grid dimension)."""
    B, N = x.shape
    m = N.bit_length() - 1
    assert N == 1 << m, "length must be a power of two"
    chunk_log = min(m, chunk_log or CHUNK_LOG)
    rows = (1 << chunk_log) // LANES
    n_chunks = N >> chunk_log
    xr = x.reshape(B, N // LANES, LANES)

    call = functools.partial(
        pl.pallas_call, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct(xr.shape, xr.dtype),
        input_output_aliases={0: 0})
    chunk_spec = pl.BlockSpec((1, rows, LANES), lambda b, p: (b, p, 0),
                              memory_space=pltpu.VMEM)

    xr = call(
        _local_sort_kernel(chunk_log),
        grid=(B, n_chunks),
        in_specs=[chunk_spec], out_specs=chunk_spec,
    )(xr)

    for k in range(chunk_log + 1, m + 1):
        for j in range(k - 1, chunk_log - 1, -1):
            d_rows = (1 << j) // LANES        # stride in rows, >= chunk rows
            n_pairs = (N // LANES) // (2 * d_rows)
            blk_rows = min(d_rows, rows)      # block size along the pair dim
            sub = d_rows // blk_rows
            v = xr.reshape(B, n_pairs, 2, d_rows, LANES)
            pair_spec = pl.BlockSpec(
                (1, 1, 2, blk_rows, LANES),
                lambda b, p, q: (b, p, 0, q, 0), memory_space=pltpu.VMEM)
            v = pl.pallas_call(
                _cross_kernel(k, j),
                grid=(B, n_pairs, sub),
                in_specs=[pair_spec], out_specs=pair_spec,
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                input_output_aliases={0: 0},
                interpret=interpret,
            )(v)
            xr = v.reshape(B, N // LANES, LANES)
        xr = call(
            _merge_tail_kernel(chunk_log, k),
            grid=(B, n_chunks),
            in_specs=[chunk_spec], out_specs=chunk_spec,
        )(xr)
    return xr.reshape(B, N)


def sort_i32_pow2(x: jnp.ndarray, interpret: bool = False,
                  chunk_log: int | None = None) -> jnp.ndarray:
    """Ascending sort of a power-of-two-length int32 array (N >= 2^10)."""
    return sort_i32_pow2_batch(x[None, :], interpret=interpret,
                               chunk_log=chunk_log)[0]


def available() -> bool:
    """True when the current default backend can run these kernels."""
    try:
        import jax
        plat = jax.default_backend()
    except Exception:
        return False
    return plat == "tpu"
