"""Pallas bitonic sort for int32 keys — the sketch engine's hot reduction.

The per-slot min-reduction (sketch.py) is sort + binary-search; XLA's TPU
sort measures ~6ns/element (42ms for 5M keys) — about 400x off the
HBM-bandwidth bound. This kernel sorts 2^m keys with the classic bitonic
network laid out for the VPU:

  * element i lives at row i//128, lane i%128 of an (N/128, 128) i32 array;
  * stages with stride >= 128 are row-pair compare-exchanges — full-width
    vector min/max over sublane-reshaped views;
  * stages with stride < 128 are lane shuffles via pltpu.roll + masks;
  * each 2^18-element chunk is sorted entirely in VMEM (one HBM read+write
    for the first 18 of the m(m+1)/2 rounds), then cross-chunk merge stages
    stream row blocks, then in-chunk merge tails run VMEM-resident again.

Total HBM traffic is ~(2 + 2*(m-18) passes) instead of one pass per network
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
    """
    rows = (1 << chunk_log) // LANES

    def kern(x_ref, o_ref):
        base = pl.program_id(0) * rows
        x = x_ref[:]
        ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        li = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        for k in range(1, chunk_log + 1):
            for j in range(k - 1, -1, -1):
                x = _stage(x, k, j, base, ri, li)
        o_ref[:] = x

    return kern


def _merge_tail_kernel(chunk_log: int, k: int):
    """Kernel: the in-chunk tail (j = chunk_log-1 .. 0) of merge round k."""
    rows = (1 << chunk_log) // LANES

    def kern(x_ref, o_ref):
        base = pl.program_id(0) * rows
        x = x_ref[:]
        ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        li = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        for j in range(chunk_log - 1, -1, -1):
            x = _stage(x, k, j, base, ri, li)
        o_ref[:] = x

    return kern


def _cross_kernel(k: int, j: int):
    """Kernel: one cross-chunk stage (stride 2^j >= chunk size); operates on
    an (1, 2, rows_of_d//grid1, 128) block pair of the (N/2d, 2, d/128, 128)
    view. Direction is constant per outer program."""

    def kern(x_ref, o_ref):
        lo = x_ref[0, 0]
        hi = x_ref[0, 1]
        mn = jnp.minimum(lo, hi)
        mx = jnp.maximum(lo, hi)
        asc = ((pl.program_id(0) >> (k - j - 1)) & 1) == 0
        o_ref[0, 0] = jnp.where(asc, mn, mx)
        o_ref[0, 1] = jnp.where(asc, mx, mn)

    return kern


@functools.partial(jax.jit, static_argnames=("interpret", "chunk_log"))
def sort_i32_pow2(x: jnp.ndarray, interpret: bool = False,
                  chunk_log: int | None = None) -> jnp.ndarray:
    """Ascending sort of a power-of-two-length int32 array (N >= 2^10)."""
    N = x.shape[0]
    m = N.bit_length() - 1
    assert N == 1 << m, "length must be a power of two"
    chunk_log = min(m, chunk_log or CHUNK_LOG)
    rows = (1 << chunk_log) // LANES
    n_chunks = N >> chunk_log
    xr = x.reshape(N // LANES, LANES)

    call = functools.partial(
        pl.pallas_call, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct(xr.shape, xr.dtype),
        input_output_aliases={0: 0})

    xr = call(
        _local_sort_kernel(chunk_log),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda p: (p, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, LANES), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )(xr)

    for k in range(chunk_log + 1, m + 1):
        for j in range(k - 1, chunk_log - 1, -1):
            d_rows = (1 << j) // LANES        # stride in rows, >= chunk rows
            n_pairs = (N // LANES) // (2 * d_rows)
            blk_rows = min(d_rows, rows)      # block size along the pair dim
            sub = d_rows // blk_rows
            v = xr.reshape(n_pairs, 2, d_rows, LANES)
            v = pl.pallas_call(
                _cross_kernel(k, j),
                grid=(n_pairs, sub),
                in_specs=[pl.BlockSpec(
                    (1, 2, blk_rows, LANES),
                    lambda p, q: (p, 0, q, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(
                    (1, 2, blk_rows, LANES),
                    lambda p, q: (p, 0, q, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                input_output_aliases={0: 0},
                interpret=interpret,
            )(v)
            xr = v.reshape(N // LANES, LANES)
        xr = call(
            _merge_tail_kernel(chunk_log, k),
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((rows, LANES), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, LANES), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM),
        )(xr)
    return xr.reshape(N)


def available() -> bool:
    """True when the current default backend can run these kernels."""
    try:
        import jax
        plat = jax.default_backend()
    except Exception:
        return False
    return plat == "tpu"
