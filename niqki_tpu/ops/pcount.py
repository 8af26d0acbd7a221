"""Pallas fingerprint-match count kernel — the query engine's hot op.

counts[q, g] = sum_f [Q[q, f] == X[g, f]]  for a query block Q (Qb, F) and
the index X (G, F). The XLA formulation streams the whole index from HBM
once per small query block and measures ~3x off the compute bound; this
kernel tiles X into VMEM-resident (128, F) blocks, keeps the query block
resident, and accumulates one (Qb, 128) count tile per grid step — X is read
from HBM exactly once per Qb queries regardless of G.

int16 operands (fingerprints are W<=14 bits plus the -1 sentinel) halve both
HBM traffic and VMEM footprint. Output is int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_G = 128       # index rows per tile (output tile lane dimension)
CHUNK_LANES = 4096  # i32 pair lanes per F-chunk (8192 fingerprints)
PC_BLOCK_Q = 64    # queries per kernel launch (default block_q)


def _count_kernel(qb: int):
    # Operands arrive as int32 lanes each packing TWO int16 fingerprints
    # (Mosaic v5e has no i16 vector compare): equality of each half is
    # tested on the xor — half is equal iff its 16 bits of a^b are zero.
    # Grid = (G tiles, F chunks); the (Qb, TILE_G) output tile stays VMEM-
    # resident across the inner F-chunk loop and accumulates.
    def kern(q_ref, x_ref, o_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        x = x_ref[:]                      # (TILE_G, chunk_lanes) i32 pairs
        for qi in range(qb):              # static unroll over the query block
            z = x ^ q_ref[qi, :][None, :]
            eq_lo = (z & 0xFFFF) == 0
            eq_hi = ((z >> 16) & 0xFFFF) == 0
            o_ref[qi, :] += jnp.sum(
                eq_lo.astype(jnp.int32) + eq_hi.astype(jnp.int32),
                axis=1, dtype=jnp.int32)
    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def _count_call(q, x, *, interpret: bool = False):
    Qb, Fp = q.shape                      # Fp = F/2 int32 pair lanes
    G = x.shape[0]
    cl = min(CHUNK_LANES, Fp)
    assert Fp % cl == 0, (
        f"F={2*Fp} does not tile into {2*cl}-fingerprint chunks; "
        "pcount.available() must gate callers")
    grid = (G // TILE_G, Fp // cl)
    return pl.pallas_call(
        _count_kernel(Qb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Qb, cl), lambda g, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_G, cl), lambda g, f: (g, f),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Qb, TILE_G), lambda g, f: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qb, G), jnp.int32),
        interpret=interpret,
    )(q, x)


def pack_rows_np(a_int16: np.ndarray) -> np.ndarray:
    """(N, F) int16 -> (N, F/2) int32 pair-packed, as a free numpy view.

    Packing MUST happen host-side: a device-side reshape+bitcast of a large
    index materializes a full copy in HBM.
    """
    a_int16 = np.ascontiguousarray(a_int16, dtype=np.int16)
    return a_int16.view(np.int32)


def _pack_pairs(a):
    """(N, F) int16 -> (N, F/2) int32, two fingerprints per lane (device)."""
    return jax.lax.bitcast_convert_type(
        a.reshape(a.shape[0], a.shape[1] // 2, 2), jnp.int32)


def available(F: int) -> bool:
    """Kernel constraints: TPU backend, lane-aligned F, X tile fits VMEM."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    # F/2 pair lanes must tile exactly into the F-chunk grid
    Fp = F // 2
    cl = min(CHUNK_LANES, Fp)
    return F % 256 == 0 and Fp % cl == 0


def match_counts_packed(q_np: np.ndarray, gp, G: int, block_q: int = 64,
                        interpret: bool = False) -> jnp.ndarray:
    """counts (Q, G) int32 against a pre-packed device index.

    q_np: (Q, F) host int16 queries (packed here — queries are small).
    gp:   (Gp, F/2) int32 pair-packed device index, Gp a TILE_G multiple
          padded with a sentinel that matches no fingerprint.
    """
    Q = q_np.shape[0]
    Qp = -(-Q // block_q) * block_q
    q16 = np.full((Qp, q_np.shape[1]), -2, np.int16)
    q16[:Q] = q_np
    qp = jnp.asarray(pack_rows_np(q16))
    outs = [
        _count_call(qp[lo:lo + block_q], gp, interpret=interpret)
        for lo in range(0, Qp, block_q)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:Q, :G]


def match_counts_pallas(q_sk, g_sk, block_q: int = 64,
                        interpret: bool = False) -> jnp.ndarray:
    """counts (Q, G) int32; q_sk (Q, F), g_sk (G, F) int16 host arrays.

    Convenience wrapper that packs both sides host-side; for repeated
    queries against a resident index use match_counts_packed with a
    pre-packed device matrix.
    """
    g16 = np.asarray(g_sk, dtype=np.int16)
    G, F = g16.shape
    from .bcount import pad_rows
    g16 = pad_rows(g16, tile=TILE_G)   # hugepage-backed -2 padding
    gp = jnp.asarray(pack_rows_np(g16))
    return match_counts_packed(np.asarray(q_sk, dtype=np.int16), gp, G,
                               block_q=block_q, interpret=interpret)
