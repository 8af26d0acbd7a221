"""Hit counting as one-hot matmul on the MXU — the measured prototype.

SURVEY §7 named the MXU formulation (one-hot x one-hot^T integer matmul)
as the untested alternative to the VPU bit-plane kernel (ops/bcount).
This module makes it a real, parity-gated route (NIQKI_TPU_COUNT=mxu) so
the verdict is reproducible: tools/mxu_probe.py measures it against bcount
on the real chip.

MEASURED VERDICT (v5e, 2026-08, tools/mxu_probe.py): 114x slower than
bcount at G=2048/F=32768/W=12 (16.9 vs 1913 q/s, parity-exact), and the
reason is structural, not an implementation gap. Exact equality of W-bit
fingerprints cannot be decomposed into a low-rank contraction: eq(a, b) =
AND over W bit-planes, and AND does not distribute over the f-sum a matmul
needs. The only exact matmul form is the one-hot join — counts[q, g] =
sum_f sum_v Qoh[q, f, v] * Xoh[g, f, v] — whose contraction is 2^W MACs
per fingerprint compare. At W=12 that is a 4096x arithmetic blow-up over
bcount's ~0.8 VPU element-ops per compare, far beyond the MXU's ~50x
raw-throughput edge over the VPU. The measured 4.6 TMAC/s sustained
(vs ~98 TMAC/s bf16 peak) shows the prototype is additionally HBM-bound on
the 2^W-wide one-hot materialization — but even AT peak it would lose ~5x,
so no amount of kernel tuning changes the verdict. (Hamming DISTANCE does
decompose into W bit-plane matmuls, but per-slot equality counts are not
derivable from sketch-level Hamming distance.)

Counts are exact: one_hot of a sentinel (<0) or out-of-range value is the
all-zero row, so invalid slots match nothing on either side (the
reference's bucket-exclusion semantics,
/root/reference/src/niqki_index.cpp:633-687); 0/1 bf16 products are exact
and the f32 accumulation is exact for counts <= F < 2^24.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FC = 8           # fingerprint slots per one-hot block (bounds the one-hot
                 # materialization: G_TILE x FC x 2^W bf16)
G_TILE = 2048    # index rows per dot_general
Q_TILE = 96      # query rows per dispatch (mirrors bcount.BLOCK_Q)


@functools.partial(jax.jit, static_argnames=("W",))
def _mxu_count_tile(q, x, *, W: int):
    """(Qt, F) x (Gt, F) int32 -> (Qt, Gt) int32 exact equality counts via
    blocked one-hot bf16 matmuls (f32 accumulation)."""
    Qt, F = q.shape
    Gt = x.shape[0]
    V = 1 << W
    nb = F // FC

    def body(acc, fi):
        qs = jax.lax.dynamic_slice(q, (0, fi * FC), (Qt, FC))
        xs = jax.lax.dynamic_slice(x, (0, fi * FC), (Gt, FC))
        qoh = jax.nn.one_hot(qs, V, dtype=jnp.bfloat16).reshape(Qt, FC * V)
        xoh = jax.nn.one_hot(xs, V, dtype=jnp.bfloat16).reshape(Gt, FC * V)
        p = jax.lax.dot_general(qoh, xoh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return acc + p, None

    acc, _ = jax.lax.scan(body, jnp.zeros((Qt, Gt), jnp.float32),
                          jnp.arange(nb))
    return acc.astype(jnp.int32)


def available(F: int, W: int | None = None) -> bool:
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return F % FC == 0 and (W is None or 1 <= W <= 14)


def match_counts_mxu(q_np: np.ndarray, mat: np.ndarray, W: int) -> np.ndarray:
    """counts (Q, G) int32 of host queries against a host int matrix,
    tiled (Q_TILE, G_TILE) per dispatch. Prototype route: the index-side
    one-hot is rebuilt per tile (at the measured ~100x kernel deficit,
    caching it would not change the verdict)."""
    q = np.atleast_2d(np.asarray(q_np, np.int32))
    g = np.asarray(mat, np.int32)
    Q, F = q.shape
    G = g.shape[0]
    out = np.empty((Q, G), np.int32)
    for qlo in range(0, Q, Q_TILE):
        qs = jnp.asarray(q[qlo:qlo + Q_TILE])
        for glo in range(0, G, G_TILE):
            xs = jnp.asarray(g[glo:glo + G_TILE])
            out[qlo:qlo + Q_TILE, glo:glo + G_TILE] = np.asarray(
                _mxu_count_tile(qs, xs, W=W))
    return out
