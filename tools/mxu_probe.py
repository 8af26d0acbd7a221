"""MXU one-hot-matmul count (ops/mxucount) vs the bcount bit-plane kernel:
parity gate + throughput on the real chip. Produces the NIQKI_TPU_COUNT=mxu
verdict recorded in README.

Run: python tools/mxu_probe.py [--genomes 2048] [--queries 96]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=2048)
    ap.add_argument("--queries", type=int, default=96)
    ap.add_argument("--F", type=int, default=32768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from niqki_tpu.ops import bcount, mxucount

    W, F, G, Q = 12, args.F, args.genomes, args.queries
    print(f"devices={jax.devices()} G={G} Q={Q} F={F}",
          file=sys.stderr, flush=True)
    rng = np.random.default_rng(3)
    g = rng.integers(0, 1 << W, (G, F), dtype=np.int32)
    g[5, :100] = -2                      # stored sentinels
    q = rng.integers(0, 1 << W, (Q, F), dtype=np.int32)
    q[0] = g[7]                          # guaranteed full-row hit
    q[1, ::5] = -3                       # query sentinels

    # --- parity gate ------------------------------------------------------
    xp = bcount.build_index_planes(g, W)
    want = np.asarray(bcount.match_counts_planes(q, xp, G, W,
                                                 sanitized=True))
    t0 = time.time()
    got = mxucount.match_counts_mxu(q, g, W)
    mxu_wall = time.time() - t0          # includes compile; re-time below
    np.testing.assert_array_equal(got, want)
    print("parity: mxu == bcount  OK", flush=True)

    # --- throughput (compile-warm, fresh bytes) ---------------------------
    t0 = time.time()
    mxucount.match_counts_mxu(np.where(q < 0, -3, q ^ 1), g, W)
    mxu_wall = time.time() - t0

    qp = jax.block_until_ready(bcount.pack_bitplanes(
        jnp.asarray(np.where(q < 0, -3, q ^ 1)), W=W, query=True))
    np.asarray(bcount._bcount_call(qp, xp))  # warm
    qp2 = jax.block_until_ready(qp ^ np.uint32(7))
    t0 = time.time()
    np.asarray(bcount._bcount_call(qp2, xp))
    b_wall = time.time() - t0

    macs = Q * G * F * (1 << W)
    print(f"mxu:    {mxu_wall:8.3f} s  {Q/mxu_wall:8.2f} q/s  "
          f"({macs/mxu_wall/1e12:.1f} TMAC/s sustained)")
    print(f"bcount: {b_wall:8.3f} s  {Q/b_wall:8.2f} q/s")
    print(f"verdict: mxu is {mxu_wall/b_wall:.0f}x slower at G={G} "
          f"(both scale linearly in G)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
