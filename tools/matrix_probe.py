"""Decompose the all-vs-all self-join block wall time on the real chip.

The matrix path (engine._query_matrix_selfjoin) measured 688 rows/s at
G=10240 while the raw count kernel at that G would sustain ~16k q/s — this
probe isolates, per MATRIX_BLOCK=768-row dispatch:

  kern      the 8x _bcount_call count sweep alone (tiny (B,) reduce, no d2h)
  +topk     count + uint16 wrap + lax.top_k(cap) (tiny reduce, no d2h)
  sparse    the production _self_join_topk incl. the (B, cap) x2 d2h
  dense     the production _self_join_dense incl. the (B, Gp) uint16 d2h

Fresh bytes per rep via a device-side xor of the planes (the transport
memoizes identical (kernel, input) executions).

Run: python tools/matrix_probe.py [--genomes 10240] [--cap 1024] [--reps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=10240)
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--lF", type=int, default=12,
                    help="12 = the bench_matrix config (F=4096); 15 = the "
                         "golden S=15 config (F=32768)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from niqki_tpu.ops import bcount

    W, F = 12, 1 << args.lF
    G = args.genomes
    Gp = -(-G // bcount.TILE_G) * bcount.TILE_G
    L = F // 32
    B = bcount.MATRIX_BLOCK
    cap = args.cap
    print(f"devices={jax.devices()} G={G} B={B} cap={cap}",
          file=sys.stderr, flush=True)

    @jax.jit
    def synth(key):
        bits = jax.random.bits(key, (W, Gp, L), dtype=jnp.uint32)
        return jnp.concatenate([bits, jnp.zeros((1, Gp, L), jnp.uint32)], 0)

    xp0 = jax.block_until_ready(synth(jax.random.PRNGKey(0)))

    def fresh(r):
        # xor value planes only (sentinel plane must stay 0s)
        return jax.block_until_ready(jnp.concatenate(
            [xp0[:W] ^ np.uint32(r + 1), xp0[W:]], 0))

    @jax.jit
    def kern_only(xp):
        qp = bcount._planes_as_queries(xp, 0, B)
        outs = [bcount._bcount_call(qp[:, o:o + bcount.BLOCK_Q], xp)
                for o in range(0, B, bcount.BLOCK_Q)]
        c = jnp.concatenate(outs, axis=0)
        return c.sum(axis=1, dtype=jnp.int32)  # tiny d2h

    @jax.jit
    def kern_topk(xp):
        qp = bcount._planes_as_queries(xp, 0, B)
        outs = [bcount._bcount_call(qp[:, o:o + bcount.BLOCK_Q], xp)
                for o in range(0, B, bcount.BLOCK_Q)]
        c = jnp.concatenate(outs, axis=0) & 0xFFFF
        vals, idx = jax.lax.top_k(c, cap)
        return vals.sum(axis=1, dtype=jnp.int32)  # tiny d2h

    variants = {
        "kern": lambda xp: np.asarray(kern_only(xp)),
        "+topk": lambda xp: np.asarray(kern_topk(xp)),
        # min_score=204 (the bench_matrix J=0.05 threshold): with random
        # planes counts are ~1, so nearly everything masks to (0, 0) —
        # the d2h ships compressor-friendly zeros like a sparse-hit
        # production block does
        "sparse": lambda xp: tuple(np.asarray(a) for a in
                                   bcount._self_join_topk(xp, 0, 204, B=B,
                                                          cap=cap)),
        "sparse-all": lambda xp: tuple(np.asarray(a) for a in
                                       bcount._self_join_topk(xp, 0, 1, B=B,
                                                              cap=cap)),
        "dense": lambda xp: np.asarray(
            bcount._self_join_dense(xp, 0, B=B)),
    }
    for vi, (name, fn) in enumerate(variants.items()):
        fn(xp0)  # warm compile
        best = float("inf")
        for r in range(args.reps):
            # deterministic per-variant constant (Python's str hash is
            # randomized per process, which made timings vs the memoizing
            # transport irreproducible across probe runs)
            xpr = fresh(r * 17 + vi)
            t0 = time.time()
            fn(xpr)
            best = min(best, time.time() - t0)
        print(f"{name:8s} {best*1e3:8.1f} ms/block  "
              f"{B/best:8.0f} rows/s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
