"""E2e count-rate probe at G=100k, F=32768: the production pipelined path
(bcount.match_counts_planes) with each wire format, fresh bytes per rep.

Run: python tools/e2e_probe.py [--queries 288] [--reps 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=288)
    ap.add_argument("--genomes", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--wires", default="int16,split")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from niqki_tpu.ops import bcount

    W, F = 12, 32768
    G = args.genomes
    Gp = -(-G // bcount.TILE_G) * bcount.TILE_G
    L = F // 32
    print(f"devices={jax.devices()} G={G} Q={args.queries}",
          file=sys.stderr, flush=True)

    @jax.jit
    def synth(key):
        bits = jax.random.bits(key, (W, Gp, L), dtype=jnp.uint32)
        return jnp.concatenate([bits, jnp.zeros((1, Gp, L), jnp.uint32)], 0)

    xp = jax.block_until_ready(synth(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(7)
    qnp = rng.integers(0, 1 << W, (args.queries, F), dtype=np.int32)
    Q = qnp.shape[0]

    @jax.jit
    def hits_reduce(c):
        return (c >= 1638).sum(axis=1, dtype=jnp.int32)

    def fresh(r):
        q = qnp ^ (r + 1)
        return np.where((q < 0) | (q >= (1 << W)), -3, q)

    for wire in args.wires.split(","):
        os.environ["NIQKI_TPU_WIRE"] = wire
        def run(q):
            t0 = time.time()
            c = bcount.match_counts_planes(q, xp, Gp, W, sanitized=True)
            np.asarray(hits_reduce(c))
            return time.time() - t0
        run(fresh(0))  # warm
        walls = [run(fresh(100 * (args.wires.split(",").index(wire) + 1) + r))
                 for r in range(args.reps)]
        best = min(walls)
        print(f"{wire:6s} best {best:.3f} s  {Q/best:7.1f} q/s   "
              f"all: {['%.3f' % w for w in walls]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
