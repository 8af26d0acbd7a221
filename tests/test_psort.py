"""Pallas bitonic sort vs np.sort (interpret mode on CPU).

Sizes are kept small: interpret mode executes every network stage
elementwise. chunk_log=10 at N=2^12..2^13 exercises the cross-chunk merge
stages and the in-chunk tails; duplicates and already-sorted inputs cover
the network's data-oblivious edge cases.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from niqki_tpu.ops.psort import sort_i32_pow2


@pytest.mark.parametrize("m,chunk_log", [(10, 10), (12, 10), (13, 11)])
def test_sort_random(m, chunk_log):
    rng = np.random.default_rng(m)
    x = rng.integers(-2**31, 2**31, 1 << m).astype(np.int32)
    got = np.asarray(sort_i32_pow2(jnp.asarray(x), interpret=True,
                                   chunk_log=chunk_log))
    assert np.array_equal(got, np.sort(x))


def test_sort_duplicates_and_sorted():
    rng = np.random.default_rng(0)
    n = 1 << 12
    for x in (rng.integers(0, 7, n).astype(np.int32),
              np.arange(n, dtype=np.int32),
              np.arange(n, 0, -1).astype(np.int32),
              np.full(n, 42, np.int32)):
        got = np.asarray(sort_i32_pow2(jnp.asarray(x), interpret=True,
                                       chunk_log=10))
        assert np.array_equal(got, np.sort(x))


def test_sort_batch():
    from niqki_tpu.ops.psort import sort_i32_pow2_batch
    rng = np.random.default_rng(7)
    x = rng.integers(-2**31, 2**31, (3, 1 << 12)).astype(np.int32)
    got = np.asarray(sort_i32_pow2_batch(jnp.asarray(x), interpret=True,
                                         chunk_log=10))
    assert np.array_equal(got, np.sort(x, axis=1))


def test_pallas_count_matches_dense():
    from niqki_tpu.ops.pcount import match_counts_pallas
    from niqki_tpu.ops.count import match_counts
    rng = np.random.default_rng(11)
    F, G, Q = 256, 300, 5          # G, Q deliberately unaligned
    g = rng.integers(0, 4096, (G, F)).astype(np.int16)
    q = rng.integers(0, 4096, (Q, F)).astype(np.int16)
    q[2] = g[77]                    # exact duplicate counts F
    got = np.asarray(match_counts_pallas(jnp.asarray(q), jnp.asarray(g),
                                         block_q=4, interpret=True))
    want = np.asarray(match_counts(jnp.asarray(q.astype(np.int32)),
                                   jnp.asarray(g.astype(np.int32))))
    assert np.array_equal(got, want)
    assert got[2, 77] == F
