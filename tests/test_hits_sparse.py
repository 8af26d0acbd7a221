"""Sparse top-k hit path (index.pretty_hits_batch + nq_format_hits_sparse):
byte parity with the dense HitsFormatter path, including overflow rows,
sentinel queries, and reference hit ordering (count desc, gid desc).
"""

import numpy as np
import pytest

from niqki_tpu import SketchIndex, SketchParams, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _index_with_clusters(G, p, seed):
    rng = np.random.default_rng(seed)
    idx = SketchIndex(p)
    base = rng.integers(0, p.fingerprint_range, p.F).astype(np.int32)
    for i in range(G):
        if i % 3 == 0:
            sk = base.copy()                     # a big tie cluster
            sk[: i % 7] = (base[: i % 7] + 1) % p.fingerprint_range
        else:
            sk = rng.integers(0, p.fingerprint_range, p.F).astype(np.int32)
        idx.insert_sketch(sk, f"g{i}")
    return idx


def test_pretty_hits_batch_matches_dense(monkeypatch):
    # force eligibility at a test-friendly size
    monkeypatch.setenv("NIQKI_TPU_COUNT", "bcount-interpret")
    monkeypatch.setenv("NIQKI_TPU_HITS_CAP", "256")
    p = SketchParams(lF=12, K=21, min_fract=0.05)
    idx = _index_with_clusters(30, p, 41)
    # the eligibility gate needs G >= 4096: repeat the 30 rows until big
    # enough — every genome then has ~reps exact copies (sparse rows) and
    # the every-3rd-row tie cluster has ~10x that (cap overflow rows)
    reps = -(-4096 // idx.G)
    big = SketchIndex(p)
    mat = idx.matrix()
    for r in range(reps):
        for i in range(idx.G):
            big.insert_sketch(mat[i], f"g{r}_{i}")
    q = mat[:5].copy()
    q[2, ::9] = -3
    headers = [f"q{i}" for i in range(len(q))]
    buf = big.pretty_hits_batch(q, headers)
    assert buf is not None
    fmt = native.HitsFormatter(big.names, p.F, p.min_score)
    want = fmt.format(big.counts(q), headers)
    assert buf == want
    # the tie cluster overflowed the 256-entry cap (dense fallback rows)
    # while plain rows stayed sparse — both subpaths exercised
    assert buf.count(b":") > 256


def test_pretty_hits_batch_ineligible_paths(monkeypatch):
    p = SketchParams(lF=12, K=21)          # min_score == 0
    idx = _index_with_clusters(8, p, 42)
    assert idx.pretty_hits_batch(idx.matrix()[:2], ["a", "b"]) is None
