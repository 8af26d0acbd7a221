"""Benchmark: the reference's headline workload on real TPU hardware.

Workload: all-vs-all Jaccard matrix of the 9 bundled E. coli genomes at the
reference defaults (K=31, S=15, W=12, H=4) — end-to-end wall time including
gzip decode, encoding, device sketching, densification, counting, and gzip
output, with outputs verified byte-for-byte against the reference fixture.

Baseline (BASELINE.md): the reference's own internal timers on this exact
workload sum to 4.41 s single-threaded (1.65 s indexing + 2.76 s matrix);
its *process* wall time is ~240 s (2^27 posting-list teardown), which we
charitably exclude.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import gzip
import json
import os
import sys
import tempfile
import time

REFERENCE_INTERNAL_S = 4.41  # reference indexing+matrix timers, 1 thread
FOF = "/root/reference/resources/file_of_file.txt"
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tests", "fixtures", "matrix_s15.gz")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_once(out_path: str):
    from niqki_tpu import SketchIndex, SketchParams, engine
    from niqki_tpu.io.writers import GzTextWriter
    t0 = time.time()
    idx = SketchIndex(SketchParams())
    engine.insert_fof_whole(idx, FOF)
    with GzTextWriter(out_path) as out:
        engine.query_matrix(idx, out)
    return time.time() - t0, idx


def kernel_parity_gate(idx) -> bool:
    """Byte-compare the compiled Pallas count kernels (pcount pair-packed,
    bcount bit-plane) against the XLA path ON THE REAL CHIP at a G large
    enough to route through them (the golden matrix at G=9 uses the XLA
    path, so a Mosaic miscompile would otherwise ship silently)."""
    import numpy as np
    from niqki_tpu import SketchIndex
    n_rep = -(-4104 // idx.G)
    big = SketchIndex(idx.params)
    big._mat = np.tile(idx.matrix(), (n_rep, 1))[:4104]
    big.names = [f"t{i}" for i in range(len(big._mat))]
    q = idx.matrix()
    results = {}
    for mode in ("xla", "pcount", "bcount"):
        os.environ["NIQKI_TPU_COUNT"] = mode
        big._device_mat = big._device_packed = big._device_planes = None
        t0 = time.time()
        results[mode] = big.counts(q)
        log(f"parity gate {mode}: {time.time() - t0:.2f}s")
    os.environ.pop("NIQKI_TPU_COUNT", None)
    ok = (results["xla"] == results["pcount"]).all() and \
         (results["xla"] == results["bcount"]).all()
    log(f"pallas kernel parity vs XLA at G={big.G}: {ok}")
    return bool(ok) and wide_shape_parity_gates()


def wide_shape_parity_gates() -> bool:
    """Extra real-chip kernel-shape gates (VERDICT r5 item 5): the W=12
    gate above covers only the split-wire int16 planes shape, but Mosaic
    miscompiles are chip- and shape-specific (CLAUDE.md's own kernel
    gotchas), so one gate each for W=14 (int16 wire, no split), W=16
    (int32 planes path), and the fused pack+count+top_k dispatch — all
    byte-compared against the XLA path / dense formatter on the chip."""
    import numpy as np
    from niqki_tpu import SketchIndex, SketchParams, native
    ok = True
    rng = np.random.default_rng(5)
    for W in (14, 16):
        p = SketchParams(lF=12, W=W, H=4)
        gate = SketchIndex(p)
        gate._mat = rng.integers(-1, p.fingerprint_range,
                                 (4104, p.F)).astype(np.int32)
        gate.names = [f"t{i}" for i in range(4104)]
        q = gate._mat[:32].copy()
        res = {}
        for mode in ("xla", "bcount"):
            os.environ["NIQKI_TPU_COUNT"] = mode
            gate._device_mat = gate._device_packed = None
            gate._device_planes = None
            res[mode] = gate.counts(q)
        os.environ.pop("NIQKI_TPU_COUNT", None)
        w_ok = bool((res["xla"] == res["bcount"]).all())
        log(f"parity gate W={W} bcount vs xla: {w_ok}")
        ok = ok and w_ok
    # fused pack+count+top_k (the sparse hit path) vs dense formatting
    p = SketchParams(lF=12, min_fract=0.02)
    gate = SketchIndex(p)
    base = rng.integers(0, p.fingerprint_range, (8, p.F)).astype(np.int32)
    rows = base[rng.integers(0, 8, 4104)].copy()
    mut = rng.random(rows.shape) < 0.3
    rows[mut] = rng.integers(0, p.fingerprint_range, int(mut.sum()))
    gate._mat = rows
    gate.names = [f"t{i}" for i in range(4104)]
    q = rows[::137][:30].copy()
    headers = [f"q{i}" for i in range(len(q))]
    sparse = gate.pretty_hits_batch(q, headers)
    fmt = native.HitsFormatter(gate.names, p.F, p.min_score)
    dense = fmt.format(gate.counts(q), headers)
    t_ok = sparse is not None and sparse == dense
    log(f"parity gate top_k-fused sparse vs dense: {t_ok}")
    return ok and bool(t_ok)


def main():
    import jax
    log(f"devices: {jax.devices()}")
    with tempfile.TemporaryDirectory() as td:
        warm = os.path.join(td, "warm.gz")
        out = os.path.join(td, "matrix.gz")
        log("warmup (jit compile)...")
        t, _ = run_once(warm)
        log(f"warmup run: {t:.2f}s")
        # Best-of-5 with the full spread reported, every run parity-checked:
        # the transport adds multi-second outliers on bad nights that are
        # not the engine's steady state (each run re-reads, re-sketches and
        # re-counts — nothing is memoized across runs on the host side), and
        # a sub-0.1 s workload needs the spread visible so round-over-round
        # numbers don't read transport weather as regressions.
        reps = []
        for rep in range(5):
            t1, idx = run_once(out)
            log(f"timed run {rep}: {t1:.2f}s")
            with gzip.open(out) as f, gzip.open(GOLDEN) as g:
                ok = f.read() == g.read()
            if not ok:
                log("output matches reference golden: False")
                print(json.dumps({"metric": "ecoli9_matrix_s15_PARITY_FAIL",
                                  "value": 0.0, "unit": "s",
                                  "vs_baseline": 0.0}))
                return 1
            reps.append(t1)
        t = min(reps)
        log("output matches reference golden: True (all reps)")
        if not kernel_parity_gate(idx):
            print(json.dumps({"metric": "pallas_count_PARITY_FAIL",
                              "value": 0.0, "unit": "s", "vs_baseline": 0.0}))
            return 1
    med = sorted(reps)[len(reps) // 2]
    print(json.dumps({
        "metric": "ecoli9_allvsall_matrix_s15_wall",
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(REFERENCE_INTERNAL_S / t, 2),
        "median_s": round(med, 4),
        "vs_baseline_median": round(REFERENCE_INTERNAL_S / med, 2),
        "reps_s": [round(x, 4) for x in reps],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
