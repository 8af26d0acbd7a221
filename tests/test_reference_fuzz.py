"""Randomized end-to-end parity vs the reference binary itself.

The reference is compiled on demand from /root/reference (skipped when the
source or toolchain is absent) and both engines run on freshly generated
random genomes across parameter combinations — outputs must match
byte-for-byte. This catches parity drift that fixed fixtures cannot.

Single-record files only: the reference's whole-file mode infinite-loops on
multi-record FASTA (densification empty-count bug, SURVEY.md §8).
"""

import gzip
import pathlib
import subprocess

import numpy as np
import pytest

from niqki_tpu import cli

REF_SRC = pathlib.Path("/root/reference/src")


@pytest.fixture(scope="session")
def ref_binary(tmp_path_factory):
    if not REF_SRC.exists():
        pytest.skip("reference source not available")
    exe = tmp_path_factory.mktemp("refbin") / "niqki"
    cmd = ["g++", "-O2", "-std=c++11", "-fopenmp", "-include", "array",
           "-o", str(exe),
           str(REF_SRC / "niqki.cpp"), str(REF_SRC / "niqki_index.cpp"),
           str(REF_SRC / "genome.cpp"), "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
    except Exception:
        pytest.skip("cannot compile reference binary")
    return exe


def _make_genomes(tmp_path, seed, n_files=3, min_len=400, max_len=3000,
                  gzipped=False, cols=0):
    """Random single-record FASTA files; optionally gzip-compressed and/or
    wrapped at ``cols`` columns (multi-line records)."""
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACGTACGTACGTNacgt", dtype=np.uint8)
    paths = []
    for i in range(n_files):
        n = int(rng.integers(min_len, max_len))
        seq = rng.choice(alphabet, n).tobytes().decode()
        if cols:
            seq = "\n".join(seq[j:j + cols] for j in range(0, len(seq), cols))
        name = f"g{i}.fa" + (".gz" if gzipped else "")
        body = f">g{i}\n{seq}\n"
        if gzipped:
            (tmp_path / name).write_bytes(gzip.compress(body.encode()))
        else:
            (tmp_path / name).write_text(body)
        paths.append(name)
    fof = tmp_path / "fof.txt"
    fof.write_text("".join(f"{p}\n" for p in paths))
    return fof


def _run_ref(exe, args, cwd):
    subprocess.run([str(exe)] + args, cwd=cwd, check=True,
                   capture_output=True, timeout=300,
                   env={"OMP_NUM_THREADS": "1", "PATH": "/usr/bin:/bin"})


CASES = [
    ["-S", "6", "-K", "21"],
    ["-S", "7", "-K", "15", "-W", "14", "-H", "6"],
    ["-S", "5", "-K", "31", "-W", "10", "-H", "2"],
    ["-S", "8", "-K", "21", "-G", "5000"],        # -G stale-constant path
    ["-S", "6", "-K", "21", "-J", "0.4"],          # reporting threshold
    ["-S", "5", "-K", "5"],                        # tiny k-mers
    ["-S", "5", "-K", "2"],                        # K=2: the validation cap
    ["-S", "5", "-K", "21", "-W", "16", "-H", "4"],  # W>14: int32 count path
    ["-S", "6", "-K", "21", "-W", "8", "-H", "3"],   # lF<=7: uint8 counters
]


def test_many_files_multiwindow_parity(ref_binary, tmp_path):
    """20 genomes: our windowed pipeline spans multiple windows while the
    reference streams serially — outputs must still match byte-for-byte."""
    fof = _make_genomes(tmp_path, 1234, n_files=20)
    case = ["-S", "6", "-K", "21"]
    _run_ref(ref_binary, ["-M", "fof.txt", "-O", "ref_m.gz"] + case,
             tmp_path)
    rc = cli.main(["-M", str(fof), "-O", str(tmp_path / "our_m.gz")] + case)
    assert rc == 0
    assert gzip.open(tmp_path / "our_m.gz").read() == \
        gzip.open(tmp_path / "ref_m.gz").read()


def test_lines_mode_parity(ref_binary, tmp_path):
    """-i/-l per-record mode on a multi-record FASTA and a FASTQ."""
    rng = np.random.default_rng(5)
    alphabet = np.frombuffer(b"ACGTACGTNacgt", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    fa.write_text("".join(
        f">r{i}\n{rng.choice(alphabet, int(rng.integers(60, 400))).tobytes().decode()}\n"
        for i in range(12)))
    fq = tmp_path / "reads.fq"
    fq.write_text("".join(
        f"@q{i}\n{rng.choice(alphabet, 150).tobytes().decode()}\n+\n{'I'*150}\n"
        for i in range(8)))
    for inp in ("reads.fa", "reads.fq"):
        case = ["-S", "5", "-K", "21"]
        _run_ref(ref_binary,
                 ["-i", inp, "-l", inp, "-O", f"ref_{inp}.gz"] + case,
                 tmp_path)
        rc = cli.main(["-i", str(tmp_path / inp), "-l", str(tmp_path / inp),
                       "-O", str(tmp_path / f"our_{inp}.gz")] + case)
        assert rc == 0
        assert gzip.open(tmp_path / f"our_{inp}.gz").read() == \
            gzip.open(tmp_path / f"ref_{inp}.gz").read(), inp


def test_dump_load_roundtrip_parity(ref_binary, tmp_path):
    """Our dump must load in byte-identical form to the reference's own, and
    both engines must answer identically from their loaded indexes."""
    fof = _make_genomes(tmp_path, 99)
    case = ["-S", "7", "-K", "21"]
    _run_ref(ref_binary, ["-I", "fof.txt", "-D", "ref.dump",
                          "-O", "n1.gz"] + case, tmp_path)
    rc = cli.main(["-I", str(fof), "-D", str(tmp_path / "our.dump"),
                   "-O", str(tmp_path / "n2.gz")] + case)
    assert rc == 0
    assert gzip.open(tmp_path / "our.dump").read() == \
        gzip.open(tmp_path / "ref.dump").read()
    # cross-load: query the REFERENCE's dump with our engine
    _run_ref(ref_binary, ["-L", "ref.dump", "-Q", "fof.txt",
                          "-O", "ref_h.gz"], tmp_path)
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = cli.main(["-L", "ref.dump", "-Q", "fof.txt",
                       "-O", str(tmp_path / "our_h.gz")])
    finally:
        os.chdir(cwd)
    assert rc == 0
    assert gzip.open(tmp_path / "our_h.gz").read() == \
        gzip.open(tmp_path / "ref_h.gz").read()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "case", CASES,
    ids=["s6", "w14h6", "w10h2", "gtune", "minjac", "k5", "k2", "w16",
         "w8"])
def test_matrix_and_hits_parity(ref_binary, tmp_path, seed, case):
    fof = _make_genomes(tmp_path, seed * 7919 + len(case))
    _run_ref(ref_binary, ["-M", "fof.txt", "-O", "ref_m.gz"] + case,
             tmp_path)
    rc = cli.main(["-M", str(fof), "-O", str(tmp_path / "our_m.gz")] + case)
    assert rc == 0
    assert gzip.open(tmp_path / "our_m.gz").read() == \
        gzip.open(tmp_path / "ref_m.gz").read()

    _run_ref(ref_binary,
             ["-I", "fof.txt", "-Q", "fof.txt", "-O", "ref_h.gz"] + case,
             tmp_path)
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)  # -Q resolves from CWD
    try:
        rc = cli.main(["-I", str(fof), "-Q", str(fof),
                       "-O", str(tmp_path / "our_h.gz")] + case)
    finally:
        os.chdir(cwd)
    assert rc == 0
    assert gzip.open(tmp_path / "our_h.gz").read() == \
        gzip.open(tmp_path / "ref_h.gz").read()


def test_gzipped_multiline_parity(ref_binary, tmp_path):
    """Gzip-compressed, 60-column multi-line FASTA inputs (the common NCBI
    shape) through both engines — matrix + hits byte parity."""
    fof = _make_genomes(tmp_path, 4242, n_files=5, gzipped=True, cols=60)
    case = ["-S", "6", "-K", "21"]
    _run_ref(ref_binary, ["-M", "fof.txt", "-O", "ref_m.gz"] + case,
             tmp_path)
    rc = cli.main(["-M", str(fof), "-O", str(tmp_path / "our_m.gz")] + case)
    assert rc == 0
    assert gzip.open(tmp_path / "our_m.gz").read() == \
        gzip.open(tmp_path / "ref_m.gz").read()


@pytest.mark.parametrize("S", [12, 13])
def test_bigger_genomes_high_S_parity(ref_binary, tmp_path, S):
    """S=12/13 with 20-60 kb genomes: the defaults-adjacent regime the
    small fuzz families never reach (single seed, bigger sequences)."""
    fof = _make_genomes(tmp_path, 31337 + S, n_files=3,
                        min_len=20_000, max_len=60_000)
    case = ["-S", str(S), "-K", "31"]
    _run_ref(ref_binary, ["-M", "fof.txt", "-O", "ref_m.gz"] + case,
             tmp_path)
    rc = cli.main(["-M", str(fof), "-O", str(tmp_path / "our_m.gz")] + case)
    assert rc == 0
    assert gzip.open(tmp_path / "our_m.gz").read() == \
        gzip.open(tmp_path / "ref_m.gz").read()


def test_fastq_whole_file_parity(ref_binary, tmp_path):
    """Whole-file mode on single-record FASTQ files (the reference's
    Biogetline 4-line branch; safe from the multi-record FASTA hang)."""
    rng = np.random.default_rng(777)
    alphabet = np.frombuffer(b"ACGTNacgt", dtype=np.uint8)
    names = []
    for i in range(4):
        n = int(rng.integers(500, 2500))
        seq = rng.choice(alphabet, n).tobytes().decode()
        name = f"q{i}.fq"
        (tmp_path / name).write_text(f"@q{i}\n{seq}\n+\n{'I' * n}\n")
        names.append(name)
    fof = tmp_path / "fof.txt"
    fof.write_text("".join(f"{p}\n" for p in names))
    case = ["-S", "6", "-K", "21"]
    _run_ref(ref_binary, ["-M", "fof.txt", "-O", "ref_m.gz"] + case,
             tmp_path)
    rc = cli.main(["-M", str(fof), "-O", str(tmp_path / "our_m.gz")] + case)
    assert rc == 0
    assert gzip.open(tmp_path / "our_m.gz").read() == \
        gzip.open(tmp_path / "ref_m.gz").read()


def test_load_with_G_parity(ref_binary, tmp_path):
    """-L + -G combined: auto-tuning H on a LOADED index (stale-constant
    quirk applied post-load) must answer queries identically."""
    fof = _make_genomes(tmp_path, 555)
    base = ["-S", "8", "-K", "21"]
    _run_ref(ref_binary, ["-I", "fof.txt", "-D", "ref.dump",
                          "-O", "n1.gz"] + base, tmp_path)
    _run_ref(ref_binary, ["-L", "ref.dump", "-G", "5000", "-Q", "fof.txt",
                          "-O", "ref_h.gz"], tmp_path)
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = cli.main(["-L", "ref.dump", "-G", "5000", "-Q", "fof.txt",
                       "-O", str(tmp_path / "our_h.gz")])
    finally:
        os.chdir(cwd)
    assert rc == 0
    assert gzip.open(tmp_path / "our_h.gz").read() == \
        gzip.open(tmp_path / "ref_h.gz").read()


def test_host_sketch_route_parity(ref_binary, tmp_path, monkeypatch):
    """NIQKI_TPU_SKETCH=host: the staged native whole-file sketcher (and
    full-host lines mode) against the reference binary — matrix, hits and
    lines outputs byte-for-byte."""
    monkeypatch.setenv("NIQKI_TPU_SKETCH", "host")
    fof = _make_genomes(tmp_path, 777, n_files=6)
    case = ["-S", "6", "-K", "21"]
    _run_ref(ref_binary, ["-M", "fof.txt", "-O", "ref_m.gz"] + case,
             tmp_path)
    rc = cli.main(["-M", str(fof), "-O", str(tmp_path / "our_m.gz")] + case)
    assert rc == 0
    assert gzip.open(tmp_path / "our_m.gz").read() == \
        gzip.open(tmp_path / "ref_m.gz").read()
    # hits mode: build + query the same fof (re-sketches every file)
    _run_ref(ref_binary, ["-I", "fof.txt", "-Q", "fof.txt",
                          "-O", "ref_h.gz"] + case, tmp_path)
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["-I", str(fof), "-Q", str(fof),
                   "-O", str(tmp_path / "our_h.gz")] + case)
    assert rc == 0
    assert gzip.open(tmp_path / "our_h.gz").read() == \
        gzip.open(tmp_path / "ref_h.gz").read()
