"""BASELINE config 3: S=18 "large sketches with -G" — dump/load parity at
the 2^30-bucket scale (reference dump stream = 2^(S+W) = 2^30 size words,
4.3 GB decompressed; F=262144 changes every sketch/stream shape on our
side: psort row padding, the dump writer's bucket scatter, the incremental
dump scanner).

The reference side allocates 2^30 posting-list vector headers (~24 GiB
RSS; /root/reference/src/niqki_index.cpp:27) — ~2.5 min per run in this
host's good memory regime, much longer in its pathological paging regime
(hostmem.py docs). Each reference run is therefore bounded by a timeout
and the module SKIPS (never false-passes) when the host can't finish.
Measured on this machine: reference -I -D 141 s / our side 16 s; dumps
byte-identical at 4,295,590,867 decompressed bytes.
"""

import gzip
import os
import pathlib
import subprocess

import pytest

from niqki_tpu import cli

RESOURCES = pathlib.Path("/root/reference/resources")
REF_SRC = pathlib.Path("/root/reference/src")
CASE = ["-S", "18", "-G", "5000000"]     # -G picks H=3 over default H=4
REF_TIMEOUT = 1800


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    if not REF_SRC.exists():
        pytest.skip("reference source not available")
    exe = tmp_path_factory.mktemp("refbin18") / "niqki"
    cmd = ["g++", "-O2", "-std=c++11", "-fopenmp", "-include", "array",
           "-o", str(exe),
           str(REF_SRC / "niqki.cpp"), str(REF_SRC / "niqki_index.cpp"),
           str(REF_SRC / "genome.cpp"), "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
    except Exception:
        pytest.skip("cannot compile reference binary")
    return exe


def _run_ref(exe, args):
    env = {"OMP_NUM_THREADS": "1", "PATH": "/usr/bin:/bin"}
    try:
        subprocess.run([str(exe)] + args, cwd=RESOURCES, check=True,
                       capture_output=True, timeout=REF_TIMEOUT, env=env)
    except subprocess.TimeoutExpired:
        pytest.skip(f"reference S=18 run exceeded {REF_TIMEOUT}s (2^30 "
                    "bucket alloc in the host's slow paging regime)")


def _gz_equal(a, b) -> bool:
    """Chunked decompressed-byte comparison (the streams are 4.3 GB)."""
    with gzip.open(a, "rb") as fa, gzip.open(b, "rb") as fb:
        while True:
            ca, cb = fa.read(1 << 24), fb.read(1 << 24)
            if ca != cb:
                return False
            if not ca:
                return True


@pytest.fixture(scope="module")
def s18_dumps(ref_binary, tmp_path_factory):
    if not RESOURCES.exists():
        pytest.skip("reference resources not available")
    d = tmp_path_factory.mktemp("s18")
    ref_dump = d / "ref.dump"
    our_dump = d / "our.dump"
    _run_ref(ref_binary, ["-I", "file_of_file.txt", *CASE,
                          "-D", str(ref_dump), "-O", str(d / "r.gz")])
    os.environ["NIQKI_TPU_SKETCH"] = "host"   # CPU device path at F=262144
    try:                                      # is pointless in a test
        rc = cli.main(["-I", str(RESOURCES / "file_of_file.txt"), *CASE,
                       "-D", str(our_dump), "-O", str(d / "o.gz")])
    finally:
        os.environ.pop("NIQKI_TPU_SKETCH", None)
    assert rc == 0
    return ref_dump, our_dump, d


def test_s18_dump_parity(s18_dumps):
    ref_dump, our_dump, _ = s18_dumps
    assert _gz_equal(ref_dump, our_dump), \
        "S=18 -G dump bytes diverge from the reference"


def test_s18_crossload_query_parity(ref_binary, s18_dumps, monkeypatch):
    """Load the OTHER engine's 2^30-bucket dump and answer the 9-genome
    query fof — outputs must match byte-for-byte (exercises the reference's
    -L min_score/stale-constant quirks at S=18 on both sides)."""
    ref_dump, our_dump, d = s18_dumps
    _run_ref(ref_binary, ["-L", str(our_dump), "-Q", "file_of_file.txt",
                          "-O", str(d / "ref_hits.gz")])
    monkeypatch.setenv("NIQKI_TPU_SKETCH", "host")
    monkeypatch.chdir(RESOURCES)
    rc = cli.main(["-L", str(ref_dump), "-Q", "file_of_file.txt",
                   "-O", str(d / "our_hits.gz")])
    assert rc == 0
    assert gzip.open(d / "our_hits.gz").read() == \
        gzip.open(d / "ref_hits.gz").read()
