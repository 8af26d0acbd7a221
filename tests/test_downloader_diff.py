"""True end-to-end -Iddl differential: the reference binary downloads over
a loopback HTTP server (wget against 127.0.0.1 — zero egress needed), our
downloader fetches the same fof, and both dumps must be byte-identical —
including the trailing-slash name quirk (skipped accession), the
never-flushed final contig, and the <=K-contig bleed
(/root/reference/src/niqki_index.cpp:789-870).
"""

import functools
import gzip
import http.server
import pathlib
import subprocess
import threading

import numpy as np
import pytest

from niqki_tpu import downloader
from niqki_tpu.index import SketchIndex
from niqki_tpu.params import SketchParams

REF_SRC = pathlib.Path("/root/reference/src")


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    if not REF_SRC.exists():
        pytest.skip("reference source not available")
    exe = tmp_path_factory.mktemp("refbin_dl") / "niqki"
    cmd = ["g++", "-O2", "-std=c++11", "-fopenmp", "-include", "array",
           "-o", str(exe),
           str(REF_SRC / "niqki.cpp"), str(REF_SRC / "niqki_index.cpp"),
           str(REF_SRC / "genome.cpp"), "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
    except Exception:
        pytest.skip("cannot compile reference binary")
    return exe


@pytest.fixture()
def http_root(tmp_path):
    """Serve tmp_path/www over loopback; yields (base_url, www_dir)."""
    www = tmp_path / "www"
    www.mkdir()
    class Quiet(http.server.SimpleHTTPRequestHandler):
        def log_message(self, *a, **k):
            pass

    handler = functools.partial(Quiet, directory=str(www))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", www
    srv.shutdown()


def _put_assembly(www, name, contigs):
    """<www>/<name>/<name>_genomic.fna.gz with the given contig sequences."""
    d = www / name
    d.mkdir()
    body = b"".join(b">%s_c%d desc\n%s\n" % (name.encode(), i, seq)
                    for i, seq in enumerate(contigs))
    (d / f"{name}_genomic.fna.gz").write_bytes(gzip.compress(body))


def test_iddl_differential_loopback(ref_binary, http_root, tmp_path):
    base, www = http_root
    rng = np.random.default_rng(44)

    def seq(n):
        return rng.choice(np.frombuffer(b"ACGT", np.uint8), n).tobytes()

    K = 31
    # acc1: two contigs — the FINAL one must be dropped by both engines
    _put_assembly(www, "GCA_0001", [seq(900), seq(700)])
    # acc2: short (<= K) first contig bleeds into the second; third dropped
    _put_assembly(www, "GCA_0002", [seq(K - 5), seq(800), seq(500)])
    # acc3: single contig -> dropped entirely -> accession skipped
    _put_assembly(www, "GCA_0003", [seq(600)])
    # acc4 exists but is referenced with a trailing slash in the fof: the
    # get_name_ncbi quirk keeps the slash, the fetch 404s, both skip it
    _put_assembly(www, "GCA_0004", [seq(600), seq(600)])
    # acc5: multi-MB asset with 80-column line wrapping — exercises the
    # STREAMING decode (zlib.decompressobj over response chunks, contig
    # accumulation across ~44k partial lines; the pre-r5 fetch buffered
    # the whole compressed asset + its inflation in RAM). EXACTLY ONE
    # flushed contig: an accession with >= 2 flushed contigs re-runs the
    # reference's compute_sketch on the same sketch vector, which is its
    # documented multi-record densify infinite-loop (it hangs the binary
    # here too — measured; the same divergence README documents for
    # whole-file mode, where we min-merge instead).
    def wrap(s):
        return b"\n".join(s[i:i + 80] for i in range(0, len(s), 80))
    _put_assembly(www, "GCA_0005", [wrap(seq(3_500_000)), seq(300)])
    # acc6: MULTI-MEMBER gzip (two concatenated members, like bgzip or a
    # re-chunked mirror) with the member boundary mid-contig —
    # wget|gzip -d inflates both; so must the incremental decoder
    d6 = www / "GCA_0006"
    d6.mkdir()
    full6 = b">GCA_0006_c0 d\n%s\n>GCA_0006_c1 d\n%s\n" % (wrap(seq(5000)),
                                                           seq(400))
    (d6 / "GCA_0006_genomic.fna.gz").write_bytes(
        gzip.compress(full6[:2000]) + gzip.compress(full6[2000:]))

    fof = tmp_path / "dl_fof.txt"
    fof.write_text(
        f"{base}/GCA_0001\n"
        f"{base}/GCA_0002\n"
        f"{base}/GCA_0003\n"
        f"{base}/GCA_0004/\n"
        f"{base}/GCA_0005\n"
        f"{base}/GCA_0006\n")

    # reference: single OpenMP thread -> deterministic fof insert order
    ref_dump = tmp_path / "ref_dump.bin"
    r = subprocess.run(
        # NOTE: the reference's '-Iddl' "short" option is unparsable as a
        # short flag (optionparser treats each char separately and 'I' is
        # taken); only the long form works.
        [str(ref_binary), "--indexdownload", str(fof), "-S", "10", "-D",
         str(ref_dump)],
        capture_output=True, timeout=300, cwd=str(tmp_path),
        env={"PATH": "/usr/bin:/bin", "OMP_NUM_THREADS": "1"})
    assert r.returncode == 0, r.stderr

    idx = SketchIndex(SketchParams(lF=10))
    genomes, bases = downloader.download_ncbi_fof(idx, str(fof),
                                                  max_workers=1)
    assert genomes == 4   # acc1 + acc2 + acc5 + acc6; acc3/acc4 skipped
    our_dump = tmp_path / "our_dump.bin"
    idx.dump(str(our_dump))

    assert gzip.open(our_dump, "rb").read() == \
        gzip.open(ref_dump, "rb").read()
