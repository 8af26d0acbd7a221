"""NCBI streaming-ingest driver tests (network mocked — zero-egress env)."""

import gzip
import io

import numpy as np

from niqki_tpu import downloader
from niqki_tpu.index import SketchIndex
from niqki_tpu.params import SketchParams


def test_name_of_accession_url_matches_get_name_ncbi():
    """Differential vs get_name_ncbi (src/niqki_index.cpp:789-798): the
    reference's scan stops 3 chars early, so trailing slashes survive into
    the name (broken fetch URL -> skipped accession, both engines)."""
    url = ("https://ftp.ncbi.nlm.nih.gov/genomes/all/GCF/000/005/845/"
           "GCF_000005845.2_ASM584v2")
    assert downloader.name_of_accession_url(url) == \
        "GCF_000005845.2_ASM584v2"
    # trailing-slash quirk: the final '/' is never seen by the scan
    assert downloader.name_of_accession_url(url + "/") == \
        "GCF_000005845.2_ASM584v2/"

    def get_name_ncbi_model(s):
        # direct transliteration of the C++ (uint scan bound size()-3,
        # lastposition inits 0 then ++)
        lastposition = 0
        i = 0
        while i + 3 < len(s):
            if s[i] == "/":
                lastposition = i
            i += 1
        lastposition += 1
        return s[lastposition:]

    rng = np.random.default_rng(0)
    parts = ["GCF_000", "a", "x/y", "", "845", "ASM584v2", "ftp.x.gov"]
    for _ in range(200):
        n = int(rng.integers(1, 6))
        u = "/".join(str(parts[i]) for i in rng.integers(0, len(parts), n))
        u = ("https://" if rng.integers(2) else "") + u + \
            ("/" if rng.integers(2) else "")
        if len(u) < 4:
            continue
        assert downloader.name_of_accession_url(u) == \
            get_name_ncbi_model(u), u


def test_download_fof_sketches_and_inserts(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    seqs = {
        "https://x/acc1":
            rng.choice(list(b"ACGT"), 500).astype(np.uint8).tobytes(),
        "https://x/acc2":
            rng.choice(list(b"ACGT"), 700).astype(np.uint8).tobytes(),
    }

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=None):
        base = url.rsplit("/", 2)[0] + "/" + url.rsplit("/", 2)[1]
        if base not in seqs:
            raise OSError("404")
        # A trailing dummy contig: the reference's Download_NCBI only
        # flushes a contig when it sees the NEXT '>' line, so the final
        # contig is always dropped (mirrored by _fetch_records).
        fasta = b">contig1\n" + seqs[base] + b"\n>trailer\nACGT\n"
        return FakeResp(gzip.compress(fasta))

    monkeypatch.setattr(downloader.urllib.request, "urlopen", fake_urlopen)
    fof = tmp_path / "urls.txt"
    fof.write_text("https://x/acc1\nhttps://x/acc2\nhttps://x/missing\n")

    p = SketchParams(lF=5, K=21)
    idx = SketchIndex(p, backend="numpy")
    genomes, bases = downloader.download_ncbi_fof(idx, str(fof),
                                                  max_workers=2)
    assert genomes == 2 and bases == 1200
    assert idx.G == 2 and idx.names == ["https://x/acc1", "https://x/acc2"]
    # sketches match direct sketching of the same sequences
    from niqki_tpu import oracle
    want = oracle.sketch_records([seqs["https://x/acc1"]], p)
    assert np.array_equal(idx.matrix()[0], want)


def test_download_reference_flush_quirks(tmp_path, monkeypatch):
    """Reference Download_NCBI quirks (src/niqki_index.cpp:810-827): the
    final contig is dropped (single-contig accessions sketch nothing and
    are skipped), and a contig of length <= K is not cleared — its bases
    prepend the next contig."""
    rng = np.random.default_rng(1)
    long1 = rng.choice(list(b"ACGT"), 300).astype(np.uint8).tobytes()
    long2 = rng.choice(list(b"ACGT"), 400).astype(np.uint8).tobytes()

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=None):
        base = url.rsplit("/", 2)[0] + "/" + url.rsplit("/", 2)[1]
        if base.endswith("single"):
            return FakeResp(gzip.compress(b">only\n" + long1 + b"\n"))
        # short contig (<= K) bleeds into the next one
        return FakeResp(gzip.compress(
            b">a\n" + long1 + b"\n>short\nACGTACGT\n>b\n" + long2 +
            b"\n>trailer\nAC\n"))

    monkeypatch.setattr(downloader.urllib.request, "urlopen", fake_urlopen)
    fof = tmp_path / "urls.txt"
    fof.write_text("https://x/single\nhttps://x/multi\n")
    p = SketchParams(lF=5, K=21)
    idx = SketchIndex(p, backend="numpy")
    genomes, bases = downloader.download_ncbi_fof(idx, str(fof),
                                                  max_workers=1)
    # 'single' contributes nothing; 'multi' flushes long1 and then
    # (short + long2) as ONE contig; the trailer is dropped.
    assert genomes == 1 and idx.names == ["https://x/multi"]
    assert bases == 300 + 8 + 400
    from niqki_tpu import oracle
    want = oracle.sketch_records([long1, b"ACGTACGT" + long2], p)
    assert np.array_equal(idx.matrix()[0], want)
