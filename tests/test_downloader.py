"""NCBI streaming-ingest driver tests (network mocked — zero-egress env)."""

import gzip
import io

import numpy as np

from niqki_tpu import downloader
from niqki_tpu.index import SketchIndex
from niqki_tpu.params import SketchParams


def test_name_of_accession_url():
    url = ("https://ftp.ncbi.nlm.nih.gov/genomes/all/GCF/000/005/845/"
           "GCF_000005845.2_ASM584v2")
    assert downloader.name_of_accession_url(url) == \
        "GCF_000005845.2_ASM584v2"
    assert downloader.name_of_accession_url(url + "/") == \
        "GCF_000005845.2_ASM584v2"


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
        fasta = b">contig1\n" + seqs[base] + b"\n"
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
