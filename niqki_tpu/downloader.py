"""Streaming NCBI ingest: download, sketch, insert — nothing kept on disk.

TPU-native rework of the reference's popen("wget | gzip -d") pipeline
(/root/reference/src/niqki_index.cpp:802-870): a thread pool streams and
gunzips assemblies with urllib + zlib, parses FASTA records incrementally,
and feeds sketches to the index; ids are assigned in fof order
(deterministic, unlike the reference's racy critical-section order).

Each accession URL <base> resolves to <base>/<name>_genomic.fna.gz where
<name> is the last path component, exactly like get_name_ncbi.
"""

from __future__ import annotations

import concurrent.futures as cf
import gzip
import io
import urllib.request

import numpy as np

from .index import SketchIndex


def name_of_accession_url(url: str) -> str:
    """Exactly get_name_ncbi (src/niqki_index.cpp:789-798): the name starts
    after the last '/' found at positions [0, len-4] — a slash within the
    final 3 characters is never seen, so a trailing-slash URL keeps it and
    yields the same broken fetch URL (and thus skipped accession) as the
    reference."""
    last = 0   # reference inits lastposition=0: a slash-free URL drops char 0
    for i in range(max(len(url) - 3, 0)):
        if url[i] == "/":
            last = i
    return url[last + 1:]


def _fetch_records(url: str, K: int, timeout: float):
    """Contigs of one accession, with the reference Download_NCBI's exact
    flush quirks (src/niqki_index.cpp:810-827): a contig is only flushed
    when the NEXT '>' line is seen, so the final contig is always dropped;
    and a contig of length <= K is NOT cleared — its bases prepend the next
    contig. (Unreachable in the zero-egress test env; kept bit-faithful for
    the -Iddl differential in tests/test_downloader.py.)"""
    full = f"{url}/{name_of_accession_url(url)}_genomic.fna.gz"
    with urllib.request.urlopen(full, timeout=timeout) as resp:
        raw = resp.read()
    f = io.BufferedReader(gzip.GzipFile(fileobj=io.BytesIO(raw)))
    seqs = []
    sequence = b""
    for line in f:
        if not line.startswith(b">"):
            sequence += line.rstrip(b"\n")
        elif len(sequence) > K:
            seqs.append(sequence)
            sequence = b""
    return seqs, sum(len(s) for s in seqs)


def download_ncbi_fof(index: SketchIndex, fof_path: str,
                      max_workers: int = 8, timeout: float = 120.0,
                      progress_every: int = 1000) -> tuple[int, int]:
    """Download every accession in the fof, sketch, insert. Returns
    (genomes_downloaded, bases_downloaded). Failures are skipped silently
    (matching the reference's tolerance of dead links)."""
    with open(fof_path) as f:
        urls = [u.rstrip("\n") for u in f if len(u.rstrip("\n")) > 5]
    genomes = bases = 0
    K = index.params.K

    def work(url):
        try:
            return url, _fetch_records(url, K, timeout)
        except Exception:
            return url, None

    with cf.ThreadPoolExecutor(max_workers=max_workers) as pool:
        for url, result in pool.map(work, urls):
            if not result or not result[0]:
                continue
            seqs, total = result
            sketch = index.sketch_records(seqs)
            index.insert_sketch(sketch, url)
            genomes += 1
            bases += total
            if genomes % progress_every == 0:
                print(f"#genomes downloaded: {genomes:,} "
                      f"#bases downloaded: {bases:,}")
    print(f"#genomes downloaded: {genomes:,} #bases downloaded: {bases:,}")
    return genomes, bases
