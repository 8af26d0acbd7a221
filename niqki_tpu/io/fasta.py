"""Streaming FASTA/FASTQ readers with gzip auto-detection.

Record semantics match the reference reader exactly
(/root/reference/src/niqki_index.cpp:890-952):
  * format chosen by filename substring: ".fq" or ".fastq" anywhere -> FASTQ,
    else FASTA (regardless of actual content);
  * FASTA: one header line, then all following lines concatenated until a line
    starting with '>' (or EOF); the first line of the file is always treated
    as a header even if it does not start with '>';
  * FASTQ: strictly 4 lines per record, no validation;
  * records shorter than K yield empty; callers additionally require
    len > K before sketching, so the net filter is len > K;
  * gzip transparently detected by magic bytes, like the vendored zstr.

The reader is pure Python (line-based, zlib-backed); the optional native
extension provides a faster parser with the same semantics for bulk ingest.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterator, Tuple


def data_type_of(filename: str) -> str:
    if ".fq" in filename or ".fastq" in filename:
        return "Q"
    return "A"


def _open_maybe_gzip(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=f))
    return io.BufferedReader(f)


def records_from(f, K: int, ftype: str = "A"
                 ) -> Iterator[Tuple[str, bytes]]:
    """Yield (header, sequence_bytes) records with length > K from an open
    binary line stream (the single owner of the reference's record-parsing
    quirks — the file reader and the NCBI downloader both use it).

    header is the raw header line (including its '>'/'@' prefix) stripped of
    the trailing newline; for FASTQ the '@' line. Records failing the length
    filter are silently skipped (matching Biogetline + caller checks).
    """
    if ftype == "Q":
        while True:
            header = f.readline()
            if not header:
                return
            seq = f.readline().rstrip(b"\n")
            f.readline()
            f.readline()
            if len(seq) > K:
                yield header.rstrip(b"\n").decode("utf-8", "replace"), seq
    else:
        header = f.readline()
        if not header:
            return
        while header:
            parts = []
            line = f.readline()
            while line and not line.startswith(b">"):
                parts.append(line.rstrip(b"\n"))
                line = f.readline()
            seq = b"".join(parts)
            if len(seq) > K:
                yield header.rstrip(b"\n").decode("utf-8", "replace"), seq
            header = line


def read_records(path: str, K: int,
                 ftype: str | None = None) -> Iterator[Tuple[str, bytes]]:
    """records_from over a (possibly gzipped) file path; format chosen by
    filename substring unless given."""
    with _open_maybe_gzip(path) as f:
        yield from records_from(f, K, ftype or data_type_of(path))


def read_fof(path: str) -> list[str]:
    """Read an INSERT file-of-files: one path per line; lines shorter than 3
    chars are ignored (the reference's insert path requires size > 2,
    src/niqki_index.cpp:481); missing files are skipped by callers via
    exists(). Query fofs use read_query_fof — the reference's query path has
    no length filter."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if len(line) > 2:
                out.append(line)
    return out


def read_query_fof(path: str) -> list[str]:
    """Read a QUERY file-of-files: every line as written (no length filter,
    matching query_file_of_file_whole, src/niqki_index.cpp:523-540)."""
    with open(path) as f:
        return [line.rstrip("\n") for line in f]


def exists(path: str) -> bool:
    try:
        os.stat(path)
        return True
    except OSError:
        return False
