"""Output writers reproducing the reference's formats byte-for-byte.

Three formats (/root/reference/src/niqki_index.cpp:544-566, 614-628, 747-763):
  * pretty hits:  "<query> <name>:<jac> <name>:<jac> ... \n" (trailing space)
  * binary hits:  "<query>\n" + uint32 nhits + per hit (uint32 gid, uint32 count)
  * matrix:       "##Names\t<n0>\t<n1>...\t\n" header, then per query a dense
                  tab-separated row of count/F values (trailing tab)

Floats are printed like a default-configured C++ ostream (6 significant
digits, fixed/scientific auto-selection, no trailing zeros) — which is exactly
printf's %g with precision 6.
"""

from __future__ import annotations

import gzip
import struct


def format_double(v: float) -> str:
    """C++ `ostream << double` default formatting (= printf %.6g)."""
    return "%.6g" % v


class GzTextWriter:
    """Buffered gzip text writer (the engine's answer to zstr::ofstream)."""

    def __init__(self, path: str):
        self.path = path
        # Level 6 = zlib's default, what the reference's zstr::ofstream
        # uses (Python gzip defaults to 9, ~3x slower for the same parity:
        # every golden/fuzz comparison is on DECOMPRESSED bytes).
        self._f = gzip.open(path, "wb", compresslevel=6)

    def write(self, s: str | bytes) -> None:
        if isinstance(s, str):
            s = s.encode()
        self._f.write(s)

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_pretty_hits(out: GzTextWriter, query_name: str, hits, names, F: int):
    """hits: iterable of (count, gid) already sorted (count desc, gid desc)."""
    parts = [query_name, " "]
    for count, gid in hits:
        parts.append(f"{names[gid]}:{format_double(count / F)} ")
    parts.append("\n")
    out.write("".join(parts))


def write_binary_hits(out: GzTextWriter, query_name: str, hits):
    out.write(query_name + "\n")
    out.write(struct.pack("<I", len(hits)))
    for count, gid in hits:
        out.write(struct.pack("<II", gid, count))


def write_matrix_header(out: GzTextWriter, names):
    out.write("##Names\t" + "".join(str(n) + "\t" for n in names) + "\n")


def write_matrix_row(out: GzTextWriter, query_name: str, row, F: int,
                     min_score: int):
    """row: dense per-genome counts (any int sequence)."""
    parts = [query_name, "\t"]
    for c in row:
        v = (c / F) if c >= min_score else 0.0
        parts.append(format_double(v) + "\t")
    parts.append("\n")
    out.write("".join(parts))
