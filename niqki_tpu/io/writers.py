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
import zlib


def format_double(v: float) -> str:
    """C++ `ostream << double` default formatting (= printf %.6g)."""
    return "%.6g" % v


class GzTextWriter:
    """Buffered gzip text writer (the engine's answer to zstr::ofstream).

    The output is a MULTI-MEMBER gzip stream: text accumulates into fixed
    4 MiB blocks, each deflated as an independent gzip member on a small
    thread pool (zlib releases the GIL) and written strictly in order.
    Decompressed bytes are identical to a single-member stream — every
    parity comparison (goldens, fuzz, soak) is on decompressed bytes —
    and standard tooling (zcat, Python gzip) reads multi-member streams
    transparently. Level 6 = zlib's default, what the reference's
    zstr::ofstream uses. The deflate of GB-scale matrix/hit text was
    single-thread-bound (~50 MB/s); this overlaps it across cores and
    with formatting. Output bytes stay deterministic: member boundaries
    are fixed at exactly BLOCK input bytes regardless of write() call
    granularity.
    """

    BLOCK = 4 << 20

    def __init__(self, path: str, level: int | None = None,
                 threads: int | None = None):
        import os
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        self.path = path
        # Default level 6 = zlib's default, what the reference's
        # zstr::ofstream uses; members deflate through libdeflate when the
        # native lib is built (~2-4x the byte rate at a comparable ratio —
        # the deflate of the G=102k matrix's ~25 GB of row text was the
        # measured sweep wall). NIQKI_TPU_GZLEVEL overrides (1 trades ~25%
        # output size for ~2x deflate speed on dense matrix text).
        if level is None:
            level = int(os.environ.get("NIQKI_TPU_GZLEVEL", "6"))
        self._level = level
        self._f = open(path, "wb")
        self._buf: list[bytes] = []
        self._size = 0
        self._members = 0
        self._pool = ThreadPoolExecutor(
            max_workers=threads or min(8, os.cpu_count() or 1))
        self._futs = deque()

    @staticmethod
    def _member(data: bytes, level: int) -> bytes:
        from .. import native
        out = native.gzip_member(data, level) if native.available() else None
        if out is not None:
            return out
        co = zlib.compressobj(level, zlib.DEFLATED, 31)  # 31 = gzip wrapper
        return co.compress(data) + co.flush()

    def _drain(self, all_: bool = False) -> None:
        while self._futs and (all_ or len(self._futs) > 16
                              or self._futs[0].done()):
            self._f.write(self._futs.popleft().result())

    def _submit(self, blk: bytes) -> None:
        self._futs.append(self._pool.submit(self._member, blk, self._level))
        self._members += 1
        self._drain()

    def write(self, s: str | bytes) -> None:
        if isinstance(s, str):
            s = s.encode()
        elif not isinstance(s, bytes):
            # Coerce mutable buffers (bytearray/np views): the deflate
            # threads read submitted slices zero-copy, so a caller mutating
            # its buffer after write() would race them (latent — all
            # current callers pass immutable bytes).
            s = bytes(s)
        self._buf.append(s)
        self._size += len(s)
        if self._size >= self.BLOCK:
            # Cut members by OFFSET over one immutable buffer: the old
            # `data = data[BLOCK:]` re-copied the shrinking remainder per
            # member — O(n^2/BLOCK) memcpy, ~3.2 GB of fresh-page copies
            # for one 160 MB matrix block (the measured 84 MB/s writer
            # wall at G=102400; niqki_tpu/hostmem.py pathology). The
            # deflate threads read the shared memoryview zero-copy; it
            # pins `data` only until those members drain.
            data = self._buf[0] if len(self._buf) == 1 else b"".join(self._buf)
            mv = memoryview(data)
            off = 0
            while len(data) - off >= self.BLOCK:
                self._submit(mv[off:off + self.BLOCK])
                off += self.BLOCK
            tail = bytes(mv[off:])
            self._buf = [tail] if tail else []
            self._size = len(tail)

    def close(self) -> None:
        if self._f is None:
            return
        tail = b"".join(self._buf)
        self._buf = []
        if tail or self._members == 0:   # empty file still gets one member
            self._submit(tail)
        self._drain(all_=True)
        self._pool.shutdown()
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
