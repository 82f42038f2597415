"""FASTA/FASTQ input: parsing and fixed-shape batching.

Host-side replacement for kseq/bseq (reference klib kseq.h +
include/bonsai/kseq_declare.h:39-204): sequences are parsed on the host and
marshalled into fixed-shape (B, L) int8 code batches for the device.
Compression transparency matches the reference (encoder.h:510-530): .gz via
zlib, .xz via lzma, .bz2 via bz2; .zst via the zstd binary when available.

The batcher pads read length to bucket boundaries so jit sees a small, fixed
set of shapes regardless of input length jitter.
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import shutil
import subprocess
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np


def open_maybe_compressed(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    if path.endswith(".xz"):
        return lzma.open(path, "rb")
    if path.endswith(".bz2"):
        return bz2.open(path, "rb")
    if path.endswith(".zst"):
        if shutil.which("zstd"):
            proc = subprocess.Popen(
                ["zstd", "-dc", path], stdout=subprocess.PIPE
            )
            return proc.stdout
        try:
            import zstandard  # type: ignore

            return zstandard.open(path, "rb")
        except ImportError as e:
            raise RuntimeError(
                "no zstd binary or zstandard module available for .zst input"
            ) from e
    return open(path, "rb")


def read_fastx(path: str) -> Iterator[Tuple[bytes, bytes, Optional[bytes]]]:
    """Yield (name, seq, qual) records.  name = header up to first space.
    qual is None for FASTA."""
    with _buffered(path) as fh:
        first = fh.peek(1)[:1]
        if not first:
            return
        if first == b">":
            yield from _read_fasta(fh)
        elif first == b"@":
            yield from _read_fastq(fh)
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


def _buffered(path) -> io.BufferedReader:
    fh = open_maybe_compressed(path)
    if hasattr(fh, "peek"):
        return fh
    return io.BufferedReader(fh)


def _parse_fasta_record(rec: bytes):
    """rec = b'>' header line + sequence lines (no trailing record sep)."""
    hdr_end = rec.find(b"\n")
    if hdr_end < 0:
        hdr_end = len(rec)
    name = rec[1:hdr_end].rstrip(b"\r").split(b" ", 1)[0].split(b"\t", 1)[0]
    seq = rec[hdr_end + 1 :].replace(b"\n", b"").replace(b"\r", b"")
    return name, seq, None


def _read_fasta(fh):
    # chunked block parser: records split on '\n>' boundaries, newlines
    # stripped with bytes.replace — C-speed instead of a per-line python
    # loop (multi-Mb contigs are ~hundreds of thousands of lines)
    rest = b""
    while True:
        chunk = fh.read(1 << 23)
        if not chunk:
            break
        rest += chunk
        start = 0
        while True:
            nxt = rest.find(b"\n>", start)
            if nxt < 0:
                break
            yield _parse_fasta_record(rest[start:nxt])
            start = nxt + 1
        if start:
            rest = rest[start:]
    if rest.strip():
        yield _parse_fasta_record(rest)


def _read_fastq(fh):
    while True:
        hdr = fh.readline()
        if not hdr:
            return
        hdr = hdr.rstrip(b"\r\n")
        if not hdr:
            continue
        seq = fh.readline().rstrip(b"\r\n")
        fh.readline()  # '+'
        qual = fh.readline().rstrip(b"\r\n")
        yield hdr[1:].split(b" ", 1)[0], seq, qual


def first_header(path: str) -> str:
    with _buffered(path) as fh:
        return fh.readline().decode("utf-8", "replace").strip()


def trim_readno(name: bytes) -> bytes:
    """Strip a '/<digit>' mate suffix from a read name, as the reference's
    batch reader does for every read (kseq_declare.h trim_readno)."""
    if len(name) > 2 and name[-2:-1] == b"/" and name[-1:].isdigit():
        return name[:-2]
    return name


@dataclass
class ReadBatch:
    names: List[bytes]
    seqs: List[bytes]
    codes: np.ndarray  # (B, L) int8, -1 pad/ambiguous
    lengths: np.ndarray  # (B,) int32
    quals: Optional[List[Optional[bytes]]] = None


def _bucket_len(n: int, min_len: int = 64) -> int:
    """Round up to the next length bucket (1.25x geometric-ish steps).

    Buckets are multiples of 32 so the packed 2-bit upload (16 codes per
    u32 word + 32 N-mask bits per u32, classify/pipeline.py) tiles
    exactly."""
    L = min_len
    while L < n:
        L += max(L // 4, 32)
    return (L + 31) & ~31


def _native_ok(path: str) -> bool:
    # the native parser reads plain and .gz via zlib; other compressions
    # go through the Python decompressors
    return not path.endswith((".xz", ".bz2", ".zst"))


def batch_reads(
    path: str,
    lut: np.ndarray,
    batch_size: int = 4096,
    mate_path: Optional[str] = None,
    keep_seqs: bool = True,
) -> Iterator[ReadBatch]:
    """Yield fixed-shape read batches.  Paired-end reads are interleaved
    (mate pairs adjacent, matching bseq_read's paired layout).

    Uses the C++ parser (native/fastx.cpp) when available; Python fallback
    otherwise."""
    from .. import native

    if native.available() and _native_ok(path) and (
        mate_path is None or _native_ok(mate_path)
    ):
        yield from _batch_reads_native(path, lut, batch_size, mate_path)
        return
    it = read_fastx(path)
    mate_it = read_fastx(mate_path) if mate_path else None

    def records():
        if mate_it is None:
            yield from it
        else:
            for r1 in it:
                yield r1
                yield next(mate_it)

    names: List[bytes] = []
    seqs: List[bytes] = []
    quals: List[Optional[bytes]] = []
    for name, seq, qual in records():
        names.append(trim_readno(name))
        seqs.append(seq)
        quals.append(qual)
        if len(names) >= batch_size:
            yield _make_batch(names, seqs, quals, lut, keep_seqs)
            names, seqs, quals = [], [], []
    if names:
        yield _make_batch(names, seqs, quals, lut, keep_seqs)


def _batch_reads_native(
    path: str, lut: np.ndarray, batch_size: int, mate_path: Optional[str]
) -> Iterator[ReadBatch]:
    from ..native.fastx import NativeFastxReader

    r1 = NativeFastxReader(path)
    r2 = NativeFastxReader(mate_path) if mate_path else None
    try:
        if r2 is None:
            while True:
                got = r1.next_batch(batch_size, lut, _bucket_len)
                if got is None:
                    return
                names, seqs, quals, codes, lengths = got
                yield ReadBatch(
                    names=names, seqs=seqs, codes=codes, lengths=lengths,
                    quals=quals,
                )
        else:
            half = max(batch_size // 2, 1)
            while True:
                g1 = r1.next_batch(half, lut, _bucket_len)
                g2 = r2.next_batch(half, lut, _bucket_len)
                if g1 is None or g2 is None:
                    return
                n1, s1, q1, c1, l1 = g1
                n2, s2, q2, c2, l2 = g2
                n = min(len(n1), len(n2))
                L = max(c1.shape[1], c2.shape[1])

                def pad(c):
                    if c.shape[1] == L:
                        return c
                    out = np.full((c.shape[0], L), -1, dtype=np.int8)
                    out[:, : c.shape[1]] = c
                    return out

                c1, c2 = pad(c1)[:n], pad(c2)[:n]
                codes = np.empty((2 * n, L), dtype=np.int8)
                codes[0::2], codes[1::2] = c1, c2
                lengths = np.empty(2 * n, dtype=np.int32)
                lengths[0::2], lengths[1::2] = l1[:n], l2[:n]
                names: List[bytes] = [None] * (2 * n)  # type: ignore
                names[0::2], names[1::2] = n1[:n], n2[:n]
                seqs: List[bytes] = [None] * (2 * n)  # type: ignore
                seqs[0::2], seqs[1::2] = s1[:n], s2[:n]
                quals: List[Optional[bytes]] = [None] * (2 * n)
                quals[0::2], quals[1::2] = q1[:n], q2[:n]
                yield ReadBatch(
                    names=names, seqs=seqs, codes=codes, lengths=lengths,
                    quals=quals,
                )
    finally:
        r1.close()
        if r2 is not None:
            r2.close()


def _make_batch(names, seqs, quals, lut, keep_seqs) -> ReadBatch:
    maxlen = max((len(s) for s in seqs), default=1)
    L = _bucket_len(maxlen)
    B = len(seqs)
    codes = np.full((B, L), -1, dtype=np.int8)
    lengths = np.empty(B, dtype=np.int32)
    lut = np.asarray(lut, dtype=np.int8)
    for i, s in enumerate(seqs):
        a = np.frombuffer(s, dtype=np.uint8)
        codes[i, : len(s)] = lut[a]
        lengths[i] = len(s)
    return ReadBatch(
        names=names,
        seqs=seqs if keep_seqs else [],
        codes=codes,
        lengths=lengths,
        quals=quals,
    )


def encode_contig(seq: bytes, lut: np.ndarray) -> np.ndarray:
    lut = np.asarray(lut, dtype=np.int8)
    return lut[np.frombuffer(seq, dtype=np.uint8)]
