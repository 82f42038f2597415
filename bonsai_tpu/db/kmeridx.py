"""Positional k-mer inverted index: kmer -> global offsets.

Equivalent of bns::KmerIdx (/root/reference/include/bonsai/kmeridx.h:11-132).
The flat_hash_map<kmer, vector<pos>> becomes a CSR triple (sorted unique
kmers, row offsets, positions) — one sort + segment boundaries, queried by
searchsorted: the vector-native layout.

Positions are the global index of a kmer's LAST base across the
concatenated contigs (matching `diff = s - seq.s` + cumulative length,
kmeridx.h:49-54).  Ambiguous bases skip ahead k (kmeridx.h:44-46).

File format matches the reference writer (kmeridx.h:113-131): gz stream of
  u32 k | u32 nnames | u64 seqlens[nnames] | names (LF lines) |
  comments (LF lines) | { u64 kmer | u32 nelem | u64 positions } *
(The reference's own `read` is broken — it keys the map by nelem instead
of kmer, kmeridx.h:103 — we read the format correctly.  Its encoder also
masks with (1<<k)-1 instead of (1<<2k)-1, so reference-built indexes fold
kmers; we index the true 2-bit kmer and document the difference.)
"""

from __future__ import annotations

import gzip
from typing import List, Optional, Tuple

import numpy as np

from ..core import encode as enc_mod
from ..io import fastx


class KmerIdx:
    def __init__(self, k: int, path: Optional[str] = None, lut=None):
        if k > 32:
            raise ValueError("k must be <= 32")
        self.k = k
        self.refnames: List[bytes] = []
        self.comments: List[bytes] = []
        self.seqlens: List[int] = []
        self.keys = np.empty(0, dtype=np.uint64)
        self.offsets = np.zeros(1, dtype=np.int64)
        self.positions = np.empty(0, dtype=np.uint64)
        self._pending: List[Tuple[np.ndarray, np.ndarray]] = []
        self._cum = 0
        from ..core.alphabet import DNA4

        self._lut = DNA4.lut if lut is None else lut
        if path:
            self.make_idx(path)

    # -- build -------------------------------------------------------------
    def add_seq(self, name: bytes, seq: bytes, comment: bytes = b""):
        self.refnames.append(name)
        self.comments.append(comment)
        self.seqlens.append(len(seq))
        codes = fastx.encode_contig(seq, self._lut)
        if codes.size >= self.k:
            kmers, invalid = enc_mod.pack_kmers(codes[None, :], self.k)
            kmers = np.asarray(
                enc_mod.apply_mask(kmers, self.k, enc_mod.InputType.DNA)
            )[0]
            valid = ~np.asarray(invalid)[0]
            # reference skip-ahead: after an N, the next k-1 windows are
            # invalid anyway; valid windows match exactly
            pos = (
                np.arange(kmers.size, dtype=np.uint64)
                + np.uint64(self.k - 1 + self._cum)
            )
            self._pending.append((kmers[valid], pos[valid]))
        self._cum += len(seq)

    def make_idx(self, path: str):
        for name, seq, _ in fastx.read_fastx(path):
            self.add_seq(name, seq)
        self.finalize()

    def finalize(self):
        if not self._pending:
            return
        kmers = np.concatenate([k for k, _ in self._pending])
        pos = np.concatenate([p for _, p in self._pending])
        if self.keys.size:
            # fold in existing content
            old = np.repeat(self.keys, np.diff(self.offsets))
            kmers = np.concatenate([old, kmers])
            pos = np.concatenate([self.positions, pos])
        order = np.argsort(kmers, kind="stable")
        kmers, pos = kmers[order], pos[order]
        uniq = np.ones(kmers.size, dtype=bool)
        if kmers.size:
            uniq[1:] = kmers[1:] != kmers[:-1]
        self.keys = kmers[uniq]
        self.offsets = np.concatenate(
            [np.nonzero(uniq)[0], [kmers.size]]
        ).astype(np.int64)
        self.positions = pos
        self._pending = []

    # -- query -------------------------------------------------------------
    def get(self, kmer: int) -> np.ndarray:
        i = int(np.searchsorted(self.keys, np.uint64(kmer)))
        if i < self.keys.size and self.keys[i] == np.uint64(kmer):
            return self.positions[self.offsets[i] : self.offsets[i + 1]]
        return np.empty(0, dtype=np.uint64)

    def contig_of(self, gpos: int) -> Tuple[bytes, int]:
        """(refname, local position) for a global position."""
        cum = np.cumsum([0] + self.seqlens)
        ci = int(np.searchsorted(cum, gpos, side="right")) - 1
        return self.refnames[ci], int(gpos - cum[ci])

    def __len__(self) -> int:
        return int(self.keys.size)

    # -- serialization (reference byte layout) -----------------------------
    def write(self, path: str):
        self.finalize()
        with gzip.open(path, "wb") as fh:
            fh.write(np.uint32(self.k).tobytes())
            fh.write(np.uint32(len(self.refnames)).tobytes())
            fh.write(np.asarray(self.seqlens, dtype=np.uint64).tobytes())
            for n in self.refnames:
                fh.write(n + b"\n")
            for c in self.comments:
                fh.write(c + b"\n")
            counts = np.diff(self.offsets)
            for i in range(self.keys.size):
                fh.write(self.keys[i : i + 1].tobytes())
                fh.write(np.uint32(counts[i]).tobytes())
                fh.write(
                    self.positions[
                        self.offsets[i] : self.offsets[i + 1]
                    ].tobytes()
                )

    @classmethod
    def read(cls, path: str) -> "KmerIdx":
        with gzip.open(path, "rb") as fh:
            (k,) = np.frombuffer(fh.read(4), dtype=np.uint32)
            idx = cls(int(k))
            (nnames,) = np.frombuffer(fh.read(4), dtype=np.uint32)
            idx.seqlens = list(
                np.frombuffer(fh.read(8 * int(nnames)), dtype=np.uint64)
            )
            for _ in range(int(nnames)):
                idx.refnames.append(_read_line(fh))
            for _ in range(int(nnames)):
                idx.comments.append(_read_line(fh))
            keys, counts, posl = [], [], []
            while True:
                head = fh.read(12)
                if len(head) < 12:
                    break
                kmer = np.frombuffer(head[:8], dtype=np.uint64)[0]
                (nelem,) = np.frombuffer(head[8:], dtype=np.uint32)
                keys.append(kmer)
                counts.append(int(nelem))
                posl.append(
                    np.frombuffer(fh.read(8 * int(nelem)), dtype=np.uint64)
                )
            idx.keys = np.asarray(keys, dtype=np.uint64)
            order = np.argsort(idx.keys, kind="stable")
            idx.keys = idx.keys[order]
            counts = np.asarray(counts, dtype=np.int64)[order]
            idx.offsets = np.concatenate([[0], np.cumsum(counts)])
            idx.positions = (
                np.concatenate([posl[i] for i in order])
                if posl
                else np.empty(0, dtype=np.uint64)
            )
            idx._cum = int(sum(idx.seqlens))
            return idx


def _read_line(fh) -> bytes:
    out = bytearray()
    while True:
        c = fh.read(1)
        if not c or c == b"\n":
            return bytes(out)
        out += c
