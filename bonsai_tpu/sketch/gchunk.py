"""Per-contig, per-chunk HLL cardinality profiles of a genome.

Equivalent of bns::GenomeChunker (/root/reference/include/bonsai/gchunk.h:6-52):
each contig is cut into fixed-size chunks; every k-mer is added to its
chunk's HyperLogLog; the result is a windowed distinct-kmer profile."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..core import encode as enc_mod, bitops
from ..core.spacer import Spacer
from ..io import fastx
from .hll import HyperLogLog


@dataclass
class ContigChunks:
    name: bytes
    hlls: List[HyperLogLog]

    def profile(self) -> np.ndarray:
        return np.array([h.report() for h in self.hlls])


class GenomeChunker:
    def __init__(self, path: str, chunk_size: int, sp: Spacer,
                 p: int = 16, canonical: bool = True, lut=None):
        from ..core.alphabet import DNA4

        lut = DNA4.lut if lut is None else lut
        self.path = path
        self.chunk_size = int(chunk_size)
        self.contigs: List[ContigChunks] = []
        k = sp.k
        for name, seq, _ in fastx.read_fastx(path):
            codes = fastx.encode_contig(seq, lut)
            n_chunks = (codes.size + chunk_size - 1) // chunk_size
            cd = ContigChunks(name, [HyperLogLog(p) for _ in range(n_chunks)])
            self.contigs.append(cd)
            if codes.size < sp.c:
                continue
            kmers, invalid = enc_mod.pack_kmers(codes[None, :], k)
            kmers = enc_mod.apply_mask(kmers, k, enc_mod.InputType.DNA)
            if canonical:
                kmers = bitops.canonical(kmers, k)
            kmers = np.asarray(kmers)[0]
            valid = ~np.asarray(invalid)[0]
            # chunk by kmer START position (enc.pos() in the reference is
            # the position after the window: gchunk.h:37 divides pos by
            # chunk size; we use the start index, off by c-1 — documented)
            pos = np.arange(kmers.size)
            ci = pos // chunk_size
            for c in range(n_chunks):
                sel = (ci == c) & valid
                if sel.any():
                    cd.hlls[c].addh(kmers[sel])

    def for_each(self, fn):
        for cd in self.contigs:
            fn(cd)
