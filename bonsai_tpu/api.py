"""Python API layer: the pybind11 `bns` module equivalent.

The reference ships a pybind11 extension exposing k-mer extraction into
numpy (python/bns.cpp:10-40, seqdict in python/setup.py docs).  Here the
same surface is native Python over the batched encoder — arrays come back
as numpy u64, and the heavy lifting is the same vectorized/jittable code
path the classifier uses.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .core.alphabet import InputType, alphabet_of
from .core.encoder import BatchEncoder
from .core.spacer import Spacer, parse_spacing
from .io import fastx


def get_kmers(
    seq: bytes,
    k: int = 31,
    spacing: str = "",
    w: Optional[int] = None,
    canonicalize: bool = True,
    unique: bool = False,
    input_type: InputType = InputType.DNA,
    scheme: str = "lex",
) -> np.ndarray:
    """Emitted k-mers/minimizers of one sequence as np.uint64
    (bns.get_kmers, python/bns.cpp:10-40)."""
    if isinstance(seq, str):
        seq = seq.encode()
    gaps = parse_spacing(spacing, k)
    sp = Spacer(k, w if w and w > 0 else k, gaps)
    enc = BatchEncoder(sp, canonicalize, scheme, input_type)
    lut = alphabet_of(InputType(input_type)).lut
    codes = fastx.encode_contig(seq, lut)
    if codes.size < sp.c:
        return np.empty(0, dtype=np.uint64)
    em = enc.emissions(codes[None, :], np.array([codes.size], dtype=np.int32))
    vals = np.asarray(em.values)[0][np.asarray(em.mask)[0]]
    if unique:
        vals = np.unique(vals)
    return vals


def seqdict(
    path: str,
    k: int = 31,
    spacing: str = "",
    w: Optional[int] = None,
    canonicalize: bool = True,
    unique: bool = False,
    input_type: InputType = InputType.DNA,
) -> Dict[bytes, np.ndarray]:
    """{contig name: kmer array} over a FASTA/FASTQ file (bns.seqdict)."""
    out: Dict[bytes, np.ndarray] = {}
    for name, seq, _ in fastx.read_fastx(path):
        out[name] = get_kmers(
            seq, k, spacing, w, canonicalize, unique, input_type
        )
    return out


def rolling_hashes(
    seq: bytes,
    k: int,
    canonicalize: bool = False,
    seed1: int = 1337,
    seed2: int = 137,
) -> np.ndarray:
    """Cyclic rolling hashes of every k-window (RollingHasher path of
    bns.cpp / encoder.h:644+), unbounded k."""
    from .core.rolling import RollingEncoder
    from .core.alphabet import DNA4

    if isinstance(seq, str):
        seq = seq.encode()
    codes = fastx.encode_contig(seq, DNA4.lut)
    if codes.size < k:
        return np.empty(0, dtype=np.uint64)
    enc = RollingEncoder(k, canonicalize, seed1=seed1, seed2=seed2)
    vals, invalid = enc.hashes(codes[None, :])
    return np.asarray(vals)[0][~np.asarray(invalid)[0]]
