"""128-bit kmer packing vs a pure-python oracle (the reference's u128
Encoder smoke, test/encoding.cpp:152-238)."""

import numpy as np
import pytest

from bonsai_tpu.core import encode128
from bonsai_tpu.core.alphabet import DNA4
from bonsai_tpu.io import fastx

COMP = {0: 3, 1: 2, 2: 1, 3: 0}


def _oracle_pack(codes, k):
    out = []
    for i in range(len(codes) - k + 1):
        win = codes[i : i + k]
        if (win < 0).any():
            out.append(None)
            continue
        v = 0
        for c in win:
            v = (v << 2) | int(c)
        out.append(v)
    return out


def _oracle_rc(v, k):
    r = 0
    for _ in range(k):
        r = (r << 2) | COMP[v & 3]
        v >>= 2
    return r


@pytest.mark.parametrize("k", [33, 40, 55, 64])
def test_pack_and_canonical_vs_oracle(k):
    rng = np.random.default_rng(k)
    seq = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                     p=[0.24, 0.24, 0.24, 0.24, 0.04], size=200).tobytes()
    codes = fastx.encode_contig(seq, DNA4.lut)
    hi, lo, invalid = encode128.pack_kmers128(codes[None, :], k)
    hi, lo, invalid = np.asarray(hi)[0], np.asarray(lo)[0], np.asarray(invalid)[0]
    want = _oracle_pack(codes, k)
    assert len(want) == hi.size
    for i, w in enumerate(want):
        if w is None:
            assert invalid[i]
            continue
        assert not invalid[i]
        got = encode128.to_python_int(hi[i], lo[i])
        assert got == w, i
        # canonical = min(v, rc(v))
        chi, clo = encode128.canonical128(hi[i : i + 1], lo[i : i + 1], k)
        cgot = encode128.to_python_int(chi[0], clo[0])
        assert cgot == min(w, _oracle_rc(w, k))


def test_canonical_strand_symmetry():
    k = 45
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 120).astype(np.int8)
    rc_codes = (3 - codes)[::-1].copy()
    h1, l1, _ = encode128.pack_kmers128(codes[None, :], k)
    h2, l2, _ = encode128.pack_kmers128(rc_codes[None, :], k)
    c1 = set(
        encode128.to_python_int(a, b)
        for a, b in zip(*[np.asarray(x)[0] for x in encode128.canonical128(h1, l1, k)])
    )
    c2 = set(
        encode128.to_python_int(a, b)
        for a, b in zip(*[np.asarray(x)[0] for x in encode128.canonical128(h2, l2, k)])
    )
    assert c1 == c2
