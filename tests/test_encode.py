"""Encoder core tests: reference invariants (SURVEY §4) + oracle parity."""

import numpy as np
import pytest

from bonsai_tpu.core.alphabet import DNA4, InputType
from bonsai_tpu.core.spacer import Spacer, parse_spacing
from bonsai_tpu.core.encoder import BatchEncoder
from bonsai_tpu.core import bitops, hashes

from conftest import random_dna
from oracle import OracleEncoder, frev64_py, canonical_py, revcomp_py


def batch_from_seqs(seqs):
    """list[bytes] -> (codes (B,L) int8, lengths (B,))"""
    L = max(len(s) for s in seqs)
    lut = DNA4.lut
    codes = np.full((len(seqs), L), -1, dtype=np.int8)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = lut[np.frombuffer(s, dtype=np.uint8)]
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    return codes, lengths


def emission_list(enc, seq):
    codes, lengths = batch_from_seqs([seq])
    em = enc.emissions(codes, lengths)
    vals = np.asarray(em.values)[0]
    mask = np.asarray(em.mask)[0]
    return [int(v) for v, m in zip(vals, mask) if m]


# ---------- bit ops ----------------------------------------------------------

def test_revcomp_involution():
    rng = np.random.default_rng(0)
    for k in (4, 15, 31, 32):
        x = rng.integers(0, 1 << 63, size=100, dtype=np.uint64)
        mask = np.uint64(bitops.kmer_mask_bits(k))
        x = x & mask
        rc = bitops.reverse_complement(x, k)
        rcrc = bitops.reverse_complement(rc, k)
        np.testing.assert_array_equal(x, rcrc)


def test_revcomp_known():
    # ACGT (k=4) -> ACGT (palindrome)
    km = 0b00_01_10_11
    assert revcomp_py(km, 4) == km
    # AAAA -> TTTT
    assert revcomp_py(0, 4) == 0b11_11_11_11
    assert bitops.reverse_complement(np.uint64(0), 4) == 0b11111111


def test_frev64_matches_and_inverts():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64)
    h = hashes.frev64(x)
    for xi, hi in zip(x[:10].tolist(), h[:10].tolist()):
        assert frev64_py(xi) == hi
    np.testing.assert_array_equal(hashes.frev64_inv(h), x)


# ---------- spacer -----------------------------------------------------------

def test_parse_spacing():
    assert parse_spacing(None, 4) == [0, 0, 0]
    assert parse_spacing("1,2,0", 4) == [1, 2, 0]
    assert parse_spacing("1x3", 4) == [1, 1, 1]
    assert parse_spacing("2x2,0x28", 31) == [2, 2] + [0] * 28


def test_spacer_geometry():
    sp = Spacer(31, 31)
    assert sp.c == 31 and sp.w == 31 and sp.unspaced() and sp.unwindowed()
    sp = Spacer(31, 50)
    assert sp.window_kmers == 20
    sp = Spacer(4, 0, [1, 2, 0])
    assert sp.c == 4 + 3 and sp.w == 7
    assert list(sp.positions) == [0, 2, 5, 6]


# ---------- reference invariants on phiX ------------------------------------

def test_phix_distinct_kmer_count(phix_seq):
    """test/encoding.cpp:122 — 5356 distinct canonical k=31 kmers."""
    enc = BatchEncoder(Spacer(31, 31), canonicalize=True)
    codes, lengths = batch_from_seqs([phix_seq])
    s = enc.emitted_set(codes, lengths)
    assert len(s) == 5356


@pytest.mark.parametrize("w", [32, 55, 100, 300, 500])
def test_phix_minimizer_count(phix_seq, w):
    """test/encoding.cpp:65-88 — #minimizers == len - w + 1."""
    enc = BatchEncoder(Spacer(31, w), canonicalize=True)
    codes, lengths = batch_from_seqs([phix_seq])
    em = enc.emissions(codes, lengths)
    assert int(np.asarray(em.mask).sum()) == len(phix_seq) - w + 1


def test_phix_determinism(phix_seq):
    enc = BatchEncoder(Spacer(31, 31), canonicalize=True)
    codes, lengths = batch_from_seqs([phix_seq])
    a = enc.emitted_set(codes, lengths)
    b = enc.emitted_set(codes, lengths)
    np.testing.assert_array_equal(a, b)


def test_canon_equals_canonicalized_uncanon(phix_seq):
    """test/encoding.cpp:127-151 — canon(for_each_uncanon) set equality."""
    sp = Spacer(31, 31)
    canon = BatchEncoder(sp, canonicalize=True)
    uncanon = BatchEncoder(sp, canonicalize=False)
    codes, lengths = batch_from_seqs([phix_seq])
    cs = set(canon.emitted_set(codes, lengths).tolist())
    us = {canonical_py(v, 31) for v in uncanon.emitted_set(codes, lengths).tolist()}
    assert cs == us


# ---------- oracle parity over random sequences with Ns ----------------------

MODES = [
    dict(k=31, w=31, canonicalize=True, scheme="lex"),
    dict(k=31, w=31, canonicalize=False, scheme="lex"),
    dict(k=21, w=40, canonicalize=True, scheme="lex"),
    dict(k=21, w=40, canonicalize=False, scheme="lex"),
    dict(k=13, w=13, canonicalize=True, scheme="lex"),
    dict(k=13, w=29, canonicalize=True, scheme="entropy"),
    dict(k=13, w=29, canonicalize=False, scheme="entropy"),
    dict(k=32, w=32, canonicalize=True, scheme="lex"),
    dict(k=16, w=48, canonicalize=True, scheme="lex"),
]


@pytest.mark.parametrize("mode", MODES, ids=lambda m: f"k{m['k']}w{m['w']}{'c' if m['canonicalize'] else 'u'}{m['scheme']}")
@pytest.mark.parametrize("n_prob", [0.0, 0.05])
def test_oracle_parity_unspaced(mode, n_prob):
    rng = np.random.default_rng(42)
    sp = Spacer(mode["k"], mode["w"])
    batch = BatchEncoder(sp, mode["canonicalize"], mode["scheme"])
    oracle = OracleEncoder(sp, mode["canonicalize"], mode["scheme"])
    for trial in range(8):
        seq = random_dna(rng, int(rng.integers(mode["w"], 400)), n_prob)
        got = emission_list(batch, seq)
        want = oracle.for_each(seq)
        assert got == want, f"mismatch len={len(seq)} mode={mode}"


SPACED_MODES = [
    dict(k=13, w=0, spacing="1,2,0x10", canonicalize=False, scheme="lex"),
    dict(k=13, w=40, spacing="1,2,0x10", canonicalize=False, scheme="lex"),
    dict(k=13, w=40, spacing="1x12", canonicalize=True, scheme="lex"),  # canon forced off
    dict(k=9, w=30, spacing="2x8", canonicalize=False, scheme="entropy"),
]


@pytest.mark.parametrize("mode", SPACED_MODES, ids=lambda m: f"k{m['k']}w{m['w']}s{m['spacing']}{m['scheme']}")
@pytest.mark.parametrize("n_prob", [0.0, 0.05])
def test_oracle_parity_spaced(mode, n_prob):
    rng = np.random.default_rng(7)
    sp = Spacer(mode["k"], mode["w"], mode["spacing"])
    batch = BatchEncoder(sp, mode["canonicalize"], mode["scheme"])
    oracle = OracleEncoder(sp, mode["canonicalize"], mode["scheme"])
    for trial in range(6):
        seq = random_dna(rng, int(rng.integers(max(sp.w, sp.c), 300)), n_prob)
        got = emission_list(batch, seq)
        want = oracle.for_each(seq)
        assert got == want, f"mismatch len={len(seq)} mode={mode}"


def test_short_sequence_partial_window():
    """Sequences shorter than w: uncanon emits one trailing best; canon none."""
    rng = np.random.default_rng(3)
    sp = Spacer(13, 100)
    seq = random_dna(rng, 50)  # 38 kmers < W=88
    un = BatchEncoder(sp, canonicalize=False)
    want = OracleEncoder(sp, canonicalize=False).for_each(seq)
    assert emission_list(un, seq) == want
    assert len(want) == 1
    cn = BatchEncoder(sp, canonicalize=True)
    assert emission_list(cn, seq) == OracleEncoder(sp, canonicalize=True).for_each(seq) == []


def test_batch_padding_consistency():
    """Emissions of a read must not depend on other reads in the batch."""
    rng = np.random.default_rng(5)
    sp = Spacer(21, 50)
    enc = BatchEncoder(sp, canonicalize=True)
    seqs = [random_dna(rng, int(rng.integers(60, 200))) for _ in range(6)]
    codes, lengths = batch_from_seqs(seqs)
    em = enc.emissions(codes, lengths)
    for i, s in enumerate(seqs):
        got = [int(v) for v, m in zip(np.asarray(em.values)[i], np.asarray(em.mask)[i]) if m]
        solo = emission_list(enc, s)
        assert got == solo
