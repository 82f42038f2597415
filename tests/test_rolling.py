"""Rolling cyclic-hash tests: closed form vs scalar recurrence; rc property;
multi-k; determinism invariants (reference test/encoding.cpp:152-238
analog)."""

import numpy as np

from bonsai_tpu.core.alphabet import DNA4
from bonsai_tpu.core.rolling import (
    RollingEncoder,
    MultiKRollingEncoder,
    buzhash,
    character_table,
    _MT19937_64,
)
from conftest import random_dna


def scalar_buzhash(codes, k, table):
    """The vendored CyclicHash recurrence (cyclichash.h:104-112), scalar."""
    U64 = (1 << 64) - 1

    def rotl(x, r):
        r %= 64
        return ((x << r) | (x >> (64 - r))) & U64

    out = []
    h = 0
    for j in range(k):
        h = rotl(h, 1) ^ int(table[codes[j]])
    out.append(h)
    for i in range(1, len(codes) - k + 1):
        z = rotl(int(table[codes[i - 1]]), k % 64)
        h = rotl(h, 1) ^ z ^ int(table[codes[i + k - 1]])
        out.append(h)
    return out


def test_buzhash_matches_recurrence():
    rng = np.random.default_rng(0)
    for k in (5, 21, 64, 75):  # incl. k > wordsize
        codes = rng.integers(0, 4, size=200).astype(np.int8)
        table = character_table(1337, 137)
        got, inv = buzhash(codes[None], k, table)
        assert not inv.any()
        want = scalar_buzhash(codes.tolist(), k, table)
        assert got[0].tolist() == want, k


def test_canon_is_min_of_fwd_and_rc_stream():
    """canonical value = min(fwd hash of window, rc-table hash of the
    window's reverse complement) — the reference contract (the rc hasher
    has its own seed, so this is NOT strand-symmetric; encoder.h:683)."""
    rng = np.random.default_rng(1)
    k = 17
    enc = RollingEncoder(k, canon=True)
    seq = random_dna(rng, 60)
    lut = DNA4.lut
    c1 = lut[np.frombuffer(seq, np.uint8)][None]
    got, _ = enc.hashes(c1)
    codes = c1[0].tolist()
    want = []
    for i in range(len(codes) - k + 1):
        win = codes[i : i + k]
        rcwin = [3 - c for c in reversed(win)]
        f = scalar_buzhash(win, k, enc.table_f)[0]
        r = scalar_buzhash(rcwin, k, enc.table_r)[0]
        want.append(min(f, r))
    assert got[0].tolist() == want


def test_n_invalidates_windows():
    rng = np.random.default_rng(2)
    seq = bytearray(random_dna(rng, 80))
    seq[40] = ord("N")
    lut = DNA4.lut
    codes = lut[np.frombuffer(bytes(seq), np.uint8)][None]
    enc = RollingEncoder(13)
    vals, lengths = enc.hashes(codes)
    h, inv = enc.hashes(codes)
    assert inv[0, 40 - 12 : 41].all()
    assert not inv[0, :28].any()


def test_multik_distinct_seeds():
    rng = np.random.default_rng(3)
    seq = random_dna(rng, 100)
    lut = DNA4.lut
    codes = lut[np.frombuffer(seq, np.uint8)][None]
    m = MultiKRollingEncoder([13, 17, 21])
    out = m.hashes(codes, np.array([100], dtype=np.int32))
    assert len(out) == 3
    # ladders must differ (independent seeds) and be deterministic
    v0 = out[0][0][0]
    m2 = MultiKRollingEncoder([13, 17, 21])
    out2 = m2.hashes(codes, np.array([100], dtype=np.int32))
    np.testing.assert_array_equal(v0, out2[0][0][0])


def test_mt19937_64_known_value():
    """10000th output of mt19937_64(5489) per the C++ standard:
    9981545732273789042."""
    mt = _MT19937_64(5489)
    for _ in range(9999):
        mt.next()
    assert mt.next() == 9981545732273789042


def test_windowed_rolling_minimizers():
    rng = np.random.default_rng(4)
    seq = random_dna(rng, 200)
    lut = DNA4.lut
    codes = lut[np.frombuffer(seq, np.uint8)][None]
    enc = RollingEncoder(15, canon=False, window=45)
    vals, mask = enc.emissions(codes, np.array([200], dtype=np.int32))
    assert int(mask.sum()) == 200 - 45 + 1


def test_nthash_mode():
    """ntHash backend: fixed published seeds, canonical strand symmetry."""
    from bonsai_tpu.core.rolling import RollingEncoder, NTHASH_SEEDS, buzhash

    rng = np.random.default_rng(11)
    L, k = 300, 21
    codes = rng.integers(0, 4, size=L).astype(np.int8)
    rc = (3 - codes)[::-1].copy()
    enc = RollingEncoder(k, canon=True, nthash=True)
    hf, inv = enc.hashes(codes[None, :])
    hr, _ = enc.hashes(rc[None, :])
    # canonical hash multiset is strand-invariant
    assert sorted(hf[0].tolist()) == sorted(hr[0].tolist())
    # deterministic: table is the published constant set
    assert enc.table_f is NTHASH_SEEDS and enc.table_r is NTHASH_SEEDS
    # uncanonical fwd hash of the first window equals the closed-form fold
    enc2 = RollingEncoder(k, canon=False, nthash=True)
    h2, _ = enc2.hashes(codes[None, :])
    acc = np.uint64(0)
    for j in range(k):
        r = (k - 1 - j) % 64
        t = NTHASH_SEEDS[codes[j]]
        acc ^= np.uint64((int(t) << r | int(t) >> (64 - r)) & (2**64 - 1)) if r else t
    assert h2[0, 0] == acc

    # multi-k ladder accepts the flag
    from bonsai_tpu.core.rolling import MultiKRollingEncoder

    mk = MultiKRollingEncoder([15, 21], canon=True, nthash=True)
    outs = mk.hashes(codes[None, :], np.array([L], dtype=np.int32))
    assert len(outs) == 2 and outs[0][0].shape[-1] == L - 15 + 1
