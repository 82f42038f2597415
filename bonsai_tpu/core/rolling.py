"""Unbounded-k rolling hashes (cyclic/buzhash), batched.

Equivalent of RollingHasher / RollingHasherSet
(/root/reference/include/bonsai/encoder.h:644-1003 over the vendored
rollinghash/cyclichash.h).  The scalar recurrence

    h' = rotl1(h) ^ rotl_{k mod 64}(T[out]) ^ T[in]

unrolls to the closed form  h_i = XOR_{j<k} rotl_{(k-1-j) mod 64}(T[c_{i+j}])
— so each position's hash is an XOR-fold of k static slices through
*pre-rotated* per-offset character tables: fully data-parallel, no
sequential state, unbounded k (only the rotation amounts wrap at 64).

Character tables reproduce the vendored CharacterHash construction
(rollinghash/characterhash.h:85-103): wyrand(seed) stream masked to the
word size.  The reverse-complement hasher hashes the reverse-complement of
each window with its own table, as RollingHasherSet does
(encoder.h:894-897); note RollingHasher::for_each_canon's *initial* rc fill
in the reference eats the same character k times (encoder.h:721 uses
`s[i - nf + k_ - 1]` where i==nf) — a bug that poisons its rc stream; we
implement the correct construction (matching RollingHasherSet's).

N handling: the reference skips ahead k characters after an ambiguous base
and gives up near the sequence end (encoder.h:712-716); we use exact
window-validity semantics (a window containing an N emits nothing), which
is a strict superset of the reference's emissions.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

U64_MAX = (1 << 64) - 1


# -- wyrand (public wyhash v4 recipe; vendored aesctr/wy.h is an empty
# submodule in the reference checkout, so parity is best-effort) ------------
def _wyrand_stream(seed: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    state = seed & U64_MAX
    for i in range(n):
        state = (state + 0xA0761D6478BD642F) & U64_MAX
        t = (state ^ 0xE7037ED1A0B428DB) * state
        out[i] = ((t >> 64) ^ t) & U64_MAX
    return out


def character_table(seed1: int, seed2: int, n_chars: int = 4) -> np.ndarray:
    """CharacterHash over the code alphabet: T[c] = wyrand value
    (characterhash.h:85-103 with maxval = 2^64-1)."""
    return _wyrand_stream((seed1 ^ seed2) & U64_MAX, n_chars)


# ntHash v1 per-base seed values (Mohamadi et al. 2016, published in the
# ntHash repository; the reference's ntHash/ submodule is empty in this
# checkout — encoder.h:382,391 calls NTC64 — so these come from the paper's
# public code).  ntHash's rc stream hashes the complement bases with the
# SAME table, unlike the two-table RollingHasher.
NTHASH_SEEDS = np.array(
    [
        0x3C8BFBB395C60474,  # A
        0x3193C18562A02B4C,  # C
        0x20323ED082572324,  # G
        0x295549F54BE24456,  # T
    ],
    dtype=np.uint64,
)


def _rotl(x: np.ndarray, r: int):
    r %= 64
    if r == 0:
        return x
    if isinstance(x, np.ndarray):
        return ((x << np.uint64(r)) | (x >> np.uint64(64 - r))).astype(np.uint64)
    import jax.numpy as jnp

    return (x << jnp.uint64(r)) | (x >> jnp.uint64(64 - r))


def _xp(x):
    if type(x).__module__.startswith("jax") or hasattr(x, "aval"):
        import jax.numpy as jnp

        return jnp
    return np


def buzhash(codes, k: int, table: np.ndarray):
    """Per-position cyclic hash of each k-window.

    codes: (..., L) int8 (-1 ambiguous).  Returns (hashes (..., L-k+1)
    uint64, invalid (..., L-k+1) bool).
    """
    xp = _xp(codes)
    L = codes.shape[-1]
    P = L - k + 1
    if P <= 0:
        raise ValueError(f"k={k} > length {L}")
    h = None
    invalid = None
    table = np.asarray(table, dtype=np.uint64)
    for j in range(k):
        rot = (k - 1 - j) % 64
        rt = xp.asarray(_rotl(table, rot))
        sl = codes[..., j : j + P]
        bad = sl < 0
        v = rt[xp.where(bad, 0, sl).astype(xp.int32)]
        h = v if h is None else h ^ v
        invalid = bad if invalid is None else (invalid | bad)
    return h, invalid


def buzhash_rc(codes, k: int, table: np.ndarray):
    """Cyclic hash of the reverse complement of each window: equivalent to
    feeding complemented codes in reverse order (RollingHasherSet,
    encoder.h:894-897)."""
    xp = _xp(codes)
    L = codes.shape[-1]
    P = L - k + 1
    h = None
    invalid = None
    table = np.asarray(table, dtype=np.uint64)
    for j in range(k):
        # rc position m = k-1-j carries rotation (k-1-m) = j and the
        # complement of the forward char at offset j
        sl = codes[..., j : j + P]
        bad = sl < 0
        comp = xp.where(bad, 0, 3 - sl).astype(xp.int32)
        rt = xp.asarray(_rotl(table, j % 64))
        v = rt[comp]
        h = v if h is None else h ^ v
        invalid = bad if invalid is None else (invalid | bad)
    return h, invalid


class RollingEncoder:
    """Batched RollingHasher: canonical min(fwd, rc) cyclic hashes with
    optional minimizer window.

    seeds default to the reference's (1337, 137) forward and
    (1337*137, 1337^137) reverse (encoder.h:672-684)."""

    def __init__(self, k: int, canon: bool = False, window: int = -1,
                 seed1: int = 1337, seed2: int = 137, n_chars: int = 4,
                 nthash: bool = False):
        self.k = k
        self.canon = canon
        self.w = window if window and window > k else -1
        if nthash:
            # ntHash NTC64 (encoder.h for_each_hash backend): fixed published
            # seeds; the rc stream uses the same table over complement bases
            if n_chars != 4:
                raise ValueError("nthash mode is DNA-only")
            self.table_f = NTHASH_SEEDS
            self.table_r = NTHASH_SEEDS
        else:
            self.table_f = character_table(seed1, seed2, n_chars)
            self.table_r = character_table(
                (seed1 * seed2) & U64_MAX, seed1 ^ seed2, n_chars
            )

    def hashes(self, codes):
        """(values (..., P), invalid) — canonical if self.canon."""
        xp = _xp(codes)
        hf, inv = buzhash(codes, self.k, self.table_f)
        if not self.canon:
            return hf, inv
        hr, _ = buzhash_rc(codes, self.k, self.table_r)
        return xp.minimum(hf, hr), inv

    def emissions(self, codes, lengths):
        """Windowed/unwindowed emission stream matching the Encoder
        discipline: valid windows only, sliding (score=frev64? no —
        RollingHasher scores by lex_score of the hash itself,
        encoder.h:709,775)."""
        from . import encode as enc_mod, hashes as hsh, minimize

        xp = _xp(codes)
        vals, invalid = self.hashes(codes)
        P = vals.shape[-1]
        inb = enc_mod.position_validity(lengths, P, self.k)
        valid = inb & ~invalid
        if self.w <= 0:
            return vals, valid
        W = self.w - self.k + 1
        scores = hsh.frev64(vals)
        out_k, out_v, tail_k, tail_v = minimize.compacted_minimizers(
            scores, vals, valid, W
        )
        values = xp.concatenate([tail_k[:, None], out_k], axis=-1)
        mask = xp.concatenate([tail_v[:, None], out_v], axis=-1)
        return values, mask


class MultiKRollingEncoder:
    """RollingHasherSet: a ladder of k values hashed in one pass
    (encoder.h:867-1003).  Seeds are drawn from std::mt19937_64(seedseed)
    pairs, reproduced exactly."""

    def __init__(self, ks: Sequence[int], canon: bool = False,
                 seedseed: int = 1337, n_chars: int = 4, nthash: bool = False):
        self.ks = list(ks)
        mt = _MT19937_64(seedseed)
        self.encoders: List[RollingEncoder] = []
        for k in self.ks:
            s1 = mt.next()
            s2 = mt.next()
            self.encoders.append(
                RollingEncoder(k, canon, -1, s1, s2, n_chars, nthash=nthash)
            )

    def hashes(self, codes, lengths):
        """[(values, valid)] per k."""
        from . import encode as enc_mod

        out = []
        for enc in self.encoders:
            vals, invalid = enc.hashes(codes)
            P = vals.shape[-1]
            inb = enc_mod.position_validity(lengths, P, enc.k)
            out.append((vals, inb & ~invalid))
        return out


class _MT19937_64:
    """std::mt19937_64, for RollingHasherSet seed parity
    (encoder.h:871-874)."""

    def __init__(self, seed: int):
        self.mt = [0] * 312
        self.idx = 312
        self.mt[0] = seed & U64_MAX
        for i in range(1, 312):
            self.mt[i] = (
                6364136223846793005 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 62))
                + i
            ) & U64_MAX

    def _generate(self):
        mt = self.mt
        LM = (1 << 31) - 1
        UM = U64_MAX ^ LM
        for i in range(312):
            x = (mt[i] & UM) | (mt[(i + 1) % 312] & LM)
            xa = x >> 1
            if x & 1:
                xa ^= 0xB5026F5AA96619E9
            mt[i] = mt[(i + 156) % 312] ^ xa
        self.idx = 0

    def next(self) -> int:
        if self.idx >= 312:
            self._generate()
        x = self.mt[self.idx]
        self.idx += 1
        x ^= (x >> 29) & 0x5555555555555555
        x ^= (x << 17) & 0x71D67FFFEDA60000
        x ^= (x << 37) & 0xFFF7EEE000000000
        x ^= x >> 43
        return x
