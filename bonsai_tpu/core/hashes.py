"""Invertible 64-bit mixers used for minimizer orderings and table hashing.

* frev64 — the reference's Lex minimizer score: a fused
  xor/multiply/rotate/xor construction with the constants published in
  /root/reference/include/bonsai/encoder.h:47
  (CEIFused<CEIXOR<0x533f8c2151b20f97>, CEIMul<0x9a98567ed20c127d>,
  RotL<31>, CEIXOR<0x691a9d706391077a>>, applied left to right).  The sketch
  submodule providing CEIFused is empty in the reference checkout; the
  left-to-right application order is reconstructed from its call convention.
* wang_hash — Thomas Wang's 64-bit mix (hash.h:32-41), used by HyperLogLog.
* khash_int64_hash — klib khash's truncated hash (khash64.h:425), needed by
  the bonsai-database importer/exporter.

All functions are dual numpy/jnp (uint64 lanes).
"""

from __future__ import annotations

import numpy as np

_FREV_X1 = 0x533F8C2151B20F97
_FREV_MUL = 0x9A98567ED20C127D
_FREV_X2 = 0x691A9D706391077A


def _xp(x):
    if type(x).__module__.startswith("jax") or hasattr(x, "aval"):
        import jax.numpy as jnp

        return jnp
    return np


def rotl64(x, r: int):
    xp = _xp(x)
    return (x << xp.uint64(r)) | (x >> xp.uint64(64 - r))


def frev64(x):
    """Lex minimizer score (bijective).  encoder.h:47,59-60."""
    xp = _xp(x)
    x = x ^ xp.uint64(_FREV_X1)
    x = x * xp.uint64(_FREV_MUL)
    x = rotl64(x, 31)
    return x ^ xp.uint64(_FREV_X2)


def frev64_inv(x):
    """Inverse of frev64 (multiplicative inverse of the odd constant)."""
    xp = _xp(x)
    inv_mul = pow(_FREV_MUL, -1, 1 << 64)
    x = x ^ xp.uint64(_FREV_X2)
    x = rotl64(x, 33)  # rotr 31
    x = x * xp.uint64(inv_mul)
    return x ^ xp.uint64(_FREV_X1)


def wang_hash(x):
    """Thomas Wang 64-bit mix (hash.h:32-41)."""
    xp = _xp(x)

    def c(v):
        return xp.uint64(v)

    x = (~x) + (x << c(21))
    x = x ^ (x >> c(24))
    x = x * c(265)
    x = x ^ (x >> c(14))
    x = x * c(21)
    x = x ^ (x >> c(28))
    x = x + (x << c(31))
    return x


def khash_int64_hash(x):
    """klib khash int64 hash, truncated to u32 (khash64.h:425)."""
    xp = _xp(x)
    h = (x >> xp.uint64(33)) ^ x ^ (x << xp.uint64(11))
    return h & xp.uint64(0xFFFFFFFF)


# splitmix64 — used for bonsai-tpu's own table bucketing (any strong mixer
# works; splitmix is cheap and well dispersed).
def splitmix64(x):
    xp = _xp(x)

    def c(v):
        return xp.uint64(v)

    x = (x + c(0x9E3779B97F4A7C15))
    x = (x ^ (x >> c(30))) * c(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> c(27))) * c(0x94D049BB133111EB)
    return x ^ (x >> c(31))


def wang_hash_inv(x):
    """Inverse of wang_hash (irving_inv_hash, hash.h:94-120)."""
    xp = _xp(x)

    def c(v):
        return xp.uint64(v)

    key = xp.asarray(x, dtype=xp.uint64) if xp is __import__("numpy") else x
    tmp = key - (key << c(31))
    key = key - (tmp << c(31))
    tmp = key ^ (key >> c(28))
    key = key ^ (tmp >> c(28))
    key = key * c(14933078535860113213)
    tmp = key ^ (key >> c(14))
    tmp = key ^ (tmp >> c(14))
    tmp = key ^ (tmp >> c(14))
    key = key ^ (tmp >> c(14))
    key = key * c(15244667743933553977)
    tmp = key ^ (key >> c(24))
    key = key ^ (tmp >> c(24))
    tmp = ~key
    tmp = ~(key - (tmp << c(21)))
    tmp = ~(key - (tmp << c(21)))
    key = ~(key - (tmp << c(21)))
    return key


def lrot(x, r: int):
    """Left bit rotate (hash.h lrot)."""
    return rotl64(x, r)


def rrot(x, r: int):
    """Right bit rotate (hash.h rrot)."""
    return rotl64(x, (64 - r) % 64)


def dbm_hash(s: bytes) -> int:
    """sdbm string hash (hash.h dbm_hash)."""
    h = 0
    for ch in s:
        h = (ch + (h << 6) + (h << 16) - h) & ((1 << 64) - 1)
    return h


def x31_hash(s: bytes) -> int:
    """khash X31 string hash (hash.h:123-128)."""
    h = 0
    for ch in s:
        h = ((h << 5) - h + ch) & 0xFFFFFFFF
    return h
