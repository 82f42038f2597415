"""HyperLogLog with the Ertl maximum-likelihood estimator.

Equivalent of the dnbaker/sketch hll_t used by the reference for DB
presizing and cardinality tools (bin/bonsai.cpp:90-105, encoder.h:1097-1110;
the submodule is empty in the reference checkout, so interfaces are
reconstructed from call sites): p-bit register index, max-of-rho registers,
ERTL_MLE estimation, merge by register max, inclusion-exclusion Jaccard.

Register fill is a vectorized segment max (np.maximum.at on host, scatter-max
on device); merging across a device mesh is an elementwise-max all-reduce.

Estimation follows "New cardinality estimation algorithms for HyperLogLog
sketches" (Ertl 2017), algorithm 6 (the improved raw estimator, accuracy on
par with the MLE estimator at a fraction of the cost).
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np

from ..core import hashes


class HyperLogLog:
    def __init__(self, p: int = 14):
        if not 4 <= p <= 30:
            raise ValueError("p out of range")
        self.p = p
        self.m = 1 << p
        self.q = 64 - p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    # -- filling -----------------------------------------------------------
    def add_hashes(self, h: np.ndarray):
        """Add pre-hashed uint64 values (vectorized)."""
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(self.q)).astype(np.int64)
        w = h << np.uint64(self.p)
        # rho = clz(w) + 1 over the q-bit suffix; w == 0 -> q + 1
        rho = np.where(
            w == 0,
            np.uint8(self.q + 1),
            (64 - self._bitlen(w)).astype(np.uint8) + np.uint8(1),
        )
        np.maximum.at(self.registers, idx, rho.astype(np.uint8))

    @staticmethod
    def _bitlen(w: np.ndarray) -> np.ndarray:
        """Position of highest set bit (0 for w==0), vectorized."""
        r = np.zeros(w.shape, dtype=np.int64)
        v = w.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(s))
            r = r + np.where(big, s, 0)
            v = np.where(big, v >> np.uint64(s), v)
        return r + (w != 0)

    def addh(self, values: np.ndarray):
        """Hash (wang_hash, matching the reference sketch default) then
        add."""
        v = np.asarray(values, dtype=np.uint64)
        self.add_hashes(hashes.wang_hash(v))

    # -- merging ------------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("incompatible precisions")
        self.registers = np.maximum(self.registers, other.registers)
        return self

    __iadd__ = merge

    def clone(self) -> "HyperLogLog":
        h = HyperLogLog(self.p)
        h.registers = self.registers.copy()
        return h

    # -- estimation -----------------------------------------------------
    def counts(self) -> np.ndarray:
        return np.bincount(self.registers, minlength=self.q + 2)

    def report(self) -> float:
        C = self.counts()
        return _ertl_estimate(C, self.m, self.q)

    def est_err(self) -> float:
        """Approximate relative standard error * cardinality."""
        return 1.03896 / math.sqrt(self.m) * max(self.report(), 1.0)

    def union_estimate(self, other: "HyperLogLog") -> float:
        return self.clone().merge(other).report()

    def jaccard(self, other: "HyperLogLog") -> float:
        a = self.report()
        b = other.report()
        u = self.union_estimate(other)
        if u <= 0:
            return 0.0
        inter = max(a + b - u, 0.0)
        return inter / u


def _ertl_sigma(x: float) -> float:
    """Ertl 2017 algorithm 6 helper: sigma(x) = x + sum 2^(k-1) x^(2^k)."""
    if x == 1.0:
        return math.inf
    y = 1.0
    z = x
    while True:
        x = x * x
        z_prev = z
        z += x * y
        y += y
        if z == z_prev:
            return z


def _ertl_tau(x: float) -> float:
    """Ertl 2017 algorithm 6 helper."""
    if x == 0.0 or x == 1.0:
        return 0.0
    y = 1.0
    z = 1.0 - x
    while True:
        x = math.sqrt(x)
        z_prev = z
        y *= 0.5
        z -= (1.0 - x) ** 2 * y
        if z == z_prev:
            return z / 3.0


def _ertl_estimate(C: np.ndarray, m: int, q: int) -> float:
    """Ertl 2017, algorithm 6: the improved raw estimator — bias-free
    across the full range, accuracy on par with the MLE estimator."""
    z = m * _ertl_tau(1.0 - float(C[q + 1]) / m)
    for k in range(q, 0, -1):
        z = 0.5 * (z + float(C[k]))
    z = z + m * _ertl_sigma(float(C[0]) / m)
    if not math.isfinite(z) or z <= 0:
        return 0.0
    alpha_inf = 1.0 / (2.0 * math.log(2.0))
    return alpha_inf * m * m / z


def estimate_cardinality(
    kmer_arrays: Iterable[np.ndarray], p: int = 14
) -> float:
    """Union cardinality of k-mer streams (estimate_cardinality,
    bin/bonsai.cpp:100-105)."""
    h = HyperLogLog(p)
    for arr in kmer_arrays:
        h.addh(np.asarray(arr, dtype=np.uint64))
    return h.report()


def count_cardinality(paths, sp=None, canonicalize: bool = True, k: int = 31):
    """EXACT distinct-minimizer count across files (count_cardinality,
    encoder.h:1052-1094: per-file khash sets -> union -> size; here
    per-file sorted sets -> merged unique)."""
    from ..core.spacer import Spacer
    from ..db.build import genome_kmer_set

    if sp is None:
        sp = Spacer(k, k)
    sets = [genome_kmer_set(p, sp, canonicalize) for p in paths]
    if not sets:
        return 0
    return int(np.unique(np.concatenate(sets)).size)
