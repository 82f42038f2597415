"""Continuous SetSketch (CSetSketch) and b-bit packed SetSketch.

Equivalent of sketch::setsketch::CSetSketch<double> used by
/root/reference/bin/setsketcher.cpp:42,145 and the packed conversions in
bin/css2ss.cpp / bin/shs2sketch.cpp (the dnbaker/sketch submodule is empty
in the reference checkout, so semantics follow the published SetSketch
construction [Ertl 2021] and the call-site API: update/merge/cardinality/
clear/max/min/write/ids/idcounts/optimal_parameters).

Construction: per element x, a rate-m Poisson arrival process (counter-
based hash off x, so bit-deterministic regardless of batching); each
arrival lands on a uniformly chosen register.  Uniform thinning of a
rate-m process over m registers gives each register an independent rate-1
process, so a register's first arrival from x is Exp(1) and the register
value (min over all elements) is Exp(n) for a set of n elements — the
unbiased cardinality estimator is (m-1) / sum(r).  Joint property: a
register is EQUAL across two sketches iff its min-achieving element is
shared, which happens with probability |A n B| / |A u B| -> Jaccard =
#equal/m.

Early termination mirrors the reference's order-statistics algorithm
(Ertl 2021): an element stops generating arrivals once its arrival time
exceeds the current max register (it can no longer change anything), so
the amortized cost is O(1) hashes per element once the sketch saturates.
The whole loop is batch-vectorized (rounds of 16 arrivals across the
surviving elements).
"""

from __future__ import annotations

import gzip
import math
import struct
from typing import Optional, Tuple

import numpy as np

MAGIC = b"BTPUCSS1"
PACKED_MAGIC = b"BTPUPSS1"

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _mix(z: np.ndarray) -> np.ndarray:
    z = (z ^ (z >> np.uint64(30))) * _MIX2
    z = (z ^ (z >> np.uint64(27))) * _MIX3
    return z ^ (z >> np.uint64(31))


def _arrivals(h: np.ndarray, ctr0: np.ndarray, nsteps: int, m: int):
    """For elements with per-element hash h and arrival counters starting at
    ctr0: the next `nsteps` (gap, register) pairs of each element's rate-m
    Poisson process.  Deterministic in (h, counter)."""
    c = ctr0[:, None] + np.arange(nsteps, dtype=np.uint64)[None, :]
    z = _mix(h[:, None] + _MIX1 * (c + np.uint64(1)))
    u = ((z >> np.uint64(11)).astype(np.float64) + 1.0) * (2.0 ** -53)
    gaps = -np.log(u) / m  # Exp(m) inter-arrival gaps
    idx = (_mix(z + _MIX3) % np.uint64(m)).astype(np.int64)
    return gaps, idx


class CSetSketch:
    def __init__(self, m: int = 4096, save_kmers: bool = False,
                 save_kmer_counts: bool = False,
                 startmax: float = math.inf):
        self.m = int(m)
        self.registers = np.full(self.m, startmax, dtype=np.float64)
        self.save_kmers = bool(save_kmers or save_kmer_counts)
        self.save_kmer_counts = bool(save_kmer_counts)
        self._ids = np.zeros(self.m, dtype=np.uint64) if self.save_kmers else None
        self._idcounts = (
            np.zeros(self.m, dtype=np.uint32) if self.save_kmer_counts else None
        )
        self.n_updates = 0

    # -- filling ----------------------------------------------------------
    def update(self, values: np.ndarray, chunk: int = 1 << 16):
        """Batched update with raw u64 values (already-hashed kmers)."""
        v = np.asarray(values, dtype=np.uint64).ravel()
        self.n_updates += int(v.size)
        for lo in range(0, v.size, chunk):
            self._update_chunk(v[lo : lo + chunk])

    def _update_chunk(self, v: np.ndarray, nsteps: int = 16):
        h = _mix(v)
        t = np.zeros(v.size, dtype=np.float64)  # arrival clock per element
        ctr = np.zeros(v.size, dtype=np.uint64)
        alive = np.arange(v.size)
        regs = self.registers
        while alive.size:
            thresh = regs.max()  # nothing above this can ever matter
            gaps, idx = _arrivals(h[alive], ctr[alive], nsteps, self.m)
            times = t[alive, None] + np.cumsum(gaps, axis=1)
            ok = times < thresh
            fi = idx[ok]
            ft = times[ok]
            if fi.size:
                if self.save_kmers:
                    fel = np.broadcast_to(alive[:, None], idx.shape)[ok]
                    order = np.lexsort((ft, fi))
                    fi_o, ft_o, fel_o = fi[order], ft[order], fel[order]
                    first = np.ones(fi_o.size, dtype=bool)
                    first[1:] = fi_o[1:] != fi_o[:-1]
                    ri, rt, re = fi_o[first], ft_o[first], fel_o[first]
                    better = rt < regs[ri]
                    if self.save_kmer_counts:
                        same = (~better) & (rt == regs[ri]) & (
                            v[re] == self._ids[ri]
                        )
                        self._idcounts[ri[same]] += 1
                        self._idcounts[ri[better]] = 1
                    self._ids[ri[better]] = v[re[better]]
                    regs[ri[better]] = rt[better]
                else:
                    np.minimum.at(regs, fi, ft)
            t[alive] = times[:, -1]
            ctr[alive] += np.uint64(nsteps)
            alive = alive[times[:, -1] < thresh]
        self.registers = regs

    # -- API parity with the reference call sites --------------------------
    def total_updates(self) -> int:
        return self.n_updates

    def clear(self):
        self.registers.fill(math.inf)
        self.n_updates = 0
        if self._ids is not None:
            self._ids.fill(0)
        if self._idcounts is not None:
            self._idcounts.fill(0)

    def cardinality(self) -> float:
        s = float(np.sum(self.registers[np.isfinite(self.registers)]))
        nfin = int(np.isfinite(self.registers).sum())
        if s <= 0 or nfin == 0:
            return 0.0
        if nfin < self.m:  # not all registers touched: tiny set
            return float(nfin)
        return (self.m - 1) / s

    def merge(self, other: "CSetSketch") -> "CSetSketch":
        if other.m != self.m:
            raise ValueError("incompatible sketch sizes")
        if self.save_kmers:
            take = other.registers < self.registers
            self._ids[take] = other._ids[take]
            if self.save_kmer_counts and other._idcounts is not None:
                self._idcounts[take] = other._idcounts[take]
        np.minimum(self.registers, other.registers, out=self.registers)
        self.n_updates += other.n_updates
        return self

    __iadd__ = merge

    def max(self) -> float:
        fin = self.registers[np.isfinite(self.registers)]
        return float(fin.max()) if fin.size else 0.0

    def min(self) -> float:
        fin = self.registers[np.isfinite(self.registers)]
        return float(fin.min()) if fin.size else 0.0

    def ids(self) -> np.ndarray:
        if self._ids is None:
            raise ValueError("sketch built without save_kmers")
        return self._ids

    def idcounts(self) -> np.ndarray:
        if self._idcounts is None:
            raise ValueError("sketch built without save_kmer_counts")
        return self._idcounts

    # -- similarity ---------------------------------------------------------
    def jaccard(self, other: "CSetSketch") -> float:
        """P(register equal) = |A n B| / |A u B| for min-of-Exp registers."""
        both = np.isfinite(self.registers) & np.isfinite(other.registers)
        if not both.any():
            return 0.0
        eq = both & (self.registers == other.registers)
        return float(eq.sum()) / float(self.m)

    # -- packing ------------------------------------------------------------
    def optimal_parameters(self, maxv: Optional[float] = None,
                           minv: Optional[float] = None,
                           qmax: int = 65535) -> Tuple[float, float]:
        """(b, a) such that K = clamp(1 + floor(log_b(1/(a*r))), 0, qmax)
        spans the register range (mirrors setsketcher.cpp:247-256's report
        of optimal a, b per integer width)."""
        maxv = self.max() if maxv is None else maxv
        minv = self.min() if minv is None else minv
        if not (maxv > 0 and minv > 0) or maxv == minv:
            return (1.001, 1.0 / max(maxv, 1e-300))
        b = (maxv / minv) ** (1.0 / max(qmax - 1, 1))
        a = 1.0 / maxv
        return (b, a)

    def to_packed(self, b: float, a: float, bits: int = 16) -> "SetSketch":
        q = (1 << bits) - 1
        r = np.clip(self.registers, 1e-300, None)
        with np.errstate(over="ignore"):
            k = 1 + np.floor(-np.log(a * r) / math.log(b))
        k = np.clip(np.nan_to_num(k, posinf=q, neginf=0), 0, q)
        return SetSketch(k.astype(np.uint32), b=b, a=a, bits=bits)

    # -- serialization -------------------------------------------------------
    def write(self, path: str):
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "wb") as fh:
            fh.write(MAGIC)
            fh.write(struct.pack("<QQ", self.m, self.n_updates))
            flags = (1 if self.save_kmers else 0) | (
                2 if self.save_kmer_counts else 0
            )
            fh.write(struct.pack("<Q", flags))
            fh.write(self.registers.tobytes())
            if self.save_kmers:
                fh.write(self._ids.tobytes())
            if self.save_kmer_counts:
                fh.write(self._idcounts.tobytes())

    @classmethod
    def read(cls, path: str) -> "CSetSketch":
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rb") as fh:
            magic = fh.read(8)
            if magic != MAGIC:
                raise ValueError(f"{path}: not a CSetSketch file")
            m, nup = struct.unpack("<QQ", fh.read(16))
            (flags,) = struct.unpack("<Q", fh.read(8))
            s = cls(m, save_kmers=bool(flags & 1),
                    save_kmer_counts=bool(flags & 2))
            s.registers = np.frombuffer(fh.read(8 * m), dtype=np.float64).copy()
            s.n_updates = nup
            if flags & 1:
                s._ids = np.frombuffer(fh.read(8 * m), dtype=np.uint64).copy()
            if flags & 2:
                s._idcounts = np.frombuffer(fh.read(4 * m), dtype=np.uint32).copy()
            return s


class SetSketch:
    """b-bit packed SetSketch (integer registers + (a, b) parameters), the
    css2ss / shs2sketch target format."""

    def __init__(self, registers: np.ndarray, b: float, a: float, bits: int):
        self.registers = np.asarray(registers, dtype=np.uint32)
        self.m = int(self.registers.size)
        self.b = float(b)
        self.a = float(a)
        self.bits = int(bits)

    def jaccard(self, other: "SetSketch") -> float:
        if other.m != self.m:
            raise ValueError("incompatible sketch sizes")
        return float((self.registers == other.registers).sum()) / self.m

    def cardinality(self) -> float:
        # invert the discretization back to continuous values, then the
        # (m-1)/sum estimator; registers at 0 / qmax are saturated
        q = (1 << self.bits) - 1
        k = self.registers.astype(np.float64)
        r = np.power(self.b, 1.0 - k) / self.a
        s = float(r.sum())
        return (self.m - 1) / s if s > 0 else 0.0

    def write(self, path: str):
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "wb") as fh:
            fh.write(PACKED_MAGIC)
            fh.write(struct.pack("<QddQ", self.m, self.b, self.a, self.bits))
            if self.bits <= 8:
                fh.write(self.registers.astype(np.uint8).tobytes())
            elif self.bits <= 16:
                fh.write(self.registers.astype(np.uint16).tobytes())
            else:
                fh.write(self.registers.tobytes())

    @classmethod
    def read(cls, path: str) -> "SetSketch":
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rb") as fh:
            if fh.read(8) != PACKED_MAGIC:
                raise ValueError(f"{path}: not a packed SetSketch file")
            m, b, a, bits = struct.unpack("<QddQ", fh.read(32))
            dt = np.uint8 if bits <= 8 else np.uint16 if bits <= 16 else np.uint32
            regs = np.frombuffer(fh.read(m * dt().itemsize), dtype=dt)
            return cls(regs.astype(np.uint32), b=b, a=a, bits=int(bits))
