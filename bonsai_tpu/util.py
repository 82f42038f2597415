"""Misc utilities: bit-parallel kmer composition, timing, logging.

Equivalents of the reference's util.h helpers (SURVEY §2.1 misc util):
nuccount / gccount / kmer_entropy (util.h:398-486,1217-1239, the Bowtie2
bit trick, vectorized over arrays of kmers), the Timer / TIME_CODE RAII
profiling macros (util.h:96-153), and the LOG_* macros (logutil.h:9-64)
as a structured-logging setup."""

from __future__ import annotations

import contextlib
import logging
import sys
import time
from typing import Iterator, Optional

import numpy as np

_M55 = np.uint64(0x5555555555555555)
_MAA = np.uint64(0xAAAAAAAAAAAAAAAA)
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    1
).astype(np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return _POP8[b].reshape(*x.shape, 8).sum(-1).astype(np.int64)


def nuccount(kmer, k: int) -> np.ndarray:
    """Per-base counts of a packed 2-bit kmer: (..., 4) int64 in code
    order A,C,G,T (util.h:398-443; the reference packs them into one u32's
    byte lanes — we return an array)."""
    kmer = np.asarray(kmer, dtype=np.uint64)
    mask = np.uint64(0xFFFFFFFFFFFFFFFF) >> np.uint64(64 - 2 * k)
    out = np.empty(kmer.shape + (4,), dtype=np.int64)
    # c_table order in the reference is {A: all-ones, C: 0xaa.., G: 0x55..,
    # T: 0}: code c matches where both bits equal c
    for code, c0 in enumerate(
        (0xFFFFFFFFFFFFFFFF, 0xAAAAAAAAAAAAAAAA, 0x5555555555555555, 0)
    ):
        x0 = kmer ^ np.uint64(c0)
        x3 = x0 & ((x0 >> np.uint64(1)) & _M55) & mask
        out[..., code] = _popcount64(x3)
    return out


def gccount(kmer, k: int) -> np.ndarray:
    """G+C count of packed kmers (util.h:1217-1239)."""
    nc = nuccount(kmer, k)
    return nc[..., 1] + nc[..., 2]


def kmer_entropy(kmer, k: int) -> np.ndarray:
    """Shannon entropy of base composition (util.h:1201-1209).  NOTE: the
    reference returns the SIGNED sum p*log2(p) (a negative value) and hits
    log2(0) = -inf * 0 = nan for absent bases; we return the standard
    -sum p log2 p with 0*log(0) = 0."""
    counts = nuccount(kmer, k)
    p = counts / float(k)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(p > 0, p * np.log2(np.where(p > 0, p, 1.0)), 0.0)
    return -t.sum(-1)


def bitvec2str(row: np.ndarray) -> str:
    """util.h:1190-1196: MSB-first bit string of a packed-u64 vector."""
    return "".join(
        format(int(w), "064b") for w in np.asarray(row, dtype=np.uint64)
    )


# -- timing -----------------------------------------------------------------
class Timer:
    """RAII timer (util.h:96-102): prints ns to stderr on stop/exit."""

    def __init__(self, msg: Optional[str] = None, fh=None):
        self.msg = msg
        self.fh = fh if fh is not None else sys.stderr
        self.start = time.perf_counter_ns()
        self.elapsed_ns = None

    def restart(self, msg: Optional[str] = None):
        if msg is not None:
            self.msg = msg
        self.start = time.perf_counter_ns()

    def stop(self):
        self.elapsed_ns = time.perf_counter_ns() - self.start
        return self.elapsed_ns

    def report(self):
        if self.elapsed_ns is None:
            self.stop()
        label = self.msg or "Timer"
        print(f"[{label}] {self.elapsed_ns} ns", file=self.fh)

    def __enter__(self):
        self.restart()
        return self

    def __exit__(self, *exc):
        self.stop()
        self.report()
        return False


@contextlib.contextmanager
def time_code(msg: str, fh=None) -> Iterator[Timer]:
    """TIME_CODE macro (util.h:142-153) as a context manager; also traces
    the block in the jax profiler when one is active."""
    try:
        import jax.profiler as _prof

        ctx = _prof.TraceAnnotation(msg)
    except Exception:  # profiler unavailable
        ctx = contextlib.nullcontext()
    with ctx:
        with Timer(msg, fh) as t:
            yield t


# -- logging ----------------------------------------------------------------
_LOGGER = None


def get_logger() -> logging.Logger:
    """logutil.h-style logger: level, func:line prefix, stderr."""
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger("bonsai_tpu")
        if not logger.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(
                logging.Formatter(
                    "[%(levelname)s] [%(funcName)s:%(lineno)d] %(message)s"
                )
            )
            logger.addHandler(h)
            logger.setLevel(logging.INFO)
        _LOGGER = logger
    return _LOGGER
