"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime around the compute path is C/C++ (kseq parsing,
kthread pools, kstring output); the rebuild keeps the same split: JAX/XLA
owns device compute, this package owns the host-side hot I/O.  Compiled on
first use with g++ (cached in _build/); everything has a pure-Python
fallback so the framework works even without a toolchain.

Set BONSAI_TPU_NO_NATIVE=1 to force the Python fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src")
_BUILD = os.path.join(_HERE, "_build")
_LIB = os.path.join(_BUILD, "libbtpu.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _newest_src_mtime() -> float:
    return max(
        os.path.getmtime(os.path.join(_SRC, f))
        for f in os.listdir(_SRC)
        if f.endswith((".cpp", ".h"))
    )


def _build() -> bool:
    os.makedirs(_BUILD, exist_ok=True)
    srcs = [
        os.path.join(_SRC, f) for f in sorted(os.listdir(_SRC)) if f.endswith(".cpp")
    ]
    # build to a per-pid temp and rename: concurrent processes (e.g. a
    # test run next to a CLI run, both seeing a fresh source mtime) must
    # never dlopen a half-written .so
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread",
        *srcs, "-o", tmp, "-lz",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            sys.stderr.write(
                f"bonsai_tpu.native: build failed:\n{proc.stderr}\n"
            )
            return False
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass


def get_lib():
    """The loaded native library, or None (fallback to Python paths)."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("BONSAI_TPU_NO_NATIVE"):
        return _lib
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (
                not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < _newest_src_mtime()
            ):
                if not _build():
                    return None
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            sys.stderr.write(f"bonsai_tpu.native: load failed: {e}\n")
            return None
        _declare(lib)
        _lib = lib
    return _lib


def _declare(lib):
    c = ctypes
    lib.btpu_fastx_open.restype = c.c_void_p
    lib.btpu_fastx_open.argtypes = [c.c_char_p]
    lib.btpu_fastx_close.restype = None
    lib.btpu_fastx_close.argtypes = [c.c_void_p]
    lib.btpu_next_batch.restype = c.c_int64
    lib.btpu_next_batch.argtypes = [c.c_void_p, c.c_int64]
    lib.btpu_last_error.restype = c.c_char_p
    lib.btpu_last_error.argtypes = [c.c_void_p]
    lib.btpu_batch_info.restype = None
    lib.btpu_batch_info.argtypes = [
        c.c_void_p,
        c.POINTER(c.c_int64),
        c.POINTER(c.c_int64),
        c.POINTER(c.c_int64),
        c.POINTER(c.c_int32),
        c.POINTER(c.c_int32),
    ]
    lib.btpu_batch_fill.restype = None
    lib.btpu_batch_fill.argtypes = [
        c.c_void_p,
        c.c_void_p,  # names arena
        c.c_void_p,  # name_offs
        c.c_void_p,  # seqs arena
        c.c_void_p,  # seq_offs
        c.c_void_p,  # quals arena
        c.c_void_p,  # qual_offs
        c.c_void_p,  # lut
        c.c_void_p,  # codes
        c.c_int64,   # L
        c.c_void_p,  # lengths
    ]


    lib.btpu_canon_kmer_set.restype = c.c_int64
    lib.btpu_canon_kmer_set.argtypes = [
        c.c_void_p,  # seq bytes
        c.c_int64,   # n
        c.c_void_p,  # lut (256 x int8)
        c.c_int32,   # k
        c.c_int32,   # canonical
        c.c_void_p,  # out (u64 x n)
    ]

    lib.btpu_format_kraken.restype = c.c_int64
    lib.btpu_format_kraken.argtypes = [
        c.c_int64,   # n (rows = reads or merged mate pairs)
        c.c_void_p,  # names arena
        c.c_void_p,  # name_offs
        c.c_void_p,  # lengths (mate 1)
        c.c_void_p,  # lengths2 (mate 2, NULL for single-end)
        c.c_void_p,  # taxon
        c.c_void_p,  # taxa
        c.c_void_p,  # hitmask
        c.c_int64,   # P (row width)
        c.c_void_p,  # n_missing
        c.c_void_p,  # n_kmers (total valid)
        c.c_void_p,  # n_kmers1 (mate-1 valid)
        c.c_int32,   # comb_size
        c.c_int32,   # emit_all
        c.c_void_p,  # out
        c.c_int64,   # cap
    ]

    lib.btpu_pack_batch.restype = c.c_int64
    lib.btpu_pack_batch.argtypes = [
        c.c_void_p,  # codes (n, L) int8
        c.c_int64,   # n
        c.c_int64,   # L
        c.c_void_p,  # lengths (n,) int32
        c.c_int64,   # Bp
        c.c_int64,   # w16
        c.c_int64,   # lproc
        c.c_void_p,  # pcodes (Bp, w16) u32
        c.c_void_p,  # nmask (Bp, nmw) u32
        c.c_int64,   # nmw
        c.c_void_p,  # nidx (cap,) u32
        c.c_int64,   # cap
    ]
    lib.btpu_radix_sort_u64.restype = c.c_int32
    lib.btpu_radix_sort_u64.argtypes = [c.c_void_p, c.c_int64]
    lib.btpu_radix_sort_kv.restype = c.c_int32
    lib.btpu_radix_sort_kv.argtypes = [c.c_void_p, c.c_void_p, c.c_int64]
    lib.btpu_sort_dedup_u64.restype = c.c_int64
    lib.btpu_sort_dedup_u64.argtypes = [c.c_void_p, c.c_int64]
    lib.btpu_cuckoo_place.restype = c.c_int32
    lib.btpu_cuckoo_place.argtypes = [
        c.c_void_p,  # h (u64 hashes)
        c.c_int64,   # n
        c.c_int64,   # nb
        c.c_uint64,  # bsalt
        c.c_int32,   # max_walk
        c.c_void_p,  # owner out
        c.c_void_p,  # choice out
    ]

    lib.btpu_merge_fold_stats.restype = c.c_int64
    lib.btpu_merge_fold_stats.argtypes = [
        c.c_int32,   # n_runs
        c.c_void_p,  # run_keys (ptr array)
        c.c_void_p,  # run_lens (i64 array)
        c.c_void_p,  # run_tins (ptr array, NULL entries -> const)
        c.c_void_p,  # run_tin_const (i32 array)
        c.c_void_p,  # run_tvals (ptr array, NULL entries -> const)
        c.c_void_p,  # run_tval_const (u32 array)
        c.c_int32,   # big sentinel
        c.c_void_p,  # out_keys
        c.c_void_p,  # out_tmin
        c.c_void_p,  # out_tmax
        c.c_void_p,  # out_nmiss
        c.c_void_p,  # out_nnz
        c.c_void_p,  # out_mmin
        c.c_void_p,  # out_mmax
        c.c_void_p,  # out_count
    ]

    lib.btpu_format_kraken_runs.restype = c.c_int64
    lib.btpu_format_kraken_runs.argtypes = [
        c.c_int64,   # n (rows = reads or merged mate pairs)
        c.c_void_p,  # names arena
        c.c_void_p,  # name_offs
        c.c_void_p,  # lengths (mate 1)
        c.c_void_p,  # lengths2 (mate 2, NULL for single-end)
        c.c_void_p,  # taxon
        c.c_void_p,  # run_vals (n x maxr)
        c.c_void_p,  # run_lens (n x maxr)
        c.c_void_p,  # n_runs
        c.c_int64,   # maxr
        c.c_void_p,  # n_missing
        c.c_void_p,  # n_kmers (total valid)
        c.c_void_p,  # n_kmers1 (mate-1 valid)
        c.c_int32,   # comb_size
        c.c_int32,   # emit_all
        c.c_void_p,  # out
        c.c_int64,   # cap
    ]


def available() -> bool:
    return get_lib() is not None
