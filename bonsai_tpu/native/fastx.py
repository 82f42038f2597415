"""ctypes wrapper over the native FASTA/FASTQ batch parser.

Produces the same ReadBatch objects as io.fastx.batch_reads, but parsing,
2-bit LUT encoding, and pad-fill happen in one C++ pass per batch.
"""

from __future__ import annotations

import ctypes
from typing import Iterator, List, Optional

import numpy as np

from . import get_lib


class NativeFastxReader:
    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self.lib = lib
        self.h = lib.btpu_fastx_open(path.encode())
        if not self.h:
            raise FileNotFoundError(path)

    def close(self):
        if self.h:
            self.lib.btpu_fastx_close(self.h)
            self.h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def next_batch(self, max_reads: int, lut: np.ndarray, bucket_len):
        """Parse up to max_reads records.  Returns None at EOF, else
        (names, seqs, quals, codes, lengths)."""
        lib, h = self.lib, self.h
        n = lib.btpu_next_batch(h, max_reads)
        if n < 0:
            raise ValueError(lib.btpu_last_error(h).decode())
        if n == 0:
            return None
        nb = ctypes.c_int64()
        sb = ctypes.c_int64()
        qb = ctypes.c_int64()
        maxlen = ctypes.c_int32()
        has_qual = ctypes.c_int32()
        lib.btpu_batch_info(
            h,
            ctypes.byref(nb),
            ctypes.byref(sb),
            ctypes.byref(qb),
            ctypes.byref(maxlen),
            ctypes.byref(has_qual),
        )
        L = bucket_len(max(int(maxlen.value), 1))
        names_arena = np.empty(max(nb.value, 1), dtype=np.uint8)
        seqs_arena = np.empty(max(sb.value, 1), dtype=np.uint8)
        quals_arena = np.empty(max(qb.value, 1), dtype=np.uint8)
        name_offs = np.empty(n + 1, dtype=np.int64)
        seq_offs = np.empty(n + 1, dtype=np.int64)
        qual_offs = np.empty(n + 1, dtype=np.int64)
        codes = np.empty((n, L), dtype=np.int8)
        lengths = np.empty(n, dtype=np.int32)
        lut8 = np.ascontiguousarray(lut, dtype=np.int8)
        assert lut8.size == 256
        lib.btpu_batch_fill(
            h,
            names_arena.ctypes.data,
            name_offs.ctypes.data,
            seqs_arena.ctypes.data,
            seq_offs.ctypes.data,
            quals_arena.ctypes.data,
            qual_offs.ctypes.data,
            lut8.ctypes.data,
            codes.ctypes.data,
            L,
            lengths.ctypes.data,
        )
        nbytes = names_arena.tobytes()
        sbytes = seqs_arena.tobytes()
        qbytes = quals_arena.tobytes() if has_qual.value else b""
        from ..io.fastx import trim_readno

        names: List[bytes] = [
            trim_readno(nbytes[name_offs[i] : name_offs[i + 1]])
            for i in range(n)
        ]
        seqs: List[bytes] = [sbytes[seq_offs[i] : seq_offs[i + 1]] for i in range(n)]
        if has_qual.value:
            quals: List[Optional[bytes]] = [
                qbytes[qual_offs[i] : qual_offs[i] + lengths[i]]
                if qual_offs[i] >= 0
                else None
                for i in range(n)
            ]
        else:
            quals = [None] * n
        return names, seqs, quals, codes, lengths
