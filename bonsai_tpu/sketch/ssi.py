"""SetSketch LSH index: register-group hashes -> sample id lists.

Equivalent of sketch::SetSketchIndex + bns::lsh::{write,read}_database
(/root/reference/include/bonsai/ssi.h:14-160).  The on-disk layout matches
the reference FILE* writer byte-for-byte:

    i32 k | u64 total_vals | u64 total_ids |
    u32 nids_per_key[total_vals] | u64 keys[total_vals] |
    u32 ids (concatenated, grouped per key)

(The reference's gzFile read_database is broken — it reads the keys into
the wrong buffer and double-jumps on error, ssi.h:66-69,139 — so gz files
written by it are unreadable by it; we read/write the same byte stream
through gzip transparently and correctly.)

Indexing scheme (SetSketchIndex semantics): the m registers are cut into
groups of `regs_per_hash` consecutive registers; each group's registers
are mixed into one u64 key.  Samples sharing a key agree on that whole
register group — collisions estimate Jaccard at group granularity.
"""

from __future__ import annotations

import gzip
import struct
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..core import hashes as hsh
from .setsketch import SetSketch


def _group_keys(registers: np.ndarray, regs_per_hash: int) -> np.ndarray:
    """(n_groups,) u64 keys mixing each consecutive register group."""
    m = registers.size
    n_groups = m // regs_per_hash
    r = registers[: n_groups * regs_per_hash].astype(np.uint64)
    r = r.reshape(n_groups, regs_per_hash)
    acc = np.full(n_groups, 0x9A3298AFB5AC7173, dtype=np.uint64)
    for j in range(regs_per_hash):
        acc = hsh.wang_hash(acc ^ (r[:, j] + np.uint64(j + 1)))
    # offset each group's key space so identical groups at different
    # positions don't collide
    return acc ^ (
        np.arange(n_groups, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    )


class SetSketchIndex:
    def __init__(self, k: int = 0, regs_per_hash: int = 4):
        self.k = int(k)
        self.regs_per_hash = int(regs_per_hash)
        self.map: Dict[int, List[int]] = {}
        self.n_samples = 0

    def add(self, sketch_registers: np.ndarray, sample_id=None) -> int:
        sid = self.n_samples if sample_id is None else int(sample_id)
        for key in _group_keys(
            np.asarray(sketch_registers), self.regs_per_hash
        ):
            self.map.setdefault(int(key), []).append(sid)
        self.n_samples = max(self.n_samples, sid + 1)
        return sid

    def query(self, sketch_registers: np.ndarray) -> np.ndarray:
        """(n_samples,) collision counts (shared register groups)."""
        counts = np.zeros(self.n_samples, dtype=np.int64)
        for key in _group_keys(
            np.asarray(sketch_registers), self.regs_per_hash
        ):
            for sid in self.map.get(int(key), ()):
                if sid >= counts.size:
                    counts = np.pad(counts, (0, sid + 1 - counts.size))
                counts[sid] += 1
        return counts

    def topk(self, sketch_registers: np.ndarray, n: int = 10):
        counts = self.query(sketch_registers)
        order = np.argsort(-counts, kind="stable")[:n]
        return [(int(i), int(counts[i])) for i in order if counts[i] > 0]

    def merge(self, other: "SetSketchIndex") -> "SetSketchIndex":
        """operator+= (ssi.h:122-130)."""
        for key, ids in other.map.items():
            self.map.setdefault(key, []).extend(ids)
        self.n_samples = max(self.n_samples, other.n_samples)
        return self

    # -- serialization (reference byte layout) --------------------------
    def write(self, path: str):
        op = gzip.open if path.endswith(".gz") else open
        keys = np.fromiter(self.map.keys(), dtype=np.uint64, count=len(self.map))
        nids = np.fromiter(
            (len(v) for v in self.map.values()), dtype=np.uint32,
            count=len(self.map),
        )
        total_ids = int(nids.sum())
        with op(path, "wb") as fh:
            fh.write(struct.pack("<i", self.k))
            fh.write(struct.pack("<QQ", len(self.map), total_ids))
            fh.write(nids.tobytes())
            fh.write(keys.tobytes())
            for v in self.map.values():
                fh.write(np.asarray(v, dtype=np.uint32).tobytes())

    @classmethod
    def read(cls, path: str, regs_per_hash: int = 4) -> "SetSketchIndex":
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rb") as fh:
            (k,) = struct.unpack("<i", fh.read(4))
            total_vals, total_ids = struct.unpack("<QQ", fh.read(16))
            nids = np.frombuffer(fh.read(4 * total_vals), dtype=np.uint32)
            keys = np.frombuffer(fh.read(8 * total_vals), dtype=np.uint64)
            idx = cls(k=k, regs_per_hash=regs_per_hash)
            maxid = -1
            for i in range(total_vals):
                ids = np.frombuffer(fh.read(4 * int(nids[i])), dtype=np.uint32)
                idx.map[int(keys[i])] = [int(x) for x in ids]
                if ids.size:
                    maxid = max(maxid, int(ids.max()))
            idx.n_samples = maxid + 1
            return idx


def build_index(
    sketches: Sequence[SetSketch], k: int = 0, regs_per_hash: int = 4
) -> SetSketchIndex:
    idx = SetSketchIndex(k=k, regs_per_hash=regs_per_hash)
    for s in sketches:
        idx.add(s.registers)
    return idx
