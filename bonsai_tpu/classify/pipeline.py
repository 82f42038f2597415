"""The classifier: batched encode -> table probe -> resolve, under jit.

TPU-native redesign of ClassifierGeneric / classify_seq / process_dataset
(/root/reference/include/bonsai/classifier.h:131-337).  The reference farms
32-read slices across a work-stealing thread pool, each read probing a
shared khash; here a whole read batch is one traced device computation:

  codes (B, L) --encode--> kmers (B, P) --probe--> compact taxids (B, P)
              --interval-rank resolve--> taxon (B,)

Per the reference CLI, classification always runs unwindowed with w = k
regardless of the DB's build window (bin/bonsai.cpp:152 passes db.k_ for
wsz), canonical by default.

Host side handles FASTA/FASTQ batching and text output; device-host overlap
comes from jax's async dispatch (the next batch is encoded while the device
classifies the current one).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np

from ..core.alphabet import InputType, alphabet_of
from ..core.encoder import BatchEncoder
from ..core.spacer import Spacer
from ..db.formats import Database
from ..io import fastx
from ..taxonomy.tree import TaxTree
from . import output as out_mod
from .resolve import resolve_batch


@dataclass
class BatchResult:
    """One row per classification unit: a read, or a mate PAIR when paired
    (the reference classifies pairs as one unit, classifier.h:236-240)."""

    names: List[bytes]
    seqs: List[bytes]
    quals: List[Optional[bytes]]
    lengths: np.ndarray  # (R,) mate-1 lengths
    taxon: np.ndarray  # (R,) original taxids, 0 = unclassified
    taxa: np.ndarray  # (R, W) original taxids of DB hits (per kmer pos)
    hit_mask: np.ndarray  # (R, W)
    n_missing: np.ndarray  # (R,) total missing (both mates)
    n_kmers: np.ndarray  # (R,) total valid kmers (both mates)
    n_kmers1: Optional[np.ndarray] = None  # (R,) mate-1 valid kmers
    # mate-2 fields, None for single-end
    lengths2: Optional[np.ndarray] = None
    seqs2: Optional[List[bytes]] = None
    quals2: Optional[List[Optional[bytes]]] = None

    @property
    def paired(self) -> bool:
        return self.lengths2 is not None


class Classifier:
    def __init__(
        self,
        db: Database,
        tree: TaxTree,
        canonicalize: bool = True,
        emit_all: bool = False,
        emit_kraken: bool = True,
        emit_fastq: bool = False,
        input_type: InputType = InputType.DNA,
    ):
        # classify always uses w = k (bin/bonsai.cpp:152)
        self.sp = Spacer(db.k, db.k, db.gaps)
        self.enc = BatchEncoder(self.sp, canonicalize, "lex", input_type)
        self.db = db
        self.tree = tree
        self.emit_all = emit_all
        self.emit_kraken = emit_kraken
        self.emit_fastq = emit_fastq
        self.lut = alphabet_of(InputType(input_type)).lut
        self.n_classified = 0
        self.n_unclassified = 0
        # device-resident state
        import jax.numpy as jnp

        table = db.table
        compact_vals = tree.compact(table.vals_sorted, missing_ok=True)
        # One probe yields both payloads: orig taxid in the high u32 of
        # the (usually tiny unique-values) table, compact taxonomy index
        # in the low u32.
        packed = (
            table.vals_sorted.astype(np.uint64) << np.uint64(32)
        ) | compact_vals.astype(np.uint32).astype(np.uint64)
        self._arrays = table.device_arrays(packed)
        self._tax = tree.device_arrays()
        self._step_cache = {}

    # -- jitted device step ----------------------------------------------
    def _make_step(self, paired: bool = False):
        """One packed (R, 4 + ceil(W/32) + W) uint32 output per batch —
        taxon | n_missing | n_kmers | n_kmers_mate1 | hit-bitmask words |
        per-kmer taxa — so the host needs a single device fetch (the
        reference's analog is one contiguous sam buffer per read,
        classifier.h:221).

        paired=True treats adjacent row pairs (2i, 2i+1) as mates of one
        read pair: hits of both mates merge into one resolve_tree call and
        one output row of width W = 2P (classify_seq's paired branch,
        classifier.h:236-240)."""
        import jax
        import jax.numpy as jnp

        table = self.db.table
        enc = self.enc
        tax = self._tax

        inline = self._arrays[2]

        @jax.jit
        def step(codes, lengths, slots, vals):
            em = enc.emissions(codes, lengths)
            kmers, valid = em.values, em.mask
            packed, found = table.probe_device(
                kmers, arrays=(slots, vals, inline)
            )
            cidx = (packed & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)
            oidx = (packed >> jnp.uint64(32)).astype(jnp.uint32)
            hit = valid & found
            valid1 = valid.sum(axis=-1).astype(jnp.uint32)
            if paired:
                # merge mate rows: (B, P) -> (B/2, 2P); row-major reshape
                # concatenates mate1's positions then mate2's
                B, P = hit.shape
                hit = hit.reshape(B // 2, 2 * P)
                valid = valid.reshape(B // 2, 2 * P)
                cidx = cidx.reshape(B // 2, 2 * P)
                oidx = oidx.reshape(B // 2, 2 * P)
                valid1 = valid1[0::2]
            miss = valid & ~hit
            cidx = jnp.where(hit, cidx, 0)
            taxon_c = resolve_batch(cidx, hit, tax)
            taxon = tax["tax_ids"][taxon_c].astype(jnp.uint32)
            taxa = jnp.where(hit, oidx, 0).astype(jnp.uint32)
            R, W = taxa.shape
            hb = (W + 31) // 32
            if hb:
                pad = jnp.zeros((R, hb * 32 - W), dtype=bool)
                bits = jnp.concatenate([hit, pad], axis=1).reshape(R, hb, 32)
                weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
                hit_words = jnp.sum(
                    bits.astype(jnp.uint32) * weights, axis=-1, dtype=jnp.uint32
                )
            else:
                hit_words = jnp.zeros((R, 0), dtype=jnp.uint32)
            head = jnp.stack(
                [
                    taxon,
                    miss.sum(axis=-1).astype(jnp.uint32),
                    valid.sum(axis=-1).astype(jnp.uint32),
                    valid1,
                ],
                axis=1,
            )
            return jnp.concatenate([head, hit_words, taxa], axis=1)

        return step

    def _step(self, paired: bool = False):
        key = "fn_paired" if paired else "fn"
        if key not in self._step_cache:
            self._step_cache[key] = self._make_step(paired)
        return self._step_cache[key]

    # -- per-batch --------------------------------------------------------
    @staticmethod
    def _bucket_batch(n: int) -> int:
        """Round the read count up to a small bucket set so partial final
        batches reuse the compiled step instead of recompiling."""
        b = 256
        while b < n:
            b <<= 1
        return b

    def classify_batch(
        self, batch: fastx.ReadBatch, paired: bool = False
    ) -> BatchResult:
        return self._finish_batch(
            batch, self._dispatch_batch(batch, paired), paired
        )

    def _dispatch_batch(self, batch: fastx.ReadBatch, paired: bool = False):
        """Async half of classify_batch: returns the on-device result
        (dispatch only; materialize with _finish_batch).  Used for batch
        pipelining in process_dataset."""
        import jax.numpy as jnp

        step = self._step(paired)
        n = len(batch.names)
        Bp = self._bucket_batch(n)
        codes, lengths = batch.codes, batch.lengths
        if Bp != n:
            codes = np.full((Bp, codes.shape[1]), -1, dtype=np.int8)
            codes[:n] = batch.codes
            lengths = np.zeros(Bp, dtype=np.int32)
            lengths[:n] = batch.lengths
        return step(
            jnp.asarray(codes),
            jnp.asarray(lengths),
            self._arrays[0],
            self._arrays[1],
        )

    def _finish_batch(
        self, batch: fastx.ReadBatch, out, paired: bool = False
    ) -> BatchResult:
        n = len(batch.names)
        R = n // 2 if paired else n
        # fetch the whole padded matrix in one transfer; trim on host (a
        # device-side out[:n] would compile a fresh slice op per batch size)
        out = np.asarray(out)[:R]
        P = batch.codes.shape[1] - self.sp.c + 1
        P = max(P, 0)
        W = 2 * P if paired else P
        hb = (W + 31) // 32
        taxon = out[:, 0]
        n_missing = out[:, 1].astype(np.int32)
        n_kmers = out[:, 2].astype(np.int32)
        n_kmers1 = out[:, 3].astype(np.int32)
        hit_words = out[:, 4 : 4 + hb]
        taxa = out[:, 4 + hb :]
        if W:
            shifts = np.arange(32, dtype=np.uint32)
            hit = (
                (hit_words[:, :, None] >> shifts) & np.uint32(1)
            ).astype(bool).reshape(R, hb * 32)[:, :W]
        else:
            hit = np.zeros((R, 0), dtype=bool)
        self.n_classified += int((taxon != 0).sum())
        self.n_unclassified += int((taxon == 0).sum())
        if paired:
            return BatchResult(
                names=batch.names[0::2],
                seqs=batch.seqs[0::2],
                quals=batch.quals[0::2] if batch.quals else None,
                lengths=batch.lengths[0::2],
                taxon=taxon,
                taxa=taxa,
                hit_mask=hit,
                n_missing=n_missing,
                n_kmers=n_kmers,
                n_kmers1=n_kmers1,
                lengths2=batch.lengths[1::2],
                seqs2=batch.seqs[1::2],
                quals2=batch.quals[1::2] if batch.quals else None,
            )
        return BatchResult(
            names=batch.names,
            seqs=batch.seqs,
            quals=batch.quals,
            lengths=batch.lengths,
            taxon=taxon,
            taxa=taxa,
            hit_mask=hit,
            n_missing=n_missing,
            n_kmers=n_kmers,
            n_kmers1=n_kmers1,
        )

    # -- full dataset ------------------------------------------------------
    def process_dataset(
        self,
        path: str,
        out_fh,
        mate_path: Optional[str] = None,
        batch_size: int = 4096,
        profile: bool = False,
    ):
        """Classify a FASTA/FASTQ file (optionally paired) and write text
        output (process_dataset, classifier.h:296-337).

        One-batch-deep pipeline: batch i+1 is parsed and dispatched to the
        device before batch i's results are materialized and formatted, so
        host parse/format overlaps device compute (the reference overlaps
        via its thread pool; JAX's async dispatch gives the same shape).

        With profile=True, per-stage wall times (parse / dispatch /
        materialize / format) accumulate in self.stage_seconds and print to
        stderr at the end (TIME_CODE-style observability, SURVEY §5)."""
        import time as _time

        is_paired = mate_path is not None
        if is_paired and batch_size % 2:
            batch_size += 1  # pairs must not straddle batches
        self.stage_seconds = {
            "parse": 0.0, "dispatch": 0.0, "materialize": 0.0, "format": 0.0,
        }
        stats = self.stage_seconds
        t = _time.perf_counter
        it = iter(fastx.batch_reads(
            path, self.lut, batch_size=batch_size, mate_path=mate_path
        ))
        n_reads = 0
        t_all = t()
        pending = None  # (batch, device_out)
        while True:
            t0 = t()
            batch = next(it, None)
            stats["parse"] += t() - t0
            if batch is None:
                break
            n_reads += len(batch.names)
            t0 = t()
            out = self._dispatch_batch(batch, is_paired)
            stats["dispatch"] += t() - t0
            if pending is not None:
                self._write_result(out_fh, *pending, is_paired)
            pending = (batch, out)
        if pending is not None:
            self._write_result(out_fh, *pending, is_paired)
        if profile:
            total = t() - t_all
            import sys as _sys

            parts = "  ".join(
                f"{k}={v:.3f}s" for k, v in stats.items()
            )
            print(
                f"# profile: {n_reads} reads in {total:.3f}s "
                f"({n_reads / max(total, 1e-9):,.0f} reads/s)  {parts}",
                file=_sys.stderr,
            )

    def _write_result(self, out_fh, batch, out, is_paired):
        import time as _time

        stats = getattr(self, "stage_seconds", None)
        t = _time.perf_counter
        t0 = t()
        res = self._finish_batch(batch, out, is_paired)
        if stats is not None:
            stats["materialize"] += t() - t0
            t0 = t()
        text = out_mod.format_batch(
            res,
            self.sp.c,
            emit_all=self.emit_all,
            emit_kraken=self.emit_kraken,
            emit_fastq=self.emit_fastq,
        )
        out_fh.write(text)
        if stats is not None:
            stats["format"] += t() - t0

    def classify_reads(self, seqs: List[bytes]) -> np.ndarray:
        """Convenience: classify raw sequences -> original taxids."""
        maxlen = max(len(s) for s in seqs)
        L = fastx._bucket_len(maxlen)
        codes = np.full((len(seqs), L), -1, dtype=np.int8)
        lengths = np.empty(len(seqs), dtype=np.int32)
        for i, s in enumerate(seqs):
            codes[i, : len(s)] = self.lut[np.frombuffer(s, dtype=np.uint8)]
            lengths[i] = len(s)
        batch = fastx.ReadBatch(
            names=[b""] * len(seqs), seqs=seqs, codes=codes, lengths=lengths,
            quals=[None] * len(seqs),
        )
        return self.classify_batch(batch).taxon
