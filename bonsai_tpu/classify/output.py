"""Classification output formatting (host).

Byte-exact Kraken-style and FASTQ re-emission formats
(/root/reference/include/bonsai/classifier.h:112-129,339-412):

kraken record:
    C|U \t name \t taxon \t len \t [M:missing \t] [A:ambig \t] runs\n
where runs are run-length encoded consecutive *hit* taxids "tax:count"
joined by tabs (special taxid codes: 0 -> 'U', 0xFFFFFFFF -> 'A'), or the
literal "0:0" when unclassified.

ambig_count replicates the reference's unsigned arithmetic
(classifier.h:232-235): u32(l - c + 1 - n_hits - n_missing), which can wrap
for short reads; we reproduce the wrap.
"""

from __future__ import annotations

from typing import List

import numpy as np

TAX_AMBIG = 0xFFFFFFFF


def _runs(taxa: np.ndarray) -> List[str]:
    """RLE of the hit-taxa sequence."""
    parts = []
    if taxa.size == 0:
        return parts
    change = np.nonzero(np.diff(taxa))[0]
    starts = np.concatenate([[0], change + 1])
    ends = np.concatenate([change + 1, [taxa.size]])
    for s, e in zip(starts, ends):
        t = int(taxa[s])
        if t == 0:
            code = "U"
        elif t == TAX_AMBIG:
            code = "A"
        else:
            code = str(t)
        parts.append(f"{code}:{e - s}")
    return parts


def format_read(
    name: str,
    taxon: int,
    length: int,
    missing: int,
    ambig: int,
    hit_taxa: np.ndarray,
) -> str:
    cols = [
        "C" if taxon else "U",
        name,
        str(taxon),
        str(length),
    ]
    if missing:
        cols.append(f"M:{missing}")
    if ambig:
        cols.append(f"A:{ambig}")
    if taxon:
        cols.extend(_runs(hit_taxa))
        return "\t".join(cols) + "\n"
    return "\t".join(cols) + "\t0:0\n"


def _format_batch_native(res, comb_size, emit_all):
    """C formatter (native/src/kraken_out.cpp); returns None if the native
    library is unavailable."""
    from .. import native

    lib = native.get_lib()
    if lib is None:
        return None
    n = len(res.names)
    if n == 0:
        return ""
    names_arena = b"".join(res.names)
    name_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(x) for x in res.names], out=name_offs[1:])
    if res.compact:
        return _format_batch_native_runs(
            lib, res, names_arena, name_offs, comb_size, emit_all
        )
    taxa = np.ascontiguousarray(res.taxa, dtype=np.uint32)
    hm = np.ascontiguousarray(res.hit_mask, dtype=np.uint8)
    lengths = np.ascontiguousarray(res.lengths, dtype=np.int32)
    taxon = np.ascontiguousarray(res.taxon, dtype=np.uint32)
    n_missing = np.ascontiguousarray(res.n_missing, dtype=np.int32)
    n_kmers = np.ascontiguousarray(res.n_kmers, dtype=np.int32)
    if res.n_kmers1 is not None:
        n_kmers1 = np.ascontiguousarray(res.n_kmers1, dtype=np.int32)
    else:
        n_kmers1 = n_kmers
    if res.paired:
        lengths2 = np.ascontiguousarray(res.lengths2, dtype=np.int32)
        l2_ptr = lengths2.ctypes.data
    else:
        l2_ptr = None
    P = taxa.shape[1] if taxa.ndim == 2 else 0
    cap = len(names_arena) + n * 80 + int(hm.sum()) * 14 + 1024
    while True:
        out = np.empty(cap, dtype=np.uint8)
        wrote = lib.btpu_format_kraken(
            n,
            names_arena,
            name_offs.ctypes.data,
            lengths.ctypes.data,
            l2_ptr,
            taxon.ctypes.data,
            taxa.ctypes.data,
            hm.ctypes.data,
            P,
            n_missing.ctypes.data,
            n_kmers.ctypes.data,
            n_kmers1.ctypes.data,
            comb_size,
            1 if emit_all else 0,
            out.ctypes.data,
            cap,
        )
        if wrote >= 0:
            return out[:wrote].tobytes().decode("utf-8", "replace")
        cap = -wrote


def _format_batch_native_runs(lib, res, names_arena, name_offs, comb_size,
                              emit_all):
    """Runs-based C formatter for compact (device-RLE) batches."""
    n = len(res.names)
    run_vals = np.ascontiguousarray(res.run_vals, dtype=np.uint32)
    run_lens = np.ascontiguousarray(res.run_lens, dtype=np.uint32)
    n_runs = np.ascontiguousarray(res.n_runs, dtype=np.int32)
    maxr = run_vals.shape[1] if run_vals.ndim == 2 else 0
    lengths = np.ascontiguousarray(res.lengths, dtype=np.int32)
    taxon = np.ascontiguousarray(res.taxon, dtype=np.uint32)
    n_missing = np.ascontiguousarray(res.n_missing, dtype=np.int32)
    n_kmers = np.ascontiguousarray(res.n_kmers, dtype=np.int32)
    if res.n_kmers1 is not None:
        n_kmers1 = np.ascontiguousarray(res.n_kmers1, dtype=np.int32)
    else:
        n_kmers1 = n_kmers
    if res.paired:
        lengths2 = np.ascontiguousarray(res.lengths2, dtype=np.int32)
        l2_ptr = lengths2.ctypes.data
    else:
        l2_ptr = None
    cap = len(names_arena) + n * 80 + int(n_runs.sum()) * 25 + 1024
    while True:
        out = np.empty(cap, dtype=np.uint8)
        wrote = lib.btpu_format_kraken_runs(
            n,
            names_arena,
            name_offs.ctypes.data,
            lengths.ctypes.data,
            l2_ptr,
            taxon.ctypes.data,
            run_vals.ctypes.data,
            run_lens.ctypes.data,
            n_runs.ctypes.data,
            maxr,
            n_missing.ctypes.data,
            n_kmers.ctypes.data,
            n_kmers1.ctypes.data,
            comb_size,
            1 if emit_all else 0,
            out.ctypes.data,
            cap,
        )
        if wrote >= 0:
            return out[:wrote].tobytes().decode("utf-8", "replace")
        cap = -wrote


def ambig_count(res, i: int, comb_size: int) -> int:
    """The reference's ambiguous-position arithmetic (classifier.h:232-240),
    in u32 wrap-around (it underflows for reads shorter than the seed span;
    we reproduce the wrap — numpy 2 raises on negative uint32 construction).

    Single-end: l - c + 1 - hits - missing == l - c + 1 - valid.
    Paired: after mate 1, ambig = l1 - c + 1 - valid1; after mate 2 the
    hit/miss counters hold BOTH mates, so the increment is
    l2 - (c - 1) - valid_total."""
    l1 = int(res.lengths[i])
    v1 = int(res.n_kmers1[i]) if res.n_kmers1 is not None else int(res.n_kmers[i])
    ambig = (l1 - comb_size + 1 - v1) & 0xFFFFFFFF
    if res.paired:
        l2 = int(res.lengths2[i])
        ambig = (ambig + l2 - (comb_size - 1) - int(res.n_kmers[i])) & 0xFFFFFFFF
    return ambig


def format_batch(
    res,
    comb_size: int,
    emit_all: bool = False,
    emit_kraken: bool = True,
    emit_fastq: bool = False,
) -> str:
    """res: classify.pipeline.BatchResult (one row per read or mate pair)."""
    if emit_kraken and not emit_fastq:
        text = _format_batch_native(res, comb_size, emit_all)
        if text is not None:
            return text
    return _format_batch_python(res, comb_size, emit_all, emit_kraken, emit_fastq)


def _format_batch_python(
    res,
    comb_size: int,
    emit_all: bool = False,
    emit_kraken: bool = True,
    emit_fastq: bool = False,
) -> str:
    out: List[str] = []
    for i in range(len(res.names)):
        taxon = int(res.taxon[i])
        if not (emit_all or taxon):
            continue
        hits = res.hit_taxa(i)
        missing = int(res.n_missing[i])
        l1 = int(res.lengths[i])
        ambig = ambig_count(res, i, comb_size)
        name = res.names[i].decode("utf-8", "replace")
        if emit_fastq:
            comment = _fastq_comment(
                taxon, l1, missing, int(ambig), hits, emit_kraken
            )
            out.append(f"{name} {comment}\n")
            out.append(res.seqs[i].decode("ascii", "replace") + "\n+\n")
            q = res.quals[i] if res.quals and res.quals[i] else res.seqs[i]
            out.append(q.decode("ascii", "replace") + "\n")
            if res.paired:
                out.append(f"{name} {comment}\n")
                out.append(res.seqs2[i].decode("ascii", "replace") + "\n+\n")
                q2 = res.quals2[i] if res.quals2 and res.quals2[i] else res.seqs2[i]
                out.append(q2.decode("ascii", "replace") + "\n")
        elif emit_kraken:
            out.append(
                format_read(name, taxon, l1, missing, int(ambig), hits)
            )
    return "".join(out)


def _fastq_comment(taxon, length, missing, ambig, hits, verbose) -> str:
    cols = ["C" if taxon else "U", str(taxon), str(length)]
    if missing:
        cols.append(f"M:{missing}")
    if ambig:
        cols.append(f"A:{ambig}")
    s = "\t".join(cols)
    if verbose:
        if taxon:
            s += "\t" + "\t".join(_runs(hits))
        else:
            s += "\t0:0"
    return s
