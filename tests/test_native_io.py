"""Native C++ FASTA/FASTQ parser vs the pure-Python reference parser."""

import gzip
import os

import numpy as np
import pytest

from bonsai_tpu import native
from bonsai_tpu.core.alphabet import DNA4
from bonsai_tpu.io import fastx

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


def _python_batches(path, batch_size=64, mate=None):
    it = fastx.read_fastx(path)
    mate_it = fastx.read_fastx(mate) if mate else None
    names, seqs, quals = [], [], []
    if mate_it is None:
        recs = it
    else:
        def paired():
            for r1 in it:
                yield r1
                yield next(mate_it)
        recs = paired()
    for name, seq, qual in recs:
        names.append(name)
        seqs.append(seq)
        quals.append(qual)
    return names, seqs, quals


def _native_all(path, batch_size=64):
    from bonsai_tpu.native.fastx import NativeFastxReader

    r = NativeFastxReader(path)
    names, seqs, quals, codes_list, lens = [], [], [], [], []
    while True:
        got = r.next_batch(batch_size, DNA4.lut, fastx._bucket_len)
        if got is None:
            break
        n, s, q, c, l = got
        names += n
        seqs += s
        quals += q
        codes_list.append(c)
        lens.append(l)
    r.close()
    return names, seqs, quals, codes_list, lens


def test_fasta_parity_phix():
    path = os.path.join(os.path.dirname(__file__), "data", "phix.fa")
    pn, ps, pq = _python_batches(path)
    nn, ns, nq, codes, lens = _native_all(path)
    assert nn == pn and ns == ps
    assert all(q is None for q in nq)
    # codes match the LUT encoding
    got = codes[0][0, : lens[0][0]]
    want = DNA4.lut[np.frombuffer(ps[0], dtype=np.uint8)]
    np.testing.assert_array_equal(got, want)


def test_fasta_gz_multi_record():
    path = os.path.join(
        os.path.dirname(__file__), "data", "ec",
        "GCF_000005845.2_ASM584v2_genomic.fna.gz",
    )
    pn, ps, pq = _python_batches(path)
    nn, ns, nq, _, _ = _native_all(path, batch_size=2)
    assert nn == pn
    assert ns == ps


def test_fastq_parity(tmp_path):
    rng = np.random.default_rng(0)
    bases = np.array(list(b"ACGTN"), dtype=np.uint8)
    path = str(tmp_path / "reads.fq.gz")
    with gzip.open(path, "wt") as fh:
        for i in range(137):
            L = int(rng.integers(40, 151))
            seq = bases[rng.integers(0, 5, L)].tobytes().decode()
            qual = "".join(chr(33 + int(x)) for x in rng.integers(0, 40, L))
            fh.write(f"@read_{i} extra stuff\n{seq}\n+\n{qual}\n")
    pn, ps, pq = _python_batches(path)
    nn, ns, nq, codes, lens = _native_all(path, batch_size=50)
    assert nn == pn
    assert ns == ps
    assert nq == pq


def test_batch_reads_uses_native_and_matches(tmp_path):
    # end-to-end batch_reads parity native vs forced-Python
    rng = np.random.default_rng(1)
    bases = np.array(list(b"ACGT"), dtype=np.uint8)
    path = str(tmp_path / "reads.fa")
    with open(path, "w") as fh:
        for i in range(100):
            L = int(rng.integers(50, 200))
            fh.write(f">r{i}\n{bases[rng.integers(0,4,L)].tobytes().decode()}\n")
    batches_nat = list(fastx.batch_reads(path, DNA4.lut, batch_size=32))
    os.environ["BONSAI_TPU_NO_NATIVE"] = "1"
    try:
        # force the python path (native.get_lib caches, so call internals)
        batches_py = list(
            fastx.batch_reads.__wrapped__(path, DNA4.lut, batch_size=32)
            if hasattr(fastx.batch_reads, "__wrapped__")
            else _python_batch_reads(path, 32)
        )
    finally:
        del os.environ["BONSAI_TPU_NO_NATIVE"]
    assert len(batches_nat) == len(batches_py)
    for bn, bp in zip(batches_nat, batches_py):
        assert bn.names == bp.names
        assert bn.seqs == bp.seqs
        np.testing.assert_array_equal(bn.lengths, bp.lengths)
        np.testing.assert_array_equal(bn.codes, bp.codes)


def _python_batch_reads(path, batch_size):
    out = []
    it = fastx.read_fastx(path)
    names, seqs, quals = [], [], []
    for name, seq, qual in it:
        names.append(name)
        seqs.append(seq)
        quals.append(qual)
        if len(names) >= batch_size:
            out.append(fastx._make_batch(names, seqs, quals, DNA4.lut, True))
            names, seqs, quals = [], [], []
    if names:
        out.append(fastx._make_batch(names, seqs, quals, DNA4.lut, True))
    return out


def test_paired_interleave(tmp_path):
    rng = np.random.default_rng(2)
    bases = np.array(list(b"ACGT"), dtype=np.uint8)
    p1, p2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    for p, tag in ((p1, "fwd"), (p2, "rev")):
        with open(p, "w") as fh:
            for i in range(25):
                L = int(rng.integers(60, 120))
                seq = bases[rng.integers(0, 4, L)].tobytes().decode()
                fh.write(f"@{tag}_{i}\n{seq}\n+\n{'I'*L}\n")
    batches = list(fastx.batch_reads(p1, DNA4.lut, batch_size=16, mate_path=p2))
    names = [n for b in batches for n in b.names]
    assert names[0].startswith(b"fwd_0") and names[1].startswith(b"rev_0")
    assert len(names) == 50
    for i in range(0, 50, 2):
        assert names[i].startswith(b"fwd") and names[i + 1].startswith(b"rev")
        assert names[i].split(b"_")[1] == names[i + 1].split(b"_")[1]


def test_native_canon_kmer_set_parity():
    """btpu_canon_kmer_set == BatchEncoder emissions for the contiguous
    unwindowed discipline, canonical and not, with Ns sprinkled in."""
    from bonsai_tpu.native import get_lib
    from bonsai_tpu.core.encoder import BatchEncoder
    from bonsai_tpu.core.spacer import Spacer
    from bonsai_tpu.io.fastx import encode_contig

    lib = get_lib()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    bases = np.array(list(b"ACGTN"), dtype=np.uint8)
    for trial in range(12):
        L = int(rng.integers(40, 4000))
        probs = [0.24, 0.24, 0.24, 0.24, 0.04]
        seq = bases[rng.choice(5, size=L, p=probs)].tobytes()
        for k in (4, 21, 31, 32):
            if L < k:
                continue
            for canon in (True, False):
                sp = Spacer(k, k)
                enc = BatchEncoder(sp, canon, "lex")
                codes = encode_contig(seq, DNA4.lut)[None, :]
                lengths = np.array([L], dtype=np.int32)
                em = enc.emissions(codes, lengths)
                expect = np.unique(np.asarray(em.values)[np.asarray(em.mask)])
                out = np.empty(L, dtype=np.uint64)
                lut8 = np.ascontiguousarray(DNA4.lut, dtype=np.int8)
                buf = np.frombuffer(seq, dtype=np.uint8)
                m = lib.btpu_canon_kmer_set(
                    buf.ctypes.data, L, lut8.ctypes.data, k,
                    1 if canon else 0, out.ctypes.data,
                )
                assert m >= 0
                got = np.unique(out[:m])
                assert np.array_equal(got, expect), (trial, k, canon)


def test_native_sortops():
    from bonsai_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    for n in (0, 1, 2, 1000, 100000):
        # skewed bit distribution exercises the skip-constant-digit path
        keys = rng.integers(0, 1 << 40, size=n, dtype=np.uint64)
        a = keys.copy()
        if n:
            lib.btpu_radix_sort_u64(a.ctypes.data, n)
        np.testing.assert_array_equal(a, np.sort(keys))
        # kv: values must travel with their keys
        vals = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
        k2, v2 = keys.copy(), vals.copy()
        if n:
            lib.btpu_radix_sort_kv(k2.ctypes.data, v2.ctypes.data, n)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(k2, keys[order])
        # same multiset of (key, val) pairs
        got = sorted(zip(k2.tolist(), v2.tolist()))
        want = sorted(zip(keys.tolist(), vals.tolist()))
        assert got == want
        # dedup
        d = np.concatenate([keys, keys[: n // 2]])
        dd = d.copy()
        m = lib.btpu_sort_dedup_u64(dd.ctypes.data, d.size) if d.size else 0
        np.testing.assert_array_equal(dd[:m], np.unique(d))


def test_unique_u64_and_sort_pairs_helpers():
    from bonsai_tpu.db.build import unique_u64, _sort_pairs_by_key

    rng = np.random.default_rng(6)
    keys = rng.integers(0, 1 << 62, size=50000, dtype=np.uint64)
    keys = np.concatenate([keys, keys[::3]])
    np.testing.assert_array_equal(unique_u64(keys), np.unique(keys))
    taxa = rng.integers(0, 1 << 20, size=keys.size, dtype=np.uint32)
    k2, t2 = _sort_pairs_by_key(keys, taxa)
    assert np.all(k2[1:] >= k2[:-1])
    got = sorted(zip(k2.tolist(), t2.tolist()))
    want = sorted(zip(keys.tolist(), taxa.tolist()))
    assert got == want
