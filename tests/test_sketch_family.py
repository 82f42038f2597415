"""CSetSketch / packed SetSketch / shs dumps / ssi / kmeridx / gchunk."""

import os

import numpy as np
import pytest

from bonsai_tpu.sketch.setsketch import CSetSketch, SetSketch
from bonsai_tpu.sketch import compare, shs as shs_mod
from bonsai_tpu.sketch.ssi import SetSketchIndex, _group_keys
from bonsai_tpu.db.kmeridx import KmerIdx

DATA = os.path.join(os.path.dirname(__file__), "data")


def _randset(seed, n):
    return np.unique(
        np.random.default_rng(seed).integers(0, 1 << 62, n, dtype=np.uint64)
    )


def test_csetsketch_cardinality():
    for n in (100, 5000, 100_000):
        s = CSetSketch(4096)
        s.update(_randset(n, n))
        est = s.cardinality()
        assert abs(est - n) / n < 0.1, (n, est)


def test_csetsketch_determinism_and_merge():
    v = _randset(0, 20000)
    a = CSetSketch(1024)
    a.update(v)
    b = CSetSketch(1024)
    # different batch split -> identical registers
    b.update(v[:7000])
    b.update(v[7000:])
    np.testing.assert_array_equal(a.registers, b.registers)
    # merge of halves == whole
    c1 = CSetSketch(1024)
    c1.update(v[:10000])
    c2 = CSetSketch(1024)
    c2.update(v[10000:])
    c1.merge(c2)
    np.testing.assert_array_equal(a.registers, c1.registers)


def test_csetsketch_jaccard():
    rng = np.random.default_rng(3)
    shared = rng.integers(0, 1 << 62, 30000, dtype=np.uint64)
    only_a = rng.integers(0, 1 << 62, 10000, dtype=np.uint64)
    only_b = rng.integers(0, 1 << 62, 10000, dtype=np.uint64)
    a = CSetSketch(4096)
    a.update(np.concatenate([shared, only_a]))
    b = CSetSketch(4096)
    b.update(np.concatenate([shared, only_b]))
    true_j = 30000 / 50000
    assert abs(a.jaccard(b) - true_j) < 0.05


def test_csetsketch_roundtrip(tmp_path):
    s = CSetSketch(512, save_kmers=True, save_kmer_counts=True)
    s.update(_randset(5, 3000))
    p = str(tmp_path / "x.css")
    s.write(p)
    r = CSetSketch.read(p)
    np.testing.assert_array_equal(s.registers, r.registers)
    np.testing.assert_array_equal(s.ids(), r.ids())
    np.testing.assert_array_equal(s.idcounts(), r.idcounts())


def test_packed_setsketch(tmp_path):
    s = CSetSketch(2048)
    s.update(_randset(7, 50000))
    b, a = s.optimal_parameters(qmax=65535)
    packed = s.to_packed(b, a, 16)
    # packed cardinality should be in the right ballpark
    assert abs(packed.cardinality() - 50000) / 50000 < 0.2
    p = str(tmp_path / "x.ss")
    packed.write(p)
    r = SetSketch.read(p)
    np.testing.assert_array_equal(packed.registers, r.registers)
    assert r.bits == 16 and abs(r.b - b) < 1e-12
    # jaccard of identical packed sketches is 1
    assert packed.jaccard(r) == 1.0


def test_shs_bin_roundtrip(tmp_path):
    keys = np.sort(_randset(11, 1000))
    counts = np.random.default_rng(1).integers(1, 100, keys.size).astype(np.uint16)
    sp = str(tmp_path / "x.shs")
    bp = str(tmp_path / "x.bin")
    shs_mod.write_shs(sp, keys)
    shs_mod.write_bin(bp, keys, counts)
    np.testing.assert_array_equal(shs_mod.read_shs(sp), keys)
    k2, c2 = shs_mod.read_bin(bp)
    np.testing.assert_array_equal(k2, keys)
    np.testing.assert_array_equal(c2, counts)


def test_multik_counter_phix(tmp_path):
    phix = os.path.join(DATA, "phix.fa")
    ks = [17, 31]
    ctr = shs_mod.MultiKCounter(ks, canon=False)
    ctr.add_file(phix)
    res = ctr.counts()
    assert len(res) == 2
    for (keys, counts), k in zip(res, ks):
        # phiX (5386bp circularish, linear here): close to L-k+1 distinct
        assert keys.size > 5000
        assert np.all(np.diff(keys.astype(np.int64)) > 0)
        assert counts.min() >= 1
        # multiset total = number of valid windows
        assert counts.sum() == 5386 - k + 1
    files = shs_mod.dump_maps(str(tmp_path / "phix"), ks, phix)
    assert len(files) == 4
    k17 = shs_mod.read_shs(str(tmp_path / "phix") + ".17.shs")
    np.testing.assert_array_equal(k17, res[0][0])


def test_compare_metrics():
    a = np.sort(_randset(1, 5000))
    b = np.sort(np.concatenate([a[:2500], _randset(2, 2500)]))
    b = np.unique(b)
    i = compare.intersection_size(a, b)
    assert i >= 2500
    j = compare.jaccard_index(a, b)
    u = compare.union_size(a, b)
    assert abs(j - i / u) < 1e-12
    m = compare.pairwise_matrix([a, b], "jaccard")
    assert m[0, 0] == 1.0 and m[0, 1] == pytest.approx(j)


def test_counter_histogram():
    c = compare.Counter()
    c.add(np.array([1, 1, 2, 3, 3, 3], dtype=np.uint64))
    c.add(np.array([3, 4], dtype=np.uint64))
    keys, counts = c.items()
    np.testing.assert_array_equal(keys, [1, 2, 3, 4])
    np.testing.assert_array_equal(counts, [2, 1, 4, 1])
    mult, n = c.histogram()
    np.testing.assert_array_equal(mult, [1, 2, 4])
    np.testing.assert_array_equal(n, [2, 1, 1])


def test_ssi_index_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    regs = [rng.integers(0, 255, 64).astype(np.uint32) for _ in range(5)]
    # sample 5 is a near-duplicate of sample 0
    near = regs[0].copy()
    near[:8] = rng.integers(0, 255, 8)
    idx = SetSketchIndex(k=31, regs_per_hash=4)
    for r in regs:
        idx.add(r)
    hits = idx.topk(near, 3)
    assert hits[0][0] == 0  # most collisions with its near-duplicate
    p = str(tmp_path / "idx.bin")
    idx.write(p)
    r2 = SetSketchIndex.read(p, regs_per_hash=4)
    assert r2.k == 31
    assert r2.map == idx.map
    # gz transparency
    pz = str(tmp_path / "idx.bin.gz")
    idx.write(pz)
    r3 = SetSketchIndex.read(pz)
    assert r3.map == idx.map


def test_group_keys_position_sensitive():
    r = np.arange(16, dtype=np.uint32)
    k = _group_keys(r, 4)
    assert len(set(int(x) for x in k)) == 4


def test_kmeridx(tmp_path):
    seq = b"ACGTACGTTTACGGACGT"
    idx = KmerIdx(4)
    idx.add_seq(b"c1", seq)
    idx.add_seq(b"c2", b"ACGTAAAA")
    idx.finalize()
    # kmer ACGT appears at positions 0,4,14 in c1 and 0 in c2 (global 18)
    from bonsai_tpu.core import encode as enc_mod

    acgt = 0b00011011  # A=0 C=1 G=2 T=3 packed
    pos = idx.get(acgt)
    np.testing.assert_array_equal(np.sort(pos), [3, 7, 17, 21])
    name, local = idx.contig_of(21)
    assert name == b"c2" and local == 3
    p = str(tmp_path / "x.kidx")
    idx.write(p)
    r = KmerIdx.read(p)
    assert r.k == 4
    assert r.refnames == [b"c1", b"c2"]
    np.testing.assert_array_equal(r.get(acgt), idx.get(acgt))


def test_gchunk():
    from bonsai_tpu.core.spacer import Spacer
    from bonsai_tpu.sketch.gchunk import GenomeChunker

    phix = os.path.join(DATA, "phix.fa")
    gc = GenomeChunker(phix, 1000, Spacer(21, 21), p=12)
    assert len(gc.contigs) == 1
    prof = gc.contigs[0].profile()
    assert prof.size == 6  # ceil(5386/1000)
    # interior chunks have ~1000 kmer starts each, distinct
    assert np.all(prof[:5] > 700)
