"""Python API layer (bns equivalent) + misc util helpers + small tools."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from bonsai_tpu import api, util

DATA = os.path.join(os.path.dirname(__file__), "data")
PHIX = os.path.join(DATA, "phix.fa")


def test_get_kmers_counts():
    seq = b"ACGTACGTACGTACGTACGTA"
    km = api.get_kmers(seq, k=5, canonicalize=False)
    assert km.size == len(seq) - 4
    uk = api.get_kmers(seq, k=5, canonicalize=False, unique=True)
    assert uk.size == 4  # periodic sequence: 4 distinct 5-mers
    assert np.all(np.diff(uk.astype(np.int64)) > 0)


def test_get_kmers_ambiguous():
    km = api.get_kmers(b"ACGTNACGTACGT", k=4, canonicalize=False)
    # windows containing N vanish: positions 1..4 are invalid
    assert km.size == 13 - 3 - 4


def test_seqdict_phix():
    d = api.seqdict(PHIX, k=31, unique=True)
    assert len(d) == 1
    (km,) = d.values()
    assert km.size == 5356  # the reference's phiX invariant (SURVEY §4)


def test_seqdict_windowed():
    d = api.seqdict(PHIX, k=21, w=31, unique=True)
    (km,) = d.values()
    assert 0 < km.size < 5366


def test_rolling_hashes():
    h = api.rolling_hashes(b"ACGTACGTACGTAGGTT", k=40 if False else 7)
    assert h.size == 17 - 6
    # unbounded k works too
    seq = np.random.default_rng(0).choice(
        np.frombuffer(b"ACGT", dtype=np.uint8), 200
    ).tobytes()
    h2 = api.rolling_hashes(seq, k=64)
    assert h2.size == 200 - 63


def test_nuccount_gccount_entropy():
    # kmer = ACGT packed: A=0,C=1,G=2,T=3
    km = np.uint64(0b00011011)
    nc = util.nuccount(km, 4)
    np.testing.assert_array_equal(nc, [1, 1, 1, 1])
    assert util.gccount(km, 4) == 2
    assert util.kmer_entropy(km, 4) == pytest.approx(2.0)
    # all-A kmer: zero entropy
    assert util.kmer_entropy(np.uint64(0), 4) == pytest.approx(0.0)
    # vectorized
    e = util.kmer_entropy(np.array([km, 0], dtype=np.uint64), 4)
    assert e.shape == (2,)


def test_timer_and_time_code(capsys):
    with util.time_code("unit"):
        sum(range(1000))
    err = capsys.readouterr().err
    assert "[unit]" in err and "ns" in err


def test_bitvec2str():
    s = util.bitvec2str(np.array([1], dtype=np.uint64))
    assert len(s) == 64 and s.endswith("1") and s.count("1") == 1


def test_stdin2ss_and_roller(tmp_path):
    from bonsai_tpu.cli import main

    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 62, 5000, dtype=np.uint64)
    rec = np.zeros(2 * vals.size, dtype=np.uint64)
    rec[0::2] = vals
    inp = tmp_path / "stream.bin"
    rec.tofile(inp)
    out = tmp_path / "x.ss"
    rc = main(["stdin2ss", str(inp), "-S", "512", "-o", str(out)])
    assert rc == 0
    from bonsai_tpu.sketch.setsketch import SetSketch

    s = SetSketch.read(str(out))
    assert s.m == 512 and s.bits == 8
    assert abs(s.cardinality() - 5000) / 5000 < 0.5

    # roller: two kmer dumps -> inverted index
    k1 = tmp_path / "a.u64.kmers"
    k2 = tmp_path / "b.u64.kmers"
    vals[:100].tofile(k1)
    vals[50:150].tofile(k2)
    idxp = tmp_path / "roller.idx"
    rc = main(["setsketchroller", str(k1), str(k2), "-o", str(idxp), "-k", "31"])
    assert rc == 0
    from bonsai_tpu.sketch.ssi import SetSketchIndex

    idx = SetSketchIndex.read(str(idxp))
    assert idx.k == 31
    shared = [v for v in idx.map.values() if v == [0, 1]]
    assert len(shared) == 50


def test_errexp_runs(capsys):
    from bonsai_tpu.cli import main

    rc = main(["errexp", "-l", "0.4", "--set-sizes", "12",
               "--sketch-sizes", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if not l.startswith("#")]
    assert len(lines) == 2  # j in {0.4, 0.8}
    for l in lines:
        f = l.split("\t")
        true_j, hll_j, css_j = float(f[3]), float(f[4]), float(f[5])
        assert abs(css_j - true_j) < 0.15
