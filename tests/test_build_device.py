"""Device-side build (db/build_device.py) vs host build content equality.

The device fold is the same LCA algebra as db/build.py executed as XLA
sorts + elementwise combines; these tests pin content equality across
disciplines and the reference lca() corner semantics (zero identity,
missing-taxid poisoning, all-same-missing, disjoint roots)."""

import os

import numpy as np
import pytest

from bonsai_tpu.core.spacer import Spacer
from bonsai_tpu.db import build, build_device
from bonsai_tpu.taxonomy.tree import TAX_MISSING, TaxTree
from bonsai_tpu.taxonomy.ncbi import accession_from_header
from bonsai_tpu.io import fastx

from conftest import PHIX, random_dna

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def tree():
    # 1 -> {2, 3}; 2 -> {11, 12}; 3 -> {13}; plus a second root 5 -> {51}
    return TaxTree({1: 0, 2: 1, 3: 1, 11: 2, 12: 2, 13: 3, 5: 0, 51: 5})


def _write_genomes(tmp_path, rng, n=3, contigs=(3000, 1200), n_prob=0.01):
    paths, name_map = [], {}
    for i in range(n):
        p = str(tmp_path / f"g{i}.fa")
        with open(p, "w") as fh:
            for ci, clen in enumerate(contigs):
                seq = random_dna(rng, clen, n_prob=n_prob).decode()
                fh.write(f">ACC_{i}_{ci} synthetic\n{seq}\n")
        # genome taxid from the FIRST header only (util.h:922)
        paths.append(p)
        name_map[f"ACC_{i}_0"] = [11, 12, 13][i % 3]
    return paths, name_map


def _assert_tables_equal(a, b):
    np.testing.assert_array_equal(a.keys_sorted, b.keys_sorted)
    np.testing.assert_array_equal(
        np.asarray(a.vals_sorted, dtype=np.uint64),
        np.asarray(b.vals_sorted, dtype=np.uint64),
    )


@pytest.mark.parametrize(
    "k,w,canon",
    [(31, 31, True), (21, 40, True), (17, 31, False)],
)
def test_device_lca_map_matches_host(tmp_path, tree, k, w, canon):
    rng = np.random.default_rng(7)
    paths, name_map = _write_genomes(tmp_path, rng)
    sp = Spacer(k, w)
    # block < contig length exercises halo-overlapped chunking (and the
    # windowed-uncanon trailing-drop path when canon=False, w>k).  For the
    # uncanonical windowed discipline the window slides over VALID seeds,
    # so a (w-1)-base halo is only exact without in-chunk Ns (documented in
    # db/build.genome_kmer_set); compare against the host path at the SAME
    # block size there, and prove chunking-vs-whole equality elsewhere.
    host_kwargs = {}
    if not canon and w > k:
        host_kwargs["block"] = 1 << 10
    host = build.lca_map(paths, tree, name_map, sp, canonicalize=canon,
                         **host_kwargs)
    dev = build_device.device_lca_map(
        paths, tree, name_map, sp, canonicalize=canon, block=1 << 10
    )
    assert host.n > 0
    _assert_tables_equal(host, dev)


def test_device_lca_map_phix_real_files(tree):
    sp = Spacer(31, 31)
    small = os.path.join(DATA, "small_genome.fa")
    paths = [PHIX, small]
    name_map = {
        accession_from_header(fastx.first_header(PHIX)): 11,
        accession_from_header(fastx.first_header(small)): 13,
    }
    host = build.lca_map(paths, tree, name_map, sp)
    dev = build_device.device_lca_map(paths, tree, name_map, sp)
    _assert_tables_equal(host, dev)


def test_device_fold_runs_corner_semantics(tree):
    # keys engineered to collide across runs with every corner case:
    #   k1: 11 vs 12    -> lca 2
    #   k2: 11 vs 13    -> lca 1
    #   k3: 11 vs 0     -> 11 (zero identity)
    #   k4: 999 vs 999  -> 999 (all-same-missing keeps the value)
    #   k5: 999 vs 11   -> TAX_MISSING (poison)
    #   k6: 11 vs 51    -> 1 (disjoint roots)
    #   k7: 0 vs 0      -> 0
    #   k8: only in run A -> 12
    keys = [10, 20, 30, 40, 50, 60, 70, 80]
    runs_a = {10: 11, 20: 11, 30: 11, 40: 999, 50: 999, 60: 11, 70: 0, 80: 12}
    runs_b = {10: 12, 20: 13, 30: 0, 40: 999, 50: 11, 60: 51, 70: 0}

    def to_runs(d):
        # one run per (taxid) group, keys sorted within each run
        out = {}
        for kk, t in d.items():
            out.setdefault(t, []).append(kk)
        return [
            (np.sort(np.array(ks, dtype=np.uint64)), t)
            for t, ks in sorted(out.items())
        ]

    runs = to_runs(runs_a) + to_runs(runs_b)
    hk, ht, hc = build.lca_fold_runs(
        np.zeros(0, np.uint64), np.zeros(0, np.uint32), runs, tree,
        want_counts=True,
    )
    dk, dt, dc = build_device.device_fold_runs(runs, tree, want_counts=True)
    np.testing.assert_array_equal(hk, dk)
    np.testing.assert_array_equal(ht, dt)
    np.testing.assert_array_equal(hc, dc)
    got = dict(zip(dk.tolist(), dt.tolist()))
    assert got == {
        10: 2, 20: 1, 30: 11, 40: 999, 50: TAX_MISSING, 60: 1, 70: 0, 80: 12
    }


def test_device_fold_runs_many_genomes_tree_reduction(tree):
    # > 2 runs sharing keys: the tree reduction must still fold every group
    rng = np.random.default_rng(3)
    taxa = [11, 12, 13, 11, 12, 51, 13]
    runs = []
    for t in taxa:
        ks = np.unique(rng.integers(0, 200, size=60).astype(np.uint64))
        runs.append((ks, t))
    hk, ht = build.lca_fold_runs(
        np.zeros(0, np.uint64), np.zeros(0, np.uint32), runs, tree
    )
    dk, dt = build_device.device_fold_runs(runs, tree)
    np.testing.assert_array_equal(hk, dk)
    np.testing.assert_array_equal(ht, dt)


def test_device_phase1_maps_match_host(tmp_path, tree):
    rng = np.random.default_rng(11)
    paths, name_map = _write_genomes(tmp_path, rng, n=3, contigs=(2000,))
    sp = Spacer(25, 25)
    host_td = build.taxdepth_map(paths, tree, name_map, sp)
    dev_td = build_device.device_taxdepth_map(paths, tree, name_map, sp)
    _assert_tables_equal(host_td, dev_td)
    host_fc = build.ftct_map(paths, tree, name_map, sp)
    dev_fc = build_device.device_ftct_map(paths, tree, name_map, sp)
    _assert_tables_equal(host_fc, dev_fc)


def test_device_minimized_map_matches_host(tmp_path, tree):
    rng = np.random.default_rng(13)
    paths, name_map = _write_genomes(tmp_path, rng, n=2, contigs=(2500,))
    sp1 = Spacer(19, 19)
    spm = Spacer(19, 36)
    phase1 = build.taxdepth_map(paths, tree, name_map, sp1)
    host = build.minimized_map(paths, phase1, tree, name_map, spm)
    dev = build_device.device_minimized_map(
        paths, phase1, tree, name_map, spm
    )
    _assert_tables_equal(host, dev)


def test_sharded_lca_map_matches_host(tmp_path, tree):
    """Key-range-sharded fold over a 4-wide 'db' mesh axis == host build."""
    from bonsai_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(21)
    paths, name_map = _write_genomes(tmp_path, rng, n=3, contigs=(2600, 900))
    sp = Spacer(27, 27)
    host = build.lca_map(paths, tree, name_map, sp)
    mesh = make_mesh({"db": 4})
    dev = build_device.sharded_lca_map(
        paths, tree, name_map, sp, mesh, block=1 << 10
    )
    assert host.n > 0
    _assert_tables_equal(host, dev)


def test_sharded_fold_overflow_detection(tree):
    from bonsai_tpu.parallel.mesh import make_mesh

    import jax.numpy as jnp

    mesh = make_mesh({"db": 2})
    fold = build_device.ShardedLCAFold(tree, mesh, cap=8)
    rng = np.random.default_rng(2)
    keys = jnp.asarray(rng.integers(0, 1 << 63, 64).astype(np.uint64))
    pad = jnp.zeros(64, dtype=jnp.uint8)
    with pytest.raises(RuntimeError, match="capacity"):
        fold.add_chunk(keys, pad, node=3, orig=11)


def test_device_build_classifies_identically(tmp_path, tree):
    """A device-built DB must drive the classifier to the same output as a
    host-built one (same content => same probe results by construction)."""
    rng = np.random.default_rng(5)
    paths, name_map = _write_genomes(tmp_path, rng, n=2, contigs=(4000,),
                                     n_prob=0.0)
    sp = Spacer(31, 31)
    host = build.lca_map(paths, tree, name_map, sp)
    dev = build_device.device_lca_map(paths, tree, name_map, sp)
    q = np.concatenate(
        [host.keys_sorted[::7], np.array([12345, 999999], dtype=np.uint64)]
    )
    hv, hf = host.probe_np(q)
    dv, df = dev.probe_np(q)
    np.testing.assert_array_equal(hf, df)
    np.testing.assert_array_equal(hv[hf], dv[df])
