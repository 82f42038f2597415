"""Incremental/checkpointed DB builds + disk bit arrays."""

import os

import numpy as np
import pytest

from bonsai_tpu.core.spacer import Spacer
from bonsai_tpu.db.build import IncrementalLCABuilder, lca_map
from bonsai_tpu.db.diskarray import DiskBitArray, MMapTaxonomyBitmap
from bonsai_tpu.taxonomy.tree import TaxTree

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def small_tree():
    return TaxTree({1: 0, 2: 1, 11: 2, 12: 2, 13: 1})


def _kset(seed, n):
    return np.unique(
        np.random.default_rng(seed).integers(0, 1 << 40, n, dtype=np.uint64)
    )


def test_incremental_matches_batch(small_tree, tmp_path):
    sets = {11: _kset(1, 5000), 12: _kset(2, 5000), 13: _kset(3, 5000)}
    # batch fold
    keys = np.concatenate(list(sets.values()))
    taxa = np.concatenate(
        [np.full(s.size, t, dtype=np.uint32) for t, s in sets.items()]
    )
    from bonsai_tpu.db.build import lca_fold_pairs

    bk, bt = lca_fold_pairs(keys, taxa, small_tree)
    # incremental, fold_every=1
    b = IncrementalLCABuilder(small_tree, fold_every=1)
    for t, s in sets.items():
        b.add_genome(f"g{t}", t, s)
    table = b.finish()
    np.testing.assert_array_equal(table.keys_sorted, bk)
    np.testing.assert_array_equal(table.vals_sorted, bt)


def test_checkpoint_resume(small_tree, tmp_path):
    ckpt = str(tmp_path / "build.ckpt.npz")
    sets = [(f"g{i}", 11 + (i % 3), _kset(10 + i, 2000)) for i in range(6)]
    # interrupted build: first 3 genomes, checkpoint, then "crash"
    b1 = IncrementalLCABuilder(small_tree, ckpt, fold_every=2)
    for p, t, s in sets[:3]:
        b1.add_genome(p, t, s)
    b1.save_checkpoint()
    # resume in a fresh builder
    b2 = IncrementalLCABuilder(small_tree, ckpt, fold_every=2)
    pend = b2.pending([p for p, _, _ in sets])
    assert pend == [p for p, _, _ in sets[3:]]
    for p, t, s in sets[3:]:
        b2.add_genome(p, t, s)
    t2 = b2.finish()
    # equals a clean single-pass build
    b3 = IncrementalLCABuilder(small_tree)
    for p, t, s in sets:
        b3.add_genome(p, t, s)
    t3 = b3.finish()
    np.testing.assert_array_equal(t2.keys_sorted, t3.keys_sorted)
    np.testing.assert_array_equal(t2.vals_sorted, t3.vals_sorted)
    # 13 taxa merge to LCA of {11..13}: content sanity
    assert set(np.unique(t3.vals_sorted)) <= {1, 2, 11, 12, 13}


@pytest.mark.slow
def test_lca_map_checkpoint_path(small_tree, tmp_path):
    genomes = [
        os.path.join(DATA, "ec", f)
        for f in sorted(os.listdir(os.path.join(DATA, "ec")))[:2]
    ]
    name_map = {}
    from bonsai_tpu.io import fastx
    from bonsai_tpu.taxonomy.ncbi import accession_from_header

    for gi, g in enumerate(genomes):
        name_map[accession_from_header(fastx.first_header(g))] = 11 + gi
    sp = Spacer(21, 21)
    ckpt = str(tmp_path / "ck.npz")
    t1 = lca_map(genomes, small_tree, name_map, sp, checkpoint_path=ckpt)
    assert os.path.exists(ckpt)
    # resuming with all genomes done returns identical content instantly
    t2 = lca_map(genomes, small_tree, name_map, sp, checkpoint_path=ckpt)
    np.testing.assert_array_equal(t1.keys_sorted, t2.keys_sorted)
    np.testing.assert_array_equal(t1.vals_sorted, t2.vals_sorted)


def test_diskbitarray(tmp_path):
    p = str(tmp_path / "bits.bin")
    d = DiskBitArray(p, 100, 37, create=True)
    d.set_bits(np.array([0, 0, 5, 99]), np.array([0, 36, 7, 8]))
    d.flush()
    assert d.get_bit(0, 0) and d.get_bit(0, 36) and d.get_bit(5, 7)
    assert not d.get_bit(1, 0)
    row = d.row(0)
    assert row.shape == (37,) and row.sum() == 2
    np.testing.assert_array_equal(
        d.popcounts(), [2] + [0] * 4 + [1] + [0] * 93 + [1]
    )
    # reopen without create
    d2 = DiskBitArray(p, 100, 37)
    assert d2.get_bit(99, 8)


def test_mmap_taxonomy_bitmap(tmp_path):
    p = str(tmp_path / "taxbits.bin")
    keys = np.sort(_kset(5, 1000))
    bm = MMapTaxonomyBitmap(p, keys, 8, create=True)
    bm.set_kmers(keys[:100], 0)
    bm.set_kmers(keys[50:150], 3)
    bm.set_kmers(np.array([keys[0] + 1], dtype=np.uint64), 5)  # absent kmer
    bm.flush()
    r = bm.kmer_row(int(keys[60]))
    assert r[0] and r[3] and not r[5]
    assert bm.kmer_row(int(keys[200])) is not None
    assert bm.kmer_row(int(keys[0]) + 1) is None
    bm2 = MMapTaxonomyBitmap.open(p, keys)
    assert bm2.kmer_row(int(keys[60]))[3]


def test_fold_runs_matches_fold_pairs(small_tree):
    """The native k-way merge fold must agree with the sort-based fold on
    every semantic corner: plain LCA, zero taxids, taxids missing from the
    tree (poisoning vs all-same-missing), and an accumulated state with
    arbitrary folded values."""
    from bonsai_tpu.db.build import lca_fold_pairs, lca_fold_runs

    rng = np.random.default_rng(42)
    # runs with overlapping keys; taxids include 0, in-tree, and missing
    pool = rng.integers(0, 1 << 20, 4000, dtype=np.uint64)
    runs = []
    for taxid in (11, 12, 13, 2, 0, 777, 777, 888):  # 777/888 not in tree
        ks = np.unique(rng.choice(pool, size=1500))
        runs.append((ks, taxid))
    # accumulated state: a prior fold (so taxa are arbitrary LCA values)
    acc_k, acc_t = lca_fold_pairs(
        np.concatenate([runs[0][0], runs[1][0]]),
        np.concatenate([
            np.full(runs[0][0].size, 11, np.uint32),
            np.full(runs[1][0].size, 12, np.uint32),
        ]),
        small_tree,
    )
    rest = runs[2:]
    keys = np.concatenate([acc_k] + [k for k, _ in rest])
    taxa = np.concatenate(
        [acc_t] + [np.full(k.size, t, np.uint32) for k, t in rest]
    )
    want_k, want_t = lca_fold_pairs(keys, taxa, small_tree)
    got_k, got_t = lca_fold_runs(acc_k, acc_t, rest, small_tree)
    np.testing.assert_array_equal(got_k, want_k)
    np.testing.assert_array_equal(got_t, want_t)
    # counts = group multiplicity
    got_k2, got_t2, counts = lca_fold_runs(
        acc_k, acc_t, rest, small_tree, want_counts=True
    )
    uk, want_counts = np.unique(keys, return_counts=True)
    np.testing.assert_array_equal(got_k2, uk)
    np.testing.assert_array_equal(counts, want_counts)


def test_sharded_on_disk_layout(tmp_path):
    """save/load of the per-shard DB directory: round-trip equality, and
    rank-subset loads contain exactly the hash-prefix-owned keys."""
    import numpy as np
    from bonsai_tpu.db.formats import (
        Database, load_database_sharded, save_database_sharded,
    )
    from bonsai_tpu.db.table import KmerTable, shard_owner

    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(0, 1 << 40, size=20000, dtype=np.uint64))
    vals = rng.integers(1, 99, size=len(keys)).astype(np.uint32)
    db = Database(table=KmerTable(keys, vals), k=20, w=20, gaps=[0] * 19)
    d = str(tmp_path / "sharded")
    save_database_sharded(db, d, ndb=4)
    back = load_database_sharded(d)
    np.testing.assert_array_equal(back.table.keys_sorted, keys)
    np.testing.assert_array_equal(back.table.vals_sorted, vals)
    assert (back.k, back.w) == (20, 20)
    one = load_database_sharded(d, ranks=[2])
    own = shard_owner(keys, 4)
    np.testing.assert_array_equal(one.table.keys_sorted, keys[own == 2])
