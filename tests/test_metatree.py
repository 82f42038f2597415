"""Metatree subsystem: bitsets, flextree scoring, reformation, end-to-end
discovery on simulated genomes with known cross-clade structure."""

import io

import numpy as np
import pytest

from bonsai_tpu.core.spacer import Spacer
from bonsai_tpu.metatree import (
    BitCmp,
    FMEmitter,
    KmerGenomeSets,
    TaxonomyReformation,
    adjacency,
    bitmap_patterns,
    pairwise_veccmp,
    score_node_addn,
    veccmp,
    vec_popcnt,
)
from bonsai_tpu.metatree.flextree import FNode, FlexMap, roundup64
from bonsai_tpu.metatree.sim import simulate
from bonsai_tpu.taxonomy.tree import TaxTree


def _bv(*words):
    return np.array(words, dtype=np.uint64)


def test_veccmp_cases():
    a = _bv(0b0110)
    assert veccmp(a, _bv(0b0110)) == BitCmp.EQUAL
    assert veccmp(_bv(0b1110), a) == BitCmp.FIRST_PARENT
    assert veccmp(a, _bv(0b1110)) == BitCmp.SECOND_PARENT
    assert veccmp(_bv(0b0011), _bv(0b1100)) == BitCmp.INCOMPARABLE


def test_pairwise_veccmp_matches_scalar():
    rng = np.random.default_rng(0)
    pats = rng.integers(0, 1 << 16, (20, 2), dtype=np.uint64)
    sup, sub = pairwise_veccmp(pats)
    for i in range(20):
        for j in range(20):
            c = veccmp(pats[i], pats[j])
            assert sup[i, j] == (c in (BitCmp.EQUAL, BitCmp.FIRST_PARENT))
            assert sub[i, j] == (c in (BitCmp.EQUAL, BitCmp.SECOND_PARENT))


def test_vec_popcnt():
    rows = np.array([[0b1011, 0], [0, 1 << 63]], dtype=np.uint64)
    np.testing.assert_array_equal(vec_popcnt(rows), [3, 1])


def test_fnode_score_and_subsume():
    a = FNode(pattern=_bv(0b111), n=10, pc=3, bc=4, subtree=0)
    b = FNode(pattern=_bv(0b011), n=5, pc=2, bc=4, subtree=0)
    assert a.score() == (4 - 3) * 10
    assert b.score() == (4 - 2) * 5
    a.subsume(b)  # (bc-pc)*other.n = 1*5 transfers
    assert a.score() == 10 + 5
    assert b.score() == 10 - 5


def test_roundup64():
    assert roundup64(5) == 8
    assert roundup64(8) == 8
    assert roundup64(9) == 16


@pytest.fixture(scope="module")
def sim_data(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("simgenomes"))
    return simulate(out, n_parents=2, leaves_per_parent=4, block=1500,
                    cross_pairs=((0, 1),))


def test_bitmap_patterns_sim(sim_data):
    parent_map, name_map, tax_to_paths = sim_data
    # taxa under parent 10
    sub = {t: p for t, p in tax_to_paths.items() if parent_map[t] == 10}
    kgs = KmerGenomeSets(sub, Spacer(31, 31))
    assert kgs.size() == 4
    patterns, counts = bitmap_patterns(kgs)
    # the dominant non-trivial shared pattern is leaves {0,1} (cross
    # pair); root+parent blocks are shared by all (dropped), unique
    # blocks by one (dropped); block-junction kmers may add tiny
    # incidental patterns
    best = int(np.argmax(counts))
    assert int(patterns[best, 0]) == 0b0011
    assert counts[best] > 1000  # ~block-k shared kmers
    assert counts[best] > 100 * np.delete(counts, best).max(initial=0)


def test_adjacency_and_score():
    pats = np.array([[0b0111], [0b0011], [0b1100]], dtype=np.uint64)
    counts = np.array([10, 20, 5])
    adj = adjacency(pats)
    np.testing.assert_array_equal(adj[0], [1])  # 0111 strictly contains 0011
    assert adj[1].size == 0 and adj[2].size == 0
    s = score_node_addn(0, adj, pats, counts, nelem=4)
    assert s == 10 * (4 - 3) + 20 * 2


def test_fmemitter_discovers_cross_clade(sim_data, tmp_path):
    parent_map, name_map, tax_to_paths = sim_data
    tree = TaxTree(parent_map)
    fme = FMEmitter(tree, tax_to_paths, to_add=4)
    for parent in (10, 11):
        taxes = [t for t in tax_to_paths if parent_map[t] == parent]
        assert fme.process_subtree(parent, sorted(taxes), Spacer(31, 31))
    buf = io.StringIO()
    emitted = fme.run_collapse(max(parent_map), buf)
    assert emitted
    # the top nodes must be the cross pairs {100,101} under 10 and
    # {104,105} under 11
    tops = {(r["parent"], tuple(r["children"])) for r in emitted[:2]}
    assert (10, (100, 101)) in tops
    assert (11, (104, 105)) in tops
    text = buf.getvalue()
    assert text.startswith("#Taxid (inserted)\tScore\tParent\tChildren")


def test_reformation(sim_data):
    parent_map, name_map, tax_to_paths = sim_data
    tree = TaxTree(parent_map)
    paths = [p for ps in tax_to_paths.values() for p in ps]
    # force a multi-genome taxon: both genomes of taxes 100 and 101 under
    # one name
    nm = dict(name_map)
    nm["leaf_101"] = 100
    tr = TaxonomyReformation(nm, paths, tree)
    # taxon 100 had two genomes -> split into two synthetic leaves
    assert len(tr.newid_path_map) == 2
    for nid in tr.newid_path_map:
        # synthetic leaves hang under old taxon 100
        assert tr.new_tree.parent_map[tr.old_to_new[nid]] == tr.old_to_new[100]
    # renumbering: root is 1, depths nondecreasing in new-id order
    assert tr.old_to_new[1] == 1
    depths = [
        tr.new_tree.node_depth(i) for i in range(1, len(tr.new_to_old))
    ]
    assert all(depths[i] <= depths[i + 1] for i in range(len(depths) - 1))


def test_metatree_cli(sim_data, tmp_path):
    import csv

    from bonsai_tpu.cli import main

    parent_map, name_map, tax_to_paths = sim_data
    nodes = tmp_path / "nodes.dmp"
    with open(nodes, "w") as fh:
        for t, p in parent_map.items():
            fh.write(f"{t}\t|\t{p}\t|\n")
    nim = tmp_path / "nameid.txt"
    with open(nim, "w") as fh:
        for n, t in name_map.items():
            fh.write(f"{n}\t{t}\n")
    out = tmp_path / "metatree.tsv"
    paths = [p for ps in tax_to_paths.values() for p in ps]
    rc = main(
        ["metatree", str(nodes), str(nim), *paths, "-n", "2", "-o", str(out)]
    )
    assert rc == 0
    lines = [l for l in open(out) if not l.startswith("#")]
    assert len(lines) == 2
    new_ids = [int(l.split("\t")[0]) for l in lines]
    assert all(i > max(parent_map) for i in new_ids)
