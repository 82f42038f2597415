"""Taxonomy tests: LCA/resolve_tree reference semantics on a hand tree and
a brute-force random-tree property check."""

import numpy as np
import pytest

from bonsai_tpu.taxonomy.tree import TaxTree, TAX_MISSING
from bonsai_tpu.taxonomy.ncbi import accession_from_header


#        1
#       / \
#      2   3
#     / \    \
#    4   5    6
#   /          \
#  7            8
HAND = {1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 4, 8: 6}


@pytest.fixture(scope="module")
def tree():
    return TaxTree(HAND)


def brute_lca(pm, a, b):
    if a == b:
        return a
    if b == 0:
        return a
    if a == 0:
        return b
    seen = set()
    x = a
    while x:
        seen.add(x)
        if x not in pm:
            return TAX_MISSING
        x = pm[x]
    x = b
    while x:
        if x in seen:
            return x
        if x not in pm:
            return TAX_MISSING
        x = pm[x]
    return 1


def test_depths(tree):
    # node_depth counts steps to reach 0: depth(1) == 1 (util.h:679-691)
    assert tree.node_depth(1) == 1
    assert tree.node_depth(2) == 2
    assert tree.node_depth(7) == 4


def test_lca_hand(tree):
    for a in list(HAND) + [0]:
        for b in list(HAND) + [0]:
            assert tree.lca(a, b) == brute_lca(HAND, a, b), (a, b)


def test_lca_pairs_vectorized(tree):
    ids = list(HAND) + [0]
    aa, bb = np.meshgrid(ids, ids)
    got = tree.lca_pairs(aa.ravel(), bb.ravel())
    want = [brute_lca(HAND, a, b) for a, b in zip(aa.ravel(), bb.ravel())]
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint32))


def test_is_ancestor(tree):
    assert tree.is_ancestor([1], [7])[0]
    assert tree.is_ancestor([2], [7])[0]
    assert tree.is_ancestor([4], [7])[0]
    assert tree.is_ancestor([7], [7])[0]
    assert not tree.is_ancestor([3], [7])[0]
    assert not tree.is_ancestor([7], [4])[0]


def test_resolve_tree_basic(tree):
    # single taxon
    assert tree.resolve_tree_host({7: 3}) == 7
    # deeper path outweighs: 7's path counts hits at 7,4,2,1
    assert tree.resolve_tree_host({7: 1, 2: 1}) == 7
    # tie between disjoint leaves -> LCA
    assert tree.resolve_tree_host({7: 1, 8: 1}) == 1
    assert tree.resolve_tree_host({4: 1, 5: 1}) == 2
    # empty -> 0
    assert tree.resolve_tree_host({}) == 0


def test_random_tree_lca_property():
    rng = np.random.default_rng(0)
    n = 200
    pm = {1: 0}
    for tid in range(2, n + 1):
        pm[tid] = int(rng.integers(1, tid))
    t = TaxTree(pm)
    ids = rng.integers(1, n + 1, size=(300, 2))
    got = t.lca_pairs(ids[:, 0], ids[:, 1])
    want = [brute_lca(pm, int(a), int(b)) for a, b in ids]
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint32))


def test_random_tree_resolve_property():
    rng = np.random.default_rng(1)
    n = 60
    pm = {1: 0}
    for tid in range(2, n + 1):
        pm[tid] = int(rng.integers(1, tid))
    t = TaxTree(pm)

    def brute_resolve(hits):
        best, best_score, tied = 0, 0, []
        for taxon in hits:
            node, score = taxon, 0
            while node:
                score += hits.get(node, 0)
                node = pm[node]
            if score > best_score:
                best_score, best, tied = score, taxon, []
            elif score == best_score:
                if not tied:
                    tied = [best]
                if taxon not in tied:
                    tied.append(taxon)
        if tied:
            acc = tied[0]
            for x in tied[1:]:
                acc = brute_lca(pm, acc, x)
            best = acc
        return best

    for _ in range(100):
        m = int(rng.integers(1, 8))
        hits = {}
        for _ in range(m):
            hits[int(rng.integers(1, n + 1))] = int(rng.integers(1, 5))
        assert t.resolve_tree_host(hits) == brute_resolve(hits)


def test_accession_extraction():
    assert accession_from_header(">gi|455|ref|NC_003.1| desc here") == "NC_003.1"
    assert accession_from_header(">NC_003.1 some description") == "NC_003.1"
    assert accession_from_header("NC_003.1") == "NC_003.1"
