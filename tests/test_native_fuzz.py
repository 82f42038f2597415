"""Adversarial fuzz of the native C kernels against the pure-python paths.

The native library (native/src/sortops.cpp) carries the DB build's hot
loops; every function here must be a drop-in for its numpy fallback, so we
drive both sides with the same randomized + adversarial inputs and require
bit equality."""

import numpy as np
import pytest

from bonsai_tpu.db import build
from bonsai_tpu.db.table import KmerTable
from bonsai_tpu.native import get_lib
from bonsai_tpu.taxonomy.tree import TaxTree

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


@pytest.fixture(scope="module")
def tree():
    # two roots, a chain, and a fan-out
    return TaxTree(
        {1: 0, 2: 1, 3: 1, 11: 2, 12: 2, 13: 3, 14: 13, 5: 0, 51: 5}
    )


def _fold_fallback(runs, tree, want_counts):
    """lca_fold_runs' numpy path (native lib disabled)."""
    orig = build._native_lib
    build._native_lib = lambda: None
    try:
        return build.lca_fold_runs(
            np.zeros(0, np.uint64), np.zeros(0, np.uint32), runs, tree,
            want_counts=want_counts,
        )
    finally:
        build._native_lib = orig


def test_merge_fold_stats_fuzz(tree):
    rng = np.random.default_rng(0)
    taxa_pool = np.array([0, 1, 2, 3, 11, 12, 13, 14, 51, 999, 1000,
                          0xFFFFFFFF], dtype=np.uint32)
    for trial in range(25):
        G = int(rng.integers(1, 9))
        runs = []
        for _ in range(G):
            n = int(rng.integers(0, 120))
            # small key domain to force heavy cross-run collisions
            ks = np.unique(rng.integers(0, 150, size=n).astype(np.uint64))
            t = int(rng.choice(taxa_pool))
            runs.append((ks, t))
        nk, nt, nc = build.lca_fold_runs(
            np.zeros(0, np.uint64), np.zeros(0, np.uint32), runs, tree,
            want_counts=True,
        )
        fk, ft, fc = _fold_fallback(runs, tree, want_counts=True)
        np.testing.assert_array_equal(nk, fk, err_msg=f"trial {trial} keys")
        np.testing.assert_array_equal(nt, ft, err_msg=f"trial {trial} taxa")
        np.testing.assert_array_equal(nc, fc, err_msg=f"trial {trial} counts")


def test_merge_fold_stats_with_accumulated_state(tree):
    """The acc-state path carries per-element taxa (not a run constant)."""
    rng = np.random.default_rng(1)
    for trial in range(10):
        acc_k = np.unique(rng.integers(0, 100, size=40).astype(np.uint64))
        acc_t = rng.choice(
            np.array([2, 11, 12, 13, 999, 0xFFFFFFFF, 0], dtype=np.uint32),
            size=acc_k.size,
        ).astype(np.uint32)
        runs = [
            (np.unique(rng.integers(0, 100, size=30).astype(np.uint64)),
             int(t))
            for t in (11, 51, 999)
        ]
        nk, nt = build.lca_fold_runs(acc_k, acc_t, runs, tree)
        # fallback on the same inputs
        orig = build._native_lib
        build._native_lib = lambda: None
        try:
            fk, ft = build.lca_fold_runs(acc_k, acc_t, runs, tree)
        finally:
            build._native_lib = orig
        np.testing.assert_array_equal(nk, fk)
        np.testing.assert_array_equal(nt, ft, err_msg=f"trial {trial}")


def test_merge_fold_empty_and_single():
    tree = TaxTree({1: 0, 2: 1})
    out = build.lca_fold_runs(
        np.zeros(0, np.uint64), np.zeros(0, np.uint32), [], tree
    )
    assert out[0].size == 0 and out[1].size == 0
    k, t = build.lca_fold_runs(
        np.zeros(0, np.uint64), np.zeros(0, np.uint32),
        [(np.array([7], dtype=np.uint64), 2)], tree,
    )
    assert k.tolist() == [7] and t.tolist() == [2]


def test_cuckoo_place_tiny_tables():
    for n in (0, 1, 2, 3, 5):
        keys = np.arange(n, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        keys = np.unique(keys)
        vals = (np.arange(keys.size) % 7).astype(np.uint32)
        t = KmerTable(keys, vals)
        if keys.size:
            v, f = t.probe_np(keys)
            assert bool(f.all())
            np.testing.assert_array_equal(v.astype(np.uint32), vals)
        miss = np.array([0xDEAD, 0xBEEF, 2**63 + 1], dtype=np.uint64)
        miss = miss[~np.isin(miss, keys)]
        _, f = t.probe_np(miss)
        assert not bool(f.any())


def test_cuckoo_place_high_load_and_adversarial_keys():
    rng = np.random.default_rng(3)
    # dense low-entropy keys (sequential kmers) + random, 200k total
    seq = np.arange(100_000, dtype=np.uint64)
    rnd = rng.integers(0, 1 << 62, size=100_000, dtype=np.uint64)
    keys = np.unique(np.concatenate([seq, rnd]))
    vals = rng.integers(0, 50, size=keys.size).astype(np.uint32)
    t = KmerTable(keys, vals)
    v, f = t.probe_np(keys)
    assert bool(f.all())
    np.testing.assert_array_equal(v.astype(np.uint32), vals)
    miss = rng.integers(1 << 62, 1 << 63, size=10_000, dtype=np.uint64)
    miss = miss[~np.isin(miss, keys)]
    _, f = t.probe_np(miss)
    assert not bool(f.any())


def test_radix_sort_adversarial():
    lib = get_lib()
    rng = np.random.default_rng(4)
    cases = [
        np.zeros(1000, dtype=np.uint64),                      # constant
        np.arange(1000, dtype=np.uint64),                     # presorted
        np.arange(1000, dtype=np.uint64)[::-1].copy(),        # reversed
        rng.integers(0, 4, size=1000).astype(np.uint64),      # tiny domain
        (rng.integers(0, 1 << 63, size=1000, dtype=np.uint64)
         | (np.uint64(1) << np.uint64(63))),                  # high bit set
    ]
    for i, a in enumerate(cases):
        b = a.copy()
        lib.btpu_radix_sort_u64(b.ctypes.data, b.size)
        np.testing.assert_array_equal(b, np.sort(a), err_msg=f"case {i}")
        k = a.copy()
        v = np.arange(a.size, dtype=np.uint32)
        lib.btpu_radix_sort_kv(k.ctypes.data, v.ctypes.data, k.size)
        np.testing.assert_array_equal(k, np.sort(a), err_msg=f"case {i}")
        # kv: values must travel with their keys (multiset check)
        np.testing.assert_array_equal(a[v], k, err_msg=f"case {i} perm")


def test_pack_batch_native_matches_numpy():
    """native/src/pack.cpp one-pass pad+pack+N-extract vs the numpy
    reference packing, across lengths/N-densities/row counts."""
    import numpy as np
    import pytest

    from bonsai_tpu import native
    from bonsai_tpu.classify.pipeline import Classifier

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "btpu_pack_batch"):
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    for trial in range(25):
        B = int(rng.integers(1, 24))
        Bp = int(rng.integers(B, B + 9))
        L = int(rng.integers(2, 14)) * 32
        lengths = rng.integers(8, L + 1, size=B).astype(np.int32)
        codes = np.full((B, L), -1, dtype=np.int8)
        for i in range(B):
            n_i = int(lengths[i])
            row = rng.integers(0, 4, n_i).astype(np.int8)
            nmaskp = rng.random(n_i) < rng.choice([0.0, 0.02, 0.4])
            row[nmaskp] = -1
            codes[i, :n_i] = row
        lproc = min(L, max(int(rng.integers(1, L // 8 + 1)) * 8, 8))
        lproc = max(lproc, int(lengths.max()))
        lproc = min(L, (lproc + 7) & ~7)
        w16 = (lproc + 15) // 16
        nmw = (w16 + 1) // 2
        cap = 16
        pcodes = np.empty((Bp, w16), dtype=np.uint32)
        nmask = np.empty((Bp, nmw), dtype=np.uint32)
        nidx = np.empty(cap, dtype=np.uint32)
        n_inread = lib.btpu_pack_batch(
            codes.ctypes.data, B, L, lengths.ctypes.data, Bp, w16, lproc,
            pcodes.ctypes.data, nmask.ctypes.data, nmw,
            nidx.ctypes.data, cap,
        )
        # numpy reference (the pure-python _prepare_batch path)
        full = np.full((Bp, L), -1, dtype=np.int8)
        full[:B] = codes
        p_ref, m_ref = Classifier.pack_codes(full, with_nmask=True)
        np.testing.assert_array_equal(pcodes, p_ref[:, :w16])
        np.testing.assert_array_equal(nmask, m_ref[:, :nmw])
        lens_pad = np.zeros(Bp, dtype=np.int32)
        lens_pad[:B] = lengths
        inread = (full < 0) & (np.arange(L) < lens_pad[:, None])
        rr, cc = np.nonzero(inread)
        assert n_inread == rr.size
        want = np.full(cap, 0x7FFFFFFF, dtype=np.uint32)
        take = min(rr.size, cap)
        want[:take] = (rr[:take] * lproc + cc[:take]).astype(np.uint32)
        np.testing.assert_array_equal(nidx, want)
