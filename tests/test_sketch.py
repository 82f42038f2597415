"""HyperLogLog accuracy + merge semantics (reference test/hll.cpp analog)."""

import numpy as np
import pytest

from bonsai_tpu.sketch.hll import HyperLogLog, estimate_cardinality


@pytest.mark.parametrize("n", [100, 10_000, 1_000_000])
def test_hll_accuracy(n):
    rng = np.random.default_rng(42)
    h = HyperLogLog(14)
    h.addh(rng.integers(0, 1 << 63, size=n, dtype=np.uint64))
    est = h.report()
    tol = 5 * 1.04 / np.sqrt(h.m) + 0.01
    assert abs(est - n) / n < tol, (est, n)


def test_hll_duplicates_dont_count():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 63, size=5000, dtype=np.uint64)
    h = HyperLogLog(12)
    for _ in range(5):
        h.addh(x)
    est = h.report()
    assert abs(est - 5000) / 5000 < 0.1


def test_hll_merge_equals_union():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 63, size=30000, dtype=np.uint64)
    y = rng.integers(0, 1 << 63, size=30000, dtype=np.uint64)
    a, b, u = HyperLogLog(12), HyperLogLog(12), HyperLogLog(12)
    a.addh(x)
    b.addh(y)
    u.addh(np.concatenate([x, y]))
    merged = a.clone().merge(b)
    np.testing.assert_array_equal(merged.registers, u.registers)


def test_estimate_cardinality_presize():
    rng = np.random.default_rng(3)
    arrays = [rng.integers(0, 1 << 62, size=20000, dtype=np.uint64) for _ in range(4)]
    true = len(np.unique(np.concatenate(arrays)))
    est = estimate_cardinality(arrays, p=13)
    assert abs(est - true) / true < 0.1
