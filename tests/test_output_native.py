"""Native Kraken formatter vs the Python reference formatter."""

import numpy as np
import pytest

from bonsai_tpu import native
from bonsai_tpu.classify import output as out_mod
from bonsai_tpu.classify.pipeline import BatchResult

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


def _mk(B=512, P=37, seed=0, short=False, paired=False):
    rng = np.random.default_rng(seed)
    W = 2 * P if paired else P
    taxa = rng.choice([0, 7, 11, 12, 2, 0xFFFFFFFF], size=(B, W)).astype(
        np.uint32
    )
    lengths = np.full(B, 101, dtype=np.int32)
    if short:
        lengths[::3] = 10  # forces the unsigned ambig wrap
    hit = (taxa != 0) & (rng.random((B, W)) < 0.8)
    n_missing = rng.integers(0, 30, B).astype(np.int32)
    n_kmers = (hit.sum(axis=1) + n_missing).astype(np.int32)
    kw = {}
    if paired:
        kw = dict(
            lengths2=np.full(B, 101, dtype=np.int32),
            seqs2=[b"C" * 101] * B,
            quals2=[None] * B,
            n_kmers1=np.minimum(n_kmers, P).astype(np.int32),
        )
    else:
        kw = dict(n_kmers1=n_kmers)
    return BatchResult(
        names=[b"r%d/some|name" % i for i in range(B)],
        seqs=[b"A" * 101] * B,
        quals=[None] * B,
        lengths=lengths,
        taxon=rng.choice([0, 7, 11], B).astype(np.uint32),
        taxa=taxa,
        hit_mask=hit,
        n_missing=n_missing,
        n_kmers=n_kmers,
        **kw,
    )


@pytest.mark.parametrize("paired", [False, True])
@pytest.mark.parametrize("emit_all", [False, True])
@pytest.mark.parametrize("short", [False, True])
def test_native_matches_python(paired, emit_all, short):
    res = _mk(short=short, paired=paired)
    nat = out_mod._format_batch_native(res, 31, emit_all)
    py = out_mod._format_batch_python(res, 31, emit_all, True, False)
    assert nat == py


def test_tiny_buffer_retry():
    res = _mk(B=64)
    py = out_mod._format_batch_python(res, 31, True, True, False)
    nat = out_mod._format_batch_native(res, 31, True)
    assert nat == py


def test_empty_batch():
    res = BatchResult(
        names=[], seqs=[], quals=[], lengths=np.zeros(0, np.int32),
        taxon=np.zeros(0, np.uint32), taxa=np.zeros((0, 0), np.uint32),
        hit_mask=np.zeros((0, 0), bool), n_missing=np.zeros(0, np.int32),
        n_kmers=np.zeros(0, np.int32),
    )
    assert out_mod.format_batch(res, 31) == ""
