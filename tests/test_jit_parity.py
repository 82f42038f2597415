"""The batched encoder must produce identical results under jax.jit on
device as with numpy on host (the numpy path is oracle-verified)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonsai_tpu.core.encoder import BatchEncoder
from bonsai_tpu.core.spacer import Spacer

from conftest import random_dna
from test_encode import batch_from_seqs


@pytest.mark.parametrize(
    "k,w,canon,scheme",
    [(31, 31, True, "lex"), (21, 50, True, "lex"), (21, 50, False, "lex"),
     (13, 29, True, "entropy"), (32, 32, True, "lex")],
)
def test_jit_matches_numpy(k, w, canon, scheme):
    rng = np.random.default_rng(11)
    sp = Spacer(k, w)
    enc = BatchEncoder(sp, canon, scheme)
    seqs = [random_dna(rng, int(rng.integers(w + 5, 300)), 0.03) for _ in range(5)]
    codes, lengths = batch_from_seqs(seqs)

    np_vals, np_mask = enc.emissions(codes, lengths)

    @jax.jit
    def run(c, l):
        em = enc.emissions(c, l)
        return em.values, em.mask

    j_vals, j_mask = run(jnp.asarray(codes), jnp.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(j_mask), np_mask)
    np.testing.assert_array_equal(
        np.asarray(j_vals)[np.asarray(j_mask)], np_vals[np_mask]
    )


def test_jit_spaced():
    rng = np.random.default_rng(12)
    sp = Spacer(13, 40, "1,2,0x10")
    enc = BatchEncoder(sp, canonicalize=False)
    seqs = [random_dna(rng, 200, 0.02) for _ in range(4)]
    codes, lengths = batch_from_seqs(seqs)
    np_vals, np_mask = enc.emissions(codes, lengths)
    j_vals, j_mask = jax.jit(lambda c, l: tuple(enc.emissions(c, l)))(
        jnp.asarray(codes), jnp.asarray(lengths)
    )
    np.testing.assert_array_equal(np.asarray(j_mask), np_mask)
    np.testing.assert_array_equal(
        np.asarray(j_vals)[np_mask], np_vals[np_mask]
    )
