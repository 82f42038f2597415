#!/usr/bin/env python
"""Gather cost vs table size + small-table element gathers (chained/synced)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bonsai_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

NQ = 1 << 21


def _sync(x):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1])


def timed(fn, *args, n=10):
    out = fn(*args)
    out = fn(*args, salt=out)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, salt=out)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 1 << 31, NQ, dtype=np.uint32))

    # one 64B u64x8 row gather at varying table size
    for nb_log in (18, 19, 20, 21, 22):
        NB = 1 << nb_log
        rows = jnp.asarray(rng.integers(0, 1 << 63, (NB, 8), dtype=np.uint64))

        @jax.jit
        def g(q, rows, salt=0):
            s = jnp.ravel(jax.tree_util.tree_leaves(salt)[0])[0].astype(jnp.uint32)
            i = ((q + s) % NB).astype(jnp.int32)
            r = rows[i]
            return r.sum(-1).astype(jnp.uint32) + q, q

        dt = timed(g, q, rows)
        mb = NB * 64 // (1 << 20)
        print(f"1x64B gather, table {mb:5d} MB: {dt/NQ*1e9:6.1f} ns/q", flush=True)

    # 32B rows (u32x8) at 2^22 rows = 134MB
    NB = 1 << 22
    rows32 = jnp.asarray(rng.integers(0, 1 << 31, (NB, 8), dtype=np.uint32))

    @jax.jit
    def g32(q, rows, salt=0):
        s = jnp.ravel(jax.tree_util.tree_leaves(salt)[0])[0].astype(jnp.uint32)
        i = ((q + s) % NB).astype(jnp.int32)
        r = rows[i]
        return r.sum(-1) + q, q

    dt = timed(g32, q, rows32)
    print(f"1x32B u32x8 gather, table 128 MB: {dt/NQ*1e9:6.1f} ns/q", flush=True)

    # small-table element gather (taxonomy arrays)
    for sz_log in (14, 17, 20):
        N = 1 << sz_log
        tab = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.uint32))

        @jax.jit
        def e(q, tab, salt=0):
            s = jnp.ravel(jax.tree_util.tree_leaves(salt)[0])[0].astype(jnp.uint32)
            i = ((q + s) % N).astype(jnp.int32)
            return tab[i] + q, q

        dt = timed(e, q, tab)
        kb = N * 4 // 1024
        print(f"elem gather, table {kb:6d} KB: {dt/NQ*1e9:6.1f} ns/q", flush=True)


if __name__ == "__main__":
    main()
