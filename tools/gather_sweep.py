#!/usr/bin/env python
"""Stable gather-cost sweep: dtype x row width x table size.

Methodology: chained dispatches (20 iters), warmup with the same shapes,
repeat 3x and take the min.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

NQ = 1 << 19


def measure(nb, lanes, dtype, label):
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(
        key, (nb, lanes), 0, (1 << 31) - 1, dtype=jnp.int32
    ).astype(dtype)
    bytes_ = tab.size * tab.dtype.itemsize

    @jax.jit
    def step(idx):
        rows = tab[idx & (nb - 1)]
        return idx ^ (rows.sum(-1).astype(jnp.int32) | 1)

    idx0 = (jnp.arange(NQ, dtype=jnp.uint32) * jnp.uint32(2654435761)).astype(
        jnp.int32
    ) & (nb - 1)
    x = step(idx0)
    np.asarray(x[:1])
    best = 1e9
    for _ in range(3):
        x = step(x)
        np.asarray(x[:1])
        t0 = time.perf_counter()
        for _ in range(20):
            x = step(x)
        np.asarray(x[:1])
        best = min(best, (time.perf_counter() - t0) / 20)
    print(
        f"{label:26s} {bytes_/2**20:7.1f} MiB: {best*1e9/NQ:7.2f} ns/q"
    )


if __name__ == "__main__":
    MB = 1 << 20
    # u64 rows
    for nb_log, lanes in [(21, 8), (20, 8), (21, 4), (22, 4), (20, 4)]:
        measure(1 << nb_log, lanes, jnp.uint64, f"u64x{lanes} nb=2^{nb_log}")
    # u32 rows
    for nb_log, lanes in [(21, 16), (21, 8), (22, 8), (20, 8), (23, 8), (22, 16)]:
        measure(1 << nb_log, lanes, jnp.uint32, f"u32x{lanes} nb=2^{nb_log}")
    # element gathers
    measure(1 << 20, 1, jnp.uint32, "u32 elem nb=2^20")
    measure(1 << 24, 1, jnp.uint32, "u32 elem nb=2^24")
    measure(1 << 24, 1, jnp.uint64, "u64 elem nb=2^24")
