#!/usr/bin/env python
"""Is the chip/tunnel stable? Repeat the same two measurements 5x each:
(a) chained-dispatch gather loop, (b) scan-based gather loop (identical op).
"""
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

NB = 1 << 21
NQ = 1 << 19

key = jax.random.PRNGKey(0)
tab = jax.random.randint(key, (NB, 8), 0, (1 << 31) - 1, dtype=jnp.int32).astype(
    jnp.uint64
)


@jax.jit
def step(idx):
    rows = tab[idx & (NB - 1)]
    return idx ^ (rows.sum(-1).astype(jnp.int32) | 1)


@functools.partial(jax.jit, static_argnums=(1,))
def scan_loop(idx, n):
    def body(c, _):
        rows = tab[c & (NB - 1)]
        return c ^ (rows.sum(-1).astype(jnp.int32) | 1), ()

    out, _ = jax.lax.scan(body, idx, None, length=n)
    return out


idx0 = (jnp.arange(NQ, dtype=jnp.uint32) * jnp.uint32(2654435761)).astype(
    jnp.int32
) & (NB - 1)

# warmup both
x = step(idx0); np.asarray(x[:1])
y = scan_loop(idx0, 2); np.asarray(y[:1])

for trial in range(5):
    x = idx0 + trial
    t0 = time.perf_counter()
    for _ in range(20):
        x = step(x)
    np.asarray(x[:1])
    dt = (time.perf_counter() - t0) / 20
    print(f"trial {trial} dispatch-chain: {dt*1e3:8.3f} ms ({dt*1e9/NQ:6.2f} ns/q)")

for trial in range(5):
    t0 = time.perf_counter()
    y = scan_loop(idx0 + trial, 20)
    np.asarray(y[:1])
    dt = (time.perf_counter() - t0) / 20
    print(f"trial {trial} scan-loop     : {dt*1e3:8.3f} ms ({dt*1e9/NQ:6.2f} ns/q)")
