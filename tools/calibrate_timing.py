#!/usr/bin/env python
"""Calibrate device timing over the axon tunnel with known-cost ops.

Finding (v1): looping `fn(*args)` with identical args and blocking once at
the end reports > physical caps (320 TFLOP/s matmul, 2.6 TB/s reduce) —
the remote runtime elides repeated identical executions.  So every
iteration must depend on the previous result (chained), which is how
timed_chain below works; numbers then land under the hardware caps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bonsai_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    # over the axon tunnel block_until_ready returns before the remote
    # execution finishes; only an actual device->host fetch synchronizes.
    # Fetch ONE element (the tunnel moves ~55 MB/s; whole-array fetches
    # would swamp the measurement).
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timed_chain(fn, state, *args, n=20):
    """fn(state, *args) -> new state (same shape/dtype). Serial chain."""
    state = fn(state, *args)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state, *args)
    _sync(state)
    return (time.perf_counter() - t0) / n


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    big = jnp.asarray(rng.integers(0, 255, (32 * 1024 * 1024,)), dtype=jnp.float32)

    @jax.jit
    def red(s, x):
        return s + jnp.sum(x + s)

    dt = timed_chain(red, jnp.float32(0), big)
    print(f"reduce 128MB: {dt*1e3:.3f} ms -> {128e6/dt/1e9:.1f} GB/s (cap ~800)", flush=True)

    a = jnp.asarray(rng.standard_normal((4096, 4096)) * 0.01, dtype=jnp.bfloat16)

    @jax.jit
    def mm(a):
        r = jnp.dot(a, a, preferred_element_type=jnp.float32)
        return (r / (1 + jnp.abs(r).max())).astype(jnp.bfloat16)

    dt = timed_chain(lambda s, _: mm(s), a, 0)
    fl = 2 * 4096**3
    print(f"matmul 4096^3 bf16: {dt*1e3:.3f} ms -> {fl/dt/1e12:.1f} TFLOP/s (cap ~197)", flush=True)

    NB, NQ = 1 << 21, 1 << 19
    tbl = jnp.asarray(rng.integers(0, 1 << 31, (NB, 16)), dtype=jnp.uint32)
    idx0 = jnp.asarray(rng.integers(0, NB, NQ), dtype=jnp.uint32)

    @jax.jit
    def gat(idx, t):
        rows = t[(idx % NB).astype(jnp.int32)]
        # fold rows back into new indices: serial dependency, same shape
        return idx + rows.sum(axis=-1, dtype=jnp.uint32)

    dt = timed_chain(gat, idx0, tbl)
    print(f"row gather 512k x 64B rows: {dt*1e3:.3f} ms -> {NQ*64/dt/1e9:.1f} GB/s useful", flush=True)

    # 128B rows
    tbl2 = jnp.asarray(rng.integers(0, 1 << 31, (NB, 32)), dtype=jnp.uint32)

    @jax.jit
    def gat2(idx, t):
        rows = t[(idx % NB).astype(jnp.int32)]
        return idx + rows.sum(axis=-1, dtype=jnp.uint32)

    dt = timed_chain(gat2, idx0, tbl2)
    print(f"row gather 512k x 128B rows: {dt*1e3:.3f} ms -> {NQ*128/dt/1e9:.1f} GB/s useful", flush=True)

    # single-element gather
    flat = tbl.reshape(-1)

    @jax.jit
    def gat1(idx, t):
        v = t[(idx % (NB * 16)).astype(jnp.int32)]
        return idx + v

    dt = timed_chain(gat1, idx0, flat)
    print(f"elem gather 512k x 4B: {dt*1e3:.3f} ms -> {NQ*4/dt/1e9:.1f} GB/s useful", flush=True)


if __name__ == "__main__":
    main()
