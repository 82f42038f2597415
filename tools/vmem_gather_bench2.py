#!/usr/bin/env python
"""Find the 2D gather formulation Mosaic accepts, and measure it."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# x64 off: jnp indexing promotes indices to int64 under x64, Mosaic rejects i64


def timeit(fn, x, iters=20):
    y = fn(x)
    np.asarray(y.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    np.asarray(x.ravel()[:1])
    return (time.perf_counter() - t0) / iters


def try_kernel(name, build):
    try:
        fn, x, nq = build()
        dt = timeit(fn, x)
        print(f"{name}: {dt*1e9/nq:.2f} ns/query ({dt*1e3:.3f} ms total)")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAILED {type(e).__name__}: {msg}")


def pcall(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


# same-shape take_along_axis on axis 0: idx shape == tab shape
def build_same_shape_ax0():
    R, C = 1024, 128  # 512KB table
    tab = jnp.arange(R * C, dtype=jnp.uint32).reshape(R, C)

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def fn(idx):
        out = pcall(kernel, jax.ShapeDtypeStruct((R, C), jnp.uint32), tab, idx)
        return (idx ^ out.astype(jnp.int32)) & (R - 1)

    idx = (jnp.arange(R * C, dtype=jnp.int32) % R).reshape(R, C)
    return fn, idx, R * C


# same-shape take_along_axis on axis 1 (within-lane... within row)
def build_same_shape_ax1():
    R, C = 1024, 128
    tab = jnp.arange(R * C, dtype=jnp.uint32).reshape(R, C)

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    @jax.jit
    def fn(idx):
        out = pcall(kernel, jax.ShapeDtypeStruct((R, C), jnp.uint32), tab, idx)
        return (idx ^ out.astype(jnp.int32)) & (C - 1)

    idx = (jnp.arange(R * C, dtype=jnp.int32) % C).reshape(R, C)
    return fn, idx, R * C


# different row counts: idx (Q, 128) into tab (R, 128), axis 0
def build_diff_rows():
    R, C, Q = 8192, 128, 4096
    tab = jnp.arange(R * C, dtype=jnp.uint32).reshape(R, C)

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def fn(idx):
        out = pcall(kernel, jax.ShapeDtypeStruct((Q, C), jnp.uint32), tab, idx)
        return (idx ^ out.astype(jnp.int32)) & (R - 1)

    idx = (jnp.arange(Q * C, dtype=jnp.int32) % R).reshape(Q, C)
    return fn, idx, Q * C


# big same-shape: 4MB table (8192, 128)
def build_big_same():
    R, C = 8192, 128  # 4MB
    tab = jnp.arange(R * C, dtype=jnp.uint32).reshape(R, C)

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def fn(idx):
        out = pcall(kernel, jax.ShapeDtypeStruct((R, C), jnp.uint32), tab, idx)
        return (idx ^ out.astype(jnp.int32)) & (R - 1)

    idx = (jnp.arange(R * C, dtype=jnp.int32) * 7 % R).reshape(R, C)
    return fn, idx, R * C


# XLA lax.gather equivalent outside pallas on same shapes for comparison
def build_xla_same():
    R, C = 8192, 128
    tab = jnp.arange(R * C, dtype=jnp.uint32).reshape(R, C)

    @jax.jit
    def fn(idx):
        out = jnp.take_along_axis(tab, idx, axis=0)
        return (idx ^ out.astype(jnp.int32)) & (R - 1)

    idx = (jnp.arange(R * C, dtype=jnp.int32) * 7 % R).reshape(R, C)
    return fn, idx, R * C


if __name__ == "__main__":
    try_kernel("same-shape axis0 512KB", build_same_shape_ax0)
    try_kernel("same-shape axis1 512KB", build_same_shape_ax1)
    try_kernel("diff-rows axis0", build_diff_rows)
    try_kernel("same-shape axis0 4MB", build_big_same)
    try_kernel("XLA take_along_axis 4MB", build_xla_same)
