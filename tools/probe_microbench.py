#!/usr/bin/env python
"""Microbenchmark: candidate DB-probe formulations on the real TPU chip.

The classify profile showed the khash-replacement probe dominates
(2 x 31ms/batch; ~3.6GB/s effective on the XLA row-gather).  This measures
alternatives so the table layout is chosen on evidence:

  A  row-gather, 2-choice cuckoo, separate key/val arrays   (status quo)
  B  row-gather, keys+vals interleaved (one gather/bucket)
  C  row-gather, single-choice 16-lane buckets (one gather total)
  D  flat element gather (scalar lanes)
  E  u32 vs u64 row dtype
  F  Pallas DMA-pipelined gather
  G  sorted searchsorted

Run: python tools/probe_microbench.py  (needs the axon TPU; ~2 min)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bonsai_tpu  # noqa: F401  (jax config)
import jax
import jax.numpy as jnp
import numpy as np

NB = 1 << 21  # buckets (matches the 7.6M-kmer ec DB)
NQ = 1 << 19  # queries per batch (~287k in the real pipeline)


def timeit(fn, *args, n=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def report(name, dt, bytes_useful):
    print(f"{name:48s} {dt*1e3:8.3f} ms   {bytes_useful/dt/1e9:8.2f} GB/s useful")


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.integers(0, NB, NQ), dtype=jnp.int32)
    b2 = jnp.asarray(rng.integers(0, NB, NQ), dtype=jnp.int32)
    q64 = jnp.asarray(rng.integers(0, 1 << 63, NQ), dtype=jnp.uint64)

    # A: two-choice, separate arrays, u64 rows of 8
    tk = jnp.asarray(rng.integers(0, 1 << 63, (NB, 8)), dtype=jnp.uint64)
    tv = jnp.asarray(rng.integers(0, 1 << 63, (NB, 8)), dtype=jnp.uint64)

    @jax.jit
    def probeA(b1, b2, q, tk, tv):
        out = jnp.zeros(q.shape, jnp.uint64)
        found = jnp.zeros(q.shape, bool)
        for bb in (b1, b2):
            eq = tk[bb] == q[:, None]
            hit = eq.any(-1)
            v = jnp.sum(jnp.where(eq, tv[bb], 0), -1)
            out = jnp.where(hit & ~found, v, out)
            found |= hit
        return out, found

    dt = timeit(probeA, b, b2, q64, tk, tv)
    report("A 2-choice 8-lane u64 key+val rows (4 gathers)", dt, NQ * 4 * 64)

    # B: interleaved kv rows (16 u64 lanes), 2 gathers
    tkv = jnp.concatenate([tk, tv], axis=1)

    @jax.jit
    def probeB(b1, b2, q, tkv):
        out = jnp.zeros(q.shape, jnp.uint64)
        found = jnp.zeros(q.shape, bool)
        for bb in (b1, b2):
            row = tkv[bb]
            eq = row[:, :8] == q[:, None]
            hit = eq.any(-1)
            v = jnp.sum(jnp.where(eq, row[:, 8:], 0), -1)
            out = jnp.where(hit & ~found, v, out)
            found |= hit
        return out, found

    dt = timeit(probeB, b, b2, q64, tkv)
    report("B 2-choice interleaved 16-lane u64 (2 gathers)", dt, NQ * 2 * 128)

    # C: single-choice 32-lane u64 rows (16 keys + 16 vals), 1 gather
    tkv32 = jnp.asarray(rng.integers(0, 1 << 63, (NB, 32)), dtype=jnp.uint64)

    @jax.jit
    def probeC(b1, q, tkv32):
        row = tkv32[b1]
        eq = row[:, :16] == q[:, None]
        hit = eq.any(-1)
        v = jnp.sum(jnp.where(eq, row[:, 16:], 0), -1)
        return v, hit

    dt = timeit(probeC, b, q64, tkv32)
    report("C 1-choice 32-lane u64 row (1 gather)", dt, NQ * 256)

    # E: u32 rows — does dtype matter? 2-choice, 32 u32 lanes/row
    tkv_u32 = jnp.asarray(rng.integers(0, 1 << 32, (NB, 32)), dtype=jnp.uint32)

    @jax.jit
    def probeE(b1, b2, q, tkv_u32):
        q32 = q.astype(jnp.uint32)
        acc = jnp.zeros(q.shape, jnp.uint32)
        for bb in (b1, b2):
            row = tkv_u32[bb]
            acc = acc ^ jnp.sum(jnp.where(row[:, :16] == q32[:, None], row[:, 16:], 0), -1)
        return acc

    dt = timeit(probeE, b, b2, q64, tkv_u32)
    report("E 2-choice 32-lane u32 rows (2 gathers)", dt, NQ * 2 * 128)

    # D: flat element gather, 2 probes
    flatk = tk.reshape(-1)

    @jax.jit
    def probeD(b1, b2, q, flatk):
        i1 = (b1.astype(jnp.uint32) * 8) | (q % 8).astype(jnp.uint32)
        return flatk[i1]

    dt = timeit(probeD, b, b2, q64, flatk)
    report("D flat single-element u64 gather (1 gather)", dt, NQ * 8)

    # G: searchsorted over sorted keys
    keys_sorted = jnp.sort(jnp.asarray(rng.integers(0, 1 << 63, 7_600_000), dtype=jnp.uint64))

    @jax.jit
    def probeG(q, keys_sorted):
        return jnp.searchsorted(keys_sorted, q)

    dt = timeit(probeG, q64, keys_sorted)
    report("G searchsorted 7.6M sorted u64", dt, NQ * 8)

    # F: Pallas DMA gather — per-query row DMA, ring of in-flight copies
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES = 32  # u32 lanes per row = 128B
    tbl = jnp.asarray(rng.integers(0, 1 << 31, (NB, LANES)), dtype=jnp.uint32)
    QBLK = 2048
    NSLOT = 16

    def gather_kernel(idx_ref, tbl_ref, out_ref):
        def body(scratch, sems):
            def start(i):
                pltpu.make_async_copy(
                    tbl_ref.at[idx_ref[i]], scratch.at[i % NSLOT], sems.at[i % NSLOT]
                ).start()

            for i in range(NSLOT):
                start(i)

            def loop(i, _):
                pltpu.make_async_copy(
                    tbl_ref.at[idx_ref[i]], scratch.at[i % NSLOT], sems.at[i % NSLOT]
                ).wait()
                out_ref[i, :] = scratch[i % NSLOT, :]

                @pl.when(i + NSLOT < QBLK)
                def _():
                    start(i + NSLOT)

                return 0

            jax.lax.fori_loop(0, QBLK, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((NSLOT, LANES), jnp.uint32),
            sems=pltpu.SemaphoreType.DMA((NSLOT,)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NQ // QBLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((QBLK, LANES), lambda i, idx: (i, 0), memory_space=pltpu.VMEM),
    )

    # NOTE: idx_ref is the scalar-prefetch arg and is indexed per block via
    # program_id inside the kernel; easier: pass per-block slice via index map
    def gather_kernel2(idx_ref, tbl_ref, out_ref):
        blk = pl.program_id(0)
        base = blk * QBLK

        def body(scratch, sems):
            def start(i):
                pltpu.make_async_copy(
                    tbl_ref.at[idx_ref[base + i]], scratch.at[i % NSLOT], sems.at[i % NSLOT]
                ).start()

            for i in range(NSLOT):
                start(i)

            def loop(i, _):
                pltpu.make_async_copy(
                    tbl_ref.at[idx_ref[base + i]], scratch.at[i % NSLOT], sems.at[i % NSLOT]
                ).wait()
                out_ref[i, :] = scratch[i % NSLOT, :]

                @pl.when(i + NSLOT < QBLK)
                def _():
                    start(i + NSLOT)

                return 0

            jax.lax.fori_loop(0, QBLK, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((NSLOT, LANES), jnp.uint32),
            sems=pltpu.SemaphoreType.DMA((NSLOT,)),
        )

    @jax.jit
    def probeF(idx):
        return pl.pallas_call(
            gather_kernel2,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NQ, LANES), jnp.uint32),
        )(idx, tbl)

    try:
        dt = timeit(probeF, b)
        report(f"F pallas DMA gather {LANES}-lane u32 rows", dt, NQ * 128)
    except Exception as e:
        print(f"F pallas DMA gather FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
