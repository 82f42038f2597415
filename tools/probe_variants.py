#!/usr/bin/env python
"""End-to-end pipeline timing for probe-layout variants, all on the real
bench DB with the dispatch-chain methodology (min of 3 runs of 20 steps).

Variants:
  v0: current (u64 slots (nb,4), 2 row gathers + small val gather)
  v1: u32-plane slots (nb,8) u32, same algorithm
  b1only-u64 / b1only-u32: first-bucket-only (INCORRECT — ceiling)
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def time_step(name, step, jc, jl, salt0, steps=20, batch=8192):
    out = step(jc, jl, salt0)
    np.asarray(out[0][:1])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        o = out
        for i in range(steps):
            o = step(jc, jl, o[3])
        np.asarray(o[0][:1])
        best = min(best, (time.time() - t0) / steps)
        out = o
    print(f"{name:16s}: {best*1e3:8.2f} ms/step  {batch/best:12,.0f} reads/s")
    return best


def main():
    import jax
    import jax.numpy as jnp
    import bonsai_tpu  # noqa: F401
    from bonsai_tpu.classify.pipeline import Classifier
    from bonsai_tpu.classify.resolve import resolve_batch
    from bonsai_tpu.core import hashes

    batch = 8192
    db, tree = bench.get_db()
    clf = Classifier(db, tree)
    codes, lengths = bench.make_reads(batch)
    table = db.table
    enc = clf.enc
    tax = clf._tax
    slots, vals, inline = clf._arrays
    jc = jnp.asarray(codes)
    jl = jnp.asarray(lengths)

    # u32-plane layout: (nb, SLOTS, 2) -> (nb, 2*SLOTS) u32 [lo0 hi0 lo1 hi1..]
    slots_np = np.asarray(slots)
    lo = (slots_np & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (slots_np >> np.uint64(32)).astype(np.uint32)
    inter = np.empty((slots_np.shape[0], slots_np.shape[1] * 2), dtype=np.uint32)
    inter[:, 0::2] = lo
    inter[:, 1::2] = hi
    slots32 = jnp.asarray(inter)

    SLOTS = slots_np.shape[1]

    def tail(kmers, valid, packed, found):
        cidx = (packed & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)
        hit = valid & found
        cidx = jnp.where(hit, cidx, 0)
        taxon_c = resolve_batch(cidx, hit, tax)
        taxon = tax["tax_ids"][taxon_c]
        return (taxon, None, None, jnp.sum(hit, -1).astype(jnp.int32))

    def probe_u32(kmers, slots32, n_buckets=2):
        h = hashes.splitmix64(kmers)
        b1, q, b2 = table._split(h, table.lgnb, xp=jnp)
        e1, e2, vmask = table._expected(q, jnp)
        found = jnp.zeros(kmers.shape, dtype=bool)
        sel = jnp.zeros(kmers.shape, dtype=jnp.uint32)
        pairs = ((b1, e1), (b2, e2))[:n_buckets]
        vmask32 = jnp.uint32(vmask)
        for b, e in pairs:
            row = slots32[b.astype(jnp.int32)]  # (..., 2*SLOTS) u32
            rlo = row[..., 0::2]
            rhi = row[..., 1::2]
            elo = (e & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            ehi = (e >> jnp.uint64(32)).astype(jnp.uint32)
            m = ((rlo & ~vmask32) == elo[..., None]) & (rhi == ehi[..., None])
            hitb = jnp.any(m, axis=-1)
            s = jnp.sum(jnp.where(m, rlo & vmask32, 0), -1)
            sel = jnp.where(hitb & ~found, s, sel)
            found = found | hitb
        val = vals.reshape(-1)[sel.astype(jnp.int32)]
        return jnp.where(found, val, 0), found

    @jax.jit
    def v0(jc, jl, slots, vals, salt):
        jc = jc.at[:, -1].set((salt[: jc.shape[0]] % 4).astype(jc.dtype))
        em = enc.emissions(jc, jl)
        packed, found = table.probe_device(em.values, arrays=(slots, vals, inline))
        return tail(em.values, em.mask, packed, found)

    @jax.jit
    def v1(jc, jl, slots32, vals, salt):
        jc = jc.at[:, -1].set((salt[: jc.shape[0]] % 4).astype(jc.dtype))
        em = enc.emissions(jc, jl)
        packed, found = probe_u32(em.values, slots32)
        return tail(em.values, em.mask, packed, found)

    def mk_b1only_u64():
        @jax.jit
        def f(jc, jl, slots, vals, salt):
            jc = jc.at[:, -1].set((salt[: jc.shape[0]] % 4).astype(jc.dtype))
            em = enc.emissions(jc, jl)
            kmers = em.values
            h = hashes.splitmix64(kmers)
            b1, q, _ = table._split(h, table.lgnb, xp=jnp)
            e1, _, vmask = table._expected(q, jnp)
            row = slots[b1.astype(jnp.int32)]
            m = (row & ~vmask) == e1[..., None]
            found = jnp.any(m, axis=-1)
            s = jnp.sum(jnp.where(m, (row & vmask).astype(jnp.uint32), 0), -1)
            packed = vals.reshape(-1)[s.astype(jnp.int32)]
            return tail(kmers, em.mask, packed, found)

        return f

    @jax.jit
    def b1only_u32(jc, jl, slots32, vals, salt):
        jc = jc.at[:, -1].set((salt[: jc.shape[0]] % 4).astype(jc.dtype))
        em = enc.emissions(jc, jl)
        packed, found = probe_u32(em.values, slots32, n_buckets=1)
        return tail(em.values, em.mask, packed, found)

    import functools

    def wrap(f, *state):
        def g(jc, jl, salt):
            return f(jc, jl, *state, salt)

        return g

    # hot/cold split shape: big b1 gather + 4MB + 64KB synthetic row gathers
    import jax.random as jr
    o1 = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 62, size=(1 << 16, 8), dtype=np.uint64)
    )  # 4MB
    o2 = jnp.asarray(
        np.random.default_rng(1).integers(0, 1 << 62, size=(1 << 10, 8), dtype=np.uint64)
    )  # 64KB

    @jax.jit
    def split3(jc, jl, slots, vals, salt):
        jc = jc.at[:, -1].set((salt[: jc.shape[0]] % 4).astype(jc.dtype))
        em = enc.emissions(jc, jl)
        kmers = em.values
        h = hashes.splitmix64(kmers)
        b1, q, _ = table._split(h, table.lgnb, xp=jnp)
        e1, _, vmask = table._expected(q, jnp)
        row = slots[b1.astype(jnp.int32)]
        m = (row & ~vmask) == e1[..., None]
        found = jnp.any(m, axis=-1)
        s = jnp.sum(jnp.where(m, (row & vmask).astype(jnp.uint32), 0), -1)
        # overflow level 1: 4MB
        ro1 = o1[(h & jnp.uint64((1 << 16) - 1)).astype(jnp.int32)]
        m1 = (ro1 & ~vmask) == e1[..., None]
        f1 = jnp.any(m1, axis=-1)
        s1 = jnp.sum(jnp.where(m1, (ro1 & vmask).astype(jnp.uint32), 0), -1)
        # overflow level 2: 64KB
        ro2 = o2[(h & jnp.uint64((1 << 10) - 1)).astype(jnp.int32)]
        m2 = (ro2 & ~vmask) == e1[..., None]
        f2 = jnp.any(m2, axis=-1)
        s2 = jnp.sum(jnp.where(m2, (ro2 & vmask).astype(jnp.uint32), 0), -1)
        found = found | f1 | f2
        s = s | s1 | s2
        packed = vals.reshape(-1)[s.astype(jnp.int32)]
        return tail(kmers, em.mask, packed, found)

    @jax.jit
    def split2_cuckoo(jc, jl, slots, vals, salt):
        jc = jc.at[:, -1].set((salt[: jc.shape[0]] % 4).astype(jc.dtype))
        em = enc.emissions(jc, jl)
        kmers = em.values
        h = hashes.splitmix64(kmers)
        b1, q, b2 = table._split(h, table.lgnb, xp=jnp)
        e1, e2, vmask = table._expected(q, jnp)
        row = slots[b1.astype(jnp.int32)]
        m = (row & ~vmask) == e1[..., None]
        found = jnp.any(m, axis=-1)
        s = jnp.sum(jnp.where(m, (row & vmask).astype(jnp.uint32), 0), -1)
        # small 2-choice cuckoo overflow: two 4MB gathers
        ro1 = o1[(h & jnp.uint64((1 << 16) - 1)).astype(jnp.int32)]
        m1 = (ro1 & ~vmask) == e1[..., None]
        f1 = jnp.any(m1, axis=-1)
        s1 = jnp.sum(jnp.where(m1, (ro1 & vmask).astype(jnp.uint32), 0), -1)
        ro2 = o1[((h >> jnp.uint64(20)) & jnp.uint64((1 << 16) - 1)).astype(jnp.int32)]
        m2 = (ro2 & ~vmask) == e2[..., None]
        f2 = jnp.any(m2, axis=-1)
        s2 = jnp.sum(jnp.where(m2, (ro2 & vmask).astype(jnp.uint32), 0), -1)
        found = found | f1 | f2
        s = s | s1 | s2
        packed = vals.reshape(-1)[s.astype(jnp.int32)]
        return tail(kmers, em.mask, packed, found)

    G = 4
    NQ = jc.shape[0] * (int(jc.shape[1]) - db.k + 1)
    NG = NQ // G
    PADG = NG // 8

    @jax.jit
    def grouped(jc, jl, slots, vals, salt):
        jc = jc.at[:, -1].set((salt[: jc.shape[0]] % 4).astype(jc.dtype))
        em = enc.emissions(jc, jl)
        kmers, valid = em.values, em.mask
        B, P = kmers.shape
        h = hashes.splitmix64(kmers)
        b1, q, b2 = table._split(h, table.lgnb, xp=jnp)
        e1, e2, vmask = table._expected(q, jnp)
        row = slots[b1.astype(jnp.int32)]
        m = (row & ~vmask) == e1[..., None]
        found1 = jnp.any(m, axis=-1)
        s1 = jnp.sum(jnp.where(m, (row & vmask).astype(jnp.uint32), 0), -1)
        # synthetic unresolved at ~1.6% for timing purposes
        unresolved = (valid & ((h & jnp.uint64(63)) == 0)).reshape(-1)
        npad = NG * G - unresolved.shape[0]
        ur = jnp.pad(unresolved, (0, npad)).reshape(NG, G)
        gd = jnp.any(ur, axis=-1)
        order = jnp.argsort(~gd).astype(jnp.int32)
        gids = order[:PADG]
        b2f = jnp.pad(b2.reshape(-1).astype(jnp.int32), (0, npad)).reshape(NG, G)
        e2f = jnp.pad(e2.reshape(-1), (0, npad)).reshape(NG, G)
        b2g = b2f[gids]
        e2g = e2f[gids]
        rows2 = slots[b2g]
        m2 = (rows2 & ~vmask) == e2g[..., None]
        f2g = jnp.any(m2, axis=-1)
        s2g = jnp.sum(jnp.where(m2, (rows2 & vmask).astype(jnp.uint32), 0), -1)
        found2 = jnp.zeros((NG, G), bool).at[gids].set(f2g)
        sel2 = jnp.zeros((NG, G), jnp.uint32).at[gids].set(s2g)
        found2 = found2.reshape(-1)[: B * P].reshape(B, P)
        sel2 = sel2.reshape(-1)[: B * P].reshape(B, P)
        found = found1 | found2
        s = jnp.where(found1, s1, sel2)
        packed = vals.reshape(-1)[s.astype(jnp.int32)]
        return tail(kmers, valid, packed, found)

    @jax.jit
    def concat2(jc, jl, slots, vals, salt):
        jc = jc.at[:, -1].set((salt[: jc.shape[0]] % 4).astype(jc.dtype))
        em = enc.emissions(jc, jl)
        kmers, valid = em.values, em.mask
        h = hashes.splitmix64(kmers)
        b1, q, b2 = table._split(h, table.lgnb, xp=jnp)
        e1, e2, vmask = table._expected(q, jnp)
        bb = jnp.stack([b1.astype(jnp.int32), b2.astype(jnp.int32)], axis=0)
        rows = slots[bb]  # ONE gather op, (2, B, P, SLOTS)
        ee = jnp.stack([e1, e2], axis=0)
        m = (rows & ~vmask) == ee[..., None]
        hitb = jnp.any(m, axis=-1)  # (2, B, P)
        sv = jnp.sum(jnp.where(m, (rows & vmask).astype(jnp.uint32), 0), -1)
        found = hitb[0] | hitb[1]
        s = jnp.where(hitb[0], sv[0], sv[1])
        packed = vals.reshape(-1)[s.astype(jnp.int32)]
        return tail(kmers, valid, packed, found)

    @jax.jit
    def four_small_gathers(jc, jl, slots, vals, salt):
        # 4 gather ops of ~290k rows each (same total rows as v0):
        # tests whether per-op fixed cost dominates
        jc = jc.at[:, -1].set((salt[: jc.shape[0]] % 4).astype(jc.dtype))
        em = enc.emissions(jc, jl)
        kmers, valid = em.values, em.mask
        B, P = kmers.shape
        h = hashes.splitmix64(kmers)
        b1, q, b2 = table._split(h, table.lgnb, xp=jnp)
        e1, e2, vmask = table._expected(q, jnp)
        half = B // 2
        parts = []
        for b, e in ((b1, e1), (b2, e2)):
            for sl in (slice(0, half), slice(half, B)):
                rows = slots[b[sl].astype(jnp.int32)]
                m = (rows & ~vmask) == e[sl][..., None]
                hitb = jnp.any(m, -1)
                sv = jnp.sum(jnp.where(m, (rows & vmask).astype(jnp.uint32), 0), -1)
                parts.append((hitb, sv))
        f1 = jnp.concatenate([parts[0][0], parts[1][0]], 0)
        f2 = jnp.concatenate([parts[2][0], parts[3][0]], 0)
        s1 = jnp.concatenate([parts[0][1], parts[1][1]], 0)
        s2 = jnp.concatenate([parts[2][1], parts[3][1]], 0)
        found = f1 | f2
        s = jnp.where(f1, s1, s2)
        packed = vals.reshape(-1)[s.astype(jnp.int32)]
        return tail(kmers, valid, packed, found)

    salt0 = jnp.zeros(batch, dtype=jnp.int32)
    time_step("concat2 1-op", wrap(concat2, slots, vals), jc, jl, salt0)
    time_step("4x half gathers", wrap(four_small_gathers, slots, vals), jc, jl, salt0)
    time_step("grouped-b2 g=4", wrap(grouped, slots, vals), jc, jl, salt0)
    time_step("v0 u64 dual", wrap(v0, slots, vals), jc, jl, salt0)
    time_step("split3 big+4M+64K", wrap(split3, slots, vals), jc, jl, salt0)
    time_step("split2c big+2x4M", wrap(split2_cuckoo, slots, vals), jc, jl, salt0)
    time_step("v1 u32 dual", wrap(v1, slots32, vals), jc, jl, salt0)
    time_step("b1only u64", wrap(mk_b1only_u64(), slots, vals), jc, jl, salt0)
    time_step("b1only u32", wrap(b1only_u32, slots32, vals), jc, jl, salt0)


if __name__ == "__main__":
    main()
