#!/usr/bin/env python
"""Stamp the routed probe's per-round LOCAL routing work on one chip.

Measures exactly the per-round work every rank does in
parallel/sharded.py::routed_probe EXCEPT the all_to_all and the table
probe (single chip has no mesh): key build, sort, searchsorted segment
boundaries, gather-built send, the slotq response-map scatter, and the
response gather + merge.  Three variants isolate where the time goes:

  full        — the production formulation (gather send + slotq scatter)
  noscatter   — slotq scatter replaced by a same-size gather (LOWER
                BOUND on what removing the last scatter could buy; not
                a correct program, timing only)
  sortonly    — just the key build + sort (the irreducible floor)

Run under `timeout`; every shape compiles the same production ops that
already compile cleanly on the tunnel (PERF.md trap #5: no one-hot
broadcast-reduce anywhere).

Prints one JSON line per (shape, variant).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bonsai_tpu  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp


def make_round(Q: int, ndb: int, cf: float, variant: str):
    cap = max(int(np.ceil(Q / ndb * cf)), 1)
    DUMP = ndb * cap
    U32 = jnp.uint64(0xFFFFFFFF)
    SENT = jnp.uint64(0xFFFFFFFFFFFFFFFF)

    def rnd(kq, owner, pending, back):
        iota = jnp.arange(Q, dtype=jnp.uint64)
        pos = jnp.arange(Q, dtype=jnp.int32)
        key = jnp.where(
            pending,
            (owner.astype(jnp.uint64) << jnp.uint64(32)) | iota,
            SENT,
        )
        skey = jnp.sort(key)
        if variant == "sortonly":
            return skey.sum()
        p_sorted = skey != SENT
        sowner = (skey >> jnp.uint64(32)).astype(jnp.int32)
        sidx = (skey & U32).astype(jnp.int32)
        sowner_u = (skey >> jnp.uint64(32)).astype(jnp.uint32)
        seg = jnp.searchsorted(
            sowner_u, jnp.arange(ndb + 1, dtype=jnp.uint32)
        ).astype(jnp.int32)
        if variant == "segrank":
            rank = pos - seg[jnp.minimum(sowner, ndb - 1)]
        else:
            first = jnp.concatenate(
                [jnp.ones((1,), bool), sowner[1:] != sowner[:-1]]
            )
            run_start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(first, pos, 0)
            )
            rank = pos - run_start
        take = p_sorted & (rank < cap)
        slot = jnp.where(take, sowner * cap + rank, DUMP)
        safe_sidx = jnp.minimum(sidx, Q - 1)
        jdump = jnp.arange(DUMP, dtype=jnp.int32)
        o_j = jdump // cap
        r_j = jdump % cap
        src = seg[o_j] + r_j
        valid_j = src < seg[o_j + 1]
        sorted_kq = kq[safe_sidx]
        send = jnp.where(
            valid_j, sorted_kq[jnp.minimum(src, Q - 1)], jnp.uint64(0)
        )
        if variant == "noscatter":
            # timing stand-in: a Q-sized gather instead of the scatter
            slotq = jnp.minimum(pos, DUMP)
        else:
            slotq = (
                jnp.full((Q,), DUMP, jnp.int32)
                .at[jnp.where(take, sidx, Q)]
                .set(slot, mode="drop")
            )
        back1 = jnp.concatenate([back, jnp.zeros((1,), jnp.uint64)])
        got = back1[slotq]
        newly = slotq < DUMP
        res = jnp.where(newly, got, jnp.uint64(0))
        return send.sum() + res.sum() + newly.sum().astype(jnp.uint64)

    return jax.jit(rnd)


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev)}), flush=True)
    rng = np.random.default_rng(0)
    shapes = [(75776, 4), (75776, 8), (18944, 8)]
    for Q, ndb in shapes:
        kq = jnp.asarray(rng.integers(0, 2**63, Q, dtype=np.uint64))
        owner = jnp.asarray(
            rng.integers(0, ndb, Q, dtype=np.int64).astype(np.int32)
        )
        pending = jnp.asarray(rng.random(Q) < 0.97)
        cap = max(int(np.ceil(Q / ndb * 1.25)), 1)
        back = jnp.asarray(
            rng.integers(0, 2**63, ndb * cap, dtype=np.uint64)
        )
        for variant in ("full", "segrank", "noscatter", "sortonly"):
            fn = make_round(Q, ndb, 1.25, variant)
            out = fn(kq, owner, pending, back)
            out.block_until_ready()
            n = 30
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(kq, owner, pending, back)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / n
            print(
                json.dumps(
                    dict(
                        metric="a2a_route_local",
                        Q=Q,
                        ndb=ndb,
                        variant=variant,
                        ms=round(dt * 1e3, 3),
                        ns_per_query=round(dt * 1e9 / Q, 1),
                    )
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
