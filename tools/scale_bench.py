#!/usr/bin/env python
"""Scale chapter: 100M+-kmer builds, the single-chip gather cliff, and
pod-style sharded classify at sizes BASELINE config 5 calls "10s of GB"
(the reference loads khash images of arbitrary size, util.h:281-372).

Subcommands
-----------
gen [--genomes N] [--mb M]      synthesize a corpus of N random genomes of
                                M Mb each under .bench_cache/scale/
build [--shards S|auto]         host streaming build (checkpointed) of the
                                corpus -> sharded DB dir; prints kmers/s
probe [--sizes 10,20,40,80]     REAL-CHIP probe-step sweep vs table size
                                (millions of keys) — measures the gather
                                cliff the shard-size policy encodes
classify [--ndb K]              virtual-mesh from_sharded_dir classify of
                                synthetic reads against the built DB;
                                checks agreement vs direct table probes

All outputs print one JSON line per measurement (PERF.md rows).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SCALE = os.path.join(REPO, ".bench_cache", "scale")
K = 31


def gen(n_genomes: int, mb: float):
    import bonsai_tpu  # noqa: F401

    os.makedirs(SCALE, exist_ok=True)
    rng = np.random.default_rng(12345)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    paths = []
    t0 = time.time()
    for g in range(n_genomes):
        p = os.path.join(SCALE, f"SYN_{g:04d}.fa")
        paths.append(p)
        if os.path.exists(p):
            continue
        L = int(mb * 1e6)
        seq = bases[rng.integers(0, 4, L)].tobytes()
        with open(p + ".tmp", "wb") as fh:
            fh.write(f">SYN_{g:04d}.1 synthetic\n".encode())
            for i in range(0, L, 80):
                fh.write(seq[i : i + 80] + b"\n")
        os.replace(p + ".tmp", p)
    print(
        json.dumps(
            dict(
                metric="scale_corpus",
                genomes=n_genomes,
                mb_each=mb,
                wall_s=round(time.time() - t0, 1),
            )
        )
    )
    return paths


def _corpus_paths():
    return sorted(
        os.path.join(SCALE, f)
        for f in os.listdir(SCALE)
        if f.startswith("SYN_") and f.endswith(".fa")
    )


def _tree_and_names(paths):
    from bonsai_tpu.taxonomy.tree import TaxTree

    tax = {1: 0, 2: 1}
    name_map = {}
    for i, p in enumerate(paths):
        tax[10 + i] = 2
        name_map[os.path.basename(p)[:-3] + ".1"] = 10 + i
    return TaxTree(tax), name_map


def do_build(shards: str):
    import resource

    from bonsai_tpu.core.spacer import Spacer
    from bonsai_tpu.db.build import lca_map
    from bonsai_tpu.db.formats import (
        Database,
        recommended_shards,
        save_database_sharded,
    )

    paths = _corpus_paths()
    assert paths, "run `gen` first"
    tree, name_map = _tree_and_names(paths)
    ck = os.path.join(SCALE, "build_ckpt.npz")
    t0 = time.time()
    table = lca_map(
        paths, tree, name_map, Spacer(K, K), canonicalize=True,
        checkpoint_path=ck,
    )
    build_s = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    db = Database(table=table, k=K, w=K, gaps=[0] * (K - 1))
    if shards == "auto":
        ndb = recommended_shards(table.n)
    else:
        ndb = int(shards)
    d = os.path.join(SCALE, f"db_shards{ndb}")
    t1 = time.time()
    save_database_sharded(db, d, ndb=ndb)
    save_s = time.time() - t1
    print(
        json.dumps(
            dict(
                metric="scale_build",
                kmers=int(table.n),
                build_s=round(build_s, 1),
                kmers_per_s=round(table.n / build_s, 1),
                shards=ndb,
                save_s=round(save_s, 1),
                peak_rss_gb=round(rss_gb, 2),
                table_slots_mb=round(table.nb * 4 * 8 / 1e6, 1),
                dir=d,
            )
        )
    )
    if os.path.exists(ck):
        os.unlink(ck)


def do_probe(sizes_m):
    """Chained classify-shaped probe throughput vs single-chip table size
    (synthetic keys; honest chained-dispatch discipline per PERF.md)."""
    import jax
    import jax.numpy as jnp

    from bonsai_tpu.db.table import KmerTable, probe_slots_device

    rng = np.random.default_rng(0)
    B, P = 8192, 74  # HiSeq-shaped query volume per step
    Q = B * P
    rows = []
    for m in sizes_m:
        n = int(m * 1e6)
        keys = np.unique(
            rng.integers(0, 1 << 62, size=int(n * 1.02), dtype=np.uint64)
        )[:n]
        vals = rng.integers(1, 7, size=n).astype(np.uint32)
        t = KmerTable(keys, vals)
        slots, uniq, inline = t.device_arrays()
        # ~80% hits, like real reads against their source DB
        qh = keys[rng.integers(0, n, size=int(Q * 0.8))]
        qm = rng.integers(0, 1 << 62, size=Q - qh.size, dtype=np.uint64)
        q = np.concatenate([qh, qm])
        rng.shuffle(q)
        jq = jnp.asarray(q)

        lgnb, vbits = t.lgnb, t.vbits

        @jax.jit
        def step(jq, slots, uniq, salt):
            jq = jq ^ (salt & jnp.uint64(1))  # chain without changing cost
            v, f = probe_slots_device(jq, slots, uniq, inline, lgnb, vbits)
            return v

        out = step(jq, slots, uniq, jnp.uint64(0))
        np.asarray(out[:1])
        for _ in range(15):
            out = step(jq, slots, uniq, out[0])
        np.asarray(out[:1])
        t0 = time.time()
        n_steps = 15
        for _ in range(n_steps):
            out = step(jq, slots, uniq, out[0])
        np.asarray(out[:1])
        dt = time.time() - t0
        ns = dt / n_steps / Q * 1e9
        row = dict(
            metric="scale_probe",
            keys_m=m,
            table_mb=round(t.nb * 4 * 8 / 1e6, 1),
            ns_per_probe=round(ns, 2),
            reads_per_s_equiv=round(B / (dt / n_steps), 1),
            platform=jax.devices()[0].platform,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
        del slots, uniq, jq, out
    return rows


def do_classify(ndb: int):
    """Virtual-mesh pod classify at scale: per-rank lazy shard load +
    a2a routed probe on synthetic reads drawn from the corpus."""
    os.environ["JAX_PLATFORMS"] = "cpu"  # virtual mesh (force: the session
    # env may point at the TPU tunnel)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(ndb,2)}"
        ).strip()
    import bonsai_tpu  # noqa: F401
    import jax

    from bonsai_tpu.classify import output as out_mod
    from bonsai_tpu.io import fastx
    from bonsai_tpu.parallel.mesh import make_mesh
    from bonsai_tpu.parallel.sharded import ShardedClassifier

    paths = _corpus_paths()
    tree, name_map = _tree_and_names(paths)
    d = os.path.join(SCALE, f"db_shards{ndb}")
    assert os.path.exists(d), f"run `build --shards {ndb}` first"
    mesh = make_mesh({"dp": 1, "db": ndb})
    t0 = time.time()
    sc = ShardedClassifier.from_sharded_dir(d, tree, mesh)
    load_s = time.time() - t0
    # reads sampled from genome 0 and genome ndb%len (hits) + random
    rng = np.random.default_rng(1)
    with open(paths[0], "rb") as fh:
        fh.readline()
        g0 = fh.read().replace(b"\n", b"")
    reads = []
    for i in range(512):
        s = int(rng.integers(0, len(g0) - 101))
        reads.append(g0[s : s + 101])
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(128):
        reads.append(bases[rng.integers(0, 4, 101)].tobytes())
    codes = np.full((len(reads), 101), -1, dtype=np.int8)
    for i, r in enumerate(reads):
        codes[i] = sc.lut[np.frombuffer(r, dtype=np.uint8)]
    batch = fastx.ReadBatch(
        names=[f"r{i}".encode() for i in range(len(reads))], seqs=reads,
        codes=codes, lengths=np.full(len(reads), 101, np.int32),
        quals=[None] * len(reads),
    )
    t0 = time.time()
    res = sc._finish_batch(batch, sc._dispatch_batch(batch))
    step_s = time.time() - t0
    taxon = res.taxon
    # genome-0 reads must resolve to taxid 10 (its leaf); random reads
    # against random-DNA genomes can collide only at ~(1 - (1-2^-62)^P)
    ok0 = int((taxon[:512] == 10).sum())
    okr = int((taxon[512:] == 0).sum())
    print(
        json.dumps(
            dict(
                metric="scale_classify",
                ndb=ndb,
                load_s=round(load_s, 1),
                first_batch_s=round(step_s, 1),
                genome_reads_correct=f"{ok0}/512",
                random_reads_unclassified=f"{okr}/128",
            )
        )
    )
    assert ok0 == 512 and okr == 128


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--genomes", type=int, default=22)
    g.add_argument("--mb", type=float, default=5.0)
    b = sub.add_parser("build")
    b.add_argument("--shards", default="auto")
    p = sub.add_parser("probe")
    p.add_argument("--sizes", default="10,20,40,80")
    c = sub.add_parser("classify")
    c.add_argument("--ndb", type=int, default=8)
    args = ap.parse_args()
    if args.cmd == "gen":
        gen(args.genomes, args.mb)
    elif args.cmd == "build":
        do_build(args.shards)
    elif args.cmd == "probe":
        do_probe([float(s) for s in args.sizes.split(",")])
    elif args.cmd == "classify":
        do_classify(args.ndb)


if __name__ == "__main__":
    main()
