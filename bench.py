#!/usr/bin/env python
"""Classification throughput benchmark (driver entry).

Builds (and caches) a k=31 canonical LCA database over the five E. coli
genomes shipped in tests/data/ec/, then measures sustained classification
throughput of the device pipeline (encode -> cuckoo probe -> interval-rank
resolve) on HiSeq-like reads.

Prints ONE JSON line:
  {"metric": "classify_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": N / 1.0e7}

Baseline anchor (BASELINE.md): bonsai ~= 500K reads/s/thread on the authors'
CPU (20x Kraken-1's ~25K), so a 20-thread CPU run ~= 1.0e7 reads/s; the
driver's target is >= 10x that on one TPU chip.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")
# Round-1 used a 1e7 guess for "20-thread CPU bonsai".  Round 2 compiled the
# reference (tools/refbuild) and MEASURED it on this exact workload (the
# 10.4M-key ec k=31 DB, 101bp reads): 111,487 reads/s on 1 thread, 204,644
# on 2 (all this host offers), near-linear scaling.  20-thread baseline =
# 20 x the measured single-thread rate (generous: assumes perfect scaling).
BASELINE_READS_PER_S = 111_487.0 * 20
K = 31


def get_db():
    sys.path.insert(0, REPO)
    import bonsai_tpu  # noqa: F401
    from bonsai_tpu.db.formats import Database, save_database, load_database
    from bonsai_tpu.db.build import lca_map
    from bonsai_tpu.core.spacer import Spacer
    from bonsai_tpu.taxonomy.tree import TaxTree
    from bonsai_tpu.taxonomy.ncbi import accession_from_header
    from bonsai_tpu.io import fastx

    taxonomy = {1: 0, 2: 1, 11: 2, 12: 2, 13: 2, 14: 2, 15: 2}
    tree = TaxTree(taxonomy)
    path = os.path.join(CACHE, f"ec_k{K}.btpu")
    if os.path.exists(path):
        return load_database(path), tree
    os.makedirs(CACHE, exist_ok=True)
    ecdir = os.path.join(REPO, "tests", "data", "ec")
    genomes = sorted(
        os.path.join(ecdir, f) for f in os.listdir(ecdir) if f.endswith(".fna.gz")
    )
    name_map = {}
    for gi, g in enumerate(genomes):
        name_map[accession_from_header(fastx.first_header(g))] = 11 + gi
    t0 = time.time()
    table = lca_map(genomes, tree, name_map, Spacer(K, K), canonicalize=True)
    print(f"# built DB: {len(table)} kmers in {time.time()-t0:.1f}s", file=sys.stderr)
    db = Database(table=table, k=K, w=K, gaps=[0] * (K - 1))
    save_database(db, path)
    return db, tree


def make_reads(db, n_reads, read_len=101, seed=0):
    """HiSeq-like reads sampled from the DB genomes (so probes mostly hit)."""
    from bonsai_tpu.io import fastx
    from bonsai_tpu.core.alphabet import DNA4

    ecdir = os.path.join(REPO, "tests", "data", "ec")
    genomes = sorted(
        os.path.join(ecdir, f) for f in os.listdir(ecdir) if f.endswith(".fna.gz")
    )
    rng = np.random.default_rng(seed)
    contigs = []
    for g in genomes[:2]:
        for _, seq, _ in fastx.read_fastx(g):
            if len(seq) > 100000:
                contigs.append(np.frombuffer(seq, dtype=np.uint8))
    lut = DNA4.lut
    codes = np.empty((n_reads, read_len), dtype=np.int8)
    for i in range(n_reads):
        c = contigs[rng.integers(len(contigs))]
        s = int(rng.integers(0, len(c) - read_len))
        codes[i] = lut[c[s : s + read_len]]
    lengths = np.full(n_reads, read_len, dtype=np.int32)
    return codes, lengths


def main():
    batch = int(os.environ.get("BENCH_BATCH", 8192))
    steps = int(os.environ.get("BENCH_STEPS", 30))
    db, tree = get_db()

    import jax
    import jax.numpy as jnp
    from bonsai_tpu.classify.pipeline import Classifier

    clf = Classifier(db, tree)
    codes, lengths = make_reads(db, batch)
    jc = jnp.asarray(codes)
    jl = jnp.asarray(lengths)
    step = clf._step()
    slots, vals, _ = clf._arrays

    # Measurement discipline for the tunneled chip (tools/calibrate_timing.py):
    # (1) identical repeated dispatches get elided by the remote runtime, so
    #     every step must consume the previous step's output (chained);
    # (2) block_until_ready returns before remote execution completes, so
    #     sync by fetching one element.
    @jax.jit
    def chained(jc, jl, slots, vals, salt):
        # fold the previous step's taxa into the read codes' pad region:
        # a real data dependency with negligible cost.  Both step outputs
        # (compact RLE + full positional matrix) stay live, matching what
        # the CLI pipeline computes per batch.
        jc = jc.at[:, -1].set((salt[: jc.shape[0]] % 4).astype(jc.dtype))
        return step(jc, jl, slots, vals)

    salt = jnp.zeros(batch, dtype=jnp.uint32)
    out = chained(jc, jl, slots, vals, salt)
    np.asarray(out[0].ravel()[:1])  # sync
    # the runtime needs ~20 executions of a fresh executable before hitting
    # steady state; warm up unmeasured (still chained / content-fresh)
    for _ in range(25):
        out = chained(jc, jl, slots, vals, out[0][:, 0])
    np.asarray(out[0].ravel()[:1])
    t0 = time.time()
    for _ in range(steps):
        out = chained(jc, jl, slots, vals, out[0][:, 0])  # taxon column
    np.asarray(out[0].ravel()[:1])  # sync
    dt = time.time() - t0
    reads_per_s = batch * steps / dt
    print(
        f"# {steps} steps x {batch} reads in {dt:.3f}s on "
        f"{jax.devices()[0].platform}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            dict(
                metric="classify_reads_per_s",
                value=round(reads_per_s, 1),
                unit="reads/s",
                vs_baseline=round(reads_per_s / BASELINE_READS_PER_S, 4),
            )
        )
    )


if __name__ == "__main__":
    main()
