#!/usr/bin/env python
"""True multi-process jax.distributed smoke: 2 OS processes, CPU backend.

Each process owns 2 local CPU devices; jax.distributed joins them into a
4-device global runtime, a dp=2 x db=2 mesh spans BOTH processes, and the
sharded classifier (all_to_all routed probe) runs one step whose output
must equal the single-device classifier computed locally.  This executes
the actual multi-host code path (init_distributed, cross-process
make_array_from_callback, collectives over the distributed runtime) that
dryrun_multichip's in-process mesh cannot reach (VERDICT r2 #6).

Run directly (spawns both workers):   python tools/dist_smoke.py
Worker mode (used internally):        python tools/dist_smoke.py --worker I P ADDR
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOCAL_DEVICES = 2
NPROC = 2


def _problem():
    import numpy as np

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import bonsai_tpu  # noqa: F401
    from bonsai_tpu.core.alphabet import DNA4
    from bonsai_tpu.core import encode as enc_mod, bitops
    from bonsai_tpu.db.table import KmerTable
    from bonsai_tpu.db.formats import Database
    from bonsai_tpu.taxonomy.tree import TaxTree

    rng = np.random.default_rng(42)
    K = 17
    bases = np.array(list(b"ACGT"), dtype=np.uint8)
    reads = [bases[rng.integers(0, 4, 120)].tobytes() for _ in range(32)]
    lut = DNA4.lut
    codes = np.stack(
        [lut[np.frombuffer(r, dtype=np.uint8)] for r in reads]
    ).astype(np.int8)
    lengths = np.full(len(reads), 120, dtype=np.int32)
    km, inv = enc_mod.pack_kmers(codes, K)
    pool = np.unique(bitops.canonical(km[~inv], K))
    keys = pool[rng.random(len(pool)) < 0.6]
    taxa = rng.choice([2, 11, 12, 13], size=len(keys)).astype(np.uint32)
    tree = TaxTree({1: 0, 2: 1, 11: 2, 12: 2, 13: 2})
    db = Database(table=KmerTable(keys, taxa), k=K, w=K, gaps=[0] * (K - 1))
    return db, tree, codes, lengths


def worker(pid: int, nproc: int, addr: str) -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bonsai_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coordinator=addr, num_processes=nproc, process_id=pid)
    import numpy as np

    devs = jax.devices()
    assert len(devs) == nproc * LOCAL_DEVICES, devs
    assert jax.process_count() == nproc

    db, tree, codes, lengths = _problem()
    # reference result computed fully locally (single-device classifier)
    from bonsai_tpu.classify.pipeline import Classifier
    import bonsai_tpu.io.fastx as fastx

    single = Classifier(db, tree)
    batch = fastx.ReadBatch(
        names=[b""] * len(lengths), seqs=[], codes=codes, lengths=lengths,
        quals=None,
    )
    ref = single.classify_batch(batch, full=True)

    from bonsai_tpu.parallel.sharded import ShardedClassifier

    mesh = make_mesh({"dp": 2, "db": 2})
    procs = sorted({d.process_index for d in mesh.devices.flat})
    assert procs == list(range(nproc)), "mesh must span both processes"
    sc = ShardedClassifier(db, tree, mesh, route="a2a")
    out = sc.step(codes, lengths)
    from jax.experimental import multihost_utils

    taxon, _, hit, n_missing, _, _ = [
        np.asarray(multihost_utils.process_allgather(o, tiled=True))
        for o in out
    ]
    np.testing.assert_array_equal(taxon, ref.taxon)
    np.testing.assert_array_equal(hit, ref.hit_mask)
    np.testing.assert_array_equal(n_missing, ref.n_missing)
    print(
        f"[proc {pid}] ok: dp=2 x db=2 a2a across {nproc} processes == "
        f"single-device ({int((taxon != 0).sum())}/{len(taxon)} classified)",
        flush=True,
    )

    # phase 2 — the pod DB-loading property: from a sharded on-disk DB,
    # THIS process must read only the shard files of its addressable
    # 'db' ranks (DB load I/O scales 1/ndb per host).  Both processes
    # write identical sharded dirs (deterministic build) privately.
    import tempfile

    from bonsai_tpu.db import formats as fmts
    from bonsai_tpu.db.formats import save_database_sharded

    tmp = tempfile.mkdtemp()
    save_database_sharded(db, tmp, ndb=2)
    loaded = []
    real_read = fmts.read_database_arrays

    def counting_read(path):
        loaded.append(os.path.basename(path))
        return real_read(path)

    # db-MAJOR mesh: each process's devices sit in one 'db' row, so a
    # host holds (and loads) exactly its own table shards — the pod
    # deployment layout
    mesh2 = make_mesh({"db": 2, "dp": 2})
    fmts.read_database_arrays = counting_read
    try:
        sc2 = ShardedClassifier.from_sharded_dir(tmp, tree, mesh2)
    finally:
        fmts.read_database_arrays = real_read
    dev_grid = mesh2.devices
    db_axis = mesh2.axis_names.index("db")
    my_ranks = sorted(
        {
            idx[db_axis]
            for idx in np.ndindex(dev_grid.shape)
            if dev_grid[idx].process_index == jax.process_index()
        }
    )
    want = {f"shard-{r:05d}.btpu" for r in my_ranks}
    assert set(loaded) == want, (loaded, want)
    out2 = sc2.step(codes, lengths)
    taxon2 = np.asarray(
        multihost_utils.process_allgather(out2[0], tiled=True)
    )
    np.testing.assert_array_equal(taxon2, ref.taxon)
    print(
        f"[proc {pid}] ok: lazy shard-dir load touched only local ranks "
        f"{sorted(my_ranks)} ({sorted(loaded)}); output exact",
        flush=True,
    )

    # phase 3 — per-rank classify I/O: the full file pipeline with
    # PER-PROCESS output files (each process fetches/formats only its
    # devices' rows; no host gather), merged back to the single-process
    # byte stream and diffed.  DIST_SMOKE_DIR is one shared directory
    # created by the launcher (both workers run on this machine — on a
    # real pod each host writes to its own storage and the merge runs
    # wherever all parts land).
    import io
    import time

    from bonsai_tpu.parallel.sharded import merge_distributed_output
    import jax.experimental.multihost_utils as mhu

    share = os.environ["DIST_SMOKE_DIR"]
    fa = os.path.join(share, "reads.fa")
    if pid == 0:
        rng2 = np.random.default_rng(7)
        bases2 = np.array(list(b"ACGT"), dtype=np.uint8)
        with open(fa + ".tmp", "w") as fh:
            for i in range(400):
                s = bases2[rng2.integers(0, 4, 120)].tobytes().decode()
                fh.write(f">q{i}\n{s}\n")
        os.replace(fa + ".tmp", fa)
    mhu.sync_global_devices("reads-written")
    scd = ShardedClassifier(db, tree, mesh, route="a2a", emit_all=True)
    outdir = os.path.join(share, "parts")
    t0 = time.time()
    # batch_size >= the 256-row pow2 bucket so real rows actually spread
    # across the mesh (smaller batches pad and concentrate on rank 0)
    nrows = scd.process_dataset_distributed(fa, outdir, batch_size=256)
    t_dist = time.time() - t0
    assert 0 < nrows < 400, f"rows did not spread across ranks: {nrows}"
    mhu.sync_global_devices("parts-written")
    if pid == 0:
        single2 = Classifier(db, tree, emit_all=True)
        ref_fh = io.StringIO()
        t0 = time.time()
        single2.process_dataset(fa, ref_fh, batch_size=256)
        t_single = time.time() - t0
        merged = io.StringIO()
        merge_distributed_output(outdir, merged)
        assert merged.getvalue() == ref_fh.getvalue(), (
            "merged per-rank output != single-process stream"
        )
        print(
            f"[proc {pid}] ok: phase 3 per-rank classify I/O — merged "
            f"2-process output byte-identical to single-process "
            f"({nrows} local rows of 400; wall 2-proc {t_dist:.2f}s / "
            f"1-proc {t_single:.2f}s — both processes share this "
            f"machine's 2 cores, so wall here validates function, not "
            f"scaling)",
            flush=True,
        )
    return 0


def launch() -> int:
    import socket
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    share = tempfile.mkdtemp(prefix="dist_smoke_")
    env = dict(os.environ, DIST_SMOKE_DIR=share)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(i), str(NPROC), addr],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for i in range(NPROC)
    ]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=420)
        tail = "\n".join(out.splitlines()[-12:])
        print(f"--- worker {i} (rc={p.returncode}) ---\n{tail}")
        rc |= p.returncode
    print("dist_smoke:", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        sys.exit(worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]))
    sys.exit(launch())
