"""Device mesh construction.

The reference's parallelism is a single-node thread pool
(klib kthread work stealing, /root/reference/klib/kthread.c:71-174).  The
TPU-native equivalents (SURVEY §2.10):

  axis 'dp' — data parallelism over reads (replaces the read-slice pool)
  axis 'db' — database sharding: each rank owns a contiguous range of
              table buckets; probes combine with one psum over 'db'
              (replaces the shared-memory khash read by all threads)
  axis 'sp' — sequence parallelism for multi-Mb contigs in DB build, with
              ppermute halo exchange (replaces streaming rolling state)

All collectives ride ICI within a host and DCN across hosts via standard
jax.lax primitives under shard_map; multi-host launches use
jax.distributed.initialize() (see cli/dist docs).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def make_mesh(axis_sizes: Dict[str, int], devices: Optional[Sequence] = None):
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(list(axis_sizes.values())))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(tuple(axis_sizes.values()))
    return Mesh(arr, tuple(axis_sizes.keys()))


def default_mesh(n_devices: Optional[int] = None, db_shards: int = 1):
    import jax

    n = n_devices or len(jax.devices())
    if n % db_shards:
        raise ValueError(f"{n} devices not divisible by db_shards={db_shards}")
    return make_mesh({"dp": n // db_shards, "db": db_shards})
