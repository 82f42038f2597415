"""Global JAX configuration for bonsai-tpu.

k-mers are 64-bit packed integers (2 bits/base, k <= 32).  We enable x64 so
jnp.uint64 is a first-class dtype; on TPU, XLA lowers 64-bit integer ops onto
paired 32-bit lanes.  Hot Pallas kernels use explicit (hi, lo) uint32 pairs
instead and are unaffected by this flag.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# persistent compilation cache: repeated CLI invocations (classify runs are
# one process per dataset, like the reference binaries) skip recompiling the
# classify step on real TPU backends.  Override dir with BONSAI_TPU_JAX_CACHE;
# set it empty to disable.
_cache_dir = os.environ.get(
    "BONSAI_TPU_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "bonsai_tpu", "jax"),
)
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

# honor JAX_PLATFORMS even when a sitecustomize pre-set jax_platforms (the
# hosted-TPU image pins it to "axon,cpu", which silently overrides the env)
_env_platforms = os.environ.get("JAX_PLATFORMS")
if _env_platforms and jax.config.jax_platforms != _env_platforms:
    try:
        jax.config.update("jax_platforms", _env_platforms)
    except Exception:  # backend already initialized: leave as-is
        pass
