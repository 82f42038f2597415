"""Global JAX configuration for bonsai-tpu.

k-mers are 64-bit packed integers (2 bits/base, k <= 32).  We enable x64 so
jnp.uint64 is a first-class dtype; on TPU, XLA lowers 64-bit integer ops onto
paired 32-bit lanes.  Hot Pallas kernels use explicit (hi, lo) uint32 pairs
instead and are unaffected by this flag.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# honor JAX_PLATFORMS even when a sitecustomize pre-set jax_platforms (the
# hosted-TPU image pins it to "axon,cpu", which silently overrides the env)
_env_platforms = os.environ.get("JAX_PLATFORMS")
if _env_platforms and jax.config.jax_platforms != _env_platforms:
    try:
        jax.config.update("jax_platforms", _env_platforms)
    except Exception:  # backend already initialized: leave as-is
        pass
