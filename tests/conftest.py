"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (the same mechanism the driver's
``dryrun_multichip`` uses). The platform override must go through
``jax.config.update`` because this environment's sitecustomize registers the
TPU backend before pytest starts (env vars alone are too late).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# MUST be the env var, not just the config update below: the package
# __init__ re-applies JAX_PLATFORMS from the environment (to un-swallow it
# on hosts whose sitecustomize pre-registers the TPU plugin), so a session
# env of JAX_PLATFORMS=axon would silently flip the whole suite onto the
# TPU tunnel after the first `import puflow_tpu` (observed round 3: the
# moving-BN logdet test failing by 1.7e-5 — TPU f32 exp/log drift).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the jitted train step takes minutes to
# compile on CPU; caching executables on disk makes repeat suite runs cheap
# (the cache key covers HLO + jaxlib/backend versions, so edits that change
# the computation recompile as usual).
#
# SEPARATE dir from the TPU-side scripts' cache, and fingerprinted by host
# CPU flags + jaxlib: sessions migrate between hosts and the remote TPU
# compile helper runs a different python/jaxlib — either writes CPU AOT
# entries with mismatched target features into a shared dir, and loading
# those SEGFAULTS (observed round 3: crash inside
# compilation_cache.get_executable_and_time at 97% of the suite).
from puflow_tpu.utils.cache import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
