"""PU-Flow-TPU: a TPU-native point-cloud upsampling framework with normalizing flows.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch implementation of "PU-Flow: a Point Cloud Upsampling Network with
Normalizing Flows" (arXiv:2107.05893). Compute path is jit/pjit-compiled and
sharded over `jax.sharding.Mesh`; hot distance kernels (k-NN, Chamfer, EMD
auction) have Pallas TPU implementations with pure-XLA references.
"""

import os as _os

import jax as _jax

# Precision policy: float32 math is EXACT (6-pass MXU emulation on TPU).
# Flow invertibility and log-det accuracy depend on it. Performance-critical
# paths opt into fast MXU matmuls *explicitly* by casting to bfloat16 — dtype,
# not a global flag, selects speed vs accuracy.
_jax.config.update("jax_default_matmul_precision", "highest")

# Honor JAX_PLATFORMS on hosts whose sitecustomize pre-registers a remote
# backend plugin and swallows the env var (stock JAX behavior otherwise):
# a CLI run with JAX_PLATFORMS=cpu must not stall probing a TPU tunnel.
# No-op once a backend is live (config update then raises internally).
if _os.environ.get("JAX_PLATFORMS", "").strip():
    try:
        _jax.config.update("jax_platforms",
                           _os.environ["JAX_PLATFORMS"].strip())
    except Exception:
        pass

__version__ = "0.1.0"

