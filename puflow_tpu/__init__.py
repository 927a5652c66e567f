"""PU-Flow-TPU: a TPU-native point-cloud upsampling framework with normalizing flows.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch implementation of "PU-Flow: a Point Cloud Upsampling Network with
Normalizing Flows" (arXiv:2107.05893). Compute path is jit/pjit-compiled and
sharded over `jax.sharding.Mesh`; hot distance kernels (k-NN, Chamfer, EMD
auction) have Pallas TPU implementations with pure-XLA references.
"""

import jax as _jax

# Precision policy: float32 math is EXACT (6-pass MXU emulation on TPU).
# Flow invertibility and log-det accuracy depend on it. Performance-critical
# paths opt into fast MXU matmuls *explicitly* by casting to bfloat16 — dtype,
# not a global flag, selects speed vs accuracy.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

