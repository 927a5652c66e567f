"""ActNorm: per-channel scale/bias with exact log-determinant.

Functional parity with reference `modules/flows/normalize.py:9-54`
(channel-last layout, `dim=2`):

  forward:  z = x * exp(logs) + bias,        logdet = sum(logs) * N
  inverse:  x = (z - bias) * exp(-logs),     logdet = -sum(logs) * N

Data-dependent init uses the first batch's per-channel mean/std; in this
framework it is a pure function the trainer calls once before jit-compiling
the step, so there is no mutable `is_inited` flag to persist in checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def actnorm_init(channel: int) -> dict:
    """Identity-initialised ActNorm parameters, shapes match checkpoints."""
    return {
        "logs": jnp.zeros((1, 1, channel), dtype=jnp.float32),
        "bias": jnp.zeros((1, 1, channel), dtype=jnp.float32),
    }


def actnorm_init_from_data(x: jax.Array, eps: float = 1e-6) -> dict:
    """Data-dependent initialisation from a representative batch ``[B, N, C]``.

    Mirrors reference `__initialize` (`normalize.py:45-54`): bias = -mean,
    logs = -log(std + eps), computed over all non-channel axes. Note torch's
    ``Tensor.std`` is the unbiased estimator, replicated here.
    """
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    var = jnp.var(x, axis=(0, 1), keepdims=True)
    n = x.shape[0] * x.shape[1]
    std = jnp.sqrt(var * n / max(n - 1, 1))
    return {
        "bias": -mean,
        "logs": -jnp.log(std + eps),
    }


def actnorm_forward(params: dict, x: jax.Array):
    """x: [B, N, C] -> (z, scalar logdet). logdet scales with N (points)."""
    z = x * jnp.exp(params["logs"]) + params["bias"]
    logdet = jnp.sum(params["logs"]) * x.shape[1]
    return z, logdet


def actnorm_inverse(params: dict, z: jax.Array):
    x = (z - params["bias"]) * jnp.exp(-params["logs"])
    logdet = -jnp.sum(params["logs"]) * z.shape[1]
    return x, logdet
