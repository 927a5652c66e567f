"""Latent prior distributions.

Parity target: reference `modules/utils/probs.py:48-101`
(`GaussianDistribution.standard_logp` / `standard_sample`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def standard_gaussian_logp(z: jax.Array) -> jax.Array:
    """Standard-normal log-density summed over all non-batch axes -> [B]."""
    ll = -0.5 * (z * z + _LOG_2PI)
    return jnp.sum(ll.reshape(z.shape[0], -1), axis=1)


def standard_gaussian_sample(key: jax.Array, shape, temperature: float = 1.0):
    """Temperature-scaled standard-normal sample.

    The reference squares the temperature before use
    (`probs.py:59,99`: ``temp = temperature ** 2``); replicated here.
    """
    return jax.random.normal(key, shape) * (temperature * temperature)
