"""Minimal functional NN primitives: 1x1 conv (channel-last matmul), BatchNorm.

All tensors are channel-last (``[B, N, K, C]`` / ``[B, N, C]``) so the channel
contraction is the innermost matmul dimension — the layout XLA wants for MXU
tiling. A torch ``Conv2d(kernel=[1,1])`` over ``[B, C, N, K]`` is exactly a
per-position linear map, so here it *is* a matmul.

BatchNorm is functional: parameters (scale/bias) live in the `params` pytree,
running statistics in a separate `state` pytree; `train=True` uses batch
statistics and returns updated running stats (torch semantics: biased batch
variance for normalisation, unbiased for the running update, momentum 0.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def linear_init(key: jax.Array, cin: int, cout: int, bias: bool = True) -> dict:
    bound = (1.0 / cin) ** 0.5
    p = {"w": jax.random.uniform(key, (cin, cout), minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def channel_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """x [..., i] @ w [i, o] at the right MXU precision.

    bf16 inputs take the single-pass MXU path; float32 uses the 3-pass
    ('high') decomposition — ~f32 accuracy at half the cost of the global
    6-pass default, and the flow/log-det arithmetic outside matmuls stays
    exact.
    """
    prec = "default" if x.dtype == jnp.bfloat16 else "high"
    return jnp.einsum("...i,io->...o", x, w.astype(x.dtype), precision=prec)


def linear_apply(params: dict, x: jax.Array) -> jax.Array:
    """Channel matmul in x's dtype: bf16 inputs select fast MXU passes."""
    y = channel_matmul(x, params["w"])
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


def bn_init(channel: int):
    params = {"scale": jnp.ones((channel,)), "bias": jnp.zeros((channel,))}
    state = {"mean": jnp.zeros((channel,)), "var": jnp.ones((channel,))}
    return params, state


def bn_apply(params: dict, state: dict, x: jax.Array, train: bool):
    """Normalise over all axes but the last. Returns (y, new_state).

    Statistics are always float32; the affine application runs in x's dtype
    so a bf16 activation path stays bf16 end to end.
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)  # biased, used for normalisation
        n = 1
        for a in axes:
            n *= x.shape[a]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + BN_EPS) * params["scale"]
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + (
        params["bias"].astype(x.dtype))
    return y, new_state
