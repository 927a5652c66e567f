"""Coupling layers (additive / affine / injector) and their transform MLP.

Parity targets (reference `modules/flows/coupling.py`):
  * `AffineCouplingLayer` `:21-103` — additive / affine / affineEx couplings
    with exact logdet, channel split on the last axis.
  * `AffineSpatialCouplingLayer` `:108-118` — asymmetric 1-2 / 2-1 split for
    3-D points (split sizes passed explicitly here).
  * `AffineInjectorLayer` `:122-151` — all dims transformed, scale/bias come
    from the condition only.
  * `LinearA1D` (reference `modules/discrete/interpflow.py:22-43`) — the
    3-layer MLP producing coupling parameters, last layer zero-initialised so
    each flow step starts as the identity.

Sign conventions match the reference exactly:
  forward affine:  h2 = (h2 - bias) * exp(-scale),  logdet = -sum(scale)
  inverse affine:  h2 = h2 * exp(scale) + bias
  forward additive: h2 = h2 - bias                  (logdet = 0)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default, used by LinearA1D


# --------------------------------------------------------------------------
# LinearA1D: the parameter MLP for couplings
# --------------------------------------------------------------------------
def linear_a1d_init(key: jax.Array, dim_in: int, dim_h: int, dim_out: int,
                    dim_c: int = 0) -> dict:
    """Init the coupling MLP. Weight layout is [in, out] (x @ W + b)."""
    k0, k1 = jax.random.split(key)
    c_in = dim_in + dim_c
    # Kaiming-uniform fan-in bounds, like torch nn.Linear default init.
    b0 = (1.0 / c_in) ** 0.5
    b1 = (1.0 / dim_h) ** 0.5
    return {
        "w0": jax.random.uniform(k0, (c_in, dim_h), minval=-b0, maxval=b0),
        "w1": jax.random.uniform(k1, (dim_h, dim_h), minval=-b1, maxval=b1),
        "b1": jnp.zeros((dim_h,)),
        "w2": jnp.zeros((dim_h, dim_out)),   # zero-init: identity flow step
        "b2": jnp.zeros((dim_out,)),
    }


def linear_a1d_apply(params: dict, h: jax.Array, c: jax.Array | None = None):
    """h: [..., dim_in]; c: [..., dim_c] or None -> [..., dim_out] float32.

    Computes in the widest input dtype (bf16 conditions + f32 coords -> the
    caller picks by casting `h` to match `c`); the output is cast to float32
    because it feeds exp/logdet flow arithmetic.
    """
    from puflow_tpu.models.nn import channel_matmul

    if c is not None:
        h = jnp.concatenate([h.astype(c.dtype), c], axis=-1)
    dt = h.dtype
    h = channel_matmul(h, params["w0"])       # no bias (reference :33)
    h = jax.nn.leaky_relu(h, _LEAKY_SLOPE)
    h = channel_matmul(h, params["w1"]) + params["b1"].astype(dt)
    h = jax.nn.leaky_relu(h, _LEAKY_SLOPE)
    out = channel_matmul(h, params["w2"]) + params["b2"].astype(dt)
    return out.astype(jnp.float32)


# --------------------------------------------------------------------------
# Additive coupling (used as `coupling1` in the discrete model, logdet-free)
# --------------------------------------------------------------------------
def additive_coupling_forward(params: dict, x: jax.Array, c: jax.Array | None,
                              split: int):
    """Split x -> (h1 [.. :split], h2 [.. split:]); h2 -= bias_net(h1, c)."""
    h1, h2 = x[..., :split], x[..., split:]
    bias = linear_a1d_apply(params["bias_net"], h1, c)
    h2 = h2 - bias
    return jnp.concatenate([h1, h2], axis=-1), None


def additive_coupling_inverse(params: dict, z: jax.Array, c: jax.Array | None,
                              split: int):
    h1, h2 = z[..., :split], z[..., split:]
    bias = linear_a1d_apply(params["bias_net"], h1, c)
    h2 = h2 + bias
    return jnp.concatenate([h1, h2], axis=-1), None


# --------------------------------------------------------------------------
# Affine coupling (library surface; discrete model ships additive)
# --------------------------------------------------------------------------
def affine_coupling_forward(params: dict, x: jax.Array, c: jax.Array | None,
                            split: int):
    h1, h2 = x[..., :split], x[..., split:]
    scale = linear_a1d_apply(params["scale_net"], h1, c)
    bias = linear_a1d_apply(params["bias_net"], h1, c)
    h2 = (h2 - bias) * jnp.exp(-scale)
    logdet = -jnp.sum(scale.reshape(scale.shape[0], -1), axis=1)
    return jnp.concatenate([h1, h2], axis=-1), logdet


def affine_coupling_inverse(params: dict, z: jax.Array, c: jax.Array | None,
                            split: int):
    h1, h2 = z[..., :split], z[..., split:]
    scale = linear_a1d_apply(params["scale_net"], h1, c)
    bias = linear_a1d_apply(params["bias_net"], h1, c)
    h2 = h2 * jnp.exp(scale) + bias
    logdet = jnp.sum(scale.reshape(scale.shape[0], -1), axis=1)
    return jnp.concatenate([h1, h2], axis=-1), logdet


# --------------------------------------------------------------------------
# affineEx coupling: h1 receives an additive update from h2, then h2 is
# affinely transformed (reference 'affineEx' branch, `coupling.py:59-65`).
# Deviation: the reference computes scale/bias from the PRE-update h1 on the
# forward pass but from the post-update h1 on the inverse (`:60-63` vs
# `:87-91`), so its inverse is not exact; here scale/bias are taken from the
# post-update h1 in both directions, making the layer a true bijection.
# (The shipped checkpoints never instantiate affineEx.)
# --------------------------------------------------------------------------
def affine_ex_coupling_forward(params: dict, x: jax.Array,
                               c: jax.Array | None, split: int):
    h1, h2 = x[..., :split], x[..., split:]
    h1 = h1 + linear_a1d_apply(params["g1"], h2)
    scale = linear_a1d_apply(params["g2"], h1, c)
    bias = linear_a1d_apply(params["g3"], h1, c)
    h2 = jnp.exp(scale) * h2 + bias
    logdet = jnp.sum(scale.reshape(scale.shape[0], -1), axis=1)
    return jnp.concatenate([h1, h2], axis=-1), logdet


def affine_ex_coupling_inverse(params: dict, z: jax.Array,
                               c: jax.Array | None, split: int):
    h1, h2 = z[..., :split], z[..., split:]
    scale = linear_a1d_apply(params["g2"], h1, c)
    bias = linear_a1d_apply(params["g3"], h1, c)
    h2 = (h2 - bias) * jnp.exp(-scale)
    h1 = h1 - linear_a1d_apply(params["g1"], h2)
    logdet = -jnp.sum(scale.reshape(scale.shape[0], -1), axis=1)
    return jnp.concatenate([h1, h2], axis=-1), logdet


# --------------------------------------------------------------------------
# Affine injector: transforms ALL dims, parameters from the condition only
# --------------------------------------------------------------------------
def affine_injector_forward(params: dict, x: jax.Array, c: jax.Array):
    scale = linear_a1d_apply(params["scale_net"], c)
    bias = linear_a1d_apply(params["bias_net"], c)
    x = (x - bias) * jnp.exp(-scale)
    logdet = -jnp.sum(scale.reshape(scale.shape[0], -1), axis=1)
    return x, logdet


def affine_injector_inverse(params: dict, z: jax.Array, c: jax.Array):
    scale = linear_a1d_apply(params["scale_net"], c)
    bias = linear_a1d_apply(params["bias_net"], c)
    z = z * jnp.exp(scale) + bias
    logdet = jnp.sum(scale.reshape(scale.shape[0], -1), axis=1)
    return z, logdet
