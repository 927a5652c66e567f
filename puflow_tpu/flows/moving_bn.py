"""Invertible moving-average BatchNorm with exact log-det.

Parity target: reference `modules/continuous/normalization.py:19-131`
(`MovingBatchNormNd`/`MovingBatchNorm1d`). The shipped CNF model constructs
its blocks with `batch_norm=False` (`continuous/interpflow.py:80`), so this
is library surface; it is nonetheless fully implemented and tested.

Semantics:
  forward (train): normalise with batch stats (optionally bn_lag-blended
    with the running stats), update running stats with decay 0.1;
  forward (eval): normalise with running stats;
  reverse: always uses running stats (reference `_reverse`, `:102-113`);
  logdet per element = -0.5 log(var + eps) + weight (affine), subtracted
    from logpx on forward and added on reverse (`:100,118-125`).

Cross-device sync: under jit with a sharded batch axis the batch statistics
are already GLOBAL (XLA reduces over the full array) — the reference's
optional `dist.all_reduce` path (`:66-70`) is subsumed; `axis_name` enables
the same behaviour inside explicit `shard_map`/`pmap` regions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-4
DECAY = 0.1


def moving_bn_init(num_features: int):
    params = {
        "weight": jnp.zeros((num_features,)),
        "bias": jnp.zeros((num_features,)),
    }
    state = {
        "mean": jnp.zeros((num_features,)),
        "var": jnp.ones((num_features,)),
        "step": jnp.zeros((1,)),
    }
    return params, state


def moving_bn_forward(params, state, x, logpx=None, train: bool = False,
                      bn_lag: float = 0.0, axis_name: str | None = None):
    """x: [..., C] -> (y, logpx', new_state)."""
    used_mean, used_var = state["mean"], state["var"]
    new_state = state
    if train:
        axes = tuple(range(x.ndim - 1))
        batch_mean = jnp.mean(x, axis=axes)
        if axis_name is not None:
            batch_ex2 = jax.lax.pmean(jnp.mean(x * x, axis=axes), axis_name)
            batch_mean = jax.lax.pmean(batch_mean, axis_name)
            batch_var = batch_ex2 - batch_mean**2
        else:
            n = 1
            for a in axes:
                n *= x.shape[a]
            batch_var = jnp.var(x, axis=axes) * n / max(n - 1, 1)  # unbiased
        used_mean, used_var = batch_mean, batch_var
        if bn_lag > 0:
            step = state["step"][0]
            used_mean = batch_mean - (1 - bn_lag) * (batch_mean -
                                                     state["mean"])
            used_mean = used_mean / (1.0 - bn_lag ** (step + 1))
            used_var = batch_var - (1 - bn_lag) * (batch_var - state["var"])
            used_var = used_var / (1.0 - bn_lag ** (step + 1))
        new_state = {
            "mean": state["mean"] - DECAY * (state["mean"] - batch_mean),
            "var": state["var"] - DECAY * (state["var"] - batch_var),
            "step": state["step"] + 1,
        }

    y = (x - used_mean) * jnp.exp(-0.5 * jnp.log(used_var + EPS))
    y = y * jnp.exp(params["weight"]) + params["bias"]

    if logpx is None:
        return y, None, new_state
    ld = -0.5 * jnp.log(used_var + EPS) + params["weight"]
    ld = jnp.broadcast_to(ld, x.shape)
    return y, logpx - jnp.sum(ld, axis=-1, keepdims=True), new_state


def moving_bn_reverse(params, state, y, logpy=None):
    """Inverse pass; always uses running statistics (reference `:102-113`).

    Divides by the SAME factors the forward multiplies with (rather than
    multiplying by independently-computed reciprocals): `exp(-a)` is not
    bit-wise `1/exp(a)` under approximate libm, and the drift is
    host-dependent — division keeps the roundtrip at ~1 ULP everywhere.
    """
    y = (y - params["bias"]) / jnp.exp(params["weight"])
    x = y / jnp.exp(-0.5 * jnp.log(state["var"] + EPS)) + state["mean"]
    if logpy is None:
        return x, None
    ld = -0.5 * jnp.log(state["var"] + EPS) + params["weight"]
    ld = jnp.broadcast_to(ld, x.shape)
    return x, logpy + jnp.sum(ld, axis=-1, keepdims=True)
