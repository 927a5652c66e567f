"""PointInterpFlow (continuous): conditional CNF blocks + latent interpolation.

Parity target: reference `modules/continuous/interpflow.py` +
`cnf.py` / `odefunc.py` / `diffeq_layers.py`:

  * same EdgeConv encoder / interpolation / merge units as the discrete
    model (`interpflow.py:15,62-76`);
  * 6 flow blocks, each a conditional CNF integrated with dopri5
    (atol = rtol = 1e-5), trainable end time T via sqrt_end_time^2
    (`FlowBlock`, `:19-50`; `CNF`, `cnf.py:33-118`); batch_norm disabled in
    the shipped model (`:80`, `batch_norm=False`);
  * vector field: 3x ConcatSquashLinear(64) with tanh between
    (`odefunc.py:121-139`, `diffeq_layers.py:72-86`), context = [t, cond].

Design deviations (better on TPU, same semantics):
  * divergence is the EXACT trace via 3 forward-mode JVPs (state dim is 3)
    instead of the reference's stochastic Hutchinson estimator with nested
    autograd (`odefunc.py:9-30`) — an unbiased, zero-variance replacement;
    `field_with_hutchinson_div` provides the estimator for API parity.
  * gradients flow through the discretised solver (`models/ode.py`) rather
    than a continuous adjoint — equivalent to solver tolerance, and jit
    compiles to one fused loop.
"""

from __future__ import annotations

import functools

import math

import jax
import jax.numpy as jnp

from puflow_tpu.flows.prior import standard_gaussian_logp
from puflow_tpu.models import discrete as _discrete
from puflow_tpu.models.discrete import ModelSpec
from puflow_tpu.models.encoder import (
    feat_merge_init,
    feature_extract_init,
    interpolation_apply,
    interpolation_init,
)
from puflow_tpu.models.ode import make_adjoint_odeint, odeint_dopri5
from puflow_tpu.ops.knn import knn_indices

NUM_BLOCKS = 6
T_INIT = 0.5
HDIMS = (64, 64)
ATOL = RTOL = 1e-5
# Step budget: both directions use early-exit while_loop drivers (training
# goes through the continuous adjoint), so this is a safety net well above
# the observed ~7 accepted steps/block at tol 1e-5.
MAX_STEPS_EVAL = 128


# --------------------------------------------------------------------------
# ConcatSquashLinear ODE net
# --------------------------------------------------------------------------
def _csl_init(key, dim_in, dim_out, dim_c):
    k0, k1, k2 = jax.random.split(key, 3)
    b = (1.0 / dim_in) ** 0.5
    bc = (1.0 / (dim_c + 1)) ** 0.5
    return {
        "layer": {
            "w": jax.random.uniform(k0, (dim_in, dim_out), minval=-b,
                                    maxval=b),
            "b": jnp.zeros((dim_out,)),
        },
        "hyper_bias": {
            "w": jax.random.uniform(k1, (dim_c + 1, dim_out), minval=-bc,
                                    maxval=bc),
        },
        "hyper_gate": {
            "w": jax.random.uniform(k2, (dim_c + 1, dim_out), minval=-bc,
                                    maxval=bc),
            "b": jnp.zeros((dim_out,)),
        },
    }


def _csl_apply(p, ctx, x):
    """ConcatSquashLinear (reference `diffeq_layers.py:72-86`)."""
    gate = jax.nn.sigmoid(ctx @ p["hyper_gate"]["w"] + p["hyper_gate"]["b"])
    bias = ctx @ p["hyper_bias"]["w"]
    return (x @ p["layer"]["w"] + p["layer"]["b"]) * gate + bias


def odenet_init(key, idim: int, cdim: int, hdims=HDIMS):
    dims = (idim,) + tuple(hdims) + (idim,)
    keys = jax.random.split(key, len(dims) - 1)
    return [
        _csl_init(keys[i], dims[i], dims[i + 1], cdim)
        for i in range(len(dims) - 1)
    ]


def odenet_apply(layers, t, c, y):
    """dy/dt = net([t, c], y) with tanh between layers (`odefunc.py:96-103`,
    nonlinearity='tanh' per `continuous/interpflow.py` FlowBlock default)."""
    t_full = jnp.broadcast_to(jnp.asarray(t, y.dtype),
                              y.shape[:-1] + (1,))
    ctx = jnp.concatenate([t_full, c], axis=-1)
    dx = y
    for i, p in enumerate(layers):
        dx = _csl_apply(p, ctx, dx)
        if i < len(layers) - 1:
            dx = jnp.tanh(dx)
    return dx


# --------------------------------------------------------------------------
# Divergence
# --------------------------------------------------------------------------
def field_with_exact_div(layers, c):
    """(t, (y, logp)) -> (dy, -div) with the exact 3-JVP trace."""
    def fn(t, state):
        y, _ = state

        def f_only(yy):
            return odenet_apply(layers, t, c, yy)

        dy = f_only(y)
        div = jnp.zeros(y.shape[:-1], dtype=y.dtype)
        for i in range(y.shape[-1]):
            e = jnp.zeros_like(y).at[..., i].set(1.0)
            _, je = jax.jvp(f_only, (y,), (e,))
            div = div + je[..., i]
        return dy, -div[..., None]

    return fn


def field_with_hutchinson_div(layers, c, e):
    """Reference-parity stochastic estimator (`odefunc.py:9-30`): one JVP
    with fixed noise e, div ~= e^T (df/dy) e."""
    def fn(t, state):
        y, _ = state

        def f_only(yy):
            return odenet_apply(layers, t, c, yy)

        dy, je = jax.jvp(f_only, (y,), (e,))
        div = jnp.sum(je * e, axis=-1, keepdims=True)
        return dy, -div

    return fn


def _cnf_field(p, t, state):
    """Params-explicit augmented field for the adjoint solver.

    p = {"layers": odenet params, "c": conditions}; state = (y, logp).
    """
    y, _ = state
    layers, c = p["layers"], p["c"]

    def f_only(yy):
        return odenet_apply(layers, t, c, yy)

    dy = f_only(y)
    div = jnp.zeros(y.shape[:-1], dtype=y.dtype)
    for i in range(y.shape[-1]):
        e = jnp.zeros_like(y).at[..., i].set(1.0)
        _, je = jax.jvp(f_only, (y,), (e,))
        div = div + je[..., i]
    return dy, -div[..., None]


# one custom_vjp instance per (tolerance, budget) configuration
_ADJOINT_SOLVE = make_adjoint_odeint(_cnf_field, RTOL, ATOL, MAX_STEPS_EVAL)


# --------------------------------------------------------------------------
# CNF flow block
# --------------------------------------------------------------------------
def flow_block_init(key, cdim: int, idim: int = 3):
    return {
        "sqrt_end_time": jnp.asarray(math.sqrt(T_INIT), jnp.float32),
        "layers": odenet_init(key, idim, cdim),
    }


def _integrate(block, y, c, reverse: bool, differentiable: bool,
               max_steps: int | None = None):
    T = block["sqrt_end_time"] * block["sqrt_end_time"]
    t0, t1 = (T, 0.0) if reverse else (0.0, T)
    logp0 = jnp.zeros(y.shape[:-1] + (1,), dtype=y.dtype)
    fn = field_with_exact_div(block["layers"], c)
    if differentiable:
        # continuous adjoint: adaptive while_loop in both directions,
        # memory-O(1), compiles in seconds (reference parity with
        # torchdiffeq.odeint_adjoint)
        yf, logpf = _ADJOINT_SOLVE(
            {"layers": block["layers"], "c": c}, (y, logp0),
            jnp.asarray(t0, jnp.float32), jnp.asarray(t1, jnp.float32))
        return yf, logpf
    yf, logpf = odeint_dopri5(fn, (y, logp0), t0, t1, RTOL, ATOL,
                              max_steps=max_steps or MAX_STEPS_EVAL,
                              differentiable=False)
    return yf, logpf


def flow_block_forward(block, x, c, differentiable: bool = True):
    """x -> z with accumulated delta-logp summed per cloud (reference
    continuous `FlowBlock.forward`, `:31-40`)."""
    z, logp = _integrate(block, x, c, reverse=False,
                         differentiable=differentiable)
    return z, jnp.sum(logp, axis=(1, 2))


def flow_block_inverse(block, z, c, differentiable: bool = False):
    x, _ = _integrate(block, z, c, reverse=True,
                      differentiable=differentiable)
    return x


def count_nfe(params, x, cs):
    """Solver-cost introspection: total NFE across the forward blocks
    (reference `count_nfe`, `modules/continuous/flow.py:6-18`)."""
    total = jnp.int32(0)
    for block, c in zip(params["flow_blocks"], cs):
        T = block["sqrt_end_time"] * block["sqrt_end_time"]
        logp0 = jnp.zeros(x.shape[:-1] + (1,), dtype=x.dtype)
        fn = field_with_exact_div(block["layers"], c)
        (x, _), stats = odeint_dopri5(fn, (x, logp0), 0.0, T, RTOL, ATOL,
                                      differentiable=False,
                                      return_stats=True)
        total = total + stats["nfe"]
    return total


# --------------------------------------------------------------------------
# Full model (encoder topology shared with the discrete family)
# --------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnums=(1,))
def init(key, spec: ModelSpec = ModelSpec()):
    keys = jax.random.split(key, 3 * spec.num_blocks + 1)
    interp_p, interp_s = interpolation_init(keys[0], spec.pc_channel)

    feat_p, feat_s, merge_p, flow_p = [], [], [], []
    for i in range(spec.num_blocks):
        fp, fs = feature_extract_init(
            keys[1 + i], _discrete.FEAT_CHANNELS[i],
            _discrete.FEAT_CHANNELS[i + 1], _discrete.GROWTH_WIDTHS[i])
        feat_p.append(fp)
        feat_s.append(fs)
        merge_p.append(feat_merge_init(
            keys[1 + spec.num_blocks + i], _discrete.FEAT_CHANNELS[i + 1],
            _discrete.COND_CHANNELS[i]))
        flow_p.append(flow_block_init(
            keys[1 + 2 * spec.num_blocks + i], _discrete.COND_CHANNELS[i],
            idim=spec.pc_channel))

    params = {
        "interp": interp_p,
        "feat_convs": feat_p,
        "merge_convs": merge_p,
        "flow_blocks": flow_p,
    }
    state = {"interp": interp_s, "feat_convs": feat_s}
    return params, state


def f_transform(params, x, cs, differentiable: bool = True):
    log_det = jnp.zeros((x.shape[0],), dtype=jnp.float32)
    for bp, c in zip(params["flow_blocks"], cs):
        x, ld = flow_block_forward(bp, x, c, differentiable)
        log_det = log_det + ld
    return x, log_det


def g_transform(params, z, cs, upratio: int, differentiable: bool = False):
    B, N, C, r = z.shape
    z = jnp.swapaxes(z, 2, 3).reshape(B, N * r, C)
    for i in reversed(range(len(params["flow_blocks"]))):
        c = jnp.repeat(cs[i], upratio, axis=1)
        z = flow_block_inverse(params["flow_blocks"][i], z, c,
                               differentiable)
    return z


def forward(params, state, xyz, upratio: int, train: bool = False,
            spec: ModelSpec = ModelSpec(), dtype=None):
    """[B, N, 3] -> ([B, N*r, 3], scalar NLL, state') — reference
    `continuous/interpflow.py:118-128`. NLL sign convention matches
    `log_prob` there (`:130-135`): -mean(logp_z - log_det)."""
    knn_idx = knn_indices(xyz, xyz, spec.num_neighbors)
    cs, feat_s = _discrete.feat_extract(params, state, xyz, knn_idx, train,
                                        dtype=dtype)
    z, log_det = f_transform(params, xyz, cs, differentiable=train)
    logp_z = standard_gaussian_logp(z)
    logp_x = -jnp.mean(logp_z - log_det)

    fz, interp_s = interpolation_apply(
        params["interp"], state["interp"], z, xyz, upratio, train,
        dtype=dtype, knn_idx=knn_idx)  # sorted K=16 -> first 8 cols
    x = g_transform(params, fz, cs, upratio, differentiable=train)
    new_state = {"interp": interp_s, "feat_convs": feat_s}
    return x, logp_x, new_state


def sample(params, state, sparse, upratio: int = 4,
           spec: ModelSpec = ModelSpec(), dtype=None):
    dense, _, _ = forward(params, state, sparse, upratio, train=False,
                          spec=spec, dtype=dtype)
    return dense
