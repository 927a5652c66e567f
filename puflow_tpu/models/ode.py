"""Adaptive Dormand-Prince (dopri5) ODE integration, jit-safe.

Replaces the reference's `torchdiffeq.odeint(_adjoint)` dependency
(`modules/continuous/cnf.py:3-4`) with a hand-rolled RK45:

  * classic DP(4)5 tableau with FSAL, error = RK5 - RK4 embedded estimate,
    elementwise tolerance atol + rtol * max(|y|, |y_new|), RMS error norm
    over the full augmented state (torchdiffeq's convention);
  * step-size controller h *= clip(0.9 * err^(-1/5), 0.1, 10);
  * two drivers sharing the step function:
      - `odeint_dopri5(..., differentiable=True)`: bounded `lax.scan` with
        accept/reject masking — reverse-mode differentiable (discretise-
        then-optimise; the reference's continuous adjoint solves the same
        gradients to solver tolerance);
      - `differentiable=False`: `lax.while_loop` with early exit for
        inference.

Integration runs backward automatically when t1 < t0.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

# Dormand-Prince coefficients.
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                 11 / 84, 0.0])
_B4 = jnp.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                 -92097 / 339200, 187 / 2100, 1 / 40])

_SAFETY = 0.9
_MIN_FACTOR = 0.1
_MAX_FACTOR = 10.0
_ORDER = 5.0


def _tree_axpy(a, xs, ys):
    return jax.tree.map(lambda x, y: a * x + y, xs, ys)


def _weighted_sum(ks, w):
    """sum_i w[i] * ks[i] over a list of pytrees."""
    out = jax.tree.map(lambda x: x * w[0], ks[0])
    for i in range(1, len(ks)):
        out = jax.tree.map(lambda o, x: o + w[i] * x, out, ks[i])
    return out


def _error_ratio(err, y0, y1, rtol, atol):
    def leaf_sq(e, a, b):
        tol = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        r = e / tol
        return jnp.sum(r * r)

    sums = sum(jax.tree.leaves(jax.tree.map(leaf_sq, err, y0, y1)))
    count = sum(x.size for x in jax.tree.leaves(err))
    # epsilon keeps sqrt'(0) finite: after convergence the masked scan body
    # keeps evaluating with h = 0 -> err = 0, and sqrt(0)'s infinite slope
    # would turn the zero cotangent into NaN.
    return jnp.sqrt(sums / count + 1e-24)


def _dp_step(func, t, y, h, k1):
    """One DP45 step. Returns (y5, err, k_new_first_same_as_last)."""
    ks = [k1]
    for i in range(1, 7):
        acc = jax.tree.map(
            lambda k: k * (_A[i][0] * h), ks[0])
        for j in range(1, i):
            acc = jax.tree.map(lambda a, k: a + k * (_A[i][j] * h),
                               acc, ks[j])
        y_i = jax.tree.map(lambda y_, a: y_ + a, y, acc)
        ks.append(func(t + _C[i] * h, y_i))
    y5 = jax.tree.map(lambda y_, s: y_ + h * s, y,
                      _weighted_sum(ks, _B5))
    err = jax.tree.map(lambda s: h * s,
                       _weighted_sum(ks, _B5 - _B4))
    return y5, err, ks[6]  # FSAL: k7 at (t+h, y5)


def odeint_dopri5(func, y0, t0, t1, rtol: float = 1e-5, atol: float = 1e-5,
                  max_steps: int = 128, differentiable: bool = True,
                  return_stats: bool = False):
    """Integrate dy/dt = func(t, y) from t0 to t1.

    Args:
      func: ``(t, y pytree) -> dy pytree``.
      y0: initial state pytree.
      t0, t1: scalars (traced OK); t1 < t0 integrates backward.
      differentiable: masked fixed-trip scan (reverse-AD-safe) vs early-exit
        while_loop.
      return_stats: also return ``{"steps": n, "nfe": 1 + 6n}`` — the
        solver-introspection counters the reference exposes via
        `count_nfe` / `_num_evals` (`modules/continuous/flow.py:6-18`,
        `odefunc.py:111,125`).

    Returns:
      y(t1) pytree (and implicitly uses <= max_steps accepted+rejected
      steps; unconverged integrations clamp at the last state — keep
      max_steps comfortably above the expected NFE/6).
    """
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)
    direction = jnp.sign(t1 - t0)
    span = jnp.abs(t1 - t0)
    h0 = direction * span / 16.0  # simple, robust initial step

    def clip_h(t, h):
        # never step past t1
        remaining = t1 - t
        return jnp.where(jnp.abs(h) > jnp.abs(remaining), remaining, h)

    k1_0 = func(t0, y0)

    def step_carry(carry):
        t, y, h, k1, done, n = carry
        h_c = clip_h(t, h)
        y5, err, k7 = _dp_step(func, t, y, h_c, k1)
        ratio = _error_ratio(err, y, y5, rtol, atol)
        accept = ratio <= 1.0
        # floor the ratio: err == 0 would give 0^(-1/5) = inf (NaN grads)
        safe_ratio = jnp.maximum(ratio, 1e-10)
        factor = jnp.clip(_SAFETY * safe_ratio ** (-1.0 / _ORDER),
                          _MIN_FACTOR, _MAX_FACTOR)
        new_h = h_c * factor
        # guard against degenerate h
        new_h = jnp.where(jnp.abs(new_h) < 1e-12, h_c, new_h)
        t_n = jnp.where(accept, t + h_c, t)
        y_n = jax.tree.map(lambda a, b: jnp.where(accept, b, a), y, y5)
        k1_n = jax.tree.map(lambda a, b: jnp.where(accept, b, a), k1, k7)
        done_n = jnp.abs(t_n - t0) >= span - 1e-9
        return t_n, y_n, new_h, k1_n, done_n, n + 1

    init = (t0, y0, h0, k1_0, span <= 1e-12, jnp.int32(0))

    if differentiable:
        def body(carry, _):
            done = carry[4]
            new = step_carry(carry)
            out = jax.tree.map(
                lambda a, b: jnp.where(done, a, b), carry, new)
            return out, None

        (tf, yf, _, _, _, n), _ = jax.lax.scan(body, init, None,
                                               length=max_steps)
    else:
        def cond(carry):
            return jnp.logical_not(carry[4]) & (carry[5] < max_steps)

        _, yf, _, _, _, n = jax.lax.while_loop(cond, step_carry, init)

    if return_stats:
        return yf, {"steps": n, "nfe": 1 + 6 * n}
    return yf


# ---------------------------------------------------------------------------
# Continuous adjoint (the reference's `odeint_adjoint` equivalent,
# `modules/continuous/cnf.py:3-4,89`): memory-O(1) gradients by integrating
# the augmented system backward with the SAME adaptive while_loop driver —
# no unrolled scan in the autodiff graph, so CNF training compiles in
# seconds instead of tens of minutes.
# ---------------------------------------------------------------------------
def _tree_vdot(a, b):
    parts = jax.tree.map(lambda x, y: jnp.sum(x * y), a, b)
    return sum(jax.tree.leaves(parts))


def make_adjoint_odeint(func, rtol: float = 1e-5, atol: float = 1e-5,
                        max_steps: int = 128, fwd_solver=None,
                        bwd_solver=None):
    """Build ``solve(params, y0, t0, t1) -> y(t1)`` with adjoint gradients.

    ``func(params, t, y) -> dy`` where `params` and `y` are pytrees.
    Gradients flow to `params`, `y0`, `t0` and `t1` (the CNF's trainable
    end time T = sqrt_end_time^2 differentiates through t1/t0).

    Backward solves d/dt [y, a, g] = [f, -a^T df/dy, -a^T df/dparams] from
    t1 to t0 (one vjp of `func` per field evaluation), with the boundary
    terms dL/dt1 = a(t1).f(t1, y1) and dL/dt0 = -a(t0).f(t0, y0).

    ``fwd_solver(params, y0, t0, t1) -> y1`` optionally replaces the
    FORWARD integration only (e.g. the fused Pallas whole-solve kernel,
    `ops/pallas/cnf_pallas.cnf_solve_logp_pallas`): the continuous
    adjoint re-solves backward from y1, so gradients stay consistent with
    whatever trajectory the forward produced — no AD through the
    override is needed.

    ``bwd_solver(params, y1, y1_bar, t0, t1) -> (y0_rec, a0, g_total)``
    optionally replaces the BACKWARD augmented integration (e.g. the fused
    `ops/pallas/cnf_adjoint_pallas.cnf_adjoint_bwd_pallas` kernel). It may
    return ``None`` at trace time to fall back to the XLA path (used when
    the params structure is not the one the kernel supports). The t0/t1
    boundary cotangents are still computed here from `func`.
    """

    @jax.custom_vjp
    def solve(params, y0, t0, t1):
        if fwd_solver is not None:
            return fwd_solver(params, y0, t0, t1)
        return odeint_dopri5(lambda t, y: func(params, t, y), y0, t0, t1,
                             rtol, atol, max_steps, differentiable=False)

    def fwd(params, y0, t0, t1):
        y1 = solve(params, y0, t0, t1)
        return y1, (params, y1, t0, t1)

    def bwd(res, y1_bar):
        params, y1, t0, t1 = res
        t0 = jnp.asarray(t0, jnp.float32)
        t1 = jnp.asarray(t1, jnp.float32)

        if bwd_solver is not None:
            fused = bwd_solver(params, y1, y1_bar, t0, t1)
            if fused is not None:
                if len(fused) == 5:
                    # solver supplied the boundary fields too — no
                    # launch-bound XLA func() evals needed here
                    y0_rec, a0, g_total, t0_bar, t1_bar = fused
                    return g_total, a0, t0_bar, t1_bar
                y0_rec, a0, g_total = fused
                t1_bar = _tree_vdot(y1_bar, func(params, t1, y1))
                f0 = func(params, t0, y0_rec)
                t0_bar = -_tree_vdot(a0, f0)
                return g_total, a0, t0_bar, t1_bar

        f1 = func(params, t1, y1)
        t1_bar = _tree_vdot(y1_bar, f1)

        def aug_field(t, state):
            y, a, _g = state
            dy, vjp_fn = jax.vjp(lambda pp, yy: func(pp, t, yy), params, y)
            p_bar, y_bar = vjp_fn(a)
            return (dy, jax.tree.map(jnp.negative, y_bar),
                    jax.tree.map(jnp.negative, p_bar))

        g0 = jax.tree.map(jnp.zeros_like, params)
        y0_rec, a0, g_total = odeint_dopri5(
            aug_field, (y1, y1_bar, g0), t1, t0, rtol, atol, max_steps,
            differentiable=False)
        f0 = func(params, t0, y0_rec)
        t0_bar = -_tree_vdot(a0, f0)
        return g_total, a0, t0_bar, t1_bar

    solve.defvjp(fwd, bwd)
    return solve
