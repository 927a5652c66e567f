"""Whole-solve fused dopri5 kernel for CNF sampling (concatsquash + tanh).

The XLA sampling path (`models/continuous._integrate` with
`field_plain_csl`) is per-op-launch bound: each field evaluation is ~20
small HLO ops on [R, 64] tensors (~2 us apiece on TPU), and a solve runs
7 stage evaluations x ~6 adaptive steps — per 8x256-patch sample that is
12 block-solves of launch overhead (~13 ms total). Here ONE Pallas kernel
runs the entire adaptive dopri5 loop for a block:

  * state lives TRANSPOSED ([3, R] / hidden [64, R], rows on lanes) so
    nothing pads to 128 lanes wastefully; the condition projections
    (gate_c/bias_c per layer — constant during the solve) are precomputed
    in XLA and stream in once;
  * the 7 RK stages' k-values pack into one [24, R] scratch (lane-major
    rows 3*j..3*j+2);
  * matmuls use the exact 3-pass bf16 decomposition (the global 'highest'
    policy does not reach Mosaic), so the trajectory matches the XLA
    solver to f32 rounding and the dopri5 tolerances keep their meaning;
  * the adaptive controller (error ratio, accept/reject, step resize,
    FSAL) runs on scalars inside a `lax.while_loop`.

Semantics identical to `models/ode.odeint_dopri5(differentiable=False)`
on the plain (divergence-free) concatsquash field. Inference-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

_SAFETY = 0.9
_MIN_FACTOR = 0.1
_MAX_FACTOR = 10.0
_ORDER = 5.0

# Dormand-Prince tableau (same constants as models/ode.py).
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
       187 / 2100, 1 / 40)


def _bf16_dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


def _f32_dot(a, b):
    """Exact-ish f32 matmul (3-pass bf16 split; see encoder_pallas)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (_bf16_dot(a_hi, b_hi) + _bf16_dot(a_hi, b_lo)
            + _bf16_dot(a_lo, b_hi))


def _cnf_solve_kernel(y0_ref, t0_ref, t1_ref, *refs, n_layers: int,
                      n_valid: int, rtol: float, atol: float,
                      max_steps: int):
    """refs: per-layer (wT [din, dout], gate_t [1, dout], bias_t [1, dout],
    gate_c [dout, R], bias_c [dout, R], b [dout, 1]) ... , out_ref,
    y_scratch, k_scratch."""
    w_refs = refs[:-3]
    out_ref, y_ref, k_ref = refs[-3:]

    t0 = t0_ref[0]
    t1 = t1_ref[0]
    span = jnp.abs(t1 - t0)
    direction = jnp.sign(t1 - t0)

    Rp = y0_ref.shape[1]
    # exclude padded lanes from the error norm (their gate_c/bias_c are
    # zero-padded, so the field still produces nonzero garbage there)
    lane_valid = (jax.lax.broadcasted_iota(jnp.int32, (1, Rp), 1)
                  < n_valid).astype(jnp.float32)

    def field(t, y):
        """y [3, R] -> dy [3, R]; concatsquash stack, transposed layout."""
        dx = y
        for li in range(n_layers):
            base = li * 6
            wT = w_refs[base][...]                     # [dout, din]
            gate_t = w_refs[base + 1][...]             # [dout, 1]
            bias_t = w_refs[base + 2][...]             # [dout, 1]
            gate_c = w_refs[base + 3][...]             # [dout, R]
            bias_c = w_refs[base + 4][...]             # [dout, R]
            b = w_refs[base + 5][...]                  # [dout, 1]
            h = _f32_dot(wT, dx) + b                   # [dout, R]
            gate = jax.nn.sigmoid(gate_t * t + gate_c)
            dx = h * gate + (bias_t * t + bias_c)
            if li < n_layers - 1:
                dx = jnp.tanh(dx)
        return dx

    y_ref[...] = y0_ref[...]
    k_ref[0:3, :] = field(t0, y0_ref[...])

    def err_ratio(err, y, y5):
        tol = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y5))
        r = (err / tol) * lane_valid
        return jnp.sqrt(jnp.sum(r * r) / (3 * n_valid) + 1e-24)

    def body(carry):
        t, h, done, n = carry
        remaining = t1 - t
        h_c = jnp.where(jnp.abs(h) > jnp.abs(remaining), remaining, h)
        y = y_ref[...]
        # stages 2..7 (k1 is FSAL-carried in k_ref[0:3])
        for i in range(1, 7):
            acc = k_ref[0:3, :] * (_A[i][0] * h_c)
            for j in range(1, i):
                acc = acc + k_ref[3 * j:3 * j + 3, :] * (_A[i][j] * h_c)
            k_ref[3 * i:3 * i + 3, :] = field(t + _C[i] * h_c, y + acc)
        y5 = y
        err = jnp.zeros_like(y)
        for j in range(7):
            kj = k_ref[3 * j:3 * j + 3, :]
            if _B5[j] != 0.0:
                y5 = y5 + (h_c * _B5[j]) * kj
            err = err + (h_c * (_B5[j] - _B4[j])) * kj
        ratio = err_ratio(err, y, y5)
        accept = ratio <= 1.0
        safe_ratio = jnp.maximum(ratio, 1e-10)
        # x ** p as exp(p * log(x)): Mosaic has no math.powf lowering
        pw = jnp.exp(jnp.log(safe_ratio) * (-1.0 / _ORDER))
        factor = jnp.clip(_SAFETY * pw, _MIN_FACTOR, _MAX_FACTOR)
        new_h = h_c * factor
        new_h = jnp.where(jnp.abs(new_h) < 1e-12, h_c, new_h)
        t_n = jnp.where(accept, t + h_c, t)

        @pl.when(accept)
        def _():
            y_ref[...] = y5
            k_ref[0:3, :] = k_ref[18:21, :]            # FSAL

        done_n = jnp.abs(t_n - t0) >= span - 1e-9
        return t_n, new_h, done_n, n + 1

    def cond(carry):
        _, _, done, n = carry
        return jnp.logical_not(done) & (n < max_steps)

    h0 = direction * span / 16.0
    jax.lax.while_loop(cond, body, (t0, h0, span <= 1e-12, jnp.int32(0)))
    out_ref[...] = y_ref[...]


# ---------------------------------------------------------------------------
# Whole-solve kernel WITH the log-density channel (round 4): the training
# and log_prob forward solves integrate (y, logp) where dlogp/dt = -div f,
# divergence by the EXACT 3-JVP trace (matches models/continuous
# `field_with_logp_csl`). The three tangent chains batch into ONE
# 3R-lane matmul chain per layer (tangent propagation reuses the primal's
# sigmoid/tanh values, so no extra transcendentals). Used as the FORWARD
# of the continuous-adjoint custom_vjp: the backward re-solves from y1,
# so gradients inherit the forward's accuracy without differentiating
# through this kernel.
# ---------------------------------------------------------------------------
def _cnf_solve_logp_kernel(s0_ref, t0_ref, t1_ref, *refs, n_layers: int,
                           n_total: int, block_r: int, rtol: float,
                           atol: float, max_steps: int):
    """State rows: 0-2 y, 3 logp. refs as in `_cnf_solve_kernel` plus
    out/state/k scratch ([4, R] state, [28, R] k). Gridded along the row
    axis (independent per-point ODEs; each block adapts its own h)."""
    w_refs = refs[:-3]
    out_ref, s_ref, k_ref = refs[-3:]

    t0 = t0_ref[0]
    t1 = t1_ref[0]
    span = jnp.abs(t1 - t0)
    direction = jnp.sign(t1 - t0)

    Rp = block_r
    lane_ids = (jax.lax.broadcasted_iota(jnp.int32, (1, Rp), 1)
                + pl.program_id(0) * block_r)
    lane_valid = (lane_ids < n_total).astype(jnp.float32)
    n_valid = jnp.sum(lane_valid)
    # tangent basis: U0[c, i*Rp + r] = 1 if c == i (identity per basis
    # block along the 3R lanes)
    u_rows = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * Rp), 0)
    u_cols = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * Rp), 1)
    u0 = (u_rows == u_cols // Rp).astype(jnp.float32)

    def rep3(x):
        return pltpu.repeat(x, 3, 1)                       # [d, R]->[d, 3R]

    def field(t, s):
        """s [4, R] -> ds [4, R]: concatsquash stack + exact-trace div."""
        dx = s[0:3, :]
        u = u0                                             # [din, 3R]
        for li in range(n_layers):
            base = li * 6
            wT = w_refs[base][...]
            gate_t = w_refs[base + 1][...]
            bias_t = w_refs[base + 2][...]
            gate_c = w_refs[base + 3][...]
            bias_c = w_refs[base + 4][...]
            b = w_refs[base + 5][...]
            h = _f32_dot(wT, dx) + b                       # [dout, R]
            gate = jax.nn.sigmoid(gate_t * t + gate_c)
            z = h * gate + (bias_t * t + bias_c)
            u = _f32_dot(wT, u) * rep3(gate)               # [dout, 3R]
            if li < n_layers - 1:
                dx = jnp.tanh(z)
                u = u * rep3(1.0 - dx * dx)
            else:
                dx = z
        div = (u[0:1, 0:Rp] + u[1:2, Rp:2 * Rp]
               + u[2:3, 2 * Rp:3 * Rp])                    # [1, R]
        return jnp.concatenate([dx, -div], axis=0)         # [4, R]

    s_ref[...] = s0_ref[...]
    k_ref[0:4, :] = field(t0, s0_ref[...])

    def err_ratio(err, y, y5):
        tol = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y5))
        r = (err / tol) * lane_valid
        return jnp.sqrt(jnp.sum(r * r) / (4 * n_valid) + 1e-24)

    def body(carry):
        t, h, done, n = carry
        remaining = t1 - t
        h_c = jnp.where(jnp.abs(h) > jnp.abs(remaining), remaining, h)
        s = s_ref[...]
        for i in range(1, 7):
            acc = k_ref[0:4, :] * (_A[i][0] * h_c)
            for j in range(1, i):
                acc = acc + k_ref[4 * j:4 * j + 4, :] * (_A[i][j] * h_c)
            k_ref[4 * i:4 * i + 4, :] = field(t + _C[i] * h_c, s + acc)
        s5 = s
        err = jnp.zeros_like(s)
        for j in range(7):
            kj = k_ref[4 * j:4 * j + 4, :]
            if _B5[j] != 0.0:
                s5 = s5 + (h_c * _B5[j]) * kj
            err = err + (h_c * (_B5[j] - _B4[j])) * kj
        ratio = err_ratio(err, s, s5)
        accept = ratio <= 1.0
        safe_ratio = jnp.maximum(ratio, 1e-10)
        pw = jnp.exp(jnp.log(safe_ratio) * (-1.0 / _ORDER))
        factor = jnp.clip(_SAFETY * pw, _MIN_FACTOR, _MAX_FACTOR)
        new_h = h_c * factor
        new_h = jnp.where(jnp.abs(new_h) < 1e-12, h_c, new_h)
        t_n = jnp.where(accept, t + h_c, t)

        @pl.when(accept)
        def _():
            s_ref[...] = s5
            k_ref[0:4, :] = k_ref[24:28, :]                # FSAL

        done_n = jnp.abs(t_n - t0) >= span - 1e-9
        return t_n, new_h, done_n, n + 1

    def cond(carry):
        _, _, done, n = carry
        return jnp.logical_not(done) & (n < max_steps)

    h0 = direction * span / 16.0
    jax.lax.while_loop(cond, body, (t0, h0, span <= 1e-12, jnp.int32(0)))
    out_ref[...] = s_ref[...]


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def cnf_solve_logp_pallas(layers, c, y, logp0, t0, t1,
                          rtol: float = 1e-5, atol: float = 1e-5,
                          max_steps: int = 128, interpret: bool = False,
                          block_size: int | None = None):
    """Integrate the concatsquash field WITH the exact-trace log-density
    channel over one CNF block in a single fused kernel, t0 -> t1 (both
    traced scalars; t1 < t0 integrates in reverse).

    layers: list of CSL param dicts; c [B, N, cdim]; y [B, N, 3];
    logp0 [B, N, 1]. Returns (y(t1) [B, N, 3], logp(t1) [B, N, 1]) —
    matching `odeint_dopri5` on the exact-trace field
    (models/continuous.py `_cnf_field`) to solver-tolerance accuracy.
    """
    B, N, _ = y.shape
    R = B * N
    # grid-chunk the row axis: the 3R-lane tangent temporaries cost
    # ~25 MB each at R=32768 (206 MB total VMEM — hard compile failure on
    # the v5e 128 MB budget); rows are independent ODEs, so each block
    # runs its own adaptive loop on a VMEM-sized slice
    block_r = block_size or min(8192, max(128, (R + 127) // 128 * 128))
    n_blocks = -(-R // block_r)
    Rp = n_blocks * block_r

    yT = y.reshape(R, 3).T                                  # [3, R]
    lT = logp0.reshape(R, 1).T                              # [1, R]
    s0 = jnp.concatenate([yT, lT], axis=0)
    s0 = jnp.pad(s0, ((0, 0), (0, Rp - R)))
    cf = c.reshape(R, -1)

    weights = []
    for p in layers:
        wT = p["layer"]["w"].T
        gate_t = p["hyper_gate"]["w"][0][:, None]
        bias_t = p["hyper_bias"]["w"][0][:, None]
        gate_c = (cf @ p["hyper_gate"]["w"][1:]
                  + p["hyper_gate"]["b"]).T
        bias_c = (cf @ p["hyper_bias"]["w"][1:]).T
        gate_c = jnp.pad(gate_c, ((0, 0), (0, Rp - R)))
        bias_c = jnp.pad(bias_c, ((0, 0), (0, Rp - R)))
        b = p["layer"]["b"][:, None]
        weights += [wT, gate_t, bias_t, gate_c, bias_c, b]

    t0 = jnp.asarray(t0, jnp.float32).reshape(1)
    t1 = jnp.asarray(t1, jnp.float32).reshape(1)

    kernel = functools.partial(_cnf_solve_logp_kernel, n_layers=len(layers),
                               n_total=R, block_r=block_r, rtol=rtol,
                               atol=atol, max_steps=max_steps)
    w_specs = [
        pl.BlockSpec((w.shape[0], block_r), lambda b: (0, b))
        if w.shape[-1] == Rp else pl.BlockSpec(w.shape, lambda b: (0, 0))
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((4, block_r), lambda b: (0, b)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((4, block_r), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((4, Rp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, block_r), jnp.float32),   # state
            pltpu.VMEM((28, block_r), jnp.float32),  # k1..k7 (rows 4j..4j+3)
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(s0, t0, t1, *weights)
    yf = out[0:3, :R].T.reshape(B, N, 3)
    logpf = out[3:4, :R].T.reshape(B, N, 1)
    return yf, logpf


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def cnf_solve_pallas(layers, c, y, T, reverse: bool = False,
                     rtol: float = 1e-5, atol: float = 1e-5,
                     interpret: bool = False):
    """Integrate the plain concatsquash field over one CNF block in a
    single fused kernel. layers: list of CSL param dicts; c [B, N, cdim];
    y [B, N, 3]. Returns y(t1) [B, N, 3].

    `T` is traced (the trainable end time); reverse integrates T -> 0.
    """
    T = jnp.asarray(T, jnp.float32)
    t0, t1 = (T, jnp.zeros(())) if reverse else (jnp.zeros(()), T)
    return cnf_solve_pallas_t(layers, c, y, t0, t1, rtol, atol, interpret)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def cnf_solve_pallas_t(layers, c, y, t0, t1,
                       rtol: float = 1e-5, atol: float = 1e-5,
                       interpret: bool = False):
    """`cnf_solve_pallas` with explicit (traced) integration bounds —
    the entry point the plain (no-logp) adjoint's fwd_solver uses."""
    B, N, _ = y.shape
    R = B * N
    Rp = (R + 127) // 128 * 128

    yT = y.reshape(R, 3).T                                  # [3, R]
    yT = jnp.pad(yT, ((0, 0), (0, Rp - R)))
    cf = c.reshape(R, -1)

    weights = []
    for p in layers:
        wT = p["layer"]["w"].T                              # [dout, din]
        dout = wT.shape[0]
        gate_t = p["hyper_gate"]["w"][0][:, None]           # [dout, 1]
        bias_t = p["hyper_bias"]["w"][0][:, None]
        gate_c = (cf @ p["hyper_gate"]["w"][1:]
                  + p["hyper_gate"]["b"]).T                 # [dout, R]
        bias_c = (cf @ p["hyper_bias"]["w"][1:]).T
        gate_c = jnp.pad(gate_c, ((0, 0), (0, Rp - R)))
        bias_c = jnp.pad(bias_c, ((0, 0), (0, Rp - R)))
        b = p["layer"]["b"][:, None]                        # [dout, 1]
        weights += [wT, gate_t, bias_t, gate_c, bias_c, b]

    t0 = jnp.asarray(t0, jnp.float32).reshape(1)
    t1 = jnp.asarray(t1, jnp.float32).reshape(1)

    kernel = functools.partial(_cnf_solve_kernel, n_layers=len(layers),
                               n_valid=R, rtol=rtol, atol=atol,
                               max_steps=128)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Rp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, Rp), jnp.float32),   # y
            pltpu.VMEM((24, Rp), jnp.float32),  # k1..k7 (rows 3j..3j+2)
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(yT, t0, t1, *weights)
    return out[:, :R].T.reshape(B, N, 3)
