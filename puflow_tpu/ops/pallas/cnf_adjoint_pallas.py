"""Whole-solve fused dopri5 kernel for the CNF continuous-adjoint BACKWARD.

The training bottleneck (VERDICT r4 item 4): the adjoint backward re-solve
(`models/ode.make_adjoint_odeint.bwd`) evaluates an augmented field — one
`jax.vjp` through the exact-trace concatsquash field per RK stage — as ~200
small XLA HLOs inside a `while_loop`, which is per-op-launch bound on TPU
(reference analogue: torchdiffeq's `odeint_adjoint` backward,
`/root/reference/modules/continuous/cnf.py:89-108`, `odefunc.py:9-30`).

This kernel runs the ENTIRE adaptive backward solve in one Pallas launch,
integrating from t1 back to t0:

  dy/dt  = f(t, y)                                  (trajectory reconstruction)
  da/dt  = -dS/dy        S := a . f - a_p . div f   (adjoint; a_p constant)
  dgc/dt = -dS/dc^T      (condition cotangent, per point — quadrature)
  dG/dt  = -dS/dtheta    (layer/hypernet param grads, packed — quadrature)

matching `make_adjoint_odeint`'s XLA `aug_field` exactly: the vjp of the
exact-trace field is HAND-WRITTEN here as (primal backprop) + (reverse over
the 3-basis tangent chains), reusing the primal's sigmoid/tanh values so
the backward adds no transcendentals. All derivative code is validated in
interpret mode against `jax.vjp` of the XLA field (tests/test_cnf.py).

Layout: transposed ([rows, R]); the 3 tangent chains batch on 3R lanes as
in `_cnf_solve_logp_kernel`. Dynamic state (y, a) keeps the 7 RK stages in
scratch; quadrature state (gc, G) never feeds back into the field, so only
the B5/B4-weighted running sums are held (2 accumulators instead of 7 ks).
The packed param-grad matrix G is written PIECEWISE into a scratch ref at
lane offset 0 (Mosaic cannot lower lane-axis concatenation of pieces with
mismatched sublane offsets — "result/input offset mismatch on non-concat
dimension"); per-channel vector grads (db, dgate_t, ...) become [1, dout]
rows via a ones-row MXU contraction so everything lands lane-aligned.
The grid tiles R: each block solves its own adaptive loop (points are
independent ODEs; the XLA path shares one h across the whole batch, so
trajectories differ within solver tolerance — gradient parity is gated in
tests), and G accumulates across blocks through the sequentially-revisited
output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from puflow_tpu.ops.pallas.cnf_pallas import (_A, _B4, _B5, _C,
                                              _COMPILER_PARAMS, _MAX_FACTOR,
                                              _MIN_FACTOR, _ORDER, _SAFETY,
                                              _f32_dot)

def _g_layout(dims):
    """Row offsets of each layer's G block: per layer
    [dW (dout rows, cols 0:din) | dWgc (dout rows, 0:cdim) |
     dWbc (dout rows, 0:cdim) | db | dgate_t | dbgc | dbias_t (1 row each,
     cols 0:dout)]."""
    offs, r = [], 0
    for _din, dout in dims:
        offs.append(r)
        r += 3 * dout + 4
    return offs, r


def _cnf_adjoint_kernel(s0_ref, t0_ref, t1_ref, c_ref, *refs,
                        n_layers: int, n_total: int, block_r: int,
                        dims: tuple, cdim: int, rtol: float, atol: float,
                        max_steps: int, with_trace: bool = True):
    """s0 rows: 0-2 y1, 3-5 a1, 6 a_p. refs: per-layer (wT [dout,din],
    w [din,dout], gate_t, bias_t, gate_c [dout,R], bias_c [dout,R], b,
    wgc [cdim,dout], wbc [cdim,dout]) then out_s, out_G and scratch."""
    w_refs = refs[:9 * n_layers]
    (out_s_ref, out_g_ref, out_b_ref, s_ref, k_ref, gc_ref, a5gc_ref,
     a4gc_ref, kgc1_ref, g_ref, a5g_ref, a4g_ref, kg1_ref, kgtmp_ref) = \
        refs[9 * n_layers:]

    t0 = t0_ref[0]
    t1 = t1_ref[0]
    span = jnp.abs(t0 - t1)
    direction = jnp.sign(t0 - t1)                  # integrate t1 -> t0

    pid = pl.program_id(0)
    Rp = block_r
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, Rp), 1) + pid * Rp
    lane_valid = (lane_ids < n_total).astype(jnp.float32)
    n_valid = jnp.sum(lane_valid)

    cT = c_ref[...]                                # [cdim, R]
    ap = s0_ref[6:7, :] * lane_valid               # constant logp adjoint
    ones_row = jnp.ones((1, Rp), jnp.float32)
    g_offs, _ = _g_layout(dims)

    def rep3(x):
        return pltpu.repeat(x, 3, 1)

    def sum3(x):
        return (x[:, 0:Rp] + x[:, Rp:2 * Rp] + x[:, 2 * Rp:3 * Rp])

    if with_trace:
        u_rows = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * Rp), 0)
        u_cols = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * Rp), 1)
        u0 = (u_rows == u_cols // Rp).astype(jnp.float32)

    def _dot_rr(a, b):
        """[da, R] x [db, R] contracting R -> [da, db] (grad outer sums)."""
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    def _dot_rr_f32(a, b):
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (_dot_rr(a_hi, b_hi) + _dot_rr(a_hi, b_lo)
                + _dot_rr(a_lo, b_hi))

    def field(t, y, a, kg_ref, light: bool = False):
        """Augmented field eval. Returns (dy [3,R], da [3,R],
        kgc [cdim,R], div [1,R]) and writes -dS/dtheta into kg_ref
        (zeroed first). With ``with_trace=False`` (structurally-zero logp
        cotangent — the g-path inverse discards its log-density) the
        tangent chains, trace reverse and div are skipped entirely:
        ~60% less work per eval."""
        # ---- primal forward (store activations) -------------------------
        xs = [y]                                  # x_{l-1} per layer
        hs, ss, ms = [], [], []
        dx = y
        for li in range(n_layers):
            base = li * 9
            wT = w_refs[base][...]
            gate_t = w_refs[base + 2][...]
            bias_t = w_refs[base + 3][...]
            gate_c = w_refs[base + 4][...]
            bias_c = w_refs[base + 5][...]
            b = w_refs[base + 6][...]
            h = _f32_dot(wT, dx) + b
            s = jax.nn.sigmoid(gate_t * t + gate_c)
            z = h * s + (bias_t * t + bias_c)
            hs.append(h)
            ss.append(s)
            if li < n_layers - 1:
                dx = jnp.tanh(z)
                ms.append(1.0 - dx * dx)
                xs.append(dx)
            else:
                dx = z
        f_out = dx

        if with_trace:
            # ---- tangent chains (3 basis vectors on 3R lanes) -----------
            u = u0
            us = [u]                              # u_{l-1} per layer
            vs, wts = [], []
            for li in range(n_layers):
                wT = w_refs[li * 9][...]
                v = _f32_dot(wT, u)
                wt = v * rep3(ss[li])
                vs.append(v)
                wts.append(wt)
                if li < n_layers - 1:
                    u = wt * rep3(ms[li])
                    us.append(u)
                else:
                    u = wt
            div = (u[0:1, 0:Rp] + u[1:2, Rp:2 * Rp]
                   + u[2:3, 2 * Rp:3 * Rp])       # [1, R] exact trace
            if light:                 # boundary eval: f + div only
                return (f_out * lane_valid, jnp.zeros((3, Rp), jnp.float32),
                        jnp.zeros((cdim, Rp), jnp.float32),
                        div * lane_valid)

            # ---- reverse over the tangent chains (seed: -a_p) -----------
            cu = u0 * rep3(-ap)                   # [3, 3R]
            cx_tan = [None] * n_layers            # extra cot on x_l (l < L)
            cs_tan = [None] * n_layers
            dW_tan = [None] * n_layers
            for li in range(n_layers - 1, -1, -1):
                if li < n_layers - 1:
                    cw = cu * rep3(ms[li])
                    cm = sum3(cu * wts[li])
                    cx_tan[li] = cm * (-2.0 * xs[li + 1])
                else:
                    cw = cu
                cv = cw * rep3(ss[li])
                cs_tan[li] = sum3(cw * vs[li])
                dW_tan[li] = _dot_rr_f32(cv, us[li])
                if li > 0:
                    w = w_refs[li * 9 + 1][...]   # [din, dout] = W^T
                    cu = _f32_dot(w, cv)
        else:
            div = jnp.zeros((1, Rp), jnp.float32)
            cx_tan = cs_tan = dW_tan = None
            if light:                 # boundary eval: f only
                return (f_out * lane_valid, jnp.zeros((3, Rp), jnp.float32),
                        jnp.zeros((cdim, Rp), jnp.float32), div)

        # ---- primal backprop (seed a at the output) ----------------------
        dz = a
        dhs = [None] * n_layers
        dgs = [None] * n_layers
        dbetas = [None] * n_layers
        for li in range(n_layers - 1, -1, -1):
            dhs[li] = dz * ss[li]
            dg = dz * hs[li]
            if with_trace:
                dg = dg + cs_tan[li]
            dgs[li] = dg * ss[li] * (1.0 - ss[li])
            dbetas[li] = dz
            if li > 0:
                w = w_refs[li * 9 + 1][...]       # [din, dout] = W^T
                cx = _f32_dot(w, dhs[li])
                if with_trace:
                    cx = cx + cx_tan[li - 1]
                dz = cx * ms[li - 1]
        dy_bar = _f32_dot(w_refs[1][...], dhs[0])          # dS/dy [3, R]

        # ---- param/condition grads -> kg_ref (all writes lane offset 0,
        # negated: dG/dt = -dS/dtheta) --------------------------------------
        kg_ref[...] = jnp.zeros_like(kg_ref)
        kgc = jnp.zeros((cdim, Rp), jnp.float32)
        for li in range(n_layers):
            din, dout = dims[li]
            r0 = g_offs[li]
            wgc = w_refs[li * 9 + 7][...]         # [cdim, dout]
            wbc = w_refs[li * 9 + 8][...]
            dW = _dot_rr_f32(dhs[li], xs[li])               # [dout, din]
            if with_trace:
                dW = dW + dW_tan[li]
            kg_ref[r0:r0 + dout, 0:din] = -dW
            kg_ref[r0 + dout:r0 + 2 * dout, 0:cdim] = \
                -_dot_rr_f32(dgs[li], cT)                   # dWgc
            kg_ref[r0 + 2 * dout:r0 + 3 * dout, 0:cdim] = \
                -_dot_rr_f32(dbetas[li], cT)                # dWbc
            rv = r0 + 3 * dout
            db_row = _dot_rr_f32(ones_row, dhs[li])         # [1, dout]
            dg_row = _dot_rr_f32(ones_row, dgs[li])
            dbeta_row = _dot_rr_f32(ones_row, dbetas[li])
            kg_ref[rv:rv + 1, 0:dout] = -db_row
            kg_ref[rv + 1:rv + 2, 0:dout] = -dg_row * t     # dgate_t
            kg_ref[rv + 2:rv + 3, 0:dout] = -dg_row         # dbgc
            kg_ref[rv + 3:rv + 4, 0:dout] = -dbeta_row * t  # dbias_t
            kgc = kgc + _f32_dot(wgc, dgs[li]) + _f32_dot(wbc, dbetas[li])
        # mask padded lanes out of the dynamics so garbage lanes cannot
        # poison the shared step size
        return (f_out * lane_valid, -dy_bar * lane_valid,
                -kgc * lane_valid, div * lane_valid)

    # ---- initial state ----------------------------------------------------
    s_ref[0:3, :] = s0_ref[0:3, :] * lane_valid
    s_ref[3:6, :] = s0_ref[3:6, :] * lane_valid
    s_ref[6:8, :] = jnp.zeros((2, Rp), jnp.float32)
    gc_ref[...] = jnp.zeros_like(gc_ref)
    g_ref[...] = jnp.zeros_like(g_ref)

    dy0, da0, kgc0, div1 = field(t1, s_ref[0:3, :], s_ref[3:6, :],
                                 kgtmp_ref)
    k_ref[0:3, :] = dy0
    k_ref[3:6, :] = da0
    kgc1_ref[...] = kgc0
    kg1_ref[...] = kgtmp_ref[...]
    # boundary fields for the t1/t0 cotangents (computed here so the host
    # never re-evaluates the exact-trace field in launch-bound XLA)
    out_b_ref[0:3, :] = dy0
    out_b_ref[3:4, :] = div1

    n_params = sum(din * dout + 2 * cdim * dout + 4 * dout
                   for din, dout in dims)

    def part(e, a, b, mask=None):
        tol = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        r = e / tol
        if mask is not None:
            r = r * mask
        return jnp.sum(r * r)

    def body(carry):
        t, h, done, n = carry
        remaining = t0 - t
        h_c = jnp.where(jnp.abs(h) > jnp.abs(remaining), remaining, h)
        y = s_ref[0:3, :]
        a = s_ref[3:6, :]
        a5gc_ref[...] = kgc1_ref[...] * _B5[0]
        a4gc_ref[...] = kgc1_ref[...] * _B4[0]
        a5g_ref[...] = kg1_ref[...] * _B5[0]
        a4g_ref[...] = kg1_ref[...] * _B4[0]
        for i in range(1, 7):
            accy = k_ref[0:3, :] * (_A[i][0] * h_c)
            acca = k_ref[3:6, :] * (_A[i][0] * h_c)
            for j in range(1, i):
                accy = accy + k_ref[8 * j:8 * j + 3, :] * (_A[i][j] * h_c)
                acca = acca + k_ref[8 * j + 3:8 * j + 6, :] * (_A[i][j] * h_c)
            dy, da, kgc, _ = field(t + _C[i] * h_c, y + accy, a + acca,
                                   kgtmp_ref)
            k_ref[8 * i:8 * i + 3, :] = dy
            k_ref[8 * i + 3:8 * i + 6, :] = da
            a5gc_ref[...] = a5gc_ref[...] + kgc * _B5[i]
            a4gc_ref[...] = a4gc_ref[...] + kgc * _B4[i]
            a5g_ref[...] = a5g_ref[...] + kgtmp_ref[...] * _B5[i]
            a4g_ref[...] = a4g_ref[...] + kgtmp_ref[...] * _B4[i]
        # after the loop: `kgc` and kgtmp_ref hold the stage-7 (FSAL)
        # values — committed below only on accept
        y5 = y
        a5 = a
        err_y = jnp.zeros_like(y)
        err_a = jnp.zeros_like(a)
        for j in range(7):
            ky = k_ref[8 * j:8 * j + 3, :]
            ka = k_ref[8 * j + 3:8 * j + 6, :]
            if _B5[j] != 0.0:
                y5 = y5 + (h_c * _B5[j]) * ky
                a5 = a5 + (h_c * _B5[j]) * ka
            err_y = err_y + (h_c * (_B5[j] - _B4[j])) * ky
            err_a = err_a + (h_c * (_B5[j] - _B4[j])) * ka
        gc0 = gc_ref[...]
        gc1 = gc0 + h_c * a5gc_ref[...]
        g0 = g_ref[...]
        g1 = g0 + h_c * a5g_ref[...]
        sums = (part(err_y, y, y5, lane_valid)
                + part(err_a, a, a5, lane_valid)
                + part(h_c * (a5gc_ref[...] - a4gc_ref[...]), gc0, gc1,
                       lane_valid)
                + part(h_c * (a5g_ref[...] - a4g_ref[...]), g0, g1))
        count = (6.0 + cdim) * n_valid + float(n_params)
        ratio = jnp.sqrt(sums / count + 1e-24)
        accept = ratio <= 1.0
        safe_ratio = jnp.maximum(ratio, 1e-10)
        pw = jnp.exp(jnp.log(safe_ratio) * (-1.0 / _ORDER))
        factor = jnp.clip(_SAFETY * pw, _MIN_FACTOR, _MAX_FACTOR)
        new_h = h_c * factor
        new_h = jnp.where(jnp.abs(new_h) < 1e-12, h_c, new_h)
        t_n = jnp.where(accept, t + h_c, t)

        @pl.when(accept)
        def _():
            s_ref[0:3, :] = y5
            s_ref[3:6, :] = a5
            gc_ref[...] = gc1
            g_ref[...] = g1
            k_ref[0:3, :] = k_ref[48:51, :]            # FSAL
            k_ref[3:6, :] = k_ref[51:54, :]
            kgc1_ref[...] = kgc                        # stage-7 values
            kg1_ref[...] = kgtmp_ref[...]

        done_n = jnp.abs(t_n - t1) >= span - 1e-9
        return t_n, new_h, done_n, n + 1

    def cond(carry):
        _, _, done, n = carry
        return jnp.logical_not(done) & (n < max_steps)

    h0 = direction * span / 16.0
    _, _, _, n_steps = jax.lax.while_loop(
        cond, body, (t1, h0, span <= 1e-12, jnp.int32(0)))

    out_s_ref[0:3, :] = s_ref[0:3, :]
    out_s_ref[3:6, :] = s_ref[3:6, :]
    # row 6 carries the solver step count (attempted steps, accepted +
    # rejected) for introspection; row 7 stays zero
    out_s_ref[6:7, :] = jnp.full((1, Rp), 1.0, jnp.float32) * n_steps
    out_s_ref[7:8, :] = jnp.zeros((1, Rp), jnp.float32)
    out_s_ref[8:8 + cdim, :] = gc_ref[...]
    f0_v, _, _, div0 = field(t0, s_ref[0:3, :], s_ref[3:6, :], kgtmp_ref,
                             light=True)
    out_b_ref[4:7, :] = f0_v
    out_b_ref[7:8, :] = div0

    @pl.when(pid == 0)
    def _():
        out_g_ref[...] = jnp.zeros_like(out_g_ref)

    out_g_ref[...] = out_g_ref[...] + g_ref[...]


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12))
def cnf_adjoint_bwd_pallas(layers, c, y1, a1, ap, t0, t1,
                           rtol: float = 1e-5, atol: float = 1e-5,
                           max_steps: int = 128, interpret: bool = False,
                           block_size: int | None = None,
                           with_trace: bool = True):
    """Fused backward adjoint solve for one CNF block, t1 -> t0.

    layers: list of CSL param dicts; c [B,N,cdim]; y1, a1 [B,N,3]
    (final state / its cotangent); ap [B,N,1] (logp cotangent, constant
    along the solve). Returns (y0, a0, dc, dlayers, bnd) — matching the
    XLA `aug_field` integration in `make_adjoint_odeint.bwd` to solver
    tolerance (the grid blocks adapt their step sizes independently).
    ``bnd`` = (f1, div1, f0, div0) boundary fields for the t0/t1
    cotangents (div rows are zero when ``with_trace=False`` — the
    logp-free augmented system for cotangents with no log-density term,
    ~60% cheaper per field eval).
    """
    B, N, _ = y1.shape
    cdim = c.shape[-1]
    g_cols = max(64, cdim)
    R = B * N
    # per-block VMEM scales with cdim (gc quadrature refs + condition
    # projections): cdim=128 at block 8192 measured 106.7M scoped vs the
    # 96M limit — halve the block above cdim 64
    base = 4096 if with_trace else 8192
    if cdim > 64:
        base //= 2
    block_r = block_size or min(base, max(128, (R + 127) // 128 * 128))
    n_blocks = -(-R // block_r)
    Rp = n_blocks * block_r

    def pack(x, rows):
        xT = x.reshape(R, rows).T
        return jnp.pad(xT, ((0, 0), (0, Rp - R)))

    s0 = jnp.concatenate([pack(y1, 3), pack(a1, 3), pack(ap, 1),
                          jnp.zeros((1, Rp), jnp.float32)], axis=0)
    cT = pack(c, c.shape[-1])
    cf = c.reshape(R, -1)

    dims = tuple((p["layer"]["w"].shape[0], p["layer"]["w"].shape[1])
                 for p in layers)
    g_offs, g_rows = _g_layout(dims)
    g_rows_pad = -(-g_rows // 8) * 8
    weights = []
    for p in layers:
        wT = p["layer"]["w"].T
        w = p["layer"]["w"]
        gate_t = p["hyper_gate"]["w"][0][:, None]
        bias_t = p["hyper_bias"]["w"][0][:, None]
        gate_c = (cf @ p["hyper_gate"]["w"][1:] + p["hyper_gate"]["b"]).T
        bias_c = (cf @ p["hyper_bias"]["w"][1:]).T
        gate_c = jnp.pad(gate_c, ((0, 0), (0, Rp - R)))
        bias_c = jnp.pad(bias_c, ((0, 0), (0, Rp - R)))
        b = p["layer"]["b"][:, None]
        wgc = p["hyper_gate"]["w"][1:]                    # [cdim, dout]
        wbc = p["hyper_bias"]["w"][1:]
        weights += [wT, w, gate_t, bias_t, gate_c, bias_c, b, wgc, wbc]

    t0 = jnp.asarray(t0, jnp.float32).reshape(1)
    t1 = jnp.asarray(t1, jnp.float32).reshape(1)

    kernel = functools.partial(
        _cnf_adjoint_kernel, n_layers=len(layers), n_total=R,
        block_r=block_r, dims=dims, cdim=cdim, rtol=rtol, atol=atol,
        max_steps=max_steps, with_trace=with_trace)

    w_specs = []
    for warr in weights:
        if warr.shape[-1] == Rp:                          # gate_c / bias_c
            w_specs.append(pl.BlockSpec(
                (warr.shape[0], block_r), lambda b: (0, b)))
        else:
            w_specs.append(pl.BlockSpec(warr.shape, lambda b: (0, 0)))

    gshape = (g_rows_pad, g_cols)
    out_s, out_g, out_b = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((8, block_r), lambda b: (0, b)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((cdim, block_r), lambda b: (0, b)),
        ] + w_specs,
        out_specs=[
            pl.BlockSpec((8 + cdim, block_r), lambda b: (0, b)),
            pl.BlockSpec(gshape, lambda b: (0, 0)),
            pl.BlockSpec((8, block_r), lambda b: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8 + cdim, Rp), jnp.float32),
            jax.ShapeDtypeStruct(gshape, jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, block_r), jnp.float32),        # s (y, a)
            pltpu.VMEM((56, block_r), jnp.float32),       # k dyn (8 rows/st)
            pltpu.VMEM((cdim, block_r), jnp.float32),     # gc
            pltpu.VMEM((cdim, block_r), jnp.float32),     # acc5 gc
            pltpu.VMEM((cdim, block_r), jnp.float32),     # acc4 gc
            pltpu.VMEM((cdim, block_r), jnp.float32),     # kgc1 (FSAL)
            pltpu.VMEM(gshape, jnp.float32),              # G
            pltpu.VMEM(gshape, jnp.float32),              # acc5 G
            pltpu.VMEM(gshape, jnp.float32),              # acc4 G
            pltpu.VMEM(gshape, jnp.float32),              # kG1 (FSAL)
            pltpu.VMEM(gshape, jnp.float32),              # kG stage tmp
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(s0, t0, t1, cT, *weights)

    y0 = out_s[0:3, :R].T.reshape(B, N, 3)
    a0 = out_s[3:6, :R].T.reshape(B, N, 3)
    dc = out_s[8:8 + cdim, :R].T.reshape(B, N, cdim)
    bnd = (out_b[0:3, :R].T.reshape(B, N, 3),
           out_b[3:4, :R].T.reshape(B, N, 1),
           out_b[4:7, :R].T.reshape(B, N, 3),
           out_b[7:8, :R].T.reshape(B, N, 1))

    dlayers = []
    for (din, dout), r0, p in zip(dims, g_offs, layers):
        dW = out_g[r0:r0 + dout, 0:din].T                 # [din, dout]
        dWgc = out_g[r0 + dout:r0 + 2 * dout, 0:cdim].T   # [cdim, dout]
        dWbc = out_g[r0 + 2 * dout:r0 + 3 * dout, 0:cdim].T
        rv = r0 + 3 * dout
        db = out_g[rv, 0:dout]
        dgt = out_g[rv + 1, 0:dout]
        dbgc = out_g[rv + 2, 0:dout]
        dbt = out_g[rv + 3, 0:dout]
        dlayers.append({
            "layer": {"w": dW, "b": db},
            "hyper_gate": {
                "w": jnp.concatenate([dgt[None, :], dWgc], axis=0),
                "b": dbgc},
            "hyper_bias": {
                "w": jnp.concatenate([dbt[None, :], dWbc], axis=0)},
        })
    return y0, a0, dc, dlayers, bnd
