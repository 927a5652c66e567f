"""Continuous model: dopri5 integrator, vector-field parity, CNF roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puflow_tpu.models import continuous
from puflow_tpu.models.ode import odeint_dopri5

CKPT = "/root/reference/pretrain/puflow-x4-cnf-pu1k.pt"
KEY = jax.random.PRNGKey(0)


class TestDopri5:
    def test_linear_decay_exact(self):
        y0 = jnp.asarray([[1.0, -2.0, 3.0]])
        fn = lambda t, y: -y  # noqa: E731
        for diff in (True, False):
            yT = odeint_dopri5(fn, y0, 0.0, 1.0, 1e-7, 1e-7,
                               differentiable=diff)
            np.testing.assert_allclose(np.asarray(yT),
                                       np.asarray(y0) * np.exp(-1.0),
                                       rtol=1e-5)

    def test_backward_integration_roundtrip(self):
        fn = lambda t, y: jnp.sin(y) + t  # noqa: E731
        y0 = jnp.asarray([[0.3, -0.7, 1.1]])
        yT = odeint_dopri5(fn, y0, 0.0, 0.8, 1e-7, 1e-7)
        y0_rec = odeint_dopri5(fn, yT, 0.8, 0.0, 1e-7, 1e-7)
        np.testing.assert_allclose(np.asarray(y0_rec), np.asarray(y0),
                                   atol=1e-5)

    def test_vs_scipy_nonlinear(self):
        from scipy.integrate import solve_ivp

        def f_np(t, y):
            return np.tanh(y) * np.cos(3 * t) - 0.5 * y

        fn = lambda t, y: jnp.tanh(y) * jnp.cos(3 * t) - 0.5 * y  # noqa
        y0 = np.array([0.5, -1.0, 2.0])
        want = solve_ivp(f_np, (0, 2.0), y0, rtol=1e-9, atol=1e-9).y[:, -1]
        got = odeint_dopri5(fn, jnp.asarray(y0), 0.0, 2.0, 1e-7, 1e-7)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_pytree_state_and_grad(self):
        fn = lambda t, s: (-s[0], jnp.sum(s[0]) * jnp.ones_like(s[1]))  # noqa

        def loss(y0):
            yT, aT = odeint_dopri5(fn, (y0, jnp.zeros((1,))), 0.0, 1.0,
                                   1e-6, 1e-6, differentiable=True)
            return jnp.sum(yT)

        y0 = jnp.asarray([2.0, 1.0])
        g = jax.grad(loss)(y0)
        # d/dy0 of sum(y0 * e^-1) = e^-1
        np.testing.assert_allclose(np.asarray(g), np.exp(-1.0), rtol=1e-4)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="no CNF checkpoint")
class TestCnfGolden:
    @pytest.fixture(scope="class")
    def ckpt(self):
        from puflow_tpu.convert.torch_ckpt import load_cnf_checkpoint

        return load_cnf_checkpoint(CKPT)

    def test_vector_field_matches_torch(self, ckpt):
        """odenet_apply == the reference ConcatSquashLinear stack, run in
        torch directly from the state_dict."""
        torch = pytest.importorskip("torch")
        sd = torch.load(CKPT, map_location="cpu")
        params, _ = ckpt
        block = params["flow_blocks"][2]
        cdim = 128  # block 2 condition width

        rng = np.random.RandomState(0)
        y = rng.randn(2, 17, 3).astype(np.float32)
        c = rng.randn(2, 17, cdim).astype(np.float32)
        t = 0.37

        got = np.asarray(continuous.odenet_apply(
            [jax.tree.map(jnp.asarray, l) for l in block["layers"]],
            t, jnp.asarray(c), jnp.asarray(y)))

        # torch oracle
        ty = torch.from_numpy(y)
        ctx = torch.cat([torch.full((2, 17, 1), t), torch.from_numpy(c)],
                        dim=-1)
        dx = ty
        pre = "flow_blocks.2.cnf.odefunc.diffeq.layers"
        for j in range(3):
            w = sd[f"{pre}.{j}._layer.weight"]
            b = sd[f"{pre}.{j}._layer.bias"]
            hb = sd[f"{pre}.{j}._hyper_bias.weight"]
            hg = sd[f"{pre}.{j}._hyper_gate.weight"]
            hgb = sd[f"{pre}.{j}._hyper_gate.bias"]
            gate = torch.sigmoid(ctx @ hg.T + hgb)
            bias = ctx @ hb.T
            dx = (dx @ w.T + b) * gate + bias
            if j < 2:
                dx = torch.tanh(dx)
        np.testing.assert_allclose(got, dx.numpy(), atol=2e-5)

    def test_block_roundtrip(self, ckpt):
        params, _ = ckpt
        block = jax.tree.map(jnp.asarray, params["flow_blocks"][0])
        x = jax.random.normal(KEY, (2, 32, 3)) * 0.5
        c = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32)) * 0.5
        z, logp = continuous.flow_block_forward(block, x, c,
                                                differentiable=False)
        assert z.shape == x.shape and logp.shape == (2,)
        x_rec = continuous.flow_block_inverse(block, z, c)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                                   atol=5e-4)

    def test_full_forward(self, ckpt):
        params, state = ckpt
        params = jax.tree.map(jnp.asarray, params)
        state = jax.tree.map(jnp.asarray, state)
        pts = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 3))
        pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        dense, logpx, _ = continuous.forward(params, state, pts, 4)
        assert dense.shape == (1, 256, 3)
        assert np.isfinite(np.asarray(dense)).all()
        assert np.isfinite(float(logpx))


def test_cnf_param_count():
    # reference continuous checkpoint: 802,376 numbers in 390 tensors
    # (BASELINE.md) = trainable + BN buffers + _num_evals introspection.
    params, state = continuous.init(KEY)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    n_state = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state))
    paths = [
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(state)[0]
    ]
    n_bn = sum(1 for p in paths if p.endswith("mean"))
    # 6 _num_evals buffers are dropped in conversion
    assert n_params + n_state + n_bn + 6 == 802_376


def test_exact_divergence_matches_autodiff():
    params, _ = continuous.init(KEY)
    layers = params["flow_blocks"][0]["layers"]
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 3))
    c = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 32))
    fn = continuous.field_with_exact_div(layers, c)
    _, neg_div = fn(0.2, (y, jnp.zeros((1, 5, 1))))

    # dense jacobian oracle per point
    for p in range(5):
        def f_point(yp):
            full = y.at[0, p].set(yp)
            return continuous.odenet_apply(layers, 0.2, c, full)[0, p]

        jac = jax.jacfwd(f_point)(y[0, p])
        np.testing.assert_allclose(float(-neg_div[0, p, 0]),
                                   float(jnp.trace(jac)), rtol=1e-4,
                                   atol=1e-5)


def test_adjoint_gradients_match_scan():
    """Continuous-adjoint custom VJP == differentiating through the solver."""
    params, _ = continuous.init(KEY)
    block = params["flow_blocks"][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 3)) * 0.4
    c = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32)) * 0.4

    def loss_adj(blk):
        z, logp = continuous.flow_block_forward(blk, x, c,
                                                differentiable=True)
        return jnp.sum(z**2) + jnp.sum(logp)

    def loss_scan(blk):
        T = blk["sqrt_end_time"] ** 2
        logp0 = jnp.zeros(x.shape[:-1] + (1,))
        fn = continuous.field_with_exact_div(blk["layers"], c)
        z, logp = odeint_dopri5(fn, (x, logp0), 0.0, T, 1e-5, 1e-5, 128,
                                differentiable=True)
        return jnp.sum(z**2) + jnp.sum(logp)

    va, ga = jax.value_and_grad(loss_adj)(block)
    vs, gs = jax.value_and_grad(loss_scan)(block)
    assert abs(float(va) - float(vs)) < 1e-4
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8)),
        ga, gs)
    assert max(jax.tree.leaves(rel)) < 2e-2


def test_cnf_solve_kernel_matches_xla_solver():
    """The whole-solve fused dopri5 kernel (interpret mode) matches the
    XLA adaptive solver on the plain concatsquash field, both directions."""
    from puflow_tpu.models.continuous import field_plain_csl, odenet_init
    from puflow_tpu.models.ode import odeint_dopri5
    from puflow_tpu.ops.pallas.cnf_pallas import cnf_solve_pallas

    layers = odenet_init(jax.random.PRNGKey(0), 3, 32)
    B, N = 2, 100
    c = jax.random.normal(jax.random.PRNGKey(1), (B, N, 32)) * 0.5
    y = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3)) * 0.5
    T = 0.47
    fn = field_plain_csl(layers, c)
    for reverse in (False, True):
        t0, t1 = (T, 0.0) if reverse else (0.0, T)
        ref = odeint_dopri5(fn, y, t0, t1, 1e-5, 1e-5,
                            differentiable=False)
        got = cnf_solve_pallas(layers, c, y, T, reverse, 1e-5, 1e-5, True)
        assert float(jnp.abs(ref - got).max()) < 5e-6


def test_cnf_adjoint_bwd_kernel_matches_xla():
    """The fused backward-adjoint kernel (interpret mode) matches the XLA
    augmented-field integration from `make_adjoint_odeint.bwd` — hand-written
    primal+tangent backprop vs `jax.vjp` of the exact-trace field.
    Trajectories differ only through step-size control (the kernel's error
    norm omits the logp/ap reconstruction rows), so parity is gated at
    solver-tolerance scale, not bit-exactness."""
    from puflow_tpu.models.continuous import odenet_apply, odenet_init
    from puflow_tpu.models.ode import odeint_dopri5
    from puflow_tpu.ops.pallas.cnf_adjoint_pallas import \
        cnf_adjoint_bwd_pallas

    layers = odenet_init(jax.random.PRNGKey(0), 3, 32)
    B, N = 1, 60
    c = jax.random.normal(jax.random.PRNGKey(1), (B, N, 32)) * 0.5
    y1 = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3)) * 0.5
    a1 = jax.random.normal(jax.random.PRNGKey(3), (B, N, 3)) * 0.3
    ap = jax.random.normal(jax.random.PRNGKey(4), (B, N, 1)) * 0.3
    t0, t1 = 0.0, 0.47

    # ---- XLA oracle: replicate make_adjoint_odeint.bwd ------------------
    def func(p, t, state):
        y, _ = state
        lys, cc = p["layers"], p["c"]

        def f_only(yy):
            return odenet_apply(lys, t, cc, yy)

        dy = f_only(y)
        div = jnp.zeros(y.shape[:-1], dtype=y.dtype)
        for i in range(3):
            e = jnp.zeros_like(y).at[..., i].set(1.0)
            _, je = jax.jvp(f_only, (y,), (e,))
            div = div + je[..., i]
        return dy, -div[..., None]

    params = {"layers": layers, "c": c}

    def aug_field(t, state):
        y, a, _g = state
        dy, vjp_fn = jax.vjp(lambda pp, yy: func(pp, t, yy), params, y)
        p_bar, y_bar = vjp_fn(a)
        return (dy, jax.tree.map(jnp.negative, y_bar),
                jax.tree.map(jnp.negative, p_bar))

    logp1 = jnp.zeros((B, N, 1))
    g0 = jax.tree.map(jnp.zeros_like, params)
    (y0_ref, _), (a0_ref, _), g_ref = odeint_dopri5(
        aug_field, ((y1, logp1), (a1, ap), g0), t1, t0, 1e-5, 1e-5, 128,
        differentiable=False)

    def maxrel(a, b):
        return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8))

    # single-block and multi-block (block_size=128 -> ragged last block;
    # exercises the cross-block G accumulation and lane masking)
    for block in (None, 128):
        y0, a0, dc, dlayers, bnd = cnf_adjoint_bwd_pallas(
            layers, c, y1, a1, ap, t0, t1, 1e-5, 1e-5, 128, True, block)
        assert maxrel(y0, y0_ref) < 2e-3, block
        assert maxrel(a0, a0_ref) < 2e-3, block
        assert maxrel(dc, g_ref["c"]) < 2e-3, block
        rels = jax.tree.map(maxrel, dlayers, g_ref["layers"])
        assert max(jax.tree.leaves(rels)) < 2e-3, (block, rels)
        # boundary fields: f(t1, y1) and its exact trace
        f1, div1, f0, div0 = bnd
        dy1, ndiv1 = func(params, t1, (y1, logp1))
        assert maxrel(f1, dy1) < 5e-5, block
        assert maxrel(div1, -ndiv1) < 5e-5, block   # 3-pass bf16 rounding
        dy0, ndiv0 = func(params, t0, (y0, logp1))
        assert maxrel(f0, dy0) < 2e-3, block
        assert maxrel(div0, -ndiv0) < 2e-3, block


@pytest.mark.parametrize("cdim", [32, 128])
def test_cnf_adjoint_bwd_kernel_no_trace(cdim):
    """`with_trace=False` (the g-path: logp cotangent structurally zero)
    matches the XLA plain-field augmented integration. cdim=128 covers
    the deeper blocks of the condition pyramid (32/64/128), which round 5
    found silently on the XLA fallback when the kernel assumed 32."""
    from puflow_tpu.models.continuous import odenet_apply, odenet_init
    from puflow_tpu.models.ode import odeint_dopri5
    from puflow_tpu.ops.pallas.cnf_adjoint_pallas import \
        cnf_adjoint_bwd_pallas

    layers = odenet_init(jax.random.PRNGKey(0), 3, cdim)
    B, N = 1, 60
    c = jax.random.normal(jax.random.PRNGKey(1), (B, N, cdim)) * 0.5
    y1 = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3)) * 0.5
    a1 = jax.random.normal(jax.random.PRNGKey(3), (B, N, 3)) * 0.3
    t0, t1 = 0.0, 0.47

    params = {"layers": layers, "c": c}

    def func(p, t, yv):
        return odenet_apply(p["layers"], t, p["c"], yv)

    def aug_field(t, state):
        y, a, _g = state
        dy, vjp_fn = jax.vjp(lambda pp, yy: func(pp, t, yy), params, y)
        p_bar, y_bar = vjp_fn(a)
        return (dy, jax.tree.map(jnp.negative, y_bar),
                jax.tree.map(jnp.negative, p_bar))

    g0 = jax.tree.map(jnp.zeros_like, params)
    y0_ref, a0_ref, g_ref = odeint_dopri5(
        aug_field, (y1, a1, g0), t1, t0, 1e-5, 1e-5, 128,
        differentiable=False)

    ap = jnp.zeros((B, N, 1))
    y0, a0, dc, dlayers, bnd = cnf_adjoint_bwd_pallas(
        layers, c, y1, a1, ap, t0, t1, 1e-5, 1e-5, 128, True, None, False)

    def maxrel(a, b):
        return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8))

    assert maxrel(y0, y0_ref) < 2e-3
    assert maxrel(a0, a0_ref) < 2e-3
    assert maxrel(dc, g_ref["c"]) < 2e-3
    rels = jax.tree.map(maxrel, dlayers, g_ref["layers"])
    assert max(jax.tree.leaves(rels)) < 2e-3, rels


def test_plain_adjoint_inverse_grads_match_scan():
    """g-path gradients through the plain-field adjoint (round 5: the
    inverse discards logp, so its differentiable solve drops the
    divergence channel) == differentiating through the scan solver."""
    from puflow_tpu.models.continuous import field_plain_csl

    params, _ = continuous.init(KEY)
    block = params["flow_blocks"][0]
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 3)) * 0.4
    c = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 32)) * 0.4

    def loss_adj(blk):
        x = continuous.flow_block_inverse(blk, z, c, differentiable=True)
        return jnp.sum(x ** 2)

    def loss_scan(blk):
        T = blk["sqrt_end_time"] ** 2
        fn = field_plain_csl(blk["layers"], c)
        x = odeint_dopri5(fn, z, T, 0.0, 1e-5, 1e-5, 128,
                          differentiable=True)
        return jnp.sum(x ** 2)

    va, ga = jax.value_and_grad(loss_adj)(block)
    vs, gs = jax.value_and_grad(loss_scan)(block)
    assert abs(float(va) - float(vs)) < 1e-4
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8)),
        ga, gs)
    assert max(jax.tree.leaves(rel)) < 2e-2


def test_cnf_solve_logp_kernel_matches_xla_solver():
    """The fused dopri5 kernel WITH the exact-trace log-density channel
    (the default forward solver inside the adjoint custom_vjp on TPU,
    `models/continuous.py:_adjoint_for`) matches the XLA adaptive solver
    on the exact-trace field in interpret mode, both directions."""
    from puflow_tpu.models.continuous import (field_with_exact_div,
                                              odenet_init)
    from puflow_tpu.models.ode import odeint_dopri5
    from puflow_tpu.ops.pallas.cnf_pallas import cnf_solve_logp_pallas

    layers = odenet_init(jax.random.PRNGKey(0), 3, 32)
    B, N = 2, 100
    c = jax.random.normal(jax.random.PRNGKey(1), (B, N, 32)) * 0.5
    y = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3)) * 0.5
    logp0 = jax.random.normal(jax.random.PRNGKey(3), (B, N, 1)) * 0.1
    T = 0.47
    fn = field_with_exact_div(layers, c)
    for reverse in (False, True):
        t0, t1 = (T, 0.0) if reverse else (0.0, T)
        ref_y, ref_lp = odeint_dopri5(fn, (y, logp0), t0, t1, 1e-5, 1e-5,
                                      differentiable=False)
        # single-block and gridded (block_size=128: ragged last block —
        # per-block adaptive h differs from the global-norm XLA solver
        # only within solver tolerance)
        for block, tol in ((None, 5e-6), (128, 5e-5)):
            got_y, got_lp = cnf_solve_logp_pallas(
                layers, c, y, logp0, t0, t1, 1e-5, 1e-5, 128, True, block)
            assert float(jnp.abs(ref_y - got_y).max()) < tol, block
            assert float(jnp.abs(ref_lp - got_lp).max()) < tol, block
