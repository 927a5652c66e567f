"""Real-TPU gradient parity + timing of the fused adjoint-backward kernel.

Compares grads of a CNF flow-block loss under (a) the shipped path (fused
backward kernel) vs (b) the XLA augmented-field backward, both on the TPU,
plus per-step timing of each. Complements the interpret-mode math parity
test (tests/test_cnf.py) with an on-hardware check.

Usage: python scripts/exp_cnf_bwd_tpu_check.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.models import continuous
from puflow_tpu.models.ode import make_adjoint_odeint


def main():
    params, _ = continuous.init(jax.random.PRNGKey(0))
    block = params["flow_blocks"][0]
    B, N = 32, 256
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3)) * 0.4
    c = jax.random.normal(jax.random.PRNGKey(2), (B, N, 32)) * 0.4

    def loss(blk, solver):
        T = blk["sqrt_end_time"] ** 2
        logp0 = jnp.zeros(x.shape[:-1] + (1,))
        y1, logp1 = solver({"layers": blk["layers"], "c": c}, (x, logp0),
                           0.0, T)
        return jnp.sum(y1 ** 2) + jnp.sum(logp1)

    fused_solver = continuous._adjoint_for("concatsquash", "tanh")
    # XLA-only instance: same field, no kernel overrides
    from puflow_tpu.models.continuous import RTOL, ATOL, MAX_STEPS_EVAL

    def _field(p, t, state):
        yv, _ = state
        lys, cc = p["layers"], p["c"]

        def f_only(yy):
            return continuous.odenet_apply(lys, t, cc, yy)

        dy = f_only(yv)
        div = jnp.zeros(yv.shape[:-1], dtype=yv.dtype)
        for i in range(3):
            e = jnp.zeros_like(yv).at[..., i].set(1.0)
            _, je = jax.jvp(f_only, (yv,), (e,))
            div = div + je[..., i]
        return dy, -div[..., None]

    xla_solver = make_adjoint_odeint(_field, RTOL, ATOL, MAX_STEPS_EVAL)

    g_fused_fn = jax.jit(jax.value_and_grad(lambda b: loss(b, fused_solver)))
    g_xla_fn = jax.jit(jax.value_and_grad(lambda b: loss(b, xla_solver)))

    v_f, g_f = g_fused_fn(block)
    v_x, g_x = g_xla_fn(block)
    jax.block_until_ready((g_f, g_x))

    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8)),
        g_f, g_x)
    print(f"loss fused {float(v_f):.6f}  xla {float(v_x):.6f}")
    print("max rel grad delta:", max(jax.tree.leaves(rel)))
    print(jax.tree.map(lambda r: round(r, 5), rel))

    for name, fn in (("fused", g_fused_fn), ("xla", g_xla_fn)):
        np.asarray(fn(block)[0])
        iters = 10
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = [fn(block) for _ in range(iters)]
            np.asarray(outs[-1][0])
            best = min(best, (time.time() - t0) / iters)
        print(f"{name:>5s}: {best*1e3:8.2f} ms / fwd+bwd block-solve "
              f"(B={B}, N={N})")


if __name__ == "__main__":
    main()
