"""Invertible MovingBatchNorm: roundtrip, logdet, running-stat updates."""

import jax
import jax.numpy as jnp
import numpy as np

from puflow_tpu.flows.moving_bn import (
    moving_bn_forward,
    moving_bn_init,
    moving_bn_reverse,
)

KEY = jax.random.PRNGKey(0)


def test_eval_roundtrip_and_logdet():
    params, state = moving_bn_init(3)
    params = {"weight": jnp.asarray([0.2, -0.1, 0.3]),
              "bias": jnp.asarray([1.0, 0.0, -0.5])}
    state = {"mean": jnp.asarray([0.5, -0.5, 0.0]),
             "var": jnp.asarray([2.0, 0.5, 1.0]),
             "step": jnp.zeros((1,))}
    x = jax.random.normal(KEY, (4, 7, 3))
    logp = jnp.zeros((4, 7, 1))
    y, logp_f, _ = moving_bn_forward(params, state, x, logp, train=False)
    x2, logp_r = moving_bn_reverse(params, state, y, logp_f)
    # rtol because fp roundtrip error is relative to |x|; host libm exp/log
    # approximations differ (generic-Xeon XLA:CPU showed 7e-6 rel drift
    # before the reverse-by-division fix in moving_bn_reverse)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logp_r), 0.0, atol=1e-5)


def test_logdet_matches_jacobian():
    params, state = moving_bn_init(2)
    params = {"weight": jnp.asarray([0.3, -0.2]),
              "bias": jnp.asarray([0.1, 0.2])}
    state = {"mean": jnp.asarray([1.0, -1.0]),
             "var": jnp.asarray([4.0, 0.25]), "step": jnp.zeros((1,))}
    x = jnp.asarray([[[0.7, -0.3]]])
    logp = jnp.zeros((1, 1, 1))
    _, logp_f, _ = moving_bn_forward(params, state, x, logp, train=False)

    def fwd(v):
        y, _, _ = moving_bn_forward(params, state, v.reshape(1, 1, 2),
                                    train=False)
        return y.ravel()

    jac = jax.jacfwd(fwd)(x.ravel())
    want = -float(jnp.linalg.slogdet(jac)[1])  # logpx DECREASES by logdet
    # 1e-4: analytic logdet vs AD-jacobian slogdet differ by host libm
    # exp/log approximation error, not by formula
    np.testing.assert_allclose(float(logp_f[0, 0, 0]), want, rtol=1e-4)


def test_train_updates_running_stats():
    params, state = moving_bn_init(3)
    x = jax.random.normal(KEY, (16, 5, 3)) * 2.0 + 1.0
    _, _, new_state = moving_bn_forward(params, state, x, train=True)
    assert not np.allclose(np.asarray(new_state["mean"]), 0.0)
    assert float(new_state["step"][0]) == 1.0
    # decay-0.1 blend toward the batch stats
    xm = np.asarray(jnp.mean(x, axis=(0, 1)))
    np.testing.assert_allclose(np.asarray(new_state["mean"]), 0.1 * xm,
                               rtol=1e-5)
