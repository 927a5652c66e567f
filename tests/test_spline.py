"""Spline transforms: roundtrip, exact log-dets, identity tails, coupling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puflow_tpu.flows.spline import (
    cubic_spline,
    rational_linear_spline,
    rational_quadratic_spline,
)
from puflow_tpu.flows.spline_coupling import (
    spline_coupling_forward,
    spline_coupling_init,
    spline_coupling_inverse,
)

KEY = jax.random.PRNGKey(0)
NB = 8  # bins (small for tests)


def _params(key, shape, n):
    return jax.random.normal(key, shape + (n,)) * 0.5


def _apply(spline, x, inverse, key):
    k0, k1, k2, k3 = jax.random.split(key, 4)
    shape = x.shape
    uw = _params(k0, shape, NB)
    uh = _params(k1, shape, NB)
    if spline == "quadratic":
        ud = _params(k2, shape, NB - 1)
        return rational_quadratic_spline(x, uw, uh, ud, inverse,
                                         num_bins=NB, tail_bound=3.0)
    if spline == "linear-rational":
        ud = _params(k2, shape, NB - 1)
        ul = _params(k3, shape, NB)
        return rational_linear_spline(x, uw, uh, ud, ul, inverse,
                                      num_bins=NB, tail_bound=3.0)
    dl = _params(k2, shape, 1)
    dr = _params(k3, shape, 1)
    return cubic_spline(x, uw, uh, dl, dr, inverse, num_bins=NB,
                        tail_bound=3.0)


@pytest.mark.parametrize("spline", ["quadratic", "linear-rational", "cubic"])
class TestSplines:
    def test_roundtrip(self, spline):
        x = jnp.linspace(-2.9, 2.9, 64).reshape(4, 16)
        y, ld_f = _apply(spline, x, False, KEY)
        x2, ld_i = _apply(spline, y, True, KEY)
        atol = 2e-2 if spline == "cubic" else 1e-4
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
        np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=atol)

    def test_monotone(self, spline):
        # one shared parameter set across a dense grid of inputs: the map
        # must be strictly increasing
        n = 512
        x = jnp.linspace(-2.99, 2.99, n).reshape(1, n)
        k = jax.random.split(jax.random.PRNGKey(7), 4)

        def shared(key, m):
            return jnp.broadcast_to(_params(key, (1, 1), m), (1, n, m))

        uw, uh = shared(k[0], NB), shared(k[1], NB)
        if spline == "quadratic":
            y, _ = rational_quadratic_spline(
                x, uw, uh, shared(k[2], NB - 1), False, num_bins=NB,
                tail_bound=3.0)
        elif spline == "linear-rational":
            y, _ = rational_linear_spline(
                x, uw, uh, shared(k[2], NB - 1), shared(k[3], NB), False,
                num_bins=NB, tail_bound=3.0)
        else:
            y, _ = cubic_spline(x, uw, uh, shared(k[2], 1), shared(k[3], 1),
                                False, num_bins=NB, tail_bound=3.0)
        assert (np.diff(np.asarray(y)[0]) > 0).all()

    def test_logdet_vs_jacfwd(self, spline):
        x = jnp.asarray([[0.3, -1.2, 2.1, -0.05]])

        def fwd(v):
            y, _ = _apply(spline, v, False, KEY)
            return y

        _, ld = _apply(spline, x, False, KEY)
        jac = jax.jacfwd(lambda v: fwd(v).ravel())(x).reshape(4, -1, 4)
        diag = jnp.diagonal(jac[:, 0, :][None], axis1=1, axis2=2)
        # transform is elementwise: logdet per element = log|dy/dx|
        got = np.asarray(ld).ravel()
        want = np.log(np.abs(np.asarray(
            [jac[i, 0, i] for i in range(4)])))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_identity_tails(self, spline):
        x = jnp.asarray([[-10.0, 4.5, 100.0]])
        y, ld = _apply(spline, x, False, KEY)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(ld), 0.0)


def test_spline_coupling_roundtrip():
    from puflow_tpu.flows.spline_coupling import NUM_BINS  # noqa: F401

    p = spline_coupling_init(KEY, dim_in=2, dim_h=16, dim_out=2, dim_c=5,
                             spline="quadratic")
    # kick the zero-initialised head so the transform is non-trivial
    p["transform_net"]["w2"] = (
        jax.random.normal(KEY, p["transform_net"]["w2"].shape) * 0.3)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 11, 4))
    c = jax.random.normal(jax.random.PRNGKey(2), (3, 11, 5))
    z, ld_f = spline_coupling_forward(p, x, c, split=2)
    assert not np.allclose(np.asarray(z[..., 2:]), np.asarray(x[..., 2:]))
    x2, ld_i = spline_coupling_inverse(p, z, c, split=2)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-4)
