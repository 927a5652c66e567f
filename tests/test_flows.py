"""Round-trip and log-det correctness for every flow primitive.

The log-det checks compare against the exact Jacobian determinant computed by
`jax.jacfwd` on small dimensions — the oracle the reference repo never had.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puflow_tpu.flows import (
    actnorm_forward,
    actnorm_init,
    actnorm_init_from_data,
    actnorm_inverse,
    additive_coupling_forward,
    additive_coupling_inverse,
    affine_coupling_forward,
    affine_coupling_inverse,
    affine_injector_forward,
    affine_injector_inverse,
    inv1x1_forward,
    inv1x1_init,
    inv1x1_inverse,
    linear_a1d_init,
    standard_gaussian_logp,
)
from puflow_tpu.models.discrete import (
    flow_block_forward,
    flow_block_init,
    flow_block_inverse,
)

KEY = jax.random.PRNGKey(0)
B, N, C = 4, 17, 3


def _rand(key, shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


def exact_logdet(fn, x_flat):
    """log|det d fn / dx| for a flat vector input."""
    jac = jax.jacfwd(fn)(x_flat)
    return jnp.linalg.slogdet(jac)[1]


class TestActNorm:
    def test_roundtrip(self):
        p = actnorm_init(C)
        p = {"logs": _rand(KEY, (1, 1, C)) * 0.3, "bias": _rand(KEY, (1, 1, C))}
        x = _rand(jax.random.PRNGKey(1), (B, N, C))
        z, ld_f = actnorm_forward(p, x)
        x2, ld_i = actnorm_inverse(p, z)
        np.testing.assert_allclose(x2, x, atol=1e-4)
        np.testing.assert_allclose(ld_f + ld_i, 0.0, atol=1e-5)

    def test_logdet_exact(self):
        p = {"logs": _rand(KEY, (1, 1, C)) * 0.3, "bias": _rand(KEY, (1, 1, C))}
        x = _rand(jax.random.PRNGKey(2), (1, N, C))

        def fn(v):
            z, _ = actnorm_forward(p, v.reshape(1, N, C))
            return z.reshape(-1)

        _, ld = actnorm_forward(p, x)
        np.testing.assert_allclose(ld, exact_logdet(fn, x.reshape(-1)),
                                   rtol=1e-4, atol=1e-4)

    def test_data_init_matches_reference_semantics(self):
        # Reference init (`normalize.py:45-54`) gives z = x/std - mean, i.e.
        # unit variance but NOT zero mean (bias is -mean, not -mean/std).
        x = _rand(jax.random.PRNGKey(3), (32, 64, C)) * 3.0 + 1.5
        p = actnorm_init_from_data(x)
        z, _ = actnorm_forward(p, x)
        xn = np.asarray(x)
        mean, std = xn.mean(axis=(0, 1)), xn.std(axis=(0, 1), ddof=1)
        np.testing.assert_allclose(np.std(np.asarray(z), axis=(0, 1)), 1.0,
                                   atol=1e-2)
        np.testing.assert_allclose(np.mean(np.asarray(z), axis=(0, 1)),
                                   mean / std - mean, atol=1e-3)


class TestInv1x1:
    def test_roundtrip_and_logdet(self):
        p = inv1x1_init(KEY, C)
        x = _rand(jax.random.PRNGKey(4), (B, N, C))
        z, ld_f = inv1x1_forward(p, x)
        x2, ld_i = inv1x1_inverse(p, z)
        np.testing.assert_allclose(x2, x, atol=1e-5)
        np.testing.assert_allclose(ld_f + ld_i, 0.0, atol=1e-5)

        def fn(v):
            z, _ = inv1x1_forward(p, v.reshape(1, N, C))
            return z.reshape(-1)

        x1 = x[:1]
        _, ld = inv1x1_forward(p, x1)
        np.testing.assert_allclose(ld, exact_logdet(fn, x1.reshape(-1)),
                                   rtol=1e-4, atol=1e-4)

    def test_orthogonal_init(self):
        p = inv1x1_init(KEY, 8)
        w = np.asarray(p["W"])
        np.testing.assert_allclose(w @ w.T, np.eye(8), atol=1e-5)


class TestCouplings:
    def setup_method(self):
        cdim = 5
        k0, k1, k2 = jax.random.split(KEY, 3)
        self.c = _rand(k0, (B, N, cdim))
        self.add_p = {"bias_net": linear_a1d_init(k1, 1, 16, 2, cdim)}
        # perturb the zero-initialised last layer so the transform is nontrivial
        self.add_p["bias_net"]["w2"] = _rand(k1, (16, 2)) * 0.1
        self.aff_p = {
            "scale_net": linear_a1d_init(k1, 1, 16, 2, cdim),
            "bias_net": linear_a1d_init(k2, 1, 16, 2, cdim),
        }
        self.aff_p["scale_net"]["w2"] = _rand(k2, (16, 2)) * 0.1
        self.aff_p["bias_net"]["w2"] = _rand(k0, (16, 2)) * 0.1
        self.inj_p = {
            "scale_net": linear_a1d_init(k1, cdim, 16, C),
            "bias_net": linear_a1d_init(k2, cdim, 16, C),
        }
        self.inj_p["scale_net"]["w2"] = _rand(k2, (16, C)) * 0.1
        self.inj_p["bias_net"]["w2"] = _rand(k1, (16, C)) * 0.1

    def test_additive_roundtrip(self):
        x = _rand(jax.random.PRNGKey(5), (B, N, C))
        z, ld = additive_coupling_forward(self.add_p, x, self.c, split=1)
        assert ld is None
        x2, _ = additive_coupling_inverse(self.add_p, z, self.c, split=1)
        np.testing.assert_allclose(x2, x, atol=1e-5)
        # h1 passes through untouched
        np.testing.assert_allclose(z[..., :1], x[..., :1])

    def test_affine_roundtrip_and_logdet(self):
        x = _rand(jax.random.PRNGKey(6), (1, N, C))
        z, ld_f = affine_coupling_forward(self.aff_p, x, self.c[:1], split=1)
        x2, ld_i = affine_coupling_inverse(self.aff_p, z, self.c[:1], split=1)
        np.testing.assert_allclose(x2, x, atol=1e-5)
        np.testing.assert_allclose(ld_f + ld_i, 0.0, atol=1e-5)

        def fn(v):
            z, _ = affine_coupling_forward(
                self.aff_p, v.reshape(1, N, C), self.c[:1], split=1)
            return z.reshape(-1)

        np.testing.assert_allclose(ld_f[0], exact_logdet(fn, x.reshape(-1)),
                                   rtol=1e-3, atol=1e-4)

    def test_injector_roundtrip_and_logdet(self):
        x = _rand(jax.random.PRNGKey(7), (1, N, C))
        z, ld_f = affine_injector_forward(self.inj_p, x, self.c[:1])
        x2, ld_i = affine_injector_inverse(self.inj_p, z, self.c[:1])
        np.testing.assert_allclose(x2, x, atol=1e-5)
        np.testing.assert_allclose(ld_f + ld_i, 0.0, atol=1e-5)

        def fn(v):
            z, _ = affine_injector_forward(
                self.inj_p, v.reshape(1, N, C), self.c[:1])
            return z.reshape(-1)

        np.testing.assert_allclose(ld_f[0], exact_logdet(fn, x.reshape(-1)),
                                   rtol=1e-3, atol=1e-4)


class TestFlowBlock:
    @pytest.mark.parametrize("is_even", [True, False])
    def test_roundtrip(self, is_even):
        cdim = 32
        p = flow_block_init(KEY, cdim, is_even)
        # kick the zero-init nets so the block is a nontrivial bijection
        p["coupling2"]["scale_net"]["w2"] = (
            _rand(KEY, p["coupling2"]["scale_net"]["w2"].shape) * 0.1)
        c = _rand(jax.random.PRNGKey(8), (B, N, cdim))
        x = _rand(jax.random.PRNGKey(9), (B, N, C))
        z, ld = flow_block_forward(p, x, c, is_even)
        assert z.shape == x.shape
        x2 = flow_block_inverse(p, z, c, is_even)
        np.testing.assert_allclose(x2, x, atol=1e-4)

    def test_logdet_exact(self):
        cdim = 8
        p = flow_block_init(KEY, cdim, True)
        p["coupling2"]["scale_net"]["w2"] = (
            _rand(KEY, p["coupling2"]["scale_net"]["w2"].shape) * 0.1)
        n = 5
        c = _rand(jax.random.PRNGKey(10), (1, n, cdim))
        x = _rand(jax.random.PRNGKey(11), (1, n, C))
        _, ld = flow_block_forward(p, x, c, True)

        def fn(v):
            z, _ = flow_block_forward(p, v.reshape(1, n, C), c, True)
            return z.reshape(-1)

        np.testing.assert_allclose(ld[0], exact_logdet(fn, x.reshape(-1)),
                                   rtol=1e-3, atol=1e-4)


def test_gaussian_logp():
    z = _rand(KEY, (B, N, C))
    got = standard_gaussian_logp(z)
    z_np = np.asarray(z).reshape(B, -1)
    want = -0.5 * (z_np**2 + np.log(2 * np.pi)).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_affine_ex_roundtrip():
    from puflow_tpu.flows.coupling import (
        affine_ex_coupling_forward,
        affine_ex_coupling_inverse,
        linear_a1d_init,
    )

    cdim = 5
    k0, k1, k2, k3 = jax.random.split(KEY, 4)
    p = {
        "g1": linear_a1d_init(k0, 2, 16, 1),        # h2 -> h1 update
        "g2": linear_a1d_init(k1, 1, 16, 2, cdim),  # scale
        "g3": linear_a1d_init(k2, 1, 16, 2, cdim),  # bias
    }
    for net in ("g1", "g2", "g3"):
        p[net]["w2"] = _rand(k3, p[net]["w2"].shape) * 0.1
    c = _rand(k0, (B, N, cdim))
    x = _rand(k1, (B, N, C))
    z, ld_f = affine_ex_coupling_forward(p, x, c, split=1)
    x2, ld_i = affine_ex_coupling_inverse(p, z, c, split=1)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-4)


def test_random_permutation_indices():
    from puflow_tpu.flows.permutate import invert_indices, random_indices

    idx = random_indices(7, 16)
    assert sorted(idx) == list(range(16))
    inv = invert_indices(idx)
    x = _rand(KEY, (2, 5, 16))
    y = x[..., list(idx)][..., list(inv)]
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
