"""Diffeq layer zoo + args-driven CNF chain construction surface.

Golden parity per conditional layer type against the reference torch
modules (`/root/reference/modules/continuous/diffeq_layers.py:12-103`),
nonlinearity selection vs `odefunc.py:51-59`, and
`build_model`/`sequential_flow_apply` invariants vs `flow.py:40-75` +
`cnf.py:9-30`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puflow_tpu.models import continuous

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
KEY = jax.random.PRNGKey(7)


def _ref_diffeq_layers():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from modules.continuous import diffeq_layers

    return diffeq_layers


def _copy_linear(t_linear, p):
    """Copy our {w: [in,out], b?} params into a torch nn.Linear."""
    with torch.no_grad():
        t_linear.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T))
        if t_linear.bias is not None:
            t_linear.bias.copy_(torch.from_numpy(np.asarray(p["b"])))


# torch module name + list of (torch submodule attr, our param key)
_LAYER_MAP = {
    "ignore": ("IgnoreLinear", [("_layer", "layer")]),
    "concat": ("ConcatLinear", [("_layer", "layer")]),
    "concat_v2": ("ConcatLinear_v2", [("_layer", "layer"),
                                      ("_hyper_bias", "hyper_bias")]),
    "squash": ("SquashLinear", [("_layer", "layer"), ("_hyper", "hyper")]),
    "scale": ("ScaleLinear", [("_layer", "layer"), ("_hyper", "hyper")]),
    "concatsquash": ("ConcatSquashLinear", [("_layer", "layer"),
                                            ("_hyper_bias", "hyper_bias"),
                                            ("_hyper_gate", "hyper_gate")]),
    "concatscale": ("ConcatScaleLinear", [("_layer", "layer"),
                                          ("_hyper_bias", "hyper_bias"),
                                          ("_hyper_gate", "hyper_gate")]),
}


@pytest.mark.parametrize("layer_type", sorted(continuous.DIFFEQ_LAYERS))
def test_layer_matches_torch_reference(layer_type):
    dl = _ref_diffeq_layers()
    dim_in, dim_out, dim_c = 3, 5, 4
    init_fn, apply_fn = continuous.DIFFEQ_LAYERS[layer_type]
    p = init_fn(KEY, dim_in, dim_out, dim_c)

    cls_name, mapping = _LAYER_MAP[layer_type]
    t_layer = getattr(dl, cls_name)(dim_in, dim_out, dim_c)
    for attr, key in mapping:
        _copy_linear(getattr(t_layer, attr), p[key])

    rng = np.random.RandomState(0)
    # 2-D inputs: the torch layers' 3-D branches assume a rank-2 context
    # and are unreachable from ODEfunc (which always passes rank-matched
    # [B, N, 1+c] context) — rank-2 exercises the shared math.
    x = rng.randn(6, dim_in).astype(np.float32)
    ctx = rng.randn(6, dim_c + 1).astype(np.float32)

    if layer_type == "concat":
        # reference ConcatLinear only accepts rank-3 x + rank-2 context
        # (hard-coded `dim=2` cat + unsqueeze-expand, `diffeq_layers.py:
        # 27-29`) and has a dead third positional arg (`:26`)
        x3 = rng.randn(6, 5, dim_in).astype(np.float32)
        ctx_full = np.broadcast_to(ctx[:, None, :], (6, 5, dim_c + 1))
        ours = np.asarray(apply_fn(p, jnp.asarray(ctx_full),
                                   jnp.asarray(x3)))
        with torch.no_grad():
            ref = t_layer(torch.from_numpy(ctx), torch.from_numpy(x3),
                          None)
    else:
        ours = np.asarray(apply_fn(p, jnp.asarray(ctx), jnp.asarray(x)))
        with torch.no_grad():
            ref = t_layer(torch.from_numpy(ctx), torch.from_numpy(x))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


@pytest.mark.parametrize("nl", continuous.NONLINEARITIES)
def test_odenet_nonlinearity_matches_torch(nl):
    dl = _ref_diffeq_layers()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from modules.continuous import odefunc as ref_odefunc

    dim, cdim = 3, 4
    layers = continuous.odenet_init(KEY, dim, cdim, hdims=(8, 8),
                                    nonlinearity=nl)
    raw = layers["layers"] if isinstance(layers, dict) else layers

    t_net = ref_odefunc.ODEnet((8, 8), (dim,), cdim,
                               layer_type="concatsquash", nonlinearity=nl)
    for t_layer, p in zip(t_net.layers, raw):
        for attr, key in _LAYER_MAP["concatsquash"][1]:
            _copy_linear(getattr(t_layer, attr), p[key])

    rng = np.random.RandomState(1)
    y = rng.randn(2, 6, dim).astype(np.float32)
    c = rng.randn(2, 6, cdim).astype(np.float32)
    t = 0.37
    ctx = np.concatenate([np.full((2, 6, 1), t, np.float32), c], -1)

    ours = np.asarray(continuous.odenet_apply(
        layers, t, jnp.asarray(c), jnp.asarray(y), nonlinearity=nl))
    with torch.no_grad():
        ref = t_net(torch.from_numpy(ctx), torch.from_numpy(y))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("layer_type", sorted(continuous.DIFFEQ_LAYERS))
def test_cnf_block_roundtrip_every_layer_type(layer_type):
    """forward then inverse through one CNF block recovers the input for
    every layer type (solver-tolerance-level agreement)."""
    cdim = 4
    block = continuous.flow_block_init(KEY, cdim, layer_type=layer_type,
                                       nonlinearity="softplus")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 3)) * 0.5
    c = jax.random.normal(jax.random.PRNGKey(2), (2, 16, cdim)) * 0.5
    z, _ = continuous.flow_block_forward(block, x, c, differentiable=False,
                                         layer_type=layer_type,
                                         nonlinearity="softplus")
    x_rec = continuous.flow_block_inverse(block, z, c,
                                          layer_type=layer_type,
                                          nonlinearity="softplus")
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)


class TestBuildModel:
    def test_chain_layout_with_batch_norm(self):
        cfg = continuous.CNFChainConfig(batch_norm=True)
        chain, state = continuous.build_model(KEY, 3, (16,), 4, 3, cfg=cfg)
        kinds = [k for k, _ in chain]
        # bn, (cnf, bn) x 3  (reference flow.py:65-72)
        assert kinds == ["bn", "cnf", "bn", "cnf", "bn", "cnf", "bn"]

    def test_unconditional_chain_runs(self):
        chain, state = continuous.build_model(KEY, 3, (16,), 0, 2,
                                              conditional=False)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 3)) * 0.3
        y, lp, _ = continuous.sequential_flow_apply(chain, state, x)
        assert y.shape == x.shape and lp.shape == (2, 8, 1)

    def test_forward_reverse_roundtrip_with_bn(self):
        cfg = continuous.CNFChainConfig(batch_norm=True)
        chain, state = continuous.build_model(KEY, 3, (16,), 4, 2, cfg=cfg)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 3)) * 0.4
        c = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 4)) * 0.4
        # eval-mode BN uses running stats in both directions -> exactly
        # invertible; CNFs invert to solver tolerance
        z, lp_f, _ = continuous.sequential_flow_apply(chain, state, x, c)
        x_rec, lp_r, _ = continuous.sequential_flow_apply(
            chain, state, z, c, logpx=lp_f, reverse=True)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                                   atol=2e-3)
        # delta-logp cancels on the roundtrip
        np.testing.assert_allclose(np.asarray(lp_r), 0.0, atol=2e-3)

    def test_count_total_time(self):
        cfg = continuous.CNFChainConfig(time_length=0.25)
        chain, _ = continuous.build_model(KEY, 3, (8,), 0, 4,
                                          conditional=False, cfg=cfg)
        np.testing.assert_allclose(
            float(continuous.count_total_time(chain)), 1.0, rtol=1e-6)

    def test_count_total_time_model_params(self):
        params, _ = continuous.init(jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(continuous.count_total_time(params)),
            continuous.NUM_BLOCKS * continuous.T_INIT, rtol=1e-5)
