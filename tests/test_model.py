"""Discrete model: shapes, invertibility, and parameter-count parity."""

import jax
import jax.numpy as jnp
import numpy as np

from puflow_tpu.models import discrete

KEY = jax.random.PRNGKey(0)


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_param_count_matches_reference():
    # Reference checkpoint `pretrain/puflow-x4-pu1k.pt` holds 808,287 numbers:
    # 806,103 trainable weights + 2,148 BatchNorm buffers (running mean/var +
    # num_batches_tracked scalars) + 36 permutation index ints (6 blocks x
    # direct/inverse x 3). Here: weights -> params, BN mean/var -> state,
    # permutation indices are static, num_batches_tracked has no equivalent.
    params, state = discrete.init(KEY)
    assert n_params(params) == 806_103

    paths = [
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(state)[0]
    ]
    n_bn_layers = sum(1 for p in paths if p.endswith("mean"))
    assert n_params(state) + n_bn_layers + 36 + n_params(params) == 808_287


def test_forward_shapes_and_grad_flow():
    params, state = discrete.init(KEY)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 3)) - 0.5
    dense, logpx, new_state = discrete.forward(params, state, xyz, upratio=4,
                                               train=True)
    assert dense.shape == (2, 256, 3)
    assert np.isfinite(float(logpx))
    assert not np.isnan(np.asarray(dense)).any()
    # BN state actually updated in train mode
    s0 = state["interp"]["weight_unit"]["bn0"]["mean"]
    s1 = new_state["interp"]["weight_unit"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(s0), np.asarray(s1))


def test_f_g_roundtrip():
    """g is the exact inverse of f for upratio=1 with identity interp."""
    params, state = discrete.init(KEY)
    params = jax.tree.map(
        lambda x: x if x.ndim != 2 else x, params)  # no-op; params as-is
    xyz = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 3)) - 0.5
    knn_idx = jax.random.randint(jax.random.PRNGKey(3), (2, 32, 16), 0, 32)
    cs, _ = discrete.feat_extract(params, state, xyz, knn_idx, train=False)
    z, logdet = discrete.f_transform(params, xyz, cs)
    assert z.shape == xyz.shape
    # pack z as [B, N, C, r=1] and invert
    x_rec = discrete.g_transform(params, z[..., None], cs, upratio=1)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(xyz), atol=1e-4)


def test_actnorm_warmup_initialises_all_blocks():
    params, state = discrete.init(KEY)
    xyz = jax.random.uniform(jax.random.PRNGKey(4), (4, 64, 3)) * 2.0
    params2 = discrete.actnorm_warmup(params, state, xyz)
    for blk, blk2 in zip(params["flow_blocks"], params2["flow_blocks"]):
        assert not np.allclose(np.asarray(blk["actnorm"]["logs"]),
                               np.asarray(blk2["actnorm"]["logs"]))


def test_sample_deterministic():
    params, state = discrete.init(KEY)
    xyz = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 3)) - 0.5
    d1 = discrete.sample(params, state, xyz, upratio=4)
    d2 = discrete.sample(params, state, xyz, upratio=4)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def test_bn_folding_matches_eval_forward():
    """Folded params produce the same eval outputs as live BN."""
    from puflow_tpu.models.fold_bn import fold_bn_inference

    params, state = discrete.init(KEY)
    # give BN nontrivial running stats
    state = jax.tree.map(
        lambda x: x + 0.3 * jnp.abs(jax.random.normal(KEY, x.shape)), state)
    folded = fold_bn_inference(params, state)
    xyz = jax.random.uniform(jax.random.PRNGKey(6), (2, 64, 3)) - 0.5
    a = discrete.sample(params, state, xyz, upratio=4)
    b = discrete.sample(folded, state, xyz, upratio=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_high_upratio_x16():
    """r_max=32 head supports any ratio in [1, 32] (reference slices the
    weight logits the same way, `interpflow.py:180`)."""
    params, state = discrete.init(KEY)
    xyz = jax.random.uniform(jax.random.PRNGKey(7), (1, 32, 3)) - 0.5
    d = discrete.sample(params, state, xyz, upratio=16)
    assert d.shape == (1, 512, 3)
    assert np.isfinite(np.asarray(d)).all()
