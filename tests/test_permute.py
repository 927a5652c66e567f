"""Point-order serialisation utilities."""

import numpy as np

from puflow_tpu.utils.permute import (
    PermutateHelper,
    lr_hr_matching,
    permute_by_folding,
    permute_by_grid,
    permute_by_matching,
    permute_by_matching2,
    save_folding_params,
)


def test_permute_by_grid_is_permutation():
    rng = np.random.RandomState(0)
    pts = (rng.rand(2, 100, 3).astype(np.float32) - 0.5) * 0.99
    for method in ("distance", "nearest"):
        idx = permute_by_grid(pts, method, is_return_idx=True)
        assert idx.shape == (2, 100)
        for b in range(2):
            assert sorted(idx[b].tolist()) == list(range(100))
        out = permute_by_grid(pts, method)
        np.testing.assert_allclose(np.sort(out.ravel()),
                                   np.sort(pts.ravel()))


def test_grid_order_groups_cells():
    # two well-separated clusters -> serialisation keeps each contiguous
    a = np.full((50, 3), -0.4, dtype=np.float32)
    b = np.full((50, 3), 0.4, dtype=np.float32)
    pts = np.concatenate([b, a])[None]  # clusters interleaved in input
    out = permute_by_grid(pts, "nearest", n_grid=4)
    first_half = out[0, :50]
    assert (np.abs(first_half - first_half[0]) < 1e-6).all()


def test_lr_hr_matching_shapes():
    rng = np.random.RandomState(1)
    lr = rng.rand(2, 10, 3).astype(np.float32)
    sr = rng.rand(2, 40, 3).astype(np.float32)
    idx = lr_hr_matching(lr, sr, 4)
    assert idx.shape == (2, 10, 4)
    # first neighbour is the closest
    d = ((lr[:, :, None] - sr[:, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx[..., 0], d.argmin(-1))


def test_permute_by_matching():
    rng = np.random.RandomState(2)
    lr = (rng.rand(1, 8, 3).astype(np.float32) - 0.5) * 1.8
    sr = (rng.rand(1, 32, 3).astype(np.float32) - 0.5) * 1.8
    lr_s, new_sr = permute_by_matching(lr, sr, k=4)
    assert lr_s.shape == (1, 8, 3)
    assert new_sr.shape == (1, 32, 3)


def test_permute_by_matching2_indices():
    rng = np.random.RandomState(4)
    lr = (rng.rand(1, 8, 3).astype(np.float32) - 0.5) * 1.8
    sr = (rng.rand(1, 32, 3).astype(np.float32) - 0.5) * 1.8
    lr_s, idx_lr, new_sr = permute_by_matching2(lr, sr, k=4)
    assert lr_s.shape == (1, 8, 3) and new_sr.shape == (1, 32, 3)
    # returned indices reproduce the serialised LR cloud
    np.testing.assert_allclose(
        np.take_along_axis(lr, idx_lr[:, :, None], axis=1), lr_s,
        atol=1e-6)
    # agrees with permute_by_matching on the HR ordering
    lr_s1, new_sr1 = permute_by_matching(lr, sr, k=4)
    np.testing.assert_allclose(lr_s, lr_s1, atol=1e-6)
    np.testing.assert_allclose(new_sr, new_sr1, atol=1e-6)
    # is_return_idx adds the full argsorted distance table
    _, _, _, nearest = permute_by_matching2(lr, sr, k=4,
                                            is_return_idx=True)
    assert nearest.shape == (1, 8, 32)


def test_permute_by_folding_reference_index_algebra():
    """With a hand-built folding_fn the output must reproduce the
    reference's sorted_idx = invperm(argsort(nearest)) gather exactly
    (`/root/reference/modules/utils/permute.py:144-151`)."""
    rng = np.random.RandomState(5)
    pts = rng.rand(2, 20, 3).astype(np.float32)
    ref_pts = rng.rand(2, 7, 3).astype(np.float32)

    out = permute_by_folding(pts, lambda p: ref_pts)

    d = ((pts[:, :, None] - ref_pts[:, None]) ** 2).sum(-1)
    nearest = d.argmin(-1)
    for b in range(2):
        order = np.argsort(nearest[b], kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(20)
        np.testing.assert_allclose(out[b], pts[b][inv])
    # output is a permutation of the input
    np.testing.assert_allclose(np.sort(out.ravel()), np.sort(pts.ravel()))


def test_folding_net_trains_and_helper_roundtrips(tmp_path):
    import jax

    from puflow_tpu.utils.folding import (
        folding_net_apply,
        folding_net_init,
        train_folding_net,
    )

    rng = np.random.RandomState(6)
    # one simple cloud: points on a plane patch
    uv = rng.rand(1, 128, 2).astype(np.float32) * 2 - 1
    clouds = np.concatenate([uv, 0.1 * uv[..., :1]], axis=-1)

    params, loss = train_folding_net(jax.random.PRNGKey(0), clouds,
                                     steps=150, lr=3e-3)
    init_loss_params = folding_net_init(jax.random.PRNGKey(0))
    from puflow_tpu.ops.chamfer import chamfer_distance

    init_loss = float(chamfer_distance(
        folding_net_apply(init_loss_params, clouds), clouds))
    assert loss < init_loss  # training reduces reconstruction chamfer

    # canonical order: reference points don't depend on input point order
    perm = rng.permutation(128)
    ref_a = np.asarray(folding_net_apply(params, clouds))
    ref_b = np.asarray(folding_net_apply(params, clouds[:, perm]))
    np.testing.assert_allclose(ref_a, ref_b, atol=1e-5)

    # helper folding mode via saved params file
    path = str(tmp_path / "folding.npz")
    save_folding_params(path, params)
    h = PermutateHelper()
    h.permutebyfolding(path)
    out = h.permute(clouds)
    np.testing.assert_allclose(np.sort(out.ravel()),
                               np.sort(clouds.ravel()), atol=1e-6)
    # identical result to the in-memory callable
    import functools

    h2 = PermutateHelper()
    h2.permutebyfolding(functools.partial(folding_net_apply, params))
    np.testing.assert_allclose(out, h2.permute(clouds), atol=1e-6)


def test_helper_roundtrip_values():
    rng = np.random.RandomState(3)
    pts = (rng.rand(1, 64, 3).astype(np.float32) - 0.5) * 1.9
    h = PermutateHelper()
    assert np.array_equal(h.permute(pts), pts)  # no-op without mode
    h.permutebygrid("distance", 16)
    out = h.permute(pts)
    np.testing.assert_allclose(np.sort(out.ravel()), np.sort(pts.ravel()),
                               atol=1e-6)
