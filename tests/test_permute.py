"""Point-order serialisation utilities."""

import numpy as np

from puflow_tpu.utils.permute import (
    PermutateHelper,
    lr_hr_matching,
    permute_by_grid,
    permute_by_matching,
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


def test_helper_roundtrip_values():
    rng = np.random.RandomState(3)
    pts = (rng.rand(1, 64, 3).astype(np.float32) - 0.5) * 1.9
    h = PermutateHelper()
    assert np.array_equal(h.permute(pts), pts)  # no-op without mode
    h.permutebygrid("distance", 16)
    out = h.permute(pts)
    np.testing.assert_allclose(np.sort(out.ravel()), np.sort(pts.ravel()),
                               atol=1e-6)
