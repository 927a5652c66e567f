"""Patch pipeline: extraction/merging/outlier-removal + end-to-end upsample."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puflow_tpu.inference.patch import (
    extract_patches,
    merge_patches,
    normalize_cloud,
    remove_outliers,
    upsample_cloud,
)

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"
KEY = jax.random.PRNGKey(0)


def _sphere_cloud(key, n):
    pts = jax.random.normal(key, (1, n, 3))
    return pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)


def test_normalize_cloud_unit_sphere():
    pc = jax.random.normal(KEY, (2, 100, 3)) * 5.0 + 3.0
    pc_n, centroid, furthest = normalize_cloud(pc)
    r = np.linalg.norm(np.asarray(pc_n), axis=-1)
    assert r.max() <= 1.0 + 1e-5
    np.testing.assert_allclose(np.asarray(pc_n * furthest + centroid), pc,
                               atol=1e-4)


def test_extract_patches_are_local():
    pc = _sphere_cloud(KEY, 512)
    patches = extract_patches(pc, n_patch=8, patch_size=64)
    assert patches.shape == (1, 8, 64, 3)
    # each patch's diameter should be far below the cloud's diameter (~2.0)
    p = np.asarray(patches)[0]
    diam = np.linalg.norm(p[:, :, None, :] - p[:, None, :, :], axis=-1).max(
        axis=(1, 2))
    assert (diam < 1.5).all()


def test_merge_patches_count_and_membership():
    pc = jax.random.normal(KEY, (1, 300, 3))
    out = merge_patches(pc, 100)
    assert out.shape == (1, 100, 3)
    # every output point is one of the inputs
    d = np.linalg.norm(
        np.asarray(out)[0][:, None] - np.asarray(pc)[0][None], axis=-1).min(1)
    assert d.max() < 1e-6


def test_remove_outliers():
    base = jax.random.normal(KEY, (1, 96, 3)) * 0.1
    spikes = jnp.ones((1, 4, 3)) * 50.0
    sr = jnp.concatenate([base[:, :50], spikes, base[:, 50:]], axis=1)
    cleaned = remove_outliers(sr, base, 4)
    assert cleaned.shape == (1, 96, 3)
    assert float(jnp.abs(cleaned).max()) < 10.0
    # original order preserved
    np.testing.assert_allclose(np.asarray(cleaned[:, :50]),
                               np.asarray(base[:, :50]))


@pytest.mark.skipif(not os.path.exists(CKPT), reason="no pretrained ckpt")
def test_upsample_cloud_end_to_end():
    from puflow_tpu.checkpoint import load_checkpoint

    params, state, sample_fn = load_checkpoint(CKPT, "discrete")
    model_params = (jax.tree.map(jnp.asarray, params),
                    jax.tree.map(jnp.asarray, state))
    pc = _sphere_cloud(jax.random.PRNGKey(7), 512)
    pred = upsample_cloud(model_params, pc, sample_fn, npoint=2048, upratio=4)
    assert pred.shape == (1, 2048, 3)
    # upsampled points should stay near the unit sphere surface
    r = np.linalg.norm(np.asarray(pred)[0], axis=-1)
    assert 0.7 < np.median(r) < 1.3
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.skipif(not os.path.exists(CKPT), reason="no pretrained ckpt")
def test_upsample_cli(tmp_path):
    from puflow_tpu.cli.upsample import main
    from puflow_tpu.utils.io import load_xyz, save_xyz

    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    # three clouds, two sizes: exercises the drain pipeline's
    # chunk-to-chunk overlap within a size group AND the pending batch
    # carried across the group boundary (256-group -> 320-group)
    for name, n in [("a.xyz", 256), ("b.xyz", 256), ("c.xyz", 320)]:
        pts = np.asarray(_sphere_cloud(jax.random.PRNGKey(9), n)[0])
        save_xyz(src / name, pts)

    main(["--source", str(src), "--target", str(dst), "--checkpoint", CKPT,
          "--up_ratio", "4", "--seed", "1"])
    for name, n in [("a.xyz", 256), ("b.xyz", 256), ("c.xyz", 320)]:
        out = load_xyz(str(dst / name))
        assert out.shape == (n * 4, 3)
        assert np.isfinite(out).all()


def test_checkpoint_npz_roundtrip(tmp_path):
    from puflow_tpu.checkpoint import load_npz_checkpoint, save_checkpoint

    params = {"a": np.ones((2, 3)), "blocks": [{"w": np.eye(2)},
                                               {"w": np.zeros((2, 2))}]}
    state = {"bn": {"mean": np.arange(4.0)}}
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, state)
    p2, s2 = load_npz_checkpoint(path)
    np.testing.assert_array_equal(p2["blocks"][1]["w"], np.zeros((2, 2)))
    np.testing.assert_array_equal(s2["bn"]["mean"], np.arange(4.0))
    assert isinstance(p2["blocks"], list)


def test_upsample_cloud_sharded_matches_single():
    """Cloud-axis sharding over 8 virtual devices == single device."""
    from puflow_tpu.inference.patch import upsample_cloud_sharded
    from puflow_tpu.models import discrete
    from puflow_tpu.parallel.mesh import make_mesh

    params, state = discrete.init(jax.random.PRNGKey(0))
    mp = (params, state)

    def sample_fn(mp_, patches, r):
        p, s = mp_
        return discrete.sample(p, s, patches, r)

    pc = jnp.concatenate(
        [_sphere_cloud(jax.random.PRNGKey(i), 128) for i in range(8)])
    single = upsample_cloud(mp, pc, sample_fn, 512, 4, 64, 4.0)
    mesh = make_mesh(jax.devices()[:8])
    sharded = upsample_cloud_sharded(mesh, mp, pc, sample_fn, 512, 4, 64,
                                     4.0)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=2e-4)


def test_merge_patches_approx_invariants():
    """Voxel pre-reduced merge: outputs are original points (nothing
    snapped), all distinct, and close (CD) to the exact merge."""
    from puflow_tpu.inference.patch import merge_patches, merge_patches_approx

    rng = np.random.RandomState(0)
    base = rng.randn(1024, 3).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # 5x overlapped union, like the patch-merge input
    pts = np.concatenate(
        [base + rng.randn(1024, 3).astype(np.float32) * 1e-3
         for _ in range(5)], 0)
    clouds = jnp.asarray(np.stack([pts, pts[::-1]]))        # [2, 5120, 3]

    exact = np.asarray(merge_patches(clouds, 1024))
    approx = np.asarray(merge_patches_approx(clouds, 1024, 2560))
    for b in range(2):
        src = np.asarray(clouds[b])
        # subset of original points (exact membership)
        d = np.abs(approx[b][:, None, :] - src[None]).sum(-1).min(1)
        assert d.max() == 0.0
        # all distinct
        uniq = np.unique(approx[b], axis=0)
        assert len(uniq) == approx[b].shape[0]
        # close to the exact merge
        dd = ((approx[b][:, None] - exact[b][None]) ** 2).sum(-1)
        cd = dd.min(1).mean() + dd.min(0).mean()
        assert cd < 5e-4, cd


def test_auto_merge_groups_rule():
    """Pin the merge auto-grouping schedule: small unions stay EXACT (the
    512-pt golden fixture's G=4 breached the fused 1e-3 gate), large
    unions group on >= 2048-candidate subsets up to G=16 (gate evidence
    in scripts/check_bench_scale_parity.py / check_fused_parity.py)."""
    from puflow_tpu.inference.patch import auto_merge_groups

    assert auto_merge_groups(8192) == 1       # 512-pt fixture union
    assert auto_merge_groups(16383) == 1
    assert auto_merge_groups(16384) == 8
    assert auto_merge_groups(32768) == 16     # bench shape union
    assert auto_merge_groups(79872) == 16     # PU-GAN 5000-pt cloud union
    assert auto_merge_groups(20480) == 10
    # Morton chunks need G to divide the candidate count
    for m in (16384, 20480, 32768, 79872):
        assert m % auto_merge_groups(m) == 0
