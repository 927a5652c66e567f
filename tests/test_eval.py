"""Evaluation metrics: approxmatch EMD, JSD, evaluate CLI end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from puflow_tpu.eval.jsd import (
    jensen_shannon_divergence,
    jsd_between_point_cloud_sets,
    unit_cube_grid,
)
from puflow_tpu.ops.approx_match import approx_match, earth_mover, match_cost

KEY = jax.random.PRNGKey(0)


class TestApproxMatch:
    def test_plan_marginals(self):
        x = jax.random.uniform(KEY, (2, 64, 3))
        y = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 3))
        match = np.asarray(approx_match(x, y))
        # equal-size clouds: both marginals should be ~1 per point
        np.testing.assert_allclose(match.sum(axis=2), 1.0, atol=0.05)
        np.testing.assert_allclose(match.sum(axis=1), 1.0, atol=0.05)

    def test_identity_emd_near_zero(self):
        x = jax.random.uniform(KEY, (1, 128, 3))
        assert float(earth_mover(x, x)) < 1e-3

    def test_close_to_optimal_transport(self):
        from scipy.optimize import linear_sum_assignment

        rng = np.random.RandomState(0)
        x = rng.rand(1, 48, 3).astype(np.float32)
        y = rng.rand(1, 48, 3).astype(np.float32)
        cost = np.asarray(
            match_cost(jnp.asarray(x), jnp.asarray(y),
                       approx_match(jnp.asarray(x), jnp.asarray(y))))[0]
        d = np.sqrt(((x[0, :, None] - y[0, None]) ** 2).sum(-1))
        ri, ci = linear_sum_assignment(d)
        optimal = d[ri, ci].sum()
        assert cost <= optimal * 1.3 + 1e-3
        assert cost >= optimal * 0.8


class TestJsd:
    def test_identical_sets_zero(self):
        pcs = np.random.RandomState(0).rand(3, 256, 3).astype(np.float32)
        pcs = pcs / np.abs(pcs).max() * 0.4  # inside 0.5-sphere
        assert jsd_between_point_cloud_sets(pcs, pcs) < 1e-9

    def test_disjoint_sets_positive(self):
        a = np.full((1, 128, 3), -0.3, dtype=np.float32)
        b = np.full((1, 128, 3), 0.3, dtype=np.float32)
        assert jsd_between_point_cloud_sets(a, b) > 0.5

    def test_jsd_bounds(self):
        p = np.array([1.0, 0.0, 2.0])
        q = np.array([0.5, 1.0, 1.0])
        v = jensen_shannon_divergence(p, q)
        assert 0 <= v <= 1

    def test_grid_clip(self):
        grid, spacing = unit_cube_grid(28, clip_sphere=True)
        assert (np.linalg.norm(grid, axis=1) <= 0.5 + 1e-6).all()
        assert abs(spacing - 1 / 27) < 1e-9


def test_evaluate_cli_end_to_end(tmp_path):
    from puflow_tpu.cli.evaluate import main
    from puflow_tpu.utils.io import save_xyz

    rng = np.random.RandomState(3)
    gt_dir, pred_dir, out_dir = (tmp_path / d for d in
                                 ("gt", "pred", "out"))
    gt_dir.mkdir()
    pred_dir.mkdir()
    for name in ("a", "b"):
        cloud = rng.rand(256, 3).astype(np.float32)
        save_xyz(gt_dir / f"{name}.xyz", cloud)
        noise = cloud + rng.randn(256, 3).astype(np.float32) * 1e-3
        save_xyz(pred_dir / f"{name}.xyz", noise)

    row = main(["--pred", str(pred_dir), "--gt", str(gt_dir),
                "--save_path", str(out_dir)])
    csv_text = (out_dir / "evaluation.csv").read_text()
    header = csv_text.splitlines()[0].split(",")
    assert header[:7] == ["name", "CD", "EMD", "hausdorff", "p2f avg",
                          "p2f std", "JSD"]
    assert len(csv_text.splitlines()) == 4  # header + 2 files + aggregate
    assert row["CD"] < 1e-3   # near-identical clouds
    assert row["EMD"] < 0.05


def test_evaluate_cli_populates_uniformity(tmp_path):
    """With the p2f --uniform side-files present, the uniform_0..4 columns
    fill in (reference `evaluate.py:256-262` — its own tooling never
    produced the files; ours does)."""
    import os
    import sys

    from puflow_tpu.cli.evaluate import main
    from puflow_tpu.eval.p2f import run_p2f
    from puflow_tpu.utils.io import save_xyz

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from make_fixtures import icosphere, save_off

    verts, faces = icosphere(3)
    mesh = tmp_path / "s.off"
    save_off(str(mesh), verts, faces)
    gt_dir, pred_dir, out_dir = (tmp_path / d for d in
                                 ("gt", "pred", "out"))
    gt_dir.mkdir()
    pred_dir.mkdir()
    rng = np.random.RandomState(0)
    for d in (gt_dir, pred_dir):
        pts = rng.normal(size=(512, 3)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        save_xyz(d / "s.xyz", pts)
    run_p2f(str(mesh), str(pred_dir / "s.xyz"), uniform=True, seed=3,
            samples=100)

    row = main(["--pred", str(pred_dir), "--gt", str(gt_dir),
                "--save_path", str(out_dir)])
    header = (out_dir / "evaluation.csv").read_text().splitlines()[0]
    assert "uniform_4" in header
    for i in range(5):
        v = row[f"uniform_{i}"]
        assert np.isfinite(v) and v > 0, (i, v)
    assert np.isfinite(row["p2f avg"])
