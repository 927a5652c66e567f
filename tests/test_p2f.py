"""Native p2f tool: build + exact distances on a known mesh."""

import numpy as np
import pytest

from puflow_tpu.eval.p2f import ensure_built, run_p2f
from puflow_tpu.utils.io import load_off

CUBE_OFF = """OFF
8 12 0
0 0 0
1 0 0
1 1 0
0 1 0
0 0 1
1 0 1
1 1 1
0 1 1
3 0 1 2
3 0 2 3
3 4 6 5
3 4 7 6
3 0 5 1
3 0 4 5
3 1 5 6
3 1 6 2
3 2 6 7
3 2 7 3
3 3 7 4
3 3 4 0
"""


@pytest.fixture(scope="module")
def cube(tmp_path_factory):
    d = tmp_path_factory.mktemp("p2f")
    mesh = d / "cube.off"
    mesh.write_text(CUBE_OFF)
    return d, str(mesh)


def test_p2f_known_distances(cube):
    d, mesh = cube
    pts = np.array([[0.5, 0.5, 0.5],    # centre -> 0.5
                    [0.5, 0.5, 0.0],    # on a face -> 0
                    [2.0, 0.5, 0.5],    # outside -> 1.0
                    [0.5, 0.5, 1.25],   # above top -> 0.25
                    [1.5, 1.5, 1.5]])   # nearest corner -> sqrt(3)/2
    pred = d / "pred.xyz"
    np.savetxt(pred, pts, fmt="%.6f")
    ensure_built()
    mean, std = run_p2f(mesh, str(pred))
    out = np.loadtxt(str(d / "pred_point2mesh_distance.xyz"))
    expect = [0.5, 0.0, 1.0, 0.25, np.sqrt(3) / 2]
    np.testing.assert_allclose(out[:, 3], expect, atol=1e-5)
    np.testing.assert_allclose(out[:, :3], pts, atol=1e-5)
    np.testing.assert_allclose(mean, np.mean(expect), atol=1e-6)


def test_load_off_triangulates(cube):
    _, mesh = cube
    verts, faces = load_off(mesh)
    assert verts.shape == (8, 3)
    assert faces.shape == (12, 3)


@pytest.fixture(scope="module")
def sphere_uniform(tmp_path_factory):
    """Unit-sphere mesh + uniform points, run through `p2f --uniform`."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from make_fixtures import icosphere, save_off

    d = tmp_path_factory.mktemp("p2f_uniform")
    verts, faces = icosphere(4)
    mesh = d / "sphere.off"
    save_off(str(mesh), verts, faces)
    rng = np.random.RandomState(0)
    pts = rng.normal(size=(2000, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pred = d / "pred.xyz"
    np.savetxt(pred, pts, fmt="%.6f")
    ensure_built()
    run_p2f(str(mesh), str(pred), uniform=True, seed=7, samples=600)
    return d


def test_uniform_radii_match_area_percentages(sphere_uniform):
    """pi*r_j^2 = p_j * total_area -> r_j = 2*sqrt(p_j) on the unit sphere
    (the icosphere underestimates 4*pi slightly, hence the loose rtol)."""
    radius = np.loadtxt(sphere_uniform / "pred_radius.txt")
    expect = 2.0 * np.sqrt([0.004, 0.006, 0.008, 0.010, 0.012])
    np.testing.assert_allclose(radius, expect, rtol=5e-3)


def test_uniform_densities_match_spherical_caps(sphere_uniform):
    """Mean disk density over uniform points == N * cap_area / sphere_area
    = N*(1-cos r)/2. Validates the approximate geodesic (Steiner-Dijkstra)
    against the closed form to ~3%."""
    radius = np.loadtxt(sphere_uniform / "pred_radius.txt")
    lines = (sphere_uniform / "pred_disk_idx.txt").read_text().splitlines()
    assert len(lines) == 600 * 5
    dens = np.array([int(ln.split(":")[0]) for ln in lines]).reshape(600, 5)
    for j, r in enumerate(radius):
        expect = 2000 * (1 - np.cos(r)) / 2
        # SEM of the mean density is ~sqrt(expect)/sqrt(600); allow 3 sigma
        # plus ~2% geodesic-approximation bias
        tol = 0.02 + 3 * np.sqrt(expect) / expect / np.sqrt(600)
        assert abs(dens[:, j].mean() / expect - 1) < tol, (j, r, tol)


def test_uniform_sidefiles_feed_analyze_uniform(sphere_uniform):
    """The side-files parse through the uniformity metric end to end, and a
    uniform cloud scores 'more uniform' (smaller) than a clustered one."""
    from puflow_tpu.eval.uniformity import analyze_uniform

    measure = analyze_uniform(
        str(sphere_uniform / "pred_disk_idx.txt"),
        str(sphere_uniform / "pred_radius.txt"),
        str(sphere_uniform / "pred_point2mesh_distance.txt"),
        sample_number=600)
    assert measure.shape == (5, 1)
    assert np.all(np.isfinite(measure))

    # clustered cloud: same count, points duplicated in tight clumps
    rng = np.random.RandomState(1)
    centers = rng.normal(size=(100, 3))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, 20, axis=0) + rng.normal(
        scale=5e-3, size=(2000, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pred = sphere_uniform / "clustered.xyz"
    np.savetxt(pred, pts, fmt="%.6f")
    run_p2f(str(sphere_uniform / "sphere.off"), str(pred), uniform=True,
            seed=7, samples=600)
    clustered = analyze_uniform(
        str(sphere_uniform / "clustered_disk_idx.txt"),
        str(sphere_uniform / "clustered_radius.txt"),
        str(sphere_uniform / "clustered_point2mesh_distance.txt"),
        sample_number=600)
    assert np.all(clustered > measure * 2), (clustered.ravel(),
                                             measure.ravel())
