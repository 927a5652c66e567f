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
