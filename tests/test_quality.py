"""End-to-end quality guard: pretrained model on analytic surfaces.

Upsamples sparse samples of known surfaces with the converted reference
checkpoint and checks chamfer distance against dense ground truth — a
regression fence for the whole numeric path (conversion, model, pipeline).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="no pretrained ckpt")


def _sphere(rng, n):
    p = rng.randn(n, 3)
    return (p / np.linalg.norm(p, axis=1, keepdims=True)).astype(np.float32)


def _torus(rng, n, R=1.0, r=0.4):
    u = rng.rand(n) * 2 * np.pi
    v = rng.rand(n) * 2 * np.pi
    x = (R + r * np.cos(v)) * np.cos(u)
    y = (R + r * np.cos(v)) * np.sin(u)
    z = r * np.sin(v)
    return np.stack([x, y, z], 1).astype(np.float32)


def _cd(a, b):
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return float(d.min(1).mean() + d.min(0).mean())


@pytest.fixture(scope="module")
def model():
    from puflow_tpu.checkpoint import load_checkpoint

    params, state, sample_fn = load_checkpoint(CKPT, "discrete")
    return ((jax.tree.map(jnp.asarray, params),
             jax.tree.map(jnp.asarray, state)), sample_fn)


@pytest.mark.parametrize("surface", [_sphere, _torus])
def test_upsampled_cloud_close_to_surface(model, surface):
    from puflow_tpu.inference.patch import remove_outliers, upsample_cloud

    mp, sample_fn = model
    rng = np.random.RandomState(0)
    sparse = surface(rng, 512)
    gt_dense = surface(np.random.RandomState(1), 4096)

    cloud = jnp.asarray(sparse)[None]
    pred = upsample_cloud(mp, cloud, sample_fn, 512 * 4 + 24, 4, 256, 4.0)
    pred = np.asarray(remove_outliers(pred, cloud, 24))[0]

    cd_pred = _cd(pred, gt_dense)
    cd_sparse = _cd(sparse, gt_dense)
    # upsampling must substantially improve coverage of the true surface
    assert cd_pred < cd_sparse * 0.6, (cd_pred, cd_sparse)
    # and stay close to it in absolute terms (scale-aware: the torus spans
    # radius 1.4, so its absolute CD floor is naturally higher)
    scale2 = float((gt_dense**2).sum(-1).max())
    assert cd_pred < 5e-3 * scale2, (cd_pred, scale2)
