"""jax.export serving artifacts: serialize -> file -> deserialize -> call
must reproduce the live computation exactly (same traced program, same
constants). Runs on the CPU backend (conftest), where the dispatch gates
pick the XLA paths — the TPU-platform export embeds the Mosaic kernels via
the same API (exercised by scripts/exp_export_tpu.py on the chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puflow_tpu import serving
from puflow_tpu.models import discrete


@pytest.fixture(scope="module")
def small_model():
    params, state = discrete.init(jax.random.PRNGKey(0))
    return params, state


def _patches(b, n=256):
    pts = jax.random.normal(jax.random.PRNGKey(3), (b, n, 3))
    return pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1.0)


def test_patch_sampler_roundtrip(tmp_path, small_model):
    params, state = small_model
    exp = serving.export_patch_sampler(params, state, batch=4, upratio=4)
    path = str(tmp_path / "sampler.jaxexp")
    serving.save_exported(exp, path)
    fn = serving.load_exported(path)

    x = _patches(4)
    got = np.asarray(fn(x))
    want = np.asarray(discrete.sample(params, state, x, 4))
    assert got.shape == (4, 1024, 3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_patch_sampler_symbolic_batch(tmp_path, small_model):
    params, state = small_model
    exp = serving.export_patch_sampler(params, state, batch=None, upratio=4)
    path = str(tmp_path / "sampler_b.jaxexp")
    serving.save_exported(exp, path)
    fn = serving.load_exported(path)

    for b in (1, 5):
        x = _patches(b)
        got = np.asarray(fn(x))
        want = np.asarray(discrete.sample(params, state, x, 4))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_cli(tmp_path, small_model):
    params, state = small_model
    from puflow_tpu.checkpoint import save_checkpoint
    from puflow_tpu.cli.export import main as export_main

    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, params, state)
    out = str(tmp_path / "sampler.jaxexp")
    export_main(["--checkpoint", ckpt, "--out", out])

    fn = serving.load_exported(out)
    x = _patches(3)
    assert np.asarray(fn(x)).shape == (3, 1024, 3)


def test_cloud_upsampler_roundtrip(tmp_path, small_model):
    params, state = small_model
    B, N, R = 2, 512, 4
    exp = serving.export_cloud_upsampler(params, state, cloud_points=N,
                                         upratio=R, batch=B)
    path = str(tmp_path / "cloud.jaxexp")
    serving.save_exported(exp, path)
    fn = serving.load_exported(path)

    pts = _patches(B, N)
    out = np.asarray(fn(pts))
    assert out.shape == (B, N * R + 24, 3)
    assert np.isfinite(out).all()

    # the loaded artifact itself is deterministic
    np.testing.assert_array_equal(out, np.asarray(fn(pts)))

    from puflow_tpu.checkpoint import _discrete_sample_fn
    from puflow_tpu.inference.patch import upsample_cloud
    from puflow_tpu.ops.chamfer import chamfer_distance

    want = np.asarray(upsample_cloud((params, state), pts,
                                     _discrete_sample_fn, N * R + 24, R,
                                     256, 4.0))
    # NOT pointwise-equal to the live pipeline: the deserialized module
    # recompiles with different fusion decisions, and ulp-level fp
    # differences flip a handful of greedy FPS merge picks (both outputs
    # are valid FPS subsets of the same candidate set). The artifact
    # contract is set-level equivalence: symmetric CD between the two
    # outputs far below the 5e-4 golden-pipeline gate.
    cd = float(chamfer_distance(jnp.asarray(out), jnp.asarray(want)))
    assert cd < 5e-5, cd
