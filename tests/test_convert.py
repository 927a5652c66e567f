"""Golden checkpoint-conversion tests.

Runs the *actual reference implementation* (torch-cpu, loaded from the
read-only mount at /root/reference with a minimal pytorch3d shim) on the
shipped `pretrain/puflow-x4-pu1k.pt` checkpoint, and demands numerical
agreement from the converted JAX model. This validates the converter AND the
whole JAX model math end-to-end.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
CKPT = os.path.join(REFERENCE, "pretrain", "puflow-x4-pu1k.pt")

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not mounted")


def _install_p3d_shim():
    """Minimal torch-only stand-in for the pytorch3d ops the reference needs."""
    if "pytorch3d" in sys.modules:
        return

    def knn_points(q, p, K, return_nn=False, return_sorted=False):
        d = torch.cdist(q, p) ** 2
        dists, idx = torch.topk(d, K, dim=-1, largest=False)
        return dists, idx, None

    def knn_gather(x, idx):
        B, N, K = idx.shape
        flat = idx.reshape(B, N * K)
        out = torch.stack([x[b][flat[b]] for b in range(B)])
        return out.reshape(B, N, K, x.shape[-1])

    def sample_farthest_points(*a, **k):  # imported but unused in forward
        raise NotImplementedError

    ops = types.ModuleType("pytorch3d.ops")
    ops.knn_points = knn_points
    ops.knn_gather = knn_gather
    ops.sample_farthest_points = sample_farthest_points
    pkg = types.ModuleType("pytorch3d")
    pkg.ops = ops
    sys.modules["pytorch3d"] = pkg
    sys.modules["pytorch3d.ops"] = ops


@pytest.fixture(scope="module")
def reference_net():
    _install_p3d_shim()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import modules.utils.probs as probs  # noqa: reference module

    # reference GaussianDistribution defaults to device='cuda:0'; force cpu
    orig = probs.GaussianDistribution.__init__

    def cpu_init(self, pc_channel, mu, vars, temperature=1.0, device="cpu"):
        orig(self, pc_channel, mu, vars, temperature, device="cpu")

    probs.GaussianDistribution.__init__ = cpu_init
    from modules.discrete.interpflow import PointInterpFlow

    net = PointInterpFlow(pc_channel=3)
    net.load_state_dict(torch.load(CKPT, map_location="cpu"))
    net.set_to_initialized_state()
    net.eval()
    return net


@pytest.fixture(scope="module")
def jax_model():
    from puflow_tpu.convert.torch_ckpt import load_discrete_checkpoint

    return load_discrete_checkpoint(CKPT)


def _patch_input(seed=0, n=256, b=2):
    rng = np.random.RandomState(seed)
    pts = rng.randn(b, n, 3).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True).max(1, keepdims=True)
    return pts


def test_forward_parity(reference_net, jax_model):
    import jax.numpy as jnp

    from puflow_tpu.models import discrete

    pts = _patch_input()
    with torch.no_grad():
        dense_t, logpx_t = reference_net(torch.from_numpy(pts), upratio=4)
    params, state = jax_model
    dense_j, logpx_j, _ = discrete.forward(
        params, state, jnp.asarray(pts), upratio=4, train=False)

    dense_t = dense_t.numpy()
    dense_j = np.asarray(dense_j)
    assert dense_j.shape == dense_t.shape
    err = np.abs(dense_j - dense_t).max()
    assert err < 2e-3, f"max coordinate deviation {err}"
    assert abs(float(logpx_j) - float(logpx_t)) < 2e-2, (
        f"logpx {float(logpx_j)} vs {float(logpx_t)}")


def test_latents_parity(reference_net, jax_model):
    """Forward flow f (points -> latents) agrees layer-stack-deep."""
    import jax.numpy as jnp

    from puflow_tpu.models import discrete
    from puflow_tpu.ops.knn import knn_indices

    pts = _patch_input(seed=1)
    x_t = torch.from_numpy(pts)
    with torch.no_grad():
        _, knn_idx_t, _ = sys.modules["pytorch3d.ops"].knn_points(
            x_t, x_t, K=16)
        cs_t = reference_net.feat_extract(x_t, knn_idx_t)
        z_t, logdet_t = reference_net.f(x_t, cs_t)

    params, state = jax_model
    knn_idx = knn_indices(jnp.asarray(pts), jnp.asarray(pts), 16)
    cs_j, _ = discrete.feat_extract(params, state, jnp.asarray(pts), knn_idx,
                                    train=False)
    z_j, logdet_j = discrete.f_transform(params, jnp.asarray(pts), cs_j)

    for i, (ct, cj) in enumerate(zip(cs_t, cs_j)):
        err = np.abs(ct.numpy() - np.asarray(cj)).max()
        assert err < 1e-3, f"condition {i} deviates by {err}"
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(logdet_j), logdet_t.numpy(),
                               rtol=1e-3, atol=0.5)


@pytest.mark.parametrize("name", ["puflow-x4-pugeo.pt",
                                  "puflow-x4-pugan.pt"])
def test_forward_parity_other_checkpoints(reference_net, name):
    """The pugeo/pugan shipped checkpoints convert and match too (same
    architecture, different training runs — exercises different weight
    statistics through the converter)."""
    import jax.numpy as jnp

    from puflow_tpu.convert.torch_ckpt import load_discrete_checkpoint
    from puflow_tpu.models import discrete

    path = os.path.join(REFERENCE, "pretrain", name)
    net = type(reference_net)(pc_channel=3)
    net.load_state_dict(torch.load(path, map_location="cpu"))
    net.set_to_initialized_state()
    net.eval()

    pts = _patch_input(seed=2)
    with torch.no_grad():
        dense_t, _ = net(torch.from_numpy(pts), upratio=4)
    params, state = load_discrete_checkpoint(path)
    dense_j, _, _ = discrete.forward(params, state, jnp.asarray(pts),
                                     upratio=4, train=False)
    err = np.abs(np.asarray(dense_j) - dense_t.numpy()).max()
    assert err < 2e-3, f"{name}: max coordinate deviation {err}"


def test_wrong_family_checkpoint_raises_clearly():
    from puflow_tpu.convert.torch_ckpt import (
        load_cnf_checkpoint,
        load_discrete_checkpoint,
    )

    cnf_ckpt = os.path.join(REFERENCE, "pretrain", "puflow-x4-cnf-pu1k.pt")
    with pytest.raises(ValueError, match="continuous"):
        load_discrete_checkpoint(cnf_ckpt)
    with pytest.raises(ValueError, match="discrete"):
        load_cnf_checkpoint(CKPT)
