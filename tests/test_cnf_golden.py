"""CNF full-chain golden test: our continuous model vs the executed
reference `modules/continuous/interpflow.py` on the shipped checkpoint.

Composes everything the unit tests check separately — checkpoint
conversion, the conditional encoder stack, forward CNF solve (f), latent
interpolation, and the inverse CNF solve (g) with repeated conditions —
and compares full upsampled outputs (reference
`modules/continuous/upsample.py:20-57` runs the same `sample` call through
`PatchHelper`, whose golden test lives in test_pipeline_parity.py).

torchdiffeq is not installed in this environment, so `odeint` is shimmed
with a fixed-step RK4 integrator (64 steps over T~0.5; global error far
below the 1e-5 dopri5 tolerance both the reference and our solver target,
so both sides approximate the same exact trajectory). States are detached
between solver stages; the Hutchinson divergence autograd inside
`ODEfunc.forward` still runs (it only affects logpx, not the trajectory).
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
CKPT = os.path.join(REFERENCE, "pretrain", "puflow-x4-cnf-pu1k.pt")

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not mounted")


def _install_torchdiffeq_shim():
    if "torchdiffeq" in sys.modules:
        return

    def odeint(func, y0, t, rtol=None, atol=None, method=None, options=None,
               **kw):
        t0, t1 = float(t[0]), float(t[1])
        n_steps = 64
        h = (t1 - t0) / n_steps

        def f(tv, s):
            s = tuple(x.detach().requires_grad_(True) for x in s)
            ds = func(torch.tensor(tv, dtype=y0[0].dtype), s)
            return tuple(d.detach() for d in ds)

        state = tuple(s.detach() for s in y0)
        cur = t0
        for _ in range(n_steps):
            k1 = f(cur, state)
            k2 = f(cur + h / 2,
                   tuple(s + (h / 2) * k for s, k in zip(state, k1)))
            k3 = f(cur + h / 2,
                   tuple(s + (h / 2) * k for s, k in zip(state, k2)))
            k4 = f(cur + h, tuple(s + h * k for s, k in zip(state, k3)))
            state = tuple(
                s + (h / 6) * (a + 2 * b + 2 * c + d)
                for s, a, b, c, d in zip(state, k1, k2, k3, k4))
            cur += h
        # torchdiffeq stacks solutions over the requested times
        return tuple(torch.stack([a, b]) for a, b in zip(y0, state))

    mod = types.ModuleType("torchdiffeq")
    mod.odeint = odeint
    mod.odeint_adjoint = odeint
    sys.modules["torchdiffeq"] = mod


def test_cnf_full_chain_matches_reference():
    from test_pipeline_parity import _install_shims

    _install_shims()
    _install_torchdiffeq_shim()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import modules.utils.probs as probs

    orig = probs.GaussianDistribution.__init__
    if "device" in orig.__code__.co_varnames:
        def cpu_init(self, pc_channel, mu, vars, temperature=1.0,
                     device="cpu"):
            orig(self, pc_channel, mu, vars, temperature, device="cpu")

        probs.GaussianDistribution.__init__ = cpu_init

    from modules.continuous.interpflow import PointInterpFlow

    net = PointInterpFlow(3)
    net.load_state_dict(torch.load(CKPT, map_location="cpu"))
    net.eval()

    rng = np.random.RandomState(0)
    pts = rng.randn(2, 256, 3).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    pts *= 0.9

    torch.manual_seed(0)
    ref_out = net.sample(torch.from_numpy(pts), upratio=4).detach().numpy()

    # ours
    import jax
    import jax.numpy as jnp

    from puflow_tpu.checkpoint import load_checkpoint
    from puflow_tpu.models import continuous

    params, state, _ = load_checkpoint(CKPT, "cnf")
    dense = continuous.sample(jax.tree.map(jnp.asarray, params),
                              jax.tree.map(jnp.asarray, state),
                              jnp.asarray(pts), upratio=4)
    ours = np.asarray(dense)

    assert ours.shape == ref_out.shape == (2, 1024, 3)
    for b in range(2):
        d = ((ours[b][:, None, :] - ref_out[b][None, :, :]) ** 2).sum(-1)
        cd = d.min(1).mean() + d.min(0).mean()
        assert cd < 5e-4, f"batch {b}: CNF outputs diverge, CD={cd}"
    # outputs should in fact agree pointwise (same latent per input point),
    # far tighter than the CD gate
    assert np.abs(ours - ref_out).max() < 5e-3, np.abs(ours - ref_out).max()
