"""Bench-scale golden check: 2048-pt cloud vs the EXECUTED reference.

The pipeline-parity unit test pins a 512-pt fixture (fast); the bench
headline runs 2048-pt clouds where the auto merge-group logic picks G=4.
This script runs the actual reference implementation (torch-cpu + the
test shims) and our shipped pipeline on one 2048 -> 8192+24 cloud and
reports the CD + true-surface error for the shipped config and the
exact-seeded variant. Run on CPU (XLA model paths, exact f32) — the TPU
fused-path delta is measured separately by scripts/check_fused_parity.py.

Usage: python scripts/check_bench_scale_parity.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import torch

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from tests.test_pipeline_parity import CKPT, REFERENCE, _install_shims


def main():
    _install_shims()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import modules.utils.probs as probs

    orig = probs.GaussianDistribution.__init__
    probs.GaussianDistribution.__init__ = (
        lambda self, pc, mu, vars, temperature=1.0, device="cpu":
        orig(self, pc, mu, vars, temperature, device="cpu"))

    from modules.discrete.interpflow import PointInterpFlow
    from modules.utils.patch import PatchHelper

    net = PointInterpFlow(3)
    net.load_state_dict(torch.load(CKPT, map_location="cpu"))
    net.set_to_initialized_state()
    net.eval()

    rng = np.random.RandomState(0)
    pts = rng.randn(2048, 3).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    npoint = 2048 * 4 + 24

    helper = PatchHelper(256, patch_expand_ratio=4)
    t0 = time.time()
    with torch.no_grad():
        ref_out = helper.upsample(net, torch.from_numpy(pts)[None],
                                  npoint=npoint, upratio=4)
        ref_out = PatchHelper.remove_outliers(
            ref_out, torch.from_numpy(pts)[None], 24)
    ref_out = ref_out.numpy()[0]
    print(f"reference (torch-cpu): {time.time() - t0:.0f}s, "
          f"{ref_out.shape}")

    import jax.numpy as jnp

    from puflow_tpu.checkpoint import load_checkpoint
    from puflow_tpu.inference.patch import remove_outliers, upsample_cloud

    params, state, sample_fn = load_checkpoint(CKPT, "discrete")
    mp = (jax.tree.map(jnp.asarray, params),
          jax.tree.map(jnp.asarray, state))
    cloud = jnp.asarray(pts)[None]

    def cd(ours):
        d = ((ours[:, None, :] - ref_out[None, :, :]) ** 2).sum(-1)
        return d.min(1).mean() + d.min(0).mean()

    def serr(out):
        return np.abs(1.0 - np.linalg.norm(out, axis=1)).mean()

    print(f"reference true-surface err: {serr(ref_out):.4e}")
    for label, groups in (("auto (G=4 at this scale)", 0),
                          ("exact seeded (G=1)", 1),
                          ("G=8", 8),
                          ("G=16", 16)):
        t0 = time.time()
        out = upsample_cloud(mp, cloud, sample_fn, npoint, 4, 256, 4.0,
                             None, True, groups)
        out = np.asarray(remove_outliers(out, cloud, 24))[0]
        print(f"{label}: CD={cd(out):.4e} surface_err={serr(out):.4e} "
              f"({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
