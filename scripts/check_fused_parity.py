"""Golden parity of the TPU FUSED inference path vs the executed reference.

The pytest golden tests run the XLA (bit-parity) paths on CPU; this script
closes the remaining gap by comparing the Pallas fused-kernel pipeline — as
run on the real TPU — against the reference `PatchHelper.upsample` executed
in torch-cpu (same shims as tests/test_pipeline_parity.py).

Round-2 measured (512-pt cloud, x4):
    TPU fused vs reference  CD 5.2e-4
    TPU exact vs reference  CD 4.9e-4   (the --exact bit-parity path)
    fused vs exact          CD 3.4e-4
i.e. the fused kernels add ~5% CD on top of inherent cross-framework fp
differences.

Usage: python - <<'PY'
  exec(open("scripts/check_fused_parity.py").read())
PY
(run from the repo root; plain `python scripts/...` misses the cwd import).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(sys.argv[0] if __name__ == "__main__" else ".")),
        "tests"))
    sys.path.insert(0, "tests")
    import torch
    from test_pipeline_parity import CKPT, REFERENCE, _install_shims

    _install_shims()
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
    with torch.no_grad():
        ref = helper.upsample(net, torch.from_numpy(pts)[None],
                              npoint=512 * 4 + 24, upratio=4)
        ref = PatchHelper.remove_outliers(
            ref, torch.from_numpy(pts)[None], 24).numpy()[0]

    import jax
    import jax.numpy as jnp

    import puflow_tpu  # noqa: F401
    from puflow_tpu.checkpoint import load_checkpoint
    from puflow_tpu.inference.patch import remove_outliers, upsample_cloud

    def run(exact):
        params, state, sample_fn = load_checkpoint(CKPT, "discrete",
                                                   fold=not exact)
        mp = (jax.tree.map(jnp.asarray, params),
              jax.tree.map(jnp.asarray, state))
        cloud = jnp.asarray(pts)[None]
        ours = upsample_cloud(mp, cloud, sample_fn, 512 * 4 + 24, 4, 256,
                              4.0)
        return np.asarray(remove_outliers(ours, cloud, 24))[0]

    def cd(a, b):
        d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return d.min(1).mean() + d.min(0).mean()

    fused, exact = run(False), run(True)
    print(f"TPU fused vs reference CD: {cd(fused, ref):.3e}", flush=True)
    print(f"TPU exact vs reference CD: {cd(exact, ref):.3e}", flush=True)
    print(f"fused vs exact CD        : {cd(fused, exact):.3e}", flush=True)
    small_ok = cd(fused, ref) < 1e-3

    # --- bench scale: the shipped headline config (2048-pt cloud, auto
    # merge grouping -> G=16) on the real chip vs the executed reference.
    # The CPU-side check (scripts/check_bench_scale_parity.py) gates the
    # XLA paths; this closes the fused-kernel delta at the SAME scale the
    # driver benches.
    pts2 = rng.randn(2048, 3).astype(np.float32)
    pts2 /= np.linalg.norm(pts2, axis=1, keepdims=True)
    with torch.no_grad():
        ref2 = helper.upsample(net, torch.from_numpy(pts2)[None],
                               npoint=2048 * 4 + 24, upratio=4)
        ref2 = PatchHelper.remove_outliers(
            ref2, torch.from_numpy(pts2)[None], 24).numpy()[0]

    params, state, sample_fn = load_checkpoint(CKPT, "discrete", fold=True)
    mp = (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state))
    cloud2 = jnp.asarray(pts2)[None]
    ours2 = upsample_cloud(mp, cloud2, sample_fn, 2048 * 4 + 24, 4, 256, 4.0)
    ours2 = np.asarray(remove_outliers(ours2, cloud2, 24))[0]

    def serr(out):
        return np.abs(1.0 - np.linalg.norm(out, axis=1)).mean()

    print(f"bench-scale TPU fused vs reference CD: {cd(ours2, ref2):.3e} "
          f"(surface err ours {serr(ours2):.3e} vs ref {serr(ref2):.3e})",
          flush=True)
    assert small_ok, "512-pt fused path lost golden parity"
    assert cd(ours2, ref2) < 1e-3, "bench-scale fused path lost parity"


if __name__ == "__main__":
    main()
