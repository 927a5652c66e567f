"""Golden-CD gate for encoder precision configs.

Computes the torch-cpu reference pipeline output once (cached to /tmp),
then for each candidate ENCODER_PRECISION config runs the fused TPU
pipeline and reports CD vs the reference. Run from the repo root via
`python - <<'PY' ... PY` (cwd import).
"""

from __future__ import annotations

import os
import sys

import numpy as np

REF_NPY = "/tmp/ref_pipeline_512.npy"


def reference_output():
    if os.path.exists(REF_NPY):
        return np.load(REF_NPY)
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
    np.save(REF_NPY, ref)
    return ref


def main():
    ref = reference_output()
    rng = np.random.RandomState(0)
    pts = rng.randn(512, 3).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/puflow_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    import puflow_tpu  # noqa: F401
    import puflow_tpu.ops.pallas.encoder_pallas as enc
    from puflow_tpu.checkpoint import load_checkpoint
    from puflow_tpu.inference.patch import remove_outliers, upsample_cloud

    def cd(a, b):
        d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return d.min(1).mean() + d.min(0).mean()

    CONFIGS = {
        "exact": None,
        "gather1 late3": ((2, 3),) * 3 + ((1, 3),) * 3,
        "gather1 all": ((1, 3),) * 6,
        "g1m1 late5": ((2, 3),) + ((1, 1),) * 5,
    }
    params, state, sample_fn = load_checkpoint(
        "/root/reference/pretrain/puflow-x4-pu1k.pt", "discrete", fold=True)
    mp = (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray,
                                                          state))
    cloud = jnp.asarray(pts)[None]
    for name, cfg in CONFIGS.items():
        enc.ENCODER_PRECISION = cfg
        jax.clear_caches()
        ours = upsample_cloud(mp, cloud, sample_fn, 512 * 4 + 24, 4, 256,
                              4.0)
        out = np.asarray(remove_outliers(ours, cloud, 24))[0]
        print(f"{name:16s} CD vs reference: {cd(out, ref):.3e}", flush=True)


main()
