"""Encoder neighbour-count (k) reduction experiment: quality + timing.

The fused condition encoder's cost is row-proportional in k (measured
52.8/31.2/20.5 ms per 1024 patches at k=16/8/4): every per-edge matmul
runs on k*n rows.  kNN neighbours are sorted ascending, and the kernel's
slot-major row layout means "the k'=8 graph" is literally the first 8*n
rows of the k=16 one — so truncating the idx columns is an exact
restriction of the trained EdgeConv max-pool to the k' nearest
neighbours.  This experiment measures what that restriction costs in
end-to-end golden CD vs the EXECUTED reference (torch-cpu, shipped ckpt)
at both fixture scales, and what it buys in kernel time.

Run from the repo root: python - <<'PY'
  exec(open("scripts/exp_encoder_k.py").read())
PY
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REF512 = "/tmp/ref_pipeline_512.npy"
REF2048 = "/tmp/ref_pipeline_2048.npy"


def reference_outputs():
    if os.path.exists(REF512) and os.path.exists(REF2048):
        return np.load(REF512), np.load(REF2048)
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
    helper = PatchHelper(256, patch_expand_ratio=4)
    rng = np.random.RandomState(0)
    outs = []
    for n, path in ((512, REF512), (2048, REF2048)):
        pts = rng.randn(n, 3).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        if os.path.exists(path):
            outs.append(np.load(path))
            continue
        with torch.no_grad():
            ref = helper.upsample(net, torch.from_numpy(pts)[None],
                                  npoint=n * 4 + 24, upratio=4)
            ref = PatchHelper.remove_outliers(
                ref, torch.from_numpy(pts)[None], 24).numpy()[0]
        np.save(path, ref)
        outs.append(ref)
    return outs


def cd(a, b):
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


def main():
    ref512, ref2048 = reference_outputs()

    import jax
    import jax.numpy as jnp

    import puflow_tpu  # noqa: F401
    import puflow_tpu.ops.pallas.encoder_pallas as ep
    from puflow_tpu.checkpoint import load_checkpoint
    from puflow_tpu.inference.patch import remove_outliers, upsample_cloud

    CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"
    params, state, sample_fn = load_checkpoint(CKPT, "discrete", fold=True)
    mp = (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state))

    rng = np.random.RandomState(0)
    pts512 = rng.randn(512, 3).astype(np.float32)
    pts512 /= np.linalg.norm(pts512, axis=1, keepdims=True)
    pts2048 = rng.randn(2048, 3).astype(np.float32)
    pts2048 /= np.linalg.norm(pts2048, axis=1, keepdims=True)

    orig_encoder = ep.encoder_conditions_pallas

    def run(pts, kk):
        def patched(p, xyz, knn_idx, interpret=False, precision=None):
            return orig_encoder(p, xyz, knn_idx[..., :kk], interpret,
                                precision)

        # upsample_cloud's jit caches on sample_fn IDENTITY (static arg);
        # the encoder monkeypatch is only consulted at trace time, so each
        # kk needs a fresh sample_fn object to force a retrace.
        def sample_kk(model_params, patches, upratio, _kk=kk):
            return sample_fn(model_params, patches, upratio)

        ep.encoder_conditions_pallas = patched
        try:
            cloud = jnp.asarray(pts)[None]
            n = pts.shape[0]
            out = upsample_cloud(mp, cloud, sample_kk, n * 4 + 24, 4, 256,
                                 4.0)
            return np.asarray(remove_outliers(out, cloud, 24))[0]
        finally:
            ep.encoder_conditions_pallas = orig_encoder

    for kk in (16, 12, 8):
        o512 = run(pts512, kk)
        o2048 = run(pts2048, kk)
        print(f"k={kk:2d}: CD512 {cd(o512, ref512):.3e}  "
              f"CD2048 {cd(o2048, ref2048):.3e}", flush=True)

    # kernel timing at the bench patch count
    from puflow_tpu.ops.knn import knn_indices

    M, N = 1024, 256
    xyz = jax.random.normal(jax.random.PRNGKey(0), (M, N, 3))
    xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    idx = knn_indices(xyz, xyz, 16)
    for kk in (16, 12, 8):
        f = jax.jit(lambda x, i: sum(
            jnp.sum(c) for c in orig_encoder(params, x, i[..., :kk])))
        np.asarray(f(xyz, idx))
        iters = 20
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(iters):
                r = f(xyz, idx)
            np.asarray(r)
            best = min(best, (time.time() - t0) / iters)
        print(f"k={kk:2d}: encoder {best * 1e3:7.2f} ms /1024 patches",
              flush=True)


if __name__ == "__main__":
    main()
