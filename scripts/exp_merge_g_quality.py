"""Quantify the grouped-merge (G) quality effect across varied fixture
shapes on the real chip.

The 127-mesh TPU protocol run (auto G=16) aggregated CD 2.01e-3 /
JSD 0.286 / uniformity ~0.10 vs the round-3b CPU run's (auto G=4 at the
time) 1.31e-3 / 0.192 / ~0.042 — this script isolates whether the merge
group count is the cause by sweeping G on identical inputs with the
same fused TPU path.

Usage: python scripts/exp_merge_g_quality.py [fixture_dir] [n_per_cat]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    fix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/puflow_pu1k_r3c"
    n_per = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    import puflow_tpu  # noqa: F401
    from puflow_tpu.checkpoint import load_checkpoint
    from puflow_tpu.eval.jsd import jsd_between_point_cloud_sets
    from puflow_tpu.inference.patch import remove_outliers, upsample_cloud
    from puflow_tpu.ops.chamfer import chamfer_parts
    from puflow_tpu.utils.io import load_xyz

    names = []
    for cat in ("bumpy", "superq", "torus"):
        names += [f"{cat}_{i:03d}.xyz" for i in range(0, 40, 40 // n_per)][:n_per]
    inp = np.stack([load_xyz(f"{fix}/input/{n}")[:, :3] for n in names])
    gt = np.stack([load_xyz(f"{fix}/gt/{n}")[:, :3] for n in names])

    params, state, sample_fn = load_checkpoint(
        "/root/reference/pretrain/puflow-x4-pu1k.pt", "discrete", fold=True)
    mp = (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state))

    B, N, _ = inp.shape
    npoint = N * 4 + 24
    xin = jnp.asarray(inp)
    xgt = jnp.asarray(gt)

    def nn_uniformity(pred_np):
        # std/mean of each point's NN distance — the cheap clump detector
        # that caught the strided-grouping mirroring (QUALITY.md round-3d)
        vals = []
        for pc in pred_np:
            d = (pc * pc).sum(1)[:, None] + (pc * pc).sum(1)[None, :] \
                - 2.0 * (pc @ pc.T)
            np.fill_diagonal(d, np.inf)
            nn = np.sqrt(np.maximum(d.min(1), 0.0))
            vals.append(nn.std() / nn.mean())
        return float(np.mean(vals))

    print(f"{B} clouds ({n_per}/category), {N} -> {npoint - 24}")
    for G in (1, 2, 4, 8, 16, 32):
        t0 = time.time()
        pred = upsample_cloud(mp, xin, sample_fn, npoint, 4, 256, 4.0,
                              None, True, G)
        pred = remove_outliers(pred, xin, 24)
        pred.block_until_ready()
        wall = time.time() - t0
        d_xy, d_yx, _, _ = chamfer_parts(pred, xgt)
        cd = (jnp.mean(d_xy, axis=1) + jnp.mean(d_yx, axis=1))
        hd = jnp.maximum(jnp.max(d_xy, axis=1), jnp.max(d_yx, axis=1))
        pred_np = np.asarray(pred)
        jsd = jsd_between_point_cloud_sets(pred_np * 0.5,
                                           np.asarray(xgt) * 0.5)
        uni = nn_uniformity(pred_np)
        print(f"G={G:2d}: CD {float(jnp.mean(cd)):.4e}  "
              f"HD {float(jnp.mean(hd)):.4e}  JSD {float(jsd):.4f}  "
              f"nn-uni {uni:.4f}  (first-call wall {wall:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
