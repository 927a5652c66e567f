"""Quality metrics for the merge-group sweep (round 3d).

Compares predictions produced at different --merge_groups settings against
the fixture ground truths: CD, HD (evaluate.py conventions) and JSD, plus a
nearest-neighbour-distance uniformity proxy (std/mean of per-point NN
distance — clumping raises it; exact-FPS outputs are near-constant-NN).

Usage (CPU): python - <<'EOF' with this file's body, or
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_gsweep_metrics.py \
      /tmp/gsweep/gt /tmp/gsweep/pred_g1 /tmp/gsweep/pred_g4 ...
"""
import sys
import os

import numpy as np


def normalize(pc):
    c = pc.mean(0, keepdims=True)
    pc = pc - c
    r = np.linalg.norm(pc, axis=1).max()
    return pc / r


def sqdist(a, b):
    # (x - y)^2 = x^2 + y^2 - 2xy, avoids the [n, m, 3] broadcast
    return ((a * a).sum(1)[:, None] + (b * b).sum(1)[None, :]
            - 2.0 * (a @ b.T))


def cd_hd(a, b):
    d = sqdist(a, b)
    fwd, bwd = d.min(1), d.min(0)
    cd = fwd.mean() + bwd.mean()
    hd = max(fwd.max(), bwd.max())
    return float(cd), float(hd)


def nn_uniformity(a):
    d = sqdist(a, a)
    np.fill_diagonal(d, np.inf)
    nn = np.sqrt(np.maximum(d.min(1), 0.0))
    return float(nn.std() / nn.mean())


def main(gt_dir, pred_dirs):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from puflow_tpu.eval.jsd import jsd_between_point_cloud_sets

    names = sorted(f for f in os.listdir(gt_dir) if f.endswith(".xyz"))
    gts = {n: np.loadtxt(os.path.join(gt_dir, n)).astype(np.float32)
           for n in names}
    for pd in pred_dirs:
        cds, hds, unis, preds_n, gts_n = [], [], [], [], []
        for n in names:
            p = np.loadtxt(os.path.join(pd, n)).astype(np.float32)
            g = gts[n]
            pn, gn = normalize(p), normalize(g)
            cd, hd = cd_hd(pn, gn)
            cds.append(cd)
            hds.append(hd)
            unis.append(nn_uniformity(pn))
            preds_n.append(0.5 * pn)
            gts_n.append(0.5 * gn)
        jsd = jsd_between_point_cloud_sets(np.stack(preds_n), np.stack(gts_n))
        print(f"{os.path.basename(pd):12s} CD {np.mean(cds):.6e} "
              f"HD {np.mean(hds):.6e} JSD {float(jsd):.4f} "
              f"nn-uni {np.mean(unis):.4f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
