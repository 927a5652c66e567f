"""Upsample fixtures with the FUSED model but the reference-identical
UNION merge (seeded_merge=False) — isolates the seeded-merge policy from
the fused kernels in the protocol-scale uniformity forensics.

usage: python scripts/upsample_union.py <workdir> [outdir_name=pred_union]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    work = sys.argv[1]
    out_name = sys.argv[2] if len(sys.argv) > 2 else "pred_union"
    merge_cand = int(sys.argv[3]) if len(sys.argv) > 3 else None
    import jax
    import jax.numpy as jnp

    from puflow_tpu.checkpoint import load_checkpoint
    from puflow_tpu.inference.patch import remove_outliers, upsample_cloud

    params, state, sample_fn = load_checkpoint(
        "/root/reference/pretrain/puflow-x4-pu1k.pt", "discrete", fold=True)
    mp = (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state))

    src = os.path.join(work, "input")
    dst = os.path.join(work, out_name)
    os.makedirs(dst, exist_ok=True)
    files = sorted(f for f in os.listdir(src) if f.endswith(".xyz"))
    rng = np.random.RandomState(1)
    t0 = time.time()
    B = 16
    for start in range(0, len(files), B):
        chunk = files[start:start + B]
        clouds = np.stack([np.loadtxt(os.path.join(src, f),
                                      dtype=np.float32) for f in chunk])
        clouds = clouds[:, rng.permutation(clouds.shape[1])]
        n = clouds.shape[1]
        pad = B - len(chunk)
        if pad:
            clouds = np.concatenate(
                [clouds, np.repeat(clouds[-1:], pad, axis=0)])
        cj = jnp.asarray(clouds)
        pred = upsample_cloud(mp, cj, sample_fn, n * 4 + 24, 4, 256, 4.0,
                              merge_cand, False)  # seeded_merge=False
        pred = remove_outliers(pred, cj, 24)
        pred = np.asarray(pred)
        for i, f in enumerate(chunk):
            np.savetxt(os.path.join(dst, f), pred[i], fmt="%.6f")
        print(f"{start + len(chunk)}/{len(files)}", flush=True)
    print(f"done in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
