"""Upsample .xyz point clouds with a (converted) PU-Flow checkpoint.

CLI parity with reference `modules/discrete/upsample.py:63-86`:

    python -m puflow_tpu.cli.upsample --source <dir> --target <dir> \
        --checkpoint <ckpt> --up_ratio 4 [--num_patch 256] [--num_out N] \
        [--seed 2021] [--model discrete|cnf]

Accepts either a reference torch `.pt` state_dict (converted on the fly) or a
native `.npz` checkpoint saved by this framework. Clouds are grouped by point
count so each unique shape compiles exactly once.
"""

from __future__ import annotations

import argparse
import os
import time
from collections import defaultdict
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--source", type=str, required=True)
    parser.add_argument("--target", type=str, required=True)
    parser.add_argument("--seed", type=int, default=2021)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--up_ratio", type=int, default=4)
    parser.add_argument("--num_patch", type=int, default=256,
                        help="points per patch")
    parser.add_argument("--num_out", type=int, default=None,
                        help="output points per cloud (default N*ratio)")
    parser.add_argument("--num_outlier", type=int, default=24)
    parser.add_argument("--model", choices=["discrete", "cnf"],
                        default="discrete")
    parser.add_argument("--exact", action="store_true",
                        help="bit-parity XLA path (no BN folding / fused "
                             "kernels); ~2.8x slower, for strict reference "
                             "comparisons")
    parser.add_argument("--batch", type=int, default=1,
                        help="clouds per device batch")
    parser.add_argument("--seeded_merge", action="store_true",
                        help="opt-in fast merge: emit all originals and "
                             "seeded-FPS only the remainder. ~25%% fewer "
                             "selection steps but measured ~2x uniformity "
                             "vs the reference at protocol scale "
                             "(QUALITY.md round-4b) — default is the "
                             "reference-identical union merge")
    parser.add_argument("--merge_groups", type=int, default=0,
                        help="grouped merge-FPS parallelism. With "
                             "--seeded_merge: 0 = auto by candidate count, "
                             "1 = exact seeded FPS. Without it, values > 1 "
                             "select the approximate grouped-UNION merge "
                             "(Morton cells; quality-affecting — see "
                             "QUALITY.md round-4b before using)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import puflow_tpu  # noqa: F401  (precision policy)
    from puflow_tpu.checkpoint import load_checkpoint
    from puflow_tpu.inference.patch import remove_outliers, upsample_cloud
    from puflow_tpu.utils.io import load_xyz, save_xyz

    rng = np.random.RandomState(args.seed)
    params, state, sample_fn = load_checkpoint(args.checkpoint, args.model,
                                               fold=not args.exact)
    model_params = (jax.tree.map(jnp.asarray, params),
                    jax.tree.map(jnp.asarray, state))

    os.makedirs(args.target, exist_ok=True)
    paths = []
    for root, _dirs, files in os.walk(args.source):
        paths.extend(os.path.join(root, f) for f in files if ".xyz" in f)
    paths.sort()
    if not paths:
        raise SystemExit(f"no .xyz files under {args.source}")

    # group by point count: one jit compilation per unique shape
    by_n = defaultdict(list)
    for p in paths:
        pts = load_xyz(p)[:, :3]
        by_n[pts.shape[0]].append((p, pts))

    t_start = time.time()
    n_done = 0
    pending = None  # (chunk, device_array): one-deep software pipeline

    def drain(p):
        # device->host transfer + file writes overlap the NEXT batch's
        # device compute (the transfer waits for its own execution; the
        # next batch is already queued on the in-order device stream)
        nonlocal n_done
        chunk, pred = p
        pred = np.asarray(pred)
        for (path, _), out in zip(chunk, pred):
            save_xyz(Path(args.target) / os.path.basename(path), out)
            n_done += 1

    for n, items in sorted(by_n.items()):
        npoint = (args.num_out or n * args.up_ratio) + args.num_outlier
        # default: reference-identical union merge (round-4 protocol
        # side-by-side: the seeded shortcut costs ~2x uniformity — see
        # inference/patch.py); --seeded_merge opts into the fast path
        merge_cand = None
        seeded = args.seeded_merge and not args.exact and npoint > n
        # batch same-size clouds through one jit call (pad the tail batch
        # so every batch reuses the same compilation)
        bsz = max(1, args.batch)
        for start in range(0, len(items), bsz):
            chunk = items[start:start + bsz]
            clouds = np.stack([
                pts[rng.permutation(n)] for _, pts in chunk])
            pad = bsz - len(chunk)
            if pad:
                clouds = np.concatenate(
                    [clouds, np.repeat(clouds[-1:], pad, axis=0)])
            clouds = jnp.asarray(clouds)
            pred = upsample_cloud(
                model_params, clouds, sample_fn, npoint, args.up_ratio,
                args.num_patch, 4.0, merge_cand, seeded, args.merge_groups)
            if args.num_outlier > 0:
                pred = remove_outliers(pred, clouds, args.num_outlier)
            prev, pending = pending, (chunk, pred)
            if prev is not None:
                drain(prev)
    if pending is not None:
        drain(pending)
    dt = time.time() - t_start
    print(f"upsampled {n_done} clouds in {dt:.1f}s "
          f"({n_done / dt:.2f} clouds/s)")


if __name__ == "__main__":
    main()
