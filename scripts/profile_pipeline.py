"""Per-stage timing of the 2048->8192 upsample pipeline on the real chip.

Not part of the test suite — a development tool for the perf push.
Usage: python scripts/profile_pipeline.py [B]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.inference.patch import (extract_patches, merge_patches,
                                        normalize_cloud, upsample_cloud)
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N, R, k = 2048, 4, 256
    n_patch = int(N / k * 4.0)
    npoint = N * R + 24

    params, state, sample_fn = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    model_params = (params, state)

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (B, N, 3), dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    pc_n, _, _ = normalize_cloud(pts)

    extract = jax.jit(lambda p: extract_patches(p, n_patch, k))
    patches = extract(pc_n)
    flat = patches.reshape(B * n_patch, k, 3)
    flat_n, cent, furth = normalize_cloud(flat)

    model = jax.jit(lambda mp, f: sample_fn(mp, f, R), static_argnums=())
    pred = model(model_params, flat_n)
    pred_full = (pred * furth + cent).reshape(B, -1, 3)
    print("candidates shape:", pred_full.shape)

    from puflow_tpu.inference.patch import auto_merge_groups
    from puflow_tpu.ops.fps import farthest_point_sample_seeded_morton
    from puflow_tpu.ops.knn import gather_points

    # per-CLOUD candidate count, mirroring the shipped gate exactly
    # (upsample_cloud_impl groups on pred.shape[1], not the batch total)
    G = auto_merge_groups(n_patch * k * R)

    @jax.jit
    def merge(cand, orig):
        # shipped default: Morton-cell grouped seeded FPS (auto G)
        sel = farthest_point_sample_seeded_morton(cand, orig, npoint - N, G)
        return jnp.concatenate([orig, gather_points(cand, sel)], axis=1)

    merge(pred_full, pc_n)

    full = lambda p: upsample_cloud(model_params, p, sample_fn, npoint, R,
                                    k, 4.0)
    full(pts)

    t_ex = time_fn(extract, pc_n, iters=20)
    t_mo = time_fn(model, model_params, flat_n, iters=20)
    t_me = time_fn(merge, pred_full, pc_n, iters=20)
    t_fu = time_fn(full, pts, iters=20)
    tot_patches = B * n_patch
    print(f"B={B}  patches/iter={tot_patches}")
    print(f"extract : {t_ex*1e3:8.2f} ms")
    print(f"model   : {t_mo*1e3:8.2f} ms")
    print(f"merge   : {t_me*1e3:8.2f} ms")
    print(f"sum     : {(t_ex+t_mo+t_me)*1e3:8.2f} ms")
    print(f"full    : {t_fu*1e3:8.2f} ms -> {tot_patches/t_fu:.0f} patches/s")


if __name__ == "__main__":
    main()
