"""Locate the normalize/denorm/layout glue in the upsample pipeline.

Times CUMULATIVE PREFIXES of `upsample_cloud_impl` (each jitted with a
scalar reduction — QUALITY.md round-3 methodology), so successive diffs
expose the cost of each glue stage INCLUDING the layout transitions XLA
materialises between the Pallas custom calls.

Usage: python scripts/profile_glue.py [B]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.inference.patch import (extract_patches, merge_patches,
                                        normalize_cloud)
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N, R, k = 2048, 4, 256
    n_patch = int(N / k * 4.0)
    npoint = N * R + 24

    params, state, sample_fn = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    mp = (params, state)

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (B, N, 3), dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    def prefix(stage):
        def fn(pc):
            pc_n, g_c, g_f = normalize_cloud(pc)
            if stage == "norm":
                return jnp.sum(pc_n) + jnp.sum(g_c) + jnp.sum(g_f)
            patches, idx = extract_patches(pc_n, n_patch, k, return_idx=True)
            if stage == "extract":
                return jnp.sum(patches) + jnp.sum(idx)
            flat = patches.reshape(B * n_patch, k, 3)
            flat_n, cent, furth = normalize_cloud(flat)
            if stage == "pnorm":
                return jnp.sum(flat_n) + jnp.sum(cent) + jnp.sum(furth)
            pred = sample_fn(mp, flat_n, R)
            if stage == "model":
                return jnp.sum(pred)
            pred = pred * furth + cent
            pred = pred.reshape(B, -1, 3)
            if stage == "denorm":
                return jnp.sum(pred)
            cov = jnp.zeros((B, N), bool).at[
                jnp.arange(B)[:, None, None], idx].set(True)
            originals = jnp.where(cov[..., None], pc_n, pred[:, :1, :])
            union = jnp.concatenate([pred, originals], axis=1)
            if stage == "union":
                return jnp.sum(union)
            merged = merge_patches(union, npoint)
            if stage == "merge":
                return jnp.sum(merged)
            out = merged * g_f + g_c
            return jnp.sum(out)

        return jax.jit(fn)

    stages = ["norm", "extract", "pnorm", "model", "denorm", "union",
              "merge", "gdenorm"]
    times = {}
    prev = 0.0
    for s in stages:
        f = prefix(s)
        f(pts)  # compile
        t = time_fn(f, pts, iters=15)
        times[s] = t
        print(f"{s:>8s}: cum {t*1e3:8.2f} ms   delta {(t-prev)*1e3:8.2f} ms",
              flush=True)
        prev = t
    tot_patches = B * n_patch
    print(f"-> {tot_patches/times['gdenorm']:.0f} patches/s at B={B}")


if __name__ == "__main__":
    main()
