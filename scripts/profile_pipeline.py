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

    from puflow_tpu.inference.patch import merge_patches

    @jax.jit
    def merge(cand, orig):
        # shipped default (round 4b): reference-identical union merge —
        # free FPS over predictions + deduped originals
        union = jnp.concatenate([cand, orig], axis=1)
        return merge_patches(union, npoint)

    merge(pred_full, pc_n)

    full = lambda p: upsample_cloud(model_params, p, sample_fn, npoint, R,
                                    k, 4.0)
    full(pts)

    # scalar-reduced stage closures: returning the big intermediates
    # inflates each stage by its tunnel-transfer cost (QUALITY.md round-3
    # timing-methodology trap) — the round-3 "21 ms pipeline/model gap"
    # was exactly this artifact
    ex_s = jax.jit(lambda p: jnp.sum(extract_patches(p, n_patch, k)))
    mo_s = jax.jit(lambda mp, f: jnp.sum(sample_fn(mp, f, R)))
    me_s = jax.jit(lambda c, o: jnp.sum(merge(c, o)))
    for f, a in ((ex_s, (pc_n,)), (mo_s, (model_params, flat_n)),
                 (me_s, (pred_full, pc_n))):
        f(*a)

    t_ex = time_fn(ex_s, pc_n, iters=20)
    t_mo = time_fn(mo_s, model_params, flat_n, iters=20)
    t_me = time_fn(me_s, pred_full, pc_n, iters=20)
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
