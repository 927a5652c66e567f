"""Cumulative-stage timing of the SHIPPED discrete.sample path (fused
encoder + fused f + interp + fused g) with scalar outputs.

Each jitted function runs the pipeline up to stage i and reduces to a
scalar, so device->host transfer cost is constant and stage cost is the
difference between consecutive rows.
Usage: python - M < scripts/profile_model3.py   (M = n_patches, default 256)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.models.discrete import (feat_extract, g_transform,
                                        interpolation_apply)
from puflow_tpu.ops.knn import knn_indices
from puflow_tpu.ops.pallas.flow_pallas import flow_f_pallas
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k, R = 256, 4
    params, state, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (M, k, 3), dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    def upto_knn(x):
        return jnp.sum(knn_indices(x, x, 16))

    def upto_enc(x):
        idx = knn_indices(x, x, 16)
        cs, _ = feat_extract(params, state, x, idx, train=False)
        return sum(jnp.sum(c) for c in cs)

    def upto_f(x):
        idx = knn_indices(x, x, 16)
        cs, _ = feat_extract(params, state, x, idx, train=False)
        z = flow_f_pallas(params["flow_blocks"], x, cs)
        return jnp.sum(z)

    def upto_interp(x):
        idx = knn_indices(x, x, 16)
        cs, _ = feat_extract(params, state, x, idx, train=False)
        z = flow_f_pallas(params["flow_blocks"], x, cs)
        fz, _ = interpolation_apply(params["interp"], state["interp"], z, x,
                                    R, False, knn_idx=idx)
        return jnp.sum(fz)

    def upto_g(x):
        idx = knn_indices(x, x, 16)
        cs, _ = feat_extract(params, state, x, idx, train=False)
        z = flow_f_pallas(params["flow_blocks"], x, cs)
        fz, _ = interpolation_apply(params["interp"], state["interp"], z, x,
                                    R, False, knn_idx=idx)
        out = g_transform(params, fz, cs, R, fast=True)
        return jnp.sum(out)

    stages = [("knn", upto_knn), ("+encoder", upto_enc), ("+f", upto_f),
              ("+interp", upto_interp), ("+g", upto_g)]
    prev = 0.0
    print(f"M={M} patches (shipped fused path)")
    for name, fn in stages:
        jf = jax.jit(fn)
        jf(pts)
        sec = time_fn(jf, pts, iters=20)
        print(f"{name:10s}: {sec*1e3:8.2f} ms  (delta {(sec-prev)*1e3:+7.2f})",
              flush=True)
        prev = sec


if __name__ == "__main__":
    main()
