"""Cumulative-stage timing of the SHIPPED fused sample path (round-3b form:
fused encoder -> interp-weights kernel -> fused f (emit_cm) -> fused
g+blend) with scalar outputs, at the bench patch count.

Each jitted function runs the pipeline up to stage i and reduces to a
scalar, so device->host transfer cost is constant and stage cost is the
difference between consecutive rows.
Usage: python scripts/profile_model4.py [M]   (M = n_patches, default 1024)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.ops.pallas.knn_pallas import knn_self_pallas
from puflow_tpu.ops.pallas.encoder_pallas import (
    encoder_conditions_pallas_cm,
    interp_weights_cm_pallas,
)
from puflow_tpu.ops.pallas.flow_pallas import (
    _pack_patches,
    flow_f_pallas,
    flow_g_blend_pallas,
)
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    k, R = 256, 4
    params, state, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (M, k, 3), dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    cdim_total = sum(mp["conv2"]["w"].shape[1]
                     for mp in params["merge_convs"])
    P = _pack_patches(M, k, cdim_total)

    def upto_knn(x):
        return jnp.sum(knn_self_pallas(x, 16))

    def upto_enc(x):
        idx = knn_self_pallas(x, 16)
        cs = encoder_conditions_pallas_cm(params, x, idx, P)
        return sum(jnp.sum(c) for c in cs)

    def upto_w(x):
        idx = knn_self_pallas(x, 16)
        cs = encoder_conditions_pallas_cm(params, x, idx, P)
        ws = interp_weights_cm_pallas(params["interp"], x, idx[..., :8], R)
        return sum(jnp.sum(c) for c in cs) + jnp.sum(ws)

    def upto_f(x):
        idx = knn_self_pallas(x, 16)
        cs = encoder_conditions_pallas_cm(params, x, idx, P)
        ws = interp_weights_cm_pallas(params["interp"], x, idx[..., :8], R)
        z = flow_f_pallas(params["flow_blocks"], x, cs, emit_cm=True,
                          cs_cm=True)
        return jnp.sum(z) + jnp.sum(ws)

    def upto_g(x):
        idx = knn_self_pallas(x, 16)
        cs = encoder_conditions_pallas_cm(params, x, idx, P)
        idx8 = idx[..., :8]
        ws = interp_weights_cm_pallas(params["interp"], x, idx8, R)
        z = flow_f_pallas(params["flow_blocks"], x, cs, emit_cm=True,
                          cs_cm=True)
        out = flow_g_blend_pallas(params["flow_blocks"], z, ws, idx8, cs,
                                  cs_cm=True)
        return jnp.sum(out)

    stages = [("knn", upto_knn), ("+encoder", upto_enc), ("+weights", upto_w),
              ("+f", upto_f), ("+g_blend", upto_g)]
    prev = 0.0
    print(f"M={M} patches (shipped round-3e fused path)")
    for name, fn in stages:
        jf = jax.jit(fn)
        jf(pts)
        sec = time_fn(jf, pts, iters=20)
        print(f"{name:10s}: {sec*1e3:8.2f} ms  (delta {(sec-prev)*1e3:+7.2f})",
              flush=True)
        prev = sec


if __name__ == "__main__":
    main()
