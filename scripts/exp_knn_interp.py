"""kNN top-k alternatives + interp-kernel internal split, on the real TPU.

Usage: python - [M] < scripts/exp_knn_interp.py
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/puflow_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.ops.knn import pairwise_sqdist
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n, k = 256, 16
    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (M, n, 3), dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    @jax.jit
    def dist_only(x):
        return jnp.sum(pairwise_sqdist(x, x))

    @jax.jit
    def with_topk(x):
        d = pairwise_sqdist(x, x)
        _, idx = jax.lax.top_k(-d, k)
        return jnp.sum(idx)

    @jax.jit
    def with_approx(x):
        d = pairwise_sqdist(x, x)
        _, idx = jax.lax.approx_min_k(d, k, recall_target=0.99,
                                      aggregate_to_topk=True)
        return jnp.sum(idx)

    @jax.jit
    def with_approx_exact(x):
        d = pairwise_sqdist(x, x)
        _, idx = jax.lax.approx_min_k(
            d, k, recall_target=1.0, reduction_input_size_override=n,
            aggregate_to_topk=True)
        return jnp.sum(idx)

    for name, fn in (("dist only", dist_only), ("+lax.top_k", with_topk),
                     ("+approx_min_k r=.99", with_approx),
                     ("+approx_min_k exact", with_approx_exact)):
        fn(pts)
        t = time_fn(fn, pts, iters=20)
        print(f"{name:22s}: {t*1e3:7.2f} ms", flush=True)

    # index agreement check (on one batch)
    d = pairwise_sqdist(pts, pts)
    _, i_ref = jax.lax.top_k(-d, k)
    _, i_apx = jax.lax.approx_min_k(d, k, recall_target=1.0,
                                    reduction_input_size_override=n,
                                    aggregate_to_topk=True)
    same = bool(jnp.all(i_ref.astype(jnp.int32) == i_apx.astype(jnp.int32)))
    print(f"approx(recall=1) idx == top_k idx: {same}")

    # ---- interp kernel split: logits-only vs full latents kernel --------
    from puflow_tpu.ops.knn import knn_indices
    from puflow_tpu.ops.pallas.encoder_pallas import (interp_latents_pallas,
                                                      interp_logits_pallas)

    params, state, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    idx16 = knn_indices(pts, pts, 16)
    idx8 = idx16[..., :8]
    z = jax.random.normal(jax.random.PRNGKey(3), (M, n, 3), jnp.float32)

    @jax.jit
    def logits_only(x, i):
        return jnp.sum(interp_logits_pallas(params["interp"], x, i))

    @jax.jit
    def full_latents(x, i, zz):
        return jnp.sum(interp_latents_pallas(params["interp"], x, i, zz, 4))

    logits_only(pts, idx8)
    t1 = time_fn(logits_only, pts, idx8, iters=20)
    full_latents(pts, idx8, z)
    t2 = time_fn(full_latents, pts, idx8, z, iters=20)
    print(f"interp logits only    : {t1*1e3:7.2f} ms", flush=True)
    print(f"interp full latents   : {t2*1e3:7.2f} ms  "
          f"(softmax+blend delta {t2*1e3-t1*1e3:+.2f})", flush=True)


if __name__ == "__main__":
    main()
