"""kNN distance-matrix precision experiment.

The model kNN stage (5.9 ms at 1024x256 patches) streams a [B, N, N] f32
distance matrix through approx_min_k. Hypotheses:
  V1  bf16 distance matrix (halved HBM traffic into PartialReduce)
  V2  bf16 cross-term only, f32 assembly (exact-ish distances, same
      traffic as V0)

Neighbour-SET changes are what matter (consumers are order-equivariant
across slots); report set agreement vs the f32 path and timing.

Usage: python scripts/exp_knn_bf16.py [M]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.ops.knn import knn_indices, pairwise_sqdist
from puflow_tpu.utils.timing import time_fn


def knn_v1(q, p, k):
    d = pairwise_sqdist(q, p).astype(jnp.bfloat16)
    _, idx = jax.lax.approx_min_k(d, k, recall_target=1.0,
                                  aggregate_to_topk=True)
    return idx.astype(jnp.int32)


def knn_v2(q, p, k):
    x2 = jnp.sum(q * q, axis=-1, keepdims=True)
    y2 = jnp.sum(p * p, axis=-1, keepdims=True)
    cross = jnp.einsum("...nc,...mc->...nm", q.astype(jnp.bfloat16),
                       p.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    d = jnp.maximum(x2 + jnp.swapaxes(y2, -1, -2) - 2.0 * cross, 0.0)
    _, idx = jax.lax.approx_min_k(d, k, recall_target=1.0,
                                  aggregate_to_topk=True)
    return idx.astype(jnp.int32)


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    pts = jax.random.normal(jax.random.PRNGKey(1), (M, 256, 3),
                            dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    k = 16
    base = jax.jit(lambda p: knn_indices(p, p, k))
    b = np.asarray(base(pts))
    t0 = time_fn(jax.jit(lambda p: jnp.sum(knn_indices(p, p, k))), pts,
                 iters=20)
    print(f"V0 f32    : {t0*1e3:6.2f} ms", flush=True)

    for name, fn in (("V1 bf16 d", knn_v1), ("V2 bf16 x", knn_v2)):
        g = np.asarray(jax.jit(lambda p, fn=fn: fn(p, p, k))(pts))
        # neighbour-SET agreement per row
        agree = np.mean([
            len(np.intersect1d(b[i, j], g[i, j])) / k
            for i in range(0, M, 97) for j in range(0, 256, 31)])
        t = time_fn(jax.jit(lambda p, fn=fn: jnp.sum(fn(p, p, k))), pts,
                    iters=20)
        print(f"{name}: {t*1e3:6.2f} ms   set-agreement {agree:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
