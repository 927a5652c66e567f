"""Approximate EMD by temperature-annealed softassign (evaluation metric).

Dense XLA re-design of the reference TF1 CUDA op
(`evaluation/tf_ops/approxmatch/tf_approxmatch_g.cu`): ten annealing rounds
(level = -4^j for j = 7..-1, then level = 0, `:21-25`) of

  1. row ratios:    ratioL_k = remainL_k / (1e-9 + sum_l e^{level d2} remainR_l)
  2. col uptake:    sumr_l = remainR_l * sum_k e^{level d2} ratioL_k
                    ratioR_l = min(remainR_l / (sumr_l + 1e-9), 1) * remainR_l
                    remainR_l = max(0, remainR_l - sumr_l)
  3. transport:     w_kl = e^{level d2} ratioL_k ratioR_l;  match += w
                    remainL_k = max(0, remainL_k - sum_l w_kl)

Every step is a matrix-vector product over the [n, m] kernel matrix — pure
MXU/VPU work, no atomics. `match_cost` then contracts euclidean distances
with the plan (`matchcost`, `:183-213`); `earth_mover` reproduces the
`evaluate.py:59-65` reduction (cost / radius / n, batch mean).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from puflow_tpu.ops.knn import pairwise_sqdist


@partial(jax.jit, static_argnums=())
def approx_match(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Transport plan [B, n, m] between xyz1 [B, n, 3] and xyz2 [B, m, 3].

    Row/col marginals follow the reference's multiplicities: each xyz1 point
    carries max(m/n, 1) mass, each xyz2 point max(n/m, 1) (integer ratios,
    `tf_approxmatch_g.cu:4-10`).
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    multi_l = float(max(m // n, 1))
    multi_r = float(max(n // m, 1))

    d2 = pairwise_sqdist(xyz1, xyz2)                      # [B, n, m]
    levels = [-float(4 ** j) for j in range(7, -2, -1)] + [0.0]

    match = jnp.zeros_like(d2)
    remain_l = jnp.full((B, n), multi_l, dtype=jnp.float32)
    remain_r = jnp.full((B, m), multi_r, dtype=jnp.float32)

    for level in levels:
        k = jnp.exp(level * d2)                           # [B, n, m]
        suml = 1e-9 + jnp.einsum("bnm,bm->bn", k, remain_r)
        ratio_l = remain_l / suml
        sumr = jnp.einsum("bnm,bn->bm", k, ratio_l) * remain_r
        ratio_r = jnp.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        w = k * ratio_l[:, :, None] * ratio_r[:, None, :]
        match = match + w
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(w, axis=2))
    return match


def match_cost(xyz1: jax.Array, xyz2: jax.Array, match: jax.Array):
    """sum_{k,l} |x1_k - x2_l| * match[k, l] per batch -> [B]."""
    d = jnp.sqrt(pairwise_sqdist(xyz1, xyz2))
    return jnp.sum(d * match, axis=(1, 2))


def earth_mover(xyz1: jax.Array, xyz2: jax.Array,
                radius: float = 1.0) -> jax.Array:
    """Eval-protocol EMD (reference `evaluate.py:59-65`): scalar."""
    n = xyz1.shape[1]
    cost = match_cost(xyz1, xyz2, approx_match(xyz1, xyz2)) / radius
    return jnp.mean(cost / n)
