"""Fused k-NN kernel: pairwise distances + iterative top-K in VMEM.

`lax.top_k` over the [B*N, N] distance matrix is the slow half of the XLA
k-NN at patch shapes (generic sort-based lowering). Each grid step stacks a
chunk of patches' distance matrices into one [g*N, N] block so the K
(argmin + mask) sweeps run at full VPU width, then writes the K selected
indices; one pass of HBM traffic total.

Matches `puflow_tpu.ops.knn.knn_indices` exactly in interpret mode.
STATUS: dispatch is disabled — on-device the kernel measures slower than
the XLA top_k path at patch shapes (12.9ms vs 9.6ms for [256x256] K=16),
and Mosaic's in-kernel f32 dot precision differs from the XLA 'high'
pairwise distances enough to flip near-tie neighbours. Kept as groundwork.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _knn_kernel(xyz_ref, out_ref, *, k: int, n: int, g: int):
    ds = []
    for gi in range(g):
        x = xyz_ref[gi]                                    # [n, 3]
        sq = jnp.sum(x * x, axis=1, keepdims=True)         # [n, 1]
        cross = jax.lax.dot_general(
            x, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # [n, n]
        ds.append(sq + jnp.transpose(sq) - 2.0 * cross)
    d = jnp.concatenate(ds, axis=0)                        # [g*n, n]
    colio = jax.lax.broadcasted_iota(jnp.int32, (g * n, n), 1)
    for kk in range(k):
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)      # [g*n]
        out_ref[:, kk:kk + 1] = idx[:, None]
        d = jnp.where(colio == idx[:, None], _BIG, d)


@functools.partial(jax.jit, static_argnums=(1, 2))
def knn_self_pallas(xyz: jax.Array, k: int, interpret: bool = False):
    """Self k-NN: xyz [B, N, 3] -> idx [B, N, k] int32, ascending distance."""
    B, N, _ = xyz.shape
    g = max(1, min(B, (4 * 1024 * 1024) // (N * N * 4)))   # ~4MB of D per step
    while B % g:
        g -= 1
    kp = ((k + 127) // 128) * 128

    kernel = functools.partial(_knn_kernel, k=k, n=N, g=g)
    out = pl.pallas_call(
        kernel,
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, N, 3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g * N, kp), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * N, kp), jnp.int32),
        interpret=interpret,
    )(xyz.astype(jnp.float32))
    return out.reshape(B, N, kp)[:, :, :k]
