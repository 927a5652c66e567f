"""Per-patch k-nearest-neighbour graph as one Pallas kernel, VMEM-resident.

The XLA formulation (`puflow_tpu.ops.knn.knn_indices`) materialises the
full [M, n, n] pairwise-distance tensor in HBM (268 MB at the bench shape
M=1024, n=256) and reads it back through `approx_min_k` — the stage is
HBM-bandwidth-bound. Here each patch's distance matrix lives only in VMEM
and the k minima are extracted with k sweeps of the
min + equality-select + min-iota idiom (first-occurrence ties, the same
deterministic rule as the FPS kernel).

Layout is the decisive choice (measured on v5e, 1024x256 patches, k=16):
the distance matrix is built TRANSPOSED — candidates on the 8-sublane
axis, queries on the 128-lane axis — so every per-query reduction runs
over SUBLANES. Sublane reductions are intra-register (3 rotate steps +
cross-vreg mins); the natural queries-on-sublanes layout reduces over
lanes instead and measured 3x slower (6.4 ms vs 2.1; the XLA
approx_min_k path is 5.8, the round-2 argmin-sweep kernel 12.9 — see
scripts/exp_knn_interp.py and the round-3 session notes).

Distances use the broadcast-delta form ((xi - xj)^2 summed per
coordinate) — identical rounding to the FPS kernel and the reference's
torch fallback, but NOT bit-identical to the XLA path's
|x|^2 + |y|^2 - 2xy matmul form: near-exact ties can order differently,
flipping ~0.03% of neighbour SETS at the k boundary on random patches.
Consumers are permutation-equivariant over neighbour slots
(`ops/knn.py` docstring), so this is quality-invisible, but the kernel
dispatches only on the FUSED inference path (golden-CD gated, like every
fast path); the exact/XLA paths keep `knn_indices`.

Output is ascending-distance-ordered indices [M, n, k] int32, so
`idx[..., :8]` is the interp head's K=8 graph exactly as with the XLA
path. Self-distance is 0, so slot 0 is the point itself (pytorch3d
`knn_points(x, x)` semantics, reference `interpflow.py:328`).

Capability parity: the fused-path half of the pytorch3d
`knn_points` replacement (reference `modules/discrete/interpflow.py:9`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM envelope: the [n, n] f32 distance matrix dominates; n=1024 is 4 MB.
KNN_FUSED_MAX_N = 1024


def use_fused_knn(n: int, backend: str | None = None) -> bool:
    """True when the fused kNN kernel dispatches for n-point patches."""
    if (backend or jax.default_backend()) != "tpu":
        return False
    return n <= KNN_FUSED_MAX_N and n % 128 == 0


def _knn_kernel(xyz_ref, xyzt_ref, out_ref, *, n: int, k: int):
    x = xyz_ref[0]                                          # [n, 3]
    xt = xyzt_ref[0]                                        # [3, n]
    # d[j, i] = |p_j - p_i|^2 : candidates j on sublanes, queries i on lanes
    d = None
    for c in range(3):
        delta = x[:, c:c + 1] - xt[c:c + 1, :]              # [n, n]
        sq = delta * delta
        d = sq if d is None else d + sq
    rowio = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    big = jnp.int32(2 ** 30)
    rows = []
    for _ in range(k):
        mn = jnp.min(d, axis=0, keepdims=True)              # [1, n]
        sel = jnp.min(jnp.where(d == mn, rowio, big), axis=0,
                      keepdims=True)                        # first-occurrence
        rows.append(sel)
        d = jnp.where(rowio == sel, jnp.float32(jnp.inf), d)
    out_ref[0] = jnp.concatenate(rows, axis=0)              # [k, n]


@functools.partial(jax.jit, static_argnums=(1, 2))
def knn_self_pallas(xyz: jax.Array, k: int,
                    interpret: bool = False) -> jax.Array:
    """Ascending k-NN indices of each point within its own cloud.

    Args:
      xyz: ``[M, n, 3]`` patches.
      k: neighbour count (static; slot 0 is the point itself).

    Returns:
      ``[M, n, k]`` int32, ascending distance, first-occurrence ties.
    """
    M, n, _ = xyz.shape
    xyzt = jnp.swapaxes(xyz, 1, 2)                          # [M, 3, n]
    kernel = functools.partial(_knn_kernel, n=n, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, k, n), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 * 1024 * 1024),
    )(xyz.astype(jnp.float32), xyzt.astype(jnp.float32))
    return jnp.swapaxes(out, 1, 2)                          # [M, n, k]
