"""Farthest point sampling as a jit-safe sequential min-distance update.

The greedy FPS recurrence is inherently sequential in the number of output
points, but each step is a dense O(N) distance update + argmax that maps onto
the VPU. We express it with `lax.fori_loop` carrying the running min-distance
cache — the same math as the reference's pure-torch fallback
(`modules/utils/fps.py:40-73`) and the pointnet2 CUDA kernel it mirrors
(`modules/utils/patch.py:12`).

Deterministic: starts from index 0 (matching pointnet2's CUDA kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(xyz: jax.Array, n_samples: int,
                          use_pallas: bool | None = None) -> jax.Array:
    """FPS with automatic TPU-kernel dispatch.

    On TPU the Pallas VMEM-resident kernel is ~10x faster than the HLO loop
    (the selection loop's per-iteration temporaries never touch HBM); on CPU
    (tests, virtual meshes) the XLA formulation below runs. Both return
    identical indices.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        from puflow_tpu.ops.pallas.fps_pallas import (
            farthest_point_sample_pallas,
        )

        return farthest_point_sample_pallas(xyz, n_samples)
    return farthest_point_sample_xla(xyz, n_samples)


def farthest_point_sample_seeded(xyz: jax.Array, seeds: jax.Array,
                                 n_samples: int,
                                 use_pallas: bool | None = None) -> jax.Array:
    """Seeded FPS: greedily pick `n_samples` candidates farthest from
    `seeds` + already-picked points.

    Equivalent to running plain FPS with the seed set pre-selected, but
    only candidate indices are returned — the caller owns the seeds (the
    merge path emits them directly). Every step selects the argmax of the
    running min-distance cache FIRST (the cache is already valid from the
    seeding), then applies the pick's distance update.

    Args:
      xyz: ``[B, N, C]`` candidate clouds.
      seeds: ``[B, S, C]`` seed points (pre-selected, not returned).
      n_samples: number of candidates to select (static).

    Returns:
      ``[B, n_samples]`` int32 indices into the N axis.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        from puflow_tpu.ops.pallas.fps_pallas import (
            farthest_point_sample_seeded_pallas,
        )

        return farthest_point_sample_seeded_pallas(xyz, seeds, n_samples)
    return farthest_point_sample_seeded_xla(xyz, seeds, n_samples)


def farthest_point_sample_seeded_xla(xyz: jax.Array, seeds: jax.Array,
                                     n_samples: int) -> jax.Array:
    """XLA formulation of :func:`farthest_point_sample_seeded`."""
    B, N, _ = xyz.shape

    def one_cloud(pts: jax.Array, sds: jax.Array) -> jax.Array:
        # plain delta form, same rounding as the step updates (and the
        # Pallas kernel): min over seeds of sum((p - s)^2)
        d_seed = jnp.sum((pts[:, None, :] - sds[None, :, :]) ** 2, axis=-1)
        init_dist = jnp.min(d_seed, axis=1)               # [N]
        init_idx = jnp.zeros((n_samples,), dtype=jnp.int32)

        def body(i, carry):
            sel, mind = carry
            nxt = jnp.argmax(mind).astype(jnp.int32)
            sel = sel.at[i].set(nxt)
            delta = pts - pts[nxt]
            mind = jnp.minimum(mind, jnp.sum(delta * delta, axis=-1))
            return sel, mind

        sel, _ = jax.lax.fori_loop(0, n_samples, body,
                                   (init_idx, init_dist))
        return sel

    return jax.vmap(one_cloud)(xyz, seeds)


def farthest_point_sample_xla(xyz: jax.Array, n_samples: int) -> jax.Array:
    """Greedy farthest-point subset of each cloud.

    Args:
      xyz: ``[B, N, C]`` point clouds.
      n_samples: number of points to select (static).

    Returns:
      ``[B, n_samples]`` int32 indices into the N axis.
    """
    B, N, _ = xyz.shape

    def one_cloud(pts: jax.Array) -> jax.Array:
        # carry: (selected indices [n_samples], min sq-dist to selected [N],
        #         index of latest selected point)
        init_idx = jnp.zeros((n_samples,), dtype=jnp.int32)
        init_dist = jnp.full((N,), jnp.inf, dtype=jnp.float32)

        def body(i, carry):
            sel, mind, last = carry
            delta = pts - pts[last]                       # [N, C]
            d = jnp.sum(delta * delta, axis=-1)           # [N]
            mind = jnp.minimum(mind, d)
            nxt = jnp.argmax(mind).astype(jnp.int32)
            sel = sel.at[i].set(nxt)
            return sel, mind, nxt

        sel, _, _ = jax.lax.fori_loop(
            1, n_samples, body, (init_idx, init_dist, jnp.int32(0))
        )
        return sel

    return jax.vmap(one_cloud)(xyz)
