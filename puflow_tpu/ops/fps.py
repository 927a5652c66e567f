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


def farthest_point_sample_seeded_grouped(xyz: jax.Array, seeds: jax.Array,
                                         n_samples: int, groups: int,
                                         use_pallas: bool | None = None
                                         ) -> jax.Array:
    """Grouped (two-level) seeded FPS: ~`groups`x fewer sequential steps.

    Candidates split into `groups` STRIDED subsets (candidate j goes to
    group ``j % groups`` — a uniform subsample of every patch in the merge
    union); every group runs an independent seeded FPS over its subset,
    and all groups advance in parallel as extra batch rows of the same
    kernel, so the sequential step count drops from ``n_samples`` to
    ``ceil(n_samples / groups)`` at identical per-step cost. Group picks
    are interleaved in STEP order (pick 0 of every group first), so
    truncating to ``n_samples`` drops only the least-important tail picks.

    Within a group the FPS min-distance invariant holds exactly; across
    groups it is not enforced (each group is blind to the others' picks),
    so the selection is not index-identical to the exact seeded FPS —
    callers gate it by output quality (the pipeline golden-CD tests),
    like every other fast path. ``groups=1`` is the exact path; shapes
    that do not divide evenly fall back to it.
    """
    B, M, C = xyz.shape
    if groups <= 1 or M % groups != 0 or n_samples < groups:
        return farthest_point_sample_seeded(xyz, seeds, n_samples,
                                            use_pallas)
    G = groups
    mg = -(-n_samples // G)
    grouped = jnp.transpose(xyz.reshape(B, M // G, G, C), (0, 2, 1, 3))
    grouped = grouped.reshape(B * G, M // G, C)
    S = seeds.shape[1]
    seeds_rep = jnp.broadcast_to(seeds[:, None], (B, G, S, C))
    seeds_rep = seeds_rep.reshape(B * G, S, C)
    sel = farthest_point_sample_seeded(grouped, seeds_rep, mg, use_pallas)
    sel = sel.reshape(B, G, mg) * G + jnp.arange(
        G, dtype=sel.dtype)[None, :, None]                 # strided -> global
    sel = jnp.transpose(sel, (0, 2, 1)).reshape(B, G * mg)
    return sel[:, :n_samples]


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
