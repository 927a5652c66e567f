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
import numpy as np


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


def farthest_point_sample_seeded_partitioned(xyz: jax.Array,
                                             seeds: jax.Array,
                                             n_samples: int, groups: int,
                                             use_pallas: bool | None = None
                                             ) -> jax.Array:
    """Spatially-partitioned grouped seeded FPS.

    Same two-level parallel-group structure as
    :func:`farthest_point_sample_seeded_grouped` (``groups`` independent
    seeded FPS runs advance as extra batch rows; sequential step count
    drops ``groups``-fold), but the subsets are SPATIALLY COMPACT cells
    from a kd-style recursive median split (``log2(groups)`` levels, each
    segment halved at the median of its widest axis) instead of strided
    interleaves. Strided subsets each re-cover the whole surface blind to
    the other groups' picks, so their union clumps like ``groups``
    independent samplings (NN-distance uniformity and JSD degrade: the
    round-3 127-mesh TPU protocol run regressed CD 1.31e-3 -> 2.01e-3 and
    uniformity 0.04 -> 0.10 at strided G=16). Compact cells give each
    group a DISJOINT region — the within-cell FPS invariant then bounds
    clumping everywhere except cell seams, recovering exact-FPS uniformity
    (12-mesh sweep: partitioned G=16 matches G=1 on CD/JSD/nn-uniformity).

    Median splits produce exactly equal cell sizes, so ``groups`` must be
    a power of two and divide M; candidate density is ~uniform over the
    surface (patches cover it ~expand_ratio deep), so equal per-cell pick
    counts approximate the exact FPS allocation. Falls back to the exact
    seeded path when the shape constraints fail.
    """
    B, M, C = xyz.shape
    G = groups
    if (G <= 1 or (G & (G - 1)) != 0 or M % G != 0 or n_samples < G):
        return farthest_point_sample_seeded(xyz, seeds, n_samples,
                                            use_pallas)
    levels = G.bit_length() - 1
    perm = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    pts = xyz
    for lvl in range(levels):
        n_seg = 1 << lvl
        seg = M // n_seg
        shaped = pts.reshape(B * n_seg, seg, C)
        flat_perm = perm.reshape(B * n_seg, seg)
        # split each segment at the median of its widest axis
        ext = shaped.max(axis=1) - shaped.min(axis=1)       # [S, C]
        ax = jnp.argmax(ext, axis=-1)                       # [S]
        key = jnp.sum(shaped * jax.nn.one_hot(ax, C, dtype=pts.dtype)[:,
                      None, :], axis=-1)                    # [S, seg]
        order = jnp.argsort(key, axis=-1)
        shaped = jnp.take_along_axis(shaped, order[..., None], axis=1)
        flat_perm = jnp.take_along_axis(flat_perm, order, axis=1)
        pts = shaped.reshape(B, M, C)
        perm = flat_perm.reshape(B, M)

    mg = -(-n_samples // G)
    grouped = pts.reshape(B * G, M // G, C)
    S = seeds.shape[1]
    seeds_rep = jnp.broadcast_to(seeds[:, None], (B, G, S, C))
    seeds_rep = seeds_rep.reshape(B * G, S, C)
    sel = farthest_point_sample_seeded(grouped, seeds_rep, mg, use_pallas)
    sel = jnp.take_along_axis(perm.reshape(B, G, M // G),
                              sel.reshape(B, G, mg), axis=2)
    sel = jnp.transpose(sel, (0, 2, 1)).reshape(B, G * mg)
    return sel[:, :n_samples]


def _morton_key(xyz: jax.Array) -> jax.Array:
    """30-bit Morton (Z-order) key per point, [B, M, 3] -> [B, M] uint32.

    Coordinates quantize to 10 bits per axis against each cloud's own
    bounding box; bits interleave x2 y1 z0 by the standard magic-number
    spread. Equal coordinates map to equal keys, so duplicate points stay
    adjacent under a stable sort — the property the spatial partition
    needs (duplicates must land in the same cell).
    """
    lo = jnp.min(xyz, axis=1, keepdims=True)
    hi = jnp.max(xyz, axis=1, keepdims=True)
    q = (xyz - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0
    q = jnp.clip(q, 0.0, 1023.0).astype(jnp.uint32)

    def spread(v):  # 10 bits -> every 3rd bit of 30
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return ((spread(q[..., 0]) << 2) | (spread(q[..., 1]) << 1)
            | spread(q[..., 2]))


def farthest_point_sample_seeded_morton(xyz: jax.Array, seeds: jax.Array,
                                        n_samples: int, groups: int,
                                        use_pallas: bool | None = None
                                        ) -> jax.Array:
    """Morton-partitioned grouped seeded FPS: point-level spatial cells
    at one-argsort cost.

    Quality motivation is :func:`farthest_point_sample_seeded_partitioned`
    (groups must be spatially compact point-level cells — strided groups
    all mirror the same global pick sequence and pile up G-fold; patch
    -level cells overlap too much at small cells). The kd median split
    pays ``log2(G)`` full-candidate argsorts (89 ms at the bench union
    [32, 32768]); sorting ONCE by Morton key and chopping into ``groups``
    equal contiguous chunks gives cells with the same essential
    properties — spatially compact, coordinate-duplicates in one cell
    (stable sort keeps equal keys adjacent), ~uniform candidate density
    per cell — for a single sort.
    """
    B, M, C = xyz.shape
    G = groups
    if G <= 1 or M % G != 0 or n_samples < G or C != 3:
        return farthest_point_sample_seeded(xyz, seeds, n_samples,
                                            use_pallas)
    # one multi-operand sort carries the coordinates as payload — the
    # sort itself is ~1 ms at [32, 32768] on v5e while a separate
    # take_along_axis gather of the sorted points costs ~8-13 ms
    # (scripts/exp_morton_sort.py), so sort-with-payload is the whole
    # trick that makes point-level spatial cells affordable
    iota = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    _, x, y, z, order = jax.lax.sort(
        (_morton_key(xyz), xyz[..., 0], xyz[..., 1], xyz[..., 2], iota),
        dimension=-1, num_keys=1, is_stable=True)
    pts = jnp.stack([x, y, z], axis=-1)                     # [B, M, 3]

    mg = -(-n_samples // G)
    grouped = pts.reshape(B * G, M // G, C)
    S = seeds.shape[1]
    seeds_rep = jnp.broadcast_to(seeds[:, None], (B, G, S, C))
    seeds_rep = seeds_rep.reshape(B * G, S, C)
    sel = farthest_point_sample_seeded(grouped, seeds_rep, mg, use_pallas)
    sel = jnp.take_along_axis(order.reshape(B, G, M // G),
                              sel.reshape(B, G, mg), axis=2)
    sel = jnp.transpose(sel, (0, 2, 1)).reshape(B, G * mg)
    return sel[:, :n_samples]


def farthest_point_sample_morton(xyz: jax.Array, n_samples: int,
                                 groups: int,
                                 use_pallas: bool | None = None
                                 ) -> jax.Array:
    """Morton-partitioned grouped UNSEEDED FPS (round 4b).

    The grouped-union merge: sort once by Morton key, chop into
    ``groups`` equal spatially-compact cells, FPS ``n/G`` points from
    each cell independently — every candidate (originals included)
    competes like in the reference's free FPS over the union, unlike the
    seeded policy that force-emits all originals (protocol-scale
    uniformity cost measured in QUALITY.md round-4b). Cell mechanics and
    the sort-with-payload trick are identical to
    :func:`farthest_point_sample_seeded_morton`.
    """
    B, M, C = xyz.shape
    G = groups
    if (G <= 1 or M % G != 0 or n_samples < G or C != 3
            or -(-n_samples // G) > M // G):
        # the last guard: ceil(n/G) beyond the per-cell candidate count
        # would make each cell return duplicate indices
        return farthest_point_sample(xyz, n_samples, use_pallas)
    iota = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    _, x, y, z, order = jax.lax.sort(
        (_morton_key(xyz), xyz[..., 0], xyz[..., 1], xyz[..., 2], iota),
        dimension=-1, num_keys=1, is_stable=True)
    pts = jnp.stack([x, y, z], axis=-1)                     # [B, M, 3]

    mg = -(-n_samples // G)
    grouped = pts.reshape(B * G, M // G, C)
    sel = farthest_point_sample(grouped, mg, use_pallas)
    sel = jnp.take_along_axis(order.reshape(B, G, M // G),
                              sel.reshape(B, G, mg), axis=2)
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
