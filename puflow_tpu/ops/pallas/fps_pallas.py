"""Farthest-point sampling as a single Pallas kernel, VMEM-resident.

The XLA formulation (`puflow_tpu.ops.fps`) pays per-iteration HLO-loop
overhead (gather + [B, N] temporaries through HBM each of the m iterations).
Here the cloud lives in VMEM as three separate [B, N] coordinate planes
(N on the 128-lane axis, B on the 8-sublane axis — separate planes so no
axis is ever padded to a full 8-sublane tile, which a [B, 3, N] layout
wastes 2.7x VMEM on), the min-distance cache is a VMEM scratch, and the
m-step selection loop runs inside one kernel launch with only VPU work per
step.

Distance math is the plain delta form ((p-c)^2 summed), identical rounding
to the XLA path and the reference's torch fallback
(`modules/utils/fps.py:40-73`) — the two implementations return identical
indices. The selected point's coordinates are extracted by ONE lane mask
reused for all three masked-sum reductions (Mosaic cannot load single lanes
at dynamic offsets); the output index is written with a one-hot select.

Capacity: 4 * B * N * 4B must fit the ~16 MB scoped VMEM; the batched
kernel covers the PU1K merge path ([8, 40960]) with room to B=16, larger
problems fall back to a per-cloud grid kernel (4 * N * 4B per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fps_kernel(xs_ref, ys_ref, zs_ref, out_ref, mind_ref, *, n_valid: int,
                m: int):
    """m-step selection over [B, N] coordinate planes. In the grid variant
    the refs carry a leading 1-sized block axis ([1, 1, N] / [1, 1, m])."""
    if xs_ref.ndim == 3:
        xs_ref, ys_ref, zs_ref = xs_ref.at[0], ys_ref.at[0], zs_ref.at[0]
        out_ref = out_ref.at[0]
    B, np_ = xs_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, np_), 1)
    valid = lane < n_valid
    # padded slots can never win the argmax
    mind_ref[...] = jnp.where(valid, jnp.float32(jnp.inf),
                              -jnp.float32(jnp.inf))
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, out_ref.shape[-1]), 1)
    out_ref[...] = jnp.zeros_like(out_lane)

    xs = xs_ref[...]
    ys = ys_ref[...]
    zs = zs_ref[...]

    def pick(idx):
        sel = lane == idx[:, None]
        x = jnp.sum(jnp.where(sel, xs, 0.0), axis=1)
        y = jnp.sum(jnp.where(sel, ys, 0.0), axis=1)
        z = jnp.sum(jnp.where(sel, zs, 0.0), axis=1)
        return x, y, z

    def body(i, carry):
        x, y, z = carry
        dx = xs - x[:, None]
        dy = ys - y[:, None]
        dz = zs - z[:, None]
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        # farthest = min lane index among exact-max entries. Same
        # first-occurrence semantics as argmax (and the numpy oracle), but
        # Mosaic lowers max + equality-select + min ~20% faster than its
        # argmax reduction (19.2 vs 24.4 ms on the [8, 40960] -> 8216
        # merge; scripts/exp_fps_bf16.py V6).
        mx = jnp.max(mind, axis=1)
        nxt = jnp.min(jnp.where(mind == mx[:, None], lane,
                                jnp.int32(2 ** 30)), axis=1)
        out_ref[...] = jnp.where(out_lane == i, nxt[:, None], out_ref[...])
        return pick(nxt)

    zero = jnp.zeros((B,), jnp.int32)
    jax.lax.fori_loop(1, m, body, pick(zero))


def _split_hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _seed_mind_kernel(p_ref, st_ref, s2_ref, out_ref):
    """min-over-seeds squared distance for one candidate chunk.

    d[i, j] = |p_i|^2 - 2 p_i . s_j + |s_j|^2; |p_i|^2 is constant per
    row, so it is added AFTER the lane min. The cross term rides the MXU
    as a 3-pass bf16 decomposition (~2^-22 — the -2 factor is folded into
    st by the wrapper); assembling d is then 1 broadcast-add + the min
    reduction, so the whole seeding is MXU + 2 VPU passes instead of the
    S-step sequential loop a first cut used (which was LOSING ~8 ms to
    reduce latencies at S=2048)."""
    p = p_ref[0]                                           # [Mc, 3]
    st = st_ref[0]                                         # [3, S]
    s2 = s2_ref[0]                                         # [1, S]

    # hi/lo parts stacked on the contraction axis: ONE bf16 pass computes
    # hi.hi + hi.lo + lo.hi + lo.lo (the extra lo.lo term is ~2^-32 — even
    # closer to exact than the 3-term form). Contraction is 3 either way
    # after sublane padding, and one pass avoids paying the MXU pipeline
    # fill three times (measured 9.5 -> ~3 ms on the merge seeding).
    p_hi, p_lo = _split_hi_lo(p)
    st_hi, st_lo = _split_hi_lo(st)
    cross = jax.lax.dot_general(
        jnp.concatenate([p_hi, p_lo], axis=1),
        jnp.concatenate([st_hi, st_lo], axis=0),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    p2 = jnp.sum(p * p, axis=1, keepdims=True)             # [Mc, 1]
    out_ref[0] = jnp.min(cross + s2, axis=1, keepdims=True) + p2


def _fps_seeded_kernel(xs_ref, ys_ref, zs_ref, m0_ref, out_ref, mind_ref, *,
                       n_valid: int, m: int):
    """Seeded selection: the min-distance cache arrives precomputed
    (distance to the nearest seed, `_seed_mind_kernel`); each of the m
    steps selects the argmax FIRST and applies its distance update
    after."""
    B, np_ = xs_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, np_), 1)
    valid = lane < n_valid
    mind_ref[...] = jnp.where(valid, m0_ref[...], -jnp.float32(jnp.inf))
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, out_ref.shape[-1]), 1)
    out_ref[...] = jnp.zeros_like(out_lane)

    xs = xs_ref[...]
    ys = ys_ref[...]
    zs = zs_ref[...]

    def body(i, _):
        mind = mind_ref[...]
        mx = jnp.max(mind, axis=1)
        nxt = jnp.min(jnp.where(mind == mx[:, None], lane,
                                jnp.int32(2 ** 30)), axis=1)
        out_ref[...] = jnp.where(out_lane == i, nxt[:, None], out_ref[...])
        sel = lane == nxt[:, None]
        x = jnp.sum(jnp.where(sel, xs, 0.0), axis=1)
        y = jnp.sum(jnp.where(sel, ys, 0.0), axis=1)
        z = jnp.sum(jnp.where(sel, zs, 0.0), axis=1)
        dx = xs - x[:, None]
        dy = ys - y[:, None]
        dz = zs - z[:, None]
        d = dx * dx + dy * dy + dz * dz
        mind_ref[...] = jnp.minimum(mind, d)
        return 0

    jax.lax.fori_loop(0, m, body, 0)


_SEED_CHUNK = 1024


@functools.partial(jax.jit, static_argnums=(2, 3))
def farthest_point_sample_seeded_pallas(xyz: jax.Array, seeds: jax.Array,
                                        n_samples: int,
                                        interpret: bool = False) -> jax.Array:
    """Seeded Pallas FPS: candidates [B, N, 3] + seeds [B, S, 3] ->
    [B, n_samples] int32 candidate indices (see ops/fps.py docstring).

    Two kernels: an MXU seeding pass produces the nearest-seed distance
    cache, then the selection kernel runs the sequential argmax loop.

    Batches whose VMEM working set exceeds the budget are processed in
    row-chunks (every batch row is an independent FPS — unlike the plain
    kernel there is no per-cloud grid variant to fall back to)."""
    B, N, _ = xyz.shape
    S = seeds.shape[1]
    np_ = _round_up(N, 128)
    sp_ = _round_up(S, 128)
    mp_ = _round_up(n_samples, 128)

    max_rows = max(8, _VMEM_BUDGET // (np_ * 4 * _PLANES))
    if B > max_rows:
        return jnp.concatenate(
            [farthest_point_sample_seeded_pallas(
                xyz[i:i + max_rows], seeds[i:i + max_rows], n_samples,
                interpret)
             for i in range(0, B, max_rows)], axis=0)

    xyz = xyz.astype(jnp.float32)
    seeds = seeds.astype(jnp.float32)
    # pad seed slots with copies of seed 0 (min-idempotent)
    if sp_ != S:
        seeds = jnp.concatenate(
            [seeds, jnp.broadcast_to(seeds[:, :1], (B, sp_ - S, 3))], axis=1)
    # pad candidates with copies of candidate 0 (masked out by n_valid in
    # the selection kernel; keeps the seeding math finite)
    xyz_p = xyz if np_ == N else jnp.concatenate(
        [xyz, jnp.broadcast_to(xyz[:, :1], (B, np_ - N, 3))], axis=1)

    st = -2.0 * jnp.swapaxes(seeds, 1, 2)                  # [B, 3, S]
    s2 = jnp.sum(seeds * seeds, axis=-1)[:, None, :]       # [B, 1, S]

    mc = min(_SEED_CHUNK, np_)
    np_seed = _round_up(np_, mc)
    xyz_seed = xyz_p if np_seed == np_ else jnp.concatenate(
        [xyz_p, jnp.broadcast_to(xyz_p[:, :1], (B, np_seed - np_, 3))],
        axis=1)
    mind0 = pl.pallas_call(
        _seed_mind_kernel,
        grid=(B, np_seed // mc),
        in_specs=[
            pl.BlockSpec((1, mc, 3), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, sp_), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp_), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mc, 1), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, np_seed, 1), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(xyz_seed, st, s2)
    mind0 = mind0[:, :np_, 0]                              # [B, np_]

    planes = jnp.transpose(xyz_p, (2, 0, 1))               # [3, B, np_]
    kernel = functools.partial(_fps_seeded_kernel, n_valid=N, m=n_samples)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mp_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, np_), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(planes[0], planes[1], planes[2], mind0)
    return out[:, :n_samples]


# Mosaic's scoped-VMEM stack holds the 3 coordinate planes, the min-dist
# scratch, the lane iota and ~5 loop temporaries (dx/dy/dz/d/mind) — about
# 10 [B, N] f32 planes total. The kernel declares a 56 MB VMEM limit
# (v5e physical VMEM is 128 MB) so the batched path covers B=32 merge
# batches; beyond that the per-cloud grid variant takes over.
_VMEM_BUDGET = 56 * 1024 * 1024
_PLANES = 10
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample_pallas(xyz: jax.Array, n_samples: int) -> jax.Array:
    """Pallas FPS: xyz [B, N, 3] -> indices [B, n_samples] int32.

    Uses the batched kernel (all clouds advance together each iteration,
    amortising loop overhead B-fold) when the whole batch fits VMEM; falls
    back to a per-cloud grid kernel for very large clouds.
    """
    B, N, _ = xyz.shape
    np_ = _round_up(N, 128)
    mp_ = _round_up(n_samples, 128)
    planes = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # [3, B, N]
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, np_ - N)))
    xs, ys, zs = planes[0], planes[1], planes[2]

    kernel = functools.partial(_fps_kernel, n_valid=N, m=n_samples)
    batched_bytes = B * np_ * 4 * _PLANES + B * mp_ * 4
    if batched_bytes <= _VMEM_BUDGET:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, mp_), jnp.int32),
            scratch_shapes=[pltpu.VMEM((B, np_), jnp.float32)],
            compiler_params=_COMPILER_PARAMS,
        )(xs, ys, zs)
        return out[:, :n_samples]

    # grid variant: one cloud per step; a leading block axis keeps the
    # trailing two block dims ([1, N]) tiling-legal.
    row = pl.BlockSpec((1, 1, np_), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row] * 3,
        out_specs=pl.BlockSpec((1, 1, mp_), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, mp_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, np_), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
    )(xs[:, None], ys[:, None], zs[:, None])
    return out[:, 0, :n_samples]
