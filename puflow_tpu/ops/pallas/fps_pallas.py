"""Farthest-point sampling as a single Pallas kernel, VMEM-resident.

The XLA formulation (`puflow_tpu.ops.fps`) pays per-iteration HLO-loop
overhead (gather + [B, N] temporaries through HBM each of the m iterations).
Here the whole cloud lives in VMEM in [3, N] layout (N on the 128-lane axis),
the min-distance cache is a VMEM scratch, and the m-step selection loop runs
inside one kernel launch with only VPU work per step.

TPU constraint note: Mosaic cannot load/store single lanes at dynamic
offsets, so the selected point's coordinates are extracted by a masked
reduction (sum over `lane == argmax`) and the output index is written with a
one-hot select — both full-width VPU ops, both cheap next to the distance
update.

Capacity: N * 4 * 4B must fit VMEM (~16 MB) -> N up to ~1M points/cloud; the
PU-GAN merge path (N ~= 100K) fits comfortably.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fps_kernel(xyz_ref, out_ref, mind_ref, *, n_valid: int, m: int):
    np_ = xyz_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    valid = lane < n_valid
    # padded slots can never win the argmax
    mind_ref[...] = jnp.where(valid, jnp.float32(jnp.inf),
                              -jnp.float32(jnp.inf))
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, out_ref.shape[-1]), 1)
    out_ref[0, 0:1, :] = jnp.zeros_like(out_lane)

    xs = xyz_ref[0, 0:1, :]
    ys = xyz_ref[0, 1:2, :]
    zs = xyz_ref[0, 2:3, :]

    def pick(row, idx):
        return jnp.sum(jnp.where(lane == idx, row, 0.0))

    def body(i, carry):
        x, y, z = carry
        dx = xs - x
        dy = ys - y
        dz = zs - z
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        nxt = jnp.argmax(mind).astype(jnp.int32)
        out_ref[0, 0:1, :] = jnp.where(out_lane == i, nxt, out_ref[0, 0:1, :])
        return pick(xs, nxt), pick(ys, nxt), pick(zs, nxt)

    x0, y0, z0 = pick(xs, 0), pick(ys, 0), pick(zs, 0)
    jax.lax.fori_loop(1, m, body, (x0, y0, z0))


def _fps_kernel_batched(xyz_ref, out_ref, mind_ref, *, n_valid: int, m: int):
    """Whole batch per iteration: [B, N] VPU rows amortise the loop
    overhead B-fold vs the per-cloud grid kernel."""
    B = xyz_ref.shape[0]
    np_ = xyz_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, np_), 1)
    valid = lane < n_valid
    mind_ref[...] = jnp.where(valid, jnp.float32(jnp.inf),
                              -jnp.float32(jnp.inf))
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, out_ref.shape[-1]), 1)
    out_ref[...] = jnp.zeros_like(out_lane)

    xs = xyz_ref[:, 0, :]
    ys = xyz_ref[:, 1, :]
    zs = xyz_ref[:, 2, :]

    def pick(rows, idx):
        sel = lane == idx[:, None]
        return jnp.sum(jnp.where(sel, rows, 0.0), axis=1)  # [B]

    def body(i, carry):
        x, y, z = carry
        dx = xs - x[:, None]
        dy = ys - y[:, None]
        dz = zs - z[:, None]
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)   # [B]
        out_ref[...] = jnp.where(out_lane == i, nxt[:, None], out_ref[...])
        return pick(xs, nxt), pick(ys, nxt), pick(zs, nxt)

    zero = jnp.zeros((B,), jnp.int32)
    jax.lax.fori_loop(1, m, body,
                      (pick(xs, zero), pick(ys, zero), pick(zs, zero)))


_VMEM_BUDGET = 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample_pallas(xyz: jax.Array, n_samples: int) -> jax.Array:
    """Pallas FPS: xyz [B, N, 3] -> indices [B, n_samples] int32.

    Uses the batched kernel (all clouds advance together each iteration)
    when the whole batch fits VMEM; falls back to a per-cloud grid kernel
    for very large clouds.
    """
    B, N, _ = xyz.shape
    np_ = _round_up(N, 128)
    mp_ = _round_up(n_samples, 128)
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)   # [B, 3, N]
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, np_ - N)))

    batched_bytes = B * np_ * 4 * (3 + 1) + B * mp_ * 4
    if batched_bytes <= _VMEM_BUDGET:
        kernel = functools.partial(_fps_kernel_batched, n_valid=N,
                                   m=n_samples)
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, mp_), jnp.int32),
            scratch_shapes=[pltpu.VMEM((B, np_), jnp.float32)],
        )(xyz_t)
        return out[:, :n_samples]

    kernel = functools.partial(_fps_kernel, n_valid=N, m=n_samples)
    # output carries a dummy 8-sublane axis to satisfy TPU tiling; row 0 used
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, np_), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, mp_), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, mp_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, np_), jnp.float32)],
    )(xyz_t)
    return out[:, 0, :n_samples]
