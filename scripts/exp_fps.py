"""FPS kernel experiments: pass-count micro-opts + bf16 distance variant.

Compares against the shipped batched kernel on the merge shape
[8, 40960] -> 8216 and checks index agreement.
Usage: python scripts/exp_fps.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import puflow_tpu  # noqa: F401
from puflow_tpu.ops.pallas.fps_pallas import (_round_up,
                                              farthest_point_sample_pallas)
from puflow_tpu.utils.timing import time_fn


def _kernel_v2(xyz_ref, psq_ref, out_ref, mind_ref, *, n_valid: int, m: int):
    """Micro-optimised batched kernel:
    - |p|^2 precomputed outside the kernel (d = psq - 2*t + |c|^2)
    - selection mask computed once, reused for the 3 coordinate picks
    """
    B = xyz_ref.shape[1]
    np_ = xyz_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, np_), 1)
    valid = lane < n_valid
    mind_ref[...] = jnp.where(valid, jnp.float32(jnp.inf),
                              -jnp.float32(jnp.inf))
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, out_ref.shape[-1]), 1)
    out_ref[...] = jnp.zeros_like(out_lane)

    xs = xyz_ref[0]
    ys = xyz_ref[1]
    zs = xyz_ref[2]
    psq = psq_ref[0]

    def pick(idx):
        sel = lane == idx[:, None]
        x = jnp.sum(jnp.where(sel, xs, 0.0), axis=1)
        y = jnp.sum(jnp.where(sel, ys, 0.0), axis=1)
        z = jnp.sum(jnp.where(sel, zs, 0.0), axis=1)
        c2 = jnp.sum(jnp.where(sel, psq, 0.0), axis=1)
        return x, y, z, c2

    def body(i, carry):
        x, y, z, c2 = carry
        t = xs * x[:, None]
        t += ys * y[:, None]
        t += zs * z[:, None]
        d = (psq + c2[:, None]) - 2.0 * t
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)
        out_ref[...] = jnp.where(out_lane == i, nxt[:, None], out_ref[...])
        return pick(nxt)

    zero = jnp.zeros((B,), jnp.int32)
    jax.lax.fori_loop(1, m, body, pick(zero))


@functools.partial(jax.jit, static_argnums=(1,))
def fps_v2(xyz, n_samples):
    B, N, _ = xyz.shape
    np_ = _round_up(N, 128)
    mp_ = _round_up(n_samples, 128)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # [3, B, N]
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, np_ - N)))
    psq = jnp.sum(xyz_t * xyz_t, axis=0, keepdims=True)        # [1, B, N]
    kernel = functools.partial(_kernel_v2, n_valid=N, m=n_samples)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mp_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, np_), jnp.float32)],
    )(xyz_t, psq)
    return out[:, :n_samples]


def _kernel_bf16(xyz16_ref, xyz32_ref, out_ref, mind_ref, *, n_valid: int,
                 m: int):
    """bf16 distance/min variant: coordinates and mind in bf16 (half the
    vregs per pass). Picks + init run on an f32 coordinate copy because
    Mosaic cannot relayout (8,128) i1 masks onto (16,128) bf16 tiles.
    Approximate: selections can differ from f32 in bf16-resolution ties."""
    B = xyz16_ref.shape[1]
    np_ = xyz16_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, np_), 1)
    valid = lane < n_valid
    mind_ref[...] = jnp.where(valid, jnp.float32(3.4e38),
                              jnp.float32(-3.4e38)).astype(jnp.bfloat16)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, out_ref.shape[-1]), 1)
    out_ref[...] = jnp.zeros_like(out_lane)

    xs = xyz16_ref[0]
    ys = xyz16_ref[1]
    zs = xyz16_ref[2]
    xs32 = xyz32_ref[0]
    ys32 = xyz32_ref[1]
    zs32 = xyz32_ref[2]

    def pick(idx):
        sel = lane == idx[:, None]
        x = jnp.sum(jnp.where(sel, xs32, 0.0), axis=1)
        y = jnp.sum(jnp.where(sel, ys32, 0.0), axis=1)
        z = jnp.sum(jnp.where(sel, zs32, 0.0), axis=1)
        return (x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
                z.astype(jnp.bfloat16))

    def body(i, carry):
        x, y, z = carry
        dx = xs - x[:, None]
        dy = ys - y[:, None]
        dz = zs - z[:, None]
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        # Mosaic argmax only lowers for f32
        nxt = jnp.argmax(mind.astype(jnp.float32), axis=1).astype(jnp.int32)
        out_ref[...] = jnp.where(out_lane == i, nxt[:, None], out_ref[...])
        return pick(nxt)

    zero = jnp.zeros((B,), jnp.int32)
    jax.lax.fori_loop(1, m, body, pick(zero))


@functools.partial(jax.jit, static_argnums=(1,))
def fps_bf16(xyz, n_samples):
    B, N, _ = xyz.shape
    np_ = _round_up(N, 128)
    mp_ = _round_up(n_samples, 128)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # [3, B, N]
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, np_ - N)))
    kernel = functools.partial(_kernel_bf16, n_valid=N, m=n_samples)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mp_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, np_), jnp.bfloat16)],
    )(xyz_t.astype(jnp.bfloat16), xyz_t)
    return out[:, :n_samples]


def _kernel_v3(xyz_ref, out_ref, mind_ref, *, n_valid: int, m: int):
    """Exact delta-form math (same rounding as shipped + XLA paths):
    only layout + sel-reuse micro-opts."""
    B = xyz_ref.shape[1]
    np_ = xyz_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, np_), 1)
    valid = lane < n_valid
    mind_ref[...] = jnp.where(valid, jnp.float32(jnp.inf),
                              -jnp.float32(jnp.inf))
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, out_ref.shape[-1]), 1)
    out_ref[...] = jnp.zeros_like(out_lane)

    xs = xyz_ref[0]
    ys = xyz_ref[1]
    zs = xyz_ref[2]

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
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)
        out_ref[...] = jnp.where(out_lane == i, nxt[:, None], out_ref[...])
        return pick(nxt)

    zero = jnp.zeros((B,), jnp.int32)
    jax.lax.fori_loop(1, m, body, pick(zero))


@functools.partial(jax.jit, static_argnums=(1,))
def fps_v3(xyz, n_samples):
    B, N, _ = xyz.shape
    np_ = _round_up(N, 128)
    mp_ = _round_up(n_samples, 128)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # [3, B, N]
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, np_ - N)))
    kernel = functools.partial(_kernel_v3, n_valid=N, m=n_samples)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mp_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, np_), jnp.float32)],
    )(xyz_t)
    return out[:, :n_samples]


def _kernel_v2b(xyz_ref, psq_ref, out_ref, mind_ref, *, n_valid: int, m: int):
    """v2 + scalar c2 = x^2+y^2+z^2 (drops the 4th masked reduction)."""
    B = xyz_ref.shape[1]
    np_ = xyz_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, np_), 1)
    valid = lane < n_valid
    mind_ref[...] = jnp.where(valid, jnp.float32(jnp.inf),
                              -jnp.float32(jnp.inf))
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, out_ref.shape[-1]), 1)
    out_ref[...] = jnp.zeros_like(out_lane)

    xs = xyz_ref[0]
    ys = xyz_ref[1]
    zs = xyz_ref[2]
    psq = psq_ref[0]

    def pick(idx):
        sel = lane == idx[:, None]
        x = jnp.sum(jnp.where(sel, xs, 0.0), axis=1)
        y = jnp.sum(jnp.where(sel, ys, 0.0), axis=1)
        z = jnp.sum(jnp.where(sel, zs, 0.0), axis=1)
        return x, y, z

    def body(i, carry):
        x, y, z = carry
        c2 = x * x + y * y + z * z                       # [B] scalar row
        t = xs * x[:, None]
        t += ys * y[:, None]
        t += zs * z[:, None]
        d = (psq + c2[:, None]) - 2.0 * t
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)
        out_ref[...] = jnp.where(out_lane == i, nxt[:, None], out_ref[...])
        return pick(nxt)

    zero = jnp.zeros((B,), jnp.int32)
    jax.lax.fori_loop(1, m, body, pick(zero))


@functools.partial(jax.jit, static_argnums=(1,))
def fps_v2b(xyz, n_samples):
    B, N, _ = xyz.shape
    np_ = _round_up(N, 128)
    mp_ = _round_up(n_samples, 128)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, np_ - N)))
    psq = jnp.sum(xyz_t * xyz_t, axis=0, keepdims=True)
    kernel = functools.partial(_kernel_v2b, n_valid=N, m=n_samples)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mp_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, np_), jnp.float32)],
    )(xyz_t, psq)
    return out[:, :n_samples]


def main():
    B, N, m = 8, 40960, 8216
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, 3), dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    ref = np.asarray(farthest_point_sample_pallas(pts, m))
    v2 = np.asarray(fps_v2(pts, m))
    v2b = np.asarray(fps_v2b(pts, m))
    v3 = np.asarray(fps_v3(pts, m))
    print("v2  == ref:", np.array_equal(v2, ref))
    print("v2b == ref:", np.array_equal(v2b, ref))
    print("v3  == ref:", np.array_equal(v3, ref))
    print("v2b vs ref overlap:",
          np.mean([np.isin(v2b[i], ref[i]).mean() for i in range(B)]))

    t0 = time_fn(lambda: farthest_point_sample_pallas(pts, m), iters=5)
    t2 = time_fn(lambda: fps_v2(pts, m), iters=5)
    t2b = time_fn(lambda: fps_v2b(pts, m), iters=5)
    t3 = time_fn(lambda: fps_v3(pts, m), iters=5)
    print(f"shipped : {t0*1e3:8.2f} ms")
    print(f"v2      : {t2*1e3:8.2f} ms")
    print(f"v2b     : {t2b*1e3:8.2f} ms")
    print(f"v3      : {t3*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
