"""FPS kernel: isolated variants on the real chip.

  V1  shipped kernel (f32, argmax, masked-sum pick)          [23.4 ms]
  V5  bf16 coordinate planes + bf16 min-distance cache (the distance
      update is the dominant elementwise phase; packed bf16 runs the VPU
      at 2x). Mosaic cannot mix i1 masks across (8,128)/(16,128) packings,
      so the valid-mask init selects in f32 then casts, and the argmax
      runs on an f32 cast of the bf16 cache (1 extra pass, still net
      ~half the passes). Selection noise ~2^-8 of distance, pool intact —
      unlike thinning, which shrank the pool.
  V6  f32 but argmax replaced by max + (mind==mx) + min-iota (isolated)
"""

from __future__ import annotations

import functools
import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/puflow_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import puflow_tpu  # noqa: F401
from puflow_tpu.ops.pallas.fps_pallas import farthest_point_sample_pallas
from puflow_tpu.utils.timing import time_fn

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _kernel(xs_ref, ys_ref, zs_ref, out_ref, mind_ref, *, n_valid, m,
            variant):
    B, np_ = xs_ref.shape
    ftype = mind_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, np_), 1)
    valid = lane < n_valid
    # select in f32 (i1 mask shares the (8,128) packing), cast to the
    # cache dtype after — Mosaic can't relayout an i1 vector to (16,128)
    mind_ref[...] = jnp.where(valid, jnp.inf, -jnp.inf).astype(ftype)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, out_ref.shape[-1]), 1)
    out_ref[...] = jnp.zeros_like(out_lane)
    xs, ys, zs = xs_ref[...], ys_ref[...], zs_ref[...]
    # distance-phase copies in the cache dtype (one-time cast for V5); the
    # pick phase stays on the f32 planes — an i32-compare i1 mask cannot
    # select into (16,128)-packed bf16 vectors
    xd, yd, zd = (p.astype(ftype) for p in (xs, ys, zs))
    big = jnp.int32(2 ** 30)

    def pick(idx):
        sel = lane == idx[:, None]
        x = jnp.sum(jnp.where(sel, xs, 0), axis=1)
        y = jnp.sum(jnp.where(sel, ys, 0), axis=1)
        z = jnp.sum(jnp.where(sel, zs, 0), axis=1)
        return x, y, z

    def body(i, carry):
        x, y, z = carry
        dx = xd - x.astype(ftype)[:, None]
        dy = yd - y.astype(ftype)[:, None]
        dz = zd - z.astype(ftype)[:, None]
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        if variant == 6:
            mx = jnp.max(mind, axis=1)
            nxt = jnp.min(jnp.where(mind == mx[:, None], lane, big), axis=1)
        else:
            nxt = jnp.argmax(mind.astype(jnp.float32),
                             axis=1).astype(jnp.int32)
        out_ref[...] = jnp.where(out_lane == i, nxt[:, None], out_ref[...])
        return pick(nxt)

    zero = jnp.zeros((B,), jnp.int32)
    jax.lax.fori_loop(1, m, body, pick(zero))


@functools.partial(jax.jit, static_argnums=(1, 2))
def run(xyz, n_samples, variant):
    B, N, _ = xyz.shape
    mp_ = (n_samples + 127) // 128 * 128
    ftype = jnp.bfloat16 if variant == 5 else jnp.float32
    planes = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))
    xs, ys, zs = planes[0], planes[1], planes[2]
    kernel = functools.partial(_kernel, n_valid=N, m=n_samples,
                               variant=variant)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mp_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), ftype)],
        compiler_params=_COMPILER_PARAMS,
    )(xs, ys, zs)
    return out[:, :n_samples]


x = jax.random.normal(jax.random.PRNGKey(0), (8, 40960, 3))
ref = np.asarray(farthest_point_sample_pallas(x, 8216))
for v in (1, 5, 6):
    try:
        got = np.asarray(run(x, 8216, v))
    except Exception as e:  # noqa: BLE001 — experiment harness
        print(f"V{v}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        continue
    t = time_fn(lambda v=v: run(x, 8216, v), iters=5, warmup=1)
    same = np.array_equal(ref, got)
    # how far do V5's selections drift? fraction of differing indices
    frac = float((ref != got).mean())
    print(f"V{v}: {t*1e3:7.1f} ms  indices==shipped: {same}  "
          f"diff-frac {frac:.3f}", flush=True)
