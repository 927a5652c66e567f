"""Ablate the batched FPS kernel's per-step phases to find the cost center.

Variants (timing-only; V2+ produce wrong indices by construction):
  V1 full kernel (baseline)
  V2 pick-by-masked-sum replaced with a value-derived dummy (drops ~5
     passes)
  V3 V2 + argmax dropped (keeps the max reduce)
  V4 V3 + max reduce dropped (pure distance update + min)
"""

from __future__ import annotations

import functools
import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/puflow_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import puflow_tpu  # noqa: F401
from puflow_tpu.utils.timing import time_fn

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _kernel(xs_ref, ys_ref, zs_ref, out_ref, mind_ref, *, n_valid, m,
            variant):
    B, np_ = xs_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, np_), 1)
    valid = lane < n_valid
    mind_ref[...] = jnp.where(valid, jnp.float32(jnp.inf),
                              -jnp.float32(jnp.inf))
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, out_ref.shape[-1]), 1)
    out_ref[...] = jnp.zeros_like(out_lane)
    xs, ys, zs = xs_ref[...], ys_ref[...], zs_ref[...]

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
        if variant >= 4:
            mx = jnp.sum(d[:, :8], axis=1)  # dummy dependency
            return mx, mx, mx
        mx = jnp.max(mind, axis=1)
        if variant >= 3:
            return mx, mx, mx
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)
        out_ref[...] = jnp.where(out_lane == i, nxt[:, None], out_ref[...])
        if variant >= 2:
            return mx, mx, mx
        return pick(nxt)

    zero = jnp.zeros((B,), jnp.int32)
    jax.lax.fori_loop(1, m, body, pick(zero))


@functools.partial(jax.jit, static_argnums=(1, 2))
def run(xyz, n_samples, variant):
    B, N, _ = xyz.shape
    mp_ = (n_samples + 127) // 128 * 128
    planes = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))
    xs, ys, zs = planes[0], planes[1], planes[2]
    kernel = functools.partial(_kernel, n_valid=N, m=n_samples,
                               variant=variant)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mp_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
    )(xs, ys, zs)
    return out[:, :n_samples]


x = jax.random.normal(jax.random.PRNGKey(0), (8, 40960, 3))
for v in (1, 2, 3, 4):
    t = time_fn(lambda v=v: run(x, 8216, v), iters=5, warmup=1)
    print(f"V{v}: {t*1e3:7.1f} ms", flush=True)
