"""FPS kernel v2 candidate: manual argmax + MXU one-hot pick.

Ablation (exp_fps_ablate.py, [8, 40960] -> 8216): full 24.0 ms, of which
argmax ~8.7 ms and the masked-sum pick ~6 ms. V2 replaces:
  * jnp.argmax -> max + (mind == mx) + min-iota reduce (better lowering)
  * pick -> one-hot row (bf16) x per-cloud [N, 3] hi/lo MXU dots (exact)
Checks index equality vs the shipped kernel, then times both.
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


def _kernel_v2(xs_ref, ys_ref, zs_ref, rhi_ref, rlo_ref, out_ref, mind_ref,
               *, n_valid, m, B):
    """rhi/rlo: [N, 3B] hi/lo bf16 coordinate pack — column 3*b + c holds
    coordinate c of cloud b (3B lanes pad to 128; a [B, N, 3] rhs would pad
    3 -> 128 lanes and cost 80 MB)."""
    _, np_ = xs_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, np_), 1)
    valid = lane < n_valid
    mind_ref[...] = jnp.where(valid, jnp.float32(jnp.inf),
                              -jnp.float32(jnp.inf))
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, out_ref.shape[-1]), 1)
    out_ref[...] = jnp.zeros_like(out_lane)
    xs, ys, zs = xs_ref[...], ys_ref[...], zs_ref[...]
    big = jnp.int32(2 ** 30)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 1)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 0)

    def dot(oh, rhs):
        return jax.lax.dot_general(
            oh, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    def pick(nxt):
        oh = (lane == nxt[:, None]).astype(jnp.bfloat16)   # [B, N]
        res = dot(oh, rhi_ref[...]) + dot(oh, rlo_ref[...])  # [B, 3B]
        x = jnp.sum(jnp.where(col3 == 3 * row3 + 0, res, 0.0), axis=1)
        y = jnp.sum(jnp.where(col3 == 3 * row3 + 1, res, 0.0), axis=1)
        z = jnp.sum(jnp.where(col3 == 3 * row3 + 2, res, 0.0), axis=1)
        return x, y, z

    def body(i, carry):
        x, y, z = carry
        dx = xs - x[:, None]
        dy = ys - y[:, None]
        dz = zs - z[:, None]
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        mx = jnp.max(mind, axis=1)
        nxt = jnp.min(jnp.where(mind == mx[:, None], lane, big), axis=1)
        out_ref[...] = jnp.where(out_lane == i, nxt[:, None], out_ref[...])
        return pick(nxt)

    jax.lax.fori_loop(1, m, body, pick(jnp.zeros((B,), jnp.int32)))


@functools.partial(jax.jit, static_argnums=(1,))
def run_v2(xyz, n_samples):
    B, N, _ = xyz.shape
    mp_ = (n_samples + 127) // 128 * 128
    planes = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))
    xs, ys, zs = planes[0], planes[1], planes[2]
    # [N, 3B] coordinate pack: column 3*b + c = coord c of cloud b
    p32 = jnp.transpose(xyz.astype(jnp.float32), (1, 0, 2)).reshape(N, 3 * B)
    rhi = p32.astype(jnp.bfloat16)
    rlo = (p32 - rhi.astype(jnp.float32)).astype(jnp.bfloat16)
    kernel = functools.partial(_kernel_v2, n_valid=N, m=n_samples, B=B)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mp_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
    )(xs, ys, zs, rhi, rlo)
    return out[:, :n_samples]


x = jax.random.normal(jax.random.PRNGKey(0), (8, 40960, 3))
old = np.asarray(farthest_point_sample_pallas(x, 8216))
new = np.asarray(run_v2(x, 8216))
print("indices equal:", np.array_equal(old, new), flush=True)
t_old = time_fn(lambda: farthest_point_sample_pallas(x, 8216), iters=5)
t_new = time_fn(lambda: run_v2(x, 8216), iters=5)
print(f"old {t_old*1e3:.1f} ms  v2 {t_new*1e3:.1f} ms", flush=True)
