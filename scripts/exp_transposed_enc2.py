"""Round-4 encoder reformulation: IN-KERNEL slope microbenchmarks.

`exp_transposed_enc.py`'s isolated kernels are HBM-bound (the [4096, W]
gather output alone is ~2 GB across the batch), hiding the MXU/VPU cost
the fused encoder actually pays. Here each kernel repeats the op T times
on rotated inputs (no CSE) and emits only an [8, 128] reduction; the
per-op cost is the slope between T_LO and T_HI runs.

Measures, at the encoder's shape (table n=256, rows k*n=4096):
  1. one-hot MXU gather (shipped form), W = 128 and 256;
  2. lane dynamic gather in the transposed layout (2-tile split + select);
  3. dense growth layer row-major [4096, 96] @ [96, 32] vs transposed
     [32, 96] @ [96, 4096].

Usage: python scripts/exp_transposed_enc2.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import puflow_tpu  # noqa: F401
from puflow_tpu.utils.timing import time_fn

B, N, ROWS = 1024, 256, 4096
T_LO, T_HI = 2, 8
_CP = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _bf16_dot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


def _reduce_to_tile(x):
    # consume EVERY element (a partial reduction lets Mosaic/XLA dead-code
    # -eliminate most of the producing matmul -- measured: W-independent
    # slopes in the first cut of this script)
    return jnp.sum(x)


# --- one-hot MXU gather (shipped) ------------------------------------------
def _onehot_kernel(idx_ref, tab_ref, out_ref, *, t: int, w: int):
    idx_col = idx_ref[0]                                   # [ROWS, 1]
    tab = tab_ref[0]                                       # [N, w]
    acc = jnp.zeros((8, 128), jnp.float32)
    for i in range(t):
        cols = jax.lax.broadcasted_iota(jnp.int32, (ROWS, N), 1)
        onehot = ((cols == (idx_col + i) % N)).astype(jnp.bfloat16)
        g = _bf16_dot(onehot, tab)                         # [ROWS, w]
        acc = acc + _reduce_to_tile(g)
    out_ref[0] = acc


# --- transposed lane gather -------------------------------------------------
def _lane_gather_kernel(idx_ref, tabt_ref, out_ref, *, t: int, w: int):
    idx = idx_ref[0]                                       # [1, ROWS]
    tabt = tabt_ref[0]                                     # [w, N]
    acc = jnp.zeros((8, 128), jnp.float32)
    for i in range(t):
        ix = (idx + i) % N
        lo = jnp.broadcast_to(ix % 128, (w, ROWS))
        t0 = jnp.take_along_axis(tabt[:, :128], lo, axis=1)
        t1 = jnp.take_along_axis(tabt[:, 128:], lo, axis=1)
        hi = jnp.broadcast_to(ix >= 128, (w, ROWS))
        g = jnp.where(hi, t1, t0)                          # [w, ROWS]
        acc = acc + _reduce_to_tile(g)
    out_ref[0] = acc


# --- dense growth layer, two layouts ---------------------------------------
def _dense_rm_kernel(x_ref, w_ref, out_ref, *, t: int):
    x = x_ref[0]                                           # [ROWS, 96]
    wt = w_ref[...]                                        # [96, 32]
    acc = jnp.zeros((8, 128), jnp.float32)
    for i in range(t):
        h = _bf16_dot(x + jnp.float32(i), wt)              # [ROWS, 32]
        h = jnp.maximum(h, 0.05 * h)
        acc = acc + _reduce_to_tile(h)
    out_ref[0] = acc


def _dense_tm_kernel(x_ref, w_ref, out_ref, *, t: int):
    x = x_ref[0]                                           # [96, ROWS]
    wt = w_ref[...]                                        # [32, 96]
    acc = jnp.zeros((8, 128), jnp.float32)
    for i in range(t):
        h = _bf16_dot(wt, x + jnp.float32(i))              # [32, ROWS]
        h = jnp.maximum(h, 0.05 * h)
        acc = acc + _reduce_to_tile(h)
    out_ref[0] = acc


def _time_call(kernel_fn, specs_args, name):
    (in_specs, args) = specs_args
    times = {}
    for t in (T_LO, T_HI):
        call = pl.pallas_call(
            functools.partial(kernel_fn, t=t), grid=(B,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            compiler_params=_CP)
        try:
            f = jax.jit(lambda *a: jnp.sum(call(*a)))
            f(*args)
            times[t] = time_fn(f, *args, iters=20)
        except Exception as e:
            print(f"{name:32s}: FAILED {repr(e)[:300]}", flush=True)
            return
    slope = (times[T_HI] - times[T_LO]) / (T_HI - T_LO)
    print(f"{name:32s}: {slope*1e3:7.3f} ms/op  "
          f"(T{T_LO}={times[T_LO]*1e3:.2f} T{T_HI}={times[T_HI]*1e3:.2f})",
          flush=True)


def main():
    idx = jax.random.randint(jax.random.PRNGKey(0), (B, ROWS), 0, N,
                             dtype=jnp.int32)
    for w in (128, 256):
        tab = jax.random.normal(jax.random.PRNGKey(1), (B, N, w),
                                dtype=jnp.float32)
        _time_call(
            functools.partial(_onehot_kernel, w=w),
            ([pl.BlockSpec((1, ROWS, 1), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((1, N, w), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)],
             (idx[:, :, None], tab)),
            f"onehot MXU gather W={w}")
        tabt = jnp.swapaxes(tab, 1, 2).copy()
        _time_call(
            functools.partial(_lane_gather_kernel, w=w),
            ([pl.BlockSpec((1, 1, ROWS), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((1, w, N), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)],
             (idx[:, None, :], tabt)),
            f"lane gather (2-tile) W={w}")

    x_rm = jax.random.normal(jax.random.PRNGKey(2), (B, ROWS, 96),
                             dtype=jnp.float32)
    w_rm = jax.random.normal(jax.random.PRNGKey(3), (96, 32),
                             dtype=jnp.float32)
    _time_call(
        _dense_rm_kernel,
        ([pl.BlockSpec((1, ROWS, 96), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((96, 32), lambda b: (0, 0),
                       memory_space=pltpu.VMEM)],
         (x_rm, w_rm)),
        "dense row-major [4096,96]@[96,32]")
    x_tm = jnp.swapaxes(x_rm, 1, 2).copy()
    w_tm = jax.random.normal(jax.random.PRNGKey(3), (32, 96),
                             dtype=jnp.float32)
    _time_call(
        _dense_tm_kernel,
        ([pl.BlockSpec((1, 96, ROWS), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((32, 96), lambda b: (0, 0),
                       memory_space=pltpu.VMEM)],
         (x_tm, w_tm)),
        "dense transposed [32,96]@[96,4096]")


if __name__ == "__main__":
    main()
