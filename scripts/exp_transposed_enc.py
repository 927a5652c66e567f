"""Round-4 encoder-reformulation microbenchmarks.

The shipped fused encoder (row-major: rows = k*n point-slot pairs, features
on lanes) pays full 128-lane MXU tiles for 32-wide growth layers and runs
the neighbour gather as a [k*n, n] one-hot matmul (~44% of its padded
passes). This measures the two primitives a TRANSPOSED (feature-major)
formulation needs:

  1. lane dynamic gather: out[c, r] = tab[c, idx[r]] via jnp.take /
     take_along_axis along the lane axis (256-point table = 2 lane tiles,
     decomposed as two 128-lane gathers + select if needed);
  2. transposed dense matmul: [G, P] @ [P, k*n] (G=32 rows stream through
     the MXU, k*n on output lanes — no 128-lane padding of the 32-wide
     output) vs the row-major [k*n, P] @ [P, G].

Usage: python scripts/exp_transposed_enc.py
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

B, N, K, ROWS, W = 1024, 256, 16, 4096, 256
_CP = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _bf16_dot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


# --- 1. gather variants ----------------------------------------------------
def _onehot_kernel(idx_ref, tab_ref, out_ref):
    idx_col = idx_ref[0]                                   # [ROWS, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ROWS, N), 1)
    onehot = (cols == idx_col).astype(jnp.bfloat16)
    out_ref[0] = _bf16_dot(onehot, tab_ref[0])             # [ROWS, W]


def _lane_gather_kernel(idx_ref, tabt_ref, out_ref):
    # tabt [W, N] (points on lanes), idx [1, ROWS] -> out [W, ROWS]
    idx = idx_ref[0]                                       # [1, ROWS]
    tabt = tabt_ref[0]                                     # [W, N]
    idxb = jnp.broadcast_to(idx, (W, ROWS))
    out_ref[0] = jnp.take_along_axis(tabt, idxb, axis=1)


def _lane_gather_split_kernel(idx_ref, tabt_ref, out_ref):
    # same, but explicit 128-lane-tile decomposition: two gathers + select
    idx = idx_ref[0]                                       # [1, ROWS]
    tabt = tabt_ref[0]                                     # [W, N]
    lo = jnp.broadcast_to(idx % 128, (W, ROWS))
    t0 = jnp.take_along_axis(tabt[:, :128], lo, axis=1)
    t1 = jnp.take_along_axis(tabt[:, 128:], lo, axis=1)
    hi = jnp.broadcast_to(idx >= 128, (W, ROWS))
    out_ref[0] = jnp.where(hi, t1, t0)


def _sublane_take_kernel(idx_ref, tab_ref, out_ref):
    idx = idx_ref[0][:, 0]                                 # [ROWS]
    out_ref[0] = jnp.take(tab_ref[0], idx, axis=0)         # [ROWS, W]


def run_gather(kernel, name, transposed):
    idx = jax.random.randint(jax.random.PRNGKey(0), (B, ROWS), 0, N,
                             dtype=jnp.int32)
    tab = jax.random.normal(jax.random.PRNGKey(1), (B, N, W),
                            dtype=jnp.float32)
    if transposed:
        in_specs = [
            pl.BlockSpec((1, 1, ROWS), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((1, W, ROWS), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, W, ROWS), jnp.float32)
        args = (idx[:, None, :], jnp.swapaxes(tab, 1, 2).copy())
    else:
        in_specs = [
            pl.BlockSpec((1, ROWS, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((1, ROWS, W), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, ROWS, W), jnp.float32)
        args = (idx[:, :, None], tab)
    call = pl.pallas_call(kernel, grid=(B,), in_specs=in_specs,
                          out_specs=out_spec, out_shape=out_shape,
                          compiler_params=_CP)
    try:
        f = jax.jit(lambda i, t: jnp.sum(call(i, t)))
        f(*args)
        t = time_fn(f, *args, iters=20)
        print(f"{name:28s}: {t*1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:28s}: FAILED {str(e)[:160]}", flush=True)
        return
    # correctness at B=2
    call2 = pl.pallas_call(kernel, grid=(2,), in_specs=in_specs,
                           out_specs=out_spec,
                           out_shape=jax.ShapeDtypeStruct(
                               (2,) + out_shape.shape[1:], jnp.float32),
                           compiler_params=_CP)
    a0 = args[0][:2]
    a1 = args[1][:2]
    got = np.asarray(call2(a0, a1))
    want = np.asarray(tab)[np.arange(2)[:, None], np.asarray(idx)[:2]]
    if transposed:
        want = np.swapaxes(want, 1, 2)
        ok = np.allclose(got, want)
    else:
        ok = np.allclose(got, want, atol=1e-2)  # onehot bf16 path rounds
    print(f"{name:28s}: exact={bool(ok)}", flush=True)


# --- 2. dense matmul layouts ------------------------------------------------
def _dense_rm_kernel(x_ref, w_ref, out_ref):
    # row-major: [ROWS, 96] @ [96, 32], 3 layers chained like the stack
    x = x_ref[0]
    h = _bf16_dot(x, w_ref[...][:, :32])
    h = jnp.maximum(h, 0.05 * h)
    h2 = _bf16_dot(jnp.concatenate([x[:, :64], h], axis=1),
                   w_ref[...][:, 32:64])
    h2 = jnp.maximum(h2, 0.05 * h2)
    out_ref[0] = jnp.concatenate([h, h2], axis=1)


def _dense_tm_kernel(x_ref, w_ref, out_ref):
    # transposed: [32, 96] @ [96, ROWS]
    x = x_ref[0]                                           # [96, ROWS]
    wt = w_ref[...]
    h = _bf16_dot(wt[:32, :96], x)                         # [32, ROWS]
    h = jnp.maximum(h, 0.05 * h)
    h2 = _bf16_dot(wt[32:64, :96],
                   jnp.concatenate([x[:64], h], axis=0))
    h2 = jnp.maximum(h2, 0.05 * h2)
    out_ref[0] = jnp.concatenate([h, h2], axis=0)          # [64, ROWS]


def run_dense():
    x_rm = jax.random.normal(jax.random.PRNGKey(2), (B, ROWS, 96),
                             dtype=jnp.float32)
    w_rm = jax.random.normal(jax.random.PRNGKey(3), (96, 64),
                             dtype=jnp.float32)
    call_rm = pl.pallas_call(
        _dense_rm_kernel, grid=(B,),
        in_specs=[pl.BlockSpec((1, ROWS, 96), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((96, 64), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ROWS, 64), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ROWS, 64), jnp.float32),
        compiler_params=_CP)
    f = jax.jit(lambda x, w: jnp.sum(call_rm(x, w)))
    f(x_rm, w_rm)
    print(f"{'dense row-major 2-layer':28s}: "
          f"{time_fn(f, x_rm, w_rm, iters=20)*1e3:7.2f} ms", flush=True)

    x_tm = jnp.swapaxes(x_rm, 1, 2).copy()                 # [B, 96, ROWS]
    w_tm = jax.random.normal(jax.random.PRNGKey(3), (64, 96),
                             dtype=jnp.float32)
    call_tm = pl.pallas_call(
        _dense_tm_kernel, grid=(B,),
        in_specs=[pl.BlockSpec((1, 96, ROWS), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((64, 96), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 64, ROWS), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 64, ROWS), jnp.float32),
        compiler_params=_CP)
    try:
        g = jax.jit(lambda x, w: jnp.sum(call_tm(x, w)))
        g(x_tm, w_tm)
        print(f"{'dense transposed 2-layer':28s}: "
              f"{time_fn(g, x_tm, w_tm, iters=20)*1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"{'dense transposed 2-layer':28s}: FAILED {str(e)[:160]}",
              flush=True)


def main():
    run_gather(_onehot_kernel, "onehot MXU bf16 (shipped)", False)
    run_gather(_sublane_take_kernel, "sublane jnp.take", False)
    run_gather(_lane_gather_kernel, "lane take_along_axis", True)
    run_gather(_lane_gather_split_kernel, "lane gather 2-tile split", True)
    run_dense()


if __name__ == "__main__":
    main()
