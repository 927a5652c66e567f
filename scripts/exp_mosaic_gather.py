"""Mosaic in-kernel gather micro-benchmark.

The fused kernels gather neighbour rows as one-hot MXU matmuls
([k*n, n] bf16 @ [n, C]): ~46% of the encoder's padded MXU passes. If
Mosaic can lower a NATIVE dynamic row gather (jnp.take along the
sublane axis) at speed, that cost disappears. This measures, per
program: one-hot matmul vs jnp.take vs a one-hot with f32 2-pass, at
the encoder's shape (4096 rows from a 256-row table, 128 channels wide,
1024 programs).

Usage: python scripts/exp_mosaic_gather.py
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

B, ROWS, N, C = 1024, 4096, 256, 128
_CP = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _onehot_kernel(idx_ref, tab_ref, out_ref, *, passes: int):
    idx_col = idx_ref[0]                                   # [ROWS, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ROWS, N), 1)
    onehot = (cols == idx_col).astype(jnp.bfloat16)
    tab = tab_ref[0]

    def dot(b):
        return jax.lax.dot_general(onehot, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    hi = tab.astype(jnp.bfloat16)
    if passes == 1:
        out_ref[0] = dot(hi)
    else:
        lo = (tab - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[0] = dot(hi) + dot(lo)


def _take_kernel(idx_ref, tab_ref, out_ref):
    idx = idx_ref[0][:, 0]                                 # [ROWS]
    out_ref[0] = jnp.take(tab_ref[0], idx, axis=0)         # [ROWS, C]


def run(kernel, name):
    idx = jax.random.randint(jax.random.PRNGKey(0), (B, ROWS, 1), 0, N,
                             dtype=jnp.int32)
    tab = jax.random.normal(jax.random.PRNGKey(1), (B, N, C),
                            dtype=jnp.float32)
    call = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ROWS, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ROWS, C), jnp.float32),
        compiler_params=_CP,
    )
    try:
        f = jax.jit(lambda i, t: jnp.sum(call(i, t)))
        f(idx, tab)
        t = time_fn(f, idx, tab, iters=20)
        print(f"{name:22s}: {t*1e3:7.2f} ms", flush=True)
        return call
    except Exception as e:
        print(f"{name:22s}: FAILED {str(e)[:200]}", flush=True)
        return None


def main():
    run(functools.partial(_onehot_kernel, passes=1), "onehot bf16 1-pass")
    run(functools.partial(_onehot_kernel, passes=2), "onehot f32 2-pass")
    c_take = run(_take_kernel, "jnp.take sublane")
    if c_take is not None:
        # correctness vs host gather
        idx = jax.random.randint(jax.random.PRNGKey(0), (2, ROWS, 1), 0, N,
                                 dtype=jnp.int32)
        tab = jax.random.normal(jax.random.PRNGKey(1), (2, N, C),
                                dtype=jnp.float32)
        # rebuild at B=2 for the check
        call = pl.pallas_call(
            _take_kernel, grid=(2,),
            in_specs=[pl.BlockSpec((1, ROWS, 1), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, ROWS, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, ROWS, C), jnp.float32),
            compiler_params=_CP)
        got = np.asarray(call(idx, tab))
        want = np.asarray(tab)[np.arange(2)[:, None],
                               np.asarray(idx)[..., 0]]
        print("take exact:", bool((got == want).all()), flush=True)


if __name__ == "__main__":
    main()
