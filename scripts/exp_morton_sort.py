"""Decompose the Morton-partition overhead at the bench union shape.

The Morton grouped merge measured 16.7 ms vs strided 5.5 ms — the delta is
key computation + argsort + two take_along_axis gathers. XLA sort carries
payloads natively, so sorting (key, x, y, z, iota) in ONE lax.sort may beat
argsort + gather. Measures each piece in isolation.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/puflow_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.ops.fps import _morton_key
from puflow_tpu.utils.timing import time_fn


def main():
    rng = np.random.default_rng(0)
    B, M = 32, 32768
    pts = rng.normal(size=(B, M, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = jnp.asarray(pts)

    def key_only(p):
        return jnp.sum(_morton_key(p).astype(jnp.float32))

    def argsort_only(p):
        return jnp.sum(jnp.argsort(_morton_key(p), axis=-1))

    def argsort_gather(p):
        order = jnp.argsort(_morton_key(p), axis=-1)
        sorted_pts = jnp.take_along_axis(p, order[..., None], axis=1)
        return jnp.sum(sorted_pts) + jnp.sum(order)

    def multisort(p):
        k = _morton_key(p)
        iota = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
        k2, x, y, z, o = jax.lax.sort(
            (k, p[..., 0], p[..., 1], p[..., 2], iota), dimension=-1,
            num_keys=1)
        return jnp.sum(x) + jnp.sum(y) + jnp.sum(z) + jnp.sum(o) + jnp.sum(
            k2.astype(jnp.float32))

    def sort_key_idx_then_gather(p):
        k = _morton_key(p)
        iota = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
        _, order = jax.lax.sort((k, iota), dimension=-1, num_keys=1)
        sorted_pts = jnp.take_along_axis(p, order[..., None], axis=1)
        return jnp.sum(sorted_pts) + jnp.sum(order)

    for name, fn in {
        "key_only": key_only,
        "argsort_only": argsort_only,
        "argsort_gather": argsort_gather,
        "multisort": multisort,
        "sort_then_gather": sort_key_idx_then_gather,
    }.items():
        f = jax.jit(fn)
        ms = time_fn(f, pts, iters=5, warmup=2) * 1e3
        print(f"{name:18s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
