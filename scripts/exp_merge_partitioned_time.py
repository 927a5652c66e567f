"""Time the merge-FPS grouping variants at bench scale (round 3d).

Compares exact seeded FPS, strided grouping, and kd-partitioned grouping
(the quality fix) at the bench union shape [B, 32768] -> 6168 picks with
2048 seeds. The kd partition adds log2(G) per-segment argsorts — this
measures whether that overhead eats the grouped speedup.
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
from puflow_tpu.ops.fps import (farthest_point_sample_seeded,
                                farthest_point_sample_seeded_grouped,
                                farthest_point_sample_seeded_morton,
                                farthest_point_sample_seeded_partitioned)
from puflow_tpu.utils.timing import time_fn


def main():
    rng = np.random.default_rng(0)
    # bench union structure: P=32 patches x (256*4)=1024 candidates each
    B, P, L, S, n = 32, 32, 1024, 2048, 6168
    M = P * L
    cen = rng.normal(size=(B, P, 3)).astype(np.float32)
    cen /= np.linalg.norm(cen, axis=-1, keepdims=True)
    cand = cen[:, :, None, :] + 0.2 * rng.normal(
        size=(B, P, L, 3)).astype(np.float32)
    cand = cand.reshape(B, M, 3)
    seeds = rng.normal(size=(B, S, 3)).astype(np.float32)
    seeds /= np.linalg.norm(seeds, axis=-1, keepdims=True)
    cand, seeds, cen = jnp.asarray(cand), jnp.asarray(seeds), jnp.asarray(cen)

    variants = {
        "exact": lambda c, s: farthest_point_sample_seeded(c, s, n),
        "strided16": lambda c, s: farthest_point_sample_seeded_grouped(
            c, s, n, 16),
        "part16": lambda c, s: farthest_point_sample_seeded_partitioned(
            c, s, n, 16),
        "morton16": lambda c, s: farthest_point_sample_seeded_morton(
            c, s, n, 16),
        "morton8": lambda c, s: farthest_point_sample_seeded_morton(
            c, s, n, 8),
    }
    for name, fn in variants.items():
        f = jax.jit(lambda c, s, fn=fn: jnp.sum(fn(c, s)))
        ms = time_fn(f, cand, seeds, iters=5, warmup=2) * 1e3
        print(f"{name:10s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
