"""Measure single-chip merge/model overlap potential (VERDICT r4 item 8).

The hypothetical >12x-at-parity lever is cross-batch double-buffering: run
batch i's VPU-bound merge FPS while batch i+1's MXU-bound model executes.
This experiment measures whether a single v5e core can actually overlap the
two at all: dispatch the merge closure and the model closure concurrently
from two threads of ONE process (same client/device; the round-3 two-
process test already showed cross-process serialization) and compare
wall-clock against the serial sum.

overlap_ratio := concurrent_time / serial_time
  ~1.0  -> full serialization (no overlap lever on one chip)
  ~0.6  -> meaningful VPU/MXU co-execution (double-buffering pays)

Usage: python scripts/exp_overlap.py [B]
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.inference.patch import merge_patches

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N, R, k = 2048, 4, 256
    n_patch = int(N / k * 4.0)
    npoint = N * R + 24
    M = n_patch * k * R + N                       # union candidates

    params, state, sample_fn = load_checkpoint(CKPT, "discrete", fold=True)
    mp = (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state))

    key = jax.random.PRNGKey(0)
    flat = jax.random.normal(key, (B * n_patch, k, 3)) * 0.5
    union = jax.random.normal(jax.random.PRNGKey(1), (B, M, 3)) * 0.5

    model = jax.jit(lambda m, f: jnp.sum(sample_fn(m, f, R)))
    merge = jax.jit(lambda u: jnp.sum(merge_patches(u, npoint)))

    np.asarray(model(mp, flat))
    np.asarray(merge(union))

    iters = 10

    def run_model():
        outs = [model(mp, flat) for _ in range(iters)]
        np.asarray(outs[-1])

    def run_merge():
        outs = [merge(union) for _ in range(iters)]
        np.asarray(outs[-1])

    def timed(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    t_model = timed(run_model)
    t_merge = timed(run_merge)

    def run_both():
        th = threading.Thread(target=run_model)
        th.start()
        run_merge()
        th.join()

    t_both = timed(run_both)
    serial = t_model + t_merge
    print(f"model : {t_model/iters*1e3:8.2f} ms/iter")
    print(f"merge : {t_merge/iters*1e3:8.2f} ms/iter")
    print(f"serial sum      : {serial/iters*1e3:8.2f} ms/iter")
    print(f"concurrent      : {t_both/iters*1e3:8.2f} ms/iter")
    print(f"overlap_ratio   : {t_both/serial:.3f}  "
          f"(1.0 = fully serialized, <1 = co-execution)")


if __name__ == "__main__":
    main()
