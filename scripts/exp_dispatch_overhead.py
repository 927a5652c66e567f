"""Measure per-dispatch overhead of the remote-TPU tunnel.

bench.py queues 15 `upsample_cloud` dispatches then syncs once; if each
execute RPC carries a fixed host/tunnel cost X, the measured per-iteration
time is (device_time + X) — suspected cause of the bench-vs-profiler gap
(104 vs 96.5 ms on 2026-08-20). This probe times windows of N dispatches
of (a) a trivial kernel and (b) the full pipeline, for several N: a
per-iteration time that falls with N reveals fixed window cost; one that
stays flat reveals per-dispatch cost.

Usage: python scripts/exp_dispatch_overhead.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.inference.patch import upsample_cloud

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def window(fn, arg, iters):
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [fn(arg) for _ in range(iters)]
        np.asarray(outs[-1])
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    tiny = jax.jit(lambda x: jnp.sum(x * 2.0))
    x = jnp.ones((128,))
    np.asarray(tiny(x))
    for iters in (1, 5, 15, 45):
        t = window(tiny, x, iters)
        print(f"tiny    iters={iters:3d}: {t*1e3:8.2f} ms/iter", flush=True)

    params, state, sample_fn = load_checkpoint(CKPT, "discrete", fold=True)
    mp = (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state))
    B, N, R = 32, 2048, 4
    pts = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    def run(pc):
        return upsample_cloud(mp, pc, sample_fn, N * R + 24, R, 256, 4.0)

    np.asarray(run(pts))
    for iters in (5, 15, 30):
        t = window(run, pts, iters)
        print(f"pipeline iters={iters:3d}: {t*1e3:8.2f} ms/iter "
              f"-> {B*32/t:.0f} patches/s", flush=True)


if __name__ == "__main__":
    main()
