"""Does B=64 amortise the union-merge FPS latency? (round 4b)

The exact union merge runs 8216 sequential FPS steps whose per-step cost
is partly latency-bound; if stepping [64, 34816] costs little more than
[32, 34816], batching doubles patches/iter at ~constant merge wall time.

Usage: python scripts/exp_bench_b64.py [B ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.inference.patch import upsample_cloud

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    bs = [int(a) for a in sys.argv[1:]] or [32, 64]
    N, R = 2048, 4
    npoint = N * R + 24
    params, state, sample_fn = load_checkpoint(CKPT, "discrete", fold=True)
    mp = (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state))
    for B in bs:
        pts = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3),
                                dtype=jnp.float32)
        pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

        def run(pc):
            return upsample_cloud(mp, pc, sample_fn, npoint, R, 256, 4.0)

        try:
            for _ in range(2):
                np.asarray(run(pts))
            iters = 8
            dt = float("inf")
            for _ in range(3):
                t0 = time.time()
                outs = [run(pts) for _ in range(iters)]
                np.asarray(outs[-1])
                dt = min(dt, (time.time() - t0) / iters)
            pps = B * 32 / dt
            print(f"B={B}: {dt*1e3:7.1f} ms/iter -> {pps:7.0f} patches/s",
                  flush=True)
        except Exception as e:
            print(f"B={B}: FAILED {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
