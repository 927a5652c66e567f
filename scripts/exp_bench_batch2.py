"""Interleaved B=32 vs B=48 headline confirmation: alternate timing windows
within one process so tunnel drift hits both equally. Run from repo root,
one TPU job at a time."""

from __future__ import annotations

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/puflow_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.inference.patch import upsample_cloud

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    params, state, sample_fn = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    model_params = (params, state)
    N, R = 2048, 4
    npoint = N * R + 24

    inputs, runs = {}, {}
    for B in (32, 48):
        pts = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3),
                                dtype=jnp.float32)
        inputs[B] = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        runs[B] = lambda pc: upsample_cloud(model_params, pc, sample_fn,
                                            npoint, R, 256, 4.0)
        for _ in range(2):
            np.asarray(runs[B](inputs[B]))

    best = {32: float("inf"), 48: float("inf")}
    iters = 15
    for rep in range(4):
        for B in (32, 48):
            t0 = time.time()
            outs = [runs[B](inputs[B]) for _ in range(iters)]
            np.asarray(outs[-1])
            dt = (time.time() - t0) / iters
            best[B] = min(best[B], dt)
            pps = B * 32 / dt
            print(f"rep{rep} B={B}: {dt*1e3:7.2f} ms  {pps:8.1f} p/s",
                  flush=True)
    for B in (32, 48):
        print(f"BEST B={B}: {B*32/best[B]:8.1f} patches/s", flush=True)


if __name__ == "__main__":
    main()
