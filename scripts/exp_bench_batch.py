"""Headline batch-size sweep: patches/s of the full x4 2048->8192 pipeline
at B in {32, 48, 64} clouds/iteration. B=32 was picked in round 2 when the
merge FPS ran one whole-batch kernel; the grouped Morton merge changed the
VMEM profile, so re-measure. Run from the repo root, ONE TPU job at a time.
"""

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

    for B in (32, 48, 64):
        pts = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3),
                                dtype=jnp.float32)
        pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

        def run(pc):
            return upsample_cloud(model_params, pc, sample_fn, npoint, R,
                                  256, 4.0)

        try:
            for _ in range(2):
                np.asarray(run(pts))
        except Exception as e:
            print(f"B={B}: FAILED ({type(e).__name__}: {e})", flush=True)
            continue
        iters = 15
        dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = [run(pts) for _ in range(iters)]
            np.asarray(outs[-1])
            dt = min(dt, (time.time() - t0) / iters)
        pps = B * (N // 256 * 4) / dt
        print(f"B={B}: {dt*1e3:7.2f} ms/iter  {pps:8.1f} patches/s",
              flush=True)


if __name__ == "__main__":
    main()
