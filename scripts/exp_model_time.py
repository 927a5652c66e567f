"""Time the discrete model forward (256 patches of 256 pts, x4) on the
real chip — the ship/revert yardstick for encoder/interp precision work.

Run from the repo root: `python scripts/exp_model_time.py`.
"""

from __future__ import annotations

import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/puflow_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.models import discrete
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    params, state, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    pts = jax.random.normal(jax.random.PRNGKey(0), (256, 256, 3))
    pts = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1.0)
    run = jax.jit(lambda p, s, x: discrete.sample(p, s, x, 4))
    t = time_fn(lambda: run(params, state, pts), iters=10, warmup=2)
    print(f"model sample 256x256 x4: {t*1e3:.2f} ms "
          f"({256/t:.0f} patches/s model-only)", flush=True)


if __name__ == "__main__":
    main()
