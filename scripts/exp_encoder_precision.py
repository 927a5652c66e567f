"""Sweep the fused encoder's MXU pass-count configs on the real TPU.

For each config: kernel time at 256 patches and max relative deviation vs
the exact config's output (same shape, so one compile per config).

Run from the repo root: python - <<'PY'
  exec(open("scripts/exp_encoder_precision.py").read())
PY
"""

from __future__ import annotations

import os

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/puflow_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.ops.knn import knn_indices
from puflow_tpu.ops.pallas.encoder_pallas import encoder_conditions_pallas
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"

CONFIGS = {
    "exact (2,3)x6": None,
    "gather1 late3": ((2, 3),) * 3 + ((1, 3),) * 3,
    "g1m1 late3": ((2, 3),) * 3 + ((1, 1),) * 3,
    "g1m1 late5": ((2, 3),) + ((1, 1),) * 5,
    "all bf16": ((1, 1),) * 6,
}


def main():
    M = 256
    params, state, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)

    pts = jax.random.normal(jax.random.PRNGKey(1), (M, 256, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    idx = knn_indices(pts, pts, 16)
    idx.block_until_ready()

    cs_ref = None
    for name, cfg in CONFIGS.items():
        t = time_fn(lambda: encoder_conditions_pallas(params, pts, idx,
                                                      False, cfg),
                    iters=20, warmup=2)
        cs = [np.asarray(c)
              for c in encoder_conditions_pallas(params, pts, idx, False,
                                                 cfg)]
        if cs_ref is None:
            cs_ref = cs
            rel = 0.0
        else:
            rel = max(
                float(np.abs(a - b).max() / np.abs(b).max())
                for a, b in zip(cs, cs_ref))
        print(f"{name:16s}  {t*1e3:7.2f} ms   max-rel-dev {rel:.2e}",
              flush=True)


main()
