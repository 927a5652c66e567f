"""Where does the fused encoder kernel's time go? (round-3 follow-up)

Times encoder_conditions_pallas at M patches under k=16 (real graph) vs
k=8 (halved gather/dense rows) and precision variants. If time ~halves
with k, the [k*n, *] row pipeline (gather matmuls + dense stack)
dominates; if not, per-program overheads (onehot build, self matmuls,
DMA) do.
Usage: heredoc-exec from repo root (see check_fused_parity.py).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.ops.knn import knn_indices
from puflow_tpu.ops.pallas.encoder_pallas import (EXACT_PRECISION,
                                                  FAST_PRECISION,
                                                  encoder_conditions_pallas)
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    params, _, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (M, 256, 3), dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    ALL11 = ((1, 1),) * 6

    for name, k, prec in [
        ("fast k=16", 16, FAST_PRECISION),
        ("all11 k=16", 16, ALL11),
        ("exact k=16", 16, EXACT_PRECISION),
        ("fast k=8", 8, FAST_PRECISION),
        ("fast k=4", 4, FAST_PRECISION),
    ]:
        idx = knn_indices(pts, pts, k)

        def run(x, i, prec=prec):
            cs = encoder_conditions_pallas(params, x, i, False, prec)
            return sum(jnp.sum(c) for c in cs)

        jf = jax.jit(run)
        jf(pts, idx)
        sec = time_fn(jf, pts, idx, iters=20)
        print(f"{name:12s}: {sec*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
