"""Transposed (channel-major) encoder kernel: correctness + timing vs the
shipped row-major kernel, on the real checkpoint at bench scale.

Usage: python scripts/exp_encoder_cm.py [M]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.ops.pallas.encoder_pallas import (
    EXACT_PRECISION,
    FAST_PRECISION,
    encoder_conditions_pallas,
    encoder_conditions_pallas_cm,
)
from puflow_tpu.ops.pallas.knn_pallas import knn_self_pallas
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n, k = 256, 16
    params, state, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (M, n, 3), dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    idx = knn_self_pallas(pts, k)

    # --- correctness: EXACT precision, cm vs row-major -------------------
    cs_rm = encoder_conditions_pallas(params, pts[:4], idx[:4],
                                      precision=EXACT_PRECISION)
    cs_cm = encoder_conditions_pallas_cm(params, pts[:4], idx[:4],
                                         precision=EXACT_PRECISION)
    for i, (a, b) in enumerate(zip(cs_rm, cs_cm)):
        d = float(jnp.max(jnp.abs(a - jnp.swapaxes(b, 1, 2))))
        s = float(jnp.max(jnp.abs(a)))
        print(f"block {i}: max|rm - cm^T| = {d:.3e}  (scale {s:.2e})",
              flush=True)

    # fast-precision delta (both kernels quantise differently; informational)
    cs_rm_f = encoder_conditions_pallas(params, pts[:4], idx[:4],
                                        precision=FAST_PRECISION)
    cs_cm_f = encoder_conditions_pallas_cm(params, pts[:4], idx[:4],
                                           precision=FAST_PRECISION)
    d = max(float(jnp.max(jnp.abs(a - jnp.swapaxes(b, 1, 2))))
            for a, b in zip(cs_rm_f, cs_cm_f))
    print(f"fast-precision rm-vs-cm max delta: {d:.3e}", flush=True)

    # --- pack layout check ----------------------------------------------
    cs_p = encoder_conditions_pallas_cm(params, pts[:8], idx[:8], 4,
                                        False, EXACT_PRECISION)
    want = jnp.swapaxes(cs_rm[0], 1, 2)                    # [4, c, n]
    got = cs_p[0][0]                                       # [c, 4*n]
    dp = float(jnp.max(jnp.abs(got - jnp.concatenate(
        [want[i] for i in range(4)], axis=1))))
    print(f"pack=4 layout max delta: {dp:.3e}", flush=True)

    # --- timing (scalar-reduced closures) --------------------------------
    def t_rm(x, i):
        return sum(jnp.sum(c) for c in
                   encoder_conditions_pallas(params, x, i))

    def t_cm(x, i):
        return sum(jnp.sum(c) for c in
                   encoder_conditions_pallas_cm(params, x, i))

    def t_cm_exact(x, i):
        return sum(jnp.sum(c) for c in
                   encoder_conditions_pallas_cm(params, x, i, 1, False,
                                                EXACT_PRECISION))

    for name, fn in (("row-major (shipped fast)", t_rm),
                     ("cm transposed (fast)", t_cm),
                     ("cm transposed (exact)", t_cm_exact)):
        jf = jax.jit(fn)
        jf(pts, idx)
        print(f"{name:26s}: {time_fn(jf, pts, idx, iters=20)*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
