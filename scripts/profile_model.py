"""Sub-stage timing of the discrete model forward on the real chip.

Development tool for the perf push; not part of the test suite.
Usage: python scripts/profile_model.py [n_patches]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.models import discrete
from puflow_tpu.models.discrete import (feat_extract, g_transform,
                                        interpolation_apply, log_prob)
from puflow_tpu.ops.knn import knn_indices
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k, R = 256, 4
    params, state, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (M, k, 3), dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    knn = jax.jit(lambda x: knn_indices(x, x, 16))
    idx = knn(pts)

    enc = jax.jit(lambda x, i: feat_extract(params, state, x, i,
                                            train=False)[0])
    cs = enc(pts, idx)

    fwd = jax.jit(lambda x, c: log_prob(params, x, c)[0])
    z = fwd(pts, cs)

    interp = jax.jit(lambda z_, x: interpolation_apply(
        params["interp"], state["interp"], z_, x, R, False)[0])
    fz = interp(z, pts)

    g = jax.jit(lambda fz_, c: g_transform(params, fz_, c, R, fast=True))
    g(fz, cs)

    full = jax.jit(lambda x: discrete.sample(params, state, x, R))
    full(pts)
    full16 = jax.jit(lambda x: discrete.sample(params, state, x, R,
                                               dtype=jnp.bfloat16,
                                               interp_dtype=None))
    full16(pts)
    full16i = jax.jit(lambda x: discrete.sample(params, state, x, R,
                                                dtype=jnp.bfloat16))
    full16i(pts)

    t = {}
    t["knn"] = time_fn(knn, pts, iters=20)
    t["encoder"] = time_fn(enc, pts, idx, iters=20)
    t["f"] = time_fn(fwd, pts, cs, iters=20)
    t["interp"] = time_fn(interp, z, pts, iters=20)
    t["g"] = time_fn(g, fz, cs, iters=20)
    t["full_f32"] = time_fn(full, pts, iters=20)
    t["full_bf16_interp_f32"] = time_fn(full16, pts, iters=20)
    t["full_bf16_all"] = time_fn(full16i, pts, iters=20)
    print(f"M={M} patches of {k} pts, x{R}")
    for name, sec in t.items():
        print(f"{name:22s}: {sec*1e3:8.2f} ms")
    print(f"sum stages            : "
          f"{sum(t[s] for s in ('knn', 'encoder', 'f', 'interp', 'g'))*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
