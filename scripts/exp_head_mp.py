"""Interp weight head: multi-patch-per-program experiment.

After the nei-reuse change the head's only one-hot matmul is the raw
neighbour gather (nei). Hypothesis: splitting that gather into its own
small kernel and running the MLP/EdgeConv body at q patches per program
amortises Mosaic's per-op fixed cost (the body is ~40 skinny ops on only
2048 rows) without growing any gather quadratically.

Variants (all must match the shipped kernel's logits):
  V0  shipped interp_logits_pallas (one-hot in-kernel, q=1)
  Vq  nei kernel + q-patch body kernel, q in {1, 2, 4, 8}

Usage: python scripts/exp_head_mp.py [M]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.ops.knn import knn_indices
from puflow_tpu.ops.pallas.encoder_pallas import (
    _COMPILER_PARAMS,
    _bf16_dot,
    _f32_dot,
    _feu_weights,
    _leaky,
    _leaky01,
    _mlp3_weights,
    _onehot_dot,
    interp_logits_pallas,
)
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def _nei_kernel(xyz_ref, idx_ref, out_ref, *, n: int, k: int):
    idx_col = idx_ref[0]                                   # [k*n, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n * k, n), 1)
    onehot = (cols == idx_col).astype(jnp.bfloat16)
    out_ref[0] = _onehot_dot(onehot, xyz_ref[0])           # [k*n, 3]


def _head_body_kernel(xyz_ref, nei_ref, *refs, n: int, k: int, q: int,
                      growths, fast: bool):
    """q patches per program; rows [q*k*n, .] (patch, slot, point)."""
    dt = jnp.bfloat16 if fast else jnp.float32

    def dot(a, b, out_dtype=None):
        if fast:
            return _bf16_dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                             out_dtype or dt)
        return _f32_dot(a, b)

    weight_refs = refs[:-1]
    out_ref = refs[-1]
    wi = 0

    def take():
        nonlocal wi
        w = weight_refs[wi][...]
        wi += 1
        return w

    x = xyz_ref[...]                                       # [q, n, 3]
    nei = nei_ref[...].reshape(q * k * n, 3)
    pt = jnp.broadcast_to(x[:, None], (q, k, n, 3)).reshape(q * k * n, 3)
    vec = pt - nei
    dist = jnp.sqrt(jnp.sum(vec * vec, axis=1, keepdims=True))
    f10 = jnp.concatenate([pt, nei, vec, dist], axis=1)    # [qkn, 10]

    h = _leaky01(dot(f10, take()) + take().astype(dt))
    h = _leaky01(dot(h, take()) + take().astype(dt))
    de_out = dot(h, take()) + take().astype(dt)

    w_self, w_nbr = take(), take()
    p_self = dot(x.reshape(q * n, 3), w_self)              # [q*n, Gt]
    p_nbr = dot(nei, w_nbr)                                # [qkn, Gt]
    gt = p_nbr.shape[1]
    p = (p_nbr.reshape(q, k, n, gt)
         + p_self.reshape(q, 1, n, gt)).reshape(q * k * n, gt)
    offset = 0
    h_cat = None
    for j in range(len(growths)):
        g = growths[j]
        hh = p[:, offset:offset + g] + take().astype(dt)
        if j > 0:
            hh = hh + dot(h_cat, take())
        hh = _leaky(hh)
        h_cat = hh if h_cat is None else jnp.concatenate([h_cat, hh], axis=1)
        offset += g
    feu = p[:, offset:] + take().astype(dt)
    feu = feu + dot(h_cat, take())

    ctx = jnp.concatenate([de_out, feu], axis=1)
    h = _leaky01(dot(ctx, take()) + take().astype(dt))
    h = _leaky01(dot(h, take()) + take().astype(dt))
    r_max = weight_refs[-2].shape[1]
    out = dot(h, take(), jnp.float32) + take().astype(jnp.float32)
    out_ref[...] = out.reshape(q, k * n, r_max)


def interp_logits_mp(interp_params, xyz, knn_idx, q: int, fast: bool = True):
    B, n, _ = xyz.shape
    k = knn_idx.shape[-1]
    kc = interp_params["knn_context"]
    weights = _mlp3_weights(kc["distance_encoder"])
    feu_w, growths, _ = _feu_weights(kc["feat_conv"])
    weights += feu_w
    weights += _mlp3_weights(interp_params["weight_unit"])
    r_max = interp_params["weight_unit"]["lin2"]["w"].shape[1]

    idx_sm = jnp.swapaxes(knn_idx.astype(jnp.int32), 1, 2).reshape(
        B, k * n, 1)
    nei = pl.pallas_call(
        functools.partial(_nei_kernel, n=n, k=k),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * n, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * n, 3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, k * n, 3), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(xyz.astype(jnp.float32), idx_sm)

    w_specs = [
        pl.BlockSpec(w.shape, (lambda bb, nd=w.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        functools.partial(_head_body_kernel, n=n, k=k, q=q, growths=growths,
                          fast=fast),
        grid=(B // q,),
        in_specs=[
            pl.BlockSpec((q, n, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, k * n, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((q, k * n, r_max), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, k * n, r_max), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(xyz.astype(jnp.float32), nei, *weights)
    return jnp.swapaxes(out.reshape(B, k, n, r_max), 1, 2)


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    params, _, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    ip = params["interp"]

    pts = jax.random.normal(jax.random.PRNGKey(1), (M, 256, 3),
                            dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    idx = knn_indices(pts, pts, 16)[..., :8]

    base = jax.jit(lambda x, i: interp_logits_pallas(ip, x, i))(pts, idx)
    # timing closures reduce to a scalar INSIDE jit (time_fn's sync
    # transfers the whole first leaf — 268 MB of logits otherwise)
    ref = jax.jit(lambda x, i: jnp.sum(interp_logits_pallas(ip, x, i)))
    ref(pts, idx)
    t0 = time_fn(ref, pts, idx, iters=20)
    print(f"V0 shipped : {t0*1e3:7.2f} ms", flush=True)

    for q in (1, 2, 4):
        try:
            got = jax.jit(functools.partial(interp_logits_mp, ip,
                                            q=q))(pts, idx)
            d = float(jnp.max(jnp.abs(got - base)))
            fn = jax.jit(lambda x, i, q=q: jnp.sum(
                interp_logits_mp(ip, x, i, q)))
            fn(pts, idx)
            t = time_fn(fn, pts, idx, iters=20)
            print(f"V{q} split  : {t*1e3:7.2f} ms   max|d|={d:.2e}",
                  flush=True)
        except Exception as e:
            print(f"V{q} split  : FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
