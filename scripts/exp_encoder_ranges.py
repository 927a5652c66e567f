"""Encoder kernel body-size experiment: split the 6-block fused encoder
into chained kernels of `span` blocks each, handing the running feature
tensor through HBM between kernels.

Motivation: Mosaic's per-op cost degrades heavily once a kernel body grows
past a few dozen ops (measured in round 3: 34 -> 339 ns/dot/patch in a
controlled chain); the shipped encoder body is ~150 ops. If the shipped
kernel runs at a degraded op rate, smaller bodies should win even with
the extra HBM round-trips of x ([n, 128] f32 per patch per boundary).

Usage: python scripts/exp_encoder_ranges.py [M]
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
    FAST_PRECISION,
    _bf16_dot,
    _block_weights,
    _f32_dot,
    _leaky,
    _onehot_dot,
    _split_hi_lo,
    encoder_conditions_pallas,
)
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def _range_kernel(x_ref, idx_ref, *refs, n: int, k: int, growths, odims,
                  precision, emit_x: bool):
    """Blocks [0, len(odims)) of the encoder pyramid on an arbitrary input
    feature tensor; out refs = per-block conditions (+ final x if emit_x)."""
    num_blocks = len(odims)
    n_out = num_blocks + (1 if emit_x else 0)
    weight_refs = refs[:-n_out]
    out_refs = refs[-n_out:]

    idx_col = idx_ref[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n * k, n), 1)
    onehot = (cols == idx_col).astype(jnp.bfloat16)

    x = x_ref[0]
    wi = 0

    def take():
        nonlocal wi
        r = weight_refs[wi][...]
        wi += 1
        return r

    for b in range(num_blocks):
        gather_passes, mac_passes = precision[b]
        dt = jnp.float32
        n_layers = len(growths[b])
        w_self = take()
        w_nbr = take()
        gt = w_nbr.shape[1]

        p_self = _f32_dot(x, w_self)
        p_nbr = _onehot_dot(onehot, _f32_dot(x, w_nbr), passes=gather_passes)
        p = (p_nbr.reshape(k, n, gt) + p_self[None]).reshape(k * n, gt)

        offset = 0
        hc_hi = hc_lo = None

        def hc_dot(w, mac_passes=mac_passes, out_dtype=dt):
            if mac_passes == 1:
                return _bf16_dot(hc_hi, w.astype(jnp.bfloat16), out_dtype)
            w_hi, w_lo = _split_hi_lo(w)
            return (_bf16_dot(hc_hi, w_hi) + _bf16_dot(hc_hi, w_lo)
                    + _bf16_dot(hc_lo, w_hi))

        for j in range(n_layers):
            g = growths[b][j]
            h = p[:, offset:offset + g] + take().astype(dt)
            if j > 0:
                h = h + hc_dot(take())
            h = _leaky(h)
            if mac_passes == 1:
                h_hi = h.astype(jnp.bfloat16)
                h_lo = None
            else:
                h_hi, h_lo = _split_hi_lo(h)
            if hc_hi is None:
                hc_hi, hc_lo = h_hi, h_lo
            else:
                hc_hi = jnp.concatenate([hc_hi, h_hi], axis=1)
                if h_lo is not None:
                    hc_lo = jnp.concatenate([hc_lo, h_lo], axis=1)
            offset += g

        f = p[:, offset:] + take().astype(dt)
        f = f + hc_dot(take())
        f = jnp.max(f.reshape(k, n, odims[b]), axis=0)

        wm1, bm1, wm2 = take(), take(), take()
        m = jnp.maximum(_f32_dot(f, wm1) + bm1, 0.0)
        out_refs[b][0] = _f32_dot(m, wm2)
        x = f

    if emit_x:
        out_refs[-1][0] = x


def _split_weights_meta(params):
    """Per-block weight lists + meta, reusing the shipped packer."""
    flat, (growths, odims, cdims) = _block_weights(params)
    # re-split flat weights per block by walking the same order
    per_block = []
    i = 0
    for b in range(len(odims)):
        n_layers = len(growths[b])
        # w_self, w_nbr, then per layer biases(+w), out bias, conv_out w,
        # merge w1, b1, w2
        cnt = 2 + n_layers + (n_layers - 1) + 1 + 1 + 3
        per_block.append(flat[i:i + cnt])
        i += cnt
    assert i == len(flat)
    return per_block, growths, odims, cdims


def encoder_ranges(params, xyz, knn_idx, spans, precision=FAST_PRECISION):
    B, n, _ = xyz.shape
    k = knn_idx.shape[-1]
    per_block, growths, odims, cdims = _split_weights_meta(params)

    idx_sm = jnp.swapaxes(knn_idx.astype(jnp.int32), 1, 2).reshape(
        B, k * n, 1)
    idx_spec = pl.BlockSpec((1, k * n, 1), lambda bb: (bb, 0, 0),
                            memory_space=pltpu.VMEM)
    cs = []
    x = xyz.astype(jnp.float32)
    b0 = 0
    for span in spans:
        blocks = list(range(b0, b0 + span))
        emit_x = (b0 + span) < len(odims)
        weights = sum((per_block[b] for b in blocks), [])
        w_specs = [
            pl.BlockSpec(w.shape, (lambda bb, nd=w.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for w in weights
        ]
        out_specs = [
            pl.BlockSpec((1, n, cdims[b]), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM) for b in blocks
        ]
        out_shape = [jax.ShapeDtypeStruct((B, n, cdims[b]), jnp.float32)
                     for b in blocks]
        if emit_x:
            od = odims[blocks[-1]]
            out_specs.append(pl.BlockSpec((1, n, od), lambda bb: (bb, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((B, n, od), jnp.float32))
        kern = functools.partial(
            _range_kernel, n=n, k=k,
            growths=tuple(growths[b] for b in blocks),
            odims=tuple(odims[b] for b in blocks),
            precision=tuple(precision[b] for b in blocks), emit_x=emit_x)
        outs = pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n, x.shape[-1]), lambda bb: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                idx_spec,
            ] + w_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            compiler_params=_COMPILER_PARAMS,
        )(x, idx_sm, *weights)
        cs.extend(outs[:span])
        if emit_x:
            x = outs[-1]
        b0 += span
    return cs


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    params, _, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)

    pts = jax.random.normal(jax.random.PRNGKey(1), (M, 256, 3),
                            dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    idx = knn_indices(pts, pts, 16)

    base = jax.jit(lambda x, i: encoder_conditions_pallas(params, x, i))(
        pts, idx)
    # timing closures reduce to a scalar INSIDE jit: time_fn's sync
    # transfers the whole first leaf, which for the raw condition list is
    # 33 MB through the tunnel (~55 ms of pure transfer per window)
    ref = jax.jit(lambda x, i: sum(
        jnp.sum(c) for c in encoder_conditions_pallas(params, x, i)))
    ref(pts, idx)
    t0 = time_fn(ref, pts, idx, iters=20)
    print(f"V0 shipped (1 kernel)    : {t0*1e3:7.2f} ms", flush=True)

    for spans in [(3, 3), (2, 2, 2), (4, 2), (3, 2, 1), (5, 1)]:
        got = jax.jit(
            functools.partial(encoder_ranges, params, spans=spans))(pts, idx)
        d = max(float(jnp.max(jnp.abs(g - b))) for g, b in zip(got, base))
        fn = jax.jit(lambda x, i, spans=spans: sum(
            jnp.sum(c) for c in encoder_ranges(params, x, i, spans)))
        fn(pts, idx)
        t = time_fn(fn, pts, idx, iters=20)
        print(f"V{spans}: {t*1e3:7.2f} ms   max|d|={d:.2e}", flush=True)


if __name__ == "__main__":
    main()
