"""Fused inverse flow (g) as one Pallas kernel.

The discrete model's inverse pass (`models/discrete.g_transform`) chains 6
blocks of [affine injector^-1 -> reverse permute -> additive coupling^-1 ->
inv1x1^-1 -> ActNorm^-1], each block driving three small condition MLPs over
[B, N*r, <=128]-shaped tensors — ~17 ms of XLA op/traffic overhead for
~13 GFLOP of actual work at 256 patches. Here the whole chain runs per
patch in VMEM; the per-block repeated conditions stream in as inputs (they
are the only large operand).

Exact same math as the XLA path (f32, identical op order per layer; the
only deviation is matmul pass decomposition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Raise the kernel's declared VMEM limit: with the default 16 MiB scoped
# limit, XLA may hoist a custom-call output that is exactly ~16 MiB (e.g.
# a [128, 256, 128] f32 condition tensor at 128 patches) onto the scoped
# VMEM stack and fail allocation by the padding overhead.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

_SLOPE = 0.01  # LinearA1D LeakyReLU


def _lrelu(x):
    return jnp.where(x > 0, x, _SLOPE * x)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


def _flow_g_kernel(z_ref, *refs, num_blocks: int, splits):
    """refs: cs inputs (num_blocks), weight refs, out ref (last)."""
    cs_refs = refs[:num_blocks]
    weight_refs = refs[num_blocks:-1]
    out_ref = refs[-1]
    wi = 0

    def take():
        nonlocal wi
        r = weight_refs[wi][...]
        wi += 1
        return r

    def mlp(h_first, c, w0_h, w0_c, w1, b1, w2, b2):
        """LinearA1D on [h_first | c] without the concat."""
        h = _dot(c, w0_c)
        if h_first is not None:
            h = h + _dot(h_first, w0_h)
        h = _lrelu(h)
        h = _lrelu(_dot(h, w1) + b1)
        return _dot(h, w2) + b2

    z = z_ref[0]                                           # [m, 3]
    for b in range(num_blocks):                            # reversed outside
        c = cs_refs[b][0]                                  # [m, cdim]
        split = splits[b]

        # affine injector inverse: z = z * exp(scale) + bias
        s_w0c, s_w1, s_b1, s_w2, s_b2 = (take() for _ in range(5))
        b_w0c, b_w1, b_b1, b_w2, b_b2 = (take() for _ in range(5))
        scale = mlp(None, c, None, s_w0c, s_w1, s_b1, s_w2, s_b2)
        bias = mlp(None, c, None, b_w0c, b_w1, b_b1, b_w2, b_b2)
        z = z * jnp.exp(scale) + bias

        # reverse channel permute [2, 1, 0]
        z = jnp.concatenate([z[:, 2:3], z[:, 1:2], z[:, 0:1]], axis=1)

        # additive coupling inverse: h2 = h2 + bias_net(h1, c)
        c_w0h, c_w0c, c_w1, c_b1, c_w2, c_b2 = (take() for _ in range(6))
        h1 = z[:, :split]
        add = mlp(h1, c, c_w0h, c_w0c, c_w1, c_b1, c_w2, c_b2)
        z = jnp.concatenate([h1, z[:, split:] + add], axis=1)

        # inv1x1 inverse (precomputed (W^-1)^T) and ActNorm inverse
        w_inv_t = take()                                   # [3, 3]
        z = _dot(z, w_inv_t)
        an_bias, an_neg_exp = take(), take()               # [1, 3] each
        z = (z - an_bias) * an_neg_exp

    out_ref[0] = z


def _g_weights(flow_blocks):
    """Flow-block params (in INVERSE application order) -> flat weights."""
    out, splits = [], []
    for i in reversed(range(len(flow_blocks))):
        bp = flow_blocks[i]
        split = 1 if i % 2 == 0 else 2

        def a1d(net, h_dim):
            w0 = net["w0"]
            if h_dim:
                out.extend([w0[:h_dim], w0[h_dim:]])
            else:
                out.append(w0)
            out.extend([net["w1"], net["b1"][None, :], net["w2"],
                        net["b2"][None, :]])

        a1d(bp["coupling2"]["scale_net"], 0)
        a1d(bp["coupling2"]["bias_net"], 0)
        a1d(bp["coupling1"]["bias_net"], split)
        w = bp["inv1x1"]["W"]
        out.append(jnp.transpose(jnp.linalg.inv(w)))
        out.append(bp["actnorm"]["bias"].reshape(1, -1))
        out.append(jnp.exp(-bp["actnorm"]["logs"]).reshape(1, -1))
        splits.append(split)
    return out, tuple(splits)


@functools.partial(jax.jit, static_argnums=(3,))
def flow_g_pallas(flow_blocks, z: jax.Array, cs_rep,
                  interpret: bool = False):
    """Inverse flow: z [B, m, 3], cs_rep list of [B, m, cdim] (already
    repeated x upratio, ordered for FORWARD blocks) -> x [B, m, 3]."""
    B, m, _ = z.shape
    num_blocks = len(flow_blocks)
    weights, splits = _g_weights(flow_blocks)
    cs_in = list(reversed(cs_rep))  # kernel applies blocks last-to-first

    kernel = functools.partial(_flow_g_kernel, num_blocks=num_blocks,
                               splits=splits)
    cs_specs = [
        pl.BlockSpec((1, m, c.shape[-1]), lambda bb: (bb, 0, 0),
                     memory_space=pltpu.VMEM)
        for c in cs_in
    ]
    w_specs = [
        pl.BlockSpec(w.shape, (lambda bb, nd=w.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, m, 3), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM)] + cs_specs + w_specs,
        out_specs=pl.BlockSpec((1, m, 3), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m, 3), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(z.astype(jnp.float32), *cs_in, *weights)
    return out
