"""Fused inverse flow (g) as one Pallas kernel, in channel-major layout.

The discrete model's inverse pass (`models/discrete.g_transform`) chains 6
blocks of [affine injector^-1 -> reverse permute -> additive coupling^-1 ->
inv1x1^-1 -> ActNorm^-1], each block driving three small condition MLPs over
[B, N*r, <=128]-shaped tensors — ~17 ms of XLA op/traffic overhead for
~13 GFLOP of actual work at 256 patches.

Layout: the flow state is only 3 channels wide. Point-major [m, 3] tensors
use 3 of 128 lanes for every elementwise op and pad each MLP's 3-channel
output projection N->128 on the MXU. Here everything runs CHANNEL-MAJOR
([3, m], [64, m], [cdim, m]): elementwise flow math fills all lanes, the
MLP out-projections become [3, 64] x [64, m] (M=3 streams, no N padding),
and the K<=2 coupling-input projections become VPU broadcast outer
products instead of K=1 MXU passes.

Same math as the XLA path (f32; deviations are matmul pass decomposition
and reduction order only).
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
    # == where(x > 0, x, s*x) for 0 < s < 1, one fewer VPU pass
    return jnp.maximum(x, _SLOPE * x)


def _dot(a, b):
    """f32 matmul as the exact 3-pass bf16 decomposition (Mosaic lowers a
    DEFAULT-precision f32 dot as a single bf16 pass — see
    encoder_pallas._f32_dot for the measured quality cost)."""
    def bf16_dot(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (bf16_dot(a_hi, b_hi) + bf16_dot(a_hi, b_lo)
            + bf16_dot(a_lo, b_hi))


def _flow_g_kernel(z_ref, *refs, num_blocks: int, splits):
    """refs: cs inputs (num_blocks, channel-major), weight refs, out ref.

    All activations are channel-major: state z [3, m], conditions
    [cdim, m], MLP hiddens [64, m]. Weights are stored transposed
    ([out, in]) so every matmul is W @ h.
    """
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
        """LinearA1D on [h_first | c] without the concat (channel-major).

        w0_h is [64, split]: the split<=2 coupling half enters as VPU
        broadcast outer products, never as a K<=2 MXU contraction.
        """
        h = _dot(w0_c, c)                                  # [64, m]
        if h_first is not None:
            for j in range(h_first.shape[0]):
                h = h + w0_h[:, j:j + 1] * h_first[j:j + 1, :]
        h = _lrelu(h)
        h = _lrelu(_dot(w1, h) + b1)
        return _dot(w2, h) + b2                            # [3, m]

    z = z_ref[0]                                           # [3, m]
    for b in range(num_blocks):                            # reversed outside
        c = cs_refs[b][0]                                  # [cdim, m]
        split = splits[b]

        # affine injector inverse: z = z * exp(scale) + bias
        s_w0c, s_w1, s_b1, s_w2, s_b2 = (take() for _ in range(5))
        b_w0c, b_w1, b_b1, b_w2, b_b2 = (take() for _ in range(5))
        scale = mlp(None, c, None, s_w0c, s_w1, s_b1, s_w2, s_b2)
        bias = mlp(None, c, None, b_w0c, b_w1, b_b1, b_w2, b_b2)
        z = z * jnp.exp(scale) + bias

        # reverse channel permute [2, 1, 0] — sublane row shuffle
        z = jnp.concatenate([z[2:3, :], z[1:2, :], z[0:1, :]], axis=0)

        # additive coupling inverse: h2 = h2 + bias_net(h1, c)
        c_w0c, c_w0h, c_w1, c_b1, c_w2, c_b2 = (take() for _ in range(6))
        h1 = z[:split, :]
        add = mlp(h1, c, c_w0h, c_w0c, c_w1, c_b1, c_w2, c_b2)  # [3-split, m]
        z = jnp.concatenate([h1, z[split:, :] + add], axis=0)

        # inv1x1 inverse as 9 broadcast MACs (z' = W^-1 @ z), ActNorm^-1
        w_inv = take()                                     # [3, 3] = W^-1
        rows = []
        for i in range(3):
            acc = w_inv[i:i + 1, 0:1] * z[0:1, :]
            for j in range(1, 3):
                acc = acc + w_inv[i:i + 1, j:j + 1] * z[j:j + 1, :]
            rows.append(acc)
        z = jnp.concatenate(rows, axis=0)
        an_bias, an_neg_exp = take(), take()               # [3, 1] each
        z = (z - an_bias) * an_neg_exp

    out_ref[0] = z


def _g_weights(flow_blocks):
    """Flow-block params (in INVERSE application order) -> flat transposed
    weights (every matmul weight stored as [out, in])."""
    out, splits = [], []
    for i in reversed(range(len(flow_blocks))):
        bp = flow_blocks[i]
        split = 1 if i % 2 == 0 else 2

        def a1d(net, h_dim):
            w0 = net["w0"]
            if h_dim:
                out.extend([jnp.transpose(w0[h_dim:]),   # w0_c [64, cdim]
                            w0[:h_dim].T])               # w0_h [64, split]
            else:
                out.append(jnp.transpose(w0))
            out.extend([jnp.transpose(net["w1"]), net["b1"][:, None],
                        jnp.transpose(net["w2"]), net["b2"][:, None]])

        a1d(bp["coupling2"]["scale_net"], 0)
        a1d(bp["coupling2"]["bias_net"], 0)
        # coupling MLP: emit in (w0_c, w0_h, w1, b1, w2, b2) kernel order
        net = bp["coupling1"]["bias_net"]
        out.append(jnp.transpose(net["w0"][split:]))      # w0_c
        out.append(net["w0"][:split].T)                   # w0_h [64, split]
        out.extend([jnp.transpose(net["w1"]), net["b1"][:, None],
                    jnp.transpose(net["w2"]), net["b2"][:, None]])
        w = bp["inv1x1"]["W"]
        out.append(jnp.linalg.inv(w))                     # rows: z' = W^-1 z
        out.append(bp["actnorm"]["bias"].reshape(-1, 1))
        out.append(jnp.exp(-bp["actnorm"]["logs"]).reshape(-1, 1))
        splits.append(split)
    return out, tuple(splits)


@functools.partial(jax.jit, static_argnums=(3,))
def flow_g_pallas(flow_blocks, z: jax.Array, cs_rep,
                  interpret: bool = False):
    """Inverse flow: z [B, m, 3], cs_rep list of [B, m, cdim] (already
    repeated x upratio, ordered for FORWARD blocks) -> x [B, m, 3]."""
    B0, m0, _ = z.shape
    B, m = B0, m0
    num_blocks = len(flow_blocks)
    weights, splits = _g_weights(flow_blocks)

    # Every op in the kernel is lane-parallel over m, so P patches can fuse
    # into one grid program (amortises per-program weight-DMA/setup; the
    # conditions stay the VMEM bound: ~2.5 MB per patch).
    for P in (4, 2, 1):
        if B % P == 0 and P * m * sum(
                c.shape[-1] for c in cs_rep) * 4 <= 12 * 1024 * 1024:
            break
    if P > 1:
        B, m = B // P, P * m
        z = z.reshape(B, m, 3)
        cs_rep = [c.reshape(B, m, c.shape[-1]) for c in cs_rep]

    # kernel applies blocks last-to-first, channel-major
    cs_in = [jnp.swapaxes(c, 1, 2) for c in reversed(cs_rep)]

    kernel = functools.partial(_flow_g_kernel, num_blocks=num_blocks,
                               splits=splits)
    cs_specs = [
        pl.BlockSpec((1, c.shape[1], m), lambda bb: (bb, 0, 0),
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
        in_specs=[pl.BlockSpec((1, 3, m), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM)] + cs_specs + w_specs,
        out_specs=pl.BlockSpec((1, 3, m), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, m), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(jnp.swapaxes(z.astype(jnp.float32), 1, 2), *cs_in, *weights)
    return jnp.swapaxes(out, 1, 2).reshape(B0, m0, 3)
