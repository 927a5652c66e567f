"""Fused inverse flow (g) as one Pallas kernel, channel-major + slot-major.

The discrete model's inverse pass (`models/discrete.g_transform`) chains 6
blocks of [affine injector^-1 -> reverse permute -> additive coupling^-1 ->
inv1x1^-1 -> ActNorm^-1], each block driving three small condition MLPs
over [B, N*r, <=128]-shaped tensors.

Layout choices (all exact, no approximation):

* CHANNEL-MAJOR: the flow state is 3 channels wide; [3, m] / [64, m] /
  [cdim, m] tensors fill all 128 lanes for elementwise work, MLP
  out-projections become [3, 64] x [64, m] (no N->128 padding), and K<=2
  coupling-input projections are VPU broadcast outer products.
* SLOT-MAJOR rows: the m = N*r rows are ordered as r whole copies of the
  N points (slot-major) instead of r consecutive samples per point. Every
  kernel op is row-independent, so the ordering is free — and it turns
  "repeat the conditions x r" into `pltpu.repeat` (lane tiling) INSIDE the
  kernel. Conditions stream in un-repeated ([cdim, N], 4x less HBM and
  VMEM at r=4), and the injector MLPs — whose input is ONLY the condition
  — run entirely on the N unique columns before their [3, N] outputs are
  tiled, cutting ~2/3 of the kernel's matmul work at r=4.

f32 matmuls use an FLOW_PASSES-pass bf16 decomposition (Mosaic lowers a
DEFAULT-precision f32 dot as a single bf16 pass — see
encoder_pallas._f32_dot); the shipped default is the 2-pass form (full
activation mantissa against bf16-rounded weights), golden-CD gated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Raise the kernel's declared VMEM limit: with the default 16 MiB scoped
# limit, XLA may hoist a custom-call output that is exactly ~16 MiB onto
# the scoped VMEM stack and fail allocation by the padding overhead.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

_SLOPE = 0.01  # LinearA1D LeakyReLU


def _lrelu(x):
    # == where(x > 0, x, s*x) for 0 < s < 1, one fewer VPU pass
    return jnp.maximum(x, _SLOPE * x)


# Pass count for the condition-MLP matmuls (1 = plain bf16, 2 = keep the
# full activation mantissa against bf16 weights, 3 = exact ~6e-6). Read
# at trace time by _dot. Default 2: measured round 3 on the real chip,
# 3->2 passes cuts the model forward 38.6 -> 35.2 ms (the flow kernel's
# ~12 ms is mostly these MLPs) with golden pipeline CD 4.82e-4 — inside
# the exact path's own 4.55-4.95e-4 run-to-run band; 1-pass saves
# nothing further (35.1 ms) and moves CD to 6.7e-4. The flow transforms
# coordinates DIRECTLY (injector scales feed exp()), so any change here
# must re-run the golden gate (scripts/check_fused_parity.py).
# Exactness-sensitive unit tests pin 3.
FLOW_PASSES = 2


def _dot(a, b, interp: bool = False, passes: int | None = None):
    """f32 matmul as a multi-pass bf16 decomposition (default
    FLOW_PASSES)."""
    def bf16_dot(x, y):
        if interp:
            # interpret mode runs on XLA:CPU, whose thunk runtime can't
            # execute a standalone bf16 x bf16 -> f32 dot (it only works
            # when fused); computing on f32 upcasts of the bf16-quantised
            # inputs is bit-identical (bf16 products are exact in f32,
            # accumulation is f32 either way)
            return jax.lax.dot_general(
                x.astype(jnp.float32), y.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    if passes is None:
        passes = FLOW_PASSES
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    if passes == 1:
        return bf16_dot(a_hi, b_hi)
    if passes == 2:
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return bf16_dot(a_hi, b_hi) + bf16_dot(a_hi, b_lo)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (bf16_dot(a_hi, b_hi) + bf16_dot(a_hi, b_lo)
            + bf16_dot(a_lo, b_hi))


def _flow_g_body(z, cs, take, *, num_blocks: int, splits, r: int,
                 interp: bool = False):
    """Inverse-flow chain on VMEM values: z slot-major [3, m] (m = n*r),
    cs un-repeated channel-major [cdim, n] per block (inverse order).
    Shared by the plain g kernel and the blend-fused variant."""
    _dot = functools.partial(globals()["_dot"], interp=interp)

    def rep(x):
        # slot-major repeat of [C, n] -> [C, m]: whole-array lane tiling
        return pltpu.repeat(x, r, 1) if r > 1 else x

    def mlp_cond(c, w0, w1, b1, w2, b2):
        """Condition-only MLP evaluated on the n UNIQUE columns; the
        caller tiles the [3, n] result (injector scale/bias nets)."""
        h = _lrelu(_dot(w0, c))
        h = _lrelu(_dot(w1, h) + b1)
        return _dot(w2, h) + b2

    for b in range(num_blocks):                            # reversed outside
        c = cs[b]                                          # [cdim, n]
        split = splits[b]

        # affine injector inverse: z = z * exp(scale) + bias — both nets
        # depend only on c, so they run at 1/r cost and tile after
        s_w0, s_w1, s_b1, s_w2, s_b2 = (take() for _ in range(5))
        b_w0, b_w1, b_b1, b_w2, b_b2 = (take() for _ in range(5))
        scale = rep(mlp_cond(c, s_w0, s_w1, s_b1, s_w2, s_b2))
        bias = rep(mlp_cond(c, b_w0, b_w1, b_b1, b_w2, b_b2))
        z = z * jnp.exp(scale) + bias

        # reverse channel permute [2, 1, 0] — sublane row shuffle
        z = jnp.concatenate([z[2:3, :], z[1:2, :], z[0:1, :]], axis=0)

        # additive coupling inverse: h2 = h2 + bias_net(h1, c); only the
        # c-projection is repeat-invariant, the h1 half is per-row
        c_w0c, c_w0h, c_w1, c_b1, c_w2, c_b2 = (take() for _ in range(6))
        h1 = z[:split, :]
        h = rep(_dot(c_w0c, c))                            # [64, m]
        for j in range(split):
            h = h + c_w0h[:, j:j + 1] * h1[j:j + 1, :]
        h = _lrelu(h)
        h = _lrelu(_dot(c_w1, h) + c_b1)
        add = _dot(c_w2, h) + c_b2                         # [3-split, m]
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

    return z


def _bf16_mm(a_bf16, b_bf16):
    """Single-pass bf16 matmul with f32 accumulate (explicit DEFAULT
    precision so the global 'highest' policy cannot reach it — Mosaic
    rejects multi-pass forms of bf16 operands)."""
    return jax.lax.dot_general(a_bf16, b_bf16, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


def _flow_g_kernel(z_ref, *refs, num_blocks: int, splits, r: int,
                   interp: bool = False):
    """refs: un-repeated cs inputs (num_blocks, channel-major [cdim, n]),
    weight refs, out ref. State z is slot-major [3, m], m = n * r.
    `interp` routes the bf16 dots through an XLA:CPU-executable form."""
    cs_refs = refs[:num_blocks]
    weight_refs = refs[num_blocks:-1]
    out_ref = refs[-1]
    wi = 0

    def take():
        nonlocal wi
        w = weight_refs[wi][...]
        wi += 1
        return w

    out_ref[0] = _flow_g_body(z_ref[0], [c[0] for c in cs_refs], take,
                              num_blocks=num_blocks, splits=splits, r=r,
                              interp=interp)


def _flow_g_blend_kernel(z_ref, idxw_ref, ws_ref, *refs, num_blocks: int,
                         splits, r: int, k_interp: int, n0: int, P: int,
                         interp: bool = False):
    """Latent interpolation + inverse flow in one kernel.

    Prologue: per ORIGINAL patch, gather each point's k_interp neighbour
    latents channel-major (one-hot built lane-wise from the WIDE idx
    layout — [W, 128] avoids the pathological 4-byte-row DMA of a
    [k*n, 1] block) and blend them with the softmaxed weights `ws`
    ([r, k_interp*n0], from the encoder kernel) into the slot-major fz
    state the shared inverse-flow body consumes. Replaces the separate
    interp_latents kernel launch entirely (reference
    `InterpolationModule.forward` + `g`, `interpflow.py:173-186,315-321`).

    z_ref: [1, 3, P*n0] P-packed latents (channel-major, the f kernel's
    native block layout — patch i at lanes i*n0, a FREE aligned slice);
    idxw_ref: [P, W, 128] wide K=8 indices (row ks*n0+p at
    (w, l) = divmod(ks*n0+p, 128)); ws_ref: [P, r, k_interp*n0].
    """
    cs_refs = refs[:num_blocks]
    weight_refs = refs[num_blocks:-1]
    out_ref = refs[-1]
    W = k_interp * n0 // 128
    wi = 0

    def take():
        nonlocal wi
        w = weight_refs[wi][...]
        wi += 1
        return w

    # --- per-patch neighbour-latent gather, channel-major ---------------
    z_packed = z_ref[0]                                    # [3, P*n0]
    zn_all = []
    for pi in range(P):
        z_p = z_packed[:, pi * n0:(pi + 1) * n0]           # [3, n0]
        zh = z_p.astype(jnp.bfloat16)
        zl = (z_p - zh.astype(jnp.float32)).astype(jnp.bfloat16)
        idxw = idxw_ref[pi]                                # [W, 128]
        # one-hot TRANSPOSED, built in wide tiles: oh3[w][q, l] = 1 iff
        # point q is the neighbour at flat row w*128 + l
        qio = jax.lax.broadcasted_iota(jnp.int32, (W, n0, 128), 1)
        oh3 = (qio == idxw[:, None, :]).astype(jnp.bfloat16)
        pieces = []
        for w in range(W):
            oh = oh3[w]                                    # [n0, 128]
            d = _bf16_mm(zh, oh) + _bf16_mm(zl, oh)        # [3, 128] f32
            pieces.append(d)
        zn_all.append(jnp.concatenate(pieces, axis=1))     # [3, k*n0]

    # --- blend into slot-major fz over the PACKED lane axis -------------
    # column layout expected by the body: s*(P*n0) + pi*n0 + p
    slots = []
    for s in range(r):
        for pi in range(P):
            zn = zn_all[pi]
            acc = None
            for ks in range(k_interp):
                w_row = ws_ref[pi, s:s + 1, ks * n0:(ks + 1) * n0]  # [1,n0]
                term = zn[:, ks * n0:(ks + 1) * n0] * w_row
                acc = term if acc is None else acc + term
            slots.append(acc)                              # [3, n0]
    fz = jnp.concatenate(slots, axis=1)                    # [3, P*n0*r]

    out_ref[0] = _flow_g_body(fz, [c[0] for c in cs_refs], take,
                              num_blocks=num_blocks, splits=splits, r=r,
                              interp=interp)


def _g_weights(flow_blocks):
    """Flow-block params (in INVERSE application order) -> flat transposed
    weights (every matmul weight stored as [out, in])."""
    out, splits = [], []
    for i in reversed(range(len(flow_blocks))):
        bp = flow_blocks[i]
        split = 1 if i % 2 == 0 else 2

        def a1d_cond(net):
            out.extend([jnp.transpose(net["w0"]),
                        jnp.transpose(net["w1"]), net["b1"][:, None],
                        jnp.transpose(net["w2"]), net["b2"][:, None]])

        a1d_cond(bp["coupling2"]["scale_net"])
        a1d_cond(bp["coupling2"]["bias_net"])
        # coupling MLP: (w0_c, w0_h, w1, b1, w2, b2) in kernel order
        net = bp["coupling1"]["bias_net"]
        out.append(jnp.transpose(net["w0"][split:]))      # w0_c [64, cdim]
        out.append(net["w0"][:split].T)                   # w0_h [64, split]
        out.extend([jnp.transpose(net["w1"]), net["b1"][:, None],
                    jnp.transpose(net["w2"]), net["b2"][:, None]])
        w = bp["inv1x1"]["W"]
        out.append(jnp.linalg.inv(w))                     # rows: z' = W^-1 z
        out.append(bp["actnorm"]["bias"].reshape(-1, 1))
        out.append(jnp.exp(-bp["actnorm"]["logs"]).reshape(-1, 1))
        splits.append(split)
    return out, tuple(splits)


def _flow_f_kernel(x_ref, *refs, num_blocks: int, splits,
                   interp: bool = False):
    """Forward flow f (points -> latents), channel-major [3, m]. The
    inference path discards the log-density, so no logdet terms are
    computed (reference `f`, `modules/discrete/interpflow.py:302-313` —
    the z output only). Block order is FORWARD: ActNorm -> inv1x1 ->
    additive coupling -> reverse permute -> affine injector forward
    ((x - bias) * exp(-scale)).

    Always 3-pass (exact) matmuls: unlike g (unit-scale latents), the
    forward intermediates reach +-130 through the injector exp() stages,
    and the 2-pass form measured 7% error on z (vs 3e-4 abs at 3-pass)."""
    _dot = functools.partial(globals()["_dot"], interp=interp, passes=3)
    cs_refs = refs[:num_blocks]
    weight_refs = refs[num_blocks:-1]
    out_ref = refs[-1]
    wi = 0

    def take():
        nonlocal wi
        w = weight_refs[wi][...]
        wi += 1
        return w

    def mlp_cond(c, w0, w1, b1, w2, b2):
        h = _lrelu(_dot(w0, c))
        h = _lrelu(_dot(w1, h) + b1)
        return _dot(w2, h) + b2

    x = x_ref[0]                                           # [3, m]
    for b in range(num_blocks):
        c = cs_refs[b][0]                                  # [cdim, m]
        split = splits[b]

        # ActNorm forward: x * exp(logs) + bias
        an_exp, an_bias = take(), take()                   # [3, 1] each
        x = x * an_exp + an_bias

        # inv1x1 forward: x' = W @ x as 9 broadcast MACs
        w = take()                                         # [3, 3]
        rows = []
        for i in range(3):
            acc = w[i:i + 1, 0:1] * x[0:1, :]
            for j in range(1, 3):
                acc = acc + w[i:i + 1, j:j + 1] * x[j:j + 1, :]
            rows.append(acc)
        x = jnp.concatenate(rows, axis=0)

        # additive coupling forward: h2 = h2 - bias_net(h1, c)
        c_w0c, c_w0h, c_w1, c_b1, c_w2, c_b2 = (take() for _ in range(6))
        h1 = x[:split, :]
        h = _dot(c_w0c, c)                                 # [64, m]
        for j in range(split):
            h = h + c_w0h[:, j:j + 1] * h1[j:j + 1, :]
        h = _lrelu(h)
        h = _lrelu(_dot(c_w1, h) + c_b1)
        sub = _dot(c_w2, h) + c_b2                         # [3-split, m]
        x = jnp.concatenate([h1, x[split:, :] - sub], axis=0)

        # reverse channel permute [2, 1, 0]
        x = jnp.concatenate([x[2:3, :], x[1:2, :], x[0:1, :]], axis=0)

        # affine injector forward: (x - bias) * exp(-scale)
        s_w0, s_w1, s_b1, s_w2, s_b2 = (take() for _ in range(5))
        b_w0, b_w1, b_b1, b_w2, b_b2 = (take() for _ in range(5))
        scale = mlp_cond(c, s_w0, s_w1, s_b1, s_w2, s_b2)
        bias = mlp_cond(c, b_w0, b_w1, b_b1, b_w2, b_b2)
        x = (x - bias) * jnp.exp(-scale)

    out_ref[0] = x


def _f_weights(flow_blocks):
    """Flow-block params (FORWARD order) -> flat transposed weights."""
    out, splits = [], []
    for i in range(len(flow_blocks)):
        bp = flow_blocks[i]
        split = 1 if i % 2 == 0 else 2
        out.append(jnp.exp(bp["actnorm"]["logs"]).reshape(-1, 1))
        out.append(bp["actnorm"]["bias"].reshape(-1, 1))
        out.append(bp["inv1x1"]["W"])                      # rows: x' = W x
        net = bp["coupling1"]["bias_net"]
        out.append(jnp.transpose(net["w0"][split:]))       # w0_c [64, cdim]
        out.append(net["w0"][:split].T)                    # w0_h [64, split]
        out.extend([jnp.transpose(net["w1"]), net["b1"][:, None],
                    jnp.transpose(net["w2"]), net["b2"][:, None]])

        def a1d_cond(net):
            out.extend([jnp.transpose(net["w0"]),
                        jnp.transpose(net["w1"]), net["b1"][:, None],
                        jnp.transpose(net["w2"]), net["b2"][:, None]])

        a1d_cond(bp["coupling2"]["scale_net"])
        a1d_cond(bp["coupling2"]["bias_net"])
        splits.append(split)
    return out, tuple(splits)


def _pack_patches(B0: int, N0: int, cdim_total: int) -> int:
    """Patches fused per grid program (shared by f / g / g+blend so the
    packed lane layout can be handed between them without a relayout);
    the un-repeated conditions are the VMEM bound (~0.6 MB per patch)."""
    for P in (8, 4, 2, 1):
        if B0 % P == 0 and P * N0 * cdim_total * 4 <= 8 * 1024 * 1024:
            return P
    return 1


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def flow_f_pallas(flow_blocks, x: jax.Array, cs,
                  interpret: bool = False, emit_cm: bool = False,
                  cs_cm: bool = False):
    """Forward flow: points [B, N, C] + per-block conditions
    [B, N, cdim] -> latents [B, N, C], as one Pallas kernel (inference
    only — no logdet, no VJP). ``emit_cm=True`` returns the latents
    CHANNEL-major in the kernel's P-packed lane layout
    ([B/P, C, P*N]; patch i at lanes i*N..) — the exact block layout
    `flow_g_blend_pallas` consumes, so the handoff is relayout-free.
    ``cs_cm=True`` takes the conditions already P-packed channel-major
    ([B/P, cdim, P*N], straight from
    ``encoder_conditions_pallas_cm(pack=P)``) — no relayout at all."""
    B0, N0, C = x.shape
    num_blocks = len(flow_blocks)
    weights, splits = _f_weights(flow_blocks)

    # P patches fuse into one grid program; conditions bound VMEM
    B, n = B0, N0
    if cs_cm:
        B, n = cs[0].shape[0], cs[0].shape[2]
        P = n // N0
        assert B * P == B0, (cs[0].shape, x.shape)
        x = x.reshape(B, n, C)
        cs_in = list(cs)                                   # [B, cdim, n]
    else:
        cdim_total = sum(c.shape[-1] for c in cs)
        P = _pack_patches(B0, N0, cdim_total)
        if P > 1:
            B, n = B0 // P, P * N0
            x = x.reshape(B, n, C)
            cs = [c.reshape(B, n, c.shape[-1]) for c in cs]
        cs_in = [jnp.swapaxes(c, 1, 2) for c in cs]        # [B, cdim, n]

    x_cm = jnp.swapaxes(x, 1, 2)                           # [B, C, n]

    kernel = functools.partial(_flow_f_kernel, num_blocks=num_blocks,
                               splits=splits, interp=interpret)
    cs_specs = [
        pl.BlockSpec((1, c.shape[1], n), lambda bb: (bb, 0, 0),
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
        in_specs=[pl.BlockSpec((1, C, n), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM)] + cs_specs + w_specs,
        out_specs=pl.BlockSpec((1, C, n), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, n), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x_cm.astype(jnp.float32), *cs_in, *weights)
    if emit_cm:
        return out                  # [B0/P, C, P*N0], f's packed layout
    return jnp.swapaxes(out, 1, 2).reshape(B0, N0, C)


@functools.partial(jax.jit, static_argnums=(3,))
def flow_g_pallas(flow_blocks, fz: jax.Array, cs,
                  interpret: bool = False):
    """Inverse flow from interpolated latents.

    fz: [B, N, C, r] latents; cs: list of UN-repeated [B, N, cdim]
    conditions (forward block order). Returns [B, N*r, C] in the
    reference's point-major row order (r consecutive samples per point).
    """
    B0, N0, C, r = fz.shape
    num_blocks = len(flow_blocks)
    weights, splits = _g_weights(flow_blocks)

    # P patches fuse into one grid program (all ops are row/lane-parallel)
    B, n = B0, N0
    cdim_total = sum(c.shape[-1] for c in cs)
    P = _pack_patches(B0, N0, cdim_total)
    if P > 1:
        B, n = B0 // P, P * N0
        fz = fz.reshape(B, n, C, r)
        cs = [c.reshape(B, n, c.shape[-1]) for c in cs]
    m = n * r

    # slot-major rows: [B, n, C, r] -> [B, r, n, C] -> channel-major [B,C,m]
    z_sm = jnp.transpose(fz, (0, 3, 1, 2)).reshape(B, m, C)
    z_cm = jnp.swapaxes(z_sm, 1, 2)                        # [B, C, m]
    cs_in = [jnp.swapaxes(c, 1, 2) for c in reversed(cs)]  # [B, cdim, n]

    kernel = functools.partial(_flow_g_kernel, num_blocks=num_blocks,
                               splits=splits, r=r, interp=interpret)
    cs_specs = [
        pl.BlockSpec((1, c.shape[1], n), lambda bb: (bb, 0, 0),
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
        in_specs=[pl.BlockSpec((1, C, m), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM)] + cs_specs + w_specs,
        out_specs=pl.BlockSpec((1, C, m), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, m), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(z_cm.astype(jnp.float32), *cs_in, *weights)

    # back to point-major rows: [B, C, m] -> [B, r, n, C] -> [B0, N0*r, C]
    x_sm = jnp.swapaxes(out, 1, 2).reshape(B, r, n, C)
    return jnp.transpose(x_sm, (0, 2, 1, 3)).reshape(B0, N0 * r, C)


@functools.partial(jax.jit, static_argnums=(5, 6))
def flow_g_blend_pallas(flow_blocks, z_cm: jax.Array, ws: jax.Array,
                        knn_idx: jax.Array, cs, interpret: bool = False,
                        cs_cm: bool = False):
    """Latent interpolation + inverse flow, fused.

    z_cm: [B/P, C, P*N] latents in the f kernel's P-packed channel-major
    layout (straight from ``flow_f_pallas(emit_cm=True)`` — both sides
    compute P with `_pack_patches`, so the handoff is relayout-free);
    ws: [B, r, k*N] softmaxed interpolation weights channel-major (from
    ``encoder_conditions_pallas(interp_params=...)``); knn_idx: [B, N, k]
    K=8 graph; cs: un-repeated [B, N, cdim] conditions (forward order).
    Returns [B, N*r, C] point-major — matches
    ``flow_g_pallas(flow_blocks, interp_latents_pallas(...), cs)`` to
    softmax-ULP with one kernel launch and no HBM round-trip of the
    interpolated latents (reference `InterpolationModule.forward` + `g`,
    `modules/discrete/interpflow.py:173-186,315-321`)."""
    B0 = ws.shape[0]
    r = ws.shape[1]
    C = z_cm.shape[1]
    N0 = knn_idx.shape[1]
    k_interp = knn_idx.shape[-1]
    assert (k_interp * N0) % 128 == 0, "wide idx layout needs k*N % 128 == 0"
    num_blocks = len(flow_blocks)
    weights, splits = _g_weights(flow_blocks)

    # P patches fuse into one grid program; the per-patch blend prologue
    # loops over them, the flow body runs lane-packed
    if cs_cm:
        B, n = cs[0].shape[0], cs[0].shape[2]
        P = n // N0
        assert B * P == B0, (cs[0].shape, B0, N0)
    else:
        cdim_total = sum(c.shape[-1] for c in cs)
        P = _pack_patches(B0, N0, cdim_total)
        B, n = B0 // P, P * N0
    m = n * r
    assert z_cm.shape == (B, C, n), (z_cm.shape, (B, C, n))

    # wide idx: flat slot-major row ks*N0 + p lives at (row, lane) =
    # divmod(ks*N0 + p, 128) — dodges the 4-byte-row DMA of a [k*n, 1]
    # block (measured ~1.7 us/patch)
    W = k_interp * N0 // 128
    idx_w = jnp.swapaxes(knn_idx.astype(jnp.int32), 1, 2).reshape(B0, W, 128)

    if cs_cm:
        cs_in = list(reversed(cs))                         # [B, cdim, n]
    else:
        cs_p = [c.reshape(B, n, c.shape[-1]) for c in cs]
        cs_in = [jnp.swapaxes(c, 1, 2)
                 for c in reversed(cs_p)]                  # [B, cdim, n]

    kernel = functools.partial(_flow_g_blend_kernel, num_blocks=num_blocks,
                               splits=splits, r=r, k_interp=k_interp,
                               n0=N0, P=P, interp=interpret)
    cs_specs = [
        pl.BlockSpec((1, c.shape[1], n), lambda bb: (bb, 0, 0),
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
        in_specs=[
            pl.BlockSpec((1, C, n), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, W, 128), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, r, k_interp * N0), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + cs_specs + w_specs,
        out_specs=pl.BlockSpec((1, C, m), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, m), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(z_cm.astype(jnp.float32), idx_w, ws.astype(jnp.float32), *cs_in,
      *weights)

    # point-major rows, exactly like flow_g_pallas
    x_sm = jnp.swapaxes(out, 1, 2).reshape(B, r, n, C)
    return jnp.transpose(x_sm, (0, 2, 1, 3)).reshape(B0, N0 * r, C)
