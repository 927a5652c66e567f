"""Fully-fused EdgeConv condition encoder as one Pallas kernel.

The XLA encoder (`models/encoder.py` + `models/discrete.feat_extract`) is
HBM-bound: the per-block neighbour-projection tensors ([B, N*K, ~256] f32,
~1 GB each) and the one-hot gather matrix (~0.5 GB) stream through HBM six
times per forward (~74 ms of the 107 ms model forward at 256 patches).
Here ONE kernel program per patch keeps everything in VMEM:

  * the [N*K, N] one-hot gather matrix is built in-register from the k-NN
    indices (bf16, exact);
  * per block: self/neighbour projections, the densely-connected conv
    stack, K-axis max pooling and the condition-merge MLP run back to back
    on VMEM tensors;
  * only xyz, idx and the six condition outputs touch HBM.

Inference-only and requires BN-FOLDED parameters (`models/fold_bn.py`).
The neighbour gather uses the exact hi/lo bf16 split (single-pass MXU, f32
reconstruction — same scheme as `ops/knn.gather_by_onehot`); other matmuls
run 3-pass f32.
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

_SLOPE = 0.05  # FeatureExtractUnit LeakyReLU

# Encoder MXU pass-count configs: per-block tuples of
# (gather_passes, mac_passes).
#
# EXACT_PRECISION keeps every in-kernel matmul at the exact multi-pass bf16
# decomposition. FAST_PRECISION drops EVERY block to single-pass bf16 —
# and is the fused-path default because the end-to-end golden gate showed
# the pipeline CD vs the executed torch reference is INSENSITIVE to it
# (round-3 sweeps, scripts/exp_encoder_cd.py: exact 4.75e-4 and
# blocks-1-5-fast 4.55e-4 on the 512-pt cloud; with block 0 fast too and
# the seeded merge, 9.0e-4 fast vs 8.8e-4 with block 0 exact — the
# residual is cross-framework fp chaos + merge selection, not kernel
# precision, and the TRUE-surface accuracy on the sphere fixture is 19%
# BETTER than the reference output either way). Block 0's exact passes
# alone cost 22% of the kernel (67.2 -> 52.7 ms at 1024 patches,
# scripts/exp_encoder_split.py). Bit-parity needs (`--exact` CLI path,
# golden unit tests) bypass the fused kernel entirely or pin
# EXACT_PRECISION.
#
# `feat_extract` consults ENCODER_PRECISION when calling with
# precision=None; changing it after a jitted caller has traced requires
# jax.clear_caches().
EXACT_PRECISION = ((2, 3),) * 6
FAST_PRECISION = ((1, 1),) * 6
ENCODER_PRECISION = FAST_PRECISION


def _leaky(x):
    # == where(x > 0, x, s*x) for 0 < s < 1, one fewer VPU pass
    return jnp.maximum(x, _SLOPE * x)


def _bf16_dot(a_bf16, b_bf16, out_dtype=jnp.float32):
    # explicit DEFAULT precision: the global 'highest' matmul policy would
    # otherwise reach the bf16 dot and break Mosaic lowering. Mosaic
    # requires a 32-bit accumulator, so bf16 outputs cast after the dot.
    out = jax.lax.dot_general(a_bf16, b_bf16, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
    return out if out_dtype == jnp.float32 else out.astype(out_dtype)


def _split_hi_lo(x_f32):
    hi = x_f32.astype(jnp.bfloat16)
    lo = (x_f32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _f32_dot(a, b, passes: int = 3):
    """f32 matmul as an exact-ish multi-pass bf16 decomposition.

    Mosaic lowers a DEFAULT-precision f32 dot as a SINGLE bf16 pass, which
    cost the fused encoder ~6% relative error by block 5 (measured: the
    fixture-protocol CD inflated 0.0028 -> 0.0031+ vs the exact XLA path).
    hi*hi + hi*lo + lo*hi (passes=3) recovers ~2^-22 relative error for
    ~2x the MXU passes of bf16; passes=1 is the raw bf16 pass (~2^-8) for
    sites proven insensitive by the golden-CD gate.
    """
    if passes == 1:
        return _bf16_dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    a_hi, a_lo = _split_hi_lo(a)
    b_hi, b_lo = _split_hi_lo(b)
    return (_bf16_dot(a_hi, b_hi) + _bf16_dot(a_hi, b_lo)
            + _bf16_dot(a_lo, b_hi))


def _onehot_dot(onehot_bf16, b_f32, passes: int = 2):
    """Gather to ~2^-16: one-hot [p, q] bf16 x values [q, r] f32 -> [p, r]
    via the hi/lo split (two single-pass MXU matmuls). A bit-exact 3-term
    split (full 24-bit mantissa) was measured to change the fused encoder's
    deviation-vs-XLA by <0.1% while costing +19% kernel time — the
    deviation is dominated by 3-pass matmul rounding amplified through the
    condition pyramid, not by the gather. `passes=1` gathers the bf16
    rounding of the values (one MXU pass, ~2^-8)."""
    hi = b_f32.astype(jnp.bfloat16)

    def dot(b):
        # explicit DEFAULT precision: the global 'highest' matmul policy
        # would otherwise reach this bf16 dot and break Mosaic lowering
        return jax.lax.dot_general(onehot_bf16, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    if passes == 1:
        return dot(hi)
    lo = (b_f32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(hi) + dot(lo)


def _tile_rows(a, k):
    """[n, c] -> [k*n, c] by stacking k copies (slot-major layout)."""
    return jnp.concatenate([a] * k, axis=0)


# Opt-in: run single-pass-precision encoder blocks with NATIVE bf16
# elementwise (bias/leaky/concat/K-pool) as well as bf16 matmuls.
# Consulted at trace time by _encoder_kernel; see the block comment there
# for the measured (bad) speed/quality trade that keeps this off.
# ROUND-5 RE-MEASURE on the transposed (cm) kernels (VERDICT r4 item 6,
# `scripts/exp_fast_elem_cm.py`): model stage 38.08 ms (off) vs 38.44 ms
# (on) per 1024 patches — 0.99x, no win at all in the channel-major
# layout (the elementwise pipeline no longer sits on padded 128-lane
# tiles, so halving its width buys nothing). Stays OFF.
FAST_ELEMENTWISE = False


def _encoder_kernel(xyz_ref, idx_ref, *refs, n: int, k: int,
                    growths, odims, precision=None):
    """Condition encoder kernel.

    NOTE (round 3, measured): folding the interpolation weight head into
    this kernel (it shares the one-hot graph) looked like a free launch
    saving but ran the head's ~20 ops at the LARGE-BODY op rate — Mosaic's
    per-op cost degrades ~10x once a kernel body grows past a few dozen
    ops (34 -> 339 ns/dot/patch in a controlled chain experiment), so the
    fused variant cost +25 ms/1024 patches vs +8 standalone. Keep kernel
    bodies moderate; the head stays in `interp_logits_pallas`."""
    num_blocks = len(odims)
    if precision is None:
        precision = ((2, 3),) * num_blocks
    weight_refs = refs[:-num_blocks]
    out_refs = refs[-num_blocks:]

    # slot-major rows: r = s*n + p  (Mosaic cannot fold a lane dim into
    # sublanes, so the caller pre-flattens idx to [k*n, 1] in this order;
    # slot-major also makes the self-term a whole-array tile and the K-pool
    # a set of static row slices)
    idx_col = idx_ref[0]                                   # [k*n, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n * k, n), 1)
    onehot = (cols == idx_col).astype(jnp.bfloat16)

    x = xyz_ref[0]                                         # [n, C_b]
    wi = 0

    def take():
        nonlocal wi
        r = weight_refs[wi][...]
        wi += 1
        return r

    for b in range(num_blocks):
        gather_passes, mac_passes = precision[b]
        # fully-bf16 block: when every matmul in the block is single-pass
        # AND the opt-in FAST_ELEMENTWISE flag is set, the elementwise
        # pipeline (bias/leaky/concat/K-pool) runs NATIVELY in bf16 too —
        # the matmul inputs were bf16-quantised anyway, and packed bf16
        # doubles VPU elementwise throughput. Measured (round 3): only ~6%
        # end-to-end model speedup (inside tunnel variance) for a golden-CD
        # cost of 4.55e-4 -> 7.16e-4 vs the executed reference — still
        # under the 1e-3 fused gate, but a bad trade, so OFF by default.
        fast = gather_passes == 1 and mac_passes == 1 and FAST_ELEMENTWISE
        dt = jnp.bfloat16 if fast else jnp.float32
        n_layers = len(growths[b])
        w_self = take()                                    # [C, Gt]
        w_nbr = take()                                     # [C, Gt]
        gt = w_nbr.shape[1]

        if fast:
            xb = x.astype(jnp.bfloat16)
            p_self = _bf16_dot(xb, w_self.astype(jnp.bfloat16), dt)
            proj = _bf16_dot(xb, w_nbr.astype(jnp.bfloat16), jnp.bfloat16)
            p_nbr = _bf16_dot(onehot, proj, dt)            # [k*n, Gt]
        else:
            p_self = _f32_dot(x, w_self)                   # [n, Gt]
            # NOTE: gathering the raw features first and projecting after
            # (2*n*C + 3*C*Gt MAC-passes vs 2*n*Gt) looked cheaper on paper
            # for the low-C blocks but measured SLOWER (the 3-pass
            # projection's hi/lo splits of the big [k*n, C] activation are
            # VPU-bound; and with the MXU's 128-lane output padding the
            # raw gather's 3-wide product costs a full lane tile anyway);
            # project-then-gather stays.
            p_nbr = _onehot_dot(onehot, _f32_dot(x, w_nbr),
                                passes=gather_passes)      # [k*n, Gt]
        # fold the self term in with ONE slot-broadcast add (slot-major
        # rows: leading-dim reshape is free) instead of materialising a
        # k-tiled copy of p_self and adding two operands per layer slice
        p = (p_nbr.reshape(k, n, gt) + p_self[None]).reshape(k * n, gt)

        offset = 0
        # carry h_cat as a (hi, lo) bf16 pair: it feeds a matmul at every
        # later layer, and re-splitting the growing [k*n, P_j] prefix per
        # dot is pure VPU waste — each new piece splits exactly once
        hc_hi = hc_lo = None

        def hc_dot(w, mac_passes=mac_passes, out_dtype=dt):
            if mac_passes == 1:
                return _bf16_dot(hc_hi, w.astype(jnp.bfloat16), out_dtype)
            w_hi, w_lo = _split_hi_lo(w)
            return (_bf16_dot(hc_hi, w_hi) + _bf16_dot(hc_hi, w_lo)
                    + _bf16_dot(hc_lo, w_hi))

        for j in range(n_layers):
            g = growths[b][j]
            h = p[:, offset:offset + g] + take().astype(dt)  # bias [1, G_j]
            if j > 0:
                h = h + hc_dot(take())                     # [P_j, G_j]
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

        f = p[:, offset:] + take().astype(dt)              # out bias
        f = f + hc_dot(take())                             # conv_out h part
        # K-pool over slot-major rows
        f = jnp.max(f.reshape(k, n, odims[b]), axis=0)     # [n, odim]

        wm1, bm1, wm2 = take(), take(), take()
        if fast:
            m = jnp.maximum(
                _bf16_dot(f, wm1.astype(jnp.bfloat16), dt)
                + bm1.astype(dt), 0)
            out_refs[b][0] = _bf16_dot(m, wm2.astype(jnp.bfloat16),
                                       jnp.float32)        # [n, cdim]
        else:
            m = jnp.maximum(_f32_dot(f, wm1) + bm1, 0.0)
            out_refs[b][0] = _f32_dot(m, wm2)              # [n, cdim]

        x = f


# ---------------------------------------------------------------------------
# Channel-major (transposed) encoder kernel — round-4 reformulation.
#
# The row-major kernel above puts the k*n point-slot pairs on SUBLANES and
# features on LANES, so every <=32-wide growth-layer matmul pads its output
# to a full 128-lane MXU tile: [4096, P] @ [P, 32] costs the same tile
# passes as [4096, 128] @ [128, 128] (measured 0.54 ms/op across the 1024
# -patch batch, scripts/exp_transposed_enc2.py). Transposing the whole
# block — features on sublanes, point-slot pairs on lanes — makes the same
# layer [32, P] @ [P, 4096]: the 32-wide output lands on STREAMED MXU rows
# (no 128 padding) and the 4096 pairs fill output lanes exactly. Measured
# slope: ~0.17 ms/op upper bound (hidden entirely under the input DMA in
# the microbenchmark). Padded-tile accounting for the full encoder:
# 185k row-passes/patch row-major -> 118k transposed (-36%); block 0's
# gather also halves ([64, 256] @ [256, 4096] streams 64 rows vs 4096).
#
# The neighbour gather stays a one-hot MXU matmul — from the RIGHT:
# g^T = proj^T [W, n] @ onehot^T [n, k*n]. Native lane/sublane dynamic
# gathers do not lower in Mosaic on this jax (take_along_axis asserts;
# scripts/exp_transposed_enc2.py).
#
# A further win is layout fusion: the flow kernels consume conditions
# CHANNEL-major ([cdim, n], P patches packed on lanes) and previously paid
# XLA transposes of ~637 MB of conditions per 1024-patch batch; this
# kernel emits that layout directly (`pack` = flow's `_pack_patches` P).
# ---------------------------------------------------------------------------
def _encoder_kernel_cm(xyzT_ref, idx_ref, *refs, n: int, k: int,
                       growths, odims, precision=None):
    """Transposed condition-encoder kernel: features on sublanes,
    point-slot pairs on lanes (column r = s*n + p, slot-major)."""
    num_blocks = len(odims)
    if precision is None:
        precision = ((2, 3),) * num_blocks
    weight_refs = refs[:-num_blocks]
    out_refs = refs[-num_blocks:]

    idx_row = idx_ref[0]                                   # [1, k*n]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n * k), 0)
    onehotT = (rows == idx_row).astype(jnp.bfloat16)       # [n, k*n]

    xT = xyzT_ref[0]                                       # [C_b, n]
    wi = 0

    def take():
        nonlocal wi
        r = weight_refs[wi][...]
        wi += 1
        return r

    for b in range(num_blocks):
        gather_passes, mac_passes = precision[b]
        fast = gather_passes == 1 and mac_passes == 1 and FAST_ELEMENTWISE
        dt = jnp.bfloat16 if fast else jnp.float32
        n_layers = len(growths[b])
        w_selfT = take()                                   # [Gt, C]
        w_nbrT = take()                                    # [Gt, C]

        if fast:
            xb = xT.astype(jnp.bfloat16)
            p_selfT = _bf16_dot(w_selfT.astype(jnp.bfloat16), xb, dt)
            projT = _bf16_dot(w_nbrT.astype(jnp.bfloat16), xb,
                              jnp.bfloat16)
            p_nbrT = _bf16_dot(projT, onehotT, dt)         # [Gt, k*n]
        else:
            p_selfT = _f32_dot(w_selfT, xT)                # [Gt, n]
            projT = _f32_dot(w_nbrT, xT)                   # [Gt, n]
            # one-hot gather from the right: columns of onehotT select
            # neighbour points; exact hi/lo split of the VALUES as in the
            # row-major kernel (the one-hot factor is bf16-exact)
            if gather_passes == 1:
                p_nbrT = _bf16_dot(projT.astype(jnp.bfloat16), onehotT)
            else:
                p_hi, p_lo = _split_hi_lo(projT)
                p_nbrT = (_bf16_dot(p_hi, onehotT)
                          + _bf16_dot(p_lo, onehotT))
        # fold the self term in: slot-major columns tile as whole-array
        # lane repeats ([Gt, n] -> [Gt, k*n])
        p = p_nbrT + pltpu.repeat(p_selfT.astype(p_nbrT.dtype), k, 1)

        offset = 0
        hc_hi = hc_lo = None                               # [P_j, k*n] bf16

        def hc_dot(wT, mac_passes=mac_passes, out_dtype=dt):
            # wT: [G_j, P_j] transposed layer weight
            if mac_passes == 1:
                return _bf16_dot(wT.astype(jnp.bfloat16), hc_hi, out_dtype)
            w_hi, w_lo = _split_hi_lo(wT)
            return (_bf16_dot(w_hi, hc_hi) + _bf16_dot(w_lo, hc_hi)
                    + _bf16_dot(w_hi, hc_lo))

        for j in range(n_layers):
            g = growths[b][j]
            h = p[offset:offset + g, :] + take().astype(dt)  # bias [G_j, 1]
            if j > 0:
                h = h + hc_dot(take())                     # [G_j, P_j]
            h = _leaky(h)
            if mac_passes == 1:
                h_hi = h.astype(jnp.bfloat16)
                h_lo = None
            else:
                h_hi, h_lo = _split_hi_lo(h)
            if hc_hi is None:
                hc_hi, hc_lo = h_hi, h_lo
            else:
                hc_hi = jnp.concatenate([hc_hi, h_hi], axis=0)
                if h_lo is not None:
                    hc_lo = jnp.concatenate([hc_lo, h_lo], axis=0)
            offset += g

        f = p[offset:, :] + take().astype(dt)              # out bias [odim,1]
        f = f + hc_dot(take())                             # conv_out h part
        # K-pool over slot-major column groups ([odim, k*n] -> [odim, n])
        fp = f[:, :n]
        for s in range(1, k):
            fp = jnp.maximum(fp, f[:, s * n:(s + 1) * n])

        wm1T, bm1, wm2T = take(), take(), take()
        if fast:
            m = jnp.maximum(
                _bf16_dot(wm1T.astype(jnp.bfloat16), fp, dt)
                + bm1.astype(dt), 0)
            out_refs[b][0] = _bf16_dot(wm2T.astype(jnp.bfloat16), m,
                                       jnp.float32)        # [cdim, n]
        else:
            m = jnp.maximum(_f32_dot(wm1T, fp) + bm1, 0.0)
            out_refs[b][0] = _f32_dot(wm2T, m)             # [cdim, n]

        xT = fp


def _block_weights_cm(params):
    """Folded per-block params -> transposed weight arrays in kernel
    order (every matrix transposed, biases as [G, 1] columns)."""
    flat, meta = _block_weights(params)
    out = []
    for w in flat:
        if w.ndim == 2 and w.shape[0] == 1:                # bias row
            out.append(w.T)                                # [G, 1]
        else:
            out.append(w.T)
    return out, meta


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def encoder_conditions_pallas_cm(params, xyz: jax.Array, knn_idx: jax.Array,
                                 pack: int = 1, interpret: bool = False,
                                 precision=None):
    """Fused condition encoder, CHANNEL-major outputs: xyz [B, n, 3],
    idx [B, n, k] -> list of [B // pack, cdim_i, pack * n] condition
    tensors in the flow kernels' P-packed lane layout (patch i of a pack
    at lanes i*n..(i+1)*n). ``pack=1`` gives plain [B, cdim_i, n].
    `params` must be BN-folded; `precision` as in
    `encoder_conditions_pallas`."""
    B, n, _ = xyz.shape
    k = knn_idx.shape[-1]
    assert B % pack == 0, (B, pack)
    weights, (growths, odims, cdims) = _block_weights_cm(params)

    if precision is None:
        precision = ENCODER_PRECISION
    kernel = functools.partial(_encoder_kernel_cm, n=n, k=k,
                               growths=growths, odims=odims,
                               precision=precision)
    num_blocks = len(odims)
    idx_sm = jnp.swapaxes(knn_idx.astype(jnp.int32), 1, 2).reshape(
        B, 1, k * n)
    xyzT = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)     # [B, 3, n]

    w_specs = [
        pl.BlockSpec(w.shape, (lambda bb, nd=w.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out_specs = tuple(
        pl.BlockSpec((1, cdims[i], n),
                     (lambda bb, p=pack: (bb // p, 0, bb % p)),
                     memory_space=pltpu.VMEM)
        for i in range(num_blocks)
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((B // pack, cdims[i], pack * n), jnp.float32)
        for i in range(num_blocks)
    )
    cs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k * n), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xyzT, idx_sm, *weights)
    return list(cs)


def _block_weights(params):
    """Folded per-block params -> flat weight arrays in kernel order."""
    out = []
    meta_growths, meta_odims, meta_cdims = [], [], []
    for fp, mp in zip(params["feat_convs"], params["merge_convs"]):
        layers = [c["lin"] for c in fp["convs"]] + [fp["conv_out"]]
        if any("bn" in c for c in fp["convs"]):
            raise ValueError("encoder kernel requires BN-folded params "
                             "(models/fold_bn.fold_bn_inference)")
        # infer C from the first layer: w [3C, G]
        C = layers[0]["w"].shape[0] // 3
        growths = [c["lin"]["w"].shape[1] for c in fp["convs"]]
        odim = fp["conv_out"]["w"].shape[1]
        w_selfs, w_nbrs, biases = [], [], []
        for lay in layers:
            w = lay["w"]
            w_selfs.append(w[:C] - w[2 * C:3 * C])
            w_nbrs.append(w[C:2 * C] + w[2 * C:3 * C])
            biases.append(lay.get("b", jnp.zeros(w.shape[1])))
        out.append(jnp.concatenate(w_selfs, axis=1))
        out.append(jnp.concatenate(w_nbrs, axis=1))
        # per-layer biases as separate refs: lane-offset slices of a fused
        # bias vector break Mosaic broadcast layouts
        for j, lay in enumerate(layers[:-1]):
            out.append(biases[j][None, :])
            if j > 0:
                out.append(lay["w"][3 * C:])
        out.append(biases[-1][None, :])
        out.append(layers[-1]["w"][3 * C:])
        out.append(mp["conv1"]["w"])
        out.append(mp["conv1"]["b"][None, :])
        out.append(mp["conv2"]["w"])
        meta_growths.append(tuple(growths))
        meta_odims.append(odim)
        meta_cdims.append(mp["conv2"]["w"].shape[1])
    return out, (tuple(meta_growths), tuple(meta_odims), tuple(meta_cdims))


@functools.partial(jax.jit, static_argnums=(3, 4))
def encoder_conditions_pallas(params, xyz: jax.Array, knn_idx: jax.Array,
                              interpret: bool = False, precision=None):
    """Fused condition encoder: xyz [B, n, 3], idx [B, n, k] -> list of
    [B, n, cdim_i] condition tensors. `params` must be BN-folded.

    `precision`: optional per-block tuple of (gather_passes, mac_passes)
    MXU pass counts; None = the exact default ((2, 3) per block)."""
    B, n, _ = xyz.shape
    k = knn_idx.shape[-1]
    weights, (growths, odims, cdims) = _block_weights(params)

    if precision is None:
        precision = ENCODER_PRECISION
    kernel = functools.partial(_encoder_kernel, n=n, k=k, growths=growths,
                               odims=odims, precision=precision)
    num_blocks = len(odims)
    # slot-major flatten: row s*n + p holds neighbour s of point p
    idx_sm = jnp.swapaxes(knn_idx.astype(jnp.int32), 1, 2).reshape(
        B, k * n, 1)

    w_specs = [
        pl.BlockSpec(w.shape, (lambda bb, nd=w.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out_specs = tuple(
        pl.BlockSpec((1, n, cdims[i]), lambda bb: (bb, 0, 0),
                     memory_space=pltpu.VMEM)
        for i in range(num_blocks)
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, n, cdims[i]), jnp.float32)
        for i in range(num_blocks)
    )
    cs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * n, 1), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xyz.astype(jnp.float32), idx_sm, *weights)
    return list(cs)


@functools.partial(jax.jit, static_argnums=(3, 4))
def interp_weights_cm_pallas(interp_params, xyz: jax.Array,
                             knn_idx: jax.Array, upratio: int,
                             interpret: bool = False):
    """Softmaxed interpolation weights, CHANNEL-major: the layout
    `flow_g_blend_pallas` consumes (``[B, upratio, k*n]``, column
    ks*n + p).

    Round 4: computed by the TRANSPOSED head kernel (features on
    sublanes, point-slot pairs on lanes — same reformulation as
    `_encoder_kernel_cm`; the 16-wide FEU growth layers stream 16 MXU
    rows instead of padding a 128-lane output tile) with the slot
    softmax fused in-kernel, so the [B, r, k*n] weights leave the kernel
    ready for the g kernel. Row-major variant + XLA softmax tail:
    `interp_logits_pallas` (kept for the interp_latents fallback path
    and bit-parity tests)."""
    return interp_weights_cm_pallas_t(interp_params, xyz, knn_idx, upratio,
                                      interpret)


# ---------------------------------------------------------------------------
# Fused interpolation-weight head: distance encoder + context EdgeConv +
# weight-estimation MLP in one kernel (reference `InterpolationModule`,
# `modules/discrete/interpflow.py:162-186`). The interpolation weights
# depend only on the input geometry, so the whole head runs per patch in
# VMEM and only the [n*k, R_MAX] logits leave the kernel.
# ---------------------------------------------------------------------------
def _leaky01(x):
    return jnp.maximum(x, 0.01 * x)


def _interp_logits_body(x, onehot, take, n: int, k: int, growths,
                        fast: bool = False):
    """Shared body: xyz + one-hot graph -> interpolation logits
    [k*n, r_max] (slot-major rows).

    `fast` runs the MLP/EdgeConv pipeline in single-pass bf16 with bf16
    elementwise (the logits only feed a softmax over 8 neighbour slots;
    golden-CD gated like the encoder's FAST_PRECISION). The raw distance
    features stay f32."""
    dt = jnp.bfloat16 if fast else jnp.float32

    def dot(a, b, out_dtype=None):
        if fast:
            return _bf16_dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                             out_dtype or dt)
        return _f32_dot(a, b)

    # --- distance features: [pt, nei, pt - nei, |pt - nei|] -------------
    nei = _onehot_dot(onehot, x)                           # [k*n, 3]
    pt = _tile_rows(x, k)
    vec = pt - nei
    dist = jnp.sqrt(jnp.sum(vec * vec, axis=1, keepdims=True))
    f10 = jnp.concatenate([pt, nei, vec, dist], axis=1)    # [k*n, 10]

    h = _leaky01(dot(f10, take()) + take().astype(dt))     # de lin0+b
    h = _leaky01(dot(h, take()) + take().astype(dt))       # de lin1+b
    de_out = dot(h, take()) + take().astype(dt)            # de lin2+b [.,128]

    # --- context EdgeConv (no pooling), slope 0.05 ----------------------
    # gather(x) @ w_nbr == gather(x @ w_nbr) exactly (one-hot row
    # selection), and `nei` above IS gather(x) — projecting it directly
    # replaces the [k*n, n] @ [n, Gt] gather matmul (268 MFLOP/patch, 45%
    # of the head's FLOPs) with a [k*n, 3] @ [3, Gt] projection.
    w_self, w_nbr = take(), take()
    p_self = dot(x, w_self)                                # [n, Gt]
    p_nbr = dot(nei, w_nbr)                                # [k*n, Gt]
    gt = p_nbr.shape[1]
    p = (p_nbr.reshape(k, n, gt) + p_self[None]).reshape(k * n, gt)
    offset = 0
    h_cat = None
    for j in range(len(growths)):
        g = growths[j]
        hh = p[:, offset:offset + g] + take().astype(dt)
        if j > 0:
            hh = hh + dot(h_cat, take())
        hh = _leaky(hh)
        h_cat = hh if h_cat is None else jnp.concatenate([h_cat, hh],
                                                         axis=1)
        offset += g
    feu = p[:, offset:] + take().astype(dt)
    feu = feu + dot(h_cat, take())                         # [k*n, odim]

    ctx = jnp.concatenate([de_out, feu], axis=1)           # [k*n, 256]

    # --- weight-estimation MLP, slope 0.01 ------------------------------
    h = _leaky01(dot(ctx, take()) + take().astype(dt))
    h = _leaky01(dot(h, take()) + take().astype(dt))
    return (dot(h, take(), jnp.float32)
            + take().astype(jnp.float32))                  # [k*n, r_max]


def _graph_and_take(xyz_ref, idx_ref, weight_refs, n, k):
    idx_col = idx_ref[0]                                   # [k*n, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n * k, n), 1)
    onehot = (cols == idx_col).astype(jnp.bfloat16)
    x = xyz_ref[0]                                         # [n, 3]
    wi = 0

    def take():
        nonlocal wi
        w = weight_refs[wi][...]
        wi += 1
        return w

    return x, onehot, take


# Interp weight-head fast mode (single-pass bf16 MLPs + bf16 elementwise),
# consulted at trace time by the jitted wrappers below; golden-CD gated
# (scripts/exp_encoder_cd.py measures the full fused pipeline with it).
INTERP_FAST = True


def _interp_kernel(xyz_ref, idx_ref, *refs, n: int, k: int, growths,
                   fast: bool = False):
    x, onehot, take = _graph_and_take(xyz_ref, idx_ref, refs[:-1], n, k)
    refs[-1][0] = _interp_logits_body(x, onehot, take, n, k, growths, fast)


def _interp_latents_kernel(xyz_ref, idx_ref, z_ref, *refs, n: int, k: int,
                           growths, r: int, fast: bool = False):
    """Logits + softmax over the k neighbour slots + latent blend, fused.

    Emits the interpolated latents [n, C*r] (cols c*r + j) so only they
    leave VMEM — the [B, n*k, n] one-hot z-gather matrix and the logits
    never touch HBM.
    """
    x, onehot, take = _graph_and_take(xyz_ref, idx_ref, refs[:-1], n, k)
    out_ref = refs[-1]
    logits = _interp_logits_body(x, onehot, take, n, k, growths,
                                 fast)[:, :r]

    # softmax over the k slots per point (rows s*n + p), XLA-style
    # max-subtraction; slot slices are static [n, r] views
    sl = [logits[s * n:(s + 1) * n, :] for s in range(k)]
    mx = sl[0]
    for s in range(1, k):
        mx = jnp.maximum(mx, sl[s])
    es = [jnp.exp(v - mx) for v in sl]
    denom = es[0]
    for s in range(1, k):
        denom = denom + es[s]
    ws = [e / denom for e in es]                           # k x [n, r]

    zn = _onehot_dot(onehot, z_ref[0])                     # [k*n, C]
    C = zn.shape[1]
    cols = []
    for c in range(C):
        acc = zn[0:n, c:c + 1] * ws[0]                     # [n, r]
        for s in range(1, k):
            acc = acc + zn[s * n:(s + 1) * n, c:c + 1] * ws[s]
        cols.append(acc)
    out_ref[0] = jnp.concatenate(cols, axis=1)             # [n, C*r]


def _mlp3_weights(p):
    return [p["lin0"]["w"], p["lin0"]["b"][None, :],
            p["lin1"]["w"], p["lin1"]["b"][None, :],
            p["lin2"]["w"], p["lin2"]["b"][None, :]]


def _feu_weights(fp):
    layers = [c["lin"] for c in fp["convs"]] + [fp["conv_out"]]
    if any("bn" in c for c in fp["convs"]):
        raise ValueError("interp kernel requires BN-folded params")
    C = layers[0]["w"].shape[0] // 3
    out = []
    w_selfs, w_nbrs = [], []
    for lay in layers:
        w = lay["w"]
        w_selfs.append(w[:C] - w[2 * C:3 * C])
        w_nbrs.append(w[C:2 * C] + w[2 * C:3 * C])
    out.append(jnp.concatenate(w_selfs, axis=1))
    out.append(jnp.concatenate(w_nbrs, axis=1))
    for j, lay in enumerate(layers[:-1]):
        out.append(lay["b"][None, :])
        if j > 0:
            out.append(lay["w"][3 * C:])
    out.append(layers[-1]["b"][None, :])
    out.append(layers[-1]["w"][3 * C:])
    growths = tuple(c["lin"]["w"].shape[1] for c in fp["convs"])
    return out, growths, layers[-1]["w"].shape[1]


@functools.partial(jax.jit, static_argnums=(3, 4))
def interp_logits_pallas(interp_params, xyz: jax.Array, knn_idx: jax.Array,
                         interpret: bool = False, fast=None):
    """Fused interpolation-weight head: xyz [B, n, 3], idx [B, n, k] ->
    logits [B, n, k, R_MAX]. `interp_params` must be BN-folded."""
    B, n, _ = xyz.shape
    k = knn_idx.shape[-1]
    kc = interp_params["knn_context"]
    weights = _mlp3_weights(kc["distance_encoder"])
    feu_w, growths, _feu_odim = _feu_weights(kc["feat_conv"])
    weights += feu_w
    weights += _mlp3_weights(interp_params["weight_unit"])
    r_max = interp_params["weight_unit"]["lin2"]["w"].shape[1]

    idx_sm = jnp.swapaxes(knn_idx.astype(jnp.int32), 1, 2).reshape(
        B, k * n, 1)
    kernel = functools.partial(
        _interp_kernel, n=n, k=k, growths=growths,
        fast=INTERP_FAST if fast is None else fast)
    w_specs = [
        pl.BlockSpec(w.shape, (lambda bb, nd=w.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * n, 1), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, k * n, r_max), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, k * n, r_max), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xyz.astype(jnp.float32), idx_sm, *weights)
    # slot-major [B, k*n, R] -> [B, n, k, R]
    return jnp.swapaxes(out.reshape(B, k, n, r_max), 1, 2)


# ---------------------------------------------------------------------------
# Transposed interpolation-weight head (round 4): the same feature-major
# reformulation as `_encoder_kernel_cm` applied to the weight head, with
# the slot softmax fused. Padded-tile accounting: ~20.5k row-passes/patch
# vs ~33k row-major, and the raw-coordinate gather streams 3 MXU rows
# instead of 2048 ([3, n] @ [n, k*n] vs [k*n, n] @ [n, 128-padded]).
# ---------------------------------------------------------------------------
def _interp_cm_kernel(xyzT_ref, idx_ref, *refs, n: int, k: int, growths,
                      r: int, fast: bool = False):
    weight_refs = refs[:-1]
    out_ref = refs[-1]
    idx_row = idx_ref[0]                                   # [1, k*n]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n * k), 0)
    onehotT = (rows == idx_row).astype(jnp.bfloat16)       # [n, k*n]
    xT = xyzT_ref[0]                                       # [3, n]
    wi = 0

    def take():
        nonlocal wi
        w = weight_refs[wi][...]
        wi += 1
        return w

    dt = jnp.bfloat16 if fast else jnp.float32

    def dot(a, b, out_dtype=None):
        if fast:
            return _bf16_dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                             out_dtype or dt)
        return _f32_dot(a, b)

    # --- distance features (f32 like the row-major kernel) ---------------
    x_hi, x_lo = _split_hi_lo(xT)
    neiT = _bf16_dot(x_hi, onehotT) + _bf16_dot(x_lo, onehotT)  # [3, k*n]
    ptT = pltpu.repeat(xT, k, 1)                           # [3, k*n]
    vecT = ptT - neiT
    distT = jnp.sqrt(jnp.sum(vecT * vecT, axis=0, keepdims=True))

    # de lin0 decomposed over the f10 = [pt, nei, vec, dist] blocks (a
    # 10-row sublane concat is misaligned; four small products are not)
    w_pt, w_nei, w_vec, w_d, b0 = (take() for _ in range(5))
    h = (dot(w_pt, ptT) + dot(w_nei, neiT) + dot(w_vec, vecT)
         + w_d.astype(dt) * distT.astype(dt) + b0.astype(dt))
    h = _leaky01(h)
    h = _leaky01(dot(take(), h) + take().astype(dt))       # de lin1
    de_out = dot(take(), h) + take().astype(dt)            # [128, k*n]

    # --- context EdgeConv (no pooling), slope 0.05 ----------------------
    # project the already-gathered raw neighbours (gather commutes with
    # the projection — same algebra as the row-major round-3c form)
    w_selfT, w_nbrT = take(), take()
    p_selfT = dot(w_selfT, xT)                             # [Gt, n]
    p_nbrT = dot(w_nbrT, neiT.astype(dt))                  # [Gt, k*n]
    p = p_nbrT + pltpu.repeat(p_selfT, k, 1)
    offset = 0
    h_cat = None
    for j in range(len(growths)):
        g = growths[j]
        hh = p[offset:offset + g, :] + take().astype(dt)
        if j > 0:
            hh = hh + dot(take(), h_cat)
        hh = _leaky(hh)
        h_cat = hh if h_cat is None else jnp.concatenate([h_cat, hh],
                                                         axis=0)
        offset += g
    feu = p[offset:, :] + take().astype(dt)
    feu = feu + dot(take(), h_cat)                         # [odim, k*n]

    ctx = jnp.concatenate([de_out, feu], axis=0)           # [256, k*n]

    # --- weight-estimation MLP, slope 0.01 ------------------------------
    h = _leaky01(dot(take(), ctx) + take().astype(dt))
    h = _leaky01(dot(take(), h) + take().astype(dt))
    logits = (dot(take(), h, jnp.float32)
              + take().astype(jnp.float32))[:r]            # [r, k*n]

    # --- softmax over the k neighbour slots (static column groups) ------
    sl = [logits[:, s * n:(s + 1) * n] for s in range(k)]
    mx = sl[0]
    for s in range(1, k):
        mx = jnp.maximum(mx, sl[s])
    es = [jnp.exp(v - mx) for v in sl]
    denom = es[0]
    for s in range(1, k):
        denom = denom + es[s]
    out_ref[0] = jnp.concatenate([e / denom for e in es], axis=1)


def _interp_weights_cm_t_weights(interp_params):
    """Transposed weight list for `_interp_cm_kernel` (matrices
    transposed, biases as columns, de lin0 split over the f10 blocks)."""
    kc = interp_params["knn_context"]
    de = kc["distance_encoder"]
    w0, b0 = de["lin0"]["w"], de["lin0"]["b"]
    weights = [w0[0:3].T, w0[3:6].T, w0[6:9].T, w0[9:10].T, b0[:, None]]
    weights += [de["lin1"]["w"].T, de["lin1"]["b"][:, None],
                de["lin2"]["w"].T, de["lin2"]["b"][:, None]]
    feu_w, growths, _ = _feu_weights(kc["feat_conv"])
    for w in feu_w:
        weights.append(w.T)
    wu = interp_params["weight_unit"]
    weights += [wu["lin0"]["w"].T, wu["lin0"]["b"][:, None],
                wu["lin1"]["w"].T, wu["lin1"]["b"][:, None],
                wu["lin2"]["w"].T, wu["lin2"]["b"][:, None]]
    return weights, growths


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def interp_weights_cm_pallas_t(interp_params, xyz: jax.Array,
                               knn_idx: jax.Array, upratio: int,
                               interpret: bool = False, fast=None):
    """Transposed fused weight head + in-kernel slot softmax:
    xyz [B, n, 3], idx [B, n, k] -> softmaxed weights [B, upratio, k*n]
    (channel-major, column ks*n + p — `flow_g_blend_pallas`'s layout).
    `interp_params` must be BN-folded."""
    B, n, _ = xyz.shape
    k = knn_idx.shape[-1]
    weights, growths = _interp_weights_cm_t_weights(interp_params)

    idx_sm = jnp.swapaxes(knn_idx.astype(jnp.int32), 1, 2).reshape(
        B, 1, k * n)
    xyzT = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)     # [B, 3, n]
    kernel = functools.partial(
        _interp_cm_kernel, n=n, k=k, growths=growths, r=upratio,
        fast=INTERP_FAST if fast is None else fast)
    w_specs = [
        pl.BlockSpec(w.shape, (lambda bb, nd=w.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k * n), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, upratio, k * n), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, upratio, k * n), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xyzT, idx_sm, *weights)
    return out


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def interp_latents_pallas(interp_params, xyz: jax.Array, knn_idx: jax.Array,
                          z: jax.Array, upratio: int,
                          interpret: bool = False, fast=None):
    """Fully-fused latent interpolation: weight head + softmax + k-NN
    latent blend in one kernel. xyz [B, n, 3], idx [B, n, k], z [B, n, C]
    -> [B, n, C, upratio] (reference `InterpolationModule.forward`,
    `modules/discrete/interpflow.py:173-186`)."""
    B, n, C = z.shape
    k = knn_idx.shape[-1]
    kc = interp_params["knn_context"]
    weights = _mlp3_weights(kc["distance_encoder"])
    feu_w, growths, _ = _feu_weights(kc["feat_conv"])
    weights += feu_w
    weights += _mlp3_weights(interp_params["weight_unit"])

    idx_sm = jnp.swapaxes(knn_idx.astype(jnp.int32), 1, 2).reshape(
        B, k * n, 1)
    kernel = functools.partial(
        _interp_latents_kernel, n=n, k=k, growths=growths, r=upratio,
        fast=INTERP_FAST if fast is None else fast)
    w_specs = [
        pl.BlockSpec(w.shape, (lambda bb, nd=w.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * n, 1), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, C), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, n, C * upratio), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, C * upratio), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xyz.astype(jnp.float32), idx_sm, z.astype(jnp.float32), *weights)
    return out.reshape(B, n, C, upratio)
