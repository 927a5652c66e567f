"""PointInterpFlow (discrete): 6-block conditional Glow for point upsampling.

Parity target: reference `modules/discrete/interpflow.py:262-351`.

Architecture per flow block (reference `FlowBlock`, `:46-82`):
    ActNorm -> invertible 1x1 conv -> additive spatial coupling
    -> reverse channel permute -> affine injector
with the block's condition coming from a densely-connected EdgeConv pyramid
(`feat_extract`, `:292-300`). Upsampling: points -> latents via the forward
flow `f`, latent k-NN interpolation (k=8, learned softmax weights), inverse
flow `g` on the interpolated latents with conditions repeated `upratio`
times (`:315-321`).

TPU-first notes: the whole forward (knn -> encode -> f -> interp -> g) is one
pure function of (params, state, xyz) with static shapes — a single jit
compilation serves every patch batch, and the patch axis shards over a device
mesh (see `puflow_tpu.parallel`). Log-det/exp paths stay float32.
"""

from __future__ import annotations

import functools

from typing import NamedTuple

import jax
import jax.numpy as jnp

from puflow_tpu.flows.coupling import (
    additive_coupling_forward,
    additive_coupling_inverse,
    affine_injector_forward,
    affine_injector_inverse,
    linear_a1d_init,
)
from puflow_tpu.flows.normalize import (
    actnorm_forward,
    actnorm_init,
    actnorm_init_from_data,
    actnorm_inverse,
)
from puflow_tpu.flows.permutate import (
    inv1x1_forward,
    inv1x1_init,
    inv1x1_inverse,
    reverse_permute,
)
from puflow_tpu.flows.prior import standard_gaussian_logp
from puflow_tpu.models.encoder import (
    feat_merge_apply,
    feat_merge_init,
    feature_extract_apply,
    feature_extract_init,
    interpolation_apply,
    interpolation_init,
)
from puflow_tpu.ops.knn import knn_indices, make_neighbor_gather

NUM_BLOCKS = 6
NUM_NEIGHBORS = 16   # encoder k-NN (reference :268)
PC_CHANNEL = 3

# Channel schedule (reference :273-275).
FEAT_CHANNELS = [PC_CHANNEL, 32, 64, 128, 128, 128, 128]
GROWTH_WIDTHS = [8, 16, 32, 32, 32, 32]
COND_CHANNELS = [32, 64, 128, 128, 128, 128]
HDIM = 64

_REVERSE3 = (2, 1, 0)  # reverse permutation of 3 channels; self-inverse

# ---------------------------------------------------------------------------
# Fused-kernel dispatch gates. The Pallas kernels hold whole per-patch
# working sets in VMEM, so they only dispatch below these sizes; larger
# shapes take the XLA formulation (same math, slower). The gates are
# plain functions so tests can pin the exact boundary, and every fallback
# on a TPU backend logs once per traced shape — no silent perf cliffs.
# ---------------------------------------------------------------------------
ENCODER_FUSED_MAX_NK = 8192   # N * K VMEM budget of encoder_conditions_pallas
FLOW_G_FUSED_MAX_NR = 4096    # N * r VMEM budget of flow_g_pallas
FLOW_F_FUSED_MAX_N = 2048     # per-patch VMEM budget of flow_f_pallas

_logger = __import__("logging").getLogger("puflow_tpu.dispatch")
_warned_shapes: set = set()


def _log_fallback(kind: str, detail: str):
    key = (kind, detail)
    if key not in _warned_shapes:
        _warned_shapes.add(key)
        _logger.warning("fused %s kernel gate exceeded (%s); using the "
                        "XLA fallback (same results, lower throughput)",
                        kind, detail)


def use_fused_encoder(n: int, k: int, backend: str | None = None) -> bool:
    """True when the fused condition-encoder kernel dispatches for an
    [*, n, 3] cloud with k-NN width k."""
    backend = backend or jax.default_backend()
    if backend == "cpu":
        return False
    if n * k > ENCODER_FUSED_MAX_NK:
        _log_fallback("encoder", f"N*K = {n}*{k} > {ENCODER_FUSED_MAX_NK}")
        return False
    return True


def use_fused_flow_f(n: int, backend: str | None = None) -> bool:
    """True when the fused forward-flow kernel dispatches for n-point
    patches (inference only — the kernel skips the log-density)."""
    backend = backend or jax.default_backend()
    if backend == "cpu":
        return False
    if n > FLOW_F_FUSED_MAX_N:
        _log_fallback("forward-flow", f"N = {n} > {FLOW_F_FUSED_MAX_N}")
        return False
    return True


def use_fused_flow_g(n: int, r: int, backend: str | None = None) -> bool:
    """True when the fused inverse-flow kernel dispatches for n points at
    upratio r."""
    backend = backend or jax.default_backend()
    if backend == "cpu":
        return False
    if n * r > FLOW_G_FUSED_MAX_NR:
        _log_fallback("inverse-flow", f"N*r = {n}*{r} > {FLOW_G_FUSED_MAX_NR}")
        return False
    return True


class ModelSpec(NamedTuple):
    """Static model hyper-parameters (hashable, jit-friendly)."""
    num_blocks: int = NUM_BLOCKS
    num_neighbors: int = NUM_NEIGHBORS
    pc_channel: int = PC_CHANNEL


# --------------------------------------------------------------------------
# Flow block
# --------------------------------------------------------------------------
def flow_block_init(key, cdim: int, is_even: bool, idim: int = PC_CHANNEL,
                    hdim: int = HDIM) -> dict:
    k0, k1, k2, k3 = jax.random.split(key, 4)
    tdim = 1 if is_even else 2  # spatial split size (reference :56-58)
    return {
        "actnorm": actnorm_init(idim),
        "inv1x1": inv1x1_init(k0, idim),
        "coupling1": {
            "bias_net": linear_a1d_init(k1, tdim, hdim, idim - tdim, cdim)
        },
        "coupling2": {
            "scale_net": linear_a1d_init(k2, cdim, hdim, idim),
            "bias_net": linear_a1d_init(k3, cdim, hdim, idim),
        },
    }


def flow_block_forward(params: dict, x: jax.Array, c: jax.Array,
                       is_even: bool):
    """One Glow step; logdet accumulates actnorm + inv1x1 + injector terms
    (the additive coupling is volume-preserving) — reference `:66-74`."""
    split = 1 if is_even else 2
    x, ld0 = actnorm_forward(params["actnorm"], x)
    x, ld1 = inv1x1_forward(params["inv1x1"], x)
    x, _ = additive_coupling_forward(params["coupling1"], x, c, split)
    x = reverse_permute(x, _REVERSE3)
    x, ld4 = affine_injector_forward(params["coupling2"], x, c)
    return x, ld0 + ld1 + ld4


def flow_block_inverse(params: dict, z: jax.Array, c: jax.Array,
                       is_even: bool):
    split = 1 if is_even else 2
    z, _ = affine_injector_inverse(params["coupling2"], z, c)
    z = reverse_permute(z, _REVERSE3)
    z, _ = additive_coupling_inverse(params["coupling1"], z, c, split)
    z, _ = inv1x1_inverse(params["inv1x1"], z)
    z, _ = actnorm_inverse(params["actnorm"], z)
    return z


# --------------------------------------------------------------------------
# Full model
# --------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnums=(1,))
def init(key, spec: ModelSpec = ModelSpec()):
    """Initialise (params, state). State holds BatchNorm running stats."""
    keys = jax.random.split(key, 3 * spec.num_blocks + 1)
    interp_p, interp_s = interpolation_init(keys[0], spec.pc_channel)

    feat_p, feat_s, merge_p, flow_p = [], [], [], []
    for i in range(spec.num_blocks):
        fp, fs = feature_extract_init(
            keys[1 + i], FEAT_CHANNELS[i], FEAT_CHANNELS[i + 1],
            GROWTH_WIDTHS[i])
        feat_p.append(fp)
        feat_s.append(fs)
        merge_p.append(feat_merge_init(
            keys[1 + spec.num_blocks + i], FEAT_CHANNELS[i + 1],
            COND_CHANNELS[i]))
        flow_p.append(flow_block_init(
            keys[1 + 2 * spec.num_blocks + i], COND_CHANNELS[i],
            is_even=(i % 2 == 0), idim=spec.pc_channel))

    params = {
        "interp": interp_p,
        "feat_convs": feat_p,
        "merge_convs": merge_p,
        "flow_blocks": flow_p,
    }
    state = {"interp": interp_s, "feat_convs": feat_s}
    return params, state


def feat_extract(params, state, xyz, knn_idx, train: bool, dtype=None):
    """EdgeConv pyramid -> per-block conditions (reference `:292-300`).

    `dtype` (e.g. bfloat16) selects the compute precision of the conv
    pyramid; conditions are emitted in that dtype and the coupling MLPs cast
    their outputs back to float32 before any flow arithmetic.
    """
    folded = "bn" not in params["feat_convs"][0]["convs"][0]
    if (folded and not train
            and use_fused_encoder(xyz.shape[1], knn_idx.shape[-1])):
        # fused single-kernel encoder (inference fast path; ~5x over the
        # XLA formulation — see ops/pallas/encoder_pallas.py)
        from puflow_tpu.ops.pallas.encoder_pallas import (
            encoder_conditions_pallas,
        )

        return encoder_conditions_pallas(params, xyz, knn_idx), \
            state["feat_convs"]
    cs, new_fs = [], []
    c = xyz if dtype is None else xyz.astype(dtype)
    gather_fn = make_neighbor_gather(knn_idx, xyz.shape[1], dtype)
    for fp, fs, mp in zip(params["feat_convs"], state["feat_convs"],
                          params["merge_convs"]):
        c, fs2 = feature_extract_apply(fp, fs, c, knn_idx, train, dtype=dtype,
                                       gather_fn=gather_fn)
        new_fs.append(fs2)
        cs.append(feat_merge_apply(mp, c))
    return cs, new_fs


def f_transform(params, x, cs):
    """Points -> latents with total log|det J| (reference `f`, `:302-313`)."""
    log_det = jnp.zeros((x.shape[0],), dtype=jnp.float32)
    for i, (bp, c) in enumerate(zip(params["flow_blocks"], cs)):
        x, ld = flow_block_forward(bp, x, c, is_even=(i % 2 == 0))
        log_det = log_det + ld
    return x, log_det


def g_transform(params, z, cs, upratio: int, fast: bool = False):
    """Latents [B, N, C, r] -> points [B, N*r, C] (reference `g`, `:315-321`).

    Output rows are point-major (each input point's r samples consecutive),
    matching `repeat_interleave(cond, upratio, dim=1)` in the reference.
    `fast=True` (inference) runs the whole chain as one Pallas kernel
    (`ops/pallas/flow_pallas.py`, slot-major internally with in-kernel
    condition repeat); the kernel has no VJP, so the training path keeps
    the XLA formulation below.
    """
    B, N, C, r = z.shape
    if fast and use_fused_flow_g(N, r):
        from puflow_tpu.ops.pallas.flow_pallas import flow_g_pallas

        # the kernel repeats the conditions internally (slot-major lane
        # tiling) and returns point-major rows
        return flow_g_pallas(params["flow_blocks"], z, cs)
    z = jnp.swapaxes(z, 2, 3).reshape(B, N * r, C)
    for i in reversed(range(len(params["flow_blocks"]))):
        c = jnp.repeat(cs[i], upratio, axis=1)
        z = flow_block_inverse(params["flow_blocks"][i], z, c,
                               is_even=(i % 2 == 0))
    return z


def log_prob(params, x, cs):
    """(z, scalar NLL objective) — reference `log_prob` (`:339-345`)."""
    z, log_det = f_transform(params, x, cs)
    logp = standard_gaussian_logp(z)
    return z, -jnp.mean(logp + log_det)


def forward(params, state, xyz, upratio: int, train: bool = False,
            spec: ModelSpec = ModelSpec(), dtype=None, interp_dtype="same",
            fast_f: bool = False):
    """Full upsampling pass: ``[B, N, 3] -> ([B, N*r, 3], scalar NLL, state')``.

    ``fast_f=True`` (inference only) runs the forward flow as one fused
    Pallas kernel and returns NaN for the NLL (it is not computed).

    Reference `PointInterpFlow.forward` (`:327-337`). `dtype=jnp.bfloat16`
    selects the fast inference path: encoder/coupling nets on the MXU in
    bf16, flow arithmetic and log-dets in float32. `interp_dtype` can pin
    the interpolation module (whose softmax weights decide WHERE new points
    go — the most quality-sensitive stage) to a different precision than
    the condition encoder; "same" follows `dtype`.
    """
    # Fused inference path: the latent interpolation BLEND runs in the
    # g kernel's prologue (channel-major one-hot gather; +0.35 ms vs the
    # 16.5 ms standalone interp_latents launch at 1024 patches) and f
    # hands its latents over in its packed channel-major layout — the
    # interpolated latents never round-trip HBM. The weight head stays a
    # separate kernel: folding it into the encoder ran its ops at
    # Mosaic's degraded large-body rate (+25 ms, see _encoder_kernel).
    N = xyz.shape[1]
    folded = ("bn" not in params["feat_convs"][0]["convs"][0]
              and "bn0" not in params["interp"]["weight_unit"])
    if (fast_f and not train and folded and (8 * N) % 128 == 0
            and use_fused_encoder(N, spec.num_neighbors)
            and use_fused_flow_f(N) and use_fused_flow_g(N, upratio)):
        from puflow_tpu.ops.pallas.encoder_pallas import (
            encoder_conditions_pallas_cm,
            interp_weights_cm_pallas,
        )
        from puflow_tpu.ops.pallas.flow_pallas import (
            _pack_patches,
            flow_f_pallas,
            flow_g_blend_pallas,
        )
        from puflow_tpu.ops.pallas.knn_pallas import (
            knn_self_pallas,
            use_fused_knn,
        )

        if use_fused_knn(N):
            # VMEM-resident kNN (2.1 vs 5.8 ms at 1024x256 patches); near
            # -tie neighbour sets can differ from the XLA path (delta-form
            # distances) — fused-path only, golden-CD gated.
            knn_idx = knn_self_pallas(xyz, spec.num_neighbors)
        else:
            knn_idx = knn_indices(xyz, xyz, spec.num_neighbors)
        idx8 = knn_idx[..., :8]  # K=16 sorted -> first 8 ARE the K=8 graph
        # transposed encoder (round 4): emits conditions directly in the
        # flow kernels' P-packed channel-major layout — 2.0x the row-major
        # kernel (26.2 vs 52.7 ms/1024 patches) and no XLA relayout of
        # the ~637 MB of conditions (scripts/exp_encoder_cm.py)
        cdim_total = sum(mp["conv2"]["w"].shape[1]
                         for mp in params["merge_convs"])
        P = _pack_patches(xyz.shape[0], N, cdim_total)
        cs = encoder_conditions_pallas_cm(params, xyz, knn_idx, P)
        ws = interp_weights_cm_pallas(params["interp"], xyz, idx8, upratio)
        z_cm = flow_f_pallas(params["flow_blocks"], xyz, cs, emit_cm=True,
                             cs_cm=True)
        x = flow_g_blend_pallas(params["flow_blocks"], z_cm, ws, idx8, cs,
                                cs_cm=True)
        return x, jnp.float32(jnp.nan), state

    knn_idx = knn_indices(xyz, xyz, spec.num_neighbors)
    cs, feat_s = feat_extract(params, state, xyz, knn_idx, train, dtype=dtype)
    if fast_f and not train and use_fused_flow_f(xyz.shape[1]):
        # fused forward flow (inference): z only — the log-density is NOT
        # computed (sample() discards it). Callers needing the NLL
        # (trainer validation) keep fast_f=False.
        from puflow_tpu.ops.pallas.flow_pallas import flow_f_pallas

        z = flow_f_pallas(params["flow_blocks"], xyz, cs)
        logp_x = jnp.float32(jnp.nan)
    else:
        z, logp_x = log_prob(params, xyz, cs)
    fz, interp_s = interpolation_apply(
        params["interp"], state["interp"], z, xyz, upratio, train,
        dtype=dtype if interp_dtype == "same" else interp_dtype,
        knn_idx=knn_idx)  # K=16 sorted -> first 8 cols ARE the K=8 graph
    x = g_transform(params, fz, cs, upratio, fast=not train)
    new_state = {"interp": interp_s, "feat_convs": feat_s}
    return x, logp_x, new_state


def sample(params, state, sparse, upratio: int = 4,
           spec: ModelSpec = ModelSpec(), dtype=None, interp_dtype="same"):
    """Inference entry: dense cloud only (reference `sample`, `:347-350`)."""
    dense, _, _ = forward(params, state, sparse, upratio, train=False,
                          spec=spec, dtype=dtype, interp_dtype=interp_dtype,
                          fast_f=True)
    return dense


def actnorm_warmup(params, state, xyz, spec: ModelSpec = ModelSpec()):
    """Data-dependent ActNorm init from one representative batch.

    Walks the blocks sequentially (each ActNorm sees the activations produced
    by the already-initialised earlier blocks), replicating the reference's
    first-forward initialisation (`modules/flows/normalize.py:30-32`).
    Pure: returns updated params. Run once, outside jit, before training.
    """
    knn_idx = knn_indices(xyz, xyz, spec.num_neighbors)
    cs, _ = feat_extract(params, state, xyz, knn_idx, train=False)
    new_blocks = []
    x = xyz
    for i, (bp, c) in enumerate(zip(params["flow_blocks"], cs)):
        bp = dict(bp, actnorm=actnorm_init_from_data(x))
        x, _ = flow_block_forward(bp, x, c, is_even=(i % 2 == 0))
        new_blocks.append(bp)
    return dict(params, flow_blocks=new_blocks)
