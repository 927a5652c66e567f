"""Geometry-context encoders for the interpolation flow.

Parity targets (reference `modules/discrete/interpflow.py`):
  * `FeatureExtractUnit` `:190-248` — densely-connected EdgeConv stack
    (LeakyReLU slope 0.05) with optional K-axis max pooling.
  * `DistanceEncoder`    `:85-120`  — per-neighbour distance features
    [pt, neighbour, pt - neighbour, |pt - neighbour|] through a BN-MLP.
  * `KnnContextEncoder`  `:123-134` — concat of the two, 256 channels.
  * `WeightEstimationUnit` `:137-159` — r_max=32 interpolation logit head.
  * `InterpolationModule` `:162-186` — softmax latent blending over k=8
    neighbours per upsampling row.
  * `FeatMergeUnit` `:251-258` — 2-layer bottleneck producing flow conditions.

All appliers are pure: ``apply(params, state, ..., train) -> (out, state')``.
Layout is channel-last; every conv is a channel matmul (see models/nn.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from puflow_tpu.models.nn import (bn_apply, bn_init, channel_matmul,
                                  linear_apply, linear_init)
from puflow_tpu.ops.knn import (gather_points, knn_indices,
                                make_neighbor_gather)

_FEU_SLOPE = 0.05   # FeatureExtractUnit LeakyReLU slope (reference :206,:217)
_MLP_SLOPE = 0.01   # torch default slope (DistanceEncoder / WeightEstimation)

INTERP_K = 8        # neighbours blended per new point (reference :167)
R_MAX = 32          # max supported upratio (reference :142)


# --------------------------------------------------------------------------
# FeatureExtractUnit: densely-connected EdgeConv
# --------------------------------------------------------------------------
def feature_extract_init(key, idim: int, odim: int, growth_width: int):
    assert odim % growth_width == 0
    num_conv = odim // growth_width
    edim = idim * 3
    keys = jax.random.split(key, num_conv + 1)

    convs, bn_states = [], []
    in_ch = edim
    for i in range(num_conv):
        w = linear_init(keys[i], in_ch, growth_width)
        bn_p, bn_s = bn_init(growth_width)
        convs.append({"lin": w, "bn": bn_p})
        bn_states.append(bn_s)
        in_ch = edim + growth_width * (i + 1)

    params = {
        "convs": convs,
        "conv_out": linear_init(keys[-1], in_ch, odim),
    }
    state = {"convs": bn_states}
    return params, state


def derive_edge_feat(x: jax.Array, knn_idx: jax.Array) -> jax.Array:
    """x: [B, N, C], knn_idx: [B, N, K] -> [B, N, K, 3C].

    Feature order matches reference `derive_edge_feat` (`:223-232`):
    [x_tiled, knn_feat, knn_feat - x_tiled].
    """
    knn_feat = gather_points(x, knn_idx)                  # [B, N, K, C]
    x_tiled = jnp.broadcast_to(x[:, :, None, :], knn_feat.shape)
    return jnp.concatenate([x_tiled, knn_feat, knn_feat - x_tiled], axis=-1)


def feature_extract_apply(params, state, x, knn_idx, train: bool,
                          pooling: bool = True, dtype=None, gather_fn=None):
    """x: [B, N, C] -> pooled [B, N, odim] or per-slot [B, N, K, odim].

    `dtype` selects the compute precision of the conv stack (bf16 = fast MXU
    path for inference); statistics and pooling semantics are unaffected.

    Every layer's edge-feature contribution factorises onto the block input
    (see `_edge_linear`), and all layers' neighbour projections depend ONLY
    on x — so the whole stack performs a SINGLE fused neighbour gather per
    block: P = x @ [W_nbr_0 | ... | W_nbr_L] is gathered once and sliced
    per layer. One gather per block (instead of one per conv) cuts the
    dominant HBM term — re-reading the one-hot gather matrix — by 5x.
    """
    nbr_gather = gather_fn or make_neighbor_gather(knn_idx, x.shape[1],
                                                   dtype)
    C = x.shape[-1]
    dt = dtype or x.dtype
    xc = x.astype(dt)

    layers = list(params["convs"]) + [{"lin": params["conv_out"]}]
    w_selfs, w_nbrs, widths = [], [], []
    for layer in layers:
        w = layer["lin"]["w"].astype(dt)
        w_selfs.append(w[:C] - w[2 * C:3 * C])
        w_nbrs.append(w[C:2 * C] + w[2 * C:3 * C])
        widths.append(w.shape[1])
    p_self = channel_matmul(xc, jnp.concatenate(w_selfs, axis=1))
    p_nbr_all = nbr_gather(channel_matmul(xc, jnp.concatenate(w_nbrs,
                                                              axis=1)))
    offsets = [0]
    for g in widths:
        offsets.append(offsets[-1] + g)

    def edge_term(i):
        lo, hi = offsets[i], offsets[i + 1]
        return (p_self[:, :, None, lo:hi].astype(dt)
                + p_nbr_all[..., lo:hi].astype(dt))

    h_cat = None
    new_bn = []
    for i, (conv_p, bn_s) in enumerate(zip(params["convs"],
                                           state["convs"])):
        h = edge_term(i)
        if h_cat is not None:
            h = h + channel_matmul(h_cat, conv_p["lin"]["w"][3 * C:])
        if "b" in conv_p["lin"]:
            h = h + conv_p["lin"]["b"].astype(dt)
        if "bn" in conv_p:  # absent once folded (models/fold_bn.py)
            h, bn_s2 = bn_apply(conv_p["bn"], bn_s, h, train)
        else:
            bn_s2 = bn_s
        h = jax.nn.leaky_relu(h, _FEU_SLOPE)
        new_bn.append(bn_s2)
        h_cat = h if h_cat is None else jnp.concatenate([h_cat, h], axis=-1)

    f = edge_term(len(layers) - 1)
    f = f + channel_matmul(h_cat, params["conv_out"]["w"][3 * C:].astype(dt))
    if "b" in params["conv_out"]:
        f = f + params["conv_out"]["b"].astype(dt)        # [B, N, K, odim]
    if pooling:
        f = jnp.max(f, axis=2)                            # [B, N, odim]
    return f, {"convs": new_bn}


# --------------------------------------------------------------------------
# DistanceEncoder
# --------------------------------------------------------------------------
def distance_encoder_init(key, dim_in: int = 3, dim_out: int = 128):
    k0, k1, k2 = jax.random.split(key, 3)
    c_in = dim_in * 3 + 1
    bn0_p, bn0_s = bn_init(64)
    bn1_p, bn1_s = bn_init(64)
    params = {
        "lin0": linear_init(k0, c_in, 64), "bn0": bn0_p,
        "lin1": linear_init(k1, 64, 64), "bn1": bn1_p,
        "lin2": linear_init(k2, 64, dim_out),
    }
    state = {"bn0": bn0_s, "bn1": bn1_s}
    return params, state


def distance_feat(xyz: jax.Array, knn_idx: jax.Array) -> jax.Array:
    """[pt, neighbour, pt - neighbour, |pt - neighbour|] per slot.

    Matches reference `distance_vec` (`:100-115`): note the vector is
    point-minus-neighbour (opposite sign to FeatureExtractUnit's edge feat).
    """
    neighbours = gather_points(xyz, knn_idx)               # [B, N, k, 3]
    pt = jnp.broadcast_to(xyz[:, :, None, :], neighbours.shape)
    vec = pt - neighbours
    dist = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True))
    return jnp.concatenate([pt, neighbours, vec, dist], axis=-1)


def distance_encoder_apply(params, state, xyz, knn_idx, train: bool,
                           dtype=None, gather_fn=None):
    if gather_fn is not None:
        neighbours = gather_fn(xyz).astype(xyz.dtype)      # [B, N, k, 3]
        pt = jnp.broadcast_to(xyz[:, :, None, :], neighbours.shape)
        vec = pt - neighbours
        dist = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True))
        f = jnp.concatenate([pt, neighbours, vec, dist], axis=-1)
    else:
        f = distance_feat(xyz, knn_idx)                    # [B, N, k, 10]
    if dtype is not None:
        f = f.astype(dtype)
    h = linear_apply(params["lin0"], f)
    if "bn0" in params:  # absent once folded (models/fold_bn.py)
        h, bn0 = bn_apply(params["bn0"], state["bn0"], h, train)
    else:
        bn0 = state["bn0"]
    h = jax.nn.leaky_relu(h, _MLP_SLOPE)
    h = linear_apply(params["lin1"], h)
    if "bn1" in params:
        h, bn1 = bn_apply(params["bn1"], state["bn1"], h, train)
    else:
        bn1 = state["bn1"]
    h = jax.nn.leaky_relu(h, _MLP_SLOPE)
    h = linear_apply(params["lin2"], h)                    # [B, N, k, dim_out]
    return h, {"bn0": bn0, "bn1": bn1}


# --------------------------------------------------------------------------
# KnnContextEncoder + WeightEstimationUnit + InterpolationModule
# --------------------------------------------------------------------------
def knn_context_init(key, pc_channel: int = 3):
    k0, k1 = jax.random.split(key)
    de_p, de_s = distance_encoder_init(k0, pc_channel, 128)
    fe_p, fe_s = feature_extract_init(k1, pc_channel, 128, growth_width=16)
    return (
        {"distance_encoder": de_p, "feat_conv": fe_p},
        {"distance_encoder": de_s, "feat_conv": fe_s},
    )


def knn_context_apply(params, state, xyz, knn_idx, train: bool, dtype=None,
                      gather_fn=None):
    """xyz: [B, N, 3]; knn_idx: [B, N, k]. Returns [B, N, k, 256]."""
    if gather_fn is None:
        gather_fn = make_neighbor_gather(knn_idx, xyz.shape[1], dtype)
    dist, de_s = distance_encoder_apply(
        params["distance_encoder"], state["distance_encoder"], xyz, knn_idx,
        train, dtype=dtype, gather_fn=gather_fn)
    feat, fe_s = feature_extract_apply(
        params["feat_conv"], state["feat_conv"], xyz, knn_idx, train,
        pooling=False, dtype=dtype, gather_fn=gather_fn)
    ctx = jnp.concatenate([dist, feat], axis=-1)
    return ctx, {"distance_encoder": de_s, "feat_conv": fe_s}


def weight_unit_init(key, feat_dim: int = 256):
    k0, k1, k2 = jax.random.split(key, 3)
    bn0_p, bn0_s = bn_init(128)
    bn1_p, bn1_s = bn_init(64)
    params = {
        "lin0": linear_init(k0, feat_dim, 128), "bn0": bn0_p,
        "lin1": linear_init(k1, 128, 64), "bn1": bn1_p,
        "lin2": linear_init(k2, 64, R_MAX),
    }
    state = {"bn0": bn0_s, "bn1": bn1_s}
    return params, state


def weight_unit_apply(params, state, context, train: bool):
    """context: [B, N, k, C] -> logits [B, N, k, R_MAX].

    Runs in the compute dtype `context` arrives in (bf16 on the fast path).
    """
    h = linear_apply(params["lin0"], context)
    if "bn0" in params:  # absent once folded (models/fold_bn.py)
        h, bn0 = bn_apply(params["bn0"], state["bn0"], h, train)
    else:
        bn0 = state["bn0"]
    h = jax.nn.leaky_relu(h, _MLP_SLOPE)
    h = linear_apply(params["lin1"], h)
    if "bn1" in params:
        h, bn1 = bn_apply(params["bn1"], state["bn1"], h, train)
    else:
        bn1 = state["bn1"]
    h = jax.nn.leaky_relu(h, _MLP_SLOPE)
    h = linear_apply(params["lin2"], h)
    return h, {"bn0": bn0, "bn1": bn1}


def interpolation_init(key, pc_channel: int = 3):
    k0, k1 = jax.random.split(key)
    kc_p, kc_s = knn_context_init(k0, pc_channel)
    wu_p, wu_s = weight_unit_init(k1, 256)
    return (
        {"knn_context": kc_p, "weight_unit": wu_p},
        {"knn_context": kc_s, "weight_unit": wu_s},
    )


def interpolation_apply(params, state, z, xyz, upratio: int, train: bool,
                        dtype=None, knn_idx=None):
    """Blend each point's k-NN latents into `upratio` new latents.

    z: [B, N, C] latents; xyz: [B, N, 3] input geometry (defines the graph).
    Returns [B, N, C, upratio] — reference `InterpolationModule.forward`
    (`:173-186`).

    `knn_idx` may supply a precomputed neighbour list with K >= INTERP_K
    whose slots are sorted by ascending distance (our `knn_indices`
    convention): its first INTERP_K columns are then exactly the K=8 graph,
    so the caller's K=16 encoder graph is reused instead of recomputing the
    pairwise distances + top-k.
    """
    if not 1 <= upratio <= R_MAX:
        raise ValueError(
            f"upratio={upratio} out of range [1, {R_MAX}]: the weight head "
            f"emits at most R_MAX={R_MAX} interpolation rows per point")
    if knn_idx is None:
        knn_idx = knn_indices(xyz, xyz, INTERP_K)
    else:
        assert knn_idx.shape[-1] >= INTERP_K
        knn_idx = knn_idx[..., :INTERP_K]
    folded = "bn0" not in params["weight_unit"]
    if (folded and not train and jax.default_backend() not in ("cpu",)
            and xyz.shape[1] * INTERP_K <= 8192):
        # fully-fused fast path: weight head + softmax + latent blend in
        # one kernel (ops/pallas/encoder_pallas.interp_latents_pallas) —
        # neither the one-hot gather matrix nor the logits touch HBM
        from puflow_tpu.ops.pallas.encoder_pallas import (
            interp_latents_pallas,
        )

        interp = interp_latents_pallas(params, xyz, knn_idx,
                                       z.astype(jnp.float32), upratio)
        return interp, {"knn_context": state["knn_context"],
                        "weight_unit": state["weight_unit"]}
    gather_fn = make_neighbor_gather(knn_idx, xyz.shape[1], dtype)
    ctx, kc_s = knn_context_apply(
        params["knn_context"], state["knn_context"], xyz, knn_idx, train,
        dtype=dtype, gather_fn=gather_fn)
    logits, wu_s = weight_unit_apply(
        params["weight_unit"], state["weight_unit"], ctx, train)
    logits = logits[..., :upratio].astype(jnp.float32)    # [B, N, k, r]
    weights = jax.nn.softmax(logits, axis=2)              # softmax over k
    nei = gather_fn(z).astype(jnp.float32)                # [B, N, k, C]
    interp = jnp.einsum("bnkc,bnkr->bncr", nei, weights)
    return interp, {"knn_context": kc_s, "weight_unit": wu_s}


# --------------------------------------------------------------------------
# FeatMergeUnit
# --------------------------------------------------------------------------
def feat_merge_init(key, idim: int, odim: int):
    k0, k1 = jax.random.split(key)
    return {
        "conv1": linear_init(k0, idim, idim // 2),
        "conv2": linear_init(k1, idim // 2, odim, bias=False),
    }


def feat_merge_apply(params, x: jax.Array) -> jax.Array:
    return linear_apply(params["conv2"],
                        jax.nn.relu(linear_apply(params["conv1"], x)))
