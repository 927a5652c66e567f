"""Fold eval-mode BatchNorm into the preceding 1x1 convs for inference.

Eval BN is a per-channel affine ``y = (x - mean) * scale / sqrt(var + eps)
+ bias``; composed with the preceding linear layer it is exactly another
linear layer:

    w' = w * g,   b' = (b - mean) * g + bias,   g = scale / sqrt(var + eps)

Folding removes two full elementwise passes per conv over the largest
activations in the network — pure win for the inference path (training keeps
live BN statistics and the unfolded parameters).

Apply functions detect folded layers by the ABSENCE of the ``bn`` /
``bn0``/``bn1`` keys (a static pytree-structure property, so jit caches the
folded and unfolded programs separately).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from puflow_tpu.models.nn import BN_EPS


def _gain(bn_p, bn_s):
    return bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + BN_EPS)


def _fold_linear(lin, bn_p, bn_s):
    g = _gain(bn_p, bn_s)
    out = {"w": lin["w"] * g[None, :]}
    b = lin.get("b", 0.0)
    out["b"] = (b - bn_s["mean"]) * g + bn_p["bias"]
    return out


def _fold_feature_extract(p, s):
    convs = [
        {"lin": _fold_linear(conv["lin"], conv["bn"], bn_s)}
        for conv, bn_s in zip(p["convs"], s["convs"])
    ]
    return {"convs": convs, "conv_out": p["conv_out"]}


def _fold_mlp3(p, s):
    return {
        "lin0": _fold_linear(p["lin0"], p["bn0"], s["bn0"]),
        "lin1": _fold_linear(p["lin1"], p["bn1"], s["bn1"]),
        "lin2": p["lin2"],
    }


def fold_bn_inference(params: dict, state: dict) -> dict:
    """(params, bn_state) -> folded params for eval-mode inference.

    Works for both model families (they share the encoder trees). Run once
    after loading a checkpoint; pass the result wherever `params` goes with
    `train=False`. BN state is no longer needed by the folded forward (any
    pytree with the right top-level keys may be passed).
    """
    interp_p, interp_s = params["interp"], state["interp"]
    folded_interp = {
        "knn_context": {
            "distance_encoder": _fold_mlp3(
                interp_p["knn_context"]["distance_encoder"],
                interp_s["knn_context"]["distance_encoder"]),
            "feat_conv": _fold_feature_extract(
                interp_p["knn_context"]["feat_conv"],
                interp_s["knn_context"]["feat_conv"]),
        },
        "weight_unit": _fold_mlp3(interp_p["weight_unit"],
                                  interp_s["weight_unit"]),
    }
    folded_feat = [
        _fold_feature_extract(fp, fs)
        for fp, fs in zip(params["feat_convs"], state["feat_convs"])
    ]
    return {
        "interp": folded_interp,
        "feat_convs": folded_feat,
        "merge_convs": params["merge_convs"],
        "flow_blocks": params["flow_blocks"],
    }


def empty_bn_state(state: dict):
    """A structurally-compatible state tree for folded params (the BN
    branches are never read, but the apply signatures still take a state)."""
    return jax.tree.map(lambda x: jnp.zeros((0,)), state)
