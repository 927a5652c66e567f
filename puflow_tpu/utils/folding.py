"""Minimal trainable FoldingNet for folding-based point-order permutation.

Parity target: the reference's folding permutation mode
(`modules/utils/permute.py:132-151,230-232,245-246`) loads a pre-trained
torch folding net from disk (`torch.load(foldingnet_path)`) and uses it
only as a black-box `pts [B, N, C] -> reference pts [B, C, N2]` generator
whose output ORDER is canonical. The net itself ships with neither the
repo nor a training script, so this module provides the TPU-native
equivalent: a small FoldingNet-style decoder (PointNet max-pool global
feature + 2-layer fold of a fixed 2-D grid) plus a chamfer-fit trainer —
enough to make the folding permutation mode fully functional.

The fold decodes a FIXED 2-D grid, so its output order is deterministic
(grid raster order) regardless of the input cloud's point order — the
property the permutation scheme relies on.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from puflow_tpu.ops.chamfer import chamfer_distance

GRID_SIDE = 16  # n_ref = GRID_SIDE^2 reference points
FEAT_DIM = 64
HIDDEN = 64


def _linear_init(key, din, dout):
    b = (1.0 / din) ** 0.5
    return {"w": jax.random.uniform(key, (din, dout), minval=-b, maxval=b),
            "b": jnp.zeros((dout,))}


def _mlp(params, x):
    for i, p in enumerate(params):
        x = x @ p["w"] + p["b"]
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def folding_net_init(key, pc_channel: int = 3):
    k = jax.random.split(key, 8)
    return {
        # per-point encoder -> max-pool global feature
        "enc": [_linear_init(k[0], pc_channel, HIDDEN),
                _linear_init(k[1], HIDDEN, FEAT_DIM)],
        # fold 1: [grid(2) + feat] -> 3
        "fold1": [_linear_init(k[2], 2 + FEAT_DIM, HIDDEN),
                  _linear_init(k[3], HIDDEN, pc_channel)],
        # fold 2: [fold1(3) + feat] -> 3
        "fold2": [_linear_init(k[4], pc_channel + FEAT_DIM, HIDDEN),
                  _linear_init(k[5], HIDDEN, pc_channel)],
    }


def _grid(n_side: int = GRID_SIDE):
    ax = jnp.linspace(-1.0, 1.0, n_side)
    gx, gy = jnp.meshgrid(ax, ax, indexing="ij")
    return jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # [n_side^2, 2]


def folding_net_apply(params, pts):
    """pts [B, N, C] -> reference points [B, n_ref, C] in canonical
    (grid-raster) order."""
    feat = jnp.max(_mlp(params["enc"], pts), axis=1)          # [B, F]
    grid = _grid()                                            # [G, 2]
    G = grid.shape[0]
    feat_rep = jnp.repeat(feat[:, None, :], G, axis=1)        # [B, G, F]
    grid_rep = jnp.broadcast_to(grid[None], (pts.shape[0], G, 2))
    y = _mlp(params["fold1"], jnp.concatenate([grid_rep, feat_rep], -1))
    y = _mlp(params["fold2"], jnp.concatenate([y, feat_rep], -1))
    return y


def train_folding_net(key, clouds, steps: int = 200, lr: float = 1e-3):
    """Fit the folding net to reconstruct `clouds` [B, N, C] by chamfer
    distance (plain SGD+momentum; this is a dataset-prep utility, not a
    training-loop showcase). Returns trained params."""
    params = folding_net_init(key)

    def loss_fn(p, x):
        return chamfer_distance(folding_net_apply(p, x), x)

    momentum = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def step(p, m, x):
        loss, g = jax.value_and_grad(loss_fn)(p, x)
        m = jax.tree.map(lambda mi, gi: 0.9 * mi + gi, m, g)
        p = jax.tree.map(lambda pi, mi: pi - lr * mi, p, m)
        return p, m, loss

    loss = jnp.inf
    for _ in range(steps):
        params, momentum, loss = step(params, momentum, clouds)
    return params, float(loss)


def sample_grid_count() -> int:
    return GRID_SIDE * GRID_SIDE


def count_parameters(params) -> int:
    return sum(int(math.prod(p.shape)) for p in jax.tree.leaves(params))
