"""Channel permutations: invertible 1x1 convolution and fixed index shuffles.

Parity targets: reference `modules/flows/permutate.py` — `InvertibleConv1x1_1D`
(`:97-126`, QR-orthogonal init, slogdet logdet, explicit inverse on the
reverse pass) and `_ShufflePermutation*` (`:38-94`, reverse/random index
buffers with no logdet).

Shuffle indices are *static python tuples* held in the model spec rather than
arrays in the parameter pytree: they are non-trainable integers, and keeping
them static lets XLA turn the gather into a free layout change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def inv1x1_init(key: jax.Array, channel: int) -> dict:
    """Random-orthogonal (QR) weight, like reference `permutate.py:102-105`."""
    w = jax.random.normal(key, (channel, channel), dtype=jnp.float32)
    q, _ = jnp.linalg.qr(w)
    return {"W": q}


def inv1x1_forward(params: dict, x: jax.Array):
    """x: [B, N, C] -> (x @ W^T, slogdet(W) * N)."""
    w = params["W"]
    z = jnp.einsum("ij,bnj->bni", w, x)
    logdet = jnp.linalg.slogdet(w)[1] * x.shape[1]
    return z, logdet


def inv1x1_inverse(params: dict, z: jax.Array):
    w = params["W"]
    w_inv = jnp.linalg.inv(w)
    x = jnp.einsum("ij,bnj->bni", w_inv, z)
    logdet = -jnp.linalg.slogdet(w)[1] * z.shape[1]
    return x, logdet


def reverse_indices(channel: int) -> tuple:
    """The reference's 'reverse' permutation: [C-1, ..., 0]."""
    return tuple(range(channel - 1, -1, -1))


def random_indices(seed: int, channel: int) -> tuple:
    """The reference's 'random' permutation (`permutate.py:46-49`):
    a seeded shuffle, held statically in the model spec."""
    import numpy as _np

    idx = _np.arange(channel - 1, -1, -1)
    _np.random.RandomState(seed).shuffle(idx)
    return tuple(int(i) for i in idx)


def invert_indices(idx) -> tuple:
    """Inverse of a permutation given as a sequence of ints."""
    out = np.zeros(len(idx), dtype=np.int64)
    for i, j in enumerate(idx):
        out[j] = i
    return tuple(int(v) for v in out)


def reverse_permute(x: jax.Array, idx: tuple) -> jax.Array:
    """Apply a static channel permutation on the last axis."""
    return x[..., list(idx)]
