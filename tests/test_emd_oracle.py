"""EMD auction vs a numpy transliteration of the reference CUDA kernel.

`cuda_auction_oracle` below transliterates the per-iteration semantics of
`metric/emd/emd_cuda.cu` — `Bid` (:95-179), `GetMax` (:180-193, incl. the
±1e-6 tie window at :188), `Assign` (:195-214, incl. displacement of the
previous owner and the last-iteration force-assign) and the iteration loop
(:256-268) — with one deliberate determinization: `GetMax` resolves ties by
a data race (last CUDA writer wins); the oracle and `ops/emd.emd_auction`
both pick the LOWEST bidder index among qualifiers.

Two layers of checks:
  1. algorithm parity — the oracle consumes the exact value matrix the JAX
     implementation uses, so assignments must be EXACTLY equal (tie window,
     displacement, price updates, last-iteration semantics).
  2. fp-formula sensitivity — the CUDA kernel computes distances from
     coordinate differences (`emd_cuda.cu:141-146`) while the dense TPU
     formulation uses the |x|^2+|y|^2-2xy expansion; rerunning the oracle on
     the direct-difference matrix bounds how much that rounding difference
     can move the result (assignment agreement + matched cost).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puflow_tpu.ops.emd import auction_from_value, emd_auction


def base_value_expansion(x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    """The value matrix exactly as `ops/emd._auction_one` builds it (f32)."""
    a, b = jnp.asarray(x1), jnp.asarray(x2)
    d = jnp.sqrt(jnp.maximum(
        jnp.sum(a * a, axis=-1, keepdims=True)
        + jnp.sum(b * b, axis=-1)[None, :]
        - 2.0 * jnp.einsum("nc,mc->nm", a, b,
                           preferred_element_type=jnp.float32),
        0.0))
    return np.asarray(3.0 - d, dtype=np.float32)


def base_value_direct(x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    """The value matrix as the CUDA `Bid` kernel computes it (:141-146)."""
    diff = x1[:, None, :].astype(np.float32) - x2[None, :, :].astype(
        np.float32)
    d = np.sqrt((diff * diff).sum(-1).astype(np.float32))
    return (np.float32(3.0) - d).astype(np.float32)


def cuda_auction_oracle(base_value: np.ndarray, eps: float, iters: int):
    """numpy transliteration of the emd_cuda.cu auction loop (:256-268)."""
    n, m = base_value.shape
    eps = np.float32(eps)
    assignment = np.full(n, -1, dtype=np.int64)
    assignment_inv = np.full(m, -1, dtype=np.int64)
    price = np.zeros(m, dtype=np.float32)

    for it in range(iters):
        last = it == iters - 1
        unass = np.nonzero(assignment == -1)[0]
        if unass.size == 0:
            break  # all CUDA kernels no-op once everything is assigned

        # Bid: best/second-best value over targets; lowest j wins strict
        # ties (the CUDA scan order is ascending in k, `:147-157`)
        v = (base_value[unass] - price[None, :]).astype(np.float32)
        bid = np.argmax(v, axis=1)
        rows = np.arange(unass.size)
        best = v[rows, bid]
        v2 = v.copy()
        v2[rows, bid] = -np.inf
        second = v2.max(axis=1)
        bid_inc = (best - second + eps).astype(np.float32)

        # atomicMax over per-target increments (`:176`)
        max_inc = np.full(m, -1e9, dtype=np.float32)
        np.maximum.at(max_inc, bid, bid_inc)

        # GetMax: qualifiers within the +-1e-6 window (`:188`); the CUDA
        # result is whichever qualifier wrote last — determinized to the
        # lowest bidder index (same choice as ops/emd.emd_auction)
        qual = np.abs(bid_inc - max_inc[bid]) <= 1e-6
        max_idx = np.full(m, n, dtype=np.int64)
        for r in range(unass.size):
            if qual[r] and unass[r] < max_idx[bid[r]]:
                max_idx[bid[r]] = unass[r]

        # Assign (`:195-214`)
        for r in range(unass.size):
            j, b = unass[r], bid[r]
            if last or max_idx[b] == j:
                old = assignment_inv[b]
                if not last and old != -1:
                    assignment[old] = -1
                assignment_inv[b] = j
                assignment[j] = b
                price[b] = np.float32(price[b] + bid_inc[r])

    return assignment


@pytest.mark.parametrize("n,iters", [(256, 50), (1024, 50), (512, 7)])
def test_auction_matches_cuda_oracle_exactly(n, iters):
    """Same value matrix -> bit-identical auction trajectory.

    Both sides consume ONE numpy-materialized value matrix so the check
    pins the auction LOGIC (tie window, displacement, price updates,
    last-iteration force-assign) exactly on any host; the value-matrix
    construction itself is fp-fusion-dependent and covered separately by
    `test_end_to_end_agrees_with_oracle` (the auction is chaotic on
    near-ties, so ULP drift in the matrix legitimately flips ~1% of
    matches without moving the cost)."""
    rng = np.random.RandomState(n + iters)
    x1 = rng.rand(n, 3).astype(np.float32)  # clouds normalized to [0,1]
    x2 = rng.rand(n, 3).astype(np.float32)
    base_value = base_value_expansion(x1, x2)

    ours = np.asarray(jax.jit(
        lambda v: auction_from_value(v, 0.005, iters)
    )(jnp.asarray(base_value)))

    oracle = cuda_auction_oracle(base_value, 0.005, iters)
    np.testing.assert_array_equal(ours, oracle)


@pytest.mark.parametrize("n,iters", [(256, 50), (1024, 50)])
def test_end_to_end_agrees_with_oracle(n, iters):
    """Full `emd_auction` (value matrix built inside jit) vs the oracle:
    near-tie flips from fusion-order ULP drift are bounded and the matched
    transport cost is invariant; `dist` follows CalcDist exactly."""
    rng = np.random.RandomState(n + iters)
    x1 = rng.rand(n, 3).astype(np.float32)
    x2 = rng.rand(n, 3).astype(np.float32)

    dist, assignment = jax.jit(
        lambda a, b: emd_auction(a, b, 0.005, iters)
    )(jnp.asarray(x1[None]), jnp.asarray(x2[None]))
    ours = np.asarray(assignment[0])
    oracle = cuda_auction_oracle(base_value_expansion(x1, x2), 0.005, iters)

    agree = (ours == oracle).mean()
    assert agree > 0.95, agree
    cost_ours = ((x1 - x2[ours]) ** 2).sum(-1).sum()
    cost_oracle = ((x1 - x2[oracle]) ** 2).sum(-1).sum()
    assert abs(cost_ours - cost_oracle) / cost_oracle < 1e-2

    # distances follow CalcDist (`:216-226`): squared distance to the
    # matched point of OUR assignment
    expect_dist = ((x1 - x2[ours]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dist[0]), expect_dist, rtol=1e-5)


def test_distance_formula_sensitivity_is_negligible():
    """CUDA's direct-difference distances vs the TPU expansion: a ~5e-6
    value perturbation flips ~1% of matches on near-ties (the auction is
    chaotic there) but moves the matched transport cost only ~0.1%."""
    rng = np.random.RandomState(0)
    n = 512
    x1 = rng.rand(n, 3).astype(np.float32)
    x2 = rng.rand(n, 3).astype(np.float32)

    a_exp = cuda_auction_oracle(base_value_expansion(x1, x2), 0.005, 50)
    a_dir = cuda_auction_oracle(base_value_direct(x1, x2), 0.005, 50)

    agree = (a_exp == a_dir).mean()
    assert agree > 0.95, agree
    cost_exp = ((x1 - x2[a_exp]) ** 2).sum(-1).sum()
    cost_dir = ((x1 - x2[a_dir]) ** 2).sum(-1).sum()
    assert abs(cost_exp - cost_dir) / cost_dir < 1e-2, (cost_exp, cost_dir)
