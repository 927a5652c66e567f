"""Decompose the CNF training step cost (VERDICT r4 item 4 follow-up).

Times value_and_grad of partial losses at the reference config (B=32,
256 -> 1024): full joint loss, NLL-only (f-path solves), EMD-only (g-path
solves), forward-only (no grad). Differences isolate where the step's
milliseconds live after the fused forward/backward solve kernels.

Usage: python scripts/exp_cnf_step_profile.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.data.synthetic import synthetic_pairs
from puflow_tpu.models import continuous
from puflow_tpu.ops.emd import emd_loss


def timed(fn, *args):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    iters = 5
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        np.asarray(jax.tree.leaves(outs[-1])[0])
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    params, state = continuous.init(jax.random.PRNGKey(0))
    sp, de = synthetic_pairs(np.random.RandomState(0), 32, 256, 4)
    sp, de = jnp.asarray(sp), jnp.asarray(de)

    def full_loss(p):
        dense, logpx, _ = continuous.forward(p, state, sp, 4, train=True)
        return logpx * 1e-4 + emd_loss(dense, de) * 5e-2

    def nll_loss(p):
        _, logpx, _ = continuous.forward(p, state, sp, 4, train=True)
        return logpx * 1e-4

    def emd_only(p):
        dense, _, _ = continuous.forward(p, state, sp, 4, train=True)
        return emd_loss(dense, de) * 5e-2

    fwd = jax.jit(lambda p: full_loss(p))
    g_full = jax.jit(jax.value_and_grad(full_loss))
    g_nll = jax.jit(jax.value_and_grad(nll_loss))
    g_emd = jax.jit(jax.value_and_grad(emd_only))

    # finer rows: encoder-only and f-solves-only (conditions constant)
    from puflow_tpu.models.continuous import flow_block_forward
    from puflow_tpu.models.discrete import feat_extract
    from puflow_tpu.ops.knn import knn_indices

    knn_idx = knn_indices(sp, sp, 16)

    def enc_loss(p):
        cs, _ = feat_extract(p, state, sp, knn_idx, train=True)
        return sum(jnp.sum(c) for c in cs)

    cs_const, _ = jax.jit(
        lambda p: feat_extract(p, state, sp, knn_idx, train=True))(params)
    cs_const = jax.tree.map(jax.lax.stop_gradient, cs_const)

    def fblocks_loss(p):
        x, total = sp, 0.0
        for blk, c in zip(p["flow_blocks"], cs_const):
            x, logp = flow_block_forward(blk, x, c, differentiable=True)
            total = total + jnp.sum(logp)
        return total + jnp.sum(x ** 2)

    g_enc = jax.jit(jax.value_and_grad(enc_loss))
    g_fb = jax.jit(jax.value_and_grad(fblocks_loss))

    print(f"forward only       : {timed(fwd, params):8.1f} ms", flush=True)
    print(f"grad encoder only  : {timed(g_enc, params):8.1f} ms", flush=True)
    print(f"grad f-blocks only : {timed(g_fb, params):8.1f} ms", flush=True)
    print(f"grad NLL (f-path)  : {timed(g_nll, params):8.1f} ms", flush=True)
    print(f"grad EMD (g-path)  : {timed(g_emd, params):8.1f} ms", flush=True)
    print(f"grad full joint    : {timed(g_full, params):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
