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

    print(f"forward only       : {timed(fwd, params):8.1f} ms", flush=True)
    print(f"grad NLL (f-path)  : {timed(g_nll, params):8.1f} ms", flush=True)
    print(f"grad EMD (g-path)  : {timed(g_emd, params):8.1f} ms", flush=True)
    print(f"grad full joint    : {timed(g_full, params):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
