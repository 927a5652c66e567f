"""Reliable TPU timing on remote-execution platforms.

On this environment's remote TPU tunnel, `block_until_ready` can return
before execution finishes and every device->host transfer costs a full RPC
round-trip (~150 ms). `time_fn` therefore queues `iters` executions
back-to-back, forces ONE transfer at the end, and subtracts the separately
measured round-trip latency.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def _sync(out):
    """Force completion of everything queued before `out` (single transfer)."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def measure_rtt(n: int = 3) -> float:
    """Round-trip latency of a trivial transfer, seconds."""
    import jax.numpy as jnp

    x = jnp.zeros((1,))
    _sync(x + 1)
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(x + 1)
    return (time.perf_counter() - t0) / n


def time_fn(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Mean wall-clock seconds per call of `fn(*args)` (compiled, steady)."""
    for _ in range(warmup):
        _sync(fn(*args))
    rtt = measure_rtt()
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    total = time.perf_counter() - t0
    return max((total - rtt) / iters, 1e-9)
