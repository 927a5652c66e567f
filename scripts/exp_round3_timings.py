"""Round-3 component timings on the real TPU: CNF sample fast path, EMD
auction kernel (cached base matrix), full train step."""

from __future__ import annotations

import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/puflow_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.utils.timing import time_fn

CNF_CKPT = "/root/reference/pretrain/puflow-x4-cnf-pu1k.pt"


def cnf_timing():
    from puflow_tpu.models import continuous

    params, state, _ = load_checkpoint(CNF_CKPT, "continuous", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    pts = jax.random.normal(jax.random.PRNGKey(2), (8, 256, 3))
    pts = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1.0)
    run = jax.jit(lambda p, s, x: continuous.sample(p, s, x, 4))
    t = time_fn(lambda: run(params, state, pts), iters=10, warmup=2)
    print(f"CNF sample 8x256 x4: {t*1e3:.1f} ms "
          f"({8/t:.0f} patches/s)", flush=True)


def emd_timing():
    from puflow_tpu.ops.pallas.emd_pallas import emd_auction_pallas

    a = jax.random.normal(jax.random.PRNGKey(0), (32, 1024, 3)) * 0.5
    b = jax.random.normal(jax.random.PRNGKey(1), (32, 1024, 3)) * 0.5
    t = time_fn(lambda: emd_auction_pallas(a, b, 0.005, 50), iters=10,
                warmup=2)
    print(f"EMD auction [32x1024] 50 iters: {t*1e3:.1f} ms", flush=True)


def train_step_timing():
    from puflow_tpu.data.synthetic import synthetic_pairs
    from puflow_tpu.models import discrete
    from puflow_tpu.train.trainer import TrainConfig, Trainer

    params, state = discrete.init(jax.random.PRNGKey(0))
    trainer = Trainer(TrainConfig(), params, state)
    sp, de = synthetic_pairs(np.random.RandomState(0), 32, 256, 4)
    sp, de = jnp.asarray(sp), jnp.asarray(de)
    trainer.train_epoch([(sp, de)])  # compile
    import time as _time

    t0 = _time.perf_counter()
    trainer.train_epoch([(sp, de)] * 20)
    dt = (_time.perf_counter() - t0) / 20
    print(f"train step (B=32, 256->1024, ref config): {dt*1e3:.1f} ms "
          f"({1/dt:.1f} steps/s)", flush=True)


cnf_timing()
emd_timing()
train_step_timing()
