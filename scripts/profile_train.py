"""Decompose the train step at the reference PU1K config (B=32,
256 -> 1024, emd50): EMD kernel alone, forward-only loss, full
grad+update step. All closures reduce to scalars inside jit (time_fn
sync rule).

Usage: python - < scripts/profile_train.py  (from the repo root)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.data.synthetic import synthetic_pairs
from puflow_tpu.models import discrete
from puflow_tpu.ops.emd import emd_auction
from puflow_tpu.parallel.mesh import make_mesh
from puflow_tpu.train.trainer import TrainConfig, Trainer
from puflow_tpu.utils.timing import time_fn


def main():
    B, N, R = 32, 256, 4
    params, state = discrete.init(jax.random.PRNGKey(0))
    sp, de = synthetic_pairs(np.random.RandomState(0), B, N, R)
    sp, de = jnp.asarray(sp), jnp.asarray(de)

    pred0 = jax.jit(
        lambda p, s, x: discrete.forward(p, s, x, R, train=True)[0])(
            params, state, sp)

    emd = jax.jit(lambda a, b: jnp.sum(emd_auction(a, b, 0.005, 50)[0]))
    emd(pred0, de)
    print(f"emd50 [32x1024]     : {time_fn(emd, pred0, de, iters=20)*1e3:7.2f} ms",
          flush=True)

    def loss_fn(p, s, sp_, de_):
        pred, logpx, s2 = discrete.forward(p, s, sp_, R, train=True)
        e = jnp.sum(emd_auction(pred, de_, 0.005, 50)[0])
        return logpx * 1e-4 + e * 5e-2

    fwd = jax.jit(loss_fn)
    fwd(params, state, sp, de)
    print(f"forward loss        : {time_fn(fwd, params, state, sp, de, iters=20)*1e3:7.2f} ms",
          flush=True)

    gfn = jax.jit(lambda p, s, a, b: jax.tree.reduce(
        lambda acc, g: acc + jnp.sum(jnp.abs(g)),
        jax.grad(loss_fn)(p, s, a, b), 0.0))
    gfn(params, state, sp, de)
    print(f"grad(loss)          : {time_fn(gfn, params, state, sp, de, iters=20)*1e3:7.2f} ms",
          flush=True)

    trainer = Trainer(TrainConfig(), params, state,
                      mesh=make_mesh(jax.devices()))

    def step():
        (trainer.params, trainer.bn_state, trainer.opt_state, m
         ) = trainer._train_step(trainer.params, trainer.bn_state,
                                 trainer.opt_state, sp, de)
        return m

    step()
    import time as _t
    t0 = _t.time()
    for _ in range(40):
        m = step()
    np.asarray(m["loss"])
    print(f"full train step     : {(_t.time()-t0)/40*1e3:7.2f} ms", flush=True)


main()
