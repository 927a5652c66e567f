"""Re-measure FAST_ELEMENTWISE on the TRANSPOSED (cm) encoder kernels.

VERDICT r4 item 6: the flag ships OFF based on a round-3 measurement taken
on the retired row-major kernel (+~6% model speed for golden-CD
4.55e-4 -> 7.16e-4). The channel-major kernels changed the
elementwise/matmul balance; this re-measures on the shipped path:

  * model-stage time (sample_fn over 1024 patches, scalar-reduced closure)
  * bench-scale pipeline output delta vs the FAST_ELEMENTWISE=False run
    (same seed/cloud, 2048 -> 8216 before outlier removal)

Run from the repo root on the real TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_fast_elem_cm.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.inference.patch import upsample_cloud
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"


def run_config(fast: bool):
    from puflow_tpu.ops.pallas import encoder_pallas

    encoder_pallas.FAST_ELEMENTWISE = fast

    params, state, sample_fn = load_checkpoint(CKPT, "discrete", fold=True)
    mp = (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state))

    # model-stage time at 1024 patches
    flat = jax.random.normal(jax.random.PRNGKey(0), (1024, 256, 3)) * 0.5
    mo = jax.jit(lambda m, f: jnp.sum(sample_fn(m, f, 4)))
    np.asarray(mo(mp, flat))
    t_mo = time_fn(mo, mp, flat, iters=20)

    # bench-scale pipeline output (B=4 keeps compile quick; same cloud
    # both configs)
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 2048, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    out = np.asarray(upsample_cloud(mp, pts, sample_fn, 2048 * 4 + 24, 4,
                                    256, 4.0))
    return t_mo, out


def cd(a, b):
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


def main():
    t_off, out_off = run_config(False)
    print(f"FAST_ELEMENTWISE=False: model {t_off*1e3:7.2f} ms/1024 patches",
          flush=True)
    t_on, out_on = run_config(True)
    print(f"FAST_ELEMENTWISE=True : model {t_on*1e3:7.2f} ms/1024 patches",
          flush=True)
    cds = [cd(out_on[b], out_off[b]) for b in range(out_on.shape[0])]
    print(f"speedup: {t_off/t_on:.3f}x   pipeline CD(on, off): "
          f"mean {np.mean(cds):.2e} max {np.max(cds):.2e}")


if __name__ == "__main__":
    main()
