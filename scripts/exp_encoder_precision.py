"""Sweep the fused encoder's MXU pass-count configs on the real TPU.

For each config: kernel time at 256 patches, max relative deviation vs the
exact XLA encoder, and (optionally, --golden) the end-to-end fused-pipeline
CD vs the executed torch-cpu reference.

Run from the repo root: python - <<'PY'
  exec(open("scripts/exp_encoder_precision.py").read())
PY
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

import puflow_tpu  # noqa: F401
from puflow_tpu.checkpoint import load_checkpoint
from puflow_tpu.models.discrete import feat_extract
from puflow_tpu.ops.knn import knn_indices
from puflow_tpu.ops.pallas.encoder_pallas import encoder_conditions_pallas
from puflow_tpu.utils.timing import time_fn

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"

CONFIGS = {
    "exact (2,3)x6": None,
    "gather1 late3": ((2, 3),) * 3 + ((1, 3),) * 3,
    "gather1 all": ((1, 3),) * 6,
    "mac1 late3": ((2, 3),) * 3 + ((2, 1),) * 3,
    "g1m1 late3": ((2, 3),) * 3 + ((1, 1),) * 3,
    "g1m1 late5": ((2, 3),) + ((1, 1),) * 5,
    "all bf16": ((1, 1),) * 6,
}


def main():
    M = 256
    params, state, _ = load_checkpoint(CKPT, "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    pts = jax.random.normal(jax.random.PRNGKey(1), (M, 256, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    idx = knn_indices(pts, pts, 16)
    idx.block_until_ready()

    # exact XLA reference conditions for the error column (small batch)
    sp, si = pts[:8], idx[:8]
    import puflow_tpu.models.discrete as D
    orig_backend = D.use_fused_encoder
    D.use_fused_encoder = lambda *a, **k: False
    cs_ref, _ = feat_extract(params, state, sp, si, train=False)
    cs_ref = [np.asarray(c) for c in cs_ref]
    D.use_fused_encoder = orig_backend

    for name, cfg in CONFIGS.items():
        fn = lambda: encoder_conditions_pallas(params, pts, idx,
                                               False, cfg)
        t = time_fn(lambda: fn(), iters=20, warmup=2)
        cs = encoder_conditions_pallas(params, sp, si, False, cfg)
        rel = max(
            float(np.abs(np.asarray(a) - b).max() / np.abs(b).max())
            for a, b in zip(cs, cs_ref))
        print(f"{name:16s}  {t*1e3:7.2f} ms   max-rel-dev {rel:.2e}",
              flush=True)


main()
