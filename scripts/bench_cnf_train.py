"""CNF-family training on the real chip: throughput + a short loss-curve
run (VERDICT r3 item 5; reference modules/continuous/train_interp.py —
batch 32, 256-pt patches, joint 1e-4*NLL + 5e-2*EMD-50, Adam + clip).

usage: python scripts/bench_cnf_train.py [steps=200]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    import jax
    import jax.numpy as jnp

    from puflow_tpu.data.synthetic import synthetic_pairs
    from puflow_tpu.models import continuous
    from puflow_tpu.parallel.mesh import make_mesh
    from puflow_tpu.train.trainer import TrainConfig, Trainer

    params, state = continuous.init(jax.random.PRNGKey(0))
    trainer = Trainer(TrainConfig(), params, state,
                      forward_fn=continuous.forward,
                      mesh=make_mesh(jax.devices()))
    rng = np.random.RandomState(3)

    def batches(n):
        for _ in range(n):
            yield synthetic_pairs(rng, 32, 256, 4)

    t0 = time.time()
    first = trainer.train_epoch(batches(1))
    print(f"first step (compile + run): {time.time() - t0:.1f}s "
          f"loss={first['loss']:.4f}", flush=True)

    chunk = max(steps // 4, 1)
    rows = []
    for i in range(4):
        t0 = time.time()
        agg = trainer.train_epoch(batches(chunk))
        dt = time.time() - t0
        rows.append(agg)
        print(json.dumps({
            "step": (i + 1) * chunk, "loss": agg["loss"],
            "emd": agg["emd"], "logpx": agg["logpx"],
            "steps_per_sec": round(chunk / dt, 3),
            "nan_frac": agg.get("nan_step", 0.0)}), flush=True)
    assert rows[-1]["loss"] < rows[0]["loss"], "CNF loss did not decrease"
    print("CNF TRAIN OK", flush=True)


if __name__ == "__main__":
    main()
