"""Ground the `vs_baseline` denominator used by bench.py.

Three reproducible measurements (all runnable in this environment):

1. **Reference FLOP count** — torch profiler (`with_flops=True`) over the
   reference model forward (`modules/discrete/interpflow.py` run in
   torch-cpu with the same shims as tests/test_pipeline_parity.py).
   Measured: 4.589e9 FLOPs per 256-point x4 patch (matmul/conv FLOPs).

2. **Same-silicon framework ratio** — reference model forward vs ours on
   the same CPU core(s). Removes every hardware assumption: identical
   silicon, identical checkpoint, identical math.

3. **A100 envelope** — patches/s the reference could reach at fp32 peak
   (19.5 TFLOP/s) under an optimistic MFU. This bounds the denominator
   from above; see BASELINE.md for the sensitivity discussion (TF32,
   pipeline overheads).

Usage: python scripts/baseline_denominator.py   (run from the repo root)
"""

from __future__ import annotations

import os
import sys
import time

A100_FP32_PEAK = 19.5e12  # FLOP/s (CUDA-core fp32, no TF32)
OPTIMISTIC_MFU = 0.25     # generous for 8-128-channel EdgeConv workloads


def _load_reference_net():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    import torch
    from test_pipeline_parity import CKPT, REFERENCE, _install_shims

    _install_shims()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import modules.utils.probs as probs

    orig = probs.GaussianDistribution.__init__

    def cpu_init(self, pc_channel, mu, vars, temperature=1.0, device="cpu"):
        orig(self, pc_channel, mu, vars, temperature, device="cpu")

    probs.GaussianDistribution.__init__ = cpu_init
    from modules.discrete.interpflow import PointInterpFlow

    net = PointInterpFlow(3)
    net.load_state_dict(torch.load(CKPT, map_location="cpu"))
    net.set_to_initialized_state()
    net.eval()
    return net


def main():
    import numpy as np
    import torch
    from torch.profiler import ProfilerActivity, profile

    net = _load_reference_net()
    rng = np.random.RandomState(0)
    patches_np = rng.randn(32, 256, 3).astype(np.float32) * 0.3
    patches = torch.from_numpy(patches_np)

    with torch.no_grad():
        net.sample(patches, upratio=4)  # warmup
        with profile(activities=[ProfilerActivity.CPU],
                     with_flops=True) as prof:
            net.sample(patches, upratio=4)
        flops = sum(e.flops for e in prof.key_averages() if e.flops)
        ref_times = []
        for _ in range(3):
            t0 = time.time()
            net.sample(patches, upratio=4)
            ref_times.append(time.time() - t0)
    flops_per_patch = flops / 32
    ref_pps_cpu = 32 / min(ref_times)

    # ours, same silicon
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import puflow_tpu  # noqa: F401
    from puflow_tpu.checkpoint import load_checkpoint
    from puflow_tpu.models import discrete

    params, state, _ = load_checkpoint(
        "/root/reference/pretrain/puflow-x4-pu1k.pt", "discrete", fold=True)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    fn = jax.jit(lambda x: discrete.sample(params, state, x, 4))
    xp = jnp.asarray(patches_np)
    np.asarray(fn(xp))
    our_times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(fn(xp))
        our_times.append(time.time() - t0)
    our_pps_cpu = 32 / min(our_times)

    envelope = A100_FP32_PEAK * OPTIMISTIC_MFU / flops_per_patch
    print(f"reference model FLOPs/patch       : {flops_per_patch:.3e}")
    print(f"reference model, torch-cpu        : {ref_pps_cpu:8.2f} patches/s")
    print(f"ours,      model, jax-cpu (same)  : {our_pps_cpu:8.2f} patches/s")
    print(f"same-silicon framework ratio      : "
          f"{our_pps_cpu / ref_pps_cpu:8.2f}x")
    print(f"A100 fp32 envelope @ {OPTIMISTIC_MFU:.0%} MFU     : "
          f"{envelope:8.0f} patches/s (model-only upper bound)")


if __name__ == "__main__":
    main()
