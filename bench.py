"""Headline benchmark: patches/sec/chip for x4 2048 -> 8192 cloud upsampling.

Runs the FULL inference pipeline (normalize -> FPS seeds -> k-NN patch
extract -> flow model over all patches as one batch -> FPS merge ->
denormalize) on batches of 2048-point clouds with the pretrained PU1K
checkpoint (random init if the reference mount is absent). Each cloud
contributes N/256*4 = 32 patches; throughput is reported per chip.

Prints ONE final JSON line carrying the headline AND every secondary
metric (VERDICT r4 item 5 — the driver records only the last JSON line +
a bounded tail, so everything of record must ride the one object):

  {"metric": "patches_per_sec_per_chip", "value": N, "unit": "patches/s",
   "vs_baseline": N, "train_steps_per_sec": N, "cnf_train_steps_per_sec": N,
   "cnf_patches_per_sec": N, ...}

vs_baseline normalises against a DERIVED PyTorch-A100 reference envelope of
1000 patches/s: the reference model costs 4.589e9 FLOPs per patch (torch
profiler, `scripts/baseline_denominator.py`), so A100 fp32 peak (19.5 TF/s)
at an optimistic 25% MFU bounds the model-only throughput at ~1060
patches/s; the full pipeline can only be slower. Same-silicon cross-check:
our model forward is 4.05x the reference's on one CPU core (identical
hardware, identical checkpoint). Full derivation + sensitivity (TF32,
launch-bound small convs): BASELINE.md "Grounding the A100 denominator".
The target from BASELINE.json is >=10x, i.e. vs_baseline >= 10.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

ASSUMED_A100_PATCHES_PER_SEC = 1000.0  # derived envelope: see module docstring + BASELINE.md
CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"
CNF_CKPT = "/root/reference/pretrain/puflow-x4-cnf-pu1k.pt"

EXTRAS: dict = {}  # secondary metrics folded into the final JSON line


@contextlib.contextmanager
def quiet_stderr(logpath: str):
    """Route C++/XLA stderr spew (e.g. the multi-KB VMEM scoped-allocation
    dump from `jvp(cnf_solve_logp_pallas)` compilation) to a file so it
    cannot scroll the metrics out of the driver's bounded tail capture."""
    import sys

    fd = sys.stderr.fileno()
    saved = os.dup(fd)
    with open(logpath, "ab") as log:
        os.dup2(log.fileno(), fd)
        try:
            yield
        finally:
            os.dup2(saved, fd)
            os.close(saved)


def bench_cnf():
    """CNF-family sampling throughput (32x256 patches, x4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from puflow_tpu.models import continuous

    if os.path.exists(CNF_CKPT):
        from puflow_tpu.checkpoint import load_checkpoint

        params, state, _ = load_checkpoint(CNF_CKPT, "continuous", fold=True)
        params = jax.tree.map(jnp.asarray, params)
        state = jax.tree.map(jnp.asarray, state)
    else:
        params, state = continuous.init(jax.random.PRNGKey(0))

    # B=32: the fused whole-solve kernel is row-proportional (VPU
    # transcendental-bound), so throughput rises only ~15% from B=8 to 32
    # (1702 -> 1967 patches/s measured) — but 32 is what a throughput
    # deployment batches, and larger batches exceed the kernel's VMEM
    # budget for the per-layer condition projections.
    B, N, R = 32, 256, 4
    pts = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3),
                            dtype=jnp.float32)
    pts = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1.0)

    run = jax.jit(lambda p, s, x: continuous.sample(p, s, x, R))
    sync = jax.jit(jnp.sum)
    for _ in range(2):
        np.asarray(run(params, state, pts))
    # large windows + scalar sync: see the headline-bench comment on the
    # tunnel's payload-transfer cost
    iters = 30
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [run(params, state, pts) for _ in range(iters)]
        float(sync(outs[-1]))
        dt = min(dt, (time.time() - t0) / iters)
    EXTRAS["cnf_patches_per_sec"] = round(B / dt / jax.device_count(), 1)


def bench_cnf_train():
    """CNF-family training throughput at the reference config
    (modules/continuous/train_interp.py: batch 32, 256-pt patches,
    joint 1e-4*NLL + 5e-2*EMD-50, Adam + clip; dopri5 adjoint)."""
    import jax
    import numpy as np

    from puflow_tpu.data.synthetic import synthetic_pairs
    from puflow_tpu.models import continuous
    from puflow_tpu.parallel.mesh import make_mesh
    from puflow_tpu.train.trainer import TrainConfig, Trainer

    params, state = continuous.init(jax.random.PRNGKey(0))
    trainer = Trainer(TrainConfig(), params, state,
                      forward_fn=continuous.forward,
                      mesh=make_mesh(jax.devices()))
    sp, de = synthetic_pairs(np.random.RandomState(0), 32, 256, 4)

    def step():
        (trainer.params, trainer.bn_state, trainer.opt_state,
         m) = trainer._train_step(trainer.params, trainer.bn_state,
                                  trainer.opt_state, sp, de)
        return m

    # the first step compiles a monster adjoint graph whose XLA VMEM
    # diagnostics are multi-KB of stderr — keep them out of the tail
    with quiet_stderr("/tmp/bench_cnf_train_compile.log"):
        for _ in range(2):
            m = step()
        np.asarray(m["loss"])
    iters = 10
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            m = step()
        np.asarray(m["loss"])
        dt = min(dt, (time.time() - t0) / iters)
    EXTRAS["cnf_train_steps_per_sec"] = round(1.0 / dt, 2)


def bench_train():
    """Training throughput at the reference PU1K config (batch 32,
    256 -> 1024 patches, joint NLL + 50-iteration auction EMD, Adam +
    grad clip)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from puflow_tpu.data.synthetic import synthetic_pairs
    from puflow_tpu.models import discrete
    from puflow_tpu.parallel.mesh import make_mesh
    from puflow_tpu.train.trainer import TrainConfig, Trainer

    params, state = discrete.init(jax.random.PRNGKey(0))
    trainer = Trainer(TrainConfig(), params, state,
                      mesh=make_mesh(jax.devices()))
    B, N = 32, 256
    sp, de = synthetic_pairs(np.random.RandomState(0), B, N, 4)
    sp, de = jnp.asarray(sp), jnp.asarray(de)

    def step():
        (trainer.params, trainer.bn_state, trainer.opt_state,
         m) = trainer._train_step(trainer.params, trainer.bn_state,
                                  trainer.opt_state, sp, de)
        return m

    for _ in range(3):
        m = step()
    np.asarray(m["loss"])
    iters = 40
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            m = step()
        np.asarray(m["loss"])
        dt = min(dt, (time.time() - t0) / iters)
    EXTRAS["train_steps_per_sec"] = round(1.0 / dt, 2)


def headline():
    import jax
    import jax.numpy as jnp

    import puflow_tpu  # noqa: F401  (precision policy)
    from puflow_tpu.inference.patch import upsample_cloud
    from puflow_tpu.models import discrete

    if os.path.exists(CKPT):
        from puflow_tpu.checkpoint import load_checkpoint

        params, state, sample_fn = load_checkpoint(CKPT, "discrete",
                                                   fold=True)
        params = jax.tree.map(jnp.asarray, params)
        state = jax.tree.map(jnp.asarray, state)
    else:
        params, state = discrete.init(jax.random.PRNGKey(0))

        def sample_fn(model_params, patches, upratio):
            p, s = model_params
            return discrete.sample(p, s, patches, upratio)

    n_chips = jax.device_count()
    # B=32 clouds/iteration: the batched-FPS merge amortises best at the
    # largest batch its VMEM budget covers (measured: 3428 patches/s vs
    # 3176 at B=8)
    B, N, R = 32, 2048, 4
    n_patch_per_cloud = int(N / 256 * 4)
    npoint = N * R + 24

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (B, N, 3), dtype=jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    model_params = (params, state)

    # SHIPPED-DEFAULT config: reference-identical union merge (protocol
    # quality parity, QUALITY.md round-4b) — no opt-in merge knobs
    def run(pc):
        return upsample_cloud(model_params, pc, sample_fn, npoint, R, 256,
                              4.0)

    import numpy as np

    # compile + warm up. NOTE: on this remote-TPU platform
    # `block_until_ready` can return before execution completes; a
    # device->host transfer (np.asarray) is the reliable sync.
    for _ in range(2):
        np.asarray(run(pts))

    # Pipelined timing windows: dispatch all iterations, then sync once —
    # device executions are in-order, so a scalar reduction of the final
    # output waits for the whole window while transferring 4 bytes.
    # (Transferring the full [32,8216,3] output instead costs ~88 ms over
    # the tunnel — measured in scripts/exp_dispatch_overhead.py — which
    # at 15-iteration windows shaved ~6% off every recorded headline; a
    # deployment keeps outputs device-side or streams them overlapped, so
    # the completion barrier, not the payload, is the honest sync.)
    # Best-of-N windows guards against one-off tunnel/host hiccups.
    sync = jax.jit(jnp.sum)
    iters = 30
    dt = float("inf")
    for _ in range(4):  # best-of-N windows: tunnel hiccups cost ~10% per run
        t0 = time.time()
        outs = [run(pts) for _ in range(iters)]
        float(sync(outs[-1]))
        dt = min(dt, (time.time() - t0) / iters)

    return B * n_patch_per_cloud / dt / n_chips


def emit(patches_per_sec: float):
    """The ONE final JSON line: headline + all secondary metrics."""
    rec = {
        "metric": "patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "patches/s",
        # NOTE: denominator is the DERIVED A100 envelope (4.589 GFLOP/patch
        # at 25% MFU), not a measured A100 run — see BASELINE.md. The
        # measured same-silicon ratio (vs the reference on one CPU core)
        # is tracked there as the grounded cross-check.
        "vs_baseline": round(patches_per_sec / ASSUMED_A100_PATCHES_PER_SEC,
                             2),
        "baseline_kind": "derived-envelope",
    }
    rec.update(EXTRAS)
    # shipped-config protocol CD ratio vs the executed reference, from the
    # last recorded side-by-side fence baseline (VERDICT r4 item 5)
    try:
        exp = json.load(open(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "artifacts",
            "protocol_expected_r4.json")))
        if "ref_ratios" in exp:
            rec["protocol_cd_ratio_vs_ref"] = exp["ref_ratios"].get("CD")
    except Exception:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    for fn in (bench_cnf, bench_train, bench_cnf_train):
        try:
            fn()
        except Exception as e:  # secondary metric must never kill the headline
            EXTRAS[f"{fn.__name__}_error"] = str(e)[:200]
    try:
        pps = headline()
    except Exception as e:
        # one retry: the remote-TPU tunnel occasionally drops a single
        # request; a hard-down tunnel will fail again immediately
        import traceback

        traceback.print_exc()
        print(f"headline bench attempt 1 failed ({e}); retrying once")
        pps = headline()
    emit(pps)
