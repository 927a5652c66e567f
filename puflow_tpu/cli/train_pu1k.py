"""Train the discrete model on PU1K patches.

CLI parity with reference `modules/discrete/train_pu1k.py` (same defaults:
batch 32, patch 256 -> 1024 (x4), 100 epochs, Adam 1e-3,
ReduceLROnPlateau(0.5, patience 10, min_lr 1e-4), grad clip 1e-2, loss
logpx*1e-4 + EMD*5e-2).

    python -m puflow_tpu.cli.train_pu1k --data <pu1k.h5> \
        [--checkpoint runs/ckpt/puflow-pu1k.npz] [--begin_checkpoint ck] \
        [--synthetic N]  # N synthetic steps/epoch when no h5 is available
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--data", type=str,
        default="data/pu1k_poisson_256_poisson_1024_pc_2500_patch50_addpugan.h5")
    parser.add_argument("--checkpoint", type=str,
                        default="runs/ckpt/puflow-pu1k.npz")
    parser.add_argument("--begin_checkpoint", type=str, default=None)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--sched_patience", type=int, default=10)
    parser.add_argument("--sched_factor", type=float, default=0.5)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--max_epochs", type=int, default=100)
    parser.add_argument("--seed", type=int, default=2021)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="train on N synthetic steps/epoch instead of h5")
    parser.add_argument("--val_batches", type=int, default=400)
    args = parser.parse_args(argv)

    import jax

    import puflow_tpu  # noqa: F401
    from puflow_tpu.checkpoint import save_checkpoint
    from puflow_tpu.models import discrete
    from puflow_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        learning_rate=args.learning_rate,
        sched_patience=args.sched_patience,
        sched_factor=args.sched_factor,
        max_epochs=args.max_epochs,
        seed=args.seed,
    )

    if args.synthetic:
        from puflow_tpu.data.synthetic import synthetic_epoch

        train_iter = synthetic_epoch(args.seed, args.synthetic,
                                     args.batch_size)
        val_iter = synthetic_epoch(args.seed + 1, max(args.synthetic // 4, 1),
                                   args.batch_size)
    else:
        from puflow_tpu.data.pu1k import make_loaders

        train_iter, val_iter = make_loaders({
            "data_path": args.data, "batch_size": args.batch_size,
            "num_point_patch": 256, "up_ratio": 4, "is_random_input": False,
            "is_augment": True, "jitter_sigma": 0.01, "jitter_max": 0.03,
            "seed": args.seed, "val_batches": args.val_batches,
        })

    params, state = discrete.init(jax.random.PRNGKey(cfg.seed))
    if args.begin_checkpoint:
        from puflow_tpu.checkpoint import load_checkpoint

        params, state, _ = load_checkpoint(args.begin_checkpoint, "discrete")
    else:
        # data-dependent ActNorm init from the first batch (reference
        # first-forward semantics, done once outside jit)
        first = next(iter(train_iter()))
        params = discrete.actnorm_warmup(params, state, first[0])

    trainer = Trainer(cfg, params, state)

    os.makedirs(os.path.dirname(args.checkpoint) or ".", exist_ok=True)

    def save(epoch, p, s, path=None):
        import numpy as np

        save_checkpoint(path or args.checkpoint,
                        jax.tree.map(np.asarray, p),
                        jax.tree.map(np.asarray, s))

    trainer.fit(train_iter, val_iter, checkpoint_fn=save)
    final = args.checkpoint.replace(".npz", f"-epoch{args.max_epochs}.npz")
    save(args.max_epochs, trainer.params, trainer.bn_state, path=final)
    print(f"Model saved to {final}")


if __name__ == "__main__":
    main()
