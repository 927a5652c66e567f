"""Shared body of the train CLIs (pu1k / pugan / pugeo / cnf)."""

from __future__ import annotations

import argparse
import os


def build_parser(defaults: dict) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default=defaults.get("data"))
    p.add_argument("--checkpoint", type=str,
                   default=defaults.get("checkpoint"))
    p.add_argument("--begin_checkpoint", type=str, default=None)
    p.add_argument("--learning_rate", type=float,
                   default=defaults.get("learning_rate", 1e-3))
    p.add_argument("--sched_patience", type=int, default=10)
    p.add_argument("--sched_factor", type=float, default=0.5)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_epochs", type=int,
                   default=defaults.get("max_epochs", 100))
    p.add_argument("--seed", type=int, default=2021)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic steps/epoch instead of data")
    p.add_argument("--val_batches", type=int, default=400)
    return p


def run_training(args, model_family: str, make_data_loaders,
                 cd_weight: float = 0.0):
    """model_family: 'discrete' | 'cnf'; make_data_loaders(args) ->
    (train_iter_fn, val_iter_fn)."""
    import jax
    import numpy as np

    import puflow_tpu  # noqa: F401
    from puflow_tpu.checkpoint import load_checkpoint, save_checkpoint
    from puflow_tpu.train.trainer import TrainConfig, Trainer

    if model_family == "cnf":
        from puflow_tpu.models import continuous as model
    else:
        from puflow_tpu.models import discrete as model

    cfg = TrainConfig(
        learning_rate=args.learning_rate,
        sched_patience=args.sched_patience,
        sched_factor=args.sched_factor,
        max_epochs=args.max_epochs,
        cd_weight=cd_weight,
        seed=args.seed,
    )

    if args.synthetic:
        from puflow_tpu.data.synthetic import synthetic_epoch

        train_iter = synthetic_epoch(args.seed, args.synthetic,
                                     args.batch_size)
        val_iter = synthetic_epoch(args.seed + 1,
                                   max(args.synthetic // 4, 1),
                                   args.batch_size)
    else:
        train_iter, val_iter = make_data_loaders(args)

    params, state = model.init(jax.random.PRNGKey(cfg.seed))
    if args.begin_checkpoint:
        params, state, _ = load_checkpoint(args.begin_checkpoint,
                                           model_family)
    elif model_family == "discrete":
        first = next(iter(train_iter()))
        params = model.actnorm_warmup(params, state, first[0])

    trainer = Trainer(cfg, params, state, forward_fn=model.forward)
    os.makedirs(os.path.dirname(args.checkpoint) or ".", exist_ok=True)

    def save(epoch, p, s, path=None):
        save_checkpoint(path or args.checkpoint,
                        jax.tree.map(np.asarray, p),
                        jax.tree.map(np.asarray, s))

    trainer.fit(train_iter, val_iter, checkpoint_fn=save)
    # final save is skipped on interruption (reference `train_pu1k.py:172`)
    if not getattr(trainer, "interrupted", False):
        final = args.checkpoint.replace(".npz",
                                        f"-epoch{args.max_epochs}.npz")
        save(args.max_epochs, trainer.params, trainer.bn_state, path=final)
        print(f"Model saved to {final}")
    return trainer
