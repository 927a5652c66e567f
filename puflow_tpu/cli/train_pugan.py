"""Train the discrete model on PU-GAN patches.

Parity with reference `modules/discrete/train_pugan.py`: Adam 1e-4, 300
epochs, loss logpx*1e-4 + EMD*5e-2 + CD*1e-1 (`train_pugan.py:61,105,138`);
data normalised by the GT frame with always-on z rotation
(`dataset/pugan/dataset2.py`).
"""

from __future__ import annotations

from puflow_tpu.cli._train_common import build_parser, run_training

DEFAULTS = {
    "data": "data/PUGAN_poisson_256_poisson_1024.h5",
    "checkpoint": "runs/ckpt/puflow-pugan.npz",
    "learning_rate": 1e-4,
    "max_epochs": 300,
}


def _loaders(args):
    from puflow_tpu.data.pugan import make_loaders

    return make_loaders({
        "data_path": args.data, "batch_size": args.batch_size,
        "patch_num_point": 256, "up_ratio": 4,
        "seed": args.seed, "val_batches": args.val_batches,
    })


def main(argv=None):
    args = build_parser(DEFAULTS).parse_args(argv)
    return run_training(args, "discrete", _loaders, cd_weight=1e-1)


if __name__ == "__main__":
    main()
