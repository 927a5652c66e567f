"""Export a checkpoint as a serving artifact (`jax.export` StableHLO blob).

No reference analogue — the reference deploys inference as a full Python/
CUDA checkout (`modules/discrete/upsample.py`); this CLI emits a single
self-contained file a jax-only server loads with
`puflow_tpu.serving.load_exported`.

  # per-patch sampler, any batch size at runtime:
  python -m puflow_tpu.cli.export --checkpoint puflow-x4-pu1k.pt \
      --out sampler.jaxexp

  # whole-cloud pipeline at fixed shapes:
  python -m puflow_tpu.cli.export --checkpoint puflow-x4-pu1k.pt \
      --kind cloud --cloud_points 2048 --batch 8 --out cloud.jaxexp
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", required=True,
                   help=".pt / .ckpt / .npz checkpoint")
    p.add_argument("--model", default="discrete",
                   choices=["discrete", "continuous"])
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--kind", default="patch", choices=["patch", "cloud"],
                   help="patch: [B, patch_size, 3] sampler; cloud: the "
                        "full fixed-shape pipeline")
    p.add_argument("--up_ratio", type=int, default=4)
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--batch", type=int, default=0,
                   help="batch dim; 0 = symbolic (patch kind only)")
    p.add_argument("--cloud_points", type=int, default=2048)
    p.add_argument("--npoint", type=int, default=0,
                   help="cloud output points; 0 = cloud_points*ratio + 24")
    p.add_argument("--expand_ratio", type=float, default=4.0)
    p.add_argument("--platforms", default="",
                   help="comma-separated export platforms (e.g. tpu,cpu); "
                        "empty = current backend")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from puflow_tpu import serving
    from puflow_tpu.checkpoint import load_checkpoint

    params, state, _ = load_checkpoint(args.checkpoint, args.model,
                                       fold=True)
    platforms = (tuple(s for s in args.platforms.split(",") if s)
                 or None)
    if args.kind == "patch":
        exp = serving.export_patch_sampler(
            params, state, model=args.model, upratio=args.up_ratio,
            patch_size=args.patch_size,
            batch=args.batch or None, platforms=platforms)
    else:
        if not args.batch:
            raise SystemExit("--kind cloud requires a concrete --batch")
        exp = serving.export_cloud_upsampler(
            params, state, model=args.model,
            cloud_points=args.cloud_points,
            npoint=args.npoint or None, upratio=args.up_ratio,
            patch_size=args.patch_size, expand_ratio=args.expand_ratio,
            batch=args.batch, platforms=platforms)
    serving.save_exported(exp, args.out)
    import os

    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.2f} MB, "
          f"platforms={exp.platforms})")


if __name__ == "__main__":
    main()
