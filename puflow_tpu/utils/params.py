"""Parameter bookkeeping helpers.

Parity target: reference `utils/modules.py:6-80` — parameter counting,
selective freezing, and the ANSI per-epoch progress line.
"""

from __future__ import annotations

import numpy as np


def count_parameters(tree) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def parameter_breakdown(tree) -> dict:
    """Top-level-key -> parameter count (mirrors the survey's per-module
    accounting of the reference checkpoints)."""
    return {k: count_parameters(v) for k, v in tree.items()}


def freeze_mask(params, frozen_prefixes) -> object:
    """Boolean pytree: True = trainable, False = frozen.

    `frozen_prefixes`: iterable of '/'-joined key-path prefixes to freeze
    (e.g. ['feat_convs', 'interp/weight_unit']). To freeze with optax, zero
    the masked-out updates:
        optax.chain(inner, optax.masked(optax.set_to_zero(),
                                        tree_map(lambda m: not m, mask)))
    """
    import jax

    def path_str(path):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)

    return jax.tree_util.tree_map_with_path(
        lambda p, _: not any(path_str(p).startswith(f)
                             for f in frozen_prefixes),
        params)


def print_progress_log(epoch: int, metrics: dict, extra=(), log_fn=print):
    """One-line epoch summary (reference `print_progress_log`,
    `utils/modules.py:70-80`)."""
    parts = [f"Epoch {epoch:4d}"]
    parts += [f"{k} {v:.6f}" if isinstance(v, float) else f"{k} {v}"
              for k, v in metrics.items()]
    parts += list(extra)
    log_fn(" | ".join(parts))
