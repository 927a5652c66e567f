"""Utility helpers: param accounting, freezing masks, timers."""

import jax
import numpy as np

from puflow_tpu.utils.params import (
    count_parameters,
    freeze_mask,
    parameter_breakdown,
    print_progress_log,
)


def test_count_and_breakdown():
    tree = {"a": {"w": np.zeros((2, 3))}, "b": [np.zeros(4), np.zeros(5)]}
    assert count_parameters(tree) == 15
    assert parameter_breakdown(tree) == {"a": 6, "b": 9}


def test_freeze_mask_with_optax():
    import optax

    params = {"enc": {"w": np.ones(3)}, "flow": {"w": np.ones(3)}}
    mask = freeze_mask(params, ["enc"])
    assert mask == {"enc": {"w": False}, "flow": {"w": True}}
    # freeze = zero the updates of masked-out (False) leaves
    frozen = jax.tree.map(lambda m: not m, mask)
    tx = optax.chain(optax.sgd(1.0), optax.masked(optax.set_to_zero(),
                                                  frozen))
    st = tx.init(params)
    grads = jax.tree.map(lambda x: np.ones_like(x), params)
    upd, _ = tx.update(grads, st, params)
    assert (np.asarray(upd["enc"]["w"]) == 0).all()
    assert (np.asarray(upd["flow"]["w"]) == -1).all()


def test_progress_log_line():
    lines = []
    print_progress_log(3, {"CD": 0.5, "steps": 7}, extra=["lr 1e-3"],
                       log_fn=lines.append)
    assert "Epoch    3" in lines[0] and "CD 0.5" in lines[0]
