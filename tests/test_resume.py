"""Train-state checkpoint/resume: params, optimizer moments, LR controller."""

import jax
import numpy as np

from puflow_tpu.data.synthetic import synthetic_pairs
from puflow_tpu.models import discrete
from puflow_tpu.train.trainer import TrainConfig, Trainer


def test_resume_reproduces_training(tmp_path):
    cfg = TrainConfig(emd_iters=5, learning_rate=5e-4)
    params, state = discrete.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b1 = synthetic_pairs(rng, 8, 48, 4)
    b2 = synthetic_pairs(rng, 8, 48, 4)

    # run A: two epochs straight through
    ta = Trainer(cfg, params, state)
    ta.train_epoch([b1])
    ma = ta.train_epoch([b2])

    # run B: one epoch, save, restore into a fresh trainer, second epoch
    tb = Trainer(cfg, params, state)
    tb.train_epoch([b1])
    ckpt = str(tmp_path / "state.npz")
    tb.save_train_state(ckpt)

    tc = Trainer(cfg, params, state)
    done = tc.restore_train_state(ckpt)
    assert done == 0  # no full fit() epochs recorded
    mc = tc.train_epoch([b2])

    assert abs(ma["loss"] - mc["loss"]) < 1e-4 * max(abs(ma["loss"]), 1.0)
    for a, b in zip(jax.tree.leaves(ta.params), jax.tree.leaves(tc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_plateau_state_restored(tmp_path):
    cfg = TrainConfig(emd_iters=5)
    params, state = discrete.init(jax.random.PRNGKey(0))
    t = Trainer(cfg, params, state)
    t._plateau_update(1.0)
    for _ in range(cfg.sched_patience + 1):
        t._plateau_update(2.0)
    assert t._lr == cfg.learning_rate * cfg.sched_factor
    ckpt = str(tmp_path / "state.npz")
    t.save_train_state(ckpt)

    t2 = Trainer(cfg, params, state)
    t2.restore_train_state(ckpt)
    assert t2._lr == t._lr
    assert t2._best == t._best
