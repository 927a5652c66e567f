"""Training loop: loss decreases, LR plateau logic, sharded step, NaN guard."""

import jax
import jax.numpy as jnp
import numpy as np

from puflow_tpu.data.synthetic import synthetic_epoch, synthetic_pairs
from puflow_tpu.models import discrete
from puflow_tpu.parallel.mesh import make_mesh
from puflow_tpu.train.trainer import TrainConfig, Trainer


def _small_trainer(emd_iters=5, **kw):
    cfg = TrainConfig(emd_iters=emd_iters, **kw)
    params, state = discrete.init(jax.random.PRNGKey(0))
    return Trainer(cfg, params, state)


def test_loss_decreases_on_fixed_batch():
    trainer = _small_trainer(learning_rate=5e-4)
    rng = np.random.RandomState(0)
    sparse, dense = synthetic_pairs(rng, 8, 64, 4)
    batches = [(sparse, dense)] * 8
    m0 = trainer.train_epoch(batches[:2])
    m1 = trainer.train_epoch(batches)
    m2 = trainer.train_epoch(batches)
    assert m2["loss"] < m0["loss"], (m0["loss"], m1["loss"], m2["loss"])
    assert m2["nan_step"] == 0.0


def test_multidevice_matches_single_device():
    """Data-parallel gradients over 8 virtual devices == single device.

    Compares raw gradients (not post-Adam params: Adam's g/sqrt(v)
    normalisation amplifies f32 reduction-order noise on near-zero params
    AND hides grad-scaling bugs).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from puflow_tpu.ops.emd import emd_auction

    rng = np.random.RandomState(1)
    sparse, dense = synthetic_pairs(rng, 8, 48, 4)
    params, state = discrete.init(jax.random.PRNGKey(0))

    def loss_fn(p, s, sp, de):
        pred, logpx, _ = discrete.forward(p, s, sp, 4, train=True)
        emd = jnp.sum(emd_auction(pred, de, 0.005, 5)[0])
        return logpx * 1e-4 + emd * 5e-2

    grads = {}
    for n_dev in (1, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        rep = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("data"))
        gfn = jax.jit(jax.grad(loss_fn),
                      in_shardings=(rep, rep, bsh, bsh), out_shardings=rep)
        grads[n_dev] = gfn(params, state, jnp.asarray(sparse),
                           jnp.asarray(dense))

    for a, b in zip(jax.tree.leaves(grads[1]), jax.tree.leaves(grads[8])):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=5e-4 * scale + 1e-6)


def test_plateau_reduces_lr():
    trainer = _small_trainer()
    lr0 = trainer._lr
    trainer._plateau_update(1.0)  # best
    for _ in range(trainer.cfg.sched_patience + 1):
        trainer._plateau_update(2.0)  # no improvement
    assert trainer._lr == lr0 * trainer.cfg.sched_factor
    # min_lr floor
    for _ in range(100):
        for _ in range(trainer.cfg.sched_patience + 1):
            trainer._plateau_update(2.0)
    assert trainer._lr == trainer.cfg.min_lr


def test_set_lr_takes_effect():
    """The plateau LR must actually reach the Adam stage inside opt_state.

    Guards against optax layout changes silently freezing the schedule
    (`Trainer._set_lr` locates the inject_hyperparams state by attribute).
    """
    trainer = _small_trainer()
    rng = np.random.RandomState(7)
    sparse, dense = synthetic_pairs(rng, 8, 32, 4)

    trainer._lr = 0.0
    p_before = jax.tree.map(np.asarray, trainer.params)
    m = trainer.train_epoch([(sparse, dense)])
    assert m["nan_step"] == 0.0
    p_frozen = jax.tree.map(np.asarray, trainer.params)
    for a, b in zip(jax.tree.leaves(p_before), jax.tree.leaves(p_frozen)):
        np.testing.assert_array_equal(a, b)

    trainer._lr = 1e-3
    trainer.train_epoch([(sparse, dense)])
    p_moved = jax.tree.map(np.asarray, trainer.params)
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(p_frozen), jax.tree.leaves(p_moved)))


def test_nan_guard_skips_update():
    trainer = _small_trainer()
    rng = np.random.RandomState(2)
    sparse, dense = synthetic_pairs(rng, 8, 32, 4)
    p_before = jax.tree.map(np.asarray, trainer.params)
    bad = sparse.copy()
    bad[0, 0, 0] = np.nan
    m = trainer.train_epoch([(bad, dense)])
    assert m["nan_step"] == 1.0
    p_after = jax.tree.map(np.asarray, trainer.params)
    for a, b in zip(jax.tree.leaves(p_before), jax.tree.leaves(p_after)):
        np.testing.assert_array_equal(a, b)


def test_fit_runs_and_logs():
    trainer = _small_trainer()
    gen = synthetic_epoch(0, steps=2, batch=8, num_point=32, up_ratio=4)
    logs = []
    hist = trainer.fit(gen, gen, max_epochs=2, log_fn=logs.append)
    assert len(hist) == 2
    assert len(logs) == 2
    assert "CD" in hist[0]


def test_cd_weight_changes_loss():
    """The pugan variant adds CD*1e-1 to the objective."""
    import optax

    from puflow_tpu.train.trainer import make_optimizer, make_train_step

    rng = np.random.RandomState(5)
    sparse, dense = synthetic_pairs(rng, 8, 32, 4)
    params, state = discrete.init(jax.random.PRNGKey(0))

    losses = {}
    for cd_w in (0.0, 1e-1):
        cfg = TrainConfig(emd_iters=5, cd_weight=cd_w)
        opt = make_optimizer(cfg)
        step = jax.jit(make_train_step(opt, cfg))  # unjitted = minutes
        _, _, _, m = step(params, state, opt.init(params),
                          jnp.asarray(sparse), jnp.asarray(dense))
        losses[cd_w] = float(m["loss"])
    assert losses[1e-1] > losses[0.0]
