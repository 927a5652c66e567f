"""Data-parallel training loop for the interpolation-flow models.

Reference parity (`modules/discrete/train_pu1k.py`):
  * loss = logpx * 1e-4 + EMD * 5e-2 (+ CD * 1e-1 for pugan)   (`:65`, pugan `:61`)
  * Adam (lr 1e-3 pu1k / 1e-4 pugan), grad clip 1e-2 (global norm),
    ReduceLROnPlateau(factor .5, patience 10, min_lr 1e-4)      (`:49-51,149`)
  * NaN-loss guard                                              (`:71-73`)
  * validation chamfer in the kaolin convention                 (`:85`)

TPU-first design:
  * the train step is ONE jitted pure function
    (params, bn_state, opt_state, batch, ...) -> updated triple + metrics;
  * data parallelism = jit shardings over a 1-D mesh: params/opt replicated,
    batch sharded. XLA inserts the gradient psum over ICI. BatchNorm batch
    statistics are computed over the *global* batch under jit — i.e. sync-BN
    semantics, a superset of the reference's optional `dist.all_reduce` BN
    (`modules/continuous/normalization.py:66-70`).
  * LR schedule via `optax.inject_hyperparams`: the plateau controller
    mutates the learning rate inside opt_state between epochs — no re-jit.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from puflow_tpu.models import discrete
from puflow_tpu.ops.chamfer import chamfer_distance_kaolin
from puflow_tpu.ops.emd import emd_auction
from puflow_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    min_lr: float = 1e-4
    sched_factor: float = 0.5
    sched_patience: int = 10
    grad_clip: float = 1e-2
    max_epochs: int = 100
    logpx_weight: float = 1e-4
    emd_weight: float = 5e-2
    cd_weight: float = 0.0          # 1e-1 for pugan (`train_pugan.py:61`)
    emd_eps: float = 0.005
    emd_iters: int = 50
    upratio: int = 4
    seed: int = 2021


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate),
    )


def make_train_step(optimizer, cfg: TrainConfig,
                    forward_fn: Callable = discrete.forward):
    """Build the jittable train step. `forward_fn` selects the model family."""

    def train_step(params, bn_state, opt_state, sparse, dense):
        def loss_fn(p):
            pred, logpx, new_bn = forward_fn(p, bn_state, sparse,
                                             cfg.upratio, train=True)
            emd_dist, _ = emd_auction(pred, dense, cfg.emd_eps, cfg.emd_iters)
            emd = jnp.sum(emd_dist)
            loss = logpx * cfg.logpx_weight + emd * cfg.emd_weight
            if cfg.cd_weight:
                from puflow_tpu.ops.chamfer import chamfer_distance

                loss = loss + chamfer_distance(pred, dense) * cfg.cd_weight
            return loss, (new_bn, logpx, emd)

        (loss, (new_bn, logpx, emd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        # NaN guard (reference `:71-73`): skip the update on divergence
        # instead of stepping on garbage gradients.
        ok = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_bn = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_bn, bn_state)
        metrics = {"loss": loss, "logpx": logpx, "emd": emd,
                   "nan_step": jnp.logical_not(ok)}
        return params, new_bn, opt_state, metrics

    return train_step


def eval_step(params, bn_state, sparse, dense, upratio: int,
              forward_fn: Callable = discrete.forward):
    pred, logpx, _ = forward_fn(params, bn_state, sparse, upratio,
                                train=False)
    cd = jnp.sum(chamfer_distance_kaolin(pred, dense))
    return {"vloss": logpx, "CD": cd}


@functools.lru_cache(maxsize=None)
def _jitted_steps_cached(cfg: TrainConfig, forward_fn, mesh_key):
    mesh = _MESH_BY_KEY[mesh_key]
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    optimizer = make_optimizer(cfg)
    train = jax.jit(
        make_train_step(optimizer, cfg, forward_fn),
        in_shardings=(rep, rep, rep, bsh, bsh),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1, 2),
    )
    ev = jax.jit(
        lambda p, s, a, b: eval_step(p, s, a, b, cfg.upratio, forward_fn),
        in_shardings=(rep, rep, bsh, bsh), out_shardings=rep)
    return train, ev


_MESH_BY_KEY: dict = {}


def _jitted_steps(cfg: TrainConfig, forward_fn, mesh):
    """Shared jitted train/eval steps.

    Two Trainers with equal (cfg, forward_fn, mesh devices) reuse ONE pair
    of jit wrappers, so re-tracing (~10 s for the full train graph on this
    host) and recompiling happen once per process instead of once per
    Trainer — checkpoints/optimizer states stay interchangeable because
    `make_optimizer(cfg)` is deterministic in cfg."""
    mesh_key = (tuple(d.id for d in mesh.devices.flat),
                mesh.devices.shape, mesh.axis_names)
    _MESH_BY_KEY.setdefault(mesh_key, mesh)
    return _jitted_steps_cached(cfg, forward_fn, mesh_key)


class Trainer:
    """Host-side orchestration: sharding, epochs, plateau LR, checkpoints."""

    def __init__(self, cfg: TrainConfig, params, bn_state,
                 forward_fn: Callable = discrete.forward, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.optimizer = make_optimizer(cfg)
        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)

        # copy (not alias) incoming trees: the train step donates its inputs,
        # and device_put may return the caller's buffers unchanged
        self.params = jax.device_put(
            jax.tree.map(lambda x: np.array(x), params), rep)
        self.bn_state = jax.device_put(
            jax.tree.map(lambda x: np.array(x), bn_state), rep)
        self.opt_state = jax.device_put(self.optimizer.init(self.params), rep)

        self._train_step, self._eval_step = _jitted_steps(
            cfg, forward_fn, self.mesh)

        # ReduceLROnPlateau state (reference `train_pu1k.py:50`)
        self._lr = cfg.learning_rate
        self._best = float("inf")
        self._bad_epochs = 0
        self.history: list[dict] = []

    # -- LR plateau controller (runs between epochs, host-side) ------------
    def _plateau_update(self, monitored: float):
        if monitored < self._best - 1e-12:
            self._best = monitored
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > self.cfg.sched_patience:
                self._lr = max(self._lr * self.cfg.sched_factor,
                               self.cfg.min_lr)
                self._bad_epochs = 0

    def _set_lr(self):
        # inject_hyperparams exposes the lr inside opt_state. Locate its
        # state by the `hyperparams` attribute rather than a chain index so
        # an optax layout change fails loudly instead of silently freezing
        # the schedule.
        found = 0
        for stage in self.opt_state:
            hp = getattr(stage, "hyperparams", None)
            if isinstance(hp, dict) and "learning_rate" in hp:
                hp["learning_rate"] = jnp.asarray(self._lr, dtype=jnp.float32)
                found += 1
        if found != 1:
            raise RuntimeError(
                f"expected exactly one inject_hyperparams learning_rate in "
                f"opt_state, found {found} — optax layout changed?")

    def train_epoch(self, batches) -> dict:
        """batches: iterable of (sparse [B,N,3], dense [B,N*r,3]) numpy.

        Metrics stay on device until the epoch ends: a per-step `float()`
        costs a full host round-trip (~30ms on the remote TPU tunnel, more
        than half a train step).
        """
        self._set_lr()
        step_metrics, n = [], 0
        for sparse, dense in batches:
            self.params, self.bn_state, self.opt_state, m = self._train_step(
                self.params, self.bn_state, self.opt_state,
                jnp.asarray(sparse), jnp.asarray(dense))
            step_metrics.append(m)
            n += 1
        agg = {}
        if step_metrics:
            stacked = {k: np.asarray(jnp.stack([m[k] for m in step_metrics]))
                       for k in step_metrics[0]}
            agg = {k: float(v.mean()) for k, v in stacked.items()}
        return agg | {"steps": n, "lr": self._lr}

    def validate(self, batches) -> dict:
        step_metrics = []
        for sparse, dense in batches:
            step_metrics.append(self._eval_step(
                self.params, self.bn_state, jnp.asarray(sparse),
                jnp.asarray(dense)))
        if not step_metrics:
            return {"CD": 0.0, "vloss": 0.0}
        stacked = {k: np.asarray(jnp.stack([m[k] for m in step_metrics]))
                   for k in step_metrics[0]}
        # reference sums CD over validation batches (`train_pu1k.py:97-99`)
        return {"CD": float(stacked["CD"].sum()),
                "vloss": float(stacked["vloss"].sum()) * 1e-5}

    def fit(self, train_iter_fn, val_iter_fn, max_epochs=None,
            log_fn=print, checkpoint_fn=None):
        """Epoch loop. A KeyboardInterrupt stops cleanly and sets
        `self.interrupted` (reference semantics: the interrupt flag
        suppresses the final checkpoint save — `utils/callback.py:21-23`,
        `train_pu1k.py:172`)."""
        max_epochs = max_epochs or self.cfg.max_epochs
        self.interrupted = False
        try:
            for epoch in range(max_epochs):
                t0 = time.time()
                tr = self.train_epoch(train_iter_fn())
                va = self.validate(val_iter_fn()) if val_iter_fn else {}
                self._plateau_update(va.get("CD", tr["loss"]))
                row = {"epoch": epoch, **tr, **va,
                       "time_s": round(time.time() - t0, 2)}
                self.history.append(row)
                log_fn(f"[epoch {epoch:3d}] " + "  ".join(
                    f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in row.items() if k != "epoch"))
                if checkpoint_fn:
                    checkpoint_fn(epoch, self.params, self.bn_state)
        except KeyboardInterrupt:
            self.interrupted = True
            log_fn(f"interrupted at epoch {len(self.history)}")
        return self.history

    def numpy_params(self):
        return (jax.tree.map(np.asarray, self.params),
                jax.tree.map(np.asarray, self.bn_state))

    # -- full train-state checkpoint / resume ------------------------------
    # The reference deliberately ships only raw weight state_dicts and no
    # optimizer state (`train_pu1k.py:172-176`, SURVEY.md §5.4); here resume
    # restores optimizer moments and the plateau controller too.
    def save_train_state(self, path: str):
        import json

        from puflow_tpu.checkpoint import save_checkpoint

        opt_leaves = {
            f"opt/{i}": np.asarray(x)
            for i, x in enumerate(jax.tree.leaves(self.opt_state))
        }
        save_checkpoint(path, jax.tree.map(np.asarray, self.params),
                        jax.tree.map(np.asarray, self.bn_state))
        np.savez(path + ".opt.npz", **opt_leaves)
        meta = {
            "lr": self._lr, "best": self._best,
            "bad_epochs": self._bad_epochs,
            "epochs_done": len(self.history),
            "history": self.history,
        }
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)

    def restore_train_state(self, path: str):
        import json

        from puflow_tpu.checkpoint import load_npz_checkpoint
        from puflow_tpu.parallel.mesh import replicated

        rep = replicated(self.mesh)
        params, bn_state = load_npz_checkpoint(path)
        self.params = jax.device_put(params, rep)
        self.bn_state = jax.device_put(bn_state, rep)
        with np.load(path + ".opt.npz") as data:
            leaves = [data[f"opt/{i}"] for i in range(len(data.files))]
        treedef = jax.tree.structure(self.opt_state)
        self.opt_state = jax.device_put(
            jax.tree.unflatten(treedef, leaves), rep)
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        self._lr = meta["lr"]
        self._best = meta["best"]
        self._bad_epochs = meta["bad_epochs"]
        self.history = meta["history"]
        return meta["epochs_done"]
