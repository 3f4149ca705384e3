"""Stage-sequential trainer.

Port of the reference Trainer (``ThreeDMatch/trainer.py``) and stage loop
(``ThreeDMatch/train.py:22-108``): per-stage Adam (torch-style L2 weight
decay) with ExponentialLR stepped every ``scheduler_interval`` epochs,
non-finite-gradient step skipping (trainer.py:203-209), per-epoch
validation with best-checkpoint selection keyed on the stage metric
(trainer.py:70-87), and frozen non-active stages (train.py:37-47 —
freezing lives in the optimizer: only the active stage's params receive
updates, while every stage keeps updating batch statistics exactly like
the reference's whole-model ``.train()`` mode).

Also provides :func:`make_dp_train_step` — data parallelism over fragment
pairs on a ``jax.sharding.Mesh`` (the reference is single-GPU; DP is our
TPU-native scaling axis for its batch_size=1 workload).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from buffer_tpu.config import Config
from buffer_tpu.models.composite import BufferModel
from buffer_tpu.pipeline.registration import PairInputs
from buffer_tpu.pipeline.train_forward import stage_loss
from buffer_tpu.train.checkpoint import save_variables
from buffer_tpu.utils.logging import MetricLogger

BEST_METRIC = {"Ref": "ref_loss", "Desc": "desc_loss",
               "Keypt": "det_loss", "Inlier": "match_loss"}


class TrainBatch(NamedTuple):
    inputs: PairInputs
    relt_pose: jnp.ndarray   # [4, 4]


def make_optimizer(cfg: Config, stage: str):
    """Adam with torch-style L2 (grad += wd * param) and exponential decay
    stepped per-interval epochs (ThreeDMatch/train.py:50-53)."""
    lr0 = cfg.optim.lr[stage]
    interval = cfg.optim.scheduler_interval[stage]

    def lr_for_epoch(epoch: int) -> float:
        return lr0 * (cfg.optim.lr_decay ** (epoch // interval))

    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(cfg.optim.weight_decay),
            optax.adam(learning_rate),
        )
    )(learning_rate=lr0)
    return tx, lr_for_epoch


def make_train_step(model: BufferModel, tx, stage: str, det_margin: float):
    @jax.jit
    def step(variables, opt_state, batch: TrainBatch, key):
        def loss_fn(stage_params):
            v = dict(variables)
            v[stage] = {"params": stage_params,
                        "batch_stats": variables[stage]["batch_stats"]}
            loss, stats, upd = stage_loss(model, v, stage, batch.inputs,
                                          batch.relt_pose, key, train=True,
                                          det_margin=det_margin)
            return loss, (stats, upd)

        (loss, (stats, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables[stage]["params"])

        # non-finite gradient guard (trainer.py:203-209)
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))
        updates, new_opt = tx.update(grads, opt_state,
                                     variables[stage]["params"])
        new_params = optax.apply_updates(variables[stage]["params"], updates)
        pick = lambda a, b: jnp.where(finite, a, b)
        new_params = jax.tree_util.tree_map(pick, new_params,
                                            variables[stage]["params"])
        new_opt = jax.tree_util.tree_map(pick, new_opt, opt_state)

        new_vars = {s: {"params": new_params if s == stage else variables[s]["params"],
                        "batch_stats": upd[s]} for s in variables}
        stats = dict(stats, grad_finite=finite.astype(jnp.float32))
        return new_vars, new_opt, loss, stats

    return step


def make_eval_step(model: BufferModel, stage: str, det_margin: float):
    @jax.jit
    def step(variables, batch: TrainBatch, key):
        loss, stats, _ = stage_loss(model, variables, stage, batch.inputs,
                                    batch.relt_pose, key, train=False,
                                    det_margin=det_margin)
        return loss, stats

    return step


def make_dp_train_step(model: BufferModel, tx, stage: str, mesh: Mesh,
                       det_margin: float = 1.05):
    """Data-parallel train step: a batch of D fragment pairs sharded over
    the mesh's 'dp' axis; gradients and batch-stat updates are averaged
    across pairs (XLA inserts the all-reduce over ICI)."""

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("dp"))

    def step(variables, opt_state, batch: TrainBatch, keys):
        def loss_fn(stage_params):
            v = dict(variables)
            v[stage] = {"params": stage_params,
                        "batch_stats": variables[stage]["batch_stats"]}

            def per_pair(inputs, pose, key):
                return stage_loss(model, v, stage, inputs, pose, key,
                                  train=True, det_margin=det_margin)

            losses_, stats, upds = jax.vmap(per_pair)(
                batch.inputs, batch.relt_pose, keys)
            mean = lambda t: jax.tree_util.tree_map(
                lambda x: jnp.mean(x, axis=0), t)
            return jnp.mean(losses_), (mean(stats), mean(upds))

        (loss, (stats, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables[stage]["params"])

        # non-finite gradient guard, same semantics as the single-device
        # step (reference ThreeDMatch/trainer.py:203-209): the mean-reduced
        # grads are already replicated post-all-reduce, so one bad shard
        # makes the WHOLE step skip on every replica coherently — matching
        # the reference's "skip the step" rather than silently applying a
        # poisoned update.
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))
        updates, new_opt = tx.update(grads, opt_state,
                                     variables[stage]["params"])
        new_params = optax.apply_updates(variables[stage]["params"], updates)
        pick = lambda a, b: jnp.where(finite, a, b)
        new_params = jax.tree_util.tree_map(pick, new_params,
                                            variables[stage]["params"])
        new_opt = jax.tree_util.tree_map(pick, new_opt, opt_state)
        new_vars = {s: {"params": new_params if s == stage else variables[s]["params"],
                        "batch_stats": upd[s]} for s in variables}
        stats = dict(stats, grad_finite=finite.astype(jnp.float32))
        return new_vars, new_opt, loss, stats

    in_shardings = (repl, repl,
                    TrainBatch(
                        inputs=PairInputs(shard, shard, shard, shard),
                        relt_pose=shard),
                    shard)
    return jax.jit(step, in_shardings=in_shardings,
                   out_shardings=(repl, repl, repl, repl))


class Trainer:
    """Stage trainer driving host data iterators.

    ``data_iter_fn(split, epoch)`` must yield ``(TrainBatch, np.random-seeded
    key material)`` tuples with static shapes.
    """

    def __init__(self, cfg: Config, model: BufferModel, variables,
                 stage: str, save_dir: str,
                 logger: Optional[MetricLogger] = None):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.stage = stage
        self.save_dir = save_dir
        self.det_margin = 1.0 if cfg.data.dataset == "KITTI" else 1.05
        self.tx, self.lr_for_epoch = make_optimizer(cfg, stage)
        self.opt_state = self.tx.init(variables[stage]["params"])
        self.train_step = make_train_step(model, self.tx, stage, self.det_margin)
        self.eval_step = make_eval_step(model, stage, self.det_margin)
        self.logger = logger or MetricLogger(f"{save_dir}/metrics.jsonl")
        self.best = float("inf")

    def fit(self, train_iter_fn: Callable[[int], Iterable],
            val_iter_fn: Callable[[int], Iterable], rng_seed: int = 0):
        key = jax.random.PRNGKey(rng_seed)
        for epoch in range(self.cfg.train.epoch):
            self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                self.lr_for_epoch(epoch))
            key = self._epoch(train_iter_fn(epoch), epoch, key)
            res = self.evaluate(val_iter_fn(epoch), key)
            self.logger.log(epoch=epoch, split="val", stage=self.stage, **res)
            metric = res.get(BEST_METRIC[self.stage], float("inf"))
            if metric < self.best:
                self.best = metric
                save_variables(self.variables,
                               f"{self.save_dir}/{self.stage}/best.msgpack")
            save_variables(self.variables,
                           f"{self.save_dir}/{self.stage}/{epoch}.msgpack")
        return self.variables

    def _epoch(self, it, epoch: int, key):
        t0 = time.time()
        n = 0
        agg: Dict[str, float] = {}
        for batch in it:
            key, sub = jax.random.split(key)
            self.variables, self.opt_state, loss, stats = self.train_step(
                self.variables, self.opt_state, batch, sub)
            n += 1
            for k, v in stats.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            if n % 200 == 0:
                self.logger.log(epoch=epoch, iter=n, split="train",
                                stage=self.stage,
                                sec_per_iter=(time.time() - t0) / n,
                                **{k: v / n for k, v in agg.items()})
            if n >= self.cfg.train.max_iter:
                break
        return key

    def evaluate(self, it, key) -> Dict[str, float]:
        agg: Dict[str, float] = {}
        n = 0
        for batch in it:
            key, sub = jax.random.split(key)
            loss, stats = self.eval_step(self.variables, batch, sub)
            n += 1
            for k, v in stats.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        return {k: v / max(n, 1) for k, v in agg.items()}
