"""Evaluation harnesses mirroring the reference test entry points
(``ThreeDMatch/test.py``, ``KITTI/test.py``, ``generalization/*/test.py``):
run every pair through the jitted registration pipeline, write
Redwood-format trajectories, report DGR recall (RTE/RRE thresholds per
dataset) and — for 3DMatch/3DLoMatch — the covariance-weighted
Registration Recall against ``gt.info``.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterable, Optional

import numpy as np
import jax

from buffer_tpu.config import Config
from buffer_tpu.data.preprocess import prepare_pair
from buffer_tpu.eval import metrics
from buffer_tpu.models.composite import BufferModel
from buffer_tpu.pipeline.registration import register_pair
from buffer_tpu.utils.logging import MetricLogger, Timer

# DGR pass thresholds per evaluation (BASELINE.md)
THRESHOLDS = {
    "3DMatch": (0.3, 15.0),   # ThreeDMatch/test.py:264-265
    "3DLoMatch": (0.3, 15.0),
    "KITTI": (0.3, 1.0),      # KITTI/test.py:66-67
    "ETH": (0.3, 2.0),        # generalization/ThreeD2ETH/test.py:66-67
}


def _prefetch(cfg: Config, dataset, n: int, rs, data_timer: Timer,
              depth: int = 2):
    """Producer thread running the host prep (dataset IO + prepare_pair)
    ahead of device compute — the TPU-native analog of the reference's 16
    DataLoader workers (ThreeDMatch/dataloader.py:257-264).  numpy releases
    the GIL, so prep overlaps the device dispatch even on one core."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def producer():
        try:
            for i in range(n):
                data_timer.tic()
                item = dataset[i]
                inputs = prepare_pair(
                    cfg, item["src_fds_pts"], item["tgt_fds_pts"],
                    rs=rs, already_downsampled=True)
                data_timer.toc()
                q.put((i, item, inputs))
        except BaseException as e:   # surface loader errors to the consumer
            q.put(e)
            return
        q.put(None)

    threading.Thread(target=producer, daemon=True).start()

    while True:
        got = q.get()
        if got is None:
            return
        if isinstance(got, BaseException):
            raise got
        yield got


def run_eval(
    cfg: Config,
    variables,
    dataset: Iterable,
    log_dir: Optional[str] = None,
    max_pairs: Optional[int] = None,
    seed: int = 0,
    logger: Optional[MetricLogger] = None,
    use_dp: Optional[bool] = None,
) -> Dict[str, float]:
    """Evaluate all pairs.  Host prep runs on a prefetch thread; when more
    than one device is visible (``use_dp`` unset => auto) pairs are batched
    through :func:`make_dp_register`, one pair per device."""
    from buffer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    model = BufferModel(cfg)
    logger = logger or MetricLogger(echo=True)
    rte_th, rre_th = THRESHOLDS[cfg.data.dataset]

    n = len(dataset) if max_pairs is None else min(len(dataset), max_pairs)
    D = len(jax.devices())
    if use_dp is None:
        use_dp = D > 1 and n >= D
    if use_dp:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        dp_fn = make_dp_register(model, mesh)
    else:
        # single device: register U independent pairs per XLA program
        # (static unroll — XLA interleaves the chains and hides each
        # pair's serial tails; see make_unrolled_register_fn).  Per-pair
        # results are identical to one-at-a-time registration.
        U = max(1, int(getattr(cfg.static, "pair_unroll", 1))) if n > 1 else 1
        if U > 1:
            from buffer_tpu.pipeline.registration import (
                make_unrolled_register_fn)
            un_fn = make_unrolled_register_fn(model, U)
        else:
            fn = jax.jit(lambda v, i, k: register_pair(model, v, i, k))

    data_timer, model_timer = Timer(), Timer()
    states = []
    entries_by_scene: Dict[str, list] = {}
    key = jax.random.PRNGKey(seed)
    rs = np.random.RandomState(cfg.data.manual_seed)

    def record(i, item, pose, num_mutual):
        pose = np.asarray(pose, np.float64)
        gt = np.asarray(item["relt_pose"], np.float64)
        rte, rre = metrics.rte_rre(pose, gt)
        ok = rte < rte_th and rre < rre_th
        states.append([float(ok), rte, rre])
        if not ok:
            logger.log(event="fail", pair=i, rte=rte, rre=rre,
                       mutual=int(num_mutual))
        if log_dir is not None and "/" in item["src_id"]:
            scene = item["src_id"].split("/")[-2]
            sid = item["src_id"].split("/")[-1].split("_")[-1]
            tid = item["tgt_id"].split("/")[-1].split("_")[-1]
            entries_by_scene.setdefault(scene, []).append(
                (sid, tid, np.linalg.inv(pose)))

    pending = []   # [(i, item, inputs)] batch accumulator for the dp path

    def flush_dp():
        nonlocal key
        if not pending:
            return
        batch = pending[:]
        while len(batch) < D:       # pad the tail batch: results discarded
            batch.append(batch[-1])
        binputs = jax.tree_util.tree_map(
            lambda *xs: jnp_stack(xs), *[b[2] for b in batch])
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, D)
        model_timer.tic()
        res = jax.block_until_ready(dp_fn(variables, binputs, keys))
        model_timer.toc()
        poses = np.asarray(res.pose)
        nmut = np.asarray(res.num_mutual)
        for j, (i, item, _) in enumerate(pending):
            record(i, item, poses[j], nmut[j])
        pending.clear()

    def jnp_stack(xs):
        import jax.numpy as jnp
        return jnp.stack(xs)

    def flush_unrolled():
        nonlocal key
        if not pending:
            return
        batch = pending[:]
        while len(batch) < U:       # pad the tail batch: results discarded
            batch.append(batch[-1])
        binputs = jax.tree_util.tree_map(
            lambda *xs: jnp_stack(xs), *[b[2] for b in batch])
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, U)
        model_timer.tic()
        res = jax.block_until_ready(un_fn(variables, binputs, keys))
        model_timer.toc()
        poses = np.asarray(res.pose)
        nmut = np.asarray(res.num_mutual)
        for j, (i, item, _) in enumerate(pending):
            record(i, item, poses[j], nmut[j])
        pending.clear()

    for i, item, inputs in _prefetch(cfg, dataset, n, rs, data_timer):
        if use_dp:
            pending.append((i, item, inputs))
            if len(pending) == D:
                flush_dp()
        elif U > 1:
            pending.append((i, item, inputs))
            if len(pending) == U:
                flush_unrolled()
        else:
            model_timer.tic()
            key, sub = jax.random.split(key)
            res = jax.block_until_ready(fn(variables, inputs, sub))
            model_timer.toc()
            record(i, item, res.pose, res.num_mutual)
    if use_dp:
        flush_dp()
    elif U > 1:
        flush_unrolled()

    states = np.array(states)
    out = metrics.dgr_recall(states)
    out["data_time"] = data_timer.avg
    # unrolled steps register U pairs per timed dispatch: report per-pair
    out["model_time"] = model_timer.avg / (
        U if (not use_dp and U > 1) else 1)
    out["pairs"] = len(states)

    if log_dir is not None:
        for scene, entries in entries_by_scene.items():
            metrics.write_trajectory(
                os.path.join(log_dir, scene, "est.log"), entries)
        if cfg.data.dataset in ("3DMatch", "3DLoMatch"):
            rr = registration_recall(cfg, log_dir)
            if rr is not None:
                out["registration_recall"] = rr
    logger.log(event="summary", dataset=cfg.data.dataset, **out)
    return out


def registration_recall(cfg: Config, log_dir: str) -> Optional[float]:
    """Scene-averaged Redwood RR (ThreeDMatch/test.py:287-308)."""
    if cfg.data.dataset == "3DMatch":
        gtroot = os.path.join(cfg.data.root, "test", "3DMatch", "gt_result")
    else:
        gtroot = os.path.join(cfg.data.root, "test", "3DLoMatch")
    if not os.path.isdir(gtroot):
        return None
    recalls = []
    for scene in sorted(os.listdir(gtroot)):
        gt_pairs, gt_traj = metrics.read_trajectory(
            os.path.join(gtroot, scene, "gt.log"))
        n_frag, cov = metrics.read_trajectory_info(
            os.path.join(gtroot, scene, "gt.info"))
        est_path = os.path.join(log_dir, scene, "est.log")
        if not os.path.exists(est_path):
            continue
        est_pairs, est_traj = metrics.read_trajectory(est_path)
        _, rec = metrics.evaluate_registration(
            n_frag, est_traj, est_pairs.astype(float).astype(int),
            gt_pairs.astype(float).astype(int), gt_traj, cov)
        recalls.append(rec)
    return float(np.mean(recalls)) if recalls else None


def make_dp_register(model: BufferModel, mesh):
    """Data-parallel registration: a batch of D independent fragment pairs,
    one per device on the mesh's 'dp' axis (SURVEY.md §2.3 — eval pairs are
    independent, batch_size=1 in the reference; sharding them over chips is
    the TPU-native eval-throughput axis the single-GPU reference lacks).

    Returns a jitted fn (variables, batched PairInputs, keys[D]) ->
    RegistrationResult with a leading D axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from buffer_tpu.pipeline.registration import PairInputs

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("dp"))

    def fn(variables, binputs, keys):
        return jax.vmap(
            lambda inp, k: register_pair(model, variables, inp, k),
            in_axes=(0, 0))(binputs, keys)

    in_shardings = (repl,
                    PairInputs(*([shard] * len(PairInputs._fields))),
                    shard)
    return jax.jit(fn, in_shardings=in_shardings, out_shardings=shard)
