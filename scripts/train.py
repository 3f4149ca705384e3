#!/usr/bin/env python
"""Training entry point — the analog of the reference's
``ThreeDMatch/train.py`` / ``KITTI/train.py``: trains the four stages
sequentially (Ref -> Desc -> Keypt -> Inlier), each with the others frozen,
snapshotting the best checkpoint per stage.

    python scripts/train.py --config 3DMatch --out snapshots/3dmatch
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def data_iter(cfg, dataset, rs_seed):
    """Host iterator: dataset item -> static TrainBatch."""
    import jax.numpy as jnp
    from buffer_tpu.data.preprocess import prepare_pair
    from buffer_tpu.train.trainer import TrainBatch

    rs = np.random.RandomState(rs_seed)
    order = rs.permutation(len(dataset))
    for i in order:
        item = dataset[int(i)]
        inputs = prepare_pair(cfg, item["src_fds_pts"], item["tgt_fds_pts"],
                              rs=rs, already_downsampled=True)
        yield TrainBatch(inputs=inputs,
                         relt_pose=jnp.asarray(item["relt_pose"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="3DMatch", choices=["3DMatch", "KITTI"])
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--stages", nargs="*", default=None)
    ap.add_argument("--resume", default=None,
                    help="snapshot dir to warm-start all stages from")
    ap.add_argument("--tiny", action="store_true",
                    help="swap in the miniature static plan (CI fixtures)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--max-iter", type=int, default=None)
    args = ap.parse_args()

    import dataclasses
    import jax
    from buffer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from buffer_tpu.config import make_cfg, shrink_static
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.train.trainer import Trainer
    from buffer_tpu.train.checkpoint import load_file

    cfg = make_cfg(args.config)
    if args.tiny:
        cfg = shrink_static(cfg)
    tr_over = {}
    if args.epochs is not None:
        tr_over["epoch"] = args.epochs
    if args.max_iter is not None:
        tr_over["max_iter"] = args.max_iter
    if tr_over:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **tr_over))
    if args.data_root:
        cfg = cfg.replace(data=cfg.data.__class__(
            **{**cfg.data.__dict__, "root": args.data_root}))
    out = args.out or f"snapshot/{time.strftime('%m%d%H%M')}"
    os.makedirs(out, exist_ok=True)

    model = BufferModel(cfg)
    variables = model.init(jax.random.PRNGKey(cfg.data.manual_seed))
    stages = args.stages or list(cfg.train.all_stage)

    for stage in stages:
        scfg = cfg.with_stage(stage)
        if args.config == "KITTI":
            from buffer_tpu.data.kitti import KITTIDataset as DS
        else:
            from buffer_tpu.data.threedmatch import ThreeDMatchDataset as DS
        train_ds = DS("train", scfg)
        val_ds = DS("val", scfg)

        # load other stages' best checkpoints (freeze-and-merge,
        # ThreeDMatch/train.py:37-47)
        for other in cfg.train.all_stage:
            if other == stage:
                continue
            best = os.path.join(out, other, "best.msgpack")
            src = best if os.path.exists(best) else (
                os.path.join(args.resume, other, "best.msgpack")
                if args.resume else None)
            if src and os.path.exists(src):
                full = load_file(src, variables)
                variables[other] = full[other]

        trainer = Trainer(scfg, model, variables, stage, out)
        variables = trainer.fit(
            lambda epoch: data_iter(scfg, train_ds, cfg.data.manual_seed + epoch),
            lambda epoch: data_iter(scfg, val_ds, 10_000 + epoch),
            rng_seed=cfg.data.manual_seed)


if __name__ == "__main__":
    main()
