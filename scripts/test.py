#!/usr/bin/env python
"""Evaluation entry point — the analog of the reference's
``ThreeDMatch/test.py`` / ``KITTI/test.py`` / ``generalization/*/test.py``
(all seven configs are presets here).

Examples:
    python scripts/test.py --config 3DMatch --torch-weights \\
        /root/reference/ThreeDMatch/snapshot/06132318
    python scripts/test.py --config KITTI --weights snapshots/kitti
    python scripts/test.py --config ThreeD2ETH --torch-weights <3dmatch-snap>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="3DMatch",
                    choices=["3DMatch", "3DLoMatch", "KITTI", "ThreeD2ETH",
                             "ThreeD2KITTI", "KITTI2ThreeD", "KITTI2ETH"])
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--weights", default=None,
                    help="directory of per-stage msgpack checkpoints")
    ap.add_argument("--torch-weights", default=None,
                    help="reference snapshot dir with <stage>/best.pth")
    ap.add_argument("--max-pairs", type=int, default=None)
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="swap in the miniature static plan (CI fixtures)")
    args = ap.parse_args()

    from buffer_tpu.config import make_cfg, shrink_static
    from buffer_tpu.eval.harness import run_eval

    cfg = make_cfg(args.config).with_stage("test")
    if args.tiny:
        cfg = shrink_static(cfg)
    if args.data_root:
        cfg = cfg.replace(data=cfg.data.__class__(
            **{**cfg.data.__dict__, "root": args.data_root}))

    stages = ("Ref", "Desc", "Keypt", "Inlier")
    if args.torch_weights:
        from buffer_tpu.compat.torch_convert import load_variables
        variables = load_variables(
            {s: os.path.join(args.torch_weights, s, "best.pth") for s in stages})
    elif args.weights:
        from buffer_tpu.train.checkpoint import merge_stage_checkpoints
        variables = merge_stage_checkpoints(
            {s: os.path.join(args.weights, s, "best.msgpack") for s in stages})
    else:
        ap.error("need --weights or --torch-weights")

    name = cfg.data.dataset
    if name in ("3DMatch", "3DLoMatch"):
        from buffer_tpu.data.threedmatch import ThreeDMatchDataset
        dataset = ThreeDMatchDataset("test", cfg)
    elif name == "KITTI":
        from buffer_tpu.data.kitti import KITTIDataset
        dataset = KITTIDataset("test", cfg)
    elif name == "ETH":
        from buffer_tpu.data.eth import ETHDataset
        dataset = ETHDataset("test", cfg)
    else:
        raise ValueError(name)

    log_dir = args.log_dir or f"log_{name}_{args.config}"
    out = run_eval(cfg, variables, dataset, log_dir=log_dir,
                   max_pairs=args.max_pairs)
    print({k: round(v, 4) if isinstance(v, float) else v
           for k, v in out.items()})


if __name__ == "__main__":
    main()
