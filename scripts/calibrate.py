#!/usr/bin/env python
"""Offline neighbor-cap calibration.

The reference calibrates its ragged neighbor-list width at loader
construction by histogramming neighbor counts over ~2000 samples and
taking the 80th percentile per pyramid level
(``ThreeDMatch/dataloader.py:18-51``).  With static shapes that
calibration moves offline: run this against a dataset to print the
suggested ``StaticConfig`` caps (neighbor_caps / pool_caps / points_l*).

    python scripts/calibrate.py --config 3DMatch --data-root data/ThreeDMatch
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="3DMatch")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--samples", type=int, default=50)
    ap.add_argument("--keep-ratio", type=float, default=0.8)
    args = ap.parse_args()

    from buffer_tpu.config import make_cfg
    from buffer_tpu.kernels.host import radius_neighbors_host, voxel_subsample_host

    cfg = make_cfg(args.config)
    if args.data_root:
        cfg = cfg.replace(data=cfg.data.__class__(
            **{**cfg.data.__dict__, "root": args.data_root}))

    if cfg.data.dataset in ("3DMatch", "3DLoMatch"):
        from buffer_tpu.data.threedmatch import ThreeDMatchDataset as DS
    elif cfg.data.dataset == "KITTI":
        from buffer_tpu.data.kitti import KITTIDataset as DS
    else:
        from buffer_tpu.data.eth import ETHDataset as DS
    ds = DS("test", cfg)

    r0 = cfg.data.voxel_size_0 * cfg.point.conv_radius
    hist_cap = 256
    counts = {f"neighbors_l{l}": [] for l in range(3)}
    counts.update({f"pools_l{l}": [] for l in range(2)})
    sizes = {f"points_l{l}": [] for l in range(3)}
    sizes["raw"] = []

    n = min(len(ds), args.samples)
    for i in range(n):
        item = ds[i]
        for cloud in (item["src_fds_pts"], item["tgt_fds_pts"]):
            sizes["raw"].append(len(cloud))
            levels = [voxel_subsample_host(cloud, cfg.data.voxel_size_0)]
            for l in range(2):
                levels.append(voxel_subsample_host(
                    levels[-1], (2 ** (l + 1)) * cfg.data.voxel_size_0))
            for l, pts in enumerate(levels):
                sizes[f"points_l{l}"].append(len(pts))
                r = r0 * (2 ** l)
                _, c = radius_neighbors_host(pts, pts, r, hist_cap)
                counts[f"neighbors_l{l}"].extend(c.tolist())
                if l < 2:
                    _, c = radius_neighbors_host(levels[l + 1], pts, r, hist_cap)
                    counts[f"pools_l{l}"].extend(c.tolist())
        print(f"[{i + 1}/{n}] done", flush=True)

    print("\nSuggested StaticConfig values "
          f"(keep_ratio={args.keep_ratio}, like the reference's 80th pctile):")
    for k, v in counts.items():
        pct = int(np.percentile(v, args.keep_ratio * 100))
        print(f"  {k}: cap {pct} (max observed {max(v)})")
    for k, v in sizes.items():
        mx = max(v)
        print(f"  {k}: max {mx} -> pad {1 << int(np.ceil(np.log2(mx)))}")


if __name__ == "__main__":
    main()
