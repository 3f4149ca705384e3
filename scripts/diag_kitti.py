#!/usr/bin/env python
"""Diagnose the KITTI synthetic-pair failure mode: for each mutual match,
test consistency with the GT pose vs the sensor-centric alias pose
(rotation-only, translation 0 in sensor frames)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    from buffer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from buffer_tpu.config import make_cfg
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.compat.torch_convert import load_variables
    from buffer_tpu.pipeline.registration import register_pair
    from buffer_tpu.data.synthetic import make_lidar_pair

    cfg = make_cfg("KITTI")
    model = BufferModel(cfg)
    SNAP = "/root/reference/KITTI/snapshot/06050001"
    variables = load_variables(
        {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")})

    inputs, T_gt = make_lidar_pair(cfg, np.random.RandomState(13))

    fn = jax.jit(lambda v, i, k: register_pair(model, v, i, k,
                                               return_intermediates=True))
    res, inter = fn(variables, inputs, jax.random.PRNGKey(0))

    kpts = np.asarray(inter["kpts"])        # [2, K, 3]
    m = inter["matches"]
    mutual = np.asarray(m.mutual)
    tgt_idx = np.asarray(m.tgt_idx)
    ss = kpts[0][mutual]
    tt = kpts[1][tgt_idx][mutual]

    R, t = T_gt[:3, :3], T_gt[:3, 3]
    d_true = np.linalg.norm(ss @ R.T + t - tt, axis=-1)
    d_alias = np.linalg.norm(ss @ R.T - tt, axis=-1)
    pose = np.asarray(res.pose)
    print(f"mutual={mutual.sum()}  pose_t={pose[:3, 3]}  gt_t={t}")
    for th in (0.3, 0.6, 2.0):
        print(f"th={th}: true-consistent={np.sum(d_true < th):4d}  "
              f"alias-consistent={np.sum(d_alias < th):4d}")
    # where do alias matches live? radial distance from sensor
    r_s = np.linalg.norm(ss[:, :2], axis=-1)
    al = d_alias < 0.6
    tr = d_true < 0.6
    print(f"alias match radius: median={np.median(r_s[al]):.1f} "
          f"p10={np.percentile(r_s[al], 10):.1f} p90={np.percentile(r_s[al], 90):.1f}"
          if al.sum() else "no alias matches")
    print(f"true  match radius: median={np.median(r_s[tr]):.1f}"
          if tr.sum() else "no true matches")
    # height of alias matches relative to local ground (~0 = ground ring)
    print(f"alias match z: median={np.median(ss[al][:, 2]):.2f}" if al.sum()
          else "")
    print(f"true  match z: median={np.median(ss[tr][:, 2]):.2f}" if tr.sum()
          else "")
    return 0


if __name__ == "__main__":
    sys.exit(main())
