#!/usr/bin/env python
"""Quick quality sanity: run the full registration on the synthetic bench
pair with converted reference weights; print RTE/RRE/match counts."""
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
    from buffer_tpu.pipeline.registration import make_register_fn
    from bench import synthetic_pair

    cfg = make_cfg("3DMatch")
    model = BufferModel(cfg)
    SNAP = "/root/reference/ThreeDMatch/snapshot/06132318"
    variables = load_variables(
        {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")})
    fn = make_register_fn(model)
    for seed in (0, 1, 2):
        inputs, T_gt = synthetic_pair(cfg, seed=seed)
        res = fn(variables, inputs, jax.random.PRNGKey(seed))
        pose = np.asarray(res.pose)
        rte = float(np.linalg.norm(pose[:3, 3] - T_gt[:3, 3]))
        rre = float(np.degrees(np.arccos(np.clip(
            (np.trace(pose[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1))))
        print(f"seed={seed} RTE={rte:.4f} m RRE={rre:.4f} deg "
              f"mutual={int(res.num_mutual)} inliers={int(res.num_inliers)}")


if __name__ == "__main__":
    main()
