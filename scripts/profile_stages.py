#!/usr/bin/env python
"""Per-stage device-time profile of the registration pipeline.

The axon tunnel adds 20-180 ms of wall-clock per dispatch, so naive
per-dispatch timing is useless.  Each stage is timed with an ON-DEVICE
``lax.scan`` over n iterations (inputs perturbed per iteration to defeat
loop-invariant hoisting), differencing n=2 vs n=12.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

RTT_REPS = 3


def scan_time(make_body, n_lo=2, n_hi=12):
    """make_body(i) -> small output; returns ms per iteration."""
    import jax
    from buffer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    def run(n):
        def f(_):
            def body(c, i):
                out = make_body(i)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return c + jax.numpy.sum(leaf).astype(jax.numpy.float32), None
            tot, _ = jax.lax.scan(body, 0.0, jax.numpy.arange(n))
            return tot
        return jax.jit(f)

    f_lo, f_hi = run(n_lo), run(n_hi)

    def sync(g):
        best = 1e9
        for _ in range(RTT_REPS):
            t0 = time.time()
            np.asarray(g(0))
            best = min(best, time.time() - t0)
        return best

    t_lo = sync(f_lo)
    t_hi = sync(f_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1000.0


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="3DMatch",
                    choices=["3DMatch", "KITTI"])
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from buffer_tpu.config import make_cfg
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.compat.torch_convert import load_variables
    from buffer_tpu.pipeline.pyramid import build_pyramid_and_normals
    from buffer_tpu.pipeline import matching, ransac, refine
    from buffer_tpu.pipeline.registration import (PairInputs, orient_axes,
                                                  describe_cloud)
    from buffer_tpu.ops.sampling import farthest_point_sample
    from bench import synthetic_pair

    cfg = make_cfg(args.config)
    model = BufferModel(cfg)
    SNAPS = {"3DMatch": "/root/reference/ThreeDMatch/snapshot/06132318",
             "KITTI": "/root/reference/KITTI/snapshot/06050001"}
    SNAP = SNAPS[args.config]
    variables = load_variables(
        {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")})
    if args.config == "KITTI":
        import numpy as np
        from buffer_tpu.data.synthetic import make_lidar_pair
        inputs, T_gt = make_lidar_pair(cfg, np.random.RandomState(13))
    else:
        inputs, T_gt = synthetic_pair(cfg)
    K = cfg.point.num_keypts
    P = "highest"

    def jog(pts, i):
        # tiny per-iteration perturbation defeats loop hoisting without
        # changing behavior
        return pts + (i.astype(jnp.float32) * 1e-12)

    levels = (inputs.lvl1, inputs.lvl1_mask, inputs.lvl2, inputs.lvl2_mask)

    with jax.default_matmul_precision(P):
        ms = scan_time(lambda i: build_pyramid_and_normals(
            cfg, jog(inputs.sds, i), inputs.sds_mask,
            levels=(jog(levels[0], i), levels[1], jog(levels[2], i),
                    levels[3])).features)
        print(f"pyramid+normals      {ms:8.1f} ms", flush=True)

        pyr = jax.jit(lambda: build_pyramid_and_normals(
            cfg, inputs.sds, inputs.sds_mask, levels=levels))()

        def jog_pyr(i):
            return pyr._replace(features=jog(pyr.features, i))

        ms = scan_time(lambda i: model.Ref.apply(variables["Ref"], jog_pyr(i))[0])
        print(f"EFCNN (Ref)          {ms:8.1f} ms", flush=True)

        axis, eps, branch = jax.jit(
            lambda: model.Ref.apply(variables["Ref"], pyr))()
        axis = jax.jit(lambda: orient_axes(axis, inputs.sds))()

        ms = scan_time(lambda i: model.Keypt.apply(
            variables["Keypt"], jog_pyr(i),
            {"bottle": jog(branch["bottle"], i), "skips": branch["skips"]}))
        print(f"DetNet (Keypt)       {ms:8.1f} ms", flush=True)

        score = jax.jit(lambda: model.Keypt.apply(
            variables["Keypt"], pyr, branch)[..., 0])()

        def fps_stage(i):
            eligible = inputs.sds_mask & (score + i.astype(jnp.float32) * 1e-12
                                          > cfg.point.keypts_th)
            kidx, kvalid = jax.vmap(
                lambda p, e: farthest_point_sample(p, e, K))(inputs.sds, eligible)
            return kidx

        ms = scan_time(fps_stage)
        print(f"threshold+FPS        {ms:8.1f} ms", flush=True)

        eligible = inputs.sds_mask & (score > cfg.point.keypts_th)
        kidx, kvalid = jax.jit(lambda: jax.vmap(
            lambda p, e: farthest_point_sample(p, e, K))(inputs.sds, eligible))()
        kpts = jnp.take_along_axis(inputs.sds, kidx[..., None], axis=1)
        kaxes = jnp.take_along_axis(axis, kidx[..., None], axis=1)

        def desc_stage(i):
            d, e, R = describe_cloud(model, variables, cfg,
                                     jax.random.fold_in(jax.random.PRNGKey(0), i),
                                     jog(inputs.raw[0], i), inputs.raw_mask[0],
                                     kpts[0], kaxes[0])
            return d

        ms = scan_time(desc_stage)
        print(f"MiniSpinNet x1       {ms:8.1f} ms   (runs twice)", flush=True)

        k = jax.random.PRNGKey(0)
        s_des, s_equi, s_R = jax.jit(lambda: describe_cloud(
            model, variables, cfg, k, inputs.raw[0], inputs.raw_mask[0],
            kpts[0], kaxes[0]))()
        t_des, t_equi, t_R = jax.jit(lambda: describe_cloud(
            model, variables, cfg, k, inputs.raw[1], inputs.raw_mask[1],
            kpts[1], kaxes[1]))()

        ms = scan_time(lambda i: matching.mutual_matching(
            s_des + i.astype(jnp.float32) * 1e-12, t_des,
            kvalid[0], kvalid[1]).tgt_idx)
        print(f"mutual matching      {ms:8.1f} ms", flush=True)

        m = jax.jit(lambda: matching.mutual_matching(
            s_des, t_des, kvalid[0], kvalid[1]))()
        band = slice(1, cfg.patch.ele_n - 1)

        ms = scan_time(lambda i: model.Inlier.apply(
            variables["Inlier"], jog(s_equi[:, band], i), t_equi[m.tgt_idx][:, band]))
        print(f"cost volume          {ms:8.1f} ms", flush=True)

        ind = jax.jit(lambda: model.Inlier.apply(
            variables["Inlier"], s_equi[:, band], t_equi[m.tgt_idx][:, band]))()

        def vote_stage(i):
            ss_kpts = jog(kpts[0], i)
            tt_kpts = kpts[1][m.tgt_idx]
            R_h, t_h = matching.pose_hypotheses(ss_kpts, tt_kpts, s_R,
                                                t_R[m.tgt_idx], ind,
                                                cfg.patch.azi_n)
            best, vote_inliers = matching.vote_hypotheses(
                ss_kpts, tt_kpts, R_h, t_h, m.mutual, cfg.patch.azi_n,
                cfg.match.inlier_th)
            return vote_inliers

        ms = scan_time(vote_stage)
        print(f"hypotheses+voting    {ms:8.1f} ms", flush=True)

        vote_inliers = jax.jit(vote_stage)(jnp.int32(0))

        def ransac_stage(i):
            ss, tt = jog(kpts[0], i), kpts[1][m.tgt_idx]
            pose, inl = ransac.ransac_pose(
                jax.random.fold_in(k, i), ss, tt, vote_inliers,
                cfg.match.dist_th, cfg.match.similar_th, cfg.match.hypotheses)
            if cfg.test.pose_refine:
                pose = refine.post_refinement(pose, ss, tt, m.mutual, 0.10,
                                              iters=cfg.static.refine_iters)
            return pose

        ms = scan_time(ransac_stage)
        print(f"RANSAC+IRLS          {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
