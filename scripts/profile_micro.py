#!/usr/bin/env python
"""Device-time micro-profile (scan-differencing; see profile_stages.py) of
EFCNN blocks, MiniSpinNet internals, and pyramid internals."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def scan_time(make_body, n_lo=2, n_hi=12, reps=3):
    import jax
    from buffer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    def run(n):
        def f(_):
            def body(c, i):
                out = make_body(i)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return c + jnp.sum(leaf).astype(jnp.float32), None
            tot, _ = jax.lax.scan(body, 0.0, jnp.arange(n))
            return tot
        return jax.jit(f)

    f_lo, f_hi = run(n_lo), run(n_hi)

    def sync(g):
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(g(0))
            best = min(best, time.time() - t0)
        return best

    t_lo = sync(f_lo)
    t_hi = sync(f_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from buffer_tpu.config import make_cfg
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.compat.torch_convert import load_variables
    from buffer_tpu.pipeline.pyramid import build_pyramid_and_normals
    from buffer_tpu.ops.neighbors import radius_knn, ball_sample
    from buffer_tpu.models import patch_embedder as pe
    from buffer_tpu.models.point_learner import VNNConvBlock, VNNResnetBlock, VNBlock
    from bench import synthetic_pair

    cfg = make_cfg("3DMatch")
    st = cfg.static
    model = BufferModel(cfg)
    SNAP = "/root/reference/ThreeDMatch/snapshot/06132318"
    variables = load_variables(
        {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")})
    inputs, _ = synthetic_pair(cfg)
    P = "highest"
    jog = lambda x, i: x + i.astype(jnp.float32) * 1e-12

    with jax.default_matmul_precision(P):
        levels = (inputs.lvl1, inputs.lvl1_mask, inputs.lvl2, inputs.lvl2_mask)
        pyr = jax.jit(lambda: build_pyramid_and_normals(
            cfg, inputs.sds, inputs.sds_mask, levels=levels))()

        # ---- pyramid internals ----
        r0 = cfg.data.voxel_size_0 * cfg.point.conv_radius
        k0 = max(st.normal_knn, st.neighbor_caps[0])
        ms = scan_time(lambda i: radius_knn(
            jog(inputs.sds[0], i), inputs.sds[0], inputs.sds_mask[0], k=k0,
            radius=None, chunk=st.knn_chunk, query_chunk=st.knn_chunk)[0])
        print(f"L0 knn 30720^2 k{k0} x1cloud {ms:8.1f} ms", flush=True)

        # ---- EFCNN blocks ----
        sub = lambda s: {"params": variables["Ref"]["params"][s],
                         "batch_stats": variables["Ref"]["batch_stats"][s]}
        b0 = VNNConvBlock(10, "6", 1.0)
        ms = scan_time(lambda i: b0.apply(
            sub("encoder_blocks_0"), jog(pyr.features, i), pyr.points[0],
            pyr.masks[0], pyr.points[0], pyr.neighbors[0], pyr.neighbor_valid[0]))
        print(f"EFCNN block0 L0x34 c1->10   {ms:8.1f} ms", flush=True)

        x0 = jax.jit(lambda: b0.apply(
            sub("encoder_blocks_0"), pyr.features, pyr.points[0],
            pyr.masks[0], pyr.points[0], pyr.neighbors[0],
            pyr.neighbor_valid[0]))()
        b1 = VNNResnetBlock(10, 1.0, strided=True)
        ms = scan_time(lambda i: b1.apply(
            sub("encoder_blocks_1"), jog(x0, i), pyr.points[1], pyr.masks[1],
            pyr.points[0], pyr.pools[0], pyr.pool_valid[0]))
        print(f"EFCNN block1 strided        {ms:8.1f} ms", flush=True)

        x1 = jax.jit(lambda: b1.apply(
            sub("encoder_blocks_1"), x0, pyr.points[1], pyr.masks[1],
            pyr.points[0], pyr.pools[0], pyr.pool_valid[0]))()
        b2 = VNNResnetBlock(20, 1.0)
        ms = scan_time(lambda i: b2.apply(
            sub("encoder_blocks_2"), jog(x1, i), pyr.points[1], pyr.masks[1],
            pyr.points[1], pyr.neighbors[1], pyr.neighbor_valid[1]))
        print(f"EFCNN block2 L1x34 c10->20  {ms:8.1f} ms", flush=True)

        x2 = jax.jit(lambda: b2.apply(
            sub("encoder_blocks_2"), x1, pyr.points[1], pyr.masks[1],
            pyr.points[1], pyr.neighbors[1], pyr.neighbor_valid[1]))()
        b3 = VNNResnetBlock(20, 1.0, strided=True)
        ms = scan_time(lambda i: b3.apply(
            sub("encoder_blocks_3"), jog(x2, i), pyr.points[2], pyr.masks[2],
            pyr.points[1], pyr.pools[1], pyr.pool_valid[1]))
        print(f"EFCNN block3 strided        {ms:8.1f} ms", flush=True)

        x3 = jax.jit(lambda: b3.apply(
            sub("encoder_blocks_3"), x2, pyr.points[2], pyr.masks[2],
            pyr.points[1], pyr.pools[1], pyr.pool_valid[1]))()
        b4 = VNNResnetBlock(40, 1.0)
        ms = scan_time(lambda i: b4.apply(
            sub("encoder_blocks_4"), jog(x3, i), pyr.points[2], pyr.masks[2],
            pyr.points[2], pyr.neighbors[2], pyr.neighbor_valid[2]))
        print(f"EFCNN block4 L2x34 c20->40  {ms:8.1f} ms", flush=True)

        # decoder VN blocks (pointwise)
        from buffer_tpu.models.point_learner import nearest_upsample
        x4 = jax.jit(lambda: b4.apply(
            sub("encoder_blocks_4"), x3, pyr.points[2], pyr.masks[2],
            pyr.points[2], pyr.neighbors[2], pyr.neighbor_valid[2]))()

        def dec(i):
            x = nearest_upsample(jog(x4, i), pyr.upsamples[1], pyr.upsample_valid[1])
            x = jnp.concatenate([x, x2], axis=-1)
            x = VNBlock(20).apply(sub("decoder_blocks_1"), x, pyr.masks[1])
            x = nearest_upsample(x, pyr.upsamples[0], pyr.upsample_valid[0])
            x = jnp.concatenate([x, x0], axis=-1)
            return VNBlock(10).apply(sub("decoder_blocks_3"), x, pyr.masks[0])
        ms = scan_time(dec)
        print(f"EFCNN decoder               {ms:8.1f} ms", flush=True)

        xdec = jax.jit(dec)(jnp.int32(0))
        from buffer_tpu.nn.vn import VNLinearLeakyReLUFlat
        from buffer_tpu.models.point_learner import InvariantHead

        def heads(i):
            h = VNLinearLeakyReLUFlat(5).apply(
                sub("fc_layer_0"), jog(xdec, i), mask=pyr.masks[0])
            h = VNLinearLeakyReLUFlat(1).apply(
                sub("fc_layer_1"), h, mask=pyr.masks[0])
            e = InvariantHead(10, "sigmoid").apply(
                sub("inv_layer"), jog(xdec, i), pyr.masks[0])
            return h[..., 0] + e[..., 0]
        ms = scan_time(heads)
        print(f"EFCNN heads (axis+inv)      {ms:8.1f} ms", flush=True)

        # ---- MiniSpinNet internals ----
        from buffer_tpu.ops.sampling import farthest_point_sample
        score = jax.jit(lambda: model.Keypt.apply(
            variables["Keypt"], pyr, model.Ref.apply(
                variables["Ref"], pyr)[2])[..., 0])()
        eligible = inputs.sds_mask & (score > cfg.point.keypts_th)
        kidx, kvalid = jax.jit(lambda: jax.vmap(
            lambda p, e: farthest_point_sample(p, e, cfg.point.num_keypts))(
            inputs.sds, eligible))()
        kpts = jnp.take_along_axis(inputs.sds, kidx[..., None], axis=1)
        key = jax.random.PRNGKey(0)
        p = cfg.patch

        ms = scan_time(lambda i: pe.extract_patches(
            jax.random.fold_in(key, i), jog(inputs.raw[0], i),
            inputs.raw_mask[0], kpts[0], p.des_r, p.num_points_per_patch))
        print(f"SpinNet extract_patches     {ms:8.1f} ms", flush=True)

        patches = jax.jit(lambda: pe.extract_patches(
            key, inputs.raw[0], inputs.raw_mask[0], kpts[0], p.des_r,
            p.num_points_per_patch))()
        axis = jax.jit(lambda: model.Ref.apply(variables["Ref"], pyr)[0])()
        from buffer_tpu.pipeline.registration import orient_axes
        axis = jax.jit(lambda: orient_axes(axis, inputs.sds))()
        kaxes = jnp.take_along_axis(axis, kidx[..., None], axis=1)

        ms = scan_time(lambda i: pe.axis_align(
            jog(patches, i), cfg.data.dataset, kaxes[0])[0])
        print(f"SpinNet axis_align          {ms:8.1f} ms", flush=True)

        delta = jax.jit(lambda: pe.axis_align(
            patches, cfg.data.dataset, kaxes[0])[0] / p.des_r)()

        ms = scan_time(lambda i: pe.fused_point_features(
            variables["Desc"]["params"], variables["Desc"]["batch_stats"],
            jax.random.fold_in(key, i), jog(delta, i), p.rad_n, p.azi_n,
            p.ele_n, p.delta / p.rad_n, p.voxel_sample))
        print(f"SpinNet fused front         {ms:8.1f} ms", flush=True)

        pooled = jax.jit(lambda: pe.fused_point_features(
            variables["Desc"]["params"], variables["Desc"]["batch_stats"],
            key, delta, p.rad_n, p.azi_n, p.ele_n, p.delta / p.rad_n,
            p.voxel_sample))()

        ms = scan_time(lambda i: model.Desc.apply(
            variables["Desc"], pooled=jog(pooled, i))[0])
        print(f"SpinNet cylindrical CNN     {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
