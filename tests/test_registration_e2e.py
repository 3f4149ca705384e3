"""End-to-end registration test: a synthetic surface pair related by a known
SE(3) transform, run through the full jitted pipeline with the REAL
converted 3DMatch reference weights.  The pipeline must recover the pose —
this is the static-shape analog of the reference's eval-scripts-as-tests
strategy (SURVEY.md §4)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from buffer_tpu.config import tiny_cfg
from buffer_tpu.core import se3
from buffer_tpu.models.composite import BufferModel
from buffer_tpu.pipeline.registration import PairInputs, register_pair

SNAP = "/root/reference/ThreeDMatch/snapshot/06132318"
PATHS = {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")}


def synthetic_surface(n, seed=0):
    rs = np.random.RandomState(seed)
    pts = rs.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
    pts[:, 2] = (0.25 * np.sin(4 * pts[:, 0]) + 0.2 * np.cos(3 * pts[:, 1])
                 + 0.08 * np.sin(11 * pts[:, 0] * pts[:, 1]))
    # push away from the origin like a camera-frame fragment
    pts[:, 2] += 1.5
    return pts


def make_inputs(cfg, T):
    raw = synthetic_surface(900)
    from buffer_tpu.ops.subsample import voxel_subsample_np
    sds = voxel_subsample_np(raw, cfg.data.voxel_size_0).astype(np.float32)
    st = cfg.static
    R, S = st.raw_points, st.points_l0

    def pad(x, n):
        out = np.zeros((n, 3), np.float32)
        out[: len(x)] = x[:n]
        m = np.zeros((n,), bool)
        m[: min(len(x), n)] = True
        return out, m

    raw_t = (raw @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3])
    sds_t = (sds @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3])
    r0, m0 = pad(raw, R)
    r1, m1 = pad(raw_t, R)
    s0, n0 = pad(sds, S)
    s1, n1 = pad(sds_t, S)
    return PairInputs(
        raw=jnp.asarray(np.stack([r0, r1])),
        raw_mask=jnp.asarray(np.stack([m0, m1])),
        sds=jnp.asarray(np.stack([s0, s1])),
        sds_mask=jnp.asarray(np.stack([n0, n1])),
    )


@pytest.mark.skipif(not os.path.exists(PATHS["Ref"]),
                    reason="reference checkpoints not present")
def test_register_pair_recovers_pose():
    cfg = tiny_cfg()
    model = BufferModel(cfg)
    from buffer_tpu.compat.torch_convert import load_variables
    variables = load_variables(PATHS)

    R = np.asarray(se3.random_rotation(jax.random.PRNGKey(3), 3))
    t = np.array([0.25, -0.1, 0.3], np.float32)
    T_gt = np.asarray(se3.integrate_trans(jnp.asarray(R), jnp.asarray(t)))

    inputs = make_inputs(cfg, T_gt)
    res = jax.jit(lambda v, i, k: register_pair(model, v, i, k))(
        variables, inputs, jax.random.PRNGKey(0))

    pose = np.asarray(res.pose)
    rte = np.linalg.norm(pose[:3, 3] - T_gt[:3, 3])
    rre = np.degrees(np.arccos(
        np.clip((np.trace(pose[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1)))
    print(f"mutual={int(res.num_mutual)} inliers={int(res.num_inliers)} "
          f"RTE={rte:.4f} RRE={rre:.3f}")
    assert int(res.num_mutual) > 10
    assert rte < 0.05 and rre < 2.0, (rte, rre)


def test_register_pair_random_weights_no_nan():
    """With random weights the pose is meaningless but the pipeline must
    stay finite and fall back gracefully."""
    cfg = tiny_cfg()
    model = BufferModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    T = np.eye(4, dtype=np.float32)
    inputs = make_inputs(cfg, T)
    res = jax.jit(lambda v, i, k: register_pair(model, v, i, k))(
        variables, inputs, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(res.pose)).all()


KITTI_SNAP = "/root/reference/KITTI/snapshot/06050001"
KITTI_PATHS = {s: f"{KITTI_SNAP}/{s}/best.pth"
               for s in ("Ref", "Desc", "Keypt", "Inlier")}


def tiny_kitti_cfg():
    from dataclasses import replace
    from buffer_tpu.config import kitti_cfg, StaticConfig
    c = kitti_cfg()
    return c.replace(
        point=replace(c.point, num_keypts=64),
        static=StaticConfig(points_l0=512, points_l1=256, points_l2=128,
                            raw_points=1024, neighbor_caps=(16, 16, 16),
                            pool_caps=(16, 16), max_matches=64,
                            normal_knn=8, knn_chunk=256),
        match=replace(c.match, hypotheses=128),
    )


@pytest.mark.skipif(not os.path.exists(KITTI_PATHS["Ref"]),
                    reason="KITTI reference checkpoints not present")
def test_register_pair_kitti_preset():
    """The KITTI path differs structurally: identity patch frames
    (patch_embedder.py:143-148), pose_refine=False (KITTI/config.py:32),
    30x coarser voxels.  A LiDAR-scale synthetic pair must register."""
    cfg = tiny_kitti_cfg()
    model = BufferModel(cfg)
    from buffer_tpu.compat.torch_convert import load_variables
    variables = load_variables(KITTI_PATHS)

    rs = np.random.RandomState(5)
    raw = rs.uniform(-18, 18, (900, 3)).astype(np.float32)
    raw[:, 2] = (6.0 * np.sin(0.15 * raw[:, 0]) + 5.0 * np.cos(0.11 * raw[:, 1])
                 + 2.0 * np.sin(0.35 * raw[:, 0] * 0.2 * raw[:, 1]) + 40.0)

    ang = np.radians(8.0)
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([2.0, -1.5, 0.4], np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3], T_gt[:3, 3] = R, t

    from buffer_tpu.ops.subsample import voxel_subsample_np
    sds = voxel_subsample_np(raw, cfg.data.voxel_size_0).astype(np.float32)
    st = cfg.static

    def pad(x, n):
        out = np.zeros((n, 3), np.float32)
        out[: len(x)] = x[:n]
        m = np.zeros((n,), bool)
        m[: min(len(x), n)] = True
        return out, m

    raw_t = raw @ R.T + t
    sds_t = sds @ R.T + t
    r0, m0 = pad(raw, st.raw_points)
    r1, m1 = pad(raw_t, st.raw_points)
    s0, n0 = pad(sds, st.points_l0)
    s1, n1 = pad(sds_t, st.points_l0)
    inputs = PairInputs(
        raw=jnp.asarray(np.stack([r0, r1])),
        raw_mask=jnp.asarray(np.stack([m0, m1])),
        sds=jnp.asarray(np.stack([s0, s1])),
        sds_mask=jnp.asarray(np.stack([n0, n1])))

    res = jax.jit(lambda v, i, k: register_pair(model, v, i, k))(
        variables, inputs, jax.random.PRNGKey(0))
    pose = np.asarray(res.pose)
    rte = np.linalg.norm(pose[:3, 3] - t)
    rre = np.degrees(np.arccos(
        np.clip((np.trace(pose[:3, :3].T @ R) - 1) / 2, -1, 1)))
    print(f"KITTI mutual={int(res.num_mutual)} RTE={rte:.3f} RRE={rre:.3f}")
    assert int(res.num_mutual) > 10
    assert rte < 0.3 and rre < 1.0, (rte, rre)   # KITTI/test.py:66-67


@pytest.mark.skipif(not os.path.exists(PATHS["Ref"]),
                    reason="reference checkpoints not present")
def test_register_pair_generalization_scale():
    """ThreeD2ETH-style run: 3DMatch weights with test.scale != 1 dividing
    every conv neighborhood offset (models/point_learner.py:32,343) — the
    whole cross-domain mechanism.  Must compile and stay finite."""
    from dataclasses import replace as dreplace
    cfg = tiny_cfg()
    cfg = cfg.replace(test=dreplace(cfg.test, scale=5.0))
    model = BufferModel(cfg)
    from buffer_tpu.compat.torch_convert import load_variables
    variables = load_variables(PATHS)
    T = np.eye(4, dtype=np.float32)
    inputs = make_inputs(cfg, T)
    res = jax.jit(lambda v, i, k: register_pair(model, v, i, k))(
        variables, inputs, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(res.pose)).all()
