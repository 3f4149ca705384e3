"""Training-path tests: every stage's loss/grad step runs, is finite, and
only the active stage's parameters change (freeze semantics,
ThreeDMatch/train.py:37-47); plus the data-parallel step on the virtual
8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from buffer_tpu.config import tiny_cfg
from buffer_tpu.core import se3
from buffer_tpu.models.composite import BufferModel
from buffer_tpu.pipeline.registration import PairInputs
from buffer_tpu.pipeline.train_forward import stage_loss, sample_matches, cal_so2_gt
from buffer_tpu.train import trainer as tr


def _make_batch(cfg, seed=0):
    rs = np.random.RandomState(seed)
    raw = rs.uniform(-0.6, 0.6, (700, 3)).astype(np.float32)
    raw[:, 2] = 0.2 * np.sin(4 * raw[:, 0]) + 0.15 * np.cos(3 * raw[:, 1]) + 1.4
    from buffer_tpu.ops.subsample import voxel_subsample_np
    sds = voxel_subsample_np(raw, cfg.data.voxel_size_0).astype(np.float32)
    R = np.asarray(se3.random_rotation(jax.random.PRNGKey(7), 3))
    t = np.array([0.1, 0.2, -0.1], np.float32)
    T = np.asarray(se3.integrate_trans(jnp.asarray(R), jnp.asarray(t)))

    def pad(x, n):
        o = np.zeros((n, 3), np.float32)
        o[: len(x)] = x[:n]
        m = np.zeros(n, bool)
        m[: min(len(x), n)] = True
        return o, m

    r0, m0 = pad(raw, cfg.static.raw_points)
    s0, n0 = pad(sds, cfg.static.points_l0)
    r1, m1 = pad(raw @ T[:3, :3].T + T[:3, 3], cfg.static.raw_points)
    s1, n1 = pad(sds @ T[:3, :3].T + T[:3, 3], cfg.static.points_l0)
    inputs = PairInputs(jnp.asarray(np.stack([r0, r1])),
                        jnp.asarray(np.stack([m0, m1])),
                        jnp.asarray(np.stack([s0, s1])),
                        jnp.asarray(np.stack([n0, n1])))
    return tr.TrainBatch(inputs=inputs, relt_pose=jnp.asarray(T))


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = BufferModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    batch = _make_batch(cfg)
    return cfg, model, variables, batch


def test_sample_matches_ground_truth(setup):
    cfg, model, variables, batch = setup
    m = sample_matches(jax.random.PRNGKey(0),
                       batch.inputs.sds[0], batch.inputs.sds_mask[0],
                       batch.inputs.sds[1], batch.inputs.sds_mask[1],
                       batch.relt_pose, cfg.data.voxel_size_0,
                       cfg.train.pos_num, cfg.static.knn_chunk)
    assert int(m.valid.sum()) > 10
    # matched pairs really are within the radius under the gt pose
    warped = se3.transform(batch.inputs.sds[0][m.src_idx], batch.relt_pose)
    d = jnp.linalg.norm(warped - batch.inputs.sds[1][m.tgt_idx], axis=-1)
    assert float(jnp.max(jnp.where(m.valid, d, 0.0))) < cfg.data.voxel_size_0


def test_cal_so2_gt_identity_frames():
    """With identity patch frames and gt rotation = Rz(theta), the label is
    theta's azimuth bin."""
    P, azi_n = 8, 20
    theta = 2 * jnp.pi * 7 / azi_n
    gt_R = np.asarray(se3.angles_to_rotation_matrix(
        jnp.array([0.0, 0.0, theta])))
    s_rand = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (P, 1))
    eye = jnp.tile(jnp.eye(3)[None], (P, 1, 1))
    lab = cal_so2_gt(s_rand, eye, eye, jnp.asarray(gt_R), azi_n, integer=True)
    # with identity frames t_rand = Rz(theta) @ s_rand, so the signed
    # deviation from s_rand to proj(t_rand) is +theta -> bin 7
    assert int(lab[0]) == 7


@pytest.mark.parametrize("stage", ["Ref", "Desc", "Keypt", "Inlier"])
def test_stage_loss_finite(setup, stage):
    cfg, model, variables, batch = setup
    loss, stats, upd = jax.jit(
        lambda v, b, k: stage_loss(model, v, stage, b.inputs, b.relt_pose, k,
                                   train=True))(variables, batch,
                                                jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), (stage, stats)
    for k, v in stats.items():
        assert np.isfinite(float(v)), (stage, k)


def test_train_step_updates_only_active_stage(setup):
    cfg, model, variables, batch = setup
    stage = "Desc"
    tx, _ = tr.make_optimizer(cfg, stage)
    step = tr.make_train_step(model, tx, stage, 1.05)
    opt_state = tx.init(variables[stage]["params"])
    new_vars, _, loss, stats = step(variables, opt_state, batch,
                                    jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    # Desc params changed
    d0 = jax.tree_util.tree_leaves(variables["Desc"]["params"])
    d1 = jax.tree_util.tree_leaves(new_vars["Desc"]["params"])
    assert any(not np.allclose(a, b) for a, b in zip(d0, d1))
    # Ref params frozen
    r0 = jax.tree_util.tree_leaves(variables["Ref"]["params"])
    r1 = jax.tree_util.tree_leaves(new_vars["Ref"]["params"])
    assert all(np.array_equal(a, b) for a, b in zip(r0, r1))
    # FROZEN stages run eval-mode (train_forward._stage_loss rationale):
    # their batch stats must NOT drift — the test composition loads each
    # stage's own snapshot, so drift would be discarded anyway.  The
    # ACTIVE stage's stats DO update.
    s0 = jax.tree_util.tree_leaves(variables["Ref"]["batch_stats"])
    s1 = jax.tree_util.tree_leaves(new_vars["Ref"]["batch_stats"])
    assert all(np.array_equal(a, b) for a, b in zip(s0, s1))
    a0 = jax.tree_util.tree_leaves(variables["Desc"]["batch_stats"])
    a1 = jax.tree_util.tree_leaves(new_vars["Desc"]["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(a0, a1))


def test_dp_train_step_8_devices(setup):
    cfg, model, variables, batch = setup
    devices = np.array(jax.devices())
    assert len(devices) == 8, "conftest must force 8 CPU devices"
    mesh = Mesh(devices, ("dp",))
    stage = "Ref"
    tx, _ = tr.make_optimizer(cfg, stage)
    opt_state = tx.init(variables[stage]["params"])
    step = tr.make_dp_train_step(model, tx, stage, mesh)

    stack = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * 8), batch)
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    new_vars, new_opt, loss, stats = step(variables, opt_state, stack, keys)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(new_vars[stage]["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_dp_register_8_devices():
    """Data-parallel EVAL: 8 independent pairs, one per device (eval
    throughput axis, SURVEY.md §2.3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from buffer_tpu.config import tiny_cfg
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.eval.harness import make_dp_register

    cfg = tiny_cfg()
    model = BufferModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    raw = rs.uniform(-0.6, 0.6, (600, 3)).astype(np.float32)
    raw[:, 2] = 0.2 * np.sin(4 * raw[:, 0]) + 1.4

    from buffer_tpu.pipeline.registration import PairInputs

    def pad(x, n):
        o = np.zeros((n, 3), np.float32)
        o[: min(len(x), n)] = x[:n]
        m = np.zeros(n, bool)
        m[: min(len(x), n)] = True
        return o, m

    r, mr = pad(raw, cfg.static.raw_points)
    s, ms = pad(raw[::2], cfg.static.points_l0)
    one = PairInputs(jnp.asarray(np.stack([r, r])),
                     jnp.asarray(np.stack([mr, mr])),
                     jnp.asarray(np.stack([s, s])),
                     jnp.asarray(np.stack([ms, ms])))
    D = 8
    binputs = jax.tree_util.tree_map(lambda x: jnp.stack([x] * D), one)

    mesh = Mesh(np.array(jax.devices()[:D]), ("dp",))
    fn = make_dp_register(model, mesh)
    res = fn(variables, binputs, jax.random.split(jax.random.PRNGKey(1), D))
    poses = np.asarray(res.pose)
    assert poses.shape == (D, 4, 4)
    assert np.isfinite(poses).all()
