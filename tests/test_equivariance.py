"""Property tests for the rotation structure of the learned stages
(SURVEY.md §4: the core invariant the Vector-Neuron design guarantees).

* EFCNN axes must CO-ROTATE with an SO(3) rotation of the input cloud
  (equivariance), up to the hemisphere orientation flip;
* DetNet saliency and EFCNN's epsilon must be INVARIANT.

Run with real converted weights when available, random weights otherwise.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from buffer_tpu.config import tiny_cfg
from buffer_tpu.core import se3
from buffer_tpu.models.composite import BufferModel
from buffer_tpu.pipeline.pyramid import build_pyramid_and_normals

SNAP = "/root/reference/ThreeDMatch/snapshot/06132318"
PATHS = {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")}


def _surface(n, seed):
    rs = np.random.RandomState(seed)
    pts = rs.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    pts[:, 2] = 0.25 * np.sin(5 * pts[:, 0]) + 0.2 * np.cos(4 * pts[:, 1]) + 1.3
    return pts


@pytest.mark.skipif(not os.path.exists(PATHS["Ref"]),
                    reason="reference checkpoints not present")
def test_efcnn_axis_equivariance():
    cfg = tiny_cfg()
    model = BufferModel(cfg)
    from buffer_tpu.compat.torch_convert import load_variables
    variables = load_variables(PATHS)

    pts = _surface(900, 0)
    from buffer_tpu.ops.subsample import voxel_subsample_np
    sds = voxel_subsample_np(pts, cfg.data.voxel_size_0).astype(np.float32)
    S = cfg.static.points_l0

    def pad(x):
        o = np.zeros((S, 3), np.float32)
        o[: len(x)] = x[:S]
        m = np.zeros(S, bool)
        m[: min(len(x), S)] = True
        return o, m

    R = np.asarray(se3.random_rotation(jax.random.PRNGKey(5), 3))

    def run(cloud):
        p, m = pad(cloud)
        pts2 = jnp.asarray(np.stack([p, p]))
        msk2 = jnp.asarray(np.stack([m, m]))
        pyr = build_pyramid_and_normals(cfg, pts2, msk2)
        axis, eps, _ = model.Ref.apply(variables["Ref"], pyr)
        score = model.Keypt.apply(
            variables["Keypt"], pyr,
            model.Ref.apply(variables["Ref"], pyr)[2])
        return (np.asarray(axis[0]), np.asarray(eps[0]),
                np.asarray(score[0]), np.asarray(m))

    a0, e0, s0, m = run(sds)
    a1, e1, s1, _ = run(sds @ R.T)

    # equivariance: axis(R p) == +- R axis(p) (sign free before the
    # hemisphere orientation step, models/BUFFER.py:244-249)
    lhs = a1[m]
    rhs = a0[m] @ R.T
    lhs_n = lhs / np.maximum(np.linalg.norm(lhs, axis=-1, keepdims=True), 1e-8)
    rhs_n = rhs / np.maximum(np.linalg.norm(rhs, axis=-1, keepdims=True), 1e-8)
    cos = np.abs(np.sum(lhs_n * rhs_n, axis=-1))
    # NOT exact even in the reference: the voxel grids of the pyramid are
    # axis-aligned and neighbor sets shift under rotation, so equivariance
    # holds only to the resolution of those artifacts
    assert np.median(cos) > 0.99, np.median(cos)
    assert (cos > 0.9).mean() > 0.9, (cos > 0.9).mean()

    # invariance of the scalar heads — checked as strong agreement, not
    # bitwise equality (the same grid/neighbor artifacts apply, and the
    # InstanceNorm couples every point's value to the whole cloud)
    def corr(a, b):
        a, b = a.ravel() - a.mean(), b.ravel() - b.mean()
        return float(np.sum(a * b) /
                     np.maximum(np.linalg.norm(a) * np.linalg.norm(b), 1e-9))

    assert corr(e0[m], e1[m]) > 0.7, corr(e0[m], e1[m])  # eps head is the most grid-sensitive
    # the saliency distribution is extremely spiky (softplus spans ~30
    # orders of magnitude), so compare in log space with a weak bound — the
    # detector's limited rotation stability is inherited from the reference
    # (grid artifacts cascade through its decoder the same way)
    ls0 = np.log10(s0[m] + 1e-30)
    ls1 = np.log10(s1[m] + 1e-30)
    assert corr(ls0, ls1) > 0.3, corr(ls0, ls1)


@pytest.mark.skipif(not os.path.exists(PATHS["Ref"]),
                    reason="reference checkpoints not present")
def test_detector_golden_snapshot():
    """Fixed-seed golden snapshot of the detector stack (VERDICT r1: the
    0.3-correlation equivariance gate alone cannot catch a real regression
    in the eps/saliency heads).

    Golden values live in tests/golden/detector.npz.  Regenerate after an
    INTENTIONAL numeric change with:

        REGEN_GOLDEN=1 python -m pytest tests/test_equivariance.py -k golden
    """
    cfg = tiny_cfg()
    model = BufferModel(cfg)
    from buffer_tpu.compat.torch_convert import load_variables
    variables = load_variables(PATHS)

    pts = _surface(900, 3)
    from buffer_tpu.ops.subsample import voxel_subsample_np
    sds = voxel_subsample_np(pts, cfg.data.voxel_size_0).astype(np.float32)
    S = cfg.static.points_l0
    p = np.zeros((S, 3), np.float32)
    p[: len(sds)] = sds[:S]
    m = np.zeros(S, bool)
    m[: min(len(sds), S)] = True

    pts2 = jnp.asarray(np.stack([p, p]))
    msk2 = jnp.asarray(np.stack([m, m]))
    pyr = build_pyramid_and_normals(cfg, pts2, msk2)
    axis, eps, branch = model.Ref.apply(variables["Ref"], pyr)
    score = model.Keypt.apply(variables["Keypt"], pyr, branch)
    got = {
        "axis": np.asarray(axis[0])[m][:64],
        "eps": np.asarray(eps[0])[m][:64, 0],
        "log_score": np.log10(np.asarray(score[0])[m][:64, 0] + 1e-30),
    }

    path = os.path.join(os.path.dirname(__file__), "golden", "detector.npz")
    if os.environ.get("REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path, **got)
        pytest.skip("regenerated golden snapshot")
    assert os.path.exists(path), "golden snapshot missing; run REGEN_GOLDEN=1"
    ref = np.load(path)
    np.testing.assert_allclose(got["axis"], ref["axis"], atol=1e-4)
    np.testing.assert_allclose(got["eps"], ref["eps"], atol=1e-4)
    # log-saliency spans ~30 decades; 1e-2 in log10 = 2.3% relative
    np.testing.assert_allclose(got["log_score"], ref["log_score"], atol=1e-2)
