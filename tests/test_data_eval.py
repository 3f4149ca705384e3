"""Tests for data I/O, host kernels, and the evaluation metrics."""

import os

import numpy as np
import pytest

from buffer_tpu.data.ply import read_ply_points, write_ply_points
from buffer_tpu.eval import metrics
from buffer_tpu.kernels.host import (
    voxel_subsample_host, radius_neighbors_host, fps_host)
from buffer_tpu.ops.subsample import voxel_subsample_np


class TestPly:
    def test_roundtrip(self, tmp_path):
        pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        p = str(tmp_path / "x.ply")
        write_ply_points(p, pts)
        back = read_ply_points(p)
        np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_ascii(self, tmp_path):
        p = str(tmp_path / "a.ply")
        with open(p, "w") as f:
            f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n1 2 3\n4 5 6\n")
        pts = read_ply_points(p)
        np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])


class TestHostKernels:
    def test_subsample_matches_numpy(self):
        pts = np.random.RandomState(1).uniform(-2, 2, (3000, 3)).astype(np.float32)
        a = voxel_subsample_host(pts, 0.3)
        b = voxel_subsample_np(pts, 0.3)
        assert a.shape == b.shape
        sa, sb = a[np.lexsort(a.T)], b[np.lexsort(b.T)]
        np.testing.assert_allclose(sa, sb, atol=1e-5)

    def test_radius_neighbors_bruteforce(self):
        pts = np.random.RandomState(2).uniform(-1, 1, (800, 3)).astype(np.float32)
        q = pts[:50]
        idx, cnt = radius_neighbors_host(q, pts, 0.2, 12)
        d = np.linalg.norm(q[:, None] - pts[None], axis=-1)
        np.testing.assert_array_equal(np.minimum((d <= 0.2).sum(1), 12), cnt)
        for i in range(50):
            sel = idx[i, :cnt[i]]
            assert (d[i, sel] <= 0.2 + 1e-6).all()
            assert (np.diff(d[i, sel]) >= -1e-6).all()  # distance-sorted
            assert (idx[i, cnt[i]:] == 800).all()       # shadow index = N

    def test_fps_host(self):
        pts = np.random.RandomState(3).uniform(-1, 1, (500, 3)).astype(np.float32)
        idx = fps_host(pts, 32)
        assert idx[0] == 0 and len(set(idx.tolist())) == 32


class TestMetrics:
    def test_rte_rre(self):
        gt = np.eye(4)
        pose = np.eye(4)
        pose[:3, 3] = [0.1, 0, 0]
        rte, rre = metrics.rte_rre(pose, gt)
        assert rte == pytest.approx(0.1)
        assert rre < 1e-3

    def test_transformation_err_identity(self):
        info = np.eye(6) * 100.0
        assert metrics.compute_transformation_err(np.eye(4), info) == 0.0

    def test_evaluate_registration(self):
        # 5 fragments.  Index 0 must be a consecutive pair: the protocol
        # stores gt row indices in a matrix and tests `> 0`, so row 0 is
        # unmarkable — a reference quirk we reproduce faithfully
        # (ThreeDMatch/test.py:134-145).  Rows 1..2: one right, one wrong.
        gt_pairs = np.array([[0, 1, 5], [0, 2, 5], [1, 3, 5]])
        gt = np.tile(np.eye(4)[None], (3, 1, 1))
        info = np.tile((np.eye(6) * 50)[None], (3, 1, 1))
        bad = np.eye(4)
        bad[:3, 3] = [5, 5, 5]
        result = np.stack([np.eye(4), np.eye(4), bad])
        prec, rec = metrics.evaluate_registration(
            5, result, gt_pairs, gt_pairs, gt, info)
        assert rec == pytest.approx(0.5)

    def test_log_roundtrip(self, tmp_path):
        T = np.arange(16, dtype=float).reshape(4, 4)
        path = str(tmp_path / "s" / "est.log")
        metrics.write_trajectory(path, [("3", "7", T)])
        pairs, traj = metrics.read_trajectory(path)
        assert pairs[0][0] == "3" and pairs[0][1] == "7"
        np.testing.assert_allclose(traj[0], T)
        gt = metrics.load_log(path)
        np.testing.assert_allclose(gt["3_7"], T)
