"""Unit tests for core math and device ops against tiny hand-checked cases
and brute-force numpy oracles (the test pyramid the reference lacks,
SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from buffer_tpu.core import se3, gridmath
from buffer_tpu.ops import neighbors, sampling, subsample, normals


def rand_cloud(key, n, scale=1.0):
    return jax.random.uniform(key, (n, 3), minval=-scale, maxval=scale)


class TestSE3:
    def test_transform_roundtrip(self):
        key = jax.random.PRNGKey(0)
        pts = rand_cloud(key, 100)
        R = se3.random_rotation(jax.random.PRNGKey(1), 3)
        t = jnp.array([0.3, -0.2, 1.0])
        T = se3.integrate_trans(R, t)
        back = se3.transform(se3.transform(pts, T), se3.inverse(T))
        np.testing.assert_allclose(back, pts, atol=1e-5)

    def test_rotation_orthonormal(self):
        R = se3.random_rotation(jax.random.PRNGKey(2), 3)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(np.asarray(R)) == pytest.approx(1.0, abs=1e-6)

    def test_angle_axis(self):
        # rotation of pi/2 about z maps x->y
        aa = jnp.array([[0.0, 0.0, jnp.pi / 2]])
        R = se3.angle_axis_to_rotation_matrix(aa)[0]
        np.testing.assert_allclose(R @ jnp.array([1.0, 0, 0]),
                                   jnp.array([0.0, 1.0, 0]), atol=1e-6)

    def test_rodrigues_a_to_b(self):
        key = jax.random.PRNGKey(3)
        a = jax.random.normal(key, (8, 3))
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        b = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
        Rt = se3.rodrigues_a_to_b(a, b)
        # reference convention: row-vector product a @ R aligns a to b
        aligned = jnp.einsum("bi,bij->bj", a, Rt)
        np.testing.assert_allclose(aligned, b, atol=1e-5)

    def test_kabsch_recovers_pose(self):
        key = jax.random.PRNGKey(4)
        A = rand_cloud(key, 50)[None]
        R = se3.random_rotation(jax.random.PRNGKey(5), 3)
        t = jnp.array([1.0, 2.0, 3.0])
        B = se3.transform(A, se3.integrate_trans(R, t)[None])
        T = se3.kabsch(A, B)
        np.testing.assert_allclose(T[0, :3, :3], R, atol=1e-5)
        np.testing.assert_allclose(T[0, :3, 3], t, atol=1e-5)

    def test_quaternion(self):
        R = se3.random_rotation(jax.random.PRNGKey(6), 3)
        q = se3.rotation_matrix_to_quaternion(R)
        # rebuild rotation from quaternion and compare
        w, x, y, z = [np.asarray(q[i]) for i in range(4)]
        R2 = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-5)


class TestNeighbors:
    def test_radius_knn_vs_bruteforce(self):
        key = jax.random.PRNGKey(0)
        q = rand_cloud(key, 50)
        s = rand_cloud(jax.random.PRNGKey(1), 200)
        valid = jnp.ones(200, bool).at[190:].set(False)
        radius, k = 0.5, 8
        d, idx, v = neighbors.radius_knn(q, s, valid, k=k, radius=radius, chunk=64)
        d_np = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(s)[None], axis=-1) ** 2
        d_np[:, 190:] = np.inf
        d_np[d_np > radius**2] = np.inf
        for i in range(50):
            ref = np.sort(d_np[i])[:k]
            got = np.where(np.asarray(v[i]), np.asarray(d[i]), np.inf)
            finite = np.isfinite(ref)
            np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-4, atol=1e-5)
            assert not np.isfinite(got[~finite]).any()

    def test_radius_knn_query_chunking(self):
        key = jax.random.PRNGKey(2)
        q = rand_cloud(key, 100)
        s = rand_cloud(jax.random.PRNGKey(3), 128)
        valid = jnp.ones(128, bool)
        d1, i1, v1 = neighbors.radius_knn(q, s, valid, k=4, chunk=64, query_chunk=32)
        d2, i2, v2 = neighbors.radius_knn(q, s, valid, k=4, chunk=64, query_chunk=1000)
        np.testing.assert_allclose(d1, d2, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_nearest(self):
        q = rand_cloud(jax.random.PRNGKey(4), 64)
        s = rand_cloud(jax.random.PRNGKey(5), 300)
        valid = jnp.ones(300, bool).at[:5].set(False)
        d, idx = neighbors.nearest(q, s, valid, chunk=128)
        d_np = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(s)[None], axis=-1) ** 2
        d_np[:, :5] = np.inf
        np.testing.assert_array_equal(np.asarray(idx), d_np.argmin(1))

    def test_ball_sample_chunked(self):
        key = jax.random.PRNGKey(6)
        q = rand_cloud(jax.random.PRNGKey(7), 16, scale=0.5)
        s = rand_cloud(jax.random.PRNGKey(8), 512)
        valid = jnp.ones(512, bool)
        radius, k = 0.4, 32
        idx, v = neighbors.ball_sample_chunked(key, q, s, valid, radius, k, chunk=128)
        d_np = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(s)[None], axis=-1)
        for i in range(16):
            in_ball = set(np.where(d_np[i] <= radius)[0])
            chosen = np.asarray(idx[i])[np.asarray(v[i])]
            assert set(chosen.tolist()) <= in_ball
            assert len(set(chosen.tolist())) == len(chosen)  # no duplicates
            assert len(chosen) == min(k, len(in_ball))


class TestSampling:
    def test_fps_spread_and_mask(self):
        pts = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (256, 3)),
                          jnp.float32)
        eligible = jnp.ones(256, bool).at[128:].set(False)
        idx, valid = sampling.farthest_point_sample(pts, eligible, 32)
        assert valid.all()
        assert (np.asarray(idx) < 128).all()
        assert len(set(np.asarray(idx).tolist())) == 32
        # FPS must include extreme points early: max pairwise distance of the
        # selected set should approach that of the full eligible set
        d_all = np.linalg.norm(
            np.asarray(pts)[:128, None] - np.asarray(pts)[None, :128], axis=-1
        ).max()
        sel = np.asarray(pts)[np.asarray(idx)]
        d_sel = np.linalg.norm(sel[:, None] - sel[None], axis=-1).max()
        assert d_sel > 0.9 * d_all

    def test_fps_underfull(self):
        pts = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (64, 3)),
                          jnp.float32)
        eligible = jnp.zeros(64, bool).at[:10].set(True)
        idx, valid = sampling.farthest_point_sample(pts, eligible, 16)
        assert int(valid.sum()) == 10
        assert (np.asarray(idx)[:10] < 10).all()


class TestSubsample:
    def test_device_matches_host(self):
        pts = np.random.RandomState(2).uniform(-1, 1, (500, 3)).astype(np.float32)
        ref = subsample.voxel_subsample_np(pts, 0.25)
        out, mask = subsample.voxel_subsample(
            jnp.asarray(pts), jnp.ones(500, bool), 0.25, out_size=400)
        got = np.asarray(out)[np.asarray(mask)]
        # same set of barycenters (order-independent)
        ref_sorted = ref[np.lexsort(ref.T)]
        got_sorted = got[np.lexsort(got.T)]
        assert ref.shape == got.shape
        np.testing.assert_allclose(ref_sorted, got_sorted, atol=1e-5)

    def test_respects_validity(self):
        pts = np.zeros((10, 3), np.float32)
        pts[5:] = 100.0  # far cluster, marked invalid
        out, mask = subsample.voxel_subsample(
            jnp.asarray(pts), jnp.arange(10) < 5, 0.5, out_size=8)
        got = np.asarray(out)[np.asarray(mask)]
        assert got.shape == (1, 3)
        np.testing.assert_allclose(got[0], 0.0, atol=1e-6)


class TestNormals:
    def test_plane_normals(self):
        rs = np.random.RandomState(3)
        xy = rs.uniform(-1, 1, (400, 2))
        pts = np.concatenate([xy, np.full((400, 1), 2.0)], axis=1).astype(np.float32)
        n = normals.estimate_normals(jnp.asarray(pts), jnp.ones(400, bool),
                                     knn=16, chunk=128)
        n = np.asarray(n)
        # plane z=2 viewed from origin: normals ~ (0,0,-1)
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
        assert (n[:, 2] < 0).all()

    def test_eigvec_vs_numpy(self):
        rs = np.random.RandomState(4)
        M = rs.randn(32, 3, 3)
        A = (M @ M.transpose(0, 2, 1)).astype(np.float32)
        v = np.asarray(normals.smallest_eigvec_sym3(jnp.asarray(A)))
        w, V = np.linalg.eigh(A)
        ref = V[:, :, 0]
        dots = np.abs(np.sum(v * ref, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-3)

    def test_cal_z_axis_orientation(self):
        rs = np.random.RandomState(5)
        xy = rs.uniform(-1, 1, (1, 64, 2))
        local = np.concatenate([xy, 0.01 * rs.randn(1, 64, 1)], axis=-1)
        ref_point = np.array([[1.0, 1.0, 5.0]], np.float32)
        z = np.asarray(normals.cal_z_axis(jnp.asarray(local, jnp.float32),
                                          jnp.asarray(ref_point)))
        assert abs(z[0, 2]) > 0.99
        # orientation: sum(-z * ref) >= 0  (utils/common.py:718)
        assert -(z * ref_point).sum() >= 0


class TestGridMath:
    def test_voxel_grid_shape_and_radii(self):
        g = gridmath.get_voxel_coordinate(1.0, rad_n=3, azi_n=20, ele_n=7)
        assert g.shape == (3, 140, 3)
        r = np.linalg.norm(g, axis=-1)
        for i, expect in enumerate([1 / 6, 3 / 6, 5 / 6]):
            np.testing.assert_allclose(r[i], expect, atol=1e-6)

    def test_var_to_invar_rolls_azimuth(self):
        rad_n, azi_n, ele_n, ns = 1, 8, 1, 4
        g = gridmath.get_voxel_coordinate(1.0, rad_n, azi_n, ele_n)
        anchors = jnp.asarray(g.reshape(1, -1, 3), jnp.float32)
        pts = jnp.tile(anchors[:, :, None, :], (1, 1, ns, 1))
        rot = jnp.asarray(gridmath.azimuth_derotations(azi_n))
        out = gridmath.var_to_invar(pts, rot, rad_n, azi_n, ele_n)
        out = np.asarray(out)[0, :, 0, :]
        # after derotation every azimuth anchor lands on azimuth bin 0
        np.testing.assert_allclose(out, np.tile(out[:1], (azi_n, 1)), atol=1e-5)


class TestOffsetsPyramidPath:
    def test_offsets_path_matches_gather_path(self, monkeypatch):
        """The TPU branch of build_pyramid_and_normals (one shared
        coordinate gather -> normals_from_offsets + l0_off for the first
        conv) must reproduce the CPU branch's normals and neighbor tables.
        Forced on CPU by monkeypatching the module's backend check."""
        from buffer_tpu.config import tiny_cfg
        from buffer_tpu.pipeline import pyramid as pyr_mod

        cfg = tiny_cfg()
        rs = np.random.RandomState(0)
        B, N = 2, cfg.static.points_l0
        pts = jnp.asarray(rs.rand(B, N, 3).astype(np.float32))
        masks = jnp.asarray(np.ones((B, N), bool))

        ref = pyr_mod.build_pyramid_and_normals(cfg, pts, masks)
        assert ref.l0_off is None

        monkeypatch.setattr(pyr_mod, "_use_offsets_path", lambda: True)
        got = pyr_mod.build_pyramid_and_normals(cfg, pts, masks)
        monkeypatch.undo()

        np.testing.assert_array_equal(np.asarray(got.neighbors[0]),
                                      np.asarray(ref.neighbors[0]))
        np.testing.assert_array_equal(np.asarray(got.neighbor_valid[0]),
                                      np.asarray(ref.neighbor_valid[0]))
        # unit normals; offset-mean centering + the component-form
        # eigensolve reassociate the covariance sums, so near-degenerate
        # neighborhoods may move an eigvector slightly — compare by cosine
        a, b = np.asarray(got.features), np.asarray(ref.features)
        cos = (a * b).sum(-1)
        assert (cos > 1 - 1e-5).all(), cos.min()
        # l0_off must equal gathered neighbor - query at valid slots
        # (it travels as component planes [3, B, N, K])
        off = np.moveaxis(np.asarray(got.l0_off), 0, -1)
        idx = np.asarray(ref.neighbors[0])
        v = np.asarray(ref.neighbor_valid[0])
        p = np.asarray(pts)
        for b in range(B):
            want = p[b][np.minimum(idx[b], N - 1)] - p[b][:, None, :]
            np.testing.assert_allclose(off[b][v[b]], want[v[b]], atol=1e-6)
        assert (off[~v] == 0).all()
