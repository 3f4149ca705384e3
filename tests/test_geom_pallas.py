"""Interpreter-mode parity of the fused Pallas geometry kernels
(kernels/geom_pallas.py) against the XLA reference ops (ops/neighbors.py).
Shapes are tiny: the Pallas interpreter is slow on CPU."""

import functools

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.experimental import pallas as pl

import buffer_tpu.kernels.geom_pallas as gp
from buffer_tpu.ops import neighbors as nb


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(gp.pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def test_ball_sample_points_matches_xla():
    rs = np.random.RandomState(0)
    N, Q, k = 512, 40, 16
    sup = jnp.asarray(rs.randn(N, 3).astype(np.float32))
    valid = jnp.asarray(rs.rand(N) > 0.1)
    q = jnp.asarray((rs.randn(Q, 3) * 0.5).astype(np.float32))
    key = jax.random.PRNGKey(3)

    pts, v = gp.ball_sample_points_tpu.__wrapped__(
        key, q, sup, valid, 0.9, k, q_tile=8)
    idx, v_ref = nb.ball_sample(key, q, sup, valid, 0.9, k)
    ref_pts = jnp.take(sup, idx, axis=0)

    v, v_ref = np.asarray(v), np.asarray(v_ref)
    assert (v == v_ref).all()
    m = v
    diff = np.abs(np.asarray(pts) - np.asarray(ref_pts))[m]
    assert diff.max() == 0.0


def test_nearest_matches_numpy():
    rs = np.random.RandomState(1)
    N, Q = 512, 50
    sup = rs.randn(N, 3).astype(np.float32)
    valid = rs.rand(N) > 0.15
    q = (rs.randn(Q, 3) * 0.5).astype(np.float32)

    d2 = ((q[:, None, :] - sup[None, :, :]) ** 2).sum(-1)
    d2[:, ~valid] = np.inf
    i_np = d2.argmin(1)

    d, i = gp.nearest_tpu.__wrapped__(
        jnp.asarray(q), jnp.asarray(sup), jnp.asarray(valid),
        q_tile=16, seg=128)
    assert (np.asarray(i) == i_np).all()
    np.testing.assert_allclose(np.asarray(d), d2.min(1), rtol=1e-4, atol=1e-6)


import pytest


@pytest.mark.parametrize("vs", [4, 3])
def test_spt_pooled_matches_numpy_emulation(vs):
    """Stratified sampled-SPT kernel vs a direct numpy emulation of its
    spec: per anchor, the top-priority in-ball point of each of the first
    voxel_sample segments, folded-MLP'd and max-pooled with f0 fill.

    vs=3 exercises the dead-segment trim (S=64 -> NSEG=4 > NUSE=3, so the
    kernel drops the last 16 rows); vs=4 is the untrimmed path."""
    rs = np.random.RandomState(2)
    K, S = 3, 64
    rad_n, azi_n, ele_n = 2, 4, 3
    voxel_r = 0.4
    delta = (rs.randn(K, S, 3) * 0.4).astype(np.float32)
    W_all = (rs.randn(azi_n, 3, 16) * 0.5).astype(np.float32)
    b = rs.randn(16).astype(np.float32)
    f0 = np.maximum(b, 0.0)
    u = rs.rand(S).astype(np.float32)

    from buffer_tpu.core import gridmath
    pooled = gp.spt_pooled_tpu.__wrapped__(
        jnp.asarray(W_all), jnp.asarray(b), jnp.asarray(f0), jnp.asarray(u),
        jnp.asarray(delta), rad_n, azi_n, ele_n, voxel_r, vs)
    pooled = np.asarray(pooled)                       # [K,rad,ele,azi,16]

    anchors = gridmath.get_voxel_coordinate(
        1.0, rad_n, azi_n, ele_n).reshape(-1, 3)      # [(g)*azi + a, 3]
    G = rad_n * ele_n
    NSEG = max(vs, 1)
    while S % NSEG:
        NSEG += 1
    LS = S // NSEG
    for k in range(K):
        for gi in range(G):
            for a in range(azi_n):
                anc = anchors[gi * azi_n + a]
                feats = []
                for seg in range(vs):
                    sl = slice(seg * LS, (seg + 1) * LS)
                    d2 = ((delta[k, sl] - anc) ** 2).sum(-1)
                    inb = d2 <= voxel_r ** 2
                    if not inb.any():
                        feats.append(f0)   # empty slot = zero-fill -> f0
                        continue
                    cand = np.where(inb, u[sl], -1e18)
                    p = delta[k, sl][cand.argmax()]
                    feats.append(np.maximum(W_all[a].T @ p + b, 0.0))
                want = np.max(np.stack(feats), axis=0)
                got = pooled[k, gi // ele_n, gi % ele_n, a]
                np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_banded_knn_recall_on_sorted_cloud():
    """Interleaved-segment banded kNN on a Morton-sorted cloud: candidate
    sets must contain ~all true radius-kNN (the window covers the ball and
    3+ per-segment collisions are rare)."""
    from buffer_tpu.data.preprocess import morton_sort

    rs = np.random.RandomState(4)
    pts = morton_sort(rs.rand(4096, 3).astype(np.float32))
    valid = np.ones(4096, bool)
    k, r = 12, 0.06

    d, i, v = gp.banded_knn_tpu.__wrapped__(
        jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(valid),
        jnp.asarray(valid), k, r, q_tile=8, win_rows=16, n_segs=128)
    d, i, v = map(np.asarray, (d, i, v))

    qs = rs.choice(4096, 64, replace=False)
    rec = []
    for q in qs:
        d2 = ((pts[q] - pts) ** 2).sum(1)
        true = set(np.argsort(d2)[:k]) & set(np.where(d2 <= r * r)[0])
        got = set(i[q][v[q]])
        if true:
            rec.append(len(got & true) / len(true))
        # returned slots must be in-radius and distance-sorted
        assert (d[q][v[q]] <= r * r + 1e-6).all()
        assert (np.diff(d[q][v[q]]) >= -1e-6).all()
    assert np.mean(rec) > 0.97, np.mean(rec)


def test_banded_nn1_matches_bruteforce():
    """Banded 1-NN on a Morton-sorted cloud must return the true nearest
    support point (exact within the rank window; the window covers the
    whole cloud at this size)."""
    from buffer_tpu.data.preprocess import morton_sort

    rs = np.random.RandomState(5)
    q = morton_sort(rs.rand(2048, 3).astype(np.float32))
    s = morton_sort(rs.rand(2048, 3).astype(np.float32))
    sval = np.ones(2048, bool)
    sval[1500:1600] = False        # an invalid stretch must never win

    d, i = gp.banded_nn1_tpu.__wrapped__(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(sval),
        jnp.asarray(np.ones(2048, bool)), q_tile=8, win_rows=16, n_segs=128)
    d, i = np.asarray(d), np.asarray(i)

    d2 = ((q[:, None] - s[None]) ** 2).sum(-1)
    d2[:, ~sval] = 1e18
    true_i = d2.argmin(1)
    true_d = d2[np.arange(len(q)), true_i]
    # window covers everything here (16*128 = 2048 ranks) => exact match
    # except where the 16 packed mantissa bits make two support points
    # tie; such flips must themselves be near-ties in true distance
    agree = i == true_i
    assert agree.mean() > 0.995, agree.mean()
    flip_d = d2[np.where(~agree)[0], i[~agree]]
    np.testing.assert_allclose(flip_d, true_d[~agree], rtol=2e-2)
    np.testing.assert_allclose(d, true_d, rtol=1e-2)
    assert sval[i].all()


def test_nearest_common_morton_matches_bruteforce():
    """Joint-Morton banded 1-NN (train-time match mining) vs brute force:
    with a window covering typical rank skew, in-radius NNs must match."""
    from buffer_tpu.ops.neighbors import nearest_common_morton
    rs = np.random.RandomState(5)
    Q, S = 700, 900
    q = rs.randn(Q, 3).astype(np.float32)
    s = np.concatenate([q[: S - 200] + rs.randn(S - 200, 3).astype(np.float32) * 0.01,
                        rs.randn(200, 3).astype(np.float32) + 3.0]).astype(np.float32)
    qv = np.ones(Q, bool); qv[-13:] = False
    sv = np.ones(S, bool); sv[-7:] = False
    d2, nn = jax.jit(lambda *a: nearest_common_morton(*a, band=256))(
        jnp.asarray(q), jnp.asarray(qv), jnp.asarray(s), jnp.asarray(sv))
    d2, nn = np.asarray(d2), np.asarray(nn)
    full = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    full[:, ~sv] = 1e18
    true_nn = full.argmin(1)
    true_d = full.min(1)
    # banded may miss distant NNs; every CLOSE pair (the consumer's radius
    # regime) must be found exactly
    close = qv & (true_d < 0.02 ** 2)
    assert close.sum() > 400
    np.testing.assert_array_equal(nn[close], true_nn[close])
    # nearest_banded computes d2 in the expanded |q|^2+|s|^2-2qs form:
    # absolute error ~ a few ulps of |q||s| (~1e-6 here), which dominates
    # rtol at d2 ~ 1e-4; consumers only threshold at radius^2
    np.testing.assert_allclose(d2[close], true_d[close], atol=5e-6)


def test_fps_batched_matches_single(monkeypatch):
    """Batched in-kernel FPS (both clouds in one body) must reproduce the
    single-cloud kernel's selections exactly."""
    import functools
    import buffer_tpu.kernels.fps_pallas as fp
    monkeypatch.setattr(fp.pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    rs = np.random.RandomState(7)
    B, N, S = 2, 1024, 40
    pts = rs.randn(B, N, 3).astype(np.float32)
    elig = rs.rand(B, N) > 0.3
    got = np.asarray(fp.fps_pallas_batched(
        jnp.asarray(pts), jnp.asarray(elig), S))
    for b in range(B):
        want = np.asarray(fp.fps_pallas(
            jnp.asarray(pts[b]), jnp.asarray(elig[b]), S))
        np.testing.assert_array_equal(got[b], want)
