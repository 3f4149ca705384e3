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
