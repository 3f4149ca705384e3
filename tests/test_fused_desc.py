"""Fused (gather-free) descriptor front-end vs the reference-exact sampled
path, with real converted weights: descriptors must agree closely (both are
random subsamples of the same balls, so bitwise equality is not expected —
but matching behavior must be preserved)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from buffer_tpu.models import patch_embedder as pe
from buffer_tpu.models.patch_embedder import MiniSpinNet

SNAP = "/root/reference/ThreeDMatch/snapshot/06132318"
PATHS = {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")}


@pytest.mark.skipif(not os.path.exists(PATHS["Desc"]),
                    reason="reference checkpoints not present")
def test_fused_matches_sampled():
    from buffer_tpu.compat.torch_convert import load_variables
    variables = load_variables(PATHS)["Desc"]

    rs = np.random.RandomState(0)
    K, S = 48, 512
    # surface-patch-like normalized coords in the unit ball
    delta = rs.uniform(-1, 1, (K, S, 3)).astype(np.float32)
    delta[..., 2] *= 0.15
    delta /= np.maximum(np.linalg.norm(delta, axis=-1, keepdims=True), 1.0)
    delta = jnp.asarray(delta)

    rad_n, azi_n, ele_n, vs = 3, 20, 7, 10
    voxel_r = 0.8 / rad_n
    net = MiniSpinNet(rad_n, azi_n, ele_n)

    def sampled(key):
        inv = pe.spt(key, delta, rad_n, azi_n, ele_n, voxel_r, vs)
        return net.apply(variables, inv)[0]

    def fused(key):
        pooled = pe.fused_point_features(
            variables["params"], variables["batch_stats"], key,
            delta, rad_n, azi_n, ele_n, voxel_r, vs)
        return net.apply(variables, pooled=pooled)[0]

    d1 = sampled(jax.random.PRNGKey(1))
    d2 = sampled(jax.random.PRNGKey(2))
    d3 = fused(jax.random.PRNGKey(3))

    # the sampled path is itself stochastic (random ball subsets); the fused
    # path must sit at that noise floor, not merely at an absolute bound
    floor = float(jnp.sum(d1 * d2, -1).mean())
    cross = float(jnp.sum(d1 * d3, -1).mean())
    assert cross > 0.98, cross
    assert cross > floor - 0.005, (cross, floor)


@pytest.mark.skipif(not os.path.exists(PATHS["Desc"]),
                    reason="reference checkpoints not present")
def test_fused_exact_without_subsampling():
    """With voxel_sample >= patch size neither path subsamples, so the
    pooled maps must agree to float tolerance (validates the BN/rotation
    weight folding exactly)."""
    from buffer_tpu.compat.torch_convert import load_variables
    variables = load_variables(PATHS)["Desc"]
    rs = np.random.RandomState(1)
    K, S = 2, 64
    delta = rs.uniform(-1, 1, (K, S, 3)).astype(np.float32)
    delta /= np.maximum(np.linalg.norm(delta, axis=-1, keepdims=True), 1.0)
    delta = jnp.asarray(delta)
    rad_n, azi_n, ele_n = 3, 20, 7
    voxel_r = 0.8 / 3

    inv = pe.spt(jax.random.PRNGKey(1), delta, rad_n, azi_n, ele_n, voxel_r, S)
    W = variables["params"]["pnt_conv"]["kernel"]
    b = variables["params"]["pnt_conv"]["bias"]
    g = variables["params"]["pnt_bn"]["weight"]
    beta = variables["params"]["pnt_bn"]["bias"]
    mean = variables["batch_stats"]["pnt_bn"]["mean"]
    var = variables["batch_stats"]["pnt_bn"]["var"]
    h = jax.nn.relu((inv @ W + b - mean) / jnp.sqrt(var + 1e-5) * g + beta)
    pooled_s = jnp.max(h, axis=2).reshape(K, rad_n, ele_n, azi_n, 16)

    pooled_f = pe.fused_point_features(
        variables["params"], variables["batch_stats"], jax.random.PRNGKey(2),
        delta, rad_n, azi_n, ele_n, voxel_r, S)
    np.testing.assert_allclose(np.asarray(pooled_s), np.asarray(pooled_f),
                               atol=2e-5)
