"""Checkpoint-parity tests: every checkpoint-bearing layer of the JAX stack
is compared against a torch CPU oracle loaded with the REAL reference
weights (/root/reference snapshots).  This validates both the layer
numerics (BN eval semantics, padding, layouts) and the .pth converter."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from buffer_tpu.compat import torch_convert as tc  # noqa: E402
from buffer_tpu.nn.vn import VNLinearLeakyReLU, VNStdFeature  # noqa: E402
from buffer_tpu.nn.cylindrical import CylindricalNet, CostNet  # noqa: E402
from buffer_tpu.models.point_learner import InvariantHead  # noqa: E402
import torch_oracle as oracle  # noqa: E402

SNAP = "/root/reference/ThreeDMatch/snapshot/06132318"
PATHS = {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")}

pytestmark = pytest.mark.skipif(
    not os.path.exists(PATHS["Ref"]), reason="reference checkpoints not present")


@pytest.fixture(scope="module")
def merged():
    return tc.load_reference_checkpoint(PATHS)


@pytest.fixture(scope="module")
def variables(merged):
    params, stats = tc.convert_state_dict(merged)
    return params, stats


def _sub(tree, *path):
    for p in path:
        tree = tree[p]
    return tree


def test_all_stage_keys_convert(merged, variables):
    params, stats = variables
    for stage in ("Ref", "Desc", "Keypt", "Inlier"):
        assert params[stage], stage
        assert stats[stage], stage


def test_vnllr_dim5_parity(merged, variables):
    """Encoder block 0 conv (mode-'6' VN conv, 4 -> 10 channels)."""
    params, stats = variables
    rs = np.random.RandomState(0)
    x = rs.randn(1, 4, 3, 50, 16).astype(np.float32)  # torch [B,C,3,N,K]

    om = oracle.OVNLinearLeakyReLU(4, 10, dim=5).eval()
    oracle.load_subtree(om, merged, "Ref.encoder_blocks.0.conv.")
    with torch.no_grad():
        ref = om(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(np.transpose(x, (0, 3, 4, 2, 1)))  # [B,N,K,3,C]
    mod = VNLinearLeakyReLU(10)
    vars_ = {"params": _sub(params, "Ref", "encoder_blocks_0", "conv"),
             "batch_stats": _sub(stats, "Ref", "encoder_blocks_0", "conv")}
    out = mod.apply(vars_, xj)
    out_t = np.transpose(np.asarray(out), (0, 4, 3, 1, 2))
    np.testing.assert_allclose(out_t, ref, atol=2e-5, rtol=1e-4)


def test_vnllr_dim4_parity(merged, variables):
    """fc_layer.0 (10 -> 5, dim=4 / per-point)."""
    params, stats = variables
    rs = np.random.RandomState(1)
    x = rs.randn(1, 10, 3, 64).astype(np.float32)

    om = oracle.OVNLinearLeakyReLU(10, 5, dim=4).eval()
    oracle.load_subtree(om, merged, "Ref.fc_layer.0.")
    with torch.no_grad():
        ref = om(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(np.transpose(x, (0, 3, 2, 1)))  # [B,N,3,C]
    vars_ = {"params": _sub(params, "Ref", "fc_layer_0"),
             "batch_stats": _sub(stats, "Ref", "fc_layer_0")}
    out = VNLinearLeakyReLU(5).apply(vars_, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 2, 1)),
                               ref, atol=2e-5, rtol=1e-4)


def test_invariant_head_parity(merged, variables):
    """Full inv_layer: VNStdFeature + Conv1d/InstanceNorm/Sigmoid stack."""
    params, stats = variables
    rs = np.random.RandomState(2)
    x = rs.randn(1, 10, 3, 80).astype(np.float32)

    om = oracle.OInvariantHead(10, "sigmoid").eval()
    oracle.load_subtree(om, merged, "Ref.inv_layer.")
    with torch.no_grad():
        ref = om(torch.from_numpy(x)).numpy()  # [1,1,N]

    from buffer_tpu.nn.vn import flatten_vn
    xj = flatten_vn(jnp.asarray(np.transpose(x, (0, 3, 2, 1))))  # [1,N,30] flat
    vars_ = {"params": _sub(params, "Ref", "inv_layer"),
             "batch_stats": _sub(stats, "Ref", "inv_layer")}
    out = InvariantHead(10, "sigmoid").apply(
        vars_, xj, jnp.ones(xj.shape[:2], bool))  # [1,N,1]
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], ref[0, 0],
                               atol=2e-5, rtol=1e-4)


def test_detnet_head_parity(merged, variables):
    params, stats = variables
    rs = np.random.RandomState(3)
    x = rs.randn(1, 10, 3, 40).astype(np.float32)
    om = oracle.OInvariantHead(10, "softplus").eval()
    oracle.load_subtree(om, merged, "Keypt.invar_layer.")
    with torch.no_grad():
        ref = om(torch.from_numpy(x)).numpy()
    from buffer_tpu.nn.vn import flatten_vn
    xj = flatten_vn(jnp.asarray(np.transpose(x, (0, 3, 2, 1))))
    vars_ = {"params": _sub(params, "Keypt", "invar_layer"),
             "batch_stats": _sub(stats, "Keypt", "invar_layer")}
    out = InvariantHead(10, "softplus").apply(
        vars_, xj, jnp.ones(xj.shape[:2], bool))
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], ref[0, 0],
                               atol=2e-5, rtol=1e-4)


def test_cylindrical_net_parity(merged, variables):
    params, stats = variables
    rs = np.random.RandomState(4)
    x = rs.randn(2, 16, 3, 7, 20).astype(np.float32)

    om = oracle.OCylindricalNet().eval()
    oracle.load_subtree(om, merged, "Desc.conv_net.")
    with torch.no_grad():
        ref = om(torch.from_numpy(x)).numpy()  # [2,32,7,20]

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # NDHWC
    vars_ = {"params": _sub(params, "Desc", "conv_net"),
             "batch_stats": _sub(stats, "Desc", "conv_net")}
    out = CylindricalNet().apply(vars_, xj)  # [2,7,20,32]
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, atol=5e-4, rtol=1e-3)


def test_cost_net_parity(merged, variables):
    params, stats = variables
    rs = np.random.RandomState(5)
    x = rs.randn(2, 32, 20, 5, 20).astype(np.float32)

    om = oracle.OCostNet().eval()
    oracle.load_subtree(om, merged, "Inlier.conv.")
    with torch.no_grad():
        ref = om(torch.from_numpy(x)).numpy()  # [2,20]

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    vars_ = {"params": _sub(params, "Inlier", "conv"),
             "batch_stats": _sub(stats, "Inlier", "conv")}
    out = CostNet(20).apply(vars_, xj)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)


def test_vnllr_flat_matches_original(merged, variables):
    """The flat-layout VN block must be numerically identical to the
    [..., 3, C] one (same params, same math, different tiling)."""
    from buffer_tpu.nn.vn import VNLinearLeakyReLUFlat, flatten_vn
    params, stats = variables
    rs = np.random.RandomState(7)
    x = rs.randn(1, 50, 16, 3, 4).astype(np.float32)  # [B,N,K,3,C]
    vars_ = {"params": _sub(params, "Ref", "encoder_blocks_0", "conv"),
             "batch_stats": _sub(stats, "Ref", "encoder_blocks_0", "conv")}
    ref = VNLinearLeakyReLU(10).apply(vars_, jnp.asarray(x))
    flat_in = flatten_vn(jnp.asarray(x))
    out = VNLinearLeakyReLUFlat(10).apply(vars_, flat_in)
    np.testing.assert_allclose(np.asarray(flatten_vn(ref)), np.asarray(out),
                               atol=2e-5, rtol=1e-4)
