"""Cylindrical CNNs for the patch embedder and the inlier cost volume.

Reimplements ``models/patchnet.py`` (``Cylindrical_Net``: one Conv3d that
collapses the radial dimension, then a 2D conv stack over the
elevation x azimuth map with circular-azimuth / zero-elevation padding from
``utils/common.py:265-310``; ``CostNet``: ten unpadded Conv3ds that reduce a
[20 shifts, 5 elev, 20 azi] cost volume to 20 logits).

Layout is channels-last (NHWC / NDHWC) for TPU.  BatchNorms use
``affine=False`` exactly like the reference (patchnet.py:27-30) and torch
eval semantics via :class:`buffer_tpu.nn.vn.MaskedBatchNorm`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from buffer_tpu.nn.vn import MaskedBatchNorm

# Unlike the sign-gated VN nonlinearity (nn/vn.py PRECISION rationale),
# these are plain conv+BN+ReLU stacks: bf16 MXU passes are quality-neutral
# (measured on the full registration sanity: RTE 0.54 vs 0.57 cm, RRE
# 0.113 vs 0.107 deg, mutual 567 vs 568 for DEFAULT vs HIGH) and ~6x
# cheaper than HIGHEST on the cost volume.
PRECISION = lax.Precision.DEFAULT


def pad_cyl_2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Circular padding along azimuth (axis -2) and zero padding along
    elevation (axis -3) for odd kernel size k (utils/common.py:265-285,
    odd-k branch).  x: [..., H(ele), W(azi), C]."""
    p = (k - 1) // 2
    if p == 0:
        return x
    x = jnp.concatenate([x[..., :, -p:, :], x, x[..., :, :p, :]], axis=-2)
    zeros = jnp.zeros_like(x[..., :p, :, :])
    return jnp.concatenate([zeros, x, zeros], axis=-3)


def pad_cyl_3d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """3D variant (utils/common.py:288-310): circular azimuth (axis -2),
    zero elevation (axis -3), NO radial padding (axis -4).
    x: [..., D(rad), H(ele), W(azi), C]."""
    p = (k - 1) // 2
    if p == 0:
        return x
    x = jnp.concatenate([x[..., :, :, -p:, :], x, x[..., :, :, :p, :]], axis=-2)
    zeros = jnp.zeros_like(x[..., :, :p, :, :])
    return jnp.concatenate([zeros, x, zeros], axis=-3)


class CylindricalNet(nn.Module):
    """``Cylindrical_Net(inchan=16, dim=32)`` (models/patchnet.py:69-85).

    Input:  [B, rad_n(3), ele_n(7), azi_n(20), 16]
    Output: [B, ele_n, azi_n, 32] equivariant map.

    Conv stack: 3D k3 (rad collapses 3->1) then 2D k3 x 7:
    64, 64, 128, 128, 64, 64, 32, and a final un-normalized 32.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # conv3d 16 -> 64, kernel 3x3x3, cylindrical padding, VALID
        h = pad_cyl_3d(x, 3)
        h = nn.Conv(64, (3, 3, 3), padding="VALID", name="conv3d_0",
                    precision=PRECISION)(h)
        h = MaskedBatchNorm(64, affine=False, name="bn3d_0")(h, train=train)
        h = nn.relu(h)
        h = h[:, 0]  # radial dim collapsed to 1 (patchnet.py:56-58)

        dims = (64, 128, 128, 64, 64, 32)
        for i, d in enumerate(dims):
            h = pad_cyl_2d(h, 3)
            h = nn.Conv(d, (3, 3), padding="VALID", name=f"conv2d_{i}",
                        precision=PRECISION)(h)
            h = MaskedBatchNorm(d, affine=False, name=f"bn2d_{i}")(h, train=train)
            h = nn.relu(h)
        h = pad_cyl_2d(h, 3)
        h = nn.Conv(32, (3, 3), padding="VALID", name="conv2d_out",
                    precision=PRECISION)(h)
        return h


class CostNet(nn.Module):
    """``CostNet(inchan=32, dim=20)`` (models/patchnet.py:129-147): ten
    unpadded Conv3ds over [B, 20 shifts, 5 elev, 20 azi, 32] -> [B, 20].

    Kernel plan: [3,3,3] x2, [3,1,3] x7, [2,1,2]; all BNs affine=False;
    the final conv has no BN/ReLU.  With the 20x5x20 input the output
    spatial dims collapse to 1x1x1 and the 20 channels are the azimuth
    logits (models/BUFFER.py:63-66).
    """

    out_dim: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        plan: Sequence[Tuple[int, Tuple[int, int, int]]] = (
            (32, (3, 3, 3)), (64, (3, 3, 3)),
            (64, (3, 1, 3)), (128, (3, 1, 3)), (128, (3, 1, 3)),
            (64, (3, 1, 3)), (64, (3, 1, 3)), (32, (3, 1, 3)), (32, (3, 1, 3)),
        )
        h = x
        for i, (d, k) in enumerate(plan):
            h = nn.Conv(d, k, padding="VALID", name=f"conv3d_{i}",
                        precision=PRECISION)(h)
            h = MaskedBatchNorm(d, affine=False, name=f"bn3d_{i}")(h, train=train)
            h = nn.relu(h)
        h = nn.Conv(self.out_dim, (2, 1, 2), padding="VALID",
                    name="conv3d_out", precision=PRECISION)(h)
        return h.reshape(h.shape[0], self.out_dim)
