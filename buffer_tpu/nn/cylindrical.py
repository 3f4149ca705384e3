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
#
# Negative result (r2): a Pallas im2col kernel for these small-spatial
# convs (VMEM-resident input block, kh*kd MXU matmuls over lane-concatenated
# kw-shifts) measured 20-28 ms vs XLA's 0.86 ms at the CostNet conv3d_0
# shape — the per-tap slice/concat/reshape relayouts on 32->128-lane-padded
# 5D blocks dwarf the matmul.  XLA's conv is already near its layout-bound
# cost here; don't re-attempt without a layout that keeps C*taps lane-major.
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
    def __call__(self, x: jnp.ndarray = None, train: bool = False,
                 equis: Tuple[jnp.ndarray, jnp.ndarray] = None) -> jnp.ndarray:
        """Either a raw cost volume ``x`` [B, azi_n, ele, azi_n, C], or
        ``equis=(des1, des2)`` [B, ele, azi_n, C] — in which case the first
        conv exploits the cost volume's circulant structure (see
        :meth:`_first_from_equis`) and the [B, azi_n, ele, azi_n, C] roll
        stack is never convolved at full size."""
        plan: Sequence[Tuple[int, Tuple[int, int, int]]] = (
            (32, (3, 3, 3)), (64, (3, 3, 3)),
            (64, (3, 1, 3)), (128, (3, 1, 3)), (128, (3, 1, 3)),
            (64, (3, 1, 3)), (64, (3, 1, 3)), (32, (3, 1, 3)), (32, (3, 1, 3)),
        )
        if equis is not None:
            h = self._first_from_equis(plan[0][0], equis)
            h = MaskedBatchNorm(plan[0][0], affine=False, name="bn3d_0")(
                h, train=train)
            h = nn.relu(h)
            plan_rest = tuple(enumerate(plan))[1:]
        else:
            h = x
            plan_rest = tuple(enumerate(plan))
        for i, (d, k) in plan_rest:
            h = nn.Conv(d, k, padding="VALID", name=f"conv3d_{i}",
                        precision=PRECISION)(h)
            h = MaskedBatchNorm(d, affine=False, name=f"bn3d_{i}")(h, train=train)
            h = nn.relu(h)
        h = nn.Conv(self.out_dim, (2, 1, 2), padding="VALID",
                    name="conv3d_out", precision=PRECISION)(h)
        return h.reshape(h.shape[0], self.out_dim)

    def _first_from_equis(self, feats, equis):
        """conv3d_0 factored through the cost volume's circulant structure.

        The cost volume is ``cost[m,s,e,a] = des1[m,e,(a-s)%A] -
        des2[m,e,a]`` (models/BUFFER.py:49-60 rolls).  Because conv3d_0 is
        linear, its des1 term depends on azimuth only through
        ``(a'-s') + (da-ds)``: summing the kernel over the anti-diagonals
        ``u = da-ds`` gives a [3, 5] 2D conv G1 over (ele, circular azi),
        and the des2 term sums over ds to a [3, 3] 2D conv G2.  Then

            conv3d_0(cost)[m,s',e',a'] = G1[m,e',(a'-s')%A] - G2[m,e',a']

        EXACTLY — same parameters, ~20x fewer conv FLOPs, and the
        [B, A, ele, A, C] roll stack is materialized only once (fused into
        the bias/BN/ReLU epilogue) instead of round-tripping through the
        first conv.
        """
        des1, des2 = equis                       # [B, ele, A, C]
        A = des1.shape[2]
        C = des1.shape[-1]
        # params live under the exact nn.Conv tree (conv3d_0/{kernel,bias})
        # for .pth conversion; a dummy call materializes them at init
        conv0 = nn.Conv(feats, (3, 3, 3), padding="VALID", name="conv3d_0",
                        precision=PRECISION)
        _ = conv0(jnp.zeros((1, 3, 3, 3, C), des1.dtype))
        W = self.variables["params"]["conv3d_0"]["kernel"]   # [3,3,3,C,O]
        b = self.variables["params"]["conv3d_0"]["bias"]

        # K1[de, u+2] = sum_{ds : 0<=ds+u<=2} W[ds, de, ds+u]
        cols = []
        for u in range(-2, 3):
            terms = [W[ds, :, ds + u] for ds in range(3) if 0 <= ds + u <= 2]
            cols.append(sum(terms[1:], terms[0]))
        K1 = jnp.stack(cols, axis=1)                         # [3, 5, C, O]
        K2 = jnp.sum(W, axis=0)                              # [3, 3, C, O]

        dn2 = ("NHWC", "HWIO", "NHWC")
        pad1 = jnp.concatenate([des1[:, :, -2:], des1, des1[:, :, :2]], axis=2)
        G1 = lax.conv_general_dilated(
            pad1, K1.astype(pad1.dtype), (1, 1), "VALID",
            dimension_numbers=lax.conv_dimension_numbers(
                pad1.shape, K1.shape, dn2),
            precision=PRECISION)                             # [B, ele-2, A, O]
        G2 = lax.conv_general_dilated(
            des2, K2.astype(des2.dtype), (1, 1), "VALID",
            dimension_numbers=lax.conv_dimension_numbers(
                des2.shape, K2.shape, dn2),
            precision=PRECISION)                             # [B, ele-2, A-2, O]

        S = A - 2
        rolls = jnp.stack(
            [jnp.roll(G1, s, axis=2)[:, :, : A - 2] for s in range(S)],
            axis=1)                                          # [B, S, ele-2, A-2, O]
        return rolls - G2[:, None] + b
