"""Cylindrical/spherical partition math for the Spatial Point Transformer.

Reimplements the SPT anchor-grid construction and per-azimuth derotation of
the reference (``utils/common.py:248-262`` ``s2_grid``,
``:373-419`` ``change_coordinates``, ``:422-428`` ``get_voxel_coordinate``,
``:472-498`` ``var_to_invar``) with host-side numpy for the static anchor
grid and jnp for the traced parts.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from buffer_tpu.core import se3


def s2_grid(n_alpha: int, n_beta: int) -> np.ndarray:
    """Rings around the equator; returns [n_beta*n_alpha, 2] of (beta, alpha).

    beta in (0, pi) at n_beta midpoints; alpha in (0, 2pi) at n_alpha points
    offset by pi/n_alpha (utils/common.py:248-262).
    """
    beta = np.linspace(0, np.pi, num=n_beta, endpoint=False) + np.pi / n_beta / 2
    alpha = np.linspace(0, 2 * np.pi, num=n_alpha, endpoint=False) + np.pi / n_alpha
    B, A = np.meshgrid(beta, alpha, indexing="ij")
    return np.stack((B.flatten(), A.flatten()), axis=1)


def sphere_to_cartesian(coords: np.ndarray, radius: float) -> np.ndarray:
    """(beta, alpha) -> xyz on the sphere of ``radius``
    (utils/common.py:390-405)."""
    beta, alpha = coords[..., 0], coords[..., 1]
    st, ct = np.sin(beta), np.cos(beta)
    sp, cp = np.sin(alpha), np.cos(alpha)
    return np.stack([radius * st * cp, radius * st * sp, radius * ct], axis=-1)


def get_voxel_coordinate(radius: float, rad_n: int, azi_n: int, ele_n: int) -> np.ndarray:
    """SPT anchor centers: [rad_n, ele_n*azi_n, 3]
    (utils/common.py:422-428): the s2 grid replicated at rad_n shell radii
    ``(i + 0.5)/rad_n * radius``."""
    grid = s2_grid(n_alpha=azi_n, n_beta=ele_n)
    on_s2 = sphere_to_cartesian(grid, radius)
    on_s2 = np.repeat(on_s2[None], rad_n, axis=0)
    scale = (np.arange(rad_n) / rad_n + 1 / (2 * rad_n)).reshape(rad_n, 1, 1)
    return scale * on_s2


def azimuth_derotations(azi_n: int) -> np.ndarray:
    """[azi_n, 3, 3] rotations mapping each azimuth bin back to bin 0,
    i.e. Rz(-i * 2pi/azi_n) — the rotation applied (transposed, row-vector
    convention) by ``var_to_invar`` (utils/common.py:483-493).  Pure numpy:
    this is a static table baked into the compiled program."""
    ang = -np.arange(azi_n) * (2 * np.pi / azi_n)
    c, s = np.cos(ang), np.sin(ang)
    R = np.zeros((azi_n, 3, 3))
    R[:, 0, 0], R[:, 0, 1] = c, -s
    R[:, 1, 0], R[:, 1, 1] = s, c
    R[:, 2, 2] = 1.0
    return R


def var_to_invar(pts: jnp.ndarray, rotations: jnp.ndarray,
                 rad_n: int, azi_n: int, ele_n: int) -> jnp.ndarray:
    """Derotate per-anchor point samples into the azimuth-invariant frame.

    pts: [B, rad_n*ele_n*azi_n, nsample, 3] (anchor-relative coordinates in
    the patch frame); rotations: [azi_n, 3, 3] from
    :func:`azimuth_derotations`.  Returns the same shape with each azimuth
    slice rotated by Rz(-i·2π/azi_n) (row-vector convention: ``p @ R^T``),
    mirroring utils/common.py:472-498.
    """
    B, N, nsample, C = pts.shape
    assert N == rad_n * azi_n * ele_n
    x = pts.reshape(B, rad_n, ele_n, azi_n, nsample, C)
    # out[..., a, s, :] = x[..., a, s, :] @ R_a^T
    out = jnp.einsum("breasc,adc->breasd", x, rotations.astype(pts.dtype))
    return out.reshape(B, N, nsample, C)
