"""PCA surface normals on device.

Replaces Open3D's ``estimate_normals`` + ``orient_normals_towards_camera_location``
(defaults: kNN=30, camera at origin), which the reference calls ~30 times to
build the model's input features (``ThreeDMatch/trainer.py:113-123``,
``ThreeDMatch/dataset.py:142-153``).  Running this on-TPU removes a large
host-side serial cost (the eval host here has a single CPU core).

Also provides :func:`smallest_eigvec_sym3` — a closed-form (Cardano)
symmetric 3x3 eigensolver used both for normals and for ``cal_Z_axis``
(utils/common.py:709-726, which the reference offloads to torch_batch_svd).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from buffer_tpu.core.numerics import safe_norm
from buffer_tpu.ops.neighbors import radius_knn, gather_points

EPS = 1e-12


def smallest_eigvec_sym3(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric [..., 3, 3].

    Trigonometric (Cardano) eigenvalues + cross-product eigenvector
    extraction; branch-free and batched (XLA-friendly, no LAPACK loop).
    """
    dtype = A.dtype
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    A01, A02, A12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = A01**2 + A02**2 + A12**2
    d0 = A[..., 0, 0] - q
    d1 = A[..., 1, 1] - q
    d2 = A[..., 2, 2] - q
    p2 = d0**2 + d1**2 + d2**2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, EPS))
    eye = jnp.eye(3, dtype=dtype)
    B = (A - q[..., None, None] * eye) / p[..., None, None]
    r = jnp.linalg.det(B) / 2.0
    phi = jnp.arccos(jnp.clip(r, -1.0, 1.0)) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)                      # largest
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam2 = 3.0 * q - lam1 - lam3

    # rows of (A - lam1 I)(A - lam2 I) are parallel to the lam3 eigenvector
    M = (A - lam1[..., None, None] * eye) @ (A - lam2[..., None, None] * eye)
    norms = jnp.sum(M * M, axis=-1)                         # [..., 3] row norms
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, best[..., None, None], axis=-2)[..., 0, :]
    n = safe_norm(v, axis=-1, keepdims=True)
    # isotropic/degenerate fallback: +z
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype), v.shape)
    return jnp.where(n > 1e-10, v / jnp.maximum(n, EPS), fallback)


def estimate_normals(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    knn: int = 30,
    chunk: int = 4096,
    viewpoint: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """kNN-PCA normals oriented toward ``viewpoint`` (default: the origin,
    matching ``orient_normals_towards_camera_location()``).

    points: [N, 3]; valid: [N] bool; returns [N, 3] (zeros for invalid).
    Covariance is centered on the neighborhood mean (Open3D semantics).
    """
    _, idx, nvalid = radius_knn(points, points, valid, k=knn, radius=None,
                                chunk=chunk)
    return normals_from_neighbors(points, valid, idx, nvalid,
                                  viewpoint=viewpoint)


def normals_from_neighbors(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    idx: jnp.ndarray,
    nvalid: jnp.ndarray,
    viewpoint: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PCA normals from precomputed kNN tables (lets callers share one
    neighbor pass between normals and the level-0 conv lists).

    Accepts either one cloud (points [N, 3], idx [N, k]) or a batch
    (points [B, N, 3], idx [B, N, k]); the batched form uses the fast
    flat-indexed gather."""
    if points.ndim == 3:
        from buffer_tpu.ops.neighbors import gather_rows
        nbrs = gather_rows(points, idx)               # [B, N, k, 3]
        w = nvalid.astype(points.dtype)[..., None]
        cnt = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
        mean = jnp.sum(nbrs * w, axis=-2) / cnt
        centered = (nbrs - mean[..., None, :]) * w
        import jax
        cov = jnp.einsum("bnki,bnkj->bnij", centered, centered,
                         precision=jax.lax.Precision.HIGHEST)
        n = smallest_eigvec_sym3(cov)
        vp = jnp.zeros((3,), points.dtype) if viewpoint is None else viewpoint
        flip = jnp.sum(n * (vp - points), axis=-1) < 0
        n = jnp.where(flip[..., None], -n, n)
        return jnp.where(valid[..., None], n, 0.0)
    nbrs = gather_points(points, idx)                 # [N, k, 3]
    w = nvalid.astype(points.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nbrs * w, axis=1) / cnt
    centered = (nbrs - mean[:, None, :]) * w
    import jax
    cov = jnp.einsum("nki,nkj->nij", centered, centered,
                     precision=jax.lax.Precision.HIGHEST)
    n = smallest_eigvec_sym3(cov)
    vp = jnp.zeros((3,), points.dtype) if viewpoint is None else viewpoint
    flip = jnp.sum(n * (vp[None, :] - points), axis=-1) < 0
    n = jnp.where(flip[:, None], -n, n)
    return jnp.where(valid[:, None], n, 0.0)


def smallest_eigvec_sym3_components(cxx, cyy, czz, cxy, cxz, cyz):
    """:func:`smallest_eigvec_sym3` on the six unique components of a
    symmetric matrix as separate arrays (any common shape [...]).

    Component form keeps the whole eigensolve on [...]-shaped scalar
    arrays — the [..., 3, 3] matrix form forces XLA through a chain of
    tiny-minor-dim transposes/copies (~2 ms/pair at the level-0 normals
    shape).  Same trigonometric (Cardano) eigenvalues; the eigenvector is
    the largest row of M = (A - lam1 I)(A - lam2 I), which is symmetric
    (a polynomial in A), so six products suffice.
    """
    dtype = cxx.dtype
    q = (cxx + cyy + czz) / 3.0
    p1 = cxy * cxy + cxz * cxz + cyz * cyz
    d0 = cxx - q
    d1 = cyy - q
    d2 = czz - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, EPS))
    inv_p = 1.0 / p
    b00 = d0 * inv_p
    b11 = d1 * inv_p
    b22 = d2 * inv_p
    b01 = cxy * inv_p
    b02 = cxz * inv_p
    b12 = cyz * inv_p
    det = (b00 * (b11 * b22 - b12 * b12)
           - b01 * (b01 * b22 - b12 * b02)
           + b02 * (b01 * b12 - b11 * b02))
    phi = jnp.arccos(jnp.clip(det / 2.0, -1.0, 1.0)) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)                       # largest
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam2 = 3.0 * q - lam1 - lam3

    u00 = cxx - lam1
    u11 = cyy - lam1
    u22 = czz - lam1
    v00 = cxx - lam2
    v11 = cyy - lam2
    v22 = czz - lam2
    m00 = u00 * v00 + cxy * cxy + cxz * cxz
    m01 = u00 * cxy + cxy * v11 + cxz * cyz
    m02 = u00 * cxz + cxy * cyz + cxz * v22
    m11 = cxy * cxy + u11 * v11 + cyz * cyz
    m12 = cxy * cxz + u11 * cyz + cyz * v22
    m22 = cxz * cxz + cyz * cyz + u22 * v22

    n0 = m00 * m00 + m01 * m01 + m02 * m02
    n1 = m01 * m01 + m11 * m11 + m12 * m12
    n2 = m02 * m02 + m12 * m12 + m22 * m22
    # tie-break matches argmax (first max wins)
    use1 = (n1 > n0) & (n1 >= n2)
    use2 = (n2 > n0) & (n2 > n1)
    vx = jnp.where(use2, m02, jnp.where(use1, m01, m00))
    vy = jnp.where(use2, m12, jnp.where(use1, m11, m01))
    vz = jnp.where(use2, m22, jnp.where(use1, m12, m02))
    nrm = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, EPS * EPS))
    ok = nrm > 1e-10
    inv = jnp.where(ok, 1.0 / nrm, 0.0)
    vx = jnp.where(ok, vx * inv, 0.0)
    vy = jnp.where(ok, vy * inv, 0.0)
    vz = jnp.where(ok, vz * inv, jnp.ones_like(vz))   # degenerate -> +z
    return vx.astype(dtype), vy.astype(dtype), vz.astype(dtype)


def normals_from_offsets(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    off: jnp.ndarray,
    nvalid: jnp.ndarray,
    viewpoint: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PCA normals from neighbor-minus-query offsets (no coordinate
    gather): covariance is translation-invariant, so centering the offsets
    on their own mean gives exactly :func:`normals_from_neighbors`'s
    mean-centered covariance.  The covariance components and the
    eigensolve stay as six scalar arrays end to end (no [..., 3, 3]
    tensors, no einsum transposes).

    points [B, N, 3]; valid [B, N]; off COMPONENT PLANES [3, B, N, k]
    (the layout the fused gather+transpose emits); nvalid [B, N, k]."""
    # ONE pass over the [B, N, k] planes: cov = E[xx^T] - m m^T cnt (the
    # sum form of mean-centering; exact for 0/1 weights since w^2 = w).
    # The two-pass form re-read all three planes after materializing
    # [B, N, 1] means whose 1-lane rows tile-pad 128x (31 MB each at the
    # level-0 shape) — the trailing-1 broadcasts and their relayout
    # copies were ~1.5 ms/pair of the normals stage.  Offsets are already
    # query-centered (|off| <= r), so the subtraction loses no precision.
    w = nvalid.astype(points.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    wx = off[0] * w
    wy = off[1] * w
    wz = off[2] * w
    sx = jnp.sum(wx, axis=-1)
    sy = jnp.sum(wy, axis=-1)
    sz = jnp.sum(wz, axis=-1)
    inv = 1.0 / cnt
    cxx = jnp.sum(wx * off[0], axis=-1) - sx * sx * inv
    cyy = jnp.sum(wy * off[1], axis=-1) - sy * sy * inv
    czz = jnp.sum(wz * off[2], axis=-1) - sz * sz * inv
    cxy = jnp.sum(wx * off[1], axis=-1) - sx * sy * inv
    cxz = jnp.sum(wx * off[2], axis=-1) - sx * sz * inv
    cyz = jnp.sum(wy * off[2], axis=-1) - sy * sz * inv
    vx, vy, vz = smallest_eigvec_sym3_components(cxx, cyy, czz, cxy, cxz, cyz)
    vp = jnp.zeros((3,), points.dtype) if viewpoint is None else viewpoint
    flip = (vx * (vp[0] - points[..., 0]) + vy * (vp[1] - points[..., 1])
            + vz * (vp[2] - points[..., 2])) < 0
    s = jnp.where(flip, -1.0, 1.0) * valid.astype(points.dtype)
    return jnp.stack([vx * s, vy * s, vz * s], axis=-1)


def cal_z_axis(
    local_cor: jnp.ndarray,
    ref_point: jnp.ndarray,
) -> jnp.ndarray:
    """Patch z-axis: smallest principal direction of the *uncentered*
    covariance of keypoint-relative coordinates, sign-disambiguated toward
    the origin-facing hemisphere of ``ref_point``
    (utils/common.py:709-726: ``mask = sum(-Z * ref) < 0`` then flip).

    local_cor: [B, N, 3]; ref_point: [B, 3].
    """
    cov = jnp.einsum("bni,bnj->bij", local_cor, local_cor)
    z = smallest_eigvec_sym3(cov)
    flip = jnp.sum(-z * ref_point, axis=-1) < 0
    return jnp.where(flip[:, None], -z, z)
