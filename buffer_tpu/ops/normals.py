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
    mean-centered covariance.  Offsets come from the banded kNN kernel's
    VMEM window (ops/neighbors.radius_knn_offsets).

    points [B, N, 3]; valid [B, N]; off [B, N, k, 3]; nvalid [B, N, k]."""
    import jax
    w = nvalid.astype(points.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
    mean = jnp.sum(off * w, axis=-2) / cnt
    centered = (off - mean[..., None, :]) * w
    cov = jnp.einsum("...ki,...kj->...ij", centered, centered,
                     precision=jax.lax.Precision.HIGHEST)
    n = smallest_eigvec_sym3(cov)
    vp = jnp.zeros((3,), points.dtype) if viewpoint is None else viewpoint
    flip = jnp.sum(n * (vp - points), axis=-1) < 0
    n = jnp.where(flip[..., None], -n, n)
    return jnp.where(valid[..., None], n, 0.0)


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
