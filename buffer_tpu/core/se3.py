"""SE(3) utilities (jnp-native).

Functional equivalents of the reference's ``utils/SE3.py`` and the rotation
helpers scattered through ``utils/common.py`` (``RodsRotatFormula``,
``angles2rotation_matrix``) and kornia's ``angle_axis_to_rotation_matrix``
(used at ``models/BUFFER.py:299`` and ``models/patch_embedder.py:63``).

All functions are shape-polymorphic over a leading batch dimension and safe
under ``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from buffer_tpu.core.numerics import safe_norm, safe_normalize

EPS = 1e-8
# 3x3/4x4 rotation algebra must be exact: at the TPU's default bf16 matmul
# precision a composed rotation is ~0.4% off orthonormal — a 3-4 degree
# phantom error on any pose computed through it.  These products are tiny,
# so full precision is free.
_HP = jax.lax.Precision.HIGHEST


def transform(pts: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply an SE(3) transform: ``R @ p + t``.

    pts: [..., N, 3]; trans: [..., 4, 4] (matching leading dims).
    Mirrors ``utils/SE3.py:43-57``.
    """
    R = trans[..., :3, :3]
    t = trans[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def decompose_trans(trans: jnp.ndarray):
    """Split [..., 4, 4] into (R [...,3,3], t [...,3,1]); utils/SE3.py:59-71."""
    return trans[..., :3, :3], trans[..., :3, 3:4]


def integrate_trans(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build [..., 4, 4] from R [...,3,3] and t [...,3] or [...,3,1];
    utils/SE3.py:73-96."""
    t = t.reshape(R.shape[:-2] + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), R.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def concatenate(trans1: jnp.ndarray, trans2: jnp.ndarray) -> jnp.ndarray:
    """Compose two SE(3) transforms (utils/SE3.py:98-112)."""
    return trans1 @ trans2


def inverse(trans: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse."""
    R, t = decompose_trans(trans)
    Rt = jnp.swapaxes(R, -1, -2)
    return integrate_trans(Rt, -(Rt @ t))


def angle_axis_to_rotation_matrix(angle_axis: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map: [..., 3] -> [..., 3, 3].

    Matches kornia's convention (models/BUFFER.py:295-299 converts an
    azimuth angle into a z-axis rotation through this function).
    """
    theta = safe_norm(angle_axis, axis=-1, keepdims=True)
    axis = angle_axis / jnp.maximum(theta, EPS)
    k = _skew(axis)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=angle_axis.dtype),
                           angle_axis.shape[:-1] + (3, 3))
    return eye + s * k + (1.0 - c) * jnp.matmul(k, k, precision=_HP)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rodrigues_a_to_b(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices aligning unit vector ``a`` to ``b``, TRANSPOSED —
    exactly the reference's ``RodsRotatFormula`` (utils/common.py:501-525),
    which returns ``R.transpose(-1,-2)`` so that row-vector convention
    ``p_aligned = p @ R`` maps ``a``-frame to ``b``-frame.

    a, b: [B, 3] (need not be unit; cosine computed like F.cosine_similarity).

    Edge cases: for a ≈ b the axis is ill-defined but sin(theta) ≈ 0 so the
    result degrades gracefully to I; for a ≈ -b the reference is likewise
    degenerate (c=0), and we reproduce its behavior (I + (1-cosθ)·0) = I.
    """
    c = jnp.cross(a, b)
    cos = jnp.sum(a * b, axis=-1) / jnp.maximum(
        safe_norm(a, axis=-1) * safe_norm(b, axis=-1), EPS
    )
    theta = jnp.arccos(jnp.clip(cos, -1.0, 1.0))[:, None, None]
    c = safe_normalize(c, axis=-1, eps=EPS)
    k = _skew(c)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), k.shape)
    R = eye + jnp.sin(theta) * k + (1.0 - jnp.cos(theta)) * jnp.matmul(k, k, precision=_HP)
    return jnp.swapaxes(R, -1, -2)


def angles_to_rotation_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """Euler XYZ composition Rz@Ry@Rx per the reference's
    ``angles2rotation_matrix`` (utils/common.py, used by var_to_invar).

    angles: [..., 3].
    """
    ax, ay, az = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.ones_like(ax)
    zero = jnp.zeros_like(ax)
    Rx = jnp.stack([
        jnp.stack([one, zero, zero], -1),
        jnp.stack([zero, cx, -sx], -1),
        jnp.stack([zero, sx, cx], -1),
    ], -2)
    Ry = jnp.stack([
        jnp.stack([cy, zero, sy], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-sy, zero, cy], -1),
    ], -2)
    Rz = jnp.stack([
        jnp.stack([cz, -sz, zero], -1),
        jnp.stack([sz, cz, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)
    return jnp.matmul(jnp.matmul(Rz, Ry, precision=_HP), Rx, precision=_HP)


def random_rotation(key: jax.Array, num_axis: int, augment_rotation: float = 1.0,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Sample an SO(3) (num_axis=3) or SO(2)-about-z (num_axis=1) rotation,
    matching ``utils/SE3.py:5-30`` (angles uniform in [0, 2π·aug])."""
    angles = jax.random.uniform(key, (3,), dtype=dtype) * 2 * jnp.pi * augment_rotation
    if num_axis == 0:
        return jnp.eye(3, dtype=dtype)
    if num_axis == 1:
        angles = angles * jnp.array([0.0, 0.0, 1.0], dtype=dtype)
        return angles_to_rotation_matrix(angles)
    # num_axis == 3: Rx @ Ry @ Rz composition per the reference
    ax, ay, az = angles[0], angles[1], angles[2]
    Rx = angles_to_rotation_matrix(jnp.array([ax, 0.0, 0.0], dtype=dtype))
    Ry = angles_to_rotation_matrix(jnp.array([0.0, ay, 0.0], dtype=dtype))
    Rz = angles_to_rotation_matrix(jnp.array([0.0, 0.0, az], dtype=dtype))
    return jnp.matmul(jnp.matmul(Rx, Ry, precision=_HP), Rz, precision=_HP)


def rotation_matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> unit quaternion [..., 4] (w, x, y, z).

    Branch-free Shepperd construction; replaces ``nibabel.quaternions.mat2quat``
    used by the Redwood RR metric (ThreeDMatch/test.py:107).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)
    case = jnp.argmax(jnp.stack([tr, m00, m11, m22], -1), axis=-1)
    q = jnp.select(
        [case[..., None] == 0, case[..., None] == 1, case[..., None] == 2],
        [q0, q1, q2], q3,
    )
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), EPS)
    # canonical sign: w >= 0 (nibabel convention)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w,x,y,z) -> [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                    2 * (x * z + w * y)], -1)
    r1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                    2 * (y * z - w * x)], -1)
    r2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                    1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([r0, r1, r2], -2)


def kabsch_quat(A: jnp.ndarray, B: jnp.ndarray,
                weights: jnp.ndarray | None = None,
                eps: float = 1e-6, iters: int = 60) -> jnp.ndarray:
    """Weighted rigid alignment via Horn's closed-form quaternion method —
    the TPU-fast alternative to the SVD :func:`kabsch` (same result up to
    degenerate inputs): the optimal rotation is the dominant eigenvector of
    the symmetric 4x4 Davenport matrix, obtained here by shifted power
    iteration (pure batched elementwise/matmul ops; no LAPACK-style inner
    loops, unlike jnp.linalg.svd on [H,3,3]).

    A, B: [bs, N, 3]; weights: [bs, N].  Returns [bs, 4, 4] with
    ``B ~= R @ A + t``.
    """
    if weights is None:
        weights = jnp.ones(A.shape[:-1], dtype=A.dtype)
    w = weights[..., None]
    wsum = jnp.sum(weights, axis=-1, keepdims=True)[..., None] + eps
    cA = jnp.sum(A * w, axis=-2, keepdims=True) / wsum
    cB = jnp.sum(B * w, axis=-2, keepdims=True) / wsum
    H = jnp.matmul(jnp.swapaxes((A - cA) * w, -1, -2), B - cB,
                   precision=_HP)                          # [bs, 3, 3]

    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    K = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], -2)                                                  # [bs, 4, 4]
    # shift so the dominant eigenvalue is the max-lambda one and positive
    shift = 2.0 * jnp.sqrt(jnp.sum(H * H, axis=(-2, -1)) + eps)
    Ks = K + shift[..., None, None] * jnp.eye(4, dtype=A.dtype)

    q = jnp.ones(A.shape[:-2] + (4,), dtype=A.dtype)
    for _ in range(iters):
        q = jnp.einsum("...ij,...j->...i", Ks, q, precision=_HP)
        q = q / jnp.maximum(
            jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True)), eps)
    R = quaternion_to_rotation_matrix(q)
    t = jnp.swapaxes(cB, -1, -2) - jnp.matmul(R, jnp.swapaxes(cA, -1, -2), precision=_HP)
    return integrate_trans(R, t[..., 0])


def kabsch(A: jnp.ndarray, B: jnp.ndarray, weights: jnp.ndarray | None = None,
           eps: float = 1e-6) -> jnp.ndarray:
    """Weighted rigid alignment (Kabsch / weighted SVD), batched.

    A, B: [bs, N, 3]; weights: [bs, N] (>=0).  Returns [bs, 4, 4] with
    ``B ≈ R @ A + t``.  Mirrors ``rigid_transform_3d``
    (models/BUFFER.py:424-464) including the det-sign correction, but runs
    the 3x3 SVD on-device via jnp (the reference hops to CPU torch.svd,
    models/BUFFER.py:455).
    """
    if weights is None:
        weights = jnp.ones(A.shape[:-1], dtype=A.dtype)
    w = weights[..., None]
    wsum = jnp.sum(weights, axis=-1, keepdims=True)[..., None] + eps
    cA = jnp.sum(A * w, axis=-2, keepdims=True) / wsum
    cB = jnp.sum(B * w, axis=-2, keepdims=True) / wsum
    Am = A - cA
    Bm = B - cB
    H = jnp.matmul(jnp.swapaxes(Am * w, -1, -2), Bm, precision=_HP)
    # torch.svd returns V (not V^T); reference computes R = V diag(1,1,d) U^T
    U, S, Vt = jnp.linalg.svd(H, full_matrices=False)
    V = jnp.swapaxes(Vt, -1, -2)
    d = jnp.linalg.det(V @ jnp.swapaxes(U, -1, -2))
    diag = jnp.concatenate(
        [jnp.ones(d.shape + (2,), dtype=A.dtype), d[..., None]], axis=-1
    )
    R = (V * diag[..., None, :]) @ jnp.swapaxes(U, -1, -2)
    t = jnp.swapaxes(cB, -1, -2) - jnp.matmul(R, jnp.swapaxes(cA, -1, -2), precision=_HP)
    return integrate_trans(R, t[..., 0])
