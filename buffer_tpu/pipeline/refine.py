"""IRLS weighted-Kabsch pose refinement.

Mirrors the reference's ``post_refinement`` (models/BUFFER.py:382-418,
after PointDSC): fixed-threshold inlier re-selection with Cauchy-like
weights ``1/(1 + (d/th)^2)`` and a weighted Kabsch per round.  The
reference runs at most 20 rounds with an early break when the inlier count
stabilizes; we run the fixed 20 rounds (each round recomputes from the
current pose, so extra rounds at a fixed point are no-ops) and keep the
whole loop on device — the reference hops to CPU ``torch.svd`` every round
(models/BUFFER.py:455).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from buffer_tpu.core import se3


def post_refinement(
    pose: jnp.ndarray,        # [4, 4]
    src: jnp.ndarray,         # [M, 3]
    tgt: jnp.ndarray,         # [M, 3]
    valid: jnp.ndarray,       # [M] bool
    inlier_threshold: float,  # 0.10 (3DMatch/ETH) or 1.2 (KITTI), ref :395-398
    iters: int = 20,
) -> jnp.ndarray:
    def body(T, _):
        warped = se3.transform(src[None], T[None])[0]
        d = jnp.linalg.norm(warped - tgt, axis=-1)
        inl = (d < inlier_threshold) & valid
        w = (1.0 / (1.0 + (d / inlier_threshold) ** 2)) * inl
        ok = jnp.sum(inl) >= 3
        T_new = se3.kabsch_quat(src[None], tgt[None], w[None])[0]
        return jnp.where(ok, T_new, T), None

    pose, _ = lax.scan(body, pose, None, length=iters)
    return pose
