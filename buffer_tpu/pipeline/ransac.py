"""Batched correspondence RANSAC — all hypotheses scored in parallel.

TPU-native replacement for Open3D's
``registration_ransac_based_on_correspondence`` (models/BUFFER.py:314-324):
instead of 50k sequential CPU iterations with 0.999-confidence early exit,
we draw ``hypotheses`` 3-subsets of the correspondence set at once, solve a
Kabsch per subset (batched 3x3 SVD), apply the reference's two checkers
(edge-length similarity and per-correspondence distance), and score all
survivors against all correspondences with one MXU einsum.

An optional final re-fit on the winner's inliers (``refit=True``) goes
beyond Open3D (which returns the raw best 3-point model) and strictly
tightens the pose — this is the default.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from buffer_tpu.core import se3


def ransac_pose(
    key: jax.Array,
    src: jnp.ndarray,           # [M, 3]
    tgt: jnp.ndarray,           # [M, 3]
    valid: jnp.ndarray,         # [M] bool — correspondence candidate set
    dist_th: float,
    similar_th: float,
    hypotheses: int = 4096,
    refit: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pose [4,4], inlier mask [M]).  Falls back to identity when
    fewer than 3 valid correspondences exist."""
    M = src.shape[0]
    H = hypotheses
    logits = jnp.where(valid, 0.0, -jnp.inf)
    # 3 independent draws per hypothesis (Open3D samples without replacement;
    # degenerate duplicate draws fail the edge-length checker anyway)
    idx = jax.random.categorical(key, logits, shape=(H, 3))
    a = src[idx]                                            # [H,3,3]
    b = tgt[idx]

    T = se3.kabsch_quat(a, b)                               # [H,4,4]
    R, t = T[:, :3, :3], T[:, :3, 3]

    # checker 1: edge-length similarity (both ratios > similar_th)
    ea = jnp.linalg.norm(a - jnp.roll(a, 1, axis=1), axis=-1)  # [H,3]
    eb = jnp.linalg.norm(b - jnp.roll(b, 1, axis=1), axis=-1)
    ratio_ok = (ea > similar_th * eb) & (eb > similar_th * ea)
    ok = jnp.all(ratio_ok, axis=-1)
    # checker 2: the sampled correspondences themselves fit within dist_th
    wa = jnp.einsum("hij,hmj->hmi", R, a) + t[:, None, :]
    ok &= jnp.all(jnp.linalg.norm(wa - b, axis=-1) < dist_th, axis=-1)

    # score: inliers over the whole candidate set (matmul-form warp
    # distances; see matching.warp_sqdist)
    from buffer_tpu.pipeline.matching import warp_sqdist
    d2 = warp_sqdist(R, t, src, tgt)
    inl = (d2 < dist_th * dist_th) & valid[None, :]
    counts = jnp.where(ok, jnp.sum(inl, axis=-1), -1)
    best = jnp.argmax(counts)

    pose = T[best]
    inliers = inl[best]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    feasible = (n_valid >= 3) & (counts[best] > 0)

    if refit:
        w = inliers.astype(src.dtype)
        refit_T = se3.kabsch_quat(src[None], tgt[None], w[None])[0]
        pose = jnp.where(jnp.sum(inliers) >= 3, refit_T, pose)

    eye = jnp.eye(4, dtype=src.dtype)
    pose = jnp.where(feasible, pose, eye)
    inliers = inliers & feasible
    return pose, inliers
