"""Descriptor matching and pose-hypothesis voting (static shapes).

Replaces the reference's KNN_CUDA mutual matching
(``models/BUFFER.py:283,335-359``) and the hypothesis-voting loop
(``models/BUFFER.py:294-311``) with masked MXU matrix ops.  Matches are kept
as all ``K`` source rows plus a ``mutual`` mask instead of a compacted
dynamic-length list.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from buffer_tpu.core import se3

BIG = 1e9


class Matches(NamedTuple):
    src_idx: jnp.ndarray   # [K] int32 — trivially arange
    tgt_idx: jnp.ndarray   # [K] int32 — NN of src keypoint i in tgt
    mutual: jnp.ndarray    # [K] bool


def mutual_matching(src_des: jnp.ndarray, tgt_des: jnp.ndarray,
                    src_valid: jnp.ndarray, tgt_valid: jnp.ndarray) -> Matches:
    """Mutual nearest neighbors in descriptor space.  Descriptors are
    L2-normalized (models/patch_embedder.py:83) so min-distance = max-dot."""
    score = src_des @ tgt_des.T                            # [Ks, Kt]
    score = jnp.where(src_valid[:, None] & tgt_valid[None, :], score, -BIG)
    s_nn = jnp.argmax(score, axis=1)                       # [Ks]
    t_nn = jnp.argmax(score, axis=0)                       # [Kt]
    mutual = (t_nn[s_nn] == jnp.arange(score.shape[0])) & src_valid
    mutual = mutual & tgt_valid[s_nn]
    return Matches(jnp.arange(score.shape[0], dtype=jnp.int32),
                   s_nn.astype(jnp.int32), mutual)


def pose_hypotheses(ss_kpts: jnp.ndarray, tt_kpts: jnp.ndarray,
                    s_R: jnp.ndarray, t_R: jnp.ndarray,
                    azi_ind: jnp.ndarray, azi_n: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-match rigid hypotheses (models/BUFFER.py:294-301):
    R = t_R @ Rz(ind * 2pi/azi_n) @ s_R^T,  t = t_kpt - R s_kpt."""
    angle = azi_ind * (2 * jnp.pi / azi_n) + 1e-6
    aa = jnp.stack([jnp.zeros_like(angle), jnp.zeros_like(angle), angle], -1)
    azi_R = se3.angle_axis_to_rotation_matrix(aa)          # [M,3,3]
    R = t_R @ azi_R @ jnp.swapaxes(s_R, -1, -2)
    t = tt_kpts - jnp.einsum("mij,mj->mi", R, ss_kpts)
    return R, t


def vote_hypotheses(ss_kpts: jnp.ndarray, tt_kpts: jnp.ndarray,
                    R: jnp.ndarray, t: jnp.ndarray, mutual: jnp.ndarray,
                    azi_n: int, inlier_th: float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score every hypothesis by warping every match
    (models/BUFFER.py:304-311).  The per-match inlier threshold scales with
    the keypoint's distance from the patch origin:
    ``|s_kpt| * pi/azi_n * inlier_th`` (the azimuth-bin lever arm).

    Returns (best_idx scalar int, inlier mask [M] of the winner)."""
    warped = jnp.einsum("hij,mj->hmi", R, ss_kpts) + t[:, None, :]
    diffs = jnp.linalg.norm(warped - tt_kpts[None], axis=-1)   # [H, M]
    thr = jnp.linalg.norm(ss_kpts, axis=-1) * (jnp.pi / azi_n) * inlier_th
    sign = (diffs < thr[None, :]) & mutual[None, :]
    counts = jnp.where(mutual, jnp.sum(sign, axis=-1), -1)
    best = jnp.argmax(counts)
    return best, sign[best]
