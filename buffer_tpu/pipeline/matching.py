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
    import jax
    score = jnp.matmul(src_des, tgt_des.T,
                       precision=jax.lax.Precision.HIGHEST)  # [Ks, Kt]
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


def warp_sqdist(R: jnp.ndarray, t: jnp.ndarray,
                src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """``d2[h, m] = |R_h src_m + t_h - tgt_m|^2`` for all hypothesis/match
    pairs WITHOUT materializing the [H, M, 3] warp tensor (whose 3-lane
    minor dim the TPU pads 42x).  Expansion (|R p| = |p|):

        d2 = |p|^2 + |t|^2 + |q|^2 - 2 t.q + 2 t.(R p) - 2 <R, q p^T>

    where the last two terms are [H,3]x[3,M] and [H,9]x[9,M] matmuls.
    R: [H,3,3]; t: [H,3]; src: [M,3]; tgt: [M,3]."""
    p2 = jnp.sum(src * src, -1)                       # [M]
    q2 = jnp.sum(tgt * tgt, -1)                       # [M]
    t2 = jnp.sum(t * t, -1)                           # [H]
    tq = t @ tgt.T                                    # [H,M]
    a = jnp.einsum("hi,hij->hj", t, R)                # [H,3]
    t_Rp = a @ src.T                                  # [H,M]
    Rf = R.reshape(-1, 9)                             # [H,9]
    qp = (tgt[:, :, None] * src[:, None, :]).reshape(-1, 9)  # [M,9]
    q_Rp = Rf @ qp.T                                  # [H,M]
    d2 = (p2[None, :] + t2[:, None] + q2[None, :]
          - 2.0 * tq + 2.0 * t_Rp - 2.0 * q_Rp)
    return jnp.maximum(d2, 0.0)


def vote_hypotheses(ss_kpts: jnp.ndarray, tt_kpts: jnp.ndarray,
                    R: jnp.ndarray, t: jnp.ndarray, mutual: jnp.ndarray,
                    azi_n: int, inlier_th: float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score every hypothesis by warping every match
    (models/BUFFER.py:304-311).  The per-match inlier threshold scales with
    the keypoint's distance from the patch origin:
    ``|s_kpt| * pi/azi_n * inlier_th`` (the azimuth-bin lever arm).

    Returns (best_idx scalar int, inlier mask [M] of the winner)."""
    d2 = warp_sqdist(R, t, ss_kpts, tt_kpts)                   # [H, M]
    thr = jnp.linalg.norm(ss_kpts, axis=-1) * (jnp.pi / azi_n) * inlier_th
    sign = (d2 < (thr * thr)[None, :]) & mutual[None, :]
    counts = jnp.where(mutual, jnp.sum(sign, axis=-1), -1)
    best = jnp.argmax(counts)
    return best, sign[best]
