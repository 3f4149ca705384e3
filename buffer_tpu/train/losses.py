"""Training losses.

Masked static-shape ports of the reference losses:

* batch-hard contrastive with safe-radius masking
  (``loss/desc_loss.py:60-109``),
* probabilistic cosine loss for the Ref stage
  (``ThreeDMatch/trainer.py:134-147``),
* detector loss ``mean((margin - diff) * sigma)``
  (``ThreeDMatch/trainer.py:173-187``; margin 1.05 for 3DMatch, 1.0 for
  KITTI per ``KITTI/trainer.py:182``),
* cross-entropy on the EquiMatch logits and L1 on the azimuth index
  (``ThreeDMatch/trainer.py:153-171,189-198``).

All take a validity mask for padded correspondence rows.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from buffer_tpu.core.numerics import safe_norm

BIG = 1e5


def cdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix with the reference's sqrt fudge
    (loss/desc_loss.py:25-57)."""
    diff = a[:, None, :] - b[None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)


def contrastive_loss(
    anchor: jnp.ndarray,       # [P, C] src descriptors
    positive: jnp.ndarray,     # [P, C] tgt descriptors (row i matches i)
    dist_keypts: jnp.ndarray,  # [P, P] keypoint distances for safe radius
    valid: jnp.ndarray,        # [P] bool
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
    safe_radius: float = 0.10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batch-hard contrastive loss.  Returns (loss, diff, accuracy) like the
    reference (loss/desc_loss.py:68-109): diff = closest_negative /
    (furthest_positive + 1e-6) per anchor, accuracy = % anchors whose
    positive beats every negative."""
    P = anchor.shape[0]
    dist = cdist(anchor, positive)
    eye = jnp.eye(P, dtype=bool)
    # mask: same-identity diagonal and spatially-too-close negatives
    near = (dist_keypts + 10.0 * eye) < safe_radius
    dist = dist + 10.0 * near
    pair_valid = valid[:, None] & valid[None, :]

    furthest_positive = jnp.diagonal(dist)                      # [P]
    closest_negative = jnp.min(
        jnp.where(pair_valid & ~eye, dist, BIG), axis=1)
    diff = furthest_positive - closest_negative
    vf = valid.astype(anchor.dtype)
    nv = jnp.maximum(jnp.sum(vf), 1.0)
    accuracy = jnp.sum((diff < 0) & valid) * 100.0 / nv
    loss = (jnp.maximum(furthest_positive - pos_margin, 0.0)
            + jnp.maximum(neg_margin - closest_negative, 0.0))
    loss = jnp.sum(loss * vf) / nv
    ratio = closest_negative / (furthest_positive + 1e-6)
    return loss, ratio, accuracy


def ref_loss(src_axis, tgt_axis, gt_R, src_s, tgt_s, valid):
    """Probabilistic cosine loss (ThreeDMatch/trainer.py:134-147):
    err = 1 - |cos(src_axis @ R^T, tgt_axis)|; loss = mean(log e + err/e)."""
    rot = src_axis @ gt_R.T
    cos = jnp.sum(rot * tgt_axis, axis=-1) / jnp.maximum(
        safe_norm(rot, axis=-1) * safe_norm(tgt_axis, axis=-1), 1e-8)
    err = 1.0 - jnp.abs(cos)
    eps = (src_s[:, 0] + tgt_s[:, 0]) / 2.0
    per = jnp.log(eps) + err / eps
    vf = valid.astype(per.dtype)
    nv = jnp.maximum(jnp.sum(vf), 1.0)
    return jnp.sum(per * vf) / nv, jnp.sum(err * vf) / nv


def det_loss(src_s, tgt_s, diff_ratio, valid, margin: float = 1.05):
    """Detector saliency loss (ThreeDMatch/trainer.py:173-187)."""
    sigma = (src_s[:, 0] + tgt_s[:, 0]) / 2.0
    per = (margin - jax_stop_grad(diff_ratio)) * sigma
    vf = valid.astype(per.dtype)
    return jnp.sum(per * vf) / jnp.maximum(jnp.sum(vf), 1.0)


def jax_stop_grad(x):
    import jax
    return jax.lax.stop_gradient(x)


def eqv_ce_loss(logits, labels, valid):
    """Cross entropy over azimuth bins + accuracy
    (ThreeDMatch/trainer.py:159-162)."""
    logp = logits - jax_logsumexp(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    vf = valid.astype(nll.dtype)
    nv = jnp.maximum(jnp.sum(vf), 1.0)
    acc = jnp.sum((jnp.argmax(logits, axis=1) == labels) & valid) / nv
    return jnp.sum(nll * vf) / nv, acc


def jax_logsumexp(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))


def l1_loss(pred, target, valid):
    """Azimuth-index L1 (ThreeDMatch/trainer.py:189-198)."""
    vf = valid.astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - target) * vf) / jnp.maximum(jnp.sum(vf), 1.0)
