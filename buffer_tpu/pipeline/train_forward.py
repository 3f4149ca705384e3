"""Stage-branch training forward passes (static shapes, jit-safe).

Ports the training branches of ``buffer.forward`` (models/BUFFER.py:128-229)
and the per-stage loss assembly of the trainer
(``ThreeDMatch/trainer.py:134-198``) into pure functions returning
``(loss, stats, batch_stats_updates)``.

The reference's dynamic-length positive-correspondence list
(``get_matching_indices`` + random subsample to ``pos_num``,
models/BUFFER.py:132,166-172) becomes a fixed ``pos_num``-row table with a
validity mask, sampled uniformly from the in-radius nearest-neighbor pairs.

Like the reference (which keeps the whole composite in ``.train()`` mode,
ThreeDMatch/trainer.py:103), all stages run with batch statistics during
training; freezing happens in the optimizer, not the forward.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from buffer_tpu.config import Config
from buffer_tpu.core import se3
from buffer_tpu.core.numerics import safe_norm, safe_normalize
from buffer_tpu.models.composite import BufferModel
from buffer_tpu.models import patch_embedder as pe
from buffer_tpu.models.heads import equi_match

# matmul precision for the whole stage_loss trace (forward AND backward —
# value_and_grad inherits it through dot_general's transpose rule).  Module
# constant so scripts/profile_train.py --precision-check can A/B it.
_PRECISION_OVERRIDE = "high"
from buffer_tpu.ops.neighbors import nearest
from buffer_tpu.pipeline.pyramid import build_pyramid_and_normals
from buffer_tpu.pipeline.registration import PairInputs, orient_axes
from buffer_tpu.train import losses


class MatchSample(NamedTuple):
    src_idx: jnp.ndarray  # [P] int32
    tgt_idx: jnp.ndarray  # [P] int32
    valid: jnp.ndarray    # [P] bool


def sample_matches(key, src_pts, src_mask, tgt_pts, tgt_mask, relt_pose,
                   radius: float, num: int, chunk: int,
                   band: int = 0) -> MatchSample:
    """Positive pairs: src NN in the gt-transformed frame within
    ``voxel_size_0`` (models/BUFFER.py:361-380), uniformly subsampled to a
    static ``num`` rows (models/BUFFER.py:166-168).

    With ``band`` set the 1-NN runs rank-banded on a joint on-device
    Morton sort of (warped src, tgt) instead of the full [N, N] field
    (the clouds' host sort orders don't survive the gt warp).  A banded
    miss only drops that point from the positive-candidate pool — the
    sampler keeps ``num`` of typically thousands of in-radius pairs."""
    warped = se3.transform(src_pts, relt_pose)
    if band and 2 * band < tgt_pts.shape[0]:
        from buffer_tpu.ops.neighbors import nearest_common_morton
        d2, nn = nearest_common_morton(warped, src_mask, tgt_pts, tgt_mask,
                                       band, chunk=chunk)
    else:
        d2, nn = nearest(warped, tgt_pts, tgt_mask, chunk=chunk)
    ok = (d2 < radius * radius) & src_mask
    prio = jnp.where(ok, jax.random.uniform(key, ok.shape), -jnp.inf)
    _, idx = jax.lax.top_k(prio, num)
    valid = jnp.take(ok, idx)
    return MatchSample(idx.astype(jnp.int32), jnp.take(nn, idx), valid)


def cal_so2_gt(s_rand_axis, s_R, t_R, gt_R, azi_n: int, integer: bool,
               aug_rotation=None):
    """Ground-truth SO(2) azimuth label (models/BUFFER.py:81-110)."""
    t_rand = s_rand_axis @ gt_R.T
    s_rand = jnp.einsum("pj,pjk->pk", s_rand_axis, s_R)
    t_rand = jnp.einsum("pj,pjk->pk", t_rand, t_R)
    if aug_rotation is not None:
        t_rand = jnp.einsum("pj,pkj->pk", t_rand, aug_rotation)
    z = jnp.array([0.0, 0.0, 1.0], s_rand.dtype)
    proj = t_rand - jnp.sum(t_rand * z, axis=-1, keepdims=True) * z
    proj = safe_normalize(proj, axis=-1)
    cos = jnp.sum(s_rand * proj, axis=-1) / jnp.maximum(
        safe_norm(s_rand, axis=-1) * safe_norm(proj, axis=-1), 1e-8)
    ang = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    neg = jnp.sum(jnp.cross(s_rand, proj) * z, axis=-1) < 0
    ang = jnp.where(neg, 2 * jnp.pi - ang, ang)
    lab = ang * azi_n / (2 * jnp.pi)
    if integer:
        lab = jnp.round(lab).astype(jnp.int32) % azi_n
    else:
        lab = jnp.where(lab >= azi_n, 0.0, lab)
    return jax.lax.stop_gradient(lab)


def _apply(module, vars_, *args, train: bool, **kw):
    """flax apply with mutable batch stats in training."""
    if train:
        out, upd = module.apply(vars_, *args, train=True,
                                mutable=["batch_stats"], **kw)
        return out, upd["batch_stats"]
    return module.apply(vars_, *args, train=False, **kw), vars_["batch_stats"]


def _describe(model: BufferModel, vars_desc, cfg: Config, key, raw, raw_mask,
              kpts, axes, train: bool, so2_aug: bool):
    """Training-path MiniSpinNet call (models/BUFFER.py:178-183)."""
    p = cfg.patch
    k1, k2, k3 = jax.random.split(key, 3)
    patches = pe.extract_patches(k1, raw, raw_mask, kpts, p.des_r,
                                 p.num_points_per_patch)
    delta, rand_axis, R = pe.axis_align(patches, cfg.data.dataset, axes)
    delta = delta / p.des_r
    if so2_aug:
        delta, rand_axis, aug = pe.so2_augment(k3, delta, rand_axis)
    else:
        aug = jnp.broadcast_to(jnp.eye(3, dtype=delta.dtype),
                               (delta.shape[0], 3, 3))
    inv = pe.spt(k2, delta, p.rad_n, p.azi_n, p.ele_n,
                 p.delta / p.rad_n, p.voxel_sample)
    (desc, equi), stats = _apply(model.Desc, vars_desc, inv, train=train)
    return dict(desc=desc, equi=equi, rand_axis=rand_axis, R=R, aug=aug), stats


def stage_loss(
    model: BufferModel,
    variables: Dict[str, dict],
    stage: str,
    inputs: PairInputs,
    relt_pose: jnp.ndarray,
    key: jax.Array,
    train: bool = True,
    det_margin: float = 1.05,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, dict]]:
    # HIGH (bf16_3x, ~2e-7 relative) not HIGHEST (bf16_6x).  NOTE this
    # context wraps the whole value_and_grad trace (trainer.py), and
    # dot_general's transpose rule inherits the forward dot's precision —
    # so GRADIENT matmuls run at HIGH too (ADVICE r3).  Measured on chip
    # (scripts/profile_train.py --precision-check, small plan, random
    # init): grad rel-L2(high vs highest) ~ 1.0 and even the LOSS at
    # identical params differs ~13% — the train forward is chaotically
    # sensitive to ulp-level perturbation (norm normalizations + hard VN
    # gate flips amplify 1e-7 matmul noise), so the precision choice acts
    # like a seed change, not a systematic bias; HIGHEST is not "more
    # correct" here, just 2x slower.  Functional gates are the CPU-exact
    # convergence tests and the trained-from-scratch recall artifact
    # (TRAINED_r04.json).  On CPU (the test platform) matmul precision is
    # a no-op, so torch-oracle parity is unaffected.
    with jax.default_matmul_precision(_PRECISION_OVERRIDE):
        return _stage_loss(model, variables, stage, inputs, relt_pose, key,
                           train, det_margin)


def _stage_loss(model, variables, stage, inputs, relt_pose, key,
                train=True, det_margin=1.05):
    cfg = model.cfg
    k_match, k_s, k_t = jax.random.split(key, 3)
    gt_R = relt_pose[:3, :3]
    upd = {s: variables[s]["batch_stats"] for s in variables}

    # input normals + pyramid, fused level-0 pass (trainer.py:113-123)
    levels = (None if inputs.lvl1 is None else
              (inputs.lvl1, inputs.lvl1_mask, inputs.lvl2, inputs.lvl2_mask))
    pyr = build_pyramid_and_normals(cfg, inputs.sds, inputs.sds_mask,
                                    levels=levels)

    # FROZEN stages run in eval mode: (a) perf — eval serves the VN convs
    # through the planes fast path and bf16 staging (the train-mode XLA
    # composition exists for batch-stat exactness, which only the ACTIVE
    # stage needs); (b) consistency — the reference's test composition
    # loads each stage's OWN best.pth (ThreeDMatch/test.py:207-214), so a
    # frozen module's batch-stat drift during later stages is discarded
    # anyway; eval-mode forwards are exactly the function the final
    # composition will run.  (The reference keeps torch train() globally —
    # frozen modules there see batch statistics; a deliberate,
    # measured-neutral deviation: convergence tests gate it.)
    (axis, eps, branch), upd["Ref"] = _apply(
        model.Ref, variables["Ref"], pyr, train=train and stage == "Ref")
    axis = orient_axes(axis, inputs.sds)

    m = sample_matches(k_match, inputs.sds[0], inputs.sds_mask[0],
                       inputs.sds[1], inputs.sds_mask[1], relt_pose,
                       cfg.data.voxel_size_0, cfg.train.pos_num,
                       cfg.static.knn_chunk, band=cfg.static.knn_band)
    src_axis = axis[0][m.src_idx]
    tgt_axis = axis[1][m.tgt_idx]
    src_kpt = inputs.sds[0][m.src_idx]
    tgt_kpt = inputs.sds[1][m.tgt_idx]

    if stage == "Ref":
        src_s = eps[0][m.src_idx]
        tgt_s = eps[1][m.tgt_idx]
        loss, err = losses.ref_loss(src_axis, tgt_axis, gt_R, src_s, tgt_s,
                                    m.valid)
        return loss, {"ref_loss": loss, "ref_error": err}, upd

    train_desc = train and stage == "Desc"
    vars_desc = {"params": variables["Desc"]["params"],
                 "batch_stats": upd["Desc"]}
    src, upd["Desc"] = _describe(model, vars_desc, cfg, k_s,
                                 inputs.raw[0], inputs.raw_mask[0],
                                 src_kpt, src_axis, train_desc,
                                 so2_aug=False)
    vars_desc = {"params": variables["Desc"]["params"],
                 "batch_stats": upd["Desc"]}
    tgt, upd["Desc"] = _describe(model, vars_desc, cfg, k_t,
                                 inputs.raw[1], inputs.raw_mask[1],
                                 tgt_kpt, tgt_axis, train_desc,
                                 so2_aug=(stage == "Inlier"))

    if stage == "Desc":
        dl, ratio, acc = losses.contrastive_loss(
            src["desc"], tgt["desc"], losses.cdist(tgt_kpt, tgt_kpt), m.valid)
        score = equi_match(src["equi"], tgt["equi"], cfg.patch.azi_n)
        lab = cal_so2_gt(src["rand_axis"], src["R"], tgt["R"], gt_R,
                         cfg.patch.azi_n, integer=True)
        el, eacc = losses.eqv_ce_loss(score, lab, m.valid)
        loss = 4.0 * dl + el  # RoReg weighting (trainer.py:165)
        return loss, {"desc_loss": dl, "desc_acc": acc,
                      "eqv_loss": el, "eqv_acc": eacc}, upd

    if stage == "Keypt":
        branch = jax.lax.stop_gradient(branch)
        det, upd["Keypt"] = _apply(model.Keypt, variables["Keypt"], pyr,
                                   branch, train=train)
        src_s = det[0][m.src_idx]
        tgt_s = det[1][m.tgt_idx]
        dl, ratio, acc = losses.contrastive_loss(
            src["desc"], tgt["desc"], losses.cdist(src_kpt, src_kpt), m.valid)
        loss = losses.det_loss(src_s, tgt_s, ratio, m.valid, det_margin)
        return loss, {"det_loss": loss, "desc_acc": acc}, upd

    if stage == "Inlier":
        band = slice(1, cfg.patch.ele_n - 1)
        pred, upd["Inlier"] = _apply(
            model.Inlier, variables["Inlier"],
            src["equi"][:, band], tgt["equi"][:, band], train=train)
        lab = cal_so2_gt(src["rand_axis"], src["R"], tgt["R"], gt_R,
                         cfg.patch.azi_n, integer=False,
                         aug_rotation=tgt["aug"])
        loss = losses.l1_loss(pred, lab, m.valid)
        return loss, {"match_loss": loss}, upd

    raise ValueError(stage)
