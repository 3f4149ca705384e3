"""End-to-end registration of one fragment pair — a single jitted function.

This is the TPU-native rewrite of the reference's inference branch
(``models/BUFFER.py:231-333`` plus the surrounding test harness): normals,
pyramid, EFCNN axes, DetNet saliency, FPS keypoints, MiniSpinNet
descriptors, mutual matching, the SO(2) cost volume, hypothesis voting,
batched RANSAC, and IRLS refinement all execute inside one XLA program —
no host round-trips (the reference hops GPU -> CPU for Open3D RANSAC and
``torch.svd`` at models/BUFFER.py:314-328,455).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from buffer_tpu.config import Config
from buffer_tpu.models.composite import BufferModel
from buffer_tpu.models import patch_embedder as pe
from buffer_tpu.ops.sampling import farthest_point_sample
from buffer_tpu.pipeline.pyramid import build_pyramid_and_normals
from buffer_tpu.pipeline import matching, ransac, refine


class PairInputs(NamedTuple):
    """Static-shape device inputs for one fragment pair (both clouds padded
    to the ``cfg.static`` plan).  ``raw`` is the first-downsample cloud used
    for patch extraction (src_pcd_raw/tgt_pcd_raw in the reference);
    ``sds`` the second-downsample cloud the point learner runs on.

    ``lvl1``/``lvl2`` are the deterministic barycenter-subsampled pyramid
    levels.  They are precomputed on the host by the native C++ grid
    subsampler (cpp/host_ops.cpp — the same split the reference uses,
    C++ in the collate) because a 30k-element sort is pathologically slow
    on the TPU; when absent (None) they are computed on device."""

    raw: jnp.ndarray        # [2, R, 3]
    raw_mask: jnp.ndarray   # [2, R]
    sds: jnp.ndarray        # [2, S0, 3]
    sds_mask: jnp.ndarray   # [2, S0]
    lvl1: jnp.ndarray = None        # [2, S1, 3] or None
    lvl1_mask: jnp.ndarray = None   # [2, S1]
    lvl2: jnp.ndarray = None        # [2, S2, 3] or None
    lvl2_mask: jnp.ndarray = None   # [2, S2]


class RegistrationResult(NamedTuple):
    pose: jnp.ndarray         # [4, 4] src -> tgt
    num_mutual: jnp.ndarray   # [] int32
    num_inliers: jnp.ndarray  # [] int32
    kpts: jnp.ndarray         # [2, K, 3]
    kpt_valid: jnp.ndarray    # [2, K]


def orient_axes(axis: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Normalize and orient toward the origin-facing hemisphere
    (models/BUFFER.py:244-249: flip where sum(-axis * p) < 0).

    Component form: [B, N, 3] / [B, N, 1] tensors are 3-lane / 1-lane
    tiles on TPU, so the chain computes on lane-full [B, N] component
    arrays (measured neutral end-to-end — XLA had already fused most of
    the padded passes — but it keeps the head post-processing out of the
    padded-layout class)."""
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    nrm = jnp.sqrt(jnp.maximum(ax * ax + ay * ay + az * az, 1e-24))
    s = jnp.where(
        ax * pts[..., 0] + ay * pts[..., 1] + az * pts[..., 2] > 0,
        -1.0, 1.0) / nrm
    return jnp.stack([ax * s, ay * s, az * s], axis=-1)


def describe_cloud(model: BufferModel, variables, cfg: Config, key,
                   raw, raw_mask, kpts, axes):
    """MiniSpinNet over one cloud's keypoints (models/patch_embedder.py:47-91
    test path: patches -> axis-align -> /des_r -> SPT -> network).

    With ``cfg.static.fused_desc`` the SPT + point-MLP + sample-max front
    runs gather-free (patch_embedder.fused_point_features); otherwise the
    reference-exact sampled path."""
    p = cfg.patch
    k1, k2 = jax.random.split(key)
    patches = pe.extract_patches(k1, raw, raw_mask, kpts, p.des_r,
                                 p.num_points_per_patch)
    delta, rand_axis, R = pe.axis_align(patches, cfg.data.dataset, axes)
    delta = delta / p.des_r
    desc, equi = _describe_delta(model, variables, cfg, k2, delta)
    return desc, equi, R


def _describe_delta(model: BufferModel, variables, cfg: Config, key, delta,
                    R=None, delta_planes=None):
    """``delta`` is unrotated when ``R`` is given (the rotation folds into
    the fused SPT kernel's anchors/weights on TPU).  ``delta_planes``
    carries the same coordinates as (x, y, z) [K, S] planes — the TPU
    layout that avoids the 3-lane [K, S, 3] relayout."""
    p = cfg.patch
    if cfg.static.fused_desc:
        pooled = pe.fused_point_features(
            variables["Desc"]["params"], variables["Desc"]["batch_stats"],
            key, delta, p.rad_n, p.azi_n, p.ele_n,
            p.delta / p.rad_n, p.voxel_sample, R_align=R,
            delta_planes=delta_planes)
        return model.Desc.apply(variables["Desc"], pooled=pooled)
    if delta_planes is not None:
        delta = jnp.stack(delta_planes, axis=-1)
    if R is not None:
        delta = delta @ R
    inv = pe.spt(key, delta, p.rad_n, p.azi_n, p.ele_n,
                 p.delta / p.rad_n, p.voxel_sample)
    return model.Desc.apply(variables["Desc"], inv)


def describe_both(model: BufferModel, variables, cfg: Config, keys,
                  raw, raw_mask, kpts, axes):
    """MiniSpinNet over BOTH clouds in one batched network pass: patches
    are extracted per cloud (different support sets), then the aligned
    patch coordinates are concatenated so the SPT front and cylindrical
    CNN see one [2K, ...] batch."""
    p = cfg.patch
    K = kpts.shape[1]
    if (cfg.static.fused_desc
            and pe.patch_planes_supported(raw.shape[-2],
                                          p.num_points_per_patch)):
        # planes fast path: coordinates travel as (x, y, z) [K, S] planes
        # from the ball kernel straight into the SPT kernel — the [K, S, 3]
        # stacked form's 3-lane minor dim cost a 1.1 ms relayout copy
        planes, Rs = [], []
        for b in range(2):
            k1, _ = jax.random.split(keys[b])
            x, y, z = pe.extract_patch_planes(
                k1, raw[b], raw_mask[b], kpts[b], p.des_r,
                p.num_points_per_patch)
            planes.append(((x - kpts[b][:, 0:1]) / p.des_r,
                           (y - kpts[b][:, 1:2]) / p.des_r,
                           (z - kpts[b][:, 2:3]) / p.des_r))
            Rs.append(pe.align_rotation(cfg.data.dataset, axes[b]))
        delta_planes = tuple(
            jnp.concatenate([planes[0][i], planes[1][i]], axis=0)
            for i in range(3))
        R_all = jnp.concatenate(Rs, axis=0)
        _, k2 = jax.random.split(keys[0])
        desc, equi = _describe_delta(model, variables, cfg, k2, None,
                                     R=R_all, delta_planes=delta_planes)
        return ((desc[:K], equi[:K], Rs[0]), (desc[K:], equi[K:], Rs[1]))
    deltas, Rs = [], []
    for b in range(2):
        k1, _ = jax.random.split(keys[b])
        patches = pe.extract_patches(k1, raw[b], raw_mask[b], kpts[b],
                                     p.des_r, p.num_points_per_patch)
        # rotation deferred: axis_align(rotate=False) returns R only; the
        # fused SPT kernel rotates anchors/weights instead of the [K,S,3]
        # points (a ~3.4 ms batched matmul with 3-lane outputs)
        delta, _, R = pe.axis_align(patches, cfg.data.dataset, axes[b],
                                    rotate=False)
        deltas.append(delta / p.des_r)
        Rs.append(R)
    delta = jnp.concatenate(deltas, axis=0)                  # [2K, S, 3]
    R_all = jnp.concatenate(Rs, axis=0)
    _, k2 = jax.random.split(keys[0])
    desc, equi = _describe_delta(model, variables, cfg, k2, delta, R=R_all)
    return ((desc[:K], equi[:K], Rs[0]), (desc[K:], equi[K:], Rs[1]))


def register_pair(model: BufferModel, variables: Dict[str, dict],
                  inputs: PairInputs, key: jax.Array,
                  return_intermediates: bool = False) -> RegistrationResult:
    # Geometry and trained-net matmuls must run at fp32 MXU precision: bf16
    # noise flips the VN gating and jitters patch coordinates, costing
    # matches (measured: 455 -> 600 mutual, RRE 3.8 -> 0.1 deg on the
    # synthetic sanity pair).  The bulky thresholded distance fields opt
    # back into fast bf16 explicitly (ops/neighbors.py, patch_embedder).
    with jax.default_matmul_precision("highest"):
        return _register_pair(model, variables, inputs, key,
                              return_intermediates=return_intermediates)


def _register_pair(model: BufferModel, variables: Dict[str, dict],
                   inputs: PairInputs, key: jax.Array,
                   return_intermediates: bool = False):
    cfg = model.cfg
    K = cfg.point.num_keypts
    k_norm, k_desc0, k_desc1, k_ransac = jax.random.split(key, 4)

    # 1+2. input PCA normals (the reference estimates these host-side with
    #    Open3D, ThreeDMatch/dataset.py:142-153) and the conv pyramid share
    #    one fused level-0 neighbor pass
    levels = (None if inputs.lvl1 is None else
              (inputs.lvl1, inputs.lvl1_mask, inputs.lvl2, inputs.lvl2_mask))
    pyr = build_pyramid_and_normals(cfg, inputs.sds, inputs.sds_mask,
                                    levels=levels)
    axis, eps, branch = model.Ref.apply(variables["Ref"], pyr)
    axis = orient_axes(axis, inputs.sds)                     # [2, S0, 3]
    score = model.Keypt.apply(variables["Keypt"], pyr, branch)[..., 0]

    # 3. detector threshold + FPS (models/BUFFER.py:255-271); both clouds
    # run inside ONE kernel body (interleaved serial chains)
    from buffer_tpu.ops.sampling import farthest_point_sample_batched
    eligible = inputs.sds_mask & (score > cfg.point.keypts_th)
    kidx, kvalid = farthest_point_sample_batched(inputs.sds, eligible, K)
    kpts = jnp.take_along_axis(inputs.sds, kidx[..., None], axis=1)
    kaxes = jnp.take_along_axis(axis, kidx[..., None], axis=1)

    # 4. descriptors for both clouds (one batched MiniSpinNet pass)
    ((s_des, s_equi, s_R), (t_des, t_equi, t_R)) = describe_both(
        model, variables, cfg, (k_desc0, k_desc1),
        inputs.raw, inputs.raw_mask, kpts, kaxes)

    # 5. mutual matching (models/BUFFER.py:283-289)
    m = matching.mutual_matching(s_des, t_des, kvalid[0], kvalid[1])
    ss_kpts = kpts[0]
    tt_kpts = kpts[1][m.tgt_idx]
    ss_R = s_R
    tt_R = t_R[m.tgt_idx]

    # 6. SO(2) azimuth via the cost volume on the reduced elevation band
    #    (models/BUFFER.py:291-292).  The tgt-equi row permutation rides
    #    the MXU as an EXACT one-hot matmul: a row GATHER of the [K, 4480]
    #    maps runs at ~22 GB/s and costs ~4.5 ms/pair.  The values travel
    #    as a bf16 hi/lo split (hi = bf16(x), lo = bf16(x - hi)) so the
    #    permuted sum hi+lo reconstructs f32 to ~1e-5 relative — the
    #    single-rounded bf16 variant fed the Inlier head ~0.4%-rounded
    #    features, an avoidable accuracy regression vs the reference's
    #    exact gather.  One concatenated matmul keeps MXU efficiency.
    band = slice(1, cfg.patch.ele_n - 1)
    t_eb = t_equi[:, band]
    K_t = t_eb.shape[0]
    onehot = (m.tgt_idx[:, None]
              == jnp.arange(K_t, dtype=m.tgt_idx.dtype)[None, :])
    t_flat = t_eb.reshape(K_t, -1).astype(jnp.float32)
    t_hi = t_flat.astype(jnp.bfloat16)
    t_lo = (t_flat - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    sel = jnp.matmul(
        onehot.astype(jnp.bfloat16),
        jnp.concatenate([t_hi, t_lo], axis=-1),
        preferred_element_type=jnp.float32)
    F = t_flat.shape[-1]
    t_eb_sel = (sel[:, :F] + sel[:, F:]).astype(t_eb.dtype)
    ind = model.Inlier.apply(variables["Inlier"], s_equi[:, band],
                             t_eb_sel.reshape(K, *t_eb.shape[1:]))

    # 7. per-match hypotheses + voting (models/BUFFER.py:294-311)
    R_h, t_h = matching.pose_hypotheses(ss_kpts, tt_kpts, ss_R, tt_R, ind,
                                        cfg.patch.azi_n)
    best, vote_inliers = matching.vote_hypotheses(
        ss_kpts, tt_kpts, R_h, t_h, m.mutual, cfg.patch.azi_n,
        cfg.match.inlier_th)

    # 8. batched RANSAC over the winner's inlier correspondences
    #    (models/BUFFER.py:314-324).  DYNAMIC BUDGET: when the mutual
    #    match set is starved (hard low-overlap pairs), spend a larger
    #    hypothesis batch and full IRLS depth — the TPU analog of the
    #    reference's adaptive behavior (Open3D RANSAC runs to a 0.999
    #    confidence criterion and its IRLS breaks on convergence,
    #    models/BUFFER.py:318-324,396-398, so the reference implicitly
    #    spends MORE work exactly when inliers are scarce).  lax.cond
    #    executes only the taken branch, so well-matched pairs (the vast
    #    majority) pay nothing.
    n_mutual = jnp.sum(m.mutual.astype(jnp.int32))
    th = 1.2 if cfg.data.dataset == "KITTI" else 0.10
    boost = cfg.static.low_match_boost

    def solve(hyp: int, iters: int):
        def run():
            pose, inl = ransac.ransac_pose(
                k_ransac, ss_kpts, tt_kpts, vote_inliers,
                cfg.match.dist_th, cfg.match.similar_th, hyp)
            if cfg.test.pose_refine:
                # 9. IRLS refinement (models/BUFFER.py:327-328)
                return refine.post_refinement(
                    pose, ss_kpts, tt_kpts, m.mutual, th, iters=iters), inl
            return pose, inl
        return run

    base = solve(cfg.match.hypotheses, cfg.static.refine_iters)
    if boost:
        pose, ransac_inl = jax.lax.cond(
            n_mutual < cfg.static.low_match_th,
            solve(4 * cfg.match.hypotheses, 2 * cfg.static.refine_iters),
            base)
    else:
        pose, ransac_inl = base()

    result = RegistrationResult(
        pose=pose,
        num_mutual=jnp.sum(m.mutual.astype(jnp.int32)),
        num_inliers=jnp.sum(ransac_inl.astype(jnp.int32)),
        kpts=kpts, kpt_valid=kvalid)
    if return_intermediates:
        # per-stage tensors for the full-composite torch-oracle parity test
        # (tests/test_parity_composite.py); traced only when requested
        return result, {
            "pyramid": pyr, "axis": axis, "eps": eps, "score": score,
            "kidx": kidx, "kvalid": kvalid, "kpts": kpts, "kaxes": kaxes,
            "s_des": s_des, "t_des": t_des, "s_equi": s_equi,
            "t_equi": t_equi, "s_R": s_R, "t_R": t_R,
            "matches": m, "azi_ind": ind, "best_hyp": best,
            "vote_inliers": vote_inliers, "R_h": R_h, "t_h": t_h,
        }
    return result


def make_register_fn(model: BufferModel):
    """jit-compiled registration closure over the static model config."""
    @partial(jax.jit, static_argnums=())
    def fn(variables, inputs: PairInputs, key):
        return register_pair(model, variables, inputs, key)
    return fn


def make_unrolled_register_fn(model: BufferModel, unroll: int):
    """U independent pairs per XLA program by STATIC UNROLL (one
    ``register_pair`` trace per pair, python-level loop — NOT a vmap).

    The U chains share no data, so XLA's latency-hiding scheduler
    interleaves them: each pair's serial tails (the FPS selection chain,
    knockout top-k steps, the IRLS scan, per-row gathers) execute under
    the other pairs' matmuls.  Measured 39.6 -> 26.2 ms/pair at U=2 on
    the full 3DMatch plan (one v5e chip) with behaviorally identical
    per-pair results (same trace per pair; fusion-boundary rounding only) — a vmap over the pair axis instead re-layouts every op and
    LOSES throughput (config.StaticConfig.pair_batch history).

    Returns a jitted fn (variables, stacked PairInputs [U, ...],
    keys [U]) -> RegistrationResult with a leading U axis."""
    @partial(jax.jit, static_argnums=())
    def fn(variables, binputs: PairInputs, keys):
        results = []
        for u in range(unroll):
            one = jax.tree_util.tree_map(lambda x: x[u], binputs)
            results.append(register_pair(model, variables, one, keys[u]))
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *results)
    return fn
