"""FULL-COMPOSITE parity against a torch oracle of the reference forward
(models/BUFFER.py:231-333) with the REAL converted 3DMatch weights.

Per-layer parity (test_parity.py) bounds each module; this file bounds the
AGGREGATE of the whole stack — EFCNN/DetNet over a real padded pyramid,
the sampled-SPT MiniSpinNet, the CostVolume azimuth bins, mutual matching,
hypothesis voting, and the final pose — by feeding both sides identical
stochastic selections (same neighbor tables, same keypoints, same patch
samples, same SPT priority values).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import torch_oracle as oracle  # noqa: E402
from buffer_tpu.config import tiny_cfg  # noqa: E402
from buffer_tpu.core import gridmath  # noqa: E402
from buffer_tpu.models.composite import BufferModel  # noqa: E402
from buffer_tpu.pipeline.registration import register_pair  # noqa: E402

from test_registration_e2e import make_inputs  # noqa: E402

SNAP = "/root/reference/ThreeDMatch/snapshot/06132318"
PATHS = {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")}

pytestmark = pytest.mark.skipif(
    not os.path.exists(PATHS["Ref"]), reason="reference checkpoints not present")


# ---------------------------------------------------------------------------
# shared fixtures: one tiny pair through the jitted pipeline, intermediates
# captured; the oracle re-runs the reference math on the SAME selections
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup():
    from buffer_tpu.core import se3
    from buffer_tpu.compat.torch_convert import (
        load_variables, load_reference_checkpoint)
    from dataclasses import replace

    cfg = tiny_cfg()
    # the oracle mirrors the reference-exact sampled SPT front
    cfg = cfg.replace(static=replace(cfg.static, fused_desc=False))
    model = BufferModel(cfg)
    variables = load_variables(PATHS)
    merged = load_reference_checkpoint(PATHS)

    R = np.asarray(se3.random_rotation(jax.random.PRNGKey(3), 3))
    t = np.array([0.25, -0.1, 0.3], np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3], T_gt[:3, 3] = R, t

    inputs = make_inputs(cfg, T_gt)
    key = jax.random.PRNGKey(0)
    res, inter = jax.jit(
        lambda v, i, k: register_pair(model, v, i, k,
                                      return_intermediates=True))(
        variables, inputs, key)
    inter = jax.tree_util.tree_map(np.asarray, inter)
    return dict(cfg=cfg, model=model, variables=variables, merged=merged,
                inputs=inputs, key=key, res=res, inter=inter, T_gt=T_gt)


def _stacked_batch(inter):
    """Padded+masked Pyramid -> the reference's stacked ragged batch dict
    (valid rows are prefixes; shadow neighbor index == total stacked len)."""
    pyr = inter["pyramid"]
    pts, msk = pyr.points, pyr.masks
    ns = [[int(m[b].sum()) for b in range(2)] for m in msk]
    batch = {"points": [], "neighbors": [], "pools": [], "upsamples": []}
    for lvl in range(3):
        batch["points"].append(torch.from_numpy(np.concatenate(
            [pts[lvl][b][: ns[lvl][b]] for b in range(2)])))

    def remap(idx, valid, lvl_support, lvl_query):
        """per-cloud padded indices -> stacked indices, shadow = total."""
        total = sum(ns[lvl_support])
        rows = []
        for b in range(2):
            off = 0 if b == 0 else ns[lvl_support][0]
            i = idx[b][: ns[lvl_query][b]].astype(np.int64)
            v = valid[b][: ns[lvl_query][b]]
            rows.append(np.where(v, i + off, total))
        return torch.from_numpy(np.concatenate(rows))

    for lvl in range(3):
        batch["neighbors"].append(
            remap(pyr.neighbors[lvl], pyr.neighbor_valid[lvl], lvl, lvl))
    for lvl in range(2):
        batch["pools"].append(
            remap(pyr.pools[lvl], pyr.pool_valid[lvl], lvl, lvl + 1))
        batch["upsamples"].append(
            remap(pyr.upsamples[lvl], pyr.upsample_valid[lvl], lvl + 1, lvl))
    batch["features"] = torch.from_numpy(np.concatenate(
        [pyr.features[b][: ns[0][b]] for b in range(2)]))
    batch["ns"] = ns
    return batch


# ---------------------------------------------------------------------------
# 1. EFCNN + DetNet full-network parity on the real pyramid
# ---------------------------------------------------------------------------


def test_efcnn_detnet_full_parity(setup):
    inter, merged = setup["inter"], setup["merged"]
    batch = _stacked_batch(inter)
    n_src = batch["ns"][0][0]

    om = oracle.OEFCNN(fd=10, scale=1.0).eval()
    oracle.load_subtree(om, merged, "Ref.")
    od = oracle.ODetNet(fd=10).eval()
    oracle.load_subtree(od, merged, "Keypt.")
    with torch.no_grad():
        o_axis, o_eps, branch = om(batch)
        o_score = od(batch, branch)
    o_axis, o_eps = o_axis.numpy(), o_eps.numpy()
    o_score = o_score.numpy()[:, 0]

    # oracle orientation (models/BUFFER.py:244-249)
    o_axis = o_axis / np.maximum(
        np.linalg.norm(o_axis, axis=-1, keepdims=True), 1e-12)
    spts = batch["points"][0].numpy()
    flip = np.sum(-o_axis * spts, axis=-1, keepdims=True) < 0
    o_axis = np.where(flip, -o_axis, o_axis)

    j_axis = np.concatenate([inter["axis"][0][:n_src],
                             inter["axis"][1][: batch["ns"][0][1]]])
    j_eps = np.concatenate([inter["eps"][0][:n_src],
                            inter["eps"][1][: batch["ns"][0][1]]])
    j_score = np.concatenate([inter["score"][0][:n_src],
                              inter["score"][1][: batch["ns"][0][1]]])

    cos = np.sum(j_axis * o_axis, axis=-1)
    assert np.quantile(cos, 0.01) > 0.999, float(np.quantile(cos, 0.01))
    np.testing.assert_allclose(j_eps[:, 0], o_eps[:, 0], atol=2e-4)
    np.testing.assert_allclose(j_score, o_score, atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# 2. sampled-SPT MiniSpinNet parity (identical patches + priorities)
# ---------------------------------------------------------------------------


def test_minispinnet_sampled_parity(setup):
    from buffer_tpu.models import patch_embedder as pe

    cfg, model, variables = setup["cfg"], setup["model"], setup["variables"]
    merged, inter = setup["merged"], setup["inter"]
    p = cfg.patch

    # same keypoints/axes the pipeline selected for the src cloud
    kpts = jnp.asarray(inter["kpts"][0])
    kaxes = jnp.asarray(inter["kaxes"][0])
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    patches = pe.extract_patches(k1, setup["inputs"].raw[0],
                                 setup["inputs"].raw_mask[0], kpts,
                                 p.des_r, p.num_points_per_patch)
    delta, _, _ = pe.axis_align(patches, cfg.data.dataset, kaxes)
    delta = np.asarray(delta) / p.des_r                       # [K,S,3]

    inv = np.asarray(pe.spt(k2, jnp.asarray(delta), p.rad_n, p.azi_n,
                            p.ele_n, p.delta / p.rad_n, p.voxel_sample))

    # --- oracle SPT: exact in-radius top-voxel_sample by the SAME priority
    prio = np.asarray(jax.random.uniform(k2, (delta.shape[1],)))
    anchors = np.asarray(gridmath.get_voxel_coordinate(
        1.0, p.rad_n, p.azi_n, p.ele_n)).reshape(-1, 3)
    K, S, _ = delta.shape
    A = anchors.shape[0]
    r = p.delta / p.rad_n
    o_samp = np.zeros((K, A, p.voxel_sample, 3), np.float32)
    d2 = (np.sum(delta ** 2, -1)[:, None, :]
          - 2.0 * np.einsum("ad,ksd->kas", anchors, delta)
          + np.sum(anchors ** 2, -1)[None, :, None])          # [K,A,S]
    in_ball = d2 <= r * r
    for kk in range(K):
        for aa in range(A):
            cand = np.where(in_ball[kk, aa])[0]
            take = cand[np.argsort(-prio[cand])][: p.voxel_sample]
            o_samp[kk, aa, : len(take)] = delta[kk, take]
    derot = np.asarray(gridmath.azimuth_derotations(p.azi_n))
    o_inv = np.asarray(gridmath.var_to_invar(
        jnp.asarray(o_samp), jnp.asarray(derot), p.rad_n, p.azi_n, p.ele_n))

    # CPU approx_max_k is exact, so selections must agree up to slot order;
    # compare order-invariantly per anchor cell
    assert inv.shape == o_inv.shape
    js = np.sort(inv.reshape(K * A, -1, 3).sum(-1), axis=1)
    os_ = np.sort(o_inv.reshape(K * A, -1, 3).sum(-1), axis=1)
    np.testing.assert_allclose(js, os_, atol=1e-5)

    # --- network body parity on the SAME sampled SPT tensor
    om = oracle.OMiniSpinHead(p.rad_n, p.ele_n, p.azi_n).eval()
    oracle.load_subtree(om, merged, "Desc.")
    with torch.no_grad():
        o_desc, o_equi = om(torch.from_numpy(inv))
    o_desc, o_equi = o_desc.numpy(), o_equi.numpy()           # [K,32],[K,32,e,a]

    j_desc, j_equi = model.Desc.apply(variables["Desc"], jnp.asarray(inv))
    j_desc, j_equi = np.asarray(j_desc), np.asarray(j_equi)   # [K,32],[K,e,a,32]

    cos = np.sum(j_desc * o_desc, axis=-1)
    assert cos.min() > 0.999, float(cos.min())
    np.testing.assert_allclose(np.transpose(j_equi, (0, 3, 1, 2)), o_equi,
                               atol=5e-3)


# ---------------------------------------------------------------------------
# 3. matching + CostVolume + voting + pose: aggregate end-to-end parity
# ---------------------------------------------------------------------------


def test_matching_costvolume_pose_parity(setup):
    inter, merged, cfg = setup["inter"], setup["merged"], setup["cfg"]
    T_gt = setup["T_gt"]
    p = cfg.patch

    s_des, t_des = inter["s_des"], inter["t_des"]
    kvalid = inter["kvalid"]

    # --- oracle mutual matching (exact argmax both directions,
    #     models/BUFFER.py:335-359)
    score = s_des @ t_des.T
    score[~kvalid[0], :] = -1e9
    score[:, ~kvalid[1]] = -1e9
    s_nn = score.argmax(1)
    t_nn = score.argmax(0)
    o_mutual = (t_nn[s_nn] == np.arange(len(s_nn))) & kvalid[0] \
        & kvalid[1][s_nn]

    m = inter["matches"]
    np.testing.assert_array_equal(np.asarray(m.mutual), o_mutual)
    np.testing.assert_array_equal(np.asarray(m.tgt_idx), s_nn)

    # --- oracle CostVolume on the same matched equi maps
    band = slice(1, p.ele_n - 1)
    ss_e = inter["s_equi"][:, band]                   # [K, eb, azi, C]
    tt_e = inter["t_equi"][s_nn][:, band]
    ocv = oracle.OCostVolume(p.azi_n).eval()
    oracle.load_subtree(ocv, merged, "Inlier.")
    with torch.no_grad():
        o_ind = ocv(torch.from_numpy(np.transpose(ss_e, (0, 3, 1, 2))),
                    torch.from_numpy(np.transpose(tt_e, (0, 3, 1, 2)))).numpy()
    j_ind = inter["azi_ind"]
    diff = np.abs(j_ind - o_ind)[o_mutual]
    # soft-argmax of near-identical logits; generous bound per VERDICT
    assert np.quantile(diff, 0.95) < 0.25, float(np.quantile(diff, 0.95))

    # --- oracle voting on oracle hypotheses (models/BUFFER.py:294-311)
    ss_k = inter["kpts"][0]
    tt_k = inter["kpts"][1][s_nn]
    ss_R, tt_R = inter["s_R"], inter["t_R"][s_nn]
    ang = o_ind * 2 * np.pi / p.azi_n + 1e-6
    ca, sa = np.cos(ang), np.sin(ang)
    azi_R = np.zeros((len(ang), 3, 3), np.float64)
    azi_R[:, 0, 0], azi_R[:, 0, 1] = ca, -sa
    azi_R[:, 1, 0], azi_R[:, 1, 1] = sa, ca
    azi_R[:, 2, 2] = 1.0
    R_h = tt_R @ azi_R @ np.transpose(ss_R, (0, 2, 1))
    t_h = tt_k - np.einsum("mij,mj->mi", R_h, ss_k)
    warped = np.einsum("hij,mj->hmi", R_h, ss_k) + t_h[:, None]
    diffs = np.linalg.norm(warped - tt_k[None], axis=-1)
    thr = np.linalg.norm(ss_k, axis=-1) * np.pi / p.azi_n * \
        float(cfg.match.inlier_th)
    sign = (diffs < thr[None]) & o_mutual[None]
    counts = np.where(o_mutual, sign.sum(-1), -1)
    o_best = counts.argmax()

    # winner inlier sets must agree almost everywhere (same bins modulo
    # soft-argmax jitter near the threshold)
    j_inl = inter["vote_inliers"]
    o_inl = sign[o_best]
    agree = (j_inl == o_inl).mean()
    assert agree > 0.97, float(agree)

    # --- final poses: oracle = weighted-Kabsch IRLS on its winner inliers
    # (post_refinement, models/BUFFER.py:382-418); jax = RANSAC + IRLS.
    # Both must hit the ground truth tightly on this easy pair.
    pose = np.eye(4)
    pose[:3, :3], pose[:3, 3] = R_h[o_best], t_h[o_best]
    for _ in range(cfg.static.refine_iters):
        w_src = ss_k @ pose[:3, :3].T + pose[:3, 3]
        resid = np.linalg.norm(w_src - tt_k, axis=-1)
        inl = (resid < 0.10) & o_mutual
        if inl.sum() < 3:
            break
        a, b = ss_k[inl], tt_k[inl]
        ca_, cb_ = a.mean(0), b.mean(0)
        H = (a - ca_).T @ (b - cb_)
        U, _, Vt = np.linalg.svd(H)
        D = np.diag([1, 1, np.linalg.det(Vt.T @ U.T)])
        Rr = Vt.T @ D @ U.T
        pose = np.eye(4)
        pose[:3, :3] = Rr
        pose[:3, 3] = cb_ - Rr @ ca_

    def err(P):
        rte = np.linalg.norm(P[:3, 3] - T_gt[:3, 3])
        rre = np.degrees(np.arccos(np.clip(
            (np.trace(P[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1)))
        return rte, rre

    o_rte, o_rre = err(pose)
    j_pose = np.asarray(setup["res"].pose, np.float64)
    j_rte, j_rre = err(j_pose)
    print(f"oracle RTE={o_rte:.4f} RRE={o_rre:.3f} | "
          f"jax RTE={j_rte:.4f} RRE={j_rre:.3f} | "
          f"mutual={int(o_mutual.sum())}")
    # aggregate-parity claim: the jax pipeline must track the oracle's
    # solution (same matches -> same bins -> same winner -> same pose basin);
    # absolute accuracy at this 64-keypoint tiny scale is bounded loosely
    # (the e2e accuracy gates live in test_registration_e2e / sanity_pair)
    rel_rte = np.linalg.norm(j_pose[:3, 3] - pose[:3, 3])
    rel_cos = (np.trace(j_pose[:3, :3].T @ pose[:3, :3]) - 1) / 2
    rel_rre = np.degrees(np.arccos(np.clip(rel_cos, -1, 1)))
    assert rel_rte < 0.03 and rel_rre < 1.5, (rel_rte, rel_rre)
    assert o_rte < 0.10 and o_rre < 5.0, (o_rte, o_rre)
    assert j_rte < 0.10 and j_rre < 5.0, (j_rte, j_rre)
