"""MiniSpinNet patch embedder — cylindrical equivariant descriptors.

TPU-native reimplementation of ``models/patch_embedder.py`` (reference):

1. patch extraction: random 512-subset of the des_r-ball around each
   keypoint, center forced into the last slot (reference ``select_patches``
   :93-121 — pointnet2 ball_query over a shuffled cloud + filler masking);
2. axis alignment: Rodrigues rotation taking the learned z-axis to +z for
   3DMatch-family data, identity for KITTI/ETH (:123-149), plus the
   ``rand_axis`` used for SO(2) ground-truth labeling;
3. normalization by des_r and optional SO(2) augmentation (:58-68);
4. SPT: for each of rad_n*ele_n*azi_n cylindrical anchors, sample up to
   ``voxel_sample`` patch points within radius delta/rad_n and derotate
   each azimuth bin into the invariant frame (:151-166,
   utils/common.py:431-498);
5. point MLP (3->16) + max-pool over samples, then the cylindrical CNN,
   attention pooling to a 32-D L2-normalized descriptor and the
   channel-normalized equivariant map (:74-91).

Deviation (documented): the reference's ``sphere_query`` zeroes an anchor's
first sample slot whenever that slot holds patch-point index 0
(utils/common.py:447-449) — a workaround for pointnet2's all-zeros
"no neighbor" convention that also erases genuine index-0 neighbors.  We
carry explicit validity masks instead, so no genuine samples are lost.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from buffer_tpu.core import se3, gridmath
from buffer_tpu.core.numerics import safe_norm, safe_normalize
from buffer_tpu.nn.vn import MaskedBatchNorm
from buffer_tpu.nn.cylindrical import CylindricalNet
from buffer_tpu.ops import neighbors as nbr_ops


def extract_patches(
    key: jax.Array,
    pts: jnp.ndarray,            # [N, 3] raw (first-downsample) cloud
    pts_valid: jnp.ndarray,      # [N] bool
    kpts: jnp.ndarray,           # [K, 3]
    des_r: float,
    patch_sample: int,
) -> jnp.ndarray:
    """Random ``patch_sample``-subset of each keypoint ball; filler slots and
    the final slot carry the keypoint itself (select_patches semantics).
    Returns [K, patch_sample, 3]."""
    N = pts.shape[0]
    if (jax.default_backend() == "tpu" and patch_sample % 2 == 0
            and N % (patch_sample // 2) == 0):
        # fused Pallas path: selection + coordinate extraction in VMEM,
        # no HBM gather (kernels/geom_pallas.py)
        from buffer_tpu.kernels.geom_pallas import ball_sample_points_tpu
        gathered, valid = ball_sample_points_tpu(
            key, kpts, pts, pts_valid, float(des_r), patch_sample)
    else:
        idx, valid = nbr_ops.ball_sample(key, kpts, pts, pts_valid, des_r,
                                         patch_sample)
        gathered = jnp.take(pts, idx, axis=0)                   # [K,S,3]
    patches = jnp.where(valid[..., None], gathered, kpts[:, None, :])
    patches = patches.at[:, -1, :].set(kpts)                    # center at -1
    return patches


def patch_planes_supported(n_points: int, patch_sample: int) -> bool:
    """True when the planes fast path (:func:`extract_patch_planes`) can
    serve this cloud/patch-size combination on TPU."""
    return (jax.default_backend() == "tpu" and patch_sample % 2 == 0
            and n_points % (patch_sample // 2) == 0)


def extract_patch_planes(
    key: jax.Array,
    pts: jnp.ndarray,            # [N, 3] raw (first-downsample) cloud
    pts_valid: jnp.ndarray,      # [N] bool
    kpts: jnp.ndarray,           # [K, 3]
    des_r: float,
    patch_sample: int,
):
    """:func:`extract_patches` as component planes (TPU fused front).

    Returns ``(x, y, z)`` [K, S] with filler slots AND the final slot
    holding the keypoint coordinate (select_patches semantics), so the
    centered delta planes are simply ``(x - kx) / des_r`` with zeros in
    filler slots.  Avoids ever materializing the [K, S, 3] array whose
    3-lane minor dim costs a pathological relayout into the SPT kernel."""
    from buffer_tpu.kernels.geom_pallas import ball_sample_planes_tpu
    x, y, z, valid = ball_sample_planes_tpu(key, kpts, pts, pts_valid,
                                            float(des_r), patch_sample)
    S = x.shape[1]
    col = jnp.arange(S, dtype=jnp.int32)[None, :]
    keep = valid & (col != S - 1)
    x = jnp.where(keep, x, kpts[:, 0:1])
    y = jnp.where(keep, y, kpts[:, 1:2])
    z = jnp.where(keep, z, kpts[:, 2:3])
    return x, y, z


def align_rotation(dataset: str, z_axis: jnp.ndarray) -> jnp.ndarray:
    """The per-patch alignment rotation of :func:`axis_align` without
    touching the patch points (planes fast path): Rodrigues taking the
    learned z-axis to +z for 3DMatch-family data, identity otherwise
    (patch_embedder.py:123-149)."""
    if dataset in ("3DMatch", "3DLoMatch"):
        target = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], z_axis.dtype),
                                  z_axis.shape)
        return se3.rodrigues_a_to_b(z_axis, target)
    return jnp.broadcast_to(jnp.eye(3, dtype=z_axis.dtype),
                            z_axis.shape[:1] + (3, 3))


def axis_align(patches: jnp.ndarray, dataset: str,
               z_axis: Optional[jnp.ndarray], rotate: bool = True):
    """(patch_embedder.py:123-149).  patches [K,S,3]; z_axis [K,3] or None.
    Returns (delta_x [K,S,3], rand_axis [K,3], R [K,3,3]).  With
    ``rotate=False`` the returned delta is UNROTATED (the caller folds R
    into the fused SPT kernel instead)."""
    center = patches[:, -1, :]
    delta = patches - center[:, None, :]
    if dataset in ("3DMatch", "3DLoMatch"):
        if z_axis is None:
            from buffer_tpu.ops.normals import cal_z_axis
            z = cal_z_axis(delta, ref_point=center)
            z = safe_normalize(z, axis=-1)
        else:
            z = z_axis
        target = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], patches.dtype),
                                  z.shape)
        R = se3.rodrigues_a_to_b(z, target)                     # [K,3,3]
        if rotate:
            delta = delta @ R
        rand_axis = jnp.cross(z, target)
        rand_axis = safe_normalize(rand_axis, axis=-1)
    else:  # KITTI / ETH: identity frame (patch_embedder.py:143-148)
        rand_axis = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], patches.dtype),
                                     center.shape)
        R = jnp.broadcast_to(jnp.eye(3, dtype=patches.dtype),
                             center.shape[:1] + (3, 3))
    return delta, rand_axis, R


def spt(
    key: jax.Array,
    delta_x: jnp.ndarray,        # [K, S, 3] normalized patch coords
    rad_n: int, azi_n: int, ele_n: int,
    voxel_r: float, voxel_sample: int,
    kpt_chunk: int = 256,
) -> jnp.ndarray:
    """Spatial point transformer: per-anchor random sampling + azimuth
    derotation.  Returns [K, rad_n*ele_n*azi_n, voxel_sample, 3] with zeros
    in empty slots (matching sphere_query's zero-fill)."""
    anchors = jnp.asarray(
        gridmath.get_voxel_coordinate(1.0, rad_n, azi_n, ele_n)
        .reshape(-1, 3), delta_x.dtype)                          # [A,3]
    derot = jnp.asarray(gridmath.azimuth_derotations(azi_n), delta_x.dtype)
    K, S, _ = delta_x.shape
    A = anchors.shape[0]
    prio = jax.random.uniform(key, (S,))                         # shared order
    r2 = voxel_r * voxel_r

    def per_block(block):                                        # [Kc,S,3]
        d2 = (
            jnp.sum(block * block, axis=-1)[:, None, :]
            - 2.0 * jnp.einsum("ad,ksd->kas", anchors, block,
                               precision=lax.Precision.HIGH)
            + jnp.sum(anchors * anchors, axis=-1)[None, :, None]
        )                                                        # [Kc,A,S]
        score = jnp.where(d2 <= r2, prio[None, None, :], -1e9)
        vals, idx = lax.approx_max_k(
            score.reshape(-1, S), voxel_sample, recall_target=0.95)
        idx = idx.reshape(-1, A, voxel_sample)
        ok = (vals > -1e8).reshape(-1, A, voxel_sample)
        samp = jax.vmap(lambda b, i: jnp.take(b, i, axis=0))(
            block, idx.reshape(-1, A * voxel_sample))
        samp = samp.reshape(-1, A, voxel_sample, 3)
        return jnp.where(ok[..., None], samp, 0.0)

    if K <= kpt_chunk:
        out = per_block(delta_x)
    else:
        pad = (-K) % kpt_chunk
        dx = jnp.pad(delta_x, ((0, pad), (0, 0), (0, 0)))
        blocks = dx.reshape(-1, kpt_chunk, S, 3)
        out = lax.map(per_block, blocks).reshape(-1, A, voxel_sample, 3)[:K]
    return gridmath.var_to_invar(out, derot, rad_n, azi_n, ele_n)


class MiniSpinNet(nn.Module):
    """Descriptor network (patch_embedder.py:17-91).

    Two front-ends feeding the same cylindrical CNN:

    * ``inv_patches`` [K, A, nsample, 3] — the reference-exact sampled SPT
      path (point MLP + max over the sampled slots);
    * ``pooled``      [K, rad, ele, azi, 16] — a precomputed pooled map
      from :func:`fused_point_features` (gather-free inference fast path).
    """

    rad_n: int = 3
    azi_n: int = 20
    ele_n: int = 7

    @nn.compact
    def __call__(self, inv_patches: jnp.ndarray = None,
                 pooled: jnp.ndarray = None, train: bool = False):
        """Returns (desc [K,32], equi [K,ele_n,azi_n,32])."""
        if pooled is None:
            K = inv_patches.shape[0]
            h = nn.Dense(16, name="pnt_conv",
                         precision=jax.lax.Precision.HIGHEST)(inv_patches)
            h = MaskedBatchNorm(16, name="pnt_bn")(h, train=train)
            h = nn.relu(h)
            h = jnp.max(h, axis=2)                               # max over samples
            h = h.reshape(K, self.rad_n, self.ele_n, self.azi_n, 16)
        else:
            K = pooled.shape[0]
            h = pooled
        x = CylindricalNet(name="conv_net")(h, train=train)      # [K,ele,azi,32]

        w = nn.Dense(16, name="pool_conv1",
                     precision=jax.lax.Precision.HIGHEST)(x)
        w = MaskedBatchNorm(16, name="pool_bn1")(w, train=train)
        w = nn.relu(w)
        w = nn.Dense(1, name="pool_conv2",
                     precision=jax.lax.Precision.HIGHEST)(w)
        w = MaskedBatchNorm(1, name="pool_bn2")(w, train=train)
        w = nn.relu(w)
        f = jnp.mean(x * w, axis=(1, 2))                         # [K,32]
        desc = safe_normalize(f, axis=-1, eps=1e-12)
        equi = safe_normalize(x, axis=-1, eps=1e-12)
        return desc, equi


def fused_point_features(
    desc_params: dict,
    desc_stats: dict,
    key: jax.Array,
    delta_x: jnp.ndarray,        # [K, S, 3] normalized patch coords
    rad_n: int, azi_n: int, ele_n: int,
    voxel_r: float, voxel_sample: int,
    kpt_chunk: int = 128,
    R_align: Optional[jnp.ndarray] = None,   # [K,3,3]: delta_x is then
                                             # UNROTATED; the rotation folds
                                             # into the TPU kernel's
                                             # anchors/weights
    delta_planes: Optional[tuple] = None,    # (x, y, z) [K, S] planes
                                             # alternative to delta_x
                                             # (TPU kernel path only)
) -> jnp.ndarray:
    """Gather-free SPT + point-MLP + sample-max, for inference.

    Exploits two linearities the reference's layout hides:

    1. azimuth derotation (var_to_invar) is ``p @ R_i^T`` and the point MLP
       is a bias-Dense — so ``relu(bn(W (R_i p)))`` folds into 20 weight
       variants ``W_i = R_i^T @ W_eff`` (BN running stats folded into
       W_eff/b_eff), one [K,S,3]x[3,20*16] matmul for ALL azimuth bins;
    2. the subsequent reduction is a max over the anchor's sampled points —
       a masked max over the in-radius set needs no gather at all.

    The reference's "<= voxel_sample random points per anchor" cap is
    emulated by Bernoulli thinning with shared per-point uniforms
    (keep iff u_p <= voxel_sample / count_a: expectation matches the
    uniform cap; the reference's zero-filled empty slots contribute
    f0 = relu(bn_eff(0)) whenever count < voxel_sample — reproduced).

    Returns the pooled map [K, rad_n, ele_n, azi_n, 16].
    """
    W = desc_params["pnt_conv"]["kernel"]        # [3, 16]
    b = desc_params["pnt_conv"]["bias"]          # [16]
    g = desc_params["pnt_bn"]["weight"]
    beta = desc_params["pnt_bn"]["bias"]
    mean = desc_stats["pnt_bn"]["mean"]
    var = desc_stats["pnt_bn"]["var"]
    scale = g / jnp.sqrt(var + 1e-5)
    W_eff = W * scale[None, :]                   # fold BN into the Dense
    b_eff = (b - mean) * scale + beta
    dt = delta_x.dtype if delta_planes is None else delta_planes[0].dtype
    R = jnp.asarray(gridmath.azimuth_derotations(azi_n), dt)
    W_all = jnp.einsum("aji,jc->aic", R, W_eff)  # W_a = R_a^T @ W_eff [20,3,16]
    f0 = jax.nn.relu(b_eff)                      # feature of a zero slot

    if delta_planes is not None:
        K, S = delta_planes[0].shape
    else:
        K, S, _ = delta_x.shape
    u = jax.random.uniform(key, (S,))

    if jax.default_backend() == "tpu":
        # single VMEM-resident kernel per keypoint: no [c,G,azi,S,16]
        # broadcast ever reaches HBM (kernels/geom_pallas.py)
        from buffer_tpu.kernels.geom_pallas import spt_pooled_tpu
        return spt_pooled_tpu(W_all, b_eff, f0, u, delta_x,
                              rad_n, azi_n, ele_n,
                              float(voxel_r), int(voxel_sample), R=R_align,
                              delta_planes=delta_planes)
    if delta_planes is not None:
        delta_x = jnp.stack(delta_planes, axis=-1)
    if R_align is not None:
        delta_x = delta_x @ R_align

    anchors = jnp.asarray(
        gridmath.get_voxel_coordinate(1.0, rad_n, azi_n, ele_n)
        .reshape(-1, 3), delta_x.dtype)          # [A, 3], index = (r*ele+e)*azi+a
    A = anchors.shape[0]
    G = A // azi_n                               # anchor groups (rad*ele)
    r2 = voxel_r * voxel_r
    a2 = jnp.sum(anchors * anchors, axis=-1)

    def per_block(block):                        # [c, S, 3]
        c = block.shape[0]
        feats = jax.nn.relu(
            jnp.einsum("ksd,adc->ksac", block, W_all,
                       precision=jax.lax.Precision.HIGH) + b_eff)
        d2 = (jnp.sum(block * block, axis=-1)[:, None, :]
              - 2.0 * jnp.einsum("ad,ksd->kas", anchors, block,
                                 precision=lax.Precision.HIGH)
              + a2[None, :, None])                               # [c,A,S]
        in_ball = d2 <= r2
        count = jnp.sum(in_ball, axis=-1)                        # [c,A]
        thin = u[None, None, :] <= (voxel_sample /
                                    jnp.maximum(count, 1)[..., None])
        keep = in_ball & thin
        keep = keep.reshape(c, G, azi_n, S)
        # the [c, G, azi, S, 16] masked max dominates this function's HBM
        # traffic; on TPU bf16 features halve it, and the pooled map feeds
        # the (bf16) cylindrical CNN anyway.  CPU keeps fp32 so the fused
        # path stays bit-exact against the sampled reference path (tests).
        mdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        fa = jnp.swapaxes(feats, 1, 2).astype(mdt)               # [c,20,S,16]
        big = jnp.where(keep[..., None], fa[:, None], mdt(-BIGF))
        out = jnp.max(big, axis=3).astype(jnp.float32)           # [c,G,20,16]
        cnt = count.reshape(c, G, azi_n)
        out = jnp.where((cnt < voxel_sample)[..., None],
                        jnp.maximum(out, f0), out)
        out = jnp.where((cnt == 0)[..., None], f0, out)
        return out

    if K <= kpt_chunk:
        out = per_block(delta_x)
    else:
        pad = (-K) % kpt_chunk
        dx = jnp.pad(delta_x, ((0, pad), (0, 0), (0, 0)))
        out = lax.map(per_block, dx.reshape(-1, kpt_chunk, S, 3))
        out = out.reshape(-1, G, azi_n, 16)[:K]
    return out.reshape(K, rad_n, ele_n, azi_n, 16)


BIGF = 1e9


def so2_augment(key: jax.Array, patches: jnp.ndarray, rand_axis: jnp.ndarray):
    """Random z-rotation of each (aligned, normalized) patch
    (patch_embedder.py:58-68).  Returns (patches, rand_axis, aug_rotation)."""
    K = patches.shape[0]
    ang = jax.random.uniform(key, (K, 1)) * 2 * jnp.pi
    aa = jnp.concatenate([jnp.zeros((K, 2), patches.dtype), ang], axis=-1)
    aug = se3.angle_axis_to_rotation_matrix(aa)                  # [K,3,3]
    patches = patches @ jnp.swapaxes(aug, -1, -2)
    rand_axis = jnp.einsum("kj,kij->ki", rand_axis, aug)
    return patches, rand_axis, aug
