"""Rotation-equivariant point U-Net (EFCNN) and saliency decoder (DetNet).

TPU-native reimplementation of ``models/point_learner.py`` (reference):
the fixed architecture

    VNN_first, VNN_resnetb_strided, VNN_resnetb, VNN_resnetb_strided,
    VNN_resnetb, nearest_upsample, VN, nearest_upsample, VN
    (models/point_learner.py:4-14)

with VN channel dims 1 -> 10 -> 10 -> 20 -> 20 -> 40 (encoder) and
40+20 -> 20, 20+10 -> 10 (decoder) for first_feats_dim=32
(models/point_learner.py:17-119 dim bookkeeping).

Differences from the reference are purely representational:

* ragged stacked clouds -> a static :class:`Pyramid` of padded per-cloud
  arrays ``[B, N_l, ...]`` with validity masks;
* shadow neighbors (index == N with zero feature / query-point coordinate,
  reference :328-349) -> ``neighbor_valid`` masks with *identical* zero-fill
  arithmetic (unmasked mean over K keeps the reference's shadow-counting
  denominator);
* features travel in the torch-identical FLAT layout ``[B, N, C*3]``
  (channel-major), which keeps the TPU lane dimension wide; channel mixing
  happens via Kronecker matmuls (buffer_tpu.nn.vn flat ops).

Parameter names mirror the torch attribute paths for .pth conversion.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from buffer_tpu.utils import flags
from buffer_tpu.nn.vn import (
    VNLinearLeakyReLU, VNLinearLeakyReLUFlat, VNStdFeature,
    VNStdFeatureFlat, std_perm,
    masked_instance_norm, mean_pool, unflatten_vn,
)


class Pyramid(NamedTuple):
    """Static-shape multiscale conv pyramid (the reference builds this
    raggedly in ``collate_fn_descriptor``, ThreeDMatch/dataloader.py:115-245).

    All arrays have a leading cloud axis B (=2: src, tgt).
    """

    points: Tuple[jnp.ndarray, ...]          # [B, N_l, 3]
    masks: Tuple[jnp.ndarray, ...]           # [B, N_l] bool
    neighbors: Tuple[jnp.ndarray, ...]       # [B, N_l, K_l] int32 (level l)
    neighbor_valid: Tuple[jnp.ndarray, ...]  # [B, N_l, K_l] bool
    pools: Tuple[jnp.ndarray, ...]           # [B, N_{l+1}, K_l] int32 (into level l)
    pool_valid: Tuple[jnp.ndarray, ...]      # [B, N_{l+1}, K_l] bool
    upsamples: Tuple[jnp.ndarray, ...]       # [B, N_l] int32 (into level l+1)
    upsample_valid: Tuple[jnp.ndarray, ...]  # [B, N_l] bool
    features: jnp.ndarray                    # [B, N_0, 3] input normals
    # optional: level-0 neighbor-minus-query offsets from the shared
    # pyramid gather (masked to 0 at invalid slots), in COMPONENT PLANES —
    # lets the first conv skip its coordinate gather (pipeline/pyramid.py)
    l0_off: Optional[jnp.ndarray] = None     # [3, B, N_0, K_0]


def _bgather(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-cloud gather: arr [B, N, D], idx [B, ...] -> [B, ..., D]
    (flat-indexed form; measured 13.5 -> 5.5 ms on the level-0
    neighborhood gather vs the vmapped gather)."""
    from buffer_tpu.ops.neighbors import gather_rows
    return gather_rows(arr, idx)


def gather_neighborhood(
    s_pts: jnp.ndarray, s_feat: jnp.ndarray, q_pts: jnp.ndarray,
    idx: jnp.ndarray, valid: jnp.ndarray, scale: float,
    pack: Optional[bool] = None,
    offsets: Optional[jnp.ndarray] = None,
    eval_bf16: bool = False,
    planes_out: bool = False,
):
    """Gather neighbor features and scale-normalized centered offsets.

    Features travel FLAT ([..., C*3], torch's channel-major order) so the
    gathered rows keep a wide lane dimension.  Returns
    (neighb_x [B,Nq,K,C*3], eqv [B,Nq,K,3]).  Shadow slots get zero
    features and zero offsets (the reference replaces the shadow point by
    the query point before centering — same thing;
    models/point_learner.py:328-343)."""
    # One packed gather for coordinates + features (TPU gathers cost per
    # row, so two half-width gathers are twice the price of one).  Gather
    # cost also scales with row LANES (each row reads tile-granular), so
    # on TPU the features ride as bf16 pairs bit-packed into f32 lanes —
    # ~45% less gather traffic — via gather_coord_feat_bf16, whose
    # custom_vjp keeps gradients exact (a raw bitcast composite would
    # silently zero them).  Coordinates stay exact fp32 (the centered
    # offsets are geometry); bf16 features are the same noise class as the
    # bf16_3x matmuls that consume them.
    from buffer_tpu.ops.neighbors import gather_coord_feat_bf16
    C3 = s_feat.shape[-1]
    if pack is None:
        pack = jax.default_backend() == "tpu" and not flags.EXACT_F32
    pack = pack and C3 % 2 == 0 and C3 >= 6
    # shadow-row gather (the reference's own trick, point_learner.py:328):
    # invalid slots index a zero pad row, so the wide per-feature select
    # disappears; only the 3-lane eqv needs explicit masking (a zero
    # gathered row would otherwise yield -q/scale)
    Ns = s_pts.shape[1]
    idx = jnp.where(valid, idx, Ns)
    if offsets is not None:
        # neighbor offsets already from the shared pyramid gather, in
        # COMPONENT PLANES [3, B, Nq, K] (pre-masked to 0): only the
        # features need a gather.  At eval the conv consumes everything
        # through single-pass bf16 planes matmuls (nn/vn.vnn_block_planes),
        # so the gather emits planes too (the transpose fuses into it —
        # the 40x-padded row-major [2M, 3] never hits HBM) and staging
        # bf16 HERE adds no new noise class.  The train/XLA path
        # interleaves back to [B, Nq, K, C*3] (one relayout).
        stage_t = jnp.bfloat16 if eval_bf16 else s_feat.dtype
        feat = jnp.concatenate(
            [s_feat, jnp.zeros_like(s_feat[:, :8])], axis=1).astype(stage_t)
        if planes_out:
            from buffer_tpu.ops.neighbors import gather_rows_planes
            nbr_fp = gather_rows_planes(feat, idx)       # [C3, B, Nq, K]
            return nbr_fp, (offsets / scale).astype(stage_t)
        nbr_f = _bgather(feat, idx)                      # [B, Nq, K, C3]
        return nbr_f, jnp.moveaxis(offsets / scale, 0, -1).astype(stage_t)
    if pack:
        nbr_xyz, nbr_f = gather_coord_feat_bf16(s_pts, s_feat, idx)
    else:
        packed = jnp.concatenate([s_pts, s_feat], axis=-1)   # [B,Ns,3+C*3]
        packed = jnp.concatenate(
            [packed, jnp.zeros_like(packed[:, :8])], axis=1)
        g = _bgather(packed, idx)                            # [B,Nq,K,...]
        nbr_xyz, nbr_f = g[..., :3], g[..., 3:]
    eqv = (nbr_xyz - q_pts[:, :, None, :]) / scale
    eqv = jnp.where(valid[..., None], eqv, 0.0)
    if eval_bf16:
        # eval-only: every consumer is a single-pass bf16 matmul (planes
        # path), so staging bf16 here halves the mask/unpack traffic
        return nbr_f.astype(jnp.bfloat16), eqv.astype(jnp.bfloat16)
    return nbr_f, eqv


def _vnn_input(neighb_x: jnp.ndarray, eqv: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Assemble the flat VN conv input channels (modes '1' and '6' are the
    only live ones; models/point_learner.py:354-394).  Channel-major flat
    concat matches the torch ordering (feat..., xyz, cross, mean)."""
    if mode == "1":
        return (neighb_x, eqv)
    if mode == "6":
        # cross product of the (single-channel) feature with the offset
        cros = jnp.cross(neighb_x[..., :3], eqv)
        mean = jnp.mean(eqv, axis=2, keepdims=True)      # over K, shadows count
        mean = jnp.broadcast_to(mean, eqv.shape)
        return (neighb_x, eqv, cros, mean)
    raise ValueError(f"unsupported VNN mode {mode!r}")


class VNNConvBlock(nn.Module):
    """'VNN_first' block: gather -> mode-'6' concat -> VNLinearLeakyReLU ->
    mean pool over neighbors (models/point_learner.py:268-416)."""

    out_dim: int
    mode: str
    scale: float

    @nn.compact
    def __call__(self, x, q_pts, q_mask, s_pts, idx, valid, train=False,
                 offsets=None):
        eval_bf16 = (not train and jax.default_backend() == "tpu"
                     and not flags.EXACT_F32)
        conv = VNLinearLeakyReLUFlat(self.out_dim, reduce_k=True, name="conv")
        bn_mask = jnp.broadcast_to(q_mask[:, :, None], idx.shape)
        use_pre = (offsets is not None and self.mode == "6"
                   and not train and not self.is_initializing()
                   and jax.default_backend() == "tpu")
        if use_pre:
            # stay in component planes end to end: the feature gather
            # emits [3, B, Nq, K] planes (fused transpose), the mode-'6'
            # channels (cross, mean) are plane arithmetic, and the conv
            # consumes [3, M, K*1] blocks directly — no interleaved
            # [.., K, 3] tensor (whose 128-lane tile padding is 40x) ever
            # materializes.
            nf, eq = gather_neighborhood(
                s_pts, x, q_pts, idx, valid, self.scale, offsets=offsets,
                eval_bf16=eval_bf16, planes_out=True)    # [3, B, Nq, K] x2
            _, B, Nq, K = nf.shape
            n = nf.reshape(3, B * Nq, K)
            e = eq.reshape(3, B * Nq, K)
            cros = jnp.stack([n[1] * e[2] - n[2] * e[1],
                              n[2] * e[0] - n[0] * e[2],
                              n[0] * e[1] - n[1] * e[0]])
            mean = jnp.broadcast_to(
                jnp.mean(e, axis=2, keepdims=True), e.shape)
            pre = ((n, 1), (e, 1), (cros, 1), (mean, 1))
            return conv(None, mask=bn_mask, train=False,
                        pre_planes=pre, out_bn=(B, Nq))  # [B,Nq,out*3]
        neighb_x, eqv = gather_neighborhood(
            s_pts, x, q_pts, idx, valid, self.scale, offsets=offsets,
            eval_bf16=eval_bf16)
        inp = _vnn_input(neighb_x, eqv, self.mode)
        return conv(inp, mask=bn_mask, train=train)      # [B,Nq,out*3]


class VNNResnetBlock(nn.Module):
    """Bottleneck residual VNN block (models/point_learner.py:419-582):
    conv(out/2 on neighborhoods) -> mean pool -> unary(out) with a
    unary_shortcut on the (max-pooled if strided) input features."""

    out_dim: int
    scale: float
    strided: bool = False

    @nn.compact
    def __call__(self, x, q_pts, q_mask, s_pts, idx, valid, train=False):
        neighb_x, eqv = gather_neighborhood(
            s_pts, x, q_pts, idx, valid, self.scale,
            eval_bf16=(not train and jax.default_backend() == "tpu"
                       and not flags.EXACT_F32))
        inp = _vnn_input(neighb_x, eqv, "1")
        bn_mask = jnp.broadcast_to(q_mask[:, :, None], idx.shape)
        h = VNLinearLeakyReLUFlat(self.out_dim // 2, reduce_k=True, name="conv")(
            inp, mask=bn_mask, train=train)
        h = VNLinearLeakyReLUFlat(self.out_dim, name="unary")(h, mask=q_mask, train=train)

        if self.strided:
            # max over gathered features; the reference's appended zero row
            # means shadow slots clamp the max at 0 (point_learner.py:650-666).
            # neighb_x is exactly the gathered (zero-masked) feature table —
            # no second gather needed.
            shortcut = jnp.max(neighb_x, axis=2)
        else:
            shortcut = x
        shortcut = VNLinearLeakyReLUFlat(self.out_dim, name="unary_shortcut")(
            shortcut, mask=q_mask, train=train)
        return h + shortcut


class VNBlock(nn.Module):
    """Plain pointwise VN MLP block ('VN' decoder entries,
    models/point_learner.py:246-265)."""

    out_dim: int

    @nn.compact
    def __call__(self, x, mask, train=False):
        return VNLinearLeakyReLUFlat(self.out_dim, name="mlp")(x, mask=mask, train=train)


def nearest_upsample(x: jnp.ndarray, idx: jnp.ndarray, valid: jnp.ndarray,
                     pack: Optional[bool] = None) -> jnp.ndarray:
    """closest_pool: copy the nearest coarse feature (flat rows);
    shadow -> zeros (models/point_learner.py:635-647).

    On TPU the copied rows ride as bf16 pairs bit-packed into f32 lanes
    (row gathers pay per-lane tile granularity; same noise class as the
    bf16-packed conv gathers) — via gather_rows_bf16, whose custom_vjp
    keeps gradients exact."""
    from buffer_tpu.ops.neighbors import gather_rows_bf16
    C3 = x.shape[-1]
    if pack is None:
        pack = jax.default_backend() == "tpu" and not flags.EXACT_F32
    if pack and C3 % 2 == 0 and C3 >= 6:
        up = gather_rows_bf16(x, idx)
    else:
        up = _bgather(x, idx)
    return jnp.where(valid[..., None], up, 0.0)


class InvariantHead(nn.Module):
    """VNStdFeature -> Conv1d(3C->2C) -> IN -> Conv1d(2C->C) -> IN ->
    Conv1d(C->1) -> activation.  Shared structure of EFCNN.inv_layer
    (Sigmoid, point_learner.py:163-171) and DetNet.invar_layer (Softplus,
    :128-136).  Instance-norm statistics span both clouds jointly (the
    reference stacks them on one instance axis)."""

    dim: int
    activation: str  # 'sigmoid' | 'softplus'

    @nn.compact
    def __call__(self, x, mask, train=False):
        # x arrives flat [B, N, C*3] and STAYS flat: VNStdFeatureFlat never
        # materializes a [..., 3, C] tensor (whose 3-lane minor dim cost
        # ~1 ms of relayouts per head at level-0 size).  Its output lanes
        # are plane-major, so conv1's torch-ordered kernel rows are
        # permuted to match (a constant [3C]-take, fused at trace time).
        C = x.shape[-1] // 3
        h = VNStdFeatureFlat(self.dim, name="std")(x, mask=mask, train=train)
        dense1 = nn.Dense(self.dim * 2, name="conv1")
        _ = dense1(jnp.zeros((1, 3 * C), x.dtype))
        k1 = self.variables["params"]["conv1"]["kernel"]
        b1 = self.variables["params"]["conv1"]["bias"]
        h = jnp.matmul(h, jnp.take(k1, std_perm(C), axis=0)) + b1
        h = masked_instance_norm(h, mask, axes=(0, 1))
        h = nn.Dense(self.dim, name="conv2")(h)
        h = masked_instance_norm(h, mask, axes=(0, 1))
        # the final 1-channel matvec as an einsum to [B, N]: a Dense(1)
        # output is a [B, N, 1] single-LANE tensor and every elementwise op
        # on it (activation, thresholds) pays the full 128-lane tile
        # (~0.6 ms each at level-0 size).  Params stay under the exact
        # nn.Dense tree (conv3/{kernel,bias}) for .pth conversion; the
        # dummy call materializes them at init (same trick as CostNet)
        dense3 = nn.Dense(1, name="conv3")
        _ = dense3(jnp.zeros((1, h.shape[-1]), h.dtype))
        k = self.variables["params"]["conv3"]["kernel"]
        b = self.variables["params"]["conv3"]["bias"]
        y = jnp.einsum("bnc,c->bn", h, k[:, 0]) + b[0]
        y = nn.sigmoid(y) if self.activation == "sigmoid" else nn.softplus(y)
        # consumers index [..., 0] right back; the expand/squeeze pair
        # cancels inside the jit
        return y[..., None]


class _DecoderMixin:
    """Shared decoder wiring for EFCNN and DetNet (reference Decoder,
    models/point_learner.py:78-119): up(2->1), VN(60->20), up(1->0),
    VN(30->10)."""

    def _decode(self, bottle, skips, pyr: Pyramid, train: bool):
        x = nearest_upsample(bottle, pyr.upsamples[1], pyr.upsample_valid[1])
        x = jnp.concatenate([x, skips[1]], axis=-1)
        x = VNBlock(self.first_dim * 2, name="decoder_blocks_1")(
            x, pyr.masks[1], train=train)
        x = nearest_upsample(x, pyr.upsamples[0], pyr.upsample_valid[0])
        x = jnp.concatenate([x, skips[0]], axis=-1)
        x = VNBlock(self.first_dim, name="decoder_blocks_3")(
            x, pyr.masks[0], train=train)
        return x


class EFCNN(nn.Module, _DecoderMixin):
    """Reference-axis U-Net (models/point_learner.py:154-204).

    Returns (axis [B,N0,3], eps [B,N0,1], branch dict with the bottleneck
    and skip features for DetNet)."""

    first_dim: int = 10     # first_feats_dim // 3
    scale: float = 1.0      # cfg.test.scale (point_learner.py:32,343)

    @nn.compact
    def __call__(self, pyr: Pyramid, train: bool = False):
        f = pyr.features                                # [B,N0,3] = flat C=1
        x0 = VNNConvBlock(self.first_dim, "6", self.scale, name="encoder_blocks_0")(
            f, pyr.points[0], pyr.masks[0], pyr.points[0],
            pyr.neighbors[0], pyr.neighbor_valid[0], train,
            offsets=pyr.l0_off)
        skip0 = x0
        x1 = VNNResnetBlock(self.first_dim, self.scale, strided=True,
                            name="encoder_blocks_1")(
            x0, pyr.points[1], pyr.masks[1], pyr.points[0],
            pyr.pools[0], pyr.pool_valid[0], train)
        x1 = VNNResnetBlock(self.first_dim * 2, self.scale,
                            name="encoder_blocks_2")(
            x1, pyr.points[1], pyr.masks[1], pyr.points[1],
            pyr.neighbors[1], pyr.neighbor_valid[1], train)
        skip1 = x1
        x2 = VNNResnetBlock(self.first_dim * 2, self.scale, strided=True,
                            name="encoder_blocks_3")(
            x1, pyr.points[2], pyr.masks[2], pyr.points[1],
            pyr.pools[1], pyr.pool_valid[1], train)
        x2 = VNNResnetBlock(self.first_dim * 4, self.scale,
                            name="encoder_blocks_4")(
            x2, pyr.points[2], pyr.masks[2], pyr.points[2],
            pyr.neighbors[2], pyr.neighbor_valid[2], train)

        bottle, skips = x2, (skip0, skip1)
        x = self._decode(bottle, skips, pyr, train)

        # axis head: two VN MLPs down to one channel (point_learner.py:159-162)
        h = VNLinearLeakyReLUFlat(self.first_dim // 2, name="fc_layer_0")(
            x, mask=pyr.masks[0], train=train)
        h = VNLinearLeakyReLUFlat(1, name="fc_layer_1")(
            h, mask=pyr.masks[0], train=train)
        axis = h                                         # [B,N0,3] (flat C=1)
        eps = InvariantHead(self.first_dim, "sigmoid", name="inv_layer")(
            x, pyr.masks[0], train)
        return axis, eps, {"bottle": bottle, "skips": skips}


class DetNet(nn.Module, _DecoderMixin):
    """Saliency decoder (models/point_learner.py:122-151): EFCNN's decoder
    wiring with independent weights, run on EFCNN's (frozen) bottleneck and
    skips; Softplus head."""

    first_dim: int = 10

    @nn.compact
    def __call__(self, pyr: Pyramid, branch, train: bool = False):
        x = self._decode(branch["bottle"], branch["skips"], pyr, train)
        return InvariantHead(self.first_dim, "softplus", name="invar_layer")(
            x, pyr.masks[0], train)
