"""Vector-Neuron primitives (flax), TPU layout.

Reimplements the reference's ``models/vn_layers.py`` with a channels-last
layout: VN features are ``[..., 3, C]`` (3 = vector components, C = VN
channels) so channel contractions are lane-aligned matmuls on the MXU.
The torch reference uses ``[B, C, 3, N, (K)]``; the flattened interleaving
``[N, C*3]`` it passes between blocks is channel-major, which our
``flatten_vn``/``unflatten_vn`` preserve for checkpoint parity.

Module and parameter names mirror the torch attribute names
(``map_to_feat``, ``map_to_dir``, ``batchnorm.bn``) so the ``.pth``
converter (buffer_tpu.compat) is a mechanical renaming.

Reference: models/vn_layers.py:12-222.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from jax import lax

from buffer_tpu.core.numerics import safe_norm

EPS = 1e-6  # reference models/vn_layers.py:10
# The direction-gated VN nonlinearity branches on sign(<p, d>): single-pass
# bf16 matmul noise (~4e-3 relative) flips gates and destroys the
# equivariance the architecture promises (measured: axis co-rotation cosine
# 0.73 -> 0.998 when raising precision).  HIGH (bf16_3x, ~2e-7 relative)
# is fp32-grade for this purpose at half the cost of HIGHEST (bf16_6x):
# full-pipeline sanity is unchanged (RTE/RRE/mutual-match parity measured).
PRECISION = lax.Precision.HIGH


def flatten_vn(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, C] -> [..., C*3] in the torch channel-major order
    (flat index = c*3 + component)."""
    moved = jnp.swapaxes(x, -1, -2)  # [..., C, 3]
    return moved.reshape(*x.shape[:-2], x.shape[-1] * 3)


def unflatten_vn(x: jnp.ndarray) -> jnp.ndarray:
    """[..., C*3] -> [..., 3, C] (inverse of :func:`flatten_vn`)."""
    c = x.shape[-1] // 3
    moved = x.reshape(*x.shape[:-1], c, 3)
    return jnp.swapaxes(moved, -1, -2)


class MaskedBatchNorm(nn.Module):
    """BatchNorm with torch semantics and an optional validity mask.

    Normalizes the last axis (channels).  In training, batch statistics are
    computed over all other axes restricted to ``mask``; running stats are
    EMA-updated exactly like torch (momentum 0.1, unbiased running var).
    In eval, running statistics are used (torch ``.eval()`` semantics,
    required for checkpoint parity).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        dtype = x.dtype
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                cnt = jnp.asarray(
                    jnp.prod(jnp.asarray(x.shape[:-1])), jnp.float32)
                mean = jnp.mean(x, axis=reduce_axes)
                var = jnp.mean((x - mean) ** 2, axis=reduce_axes)
            else:
                m = mask.astype(jnp.float32)[..., None]
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=reduce_axes) / cnt
                var = jnp.sum(m * (x - mean) ** 2, axis=reduce_axes) / cnt
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean.astype(dtype)) * jnp.reciprocal(
            jnp.sqrt(var.astype(dtype) + self.eps))
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (self.features,))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * w + b
        return y


class VNLinear(nn.Module):
    """Channel mixing over VN channels (models/vn_layers.py:12-22)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.features, use_bias=False, name="map_to_feat")(x)


class VNBatchNorm(nn.Module):
    """Norm-renormalizing batch norm (models/vn_layers.py:108-130):
    BN is applied to the vector *norms*, and features are rescaled to the
    normalized norm.  Identity when features == 1 (reference :123)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        bn = MaskedBatchNorm(self.features, name="bn")
        if self.features == 1:
            # parameters must still exist for checkpoint-shape parity
            _ = bn(jnp.zeros_like(x[..., 0, :]), train=False)
            return x
        norm = safe_norm(x, axis=-2) + EPS  # [..., C]
        norm_bn = bn(norm, mask=mask, train=train)
        return x / norm[..., None, :] * norm_bn[..., None, :]


class VNLeakyReLU(nn.Module):
    """Direction-gated leaky ReLU (models/vn_layers.py:25-43)."""

    features: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = nn.Dense(self.features, use_bias=False, name="map_to_dir")(x)
        return _vn_leaky(x, d, self.negative_slope)


def _vn_leaky(p: jnp.ndarray, d: jnp.ndarray, slope: float) -> jnp.ndarray:
    dot = jnp.sum(p * d, axis=-2, keepdims=True)
    pos = (dot >= 0).astype(p.dtype)
    d_norm_sq = jnp.sum(d * d, axis=-2, keepdims=True)
    reflected = p - (dot / (d_norm_sq + EPS)) * d
    return slope * p + (1.0 - slope) * (pos * p + (1.0 - pos) * reflected)


class VNLinearLeakyReLU(nn.Module):
    """Linear -> VNBatchNorm -> direction-gated leaky ReLU
    (models/vn_layers.py:46-75).  NOTE the gating direction ``d`` is
    computed from the *input* x, while the gated value is the normalized
    linear output p — faithful to the reference."""

    features: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        p = nn.Dense(self.features, use_bias=False, name="map_to_feat",
                     precision=PRECISION)(x)
        p = VNBatchNorm(self.features, name="batchnorm")(p, mask=mask, train=train)
        d = nn.Dense(self.features, use_bias=False, name="map_to_dir",
                     precision=PRECISION)(x)
        return _vn_leaky(p, d, self.negative_slope)


class VNStdFeature(nn.Module):
    """Learned invariant frame (models/vn_layers.py:169-222,
    normalize_frame=False variant used by EFCNN/DetNet heads).

    Input [..., 3, C]; output the invariant features flattened to
    [..., C*3] in the torch order (c*3 + k)."""

    features: int
    negative_slope: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        z = VNLinearLeakyReLU(self.features, self.negative_slope, name="vn1")(
            x, mask=mask, train=train)
        z = VNLinearLeakyReLU(self.features // 2, self.negative_slope, name="vn2")(
            z, mask=mask, train=train)
        z = nn.Dense(3, use_bias=False, name="vn_lin", precision=PRECISION)(z)
        # torch (dim=4): x_std[c,k] = sum_j x[c,j] * z0[j,k]
        std = jnp.einsum("...jc,...jk->...ck", x, z, precision=PRECISION)
        return std.reshape(*std.shape[:-2], std.shape[-1] * std.shape[-2])


# ---------------------------------------------------------------------------
# Flat-layout VN ops
#
# The [..., 3, C] layout leaves the tensor's minor two dims at (3, C<=40) —
# a (8, 128) TPU tile is then ~3% utilized and every elementwise op pays
# ~30x memory traffic.  The flat layout [..., C*3] (torch's own channel-
# major flattening, flat index = c*3 + component) puts up to 120 elements
# in the lane dim.  Channel mixing becomes x @ (W (x) I3) (a Kronecker
# matmul) and the per-channel vector-norm reductions become 0/1 pooling
# matmuls — both MXU-friendly, no transposes.  Parameter trees are
# IDENTICAL to the [..., 3, C] modules (map_to_feat/kernel etc.), so
# checkpoints convert the same way.
# ---------------------------------------------------------------------------


class _Kernel(nn.Module):
    """Bare kernel parameter holder producing the same ``<name>/kernel``
    param path as nn.Dense."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


def _kron3(W: jnp.ndarray) -> jnp.ndarray:
    """[Cin, Cout] -> [Cin*3, Cout*3] acting per vector component."""
    cin, cout = W.shape
    eye = jnp.eye(3, dtype=W.dtype)
    return (W[:, None, :, None] * eye[None, :, None, :]).reshape(cin * 3, cout * 3)


def _pool3(c: int, dtype=jnp.float32) -> jnp.ndarray:
    """[C*3, C] 0/1 matrix summing the 3 components of each channel."""
    eye = jnp.eye(c, dtype=dtype)
    return jnp.repeat(eye, 3, axis=0)


def _expand3(v: jnp.ndarray) -> jnp.ndarray:
    """[..., C] -> [..., C*3] repeating each channel 3x (flat broadcast)."""
    return jnp.repeat(v, 3, axis=-1)


class VNBatchNormFlat(nn.Module):
    """VNBatchNorm on flat tensors; param path ``<name>/bn`` matches
    :class:`VNBatchNorm`.  ``fold_eval=True`` returns the per-channel
    affine (a, b) such that eval-mode output = p * (a + b / norm) — used by
    the fused Pallas path."""

    features: int

    @nn.compact
    def __call__(self, p: jnp.ndarray, mask=None, train: bool = False,
                 fold_eval: bool = False):
        bn = MaskedBatchNorm(self.features, name="bn")
        if fold_eval:
            # touch the bn once so params exist in both paths
            _ = bn(jnp.zeros((1, self.features), jnp.float32), train=False)
            if self.features == 1:
                return (jnp.ones((1,), jnp.float32),
                        jnp.zeros((1,), jnp.float32))
            stats = self.variables["batch_stats"]["bn"]
            params = self.variables["params"]["bn"]
            a = params["weight"] / jnp.sqrt(stats["var"] + 1e-5)
            b = params["bias"] - stats["mean"] * a
            return a.astype(jnp.float32), b.astype(jnp.float32)
        pool = _pool3(self.features, p.dtype)
        norm_sq = jnp.matmul(p * p, pool, precision=PRECISION)  # [..., C]
        norm = jnp.sqrt(jnp.maximum(norm_sq, 1e-24)) + EPS
        if self.features == 1:
            _ = bn(jnp.zeros_like(norm), train=False)
            return p
        norm_bn = bn(norm, mask=mask, train=train)
        return p * _expand3(norm_bn / norm)


def _blockdiag(K: int, W: jnp.ndarray) -> jnp.ndarray:
    """I_K (x) W: [K*Cin, K*Cout] block-diagonal channel mixer applied
    independently per neighbor slot."""
    cin, cout = W.shape
    eyeK = jnp.eye(K, dtype=W.dtype)
    return (eyeK[:, None, :, None] * W[None, :, None, :]).reshape(
        K * cin, K * cout)


def vnn_block_planes(
    x,                         # [M, K, Cin*3] flat input, or a tuple of
                               # such parts (channel-concatenated logically);
                               # with pre=True: ((xp [3, M, K*ci], ci), ...)
                               # already in planes layout (no transpose here)
    Wf: jnp.ndarray,           # [Cin, Cout]
    Wd: jnp.ndarray,           # [Cin, Cout]
    bn_a: jnp.ndarray,         # [Cout] folded BN scale (ones if no BN)
    bn_b: jnp.ndarray,         # [Cout] folded BN shift (zeros if no BN)
    negative_slope: float = 0.2,
    pre: bool = False,
) -> jnp.ndarray:
    """Fused eval-mode VNLinearLeakyReLU + mean-over-K in a component-planes
    layout.  Returns [M, Cout*3].

    The interleaved flat layout (lane = c*3 + component) is deinterleaved
    ONCE into a size-3 component axis; after that:

    * channel mixing  = one [M*3, K*Cin] @ [K*Cin, K*Cout] matmul (MXU;
      3x fewer FLOPs than the Kronecker form since the I3 zeros vanish),
    * every 3-component reduction (BN vector norm, gating dot, direction
      norm) = a sum over the leading size-3 axis (VPU, no pooling matmul),
    * the mean over K = one tiny [K*Cout, Cout] averaging matmul.

    fp32 end-to-end (see PRECISION rationale at the top of this module).

    Tuple inputs avoid materializing the channel concatenation: each part
    is transposed separately and contracted against its row slice of the
    (block-diagonal) weights — the sum equals the concatenated matmul.
    NOTE the block-diagonal weights are (K-1)/K zeros, but the dense
    per-neighbor form [3*M*K, cin] @ [cin, cout] is SLOWER despite 34x
    fewer FLOPs: its cout-wide (10-40 lane) intermediates pay ~8x tile
    padding on every elementwise pass (measured 97 -> 113 ms/pair).
    A fully-fused Pallas kernel of this block (dense per-neighbor matmuls
    + the whole elementwise chain in VMEM) was also measured SLOWER —
    3.38 vs 1.41 ms at the enc2 shape (M=24576, K=34, 10->10): its
    [3*cout, TR] blocks keep only ~30 sublanes busy while this layout
    feeds the MXU full [*, K*Cin] tiles.  Kernel deleted; this is the
    record of that experiment.
    """
    parts = x if isinstance(x, (tuple, list)) else (x,)
    if pre:
        M = parts[0][0].shape[1]
        K = parts[0][0].shape[2] // parts[0][1]
    else:
        M, K, _ = parts[0].shape
    cout = Wf.shape[1]

    p = None
    d = None
    row = 0
    for part in parts:
        if pre:
            xp, ci = part                   # [3, M, K*ci], pre-planed
        else:
            ci = part.shape[-1] // 3
            # [M, K, ci, 3] -> [3, M, K*ci]: one physical transpose/part
            xp = jnp.moveaxis(part.reshape(M, K, ci, 3), -1, 0).reshape(
                3, M, K * ci)
        WfB = _blockdiag(K, Wf[row:row + ci])
        WdB = _blockdiag(K, Wd[row:row + ci])
        # Single-pass bf16 inputs with f32 MXU accumulation (TPU only; on
        # CPU the cast buys nothing and breaks the exact-fp32 torch-oracle
        # parity the test suite relies on).  Why this is safe where naive
        # bf16 matmuls elsewhere were not (PRECISION note above):
        # * multi-channel features arriving here are ALREADY bf16-rounded
        #   by the packed neighborhood gathers, so input rounding adds no
        #   new noise class; accumulation stays exact f32.
        # * the VN leaky gate is CONTINUOUS at its decision boundary
        #   (dot -> 0 makes the reflected branch converge to p), so
        #   near-threshold gate flips perturb values by O(noise), unlike
        #   hard selects.  Measured on the full pipeline: mutual matches
        #   and sanity RTE/RRE unchanged (see bench history).
        from buffer_tpu.utils import flags
        on_tpu = (jax.default_backend() == "tpu"
                  and not flags.EXACT_F32)
        # The [3, M, K*Cout] p/d planes are the dominant HBM tensors of the
        # whole EFCNN (250 MB each at the enc0 shape, written once per part
        # matmul and re-read by every elementwise pass — ~2 GB/block on the
        # depth-1 timeline).  On TPU they are STORED bf16: every reduction
        # below upcasts to f32 inside its fusion, so only storage is
        # rounded, and accumulation/gating math stays f32.
        acc_t = jnp.bfloat16 if on_tpu else xp.dtype
        if on_tpu:
            pp = jnp.matmul(xp.astype(jnp.bfloat16), WfB.astype(jnp.bfloat16),
                            preferred_element_type=acc_t)
            dd = jnp.matmul(xp.astype(jnp.bfloat16), WdB.astype(jnp.bfloat16),
                            preferred_element_type=acc_t)
        else:
            pp = jnp.matmul(xp, WfB, precision=PRECISION)   # [3, M, K*Cout]
            dd = jnp.matmul(xp, WdB, precision=PRECISION)
        p = pp if p is None else p + pp
        d = dd if d is None else d + dd
        row += ci

    f32 = lambda t: t.astype(jnp.float32)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(f32(p) * f32(p), axis=0), 1e-24)) + EPS
    at = jnp.tile(bn_a, K)
    bt = jnp.tile(bn_b, K)
    p = (f32(p) * (at + bt / norm)[None]).astype(p.dtype)  # folded VNBatchNorm

    dot = jnp.sum(f32(p) * f32(d), axis=0)             # [M, K*Cout] f32
    dsq = jnp.sum(f32(d) * f32(d), axis=0)
    coef = (dot / (dsq + EPS)).astype(p.dtype)
    pos = (dot >= 0).astype(p.dtype)
    reflected = p - coef[None] * d
    s = jnp.asarray(negative_slope, p.dtype)
    one = jnp.asarray(1.0, p.dtype)
    out = s * p + (one - s) * (pos[None] * p + (one - pos)[None] * reflected)

    # mean over K and reinterleave: [3, M, K*Cout] -> [M, Cout*3]
    avg = jnp.tile(jnp.eye(cout, dtype=out.dtype), (K, 1)) / K  # [K*Cout, Cout]
    pooled = jnp.matmul(out, avg, preferred_element_type=jnp.float32,
                        precision=lax.Precision.DEFAULT
                        if out.dtype == jnp.bfloat16
                        else PRECISION)                         # [3, M, Cout]
    return jnp.moveaxis(pooled, 0, -1).reshape(M, cout * 3)


class VNLinearLeakyReLUFlat(nn.Module):
    """VNLinearLeakyReLU on flat [..., Cin*3] tensors; same semantics and
    parameter tree as :class:`VNLinearLeakyReLU`.

    ``reduce_k=True`` fuses the neighbor mean-pool (axis=2 of a
    [B, N, K, Cin*3] input) into the op.  In eval the block runs in a
    component-planes layout (:func:`vnn_block_planes`): the x/y/z vector
    components become a size-3 batch axis, so channel mixing is a
    block-diagonal ``[*, K*Cin] @ [K*Cin, K*Cout]`` MXU matmul and every
    per-channel 3-component reduction (norms, gating dots) is a cheap
    sum over that axis — no pooling matmuls, no big transposes.  The BN
    running stats fold into an affine factor.  Training uses the XLA
    composition below (batch statistics).
    """

    features: int
    negative_slope: float = 0.2
    reduce_k: bool = False
    impl: str = "auto"   # 'auto' | 'planes' | 'xla'

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, pre_planes=None,
                 out_bn: Optional[tuple] = None) -> jnp.ndarray:
        if pre_planes is not None:
            # parts arrive PRE-PLANED: ((xp [3, M, K*ci], ci), ...) — the
            # caller built them straight from a fused gather+transpose
            # (VNNConvBlock planes path); no interleaved tensor exists.
            cin = sum(ci for _, ci in pre_planes)
        elif isinstance(x, (tuple, list)):
            cin = sum(p.shape[-1] for p in x) // 3
        else:
            cin = x.shape[-1] // 3
        cout = self.features
        Wf = _Kernel((cin, cout), name="map_to_feat")()
        Wd = _Kernel((cin, cout), name="map_to_dir")()
        bn = VNBatchNormFlat(cout, name="batchnorm")

        if pre_planes is not None:
            a, b = bn(None, fold_eval=True)
            out = vnn_block_planes(pre_planes, Wf, Wd, a, b,
                                   self.negative_slope, pre=True)
            B, N = out_bn
            return out.reshape(B, N, cout * 3)
        use_planes = ((not train) and not self.is_initializing()
                      and self.impl != "xla" and self.reduce_k)
        if use_planes:
            a, b = bn(None, fold_eval=True)
            parts = x if isinstance(x, (tuple, list)) else (x,)
            B, N, K = parts[0].shape[:3]
            flat = tuple(p.reshape(B * N, K, p.shape[-1]) for p in parts)
            out = vnn_block_planes(flat, Wf, Wd, a, b, self.negative_slope)
            return out.reshape(B, N, cout * 3)
        if isinstance(x, (tuple, list)):
            x = jnp.concatenate(x, axis=-1)

        pool = _pool3(cout, x.dtype)
        p = x @ _kron3(Wf)                                     # [..., Cout*3]
        p = bn(p, mask=mask, train=train)
        d = x @ _kron3(Wd)
        dot = (p * d) @ pool                                   # [..., Cout]
        d_norm_sq = (d * d) @ pool
        coef = dot / (d_norm_sq + EPS)
        pos = (dot >= 0).astype(p.dtype)
        reflected = p - _expand3(coef) * d
        slope = self.negative_slope
        out = slope * p + (1.0 - slope) * (
            _expand3(pos) * p + _expand3(1.0 - pos) * reflected)
        if self.reduce_k:
            out = jnp.mean(out, axis=2)
        return out


class VNStdFeatureFlat(nn.Module):
    """:class:`VNStdFeature` on flat ``[..., C*3]`` tensors — no
    ``[..., 3, C]`` intermediate ever exists (those 3-lane minor dims cost
    ~1 ms of relayout copies per head at level-0 size).

    Parameter tree is IDENTICAL to :class:`VNStdFeature` (``vn1``/``vn2``
    with ``map_to_feat``/``map_to_dir``/``batchnorm.bn``, ``vn_lin``), so
    checkpoints convert the same way.

    The invariant contraction ``std[c, k] = sum_j x[c*3+j] * z[k*3+j]``
    runs as three flat passes: tile z's k-th component triple across the C
    channels, multiply, and 3-pool — all lane-major.  Output lanes are
    PLANE-MAJOR (``k*C + c``), NOT the torch ``c*3 + k`` interleave;
    consumers must permute the rows of the next dense layer accordingly
    (:func:`std_perm`)."""

    features: int
    negative_slope: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        C = x.shape[-1] // 3
        z = VNLinearLeakyReLUFlat(self.features, self.negative_slope,
                                  name="vn1")(x, mask=mask, train=train)
        z = VNLinearLeakyReLUFlat(self.features // 2, self.negative_slope,
                                  name="vn2")(z, mask=mask, train=train)
        W_lin = _Kernel((self.features // 2, 3), name="vn_lin")()
        z3 = jnp.matmul(z, _kron3(W_lin), precision=PRECISION)  # [..., 9]
        pool = _pool3(C, x.dtype)
        outs = []
        for k in range(3):
            zk = z3[..., k * 3:(k + 1) * 3]                     # [..., 3]
            tiled = jnp.broadcast_to(
                zk[..., None, :], zk.shape[:-1] + (C, 3)
            ).reshape(*zk.shape[:-1], C * 3)
            outs.append(jnp.matmul(x * tiled, pool, precision=PRECISION))
        return jnp.concatenate(outs, axis=-1)                   # [..., 3C]


def std_perm(C: int) -> jnp.ndarray:
    """Row permutation mapping a torch-ordered ``[3C, ...]`` dense kernel
    (row = c*3 + k) onto :class:`VNStdFeatureFlat`'s plane-major output
    lanes (k*C + c): ``kernel_planes = kernel[std_perm(C)]``."""
    import numpy as np
    perm = np.empty(3 * C, np.int32)
    for k in range(3):
        for c in range(C):
            perm[k * C + c] = c * 3 + k
    return jnp.asarray(perm)


def masked_instance_norm(x: jnp.ndarray, mask: jnp.ndarray,
                         axes: tuple, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm with statistics over ``axes`` restricted to ``mask``.

    The reference applies torch ``nn.InstanceNorm1d`` to the *stacked*
    src+tgt point axis (batch size 1, models/point_learner.py:128-136,
    163-171), i.e. one set of statistics over both clouds jointly; callers
    reproduce that by including the cloud axis in ``axes``.
    """
    m = mask.astype(x.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(m, axis=axes, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=axes, keepdims=True) / cnt
    var = jnp.sum(m * (x - mean) ** 2, axis=axes, keepdims=True) / cnt
    return (x - mean) / jnp.sqrt(var + eps)


def mean_pool(x: jnp.ndarray, axis: int = -3) -> jnp.ndarray:
    """Unmasked mean over the neighbor axis — shadow neighbors contribute
    zeros to the numerator but still count in the denominator, exactly like
    the reference's ``mean_pool`` over gathered arrays with zeroed shadow
    rows (models/vn_layers.py:165-166, models/point_learner.py:349,413)."""
    return jnp.mean(x, axis=axis)
