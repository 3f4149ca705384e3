"""Fused Vector-Neuron conv block as a Pallas TPU kernel.

The VNN block (VNLinearLeakyReLU over gathered neighborhoods + mean pool,
models/point_learner.py:268-416 in the reference) is a ~15-op elementwise
chain over [B*N, K, C] tensors.  Under XLA each pass round-trips HBM
(~30 ms at 3DMatch scale); fusing the whole block into one kernel keeps
every intermediate in VMEM — HBM traffic collapses to one read of the
gathered input and one write of the pooled output (<1 ms).

Eval-mode only: the VNBatchNorm running statistics fold into an affine
per-channel factor ``norm_bn = a * norm + b``, so the renormalization is
``p * (a + b / norm)``.  Training (batch statistics) uses the XLA path.

All channel reductions ride the MXU: channel mixing via ``W (x) I3``
Kronecker matmuls, per-channel 3-component sums via a 0/1 pooling matrix,
channel->component broadcast via its transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def _kron3_np(W: np.ndarray) -> np.ndarray:
    cin, cout = W.shape
    eye = np.eye(3, dtype=W.dtype)
    return (W[:, None, :, None] * eye[None, :, None, :]).reshape(cin * 3, cout * 3)


def _kernel(slope, has_bn, x_ref, wf_ref, wd_ref, ab_ref, out_ref):
    # x_ref: [Cin3, TR] — a pure 2D block with the fused (row, neighbor)
    # dim in lanes: full vreg utilization, no in-kernel reshapes (Mosaic
    # shape casts on non-trivial minor-dim merges are serialized shuffles).
    Cin3, TR = x_ref.shape
    Cout3 = wf_ref.shape[0]
    C = Cout3 // 3
    xf = x_ref[...]
    hp = jax.lax.Precision.HIGHEST   # see nn/vn.py PRECISION rationale
    p = jnp.dot(wf_ref[...], xf, preferred_element_type=jnp.float32,
                precision=hp)
    d = jnp.dot(wd_ref[...], xf, preferred_element_type=jnp.float32,
                precision=hp)

    # [C, Cout3] 0/1 matrix summing the 3 components of each channel
    pool = (jax.lax.broadcasted_iota(jnp.int32, (C, Cout3), 1) // 3
            == jax.lax.broadcasted_iota(jnp.int32, (C, Cout3), 0)
            ).astype(jnp.float32)

    def csum(v):     # [Cout3, R] -> [C, R]
        return jnp.dot(pool, v, preferred_element_type=jnp.float32,
                       precision=hp)

    def expand3(v):  # [C, R] -> [Cout3, R]
        return jnp.dot(pool.T, v, preferred_element_type=jnp.float32,
                       precision=hp)

    if has_bn:
        a = ab_ref[0]      # [C]
        b = ab_ref[1]
        norm = jnp.sqrt(jnp.maximum(csum(p * p), 1e-24)) + EPS
        p = p * expand3(a[:, None] + b[:, None] / norm)

    dot = csum(p * d)
    dsq = csum(d * d)
    refl = p - expand3(dot / (dsq + EPS)) * d
    pos = expand3((dot >= 0).astype(jnp.float32))
    out_ref[...] = slope * p + (1.0 - slope) * (pos * p + (1.0 - pos) * refl)


def vnn_block_fused(
    x: jnp.ndarray,            # [M, K, Cin*3] gathered VN input (flat)
    Wf: jnp.ndarray,           # [Cin, Cout]
    Wd: jnp.ndarray,           # [Cin, Cout]
    bn_a: jnp.ndarray | None,  # [Cout] folded BN scale (None: no BN)
    bn_b: jnp.ndarray | None,  # [Cout] folded BN shift
    negative_slope: float = 0.2,
) -> jnp.ndarray:
    """Fused VNLinearLeakyReLU + mean-over-K.  Returns [M, Cout*3]."""
    M, K, Cin3 = x.shape
    Cout = Wf.shape[1]
    Cout3 = Cout * 3

    R = M * K
    # lane-tile size: block + temporaries within ~4 MB of VMEM
    TR = int(4e6 // (4 * (Cin3 + 5 * Cout3)))
    TR = max(512, min(8192, (TR // 512) * 512))
    pad = (-R) % TR
    xt = jnp.pad(x.reshape(R, Cin3), ((0, pad), (0, 0))).T   # [Cin3, R+pad]
    G = (R + pad) // TR

    eye3 = jnp.eye(3, dtype=x.dtype)
    kron = lambda W: (W[:, None, :, None] * eye3[None, :, None, :]
                      ).reshape(W.shape[0] * 3, W.shape[1] * 3)
    wfk = kron(Wf).T                                   # [Cout3, Cin3]
    wdk = kron(Wd).T
    has_bn = bn_a is not None
    ab = (jnp.stack([bn_a, bn_b]) if has_bn
          else jnp.zeros((2, Cout), x.dtype))

    out = pl.pallas_call(
        functools.partial(_kernel, negative_slope, has_bn),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((Cin3, TR), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout3, Cin3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout3, Cin3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Cout3, TR), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cout3, R + pad), x.dtype),
    )(xt, wfk, wdk, ab)
    # neighbor mean-pool outside (one cheap XLA reduce)
    return jnp.mean(out[:, :R].T.reshape(M, K, Cout3), axis=1)
