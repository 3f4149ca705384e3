"""Fused geometry kernels (Pallas TPU): ball sampling and exact 1-NN.

Profiling the single-jit registration (xprof on a v5e chip) shows the
XLA formulations of two geometry ops dominating the pipeline:

* ``ops.neighbors.ball_sample`` + the subsequent patch gather: the
  [1500, 65536] score field is materialized in HBM, and the
  ``take_along_axis`` / ``jnp.take`` gathers run at ~5 GB/s (gathers pay
  per-row): ~30 ms/pair.
* ``ops.neighbors.nearest`` (pyramid upsample tables): the [30720, 12288]
  distance field round-trips HBM between the matmul and the argmin:
  ~11 ms/pair.

Both are tiled here so the distance tiles live and die in VMEM; the ball
kernel additionally returns the *coordinates* of the selected points
(one-hot extraction on-chip), so no gather ever touches HBM.

Semantics match the XLA versions exactly (same segment layout, same
first-index tie-breaking, same priority vector); tests compare the two
paths in interpreter mode.  Reference lineage: pointnet2 ``ball_query``
over a shuffled cloud (models/patch_embedder.py:97-121) and
KNN_CUDA/nanoflann 1-NN (models/BUFFER.py:335-359).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# ball sampling: top-2 random priorities per support segment, coordinates out
# ---------------------------------------------------------------------------


def _sqdist_tile(qt, sp):
    """Exact fp32 [Qt, L] squared distances as coordinate differences on
    the VPU — the MXU's default bf16 multiplies (which Pallas inherits)
    corrupt near-zero distances by ~1e-3."""
    dx = qt[:, 0:1] - sp[0][None, :]
    dy = qt[:, 1:2] - sp[1][None, :]
    dz = qt[:, 2:3] - sp[2][None, :]
    return dx * dx + dy * dy + dz * dz


def _ball_kernel(L, NS, r2, q_ref, sgrid_ref, u_ref, *out_refs):
    """Segments live in the LANE dimension: support is pre-transposed to a
    [L, NS] grid whose column s is the XLA path's contiguous segment s
    (original index n = s*L + l at [l, s]).  Every reduction (segment max,
    one-hot coordinate extraction) is then a sublane reduce — no per-segment
    loop, no cross-lane argmax."""
    (x1_ref, y1_ref, z1_ref, v1_ref, x2_ref, y2_ref, z2_ref, v2_ref) = out_refs
    qt = q_ref[...]                            # [Qt, 3]
    Qt = qt.shape[0]
    sx = sgrid_ref[0]                          # [L, NS]
    sy = sgrid_ref[1]
    sz = sgrid_ref[2]
    u = u_ref[0]                               # [L, NS] (-BIG where invalid)

    qx = qt[:, 0][:, None, None]
    qy = qt[:, 1][:, None, None]
    qz = qt[:, 2][:, None, None]
    dx = qx - sx[None]
    dy = qy - sy[None]
    dz = qz - sz[None]
    d2 = dx * dx + dy * dy + dz * dz           # [Qt, L, NS]
    score = jnp.where(d2 <= r2, u[None], -BIG)

    def rank(sc):
        m = jnp.max(sc, axis=1)                # [Qt, NS]
        oh = (sc == m[:, None, :]).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(oh, axis=1), 1.0)   # ties -> mean (rare)
        x = jnp.sum(oh * sx[None], axis=1) / cnt
        y = jnp.sum(oh * sy[None], axis=1) / cnt
        z = jnp.sum(oh * sz[None], axis=1) / cnt
        return m, oh, x, y, z

    m1, oh1, x1, y1, z1 = rank(score)
    score2 = score - oh1 * (2.0 * BIG)         # knock out the winner
    m2, _, x2, y2, z2 = rank(score2)

    x1_ref[...] = x1
    y1_ref[...] = y1
    z1_ref[...] = z1
    v1_ref[...] = m1 > -BIG / 2
    x2_ref[...] = x2
    y2_ref[...] = y2
    z2_ref[...] = z2
    v2_ref[...] = m2 > -BIG / 2


@functools.partial(jax.jit, static_argnames=("radius", "k", "q_tile"))
def ball_sample_points_tpu(
    key: jax.Array,
    query: jnp.ndarray,          # [Q, 3]
    support: jnp.ndarray,        # [N, 3]
    support_valid: jnp.ndarray,  # [N] bool
    radius: float,
    k: int,
    q_tile: int = 8,             # [Qt, L, NS] fp32 intermediates live in VMEM
) -> tuple:
    """Fused ball_sample + coordinate gather.

    Same selection semantics as ``ops.neighbors.ball_sample`` (top-2 random
    priorities per contiguous support segment, NS = k//2 segments): returns
    (points [Q, k, 3], valid [Q, k]) where slot order is
    [seg0_first, ..., segNS_first, seg0_second, ..., segNS_second] —
    identical to the XLA path's concatenation.
    """
    Q, _ = query.shape
    N = support.shape[0]
    NS = k // 2
    assert k % 2 == 0 and N % NS == 0, (k, N)
    L = N // NS

    prio = jax.random.uniform(key, (N,), dtype=jnp.float32)
    u = jnp.where(support_valid, prio, -BIG)
    # [L, NS] grids: column s = contiguous segment s of the XLA path
    sgrid = support.T.reshape(3, NS, L).transpose(0, 2, 1)       # [3, L, NS]
    ugrid = u.reshape(1, NS, L).transpose(0, 2, 1)               # [1, L, NS]

    Qp = _round_up(Q, q_tile)
    qpad = jnp.pad(query, ((0, Qp - Q), (0, 0)))

    out_sd = jax.ShapeDtypeStruct((Qp, NS), jnp.float32)
    out_sdb = jax.ShapeDtypeStruct((Qp, NS), jnp.bool_)
    out_spec = pl.BlockSpec((q_tile, NS), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_ball_kernel, L, NS, float(radius) ** 2),
        grid=(Qp // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, L, NS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, NS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,) * 8,
        out_shape=(out_sd, out_sd, out_sd, out_sdb,
                   out_sd, out_sd, out_sd, out_sdb),
    )(qpad, sgrid, ugrid)
    x1, y1, z1, v1, x2, y2, z2, v2 = outs
    p1 = jnp.stack([x1, y1, z1], axis=-1)[:Q]                    # [Q, NS, 3]
    p2 = jnp.stack([x2, y2, z2], axis=-1)[:Q]
    pts = jnp.concatenate([p1, p2], axis=1)                      # [Q, k, 3]
    valid = jnp.concatenate([v1[:Q], v2[:Q]], axis=1)            # [Q, k]
    return pts, valid


# ---------------------------------------------------------------------------
# exact 1-NN (argmin of the full distance field, tiled in VMEM)
# ---------------------------------------------------------------------------


def _nearest_kernel(L, n_seg, q_ref, supT_ref, vmask_ref, d_ref, i_ref):
    qt = q_ref[...]                                # [Qt, 3]
    Qt = qt.shape[0]

    def body(s, carry):
        best_d, best_i = carry
        sp = supT_ref[:, pl.ds(s * L, L)]
        ok = vmask_ref[:, pl.ds(s * L, L)]         # [1, L]
        d2 = jnp.where(ok > 0, _sqdist_tile(qt, sp), BIG)
        m = jnp.min(d2, axis=1)
        a = jnp.argmin(d2, axis=1) + s * L
        better = m < best_d
        return (jnp.where(better, m, best_d),
                jnp.where(better, a.astype(jnp.int32), best_i))

    init = (jnp.full((Qt,), BIG, jnp.float32), jnp.zeros((Qt,), jnp.int32))
    best_d, best_i = lax.fori_loop(0, n_seg, body, init)
    d_ref[...] = best_d[:, None]
    i_ref[...] = best_i[:, None]


@functools.partial(jax.jit, static_argnames=("q_tile", "seg"))
def nearest_tpu(
    query: jnp.ndarray,          # [Q, 3]
    support: jnp.ndarray,        # [N, 3]
    support_valid: jnp.ndarray,  # [N] bool
    q_tile: int = 512,
    seg: int = 2048,
) -> tuple:
    """Exact 1-NN (sqdist [Q], idx [Q]): the distance tiles never leave
    VMEM.  Same contract as ``ops.neighbors.nearest``."""
    Q = query.shape[0]
    N = support.shape[0]
    Np = _round_up(N, seg)
    supT = jnp.pad(support, ((0, Np - N), (0, 0))).T             # [3, Np]
    vmask = jnp.pad(support_valid.astype(jnp.float32),
                    (0, Np - N))[None, :]
    Qp = _round_up(Q, q_tile)
    qpad = jnp.pad(query, ((0, Qp - Q), (0, 0)))

    d, i = pl.pallas_call(
        functools.partial(_nearest_kernel, seg, Np // seg),
        grid=(Qp // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((Qp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Qp, 1), jnp.int32)),
    )(qpad, supT, vmask)
    return d[:Q, 0], i[:Q, 0]


# ---------------------------------------------------------------------------
# fused SPT front: per-anchor thinned masked-max of folded point-MLP features
# ---------------------------------------------------------------------------


def _spt_kernel(S, G, AZ, r2, vs, dT_ref, W_ref, b_ref, f0_ref, u_ref,
                anc_ref, out_ref):
    """One keypoint per grid step.

    dT_ref  [1, 3, S]   patch coords (transposed)
    W_ref   [AZ*16, 3]  azimuth-derotated folded point-MLP weights
    b_ref   [AZ*16, 1]  folded bias
    f0_ref  [16, 1]     feature of an empty/zero sample slot
    u_ref   [1, S]      shared per-point uniforms (thinning)
    anc_ref [AZ*G, 3]   cylindrical anchors, azimuth-major
    out_ref [1, 16, AZ, G]
    """
    dT = dT_ref[0]                                   # [3, S]
    px, py, pz = dT[0:1, :], dT[1:2, :], dT[2:3, :]  # [1, S]
    u = u_ref[...]                                   # [1, S]

    # folded point-MLP features for every azimuth variant: [AZ*16, S]
    feats = jnp.maximum(
        jnp.dot(W_ref[...], dT, preferred_element_type=jnp.float32)
        + b_ref[...], 0.0)

    # exact fp32 anchor-to-point distances (bf16 MXU error ~1e-2 would
    # flip a wide shell of in-ball memberships; see _sqdist_tile)
    ax = anc_ref[:, 0:1]
    ay = anc_ref[:, 1:2]
    az = anc_ref[:, 2:3]
    d2 = ((ax - px) ** 2 + (ay - py) ** 2 + (az - pz) ** 2)   # [AZ*G, S]
    in_ball = d2 <= r2
    count = jnp.sum(in_ball.astype(jnp.float32), axis=1, keepdims=True)
    th = vs / jnp.maximum(count, 1.0)                # [AZ*G, 1]
    keep = in_ball & (u <= th)                       # [AZ*G, S]

    f0 = f0_ref[...]                                 # [16, 1]
    # additive -BIG penalty instead of a boolean select: Mosaic cannot
    # relayout a broadcast i1 mask against the value tiles
    pen = (keep.astype(jnp.float32) - 1.0) * BIGF_K  # [AZ*G, S]
    for a in range(AZ):
        fa = feats[a * 16:(a + 1) * 16, :]           # [16, S]
        pa = pen[a * G:(a + 1) * G, :]               # [G, S]
        big = fa[:, None, :] + pa[None, :, :]
        out = jnp.max(big, axis=2)                   # [16, G]
        cnt = count[a * G:(a + 1) * G, 0][None, :]   # [1, G]
        out = jnp.where(cnt < vs, jnp.maximum(out, f0), out)
        out = jnp.where(cnt == 0.0, jnp.broadcast_to(f0, out.shape), out)
        out_ref[0, :, a, :] = out


BIGF_K = 1e4  # bf16-representable sentinel for the masked max


@functools.partial(jax.jit, static_argnames=("rad_n", "azi_n", "ele_n",
                                              "voxel_r", "voxel_sample"))
def spt_pooled_tpu(
    W_all: jnp.ndarray,          # [AZ, 3, 16] derotated folded MLP weights
    b_eff: jnp.ndarray,          # [16]
    f0: jnp.ndarray,             # [16]
    u: jnp.ndarray,              # [S] shared uniforms
    delta_x: jnp.ndarray,        # [K, S, 3]
    rad_n: int, azi_n: int, ele_n: int,
    voxel_r: float, voxel_sample: int,
) -> jnp.ndarray:
    """Fused SPT + point-MLP + per-anchor thinned masked-max (the whole
    gather-free descriptor front of ``patch_embedder.fused_point_features``)
    in one VMEM-resident kernel per keypoint.  Returns the pooled map
    [K, rad_n, ele_n, azi_n, 16]."""
    from buffer_tpu.core import gridmath

    K, S, _ = delta_x.shape
    AZ = azi_n
    G = rad_n * ele_n
    anchors = jnp.asarray(
        gridmath.get_voxel_coordinate(1.0, rad_n, azi_n, ele_n)
        .reshape(-1, 3), jnp.float32)                # [(g)*AZ + a, 3]
    anc_azi_major = anchors.reshape(G, AZ, 3).transpose(1, 0, 2).reshape(-1, 3)

    WT = W_all.transpose(0, 2, 1).reshape(AZ * 16, 3)          # row a*16+c
    b_col = jnp.tile(b_eff, AZ)[:, None]                       # [AZ*16, 1]
    dT = jnp.swapaxes(delta_x, 1, 2)                           # [K, 3, S]

    out = pl.pallas_call(
        functools.partial(_spt_kernel, S, G, AZ,
                          float(voxel_r) ** 2, float(voxel_sample)),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 3, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((AZ * 16, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((AZ * 16, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AZ * G, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, AZ, G), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, 16, AZ, G), jnp.float32),
    )(dT, WT, b_col, f0[:, None], u[None, :], anc_azi_major)

    # [K, 16, AZ, G] -> [K, G, AZ, 16] -> [K, rad, ele, azi, 16]
    pooled = out.transpose(0, 3, 2, 1)
    return pooled.reshape(K, rad_n, ele_n, azi_n, 16)
