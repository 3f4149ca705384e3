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


def _ball_kernel(L, NS, r2, q_ref, sgrid_ref, sn_ref, u_ref, *out_refs):
    """Segments live in the LANE dimension: support is pre-transposed to a
    [L, NS] grid whose column s is the XLA path's contiguous segment s
    (original index n = s*L + l at [l, s]).  Every reduction (segment max,
    one-hot coordinate extraction) is then a sublane reduce — no per-segment
    loop, no cross-lane argmax.

    The ball test runs in the expanded form d2 = |q|^2 + |s|^2 - 2 q.s
    with |q|^2 folded into the radius threshold and |s|^2 precomputed
    ([L, NS] input): 3 FMA passes + 1 compare over the dominant
    [Qt, L, NS] field instead of the 7-pass coordinate-difference form.
    (Expanded-form rounding differs by a few ulps of |q||s|; boundary
    flips need |d2 - r2| inside that sliver — measure-zero on real
    clouds, and the selection feeds random-priority sampling.)  The old
    "ties -> mean" count machinery is dropped: priorities are distinct
    random floats, so two in-ball rows of one segment can never tie and
    the one-hot sum is exactly the winner's coordinate."""
    (x1_ref, y1_ref, z1_ref, v1_ref, x2_ref, y2_ref, z2_ref, v2_ref) = out_refs
    qt = q_ref[...]                            # [Qt, 3]
    Qt = qt.shape[0]
    sx = sgrid_ref[0]                          # [L, NS]
    sy = sgrid_ref[1]
    sz = sgrid_ref[2]
    sn = sn_ref[0]                             # [L, NS] |s|^2
    u = u_ref[0]                               # [L, NS] (-BIG where invalid)

    qx = qt[:, 0][:, None, None]
    qy = qt[:, 1][:, None, None]
    qz = qt[:, 2][:, None, None]
    rhs = r2 - (qx * qx + qy * qy + qz * qz)   # [Qt, 1, 1]
    t = (-2.0 * qx) * sx[None] + sn[None]      # [Qt, L, NS]
    t = t + (-2.0 * qy) * sy[None]
    t = t + (-2.0 * qz) * sz[None]
    score = jnp.where(t <= rhs, u[None], -BIG)

    def rank(sc):
        m = jnp.max(sc, axis=1)                # [Qt, NS]
        oh = (sc == m[:, None, :]).astype(jnp.float32)
        x = jnp.sum(oh * sx[None], axis=1)
        y = jnp.sum(oh * sy[None], axis=1)
        z = jnp.sum(oh * sz[None], axis=1)
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
                                 # (16 measured neutral; KITTI's L=1024
                                 # grid would double to 8 MB/tile)
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
    sn = jnp.sum(support * support, axis=-1)                     # [N] |s|^2
    sngrid = sn.reshape(1, NS, L).transpose(0, 2, 1)             # [1, L, NS]
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
            pl.BlockSpec((1, L, NS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,) * 8,
        out_shape=(out_sd, out_sd, out_sd, out_sdb,
                   out_sd, out_sd, out_sd, out_sdb),
    )(qpad, sgrid, sngrid, ugrid)
    x1, y1, z1, v1, x2, y2, z2, v2 = outs
    p1 = jnp.stack([x1, y1, z1], axis=-1)[:Q]                    # [Q, NS, 3]
    p2 = jnp.stack([x2, y2, z2], axis=-1)[:Q]
    pts = jnp.concatenate([p1, p2], axis=1)                      # [Q, k, 3]
    valid = jnp.concatenate([v1[:Q], v2[:Q]], axis=1)            # [Q, k]
    return pts, valid


@functools.partial(jax.jit, static_argnames=("radius", "k", "q_tile"))
def ball_sample_planes_tpu(
    key: jax.Array,
    query: jnp.ndarray,          # [Q, 3]
    support: jnp.ndarray,        # [N, 3]
    support_valid: jnp.ndarray,  # [N] bool
    radius: float,
    k: int,
    q_tile: int = 8,
) -> tuple:
    """:func:`ball_sample_points_tpu` returning COMPONENT PLANES
    ``(x [Q,k], y [Q,k], z [Q,k], valid [Q,k])`` instead of a stacked
    [Q, k, 3] array.  The stacked form's 3-lane minor dim forces a
    pathological layout copy into every downstream consumer (measured
    1.1 ms at the 3000x512 descriptor front); the planes ride as clean
    [Q, k] tiles straight into :func:`spt_pooled_tpu`."""
    Q, _ = query.shape
    N = support.shape[0]
    NS = k // 2
    assert k % 2 == 0 and N % NS == 0, (k, N)
    L = N // NS

    prio = jax.random.uniform(key, (N,), dtype=jnp.float32)
    u = jnp.where(support_valid, prio, -BIG)
    sgrid = support.T.reshape(3, NS, L).transpose(0, 2, 1)       # [3, L, NS]
    sn = jnp.sum(support * support, axis=-1)                     # [N] |s|^2
    sngrid = sn.reshape(1, NS, L).transpose(0, 2, 1)             # [1, L, NS]
    ugrid = u.reshape(1, NS, L).transpose(0, 2, 1)               # [1, L, NS]

    Qp = _round_up(Q, q_tile)
    qpad = jnp.pad(query, ((0, Qp - Q), (0, 0)))

    out_sd = jax.ShapeDtypeStruct((Qp, NS), jnp.float32)
    out_sdb = jax.ShapeDtypeStruct((Qp, NS), jnp.bool_)
    out_spec = pl.BlockSpec((q_tile, NS), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    x1, y1, z1, v1, x2, y2, z2, v2 = pl.pallas_call(
        functools.partial(_ball_kernel, L, NS, float(radius) ** 2),
        grid=(Qp // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, L, NS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, NS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, NS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,) * 8,
        out_shape=(out_sd, out_sd, out_sd, out_sdb,
                   out_sd, out_sd, out_sd, out_sdb),
    )(qpad, sgrid, sngrid, ugrid)
    x = jnp.concatenate([x1[:Q], x2[:Q]], axis=1)                # [Q, k]
    y = jnp.concatenate([y1[:Q], y2[:Q]], axis=1)
    z = jnp.concatenate([z1[:Q], z2[:Q]], axis=1)
    valid = jnp.concatenate([v1[:Q], v2[:Q]], axis=1)
    return x, y, z, valid


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


def _spt_kernel(S, A, NSEG, NUSE, Kt, r2, bx_ref, by_ref, bz_ref, Rt_ref,
                Wx_ref, Wy_ref, Wz_ref, b_ref, f0_ref, u_ref, anc_ref,
                out_ref):
    """Kt keypoints per grid step; stratified sampled-SPT semantics.

    For each cylindrical anchor, take the top-random-priority in-ball point
    of each of NUSE contiguous 32-point patch segments (<= NUSE random ball
    samples — the TPU analog of sphere_query's "first voxel_sample of a
    shuffled patch", utils/common.py:431-469), run the folded azimuth-
    derotated point-MLP on just those samples, and max-pool; empty slots
    contribute f0 exactly like the reference's zero-filled slots.

    Patch points are ROTATED per keypoint in-kernel (pr = p @ R, 9 cheap
    [S,1]-column FMAs) — the reference's own orientation (delta @ R,
    patch_embedder.py:130-142) — so the anchor grid AND the MLP weight
    rows are shared across keypoints.  The ball test then runs in the
    expanded form  d2 = |pr|^2 + |a|^2 - 2 pr.a  with |pr|^2 folded into
    the radius threshold:  3 FMA passes + 1 compare over the [S, A] field
    instead of the 8-pass coordinate-difference form.  (Expanded-form
    rounding differs from the difference form by a few ulps of |p||a| ~ 1;
    the in-ball boundary at r2 ~ 0.1 flips only for |d2 - r2| < ~1e-6 —
    measure-zero for random clouds, and the selection feeds a max-pooled
    MLP.)  Tie-handling note: the old one-hot extraction divided by the
    match count ("ties -> mean"), but priorities u are distinct random
    floats shared across anchors, so two in-ball slots of one segment can
    never tie — the count machinery was dead weight and is dropped (sum of
    a one-hot select is the winner's value exactly).

    bx/by/bz  [1, S, Kt]   patch coordinate PLANES, UNROTATED (centered,
                           /des_r), pre-blocked on the host so each
                           keypoint's coordinates are a STATIC [S, 1]
                           column slice (the old [Kt, S, 3] block carried
                           a 3-lane minor dim the compiler padded 42x;
                           in-kernel [Kt,S]->[S,Kt] transposes measured
                           +1.4 ms — Mosaic relayouts them slowly)
    Rt_ref    [Kt, 3, 3]   transposed per-patch alignment rotation R^T
    Wx/Wy/Wz  [16, A]      folded MLP weight rows, azimuth-expanded per anchor
    b_ref     [16, 1]      folded bias
    f0_ref    [16, 1]      feature of a zero sample slot
    u_ref     [S, 1]       shared per-slot random priorities
    anc_ref   [3, A]       cylindrical anchor COMPONENT PLANES
    out_ref   [Kt, 16, A]
    """
    LS = S // NSEG
    u = u_ref[...]                                  # [S, 1]
    b = b_ref[...]                                  # [16, 1]
    f0 = f0_ref[...]                                # [16, 1]
    Wx = Wx_ref[...]                                # [16, A]
    Wy = Wy_ref[...]
    Wz = Wz_ref[...]
    ax = anc_ref[0:1, :]                            # [1, A]
    ay = anc_ref[1:2, :]
    az = anc_ref[2:3, :]
    # per-grid-step anchor prep, shared by all Kt keypoints
    ax2 = -2.0 * ax
    ay2 = -2.0 * ay
    az2 = -2.0 * az
    an = ax * ax + ay * ay + az * az                # [1, A] |a|^2
    bxT = bx_ref[0]                                 # [S, Kt]
    byT = by_ref[0]
    bzT = bz_ref[0]

    for kt in range(Kt):
        px = bxT[:, kt:kt + 1]                      # [S, 1] unrotated
        py = byT[:, kt:kt + 1]
        pz = bzT[:, kt:kt + 1]
        Rt = Rt_ref[kt]                             # [3, 3] = R^T
        # pr = p @ R: pr_e = sum_d p_d R[d,e] = sum_d p_d Rt[e,d]
        prx = px * Rt[0, 0] + py * Rt[0, 1] + pz * Rt[0, 2]   # [S, 1]
        pry = px * Rt[1, 0] + py * Rt[1, 1] + pz * Rt[1, 2]
        prz = px * Rt[2, 0] + py * Rt[2, 1] + pz * Rt[2, 2]
        # ball test: d2 = |pr|^2 + |a|^2 - 2 pr.a <= r2, with |pr|^2
        # moved to the threshold side — the [S, A] field is 3 FMAs
        rhs = r2 - (prx * prx + pry * pry + prz * prz)        # [S, 1]
        t = prx * ax2 + an                                    # [S, A]
        t = t + pry * ay2
        t = t + prz * az2
        score = jnp.where(t <= rhs, u, -BIG)        # [S, A]

        # top-1 random priority per segment: sublane split is free
        s3 = score.reshape(NSEG, LS, -1)            # [NSEG, LS, A]
        m = jnp.max(s3, axis=1)                     # [NSEG, A]
        oh = (s3 == m[:, None, :]).astype(jnp.float32)
        xs = jnp.sum(oh * prx.reshape(NSEG, LS, 1), axis=1)
        ys = jnp.sum(oh * pry.reshape(NSEG, LS, 1), axis=1)
        zs = jnp.sum(oh * prz.reshape(NSEG, LS, 1), axis=1)
        A_ = m.shape[-1]
        vf = m[:NUSE] > -BIG / 2                    # [NUSE, A] bool
        xs3 = xs[:NUSE].reshape(NUSE, 1, A_)
        ys3 = ys[:NUSE].reshape(NUSE, 1, A_)
        zs3 = zs[:NUSE].reshape(NUSE, 1, A_)

        # folded azimuth-derotated point-MLP on the NUSE winners
        feats = jnp.maximum(
            xs3 * Wx.reshape(1, 16, A_) + ys3 * Wy.reshape(1, 16, A_)
            + zs3 * Wz.reshape(1, 16, A_) + b.reshape(1, 16, 1),
            0.0)                                                  # [NUSE,16,A]
        # empty slots carry f0 (reference zero-fill through relu(bn(0)))
        feats = jnp.where(vf.reshape(NUSE, 1, A_), feats,
                          f0.reshape(1, 16, 1))
        out_ref[kt, :, :] = jnp.max(feats, axis=0)  # [16, A]


@functools.partial(jax.jit, static_argnames=("rad_n", "azi_n", "ele_n",
                                              "voxel_r", "voxel_sample",
                                              "k_tile"))
def spt_pooled_tpu(
    W_all: jnp.ndarray,          # [AZ, 3, 16] derotated folded MLP weights
    b_eff: jnp.ndarray,          # [16]
    f0: jnp.ndarray,             # [16]
    u: jnp.ndarray,              # [S] shared uniforms
    delta_x: jnp.ndarray,        # [K, S, 3] UNROTATED patch coords, or None
                                 # when delta_planes is given
    rad_n: int, azi_n: int, ele_n: int,
    voxel_r: float, voxel_sample: int,
    R: jnp.ndarray = None,       # [K, 3, 3] per-patch alignment (None = I)
    delta_planes: tuple = None,  # (x, y, z) [K, S] planes alternative
    k_tile: int = 32,            # keypoints per grid step (lane dim of the
                                 # pre-blocked planes).  r5 sweep at the
                                 # 3DMatch shape (K=3000, S_eff=320):
                                 # 8 -> 3.56 ms, 16 -> 3.95, 32 -> 0.88,
                                 # 64 slower again — 94 grid steps amortize
                                 # the per-step anchor prep and pipeline
                                 # far better; output bit-identical
) -> jnp.ndarray:
    """Fused sampled-SPT + point-MLP + sample-max descriptor front in one
    VMEM-resident kernel per keypoint block.  Per anchor, <= voxel_sample
    stratified random ball samples (top random priority of voxel_sample
    contiguous patch segments) are MLP'd and max-pooled — the same
    "random <=10-subset of the ball, zero-filled slots" statistics as the
    reference sphere_query path.  Returns [K, rad_n, ele_n, azi_n, 16]."""
    from buffer_tpu.core import gridmath

    if delta_planes is not None:
        xP, yP, zP = delta_planes                    # [K, S] each
        K, S = xP.shape
    else:
        K, S, _ = delta_x.shape
        xP, yP, zP = (delta_x[..., 0], delta_x[..., 1], delta_x[..., 2])
    AZ = azi_n
    G = rad_n * ele_n
    A = AZ * G
    NSEG = max(voxel_sample, -(-S // 256))   # segment count >= voxel_sample
    while S % NSEG:
        NSEG += 1
    NUSE = min(voxel_sample, NSEG)
    # Only the first NUSE segments can ever win a slot (the kernel slices
    # m[:NUSE]); rows NUSE*LS..S of every patch are dead weight in the
    # dominant [S, A] ball-test/top-1 fields.  Trim them BEFORE the kernel:
    # with S=512, voxel_sample=10 this cuts 37.5% of the field volume for
    # bit-identical output (same segments, same priorities, same winners).
    S_eff = NUSE * (S // NSEG)
    if S_eff < S:
        xP, yP, zP = xP[:, :S_eff], yP[:, :S_eff], zP[:, :S_eff]
        u = u[:S_eff]
        S, NSEG = S_eff, NUSE

    anchors = jnp.asarray(
        gridmath.get_voxel_coordinate(1.0, rad_n, azi_n, ele_n)
        .reshape(-1, 3), jnp.float32)                # [(g)*AZ + a, 3]
    anc_planes = anchors.reshape(G, AZ, 3).transpose(2, 1, 0).reshape(3, -1)

    # weight row per anchor column (azimuth-major: column a*G+g uses W_all[a])
    Wrows = jnp.repeat(W_all, G, axis=0)             # [A, 3, 16]
    Wx = Wrows[:, 0, :].T                            # [16, A]
    Wy = Wrows[:, 1, :].T
    Wz = Wrows[:, 2, :].T

    Kt = k_tile                  # keypoint block (lane dim of the blocks)
    Kp = _round_up(K, Kt)
    Rt = (jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3))
          if R is None else jnp.swapaxes(R, 1, 2))
    if Kp != K:
        pad2 = ((0, Kp - K), (0, 0))
        xP, yP, zP = (jnp.pad(p, pad2) for p in (xP, yP, zP))
        Rt = jnp.pad(Rt, ((0, Kp - K), (0, 0), (0, 0)))
    # pre-block to [Kp/Kt, S, Kt] on the XLA side (one clean relayout) so
    # each grid step reads a [S, Kt] block whose per-keypoint coordinates
    # are STATIC [S, 1] column slices
    blockify = lambda p: jnp.moveaxis(p.reshape(Kp // Kt, Kt, S), 1, 2)
    xB, yB, zB = blockify(xP), blockify(yP), blockify(zP)

    spec_p = pl.BlockSpec((1, S, Kt), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_c = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_spt_kernel, S, A, NSEG, NUSE, Kt,
                          float(voxel_r) ** 2),
        grid=(Kp // Kt,),
        in_specs=[
            spec_p, spec_p, spec_p,
            pl.BlockSpec((Kt, 3, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_c((16, A)), spec_c((16, A)), spec_c((16, A)),
            spec_c((16, 1)), spec_c((16, 1)), spec_c((S, 1)),
            spec_c((3, A)),
        ],
        out_specs=pl.BlockSpec((Kt, 16, A), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp, 16, A), jnp.float32),
    )(xB, yB, zB, Rt, Wx, Wy, Wz, b_eff[:, None], f0[:, None], u[:, None],
      anc_planes)

    # [K, 16, A(=AZ*G)] -> [K, G, AZ, 16] -> [K, rad, ele, azi, 16]
    pooled = out[:K].reshape(K, 16, AZ, G).transpose(0, 3, 2, 1)
    return pooled.reshape(K, rad_n, ele_n, azi_n, 16)


# ---------------------------------------------------------------------------
# banded radius-kNN: top-2-nearest per rank segment + exact small top-k
# ---------------------------------------------------------------------------


def _bknn_kernel(LW, NSg, Qt, NR, r2, q_ref, ratio_ref, tid_ref, gx_ref,
                 gy_ref, gz_ref, gv_ref, k1_ref, k2_ref):
    """Per query tile: the 2 nearest valid support points of each of NSg
    STRIDE-INTERLEAVED rank segments in the tile's window.

    Negative results (r2), measured on the full pipeline — do not repeat:
    * MXU cross-term + streaming rows: one [Qt,3]@[3,WIN] HIGHEST dot on
      query-centered coords, then a 32-step running top-2 over contiguous
      [Qt, NSg] rank rows of the flat [Qt, WIN] field.  8.2 -> 9.5 ms
      here and 3.0 -> 6.9 ms in the 1-NN variant: the wide f32 field +
      serial row chain loses to this 3D broadcast form, whose ~8 VPU
      passes are fully parallel.
    * in-kernel top-k (34 min+knockout steps over the packed candidates,
      replacing the XLA sort outside): 87 -> 151 ms/pair — ~500 serial
      lane-reduce ops per tile.

    Support is pre-gridded [NR, NSg] row-major (grid[r, s] = rank
    r*NSg + s), so segment s = {ranks congruent to s mod NSg}.  On a
    Morton-ordered cloud the true k-NN occupy CONSECUTIVE ranks — a
    contiguous-block segmentation packs them into one or two segments and
    the per-segment top-2 discards them (measured 27% 30-NN recall); the
    mod-NSg interleave spreads them uniformly (3+ collisions in one
    segment are rare birthday events, ~98-99% recall).

    The window is an 8-aligned sublane slice of LW grid rows (= LW*NSg
    ranks); every reduction is a sublane reduce.
    """
    ratio = ratio_ref[0, 0]
    # tile index rides as an input: program_id is unreliable under vmap
    i = tid_ref[0, 0, 0].astype(jnp.float32)
    center = (i * Qt + Qt / 2) * ratio              # support rank
    row = center / NSg
    # LW is a multiple of 16 (banded_knn_tpu derives it), so LW//2 and the
    # floor-to-8 upper clamp both preserve the 8-alignment promise for any
    # NR >= LW — not just level sizes that happen to be multiples of 2048.
    r0 = jnp.clip(((row / 8.0 + 0.5).astype(jnp.int32)) * 8 - LW // 2,
                  0, max(((NR - LW) // 8) * 8, 0))
    r0 = pl.multiple_of(r0, 8)

    qt = q_ref[...]                                  # [Qt, 3]
    sx = gx_ref[pl.ds(r0, LW), :]                    # [LW, NSg]
    sy = gy_ref[pl.ds(r0, LW), :]
    sz = gz_ref[pl.ds(r0, LW), :]
    sv = gv_ref[pl.ds(r0, LW), :]

    qx = qt[:, 0][:, None, None]
    qy = qt[:, 1][:, None, None]
    qz = qt[:, 2][:, None, None]
    dx = qx - sx[None]
    dy = qy - sy[None]
    dz = qz - sz[None]
    d2 = dx * dx + dy * dy + dz * dz                 # [Qt, LW, NSg]
    d2 = d2 + (1.0 - sv)[None] * BIG                 # invalid -> huge
    # floor at a tiny NORMAL float: an exact-zero d2 (self-match) would
    # pack to a denormal whose row bits FTZ/DAZ silently flush to +0
    # (measured: 94% of rows lost their second candidate to this)
    d2 = jnp.maximum(d2, 1e-30)

    # Pack the WINDOW ROW into the distance's low mantissa bits before the
    # min: one sublane min then yields winner distance AND row together.
    # (The int32 view of a non-negative f32 is order-preserving; the
    # previous one-hot mean extraction — min, ==, sum, weighted-row sum,
    # divide, twice — cost ~6 extra VPU passes over the [Qt, LW, NSg]
    # field.  Row bits land in the same low-16 region the global support
    # rank overwrites below, so no extra precision is lost; ties now break
    # toward the smaller window row instead of a fractional mean row.)
    rowi = lax.broadcasted_iota(jnp.int32, (Qt, LW, NSg), 1)
    ROWB = 0x3F                                      # LW <= 64 rows
    d2p = pltpu.bitcast(
        (pltpu.bitcast(d2, jnp.int32) & ~ROWB) | rowi, jnp.float32)

    m1p = jnp.min(d2p, axis=1)                       # [Qt, NSg]
    m1i = pltpu.bitcast(m1p, jnp.int32)
    r1 = m1i & ROWB
    # knock the winner's row out, take the second-nearest
    d2b = jnp.where(rowi == r1[:, None, :], BIG, d2p)
    m2p = jnp.min(d2b, axis=1)
    m2i = pltpu.bitcast(m2p, jnp.int32)
    r2_ = m2i & ROWB

    col = lax.broadcasted_iota(jnp.int32, (Qt, NSg), 1)
    base = r0 * NSg + col

    # Pack the support index into the low 16 mantissa bits of the fp32
    # squared distance: one approx_max_k over the packed keys OUTSIDE the
    # kernel selects the k nearest AND carries their indices — no top_k
    # sort, no take_along_axis row gather (those cost ~80 ms/pair).
    # 16 bits covers padded support ranks up to 65535 (KITTI points_l0 =
    # 40960 needs > 15 bits; banded_knn_tpu asserts Sp <= 1<<16).
    # Distances lose 16 mantissa bits (<0.8% relative): threshold-only
    # consumers.
    def pack(mi, r):
        idx = base + r * NSg
        m = pltpu.bitcast(mi & ~0xFFFF, jnp.float32)
        if r2 is not None:
            m = jnp.where(m <= r2, m, BIG)
        return pltpu.bitcast(
            (pltpu.bitcast(m, jnp.int32) & ~0xFFFF) | idx, jnp.float32)

    k1_ref[...] = pack(m1i, r1)
    k2_ref[...] = pack(m2i, r2_)


@functools.partial(jax.jit, static_argnames=("k", "radius", "band", "q_tile",
                                              "win_rows", "n_segs"))
def banded_knn_tpu(
    query: jnp.ndarray,          # [Q, 3] Morton-ordered
    support: jnp.ndarray,        # [S, 3] Morton-ordered (same curve)
    support_valid: jnp.ndarray,  # [S] bool
    query_valid: jnp.ndarray,    # [Q] bool
    k: int,
    radius,                      # float or None
    band: int = 4096,            # informational only: the realized rank
                                 # half-width is win_rows*n_segs/2; callers
                                 # derive win_rows from their band via
                                 # banded_win_rows()
    q_tile: int = 32,            # amortizes the [LW, NSg] window loads
                                 # over more queries; 32 was neutral under
                                 # the old sort-based stage B but is
                                 # -0.5 ms/pair with the knockout stage B
                                 # (r4); VMEM is ~2 MB/tile
    win_rows: int = 64,          # 64 x 128 = 8192 ranks (+-4096): full
                                 # original coverage; 48 (+-3072) saved a
                                 # further 1 ms at one lost quality-gate
                                 # pair (0.98 -> 0.96), 32 (+-2048) cost
                                 # ~4% of mutual matches
    n_segs: int = 128,           # half the candidates of the old 32x256:
                                 # the [Q, 2*NSg] top-k sort outside
                                 # halves, for a ~0.3% birthday-collision
                                 # recall cost (34-NN over 128 interleaved
                                 # segments, top-2 each).  Measured
                                 # 82.4 -> 76.3 ms/pair, mutual 589 -> 599;
                                 # 32x128 (+-2048) gave 75.3 ms but
                                 # mutual 564
) -> tuple:
    """Rank-banded radius-kNN, Pallas edition.

    Stage A (kernel): 2 nearest support points per stride-interleaved rank
    segment of the query tile's window (win_rows*n_segs = 8192 ranks) —
    2*n_segs exact-fp32 candidates per query, all reductions in VMEM.
    Stage B (XLA): exact ``lax.top_k`` of the k nearest in-radius
    candidates on the small [Q, 2*n_segs] field.

    Returns (sqdist [Q,k], idx [Q,k], valid [Q,k]) distance-sorted — the
    same contract as :func:`ops.neighbors.radius_knn`.
    """
    Q = query.shape[0]
    S = support.shape[0]
    NSg = n_segs
    NR = -(-S // NSg)
    Sp = NR * NSg
    # The packed keys carry support ranks in 16 mantissa bits, and the
    # kernel's window slice needs NR >= LW with 16-aligned LW (r0
    # alignment).  Callers should gate on banded_tpu_supported().
    if Sp > (1 << 16):
        raise ValueError(
            f"banded_knn_tpu: padded support {Sp} exceeds the 16-bit index "
            "capacity; use the unbanded path")
    LW = min(win_rows, (NR // 16) * 16)
    if LW < 16:
        raise ValueError(
            f"banded_knn_tpu: support rows NR={NR} too small for a banded "
            "window; use the unbanded path")
    sup = jnp.pad(support, ((0, Sp - S), (0, 0)))
    sv = jnp.pad(support_valid.astype(jnp.float32), (0, Sp - S))
    # row-major [NR, NSg] grids: grid[r, s] = rank r*NSg + s
    gx = sup[:, 0].reshape(NR, NSg)
    gy = sup[:, 1].reshape(NR, NSg)
    gz = sup[:, 2].reshape(NR, NSg)
    gv = sv.reshape(NR, NSg)

    Qp = _round_up(Q, q_tile)
    qpad = jnp.pad(query, ((0, Qp - Q), (0, 0)))
    n_tiles = Qp // q_tile

    # rank->rank ratio of the VALID counts (padding sits at the end of
    # both sorted arrays); the kernel derives its window start from it
    qn = jnp.maximum(jnp.sum(query_valid.astype(jnp.float32)), 1.0)
    sn = jnp.maximum(jnp.sum(support_valid.astype(jnp.float32)), 1.0)
    ratio = jnp.full((8, 128), sn / qn, jnp.float32)
    tids = jnp.broadcast_to(
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None, None],
        (n_tiles, 8, 128))

    out_k = jax.ShapeDtypeStruct((Qp, NSg), jnp.float32)
    spec_q = pl.BlockSpec((q_tile, 3), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_g = pl.BlockSpec((NR, NSg), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((q_tile, NSg), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    r2 = None if radius is None else float(radius) ** 2
    k1, k2 = pl.pallas_call(
        functools.partial(_bknn_kernel, LW, NSg, q_tile, NR, r2),
        grid=(n_tiles,),
        in_specs=[spec_q,
                  pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  spec_g, spec_g, spec_g, spec_g],
        out_specs=(spec_o, spec_o),
        out_shape=(out_k, out_k),
    )(qpad, ratio, tids, gx, gy, gz, gv)

    # stage B: exact top-k of the 2*NSg packed candidates per query via
    # the knockout kernel (the old approx_max_k lowered to a full
    # 256-column sort + a ~1 ms row-minor relayout copy + a negate)
    top = topk_packed_tpu(k1[:Q], k2[:Q], k)                  # [Q, k]
    ki = jax.lax.bitcast_convert_type(top, jnp.int32)
    idx = ki & 0xFFFF
    d = jax.lax.bitcast_convert_type(ki & ~0xFFFF, jnp.float32)
    valid = d < BIG / 2
    return jnp.maximum(d, 0.0), jnp.minimum(idx, S - 1), valid


def banded_tpu_supported(S: int, win_rows: int = 64, n_segs: int = 128) -> bool:
    """True when :func:`banded_knn_tpu` can handle a support of S rows:
    padded rank fits the 16-bit packed index and the window fits the grid."""
    NR = -(-S // n_segs)
    return NR * n_segs <= (1 << 16) and (NR // 16) * 16 >= 16


def banded_win_rows(S: int, band: int, n_segs: int = 128) -> tuple:
    """Window rows realizing a +-``band`` rank half-width at support size S.

    Returns ``(win_rows, covers_grid)``: ``win_rows`` is ``ceil(2*band /
    n_segs)`` rounded up to the kernel's 16-row alignment (so the knob the
    callers pass — ``config.StaticConfig.knn_band`` — actually sets the
    Pallas window), and ``covers_grid`` is True when the kernel's effective
    window ``LW = min(win_rows, (NR//16)*16)`` spans every grid row, i.e.
    the banded search degenerates to an exact full search.
    """
    NR = -(-S // n_segs)
    want = -(-2 * band // n_segs)
    wr = _round_up(max(want, 16), 16)
    LW = min(wr, (NR // 16) * 16)
    return wr, LW >= NR


def _topk_knockout_kernel(K_OUT, row_major, k1_ref, k2_ref, out_ref):
    """Exact top-K_OUT smallest of the 2*NSg packed candidates per row by
    K_OUT serial min+knockout steps over wide row tiles.

    Replaces the XLA stage-B `approx_max_k` whose lowering was a FULL
    256-column sort — plus a ~1 ms layout copy to the sort's row-minor
    layout and a negate pass (the sort path wants max).  Here the rows
    stay in the kernel-natural [rows, NSg] layout and the serial chain is
    only K_OUT steps of full-width [QT, NSg] min-reduces (contrast the r2
    negative result of knockout INSIDE _bknn_kernel at [16, 512] — tiny
    vectors made ~500 dependent lane-reduces; at QT=512 each step is
    64-vreg wide).  Packed keys are globally unique (support rank in the
    low 16 bits), so `== m` knocks out exactly one candidate and the
    emitted order is ascending distance with ascending-rank tie-break —
    the same order the sort produced.  Output is lane-padded to 128 (the
    Pallas output-block constraint); lanes >= K_OUT stay BIG.

    ``row_major=True`` transposes the [128, QT] result to [QT, 128]
    in-VMEM before the write, so the XLA-side consumer sees a clean
    row-major [Q, k] — the transposed view otherwise forced a ~0.5 ms
    s32 layout copy on every downstream index table (r5 trace)."""
    a = k1_ref[...]                              # [QT, NSg]
    b = k2_ref[...]
    QT = a.shape[0]
    # ONE transpose so every knockout step reduces across SUBLANES with
    # all 128 lanes busy (a lane-dim reduce per step was measured ~4x
    # slower: per 8-row vreg it serializes 7 intra-lane shuffle-mins)
    at = jnp.transpose(a, (1, 0))                # [NSg, QT]
    bt = jnp.transpose(b, (1, 0))
    sub = lax.broadcasted_iota(jnp.int32, (128, QT), 0)
    out = jnp.full((128, QT), BIG, jnp.float32)
    for j in range(K_OUT):
        m = jnp.minimum(jnp.min(at, axis=0, keepdims=True),
                        jnp.min(bt, axis=0, keepdims=True))  # [1, QT]
        out = jnp.where(sub == j, m, out)
        at = jnp.where(at == m, BIG, at)
        bt = jnp.where(bt == m, BIG, bt)
    if row_major:
        out_ref[...] = jnp.transpose(out, (1, 0))
    else:
        out_ref[...] = out


def topk_packed_tpu(k1: jnp.ndarray, k2: jnp.ndarray, k: int,
                    row_tile: int = 512, row_major: bool = True
                    ) -> jnp.ndarray:
    """Top-k smallest packed keys per row from two [Q, NSg] candidate
    fields.  Returns [Q, k] ascending (same contract as the sort-based
    stage B; ties break toward the smaller packed index bits)."""
    Q, NSg = k1.shape
    Qp = _round_up(Q, row_tile)
    if Qp != Q:
        k1 = jnp.pad(k1, ((0, Qp - Q), (0, 0)), constant_values=BIG)
        k2 = jnp.pad(k2, ((0, Qp - Q), (0, 0)), constant_values=BIG)
    specs = [pl.BlockSpec((row_tile, NSg), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)] * 2
    if row_major:
        out = pl.pallas_call(
            functools.partial(_topk_knockout_kernel, k, True),
            grid=(Qp // row_tile,),
            in_specs=specs,
            out_specs=pl.BlockSpec((row_tile, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Qp, 128), jnp.float32),
        )(k1, k2)
        return out[:Q, :k]
    out = pl.pallas_call(
        functools.partial(_topk_knockout_kernel, k, False),
        grid=(Qp // row_tile,),
        in_specs=specs,
        out_specs=pl.BlockSpec((128, row_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, Qp), jnp.float32),
    )(k1, k2)
    return jnp.transpose(out[:k, :Q], (1, 0))


# ---------------------------------------------------------------------------
# banded 1-NN: the upsample tables (closest coarse point per fine point)
# ---------------------------------------------------------------------------


def _bnn1_kernel(LW, NSg, Qt, NR, q_ref, ratio_ref, tid_ref, gx_ref,
                 gy_ref, gz_ref, gv_ref, out_ref):
    """Per query tile: the nearest valid support point of each rank SEGMENT
    in the tile's window, as packed (distance | rank) keys.

    A trimmed _bknn_kernel: one min pass, no second-nearest, no radius.
    The XLA `nearest_banded` scan this replaces materialized a [qb, win]
    f32 distance field per step (4.5 ms/pair on the depth-1 timeline for
    the level-0 upsample); here the field lives in VMEM.
    """
    ratio = ratio_ref[0, 0]
    i = tid_ref[0, 0, 0].astype(jnp.float32)
    center = (i * Qt + Qt / 2) * ratio
    row = center / NSg
    r0 = jnp.clip(((row / 8.0 + 0.5).astype(jnp.int32)) * 8 - LW // 2,
                  0, max(((NR - LW) // 8) * 8, 0))
    r0 = pl.multiple_of(r0, 8)

    qt = q_ref[...]                                  # [Qt, 3]
    sx = gx_ref[pl.ds(r0, LW), :]                    # [LW, NSg]
    sy = gy_ref[pl.ds(r0, LW), :]
    sz = gz_ref[pl.ds(r0, LW), :]
    sv = gv_ref[pl.ds(r0, LW), :]

    dx = qt[:, 0][:, None, None] - sx[None]
    dy = qt[:, 1][:, None, None] - sy[None]
    dz = qt[:, 2][:, None, None] - sz[None]
    d2 = dx * dx + dy * dy + dz * dz                 # [Qt, LW, NSg]
    d2 = d2 + (1.0 - sv)[None] * BIG
    # tiny-normal floor: see _bknn_kernel (denormal row bits flush to 0)
    d2 = jnp.maximum(d2, 1e-30)

    # row packed into the low mantissa bits; one min extracts both (the
    # one-hot mean extraction this replaces cost ~4 extra VPU passes)
    rowi = lax.broadcasted_iota(jnp.int32, (Qt, LW, NSg), 1)
    ROWB = 0x3F                                      # LW <= 64 rows
    d2p = pltpu.bitcast(
        (pltpu.bitcast(d2, jnp.int32) & ~ROWB) | rowi, jnp.float32)
    m1i = pltpu.bitcast(jnp.min(d2p, axis=1), jnp.int32)   # [Qt, NSg]
    r1 = m1i & ROWB

    col = lax.broadcasted_iota(jnp.int32, (Qt, NSg), 1)
    idx = (r0 + r1) * NSg + col                      # global support rank
    out_ref[...] = pltpu.bitcast((m1i & ~0xFFFF) | idx, jnp.float32)


@functools.partial(jax.jit, static_argnames=("q_tile", "win_rows", "n_segs"))
def banded_nn1_tpu(
    query: jnp.ndarray,          # [Q, 3] Morton-ordered
    support: jnp.ndarray,        # [S, 3] Morton-ordered (same curve)
    support_valid: jnp.ndarray,  # [S] bool
    query_valid: jnp.ndarray,    # [Q] bool
    q_tile: int = 32,            # r5: 8 -> 32 measured 1.52 -> 0.21 ms at
                                 # the l0->l1 upsample shape (window loads
                                 # amortize over 4x more queries; window
                                 # centering shifts by <= ~5 support ranks
                                 # vs the +-1024 half-width — idx agreement
                                 # validated on the bench cloud)
    win_rows: int = 16,          # one Morton-local nearest point needs far
                                 # less window than the 34-NN kernel
                                 # (16 x 128 = +-1024 coarse ranks)
    n_segs: int = 128,
) -> tuple:
    """Rank-banded exact-in-window 1-NN.  Returns (sqdist [Q], idx [Q]).

    Distances lose 16 mantissa bits to the packed rank (<0.8% relative);
    callers only threshold them (upsample validity `d2 <= (2r)^2`)."""
    Q = query.shape[0]
    S = support.shape[0]
    NSg = n_segs
    NR = -(-S // NSg)
    Sp = NR * NSg
    if Sp > (1 << 16):
        raise ValueError("banded_nn1_tpu: padded support exceeds 16-bit "
                         "packed rank; use nearest_banded")
    LW = min(win_rows, (NR // 16) * 16)
    if LW < 16:
        raise ValueError("banded_nn1_tpu: support too small for a banded "
                         "window; use nearest_tpu")
    sup = jnp.pad(support, ((0, Sp - S), (0, 0)))
    sv = jnp.pad(support_valid.astype(jnp.float32), (0, Sp - S))
    gx = sup[:, 0].reshape(NR, NSg)
    gy = sup[:, 1].reshape(NR, NSg)
    gz = sup[:, 2].reshape(NR, NSg)
    gv = sv.reshape(NR, NSg)

    Qp = _round_up(Q, q_tile)
    qpad = jnp.pad(query, ((0, Qp - Q), (0, 0)))
    n_tiles = Qp // q_tile

    qn = jnp.maximum(jnp.sum(query_valid.astype(jnp.float32)), 1.0)
    sn = jnp.maximum(jnp.sum(support_valid.astype(jnp.float32)), 1.0)
    ratio = jnp.full((8, 128), sn / qn, jnp.float32)
    tids = jnp.broadcast_to(
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None, None],
        (n_tiles, 8, 128))

    spec_q = pl.BlockSpec((q_tile, 3), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_g = pl.BlockSpec((NR, NSg), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    keys = pl.pallas_call(
        functools.partial(_bnn1_kernel, LW, NSg, q_tile, NR),
        grid=(n_tiles,),
        in_specs=[spec_q,
                  pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  spec_g, spec_g, spec_g, spec_g],
        out_specs=pl.BlockSpec((q_tile, NSg), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qp, NSg), jnp.float32),
    )(qpad, ratio, tids, gx, gy, gz, gv)

    best = jnp.min(keys[:Q], axis=1)                 # packed order-preserving
    ki = jax.lax.bitcast_convert_type(best, jnp.int32)
    idx = ki & 0xFFFF
    d = jax.lax.bitcast_convert_type(ki & ~0xFFFF, jnp.float32)
    return jnp.maximum(d, 0.0), jnp.minimum(idx, S - 1)
