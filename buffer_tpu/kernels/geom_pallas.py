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


def _ball_kernel(L, NS, r2, q_ref, supT_ref, u_ref, *out_refs):
    (x1_ref, y1_ref, z1_ref, v1_ref, x2_ref, y2_ref, z2_ref, v2_ref) = out_refs
    qt = q_ref[...]                            # [Qt, 3]
    Qt = qt.shape[0]
    lane = lax.broadcasted_iota(jnp.int32, (Qt, L), 1)
    out_lane = lax.broadcasted_iota(jnp.int32, (Qt, NS), 1)

    def body(s, acc):
        sp = supT_ref[:, pl.ds(s * L, L)]      # [3, L]
        u = u_ref[:, pl.ds(s * L, L)]          # [1, L] (-BIG where invalid)
        d2 = _sqdist_tile(qt, sp)              # [Qt, L]
        score = jnp.where(d2 <= r2, u, -BIG)

        m1 = jnp.max(score, axis=1)            # [Qt]
        a1 = jnp.argmax(score, axis=1)
        oh1 = lane == a1[:, None]
        score2 = jnp.where(oh1, -BIG, score)
        m2 = jnp.max(score2, axis=1)
        a2 = jnp.argmax(score2, axis=1)
        oh2 = lane == a2[:, None]

        ohf1 = oh1.astype(jnp.float32)
        ohf2 = oh2.astype(jnp.float32)
        cols = (
            jnp.sum(ohf1 * sp[0][None, :], axis=1),
            jnp.sum(ohf1 * sp[1][None, :], axis=1),
            jnp.sum(ohf1 * sp[2][None, :], axis=1),
            (m1 > -BIG / 2).astype(jnp.float32),
            jnp.sum(ohf2 * sp[0][None, :], axis=1),
            jnp.sum(ohf2 * sp[1][None, :], axis=1),
            jnp.sum(ohf2 * sp[2][None, :], axis=1),
            (m2 > -BIG / 2).astype(jnp.float32),
        )
        # scatter each segment's column into the [Qt, NS] accumulators via
        # a lane mask (dynamic single-lane stores lower poorly on TPU)
        sel = (out_lane == s).astype(jnp.float32)
        return tuple(a + sel * c[:, None] for a, c in zip(acc, cols))

    init = tuple(jnp.zeros((Qt, NS), jnp.float32) for _ in range(8))
    acc = lax.fori_loop(0, NS, body, init)
    x1_ref[...] = acc[0]
    y1_ref[...] = acc[1]
    z1_ref[...] = acc[2]
    v1_ref[...] = acc[3] > 0.5
    x2_ref[...] = acc[4]
    y2_ref[...] = acc[5]
    z2_ref[...] = acc[6]
    v2_ref[...] = acc[7] > 0.5


@functools.partial(jax.jit, static_argnames=("radius", "k", "q_tile", "seg_group"))
def ball_sample_points_tpu(
    key: jax.Array,
    query: jnp.ndarray,          # [Q, 3]
    support: jnp.ndarray,        # [N, 3]
    support_valid: jnp.ndarray,  # [N] bool
    radius: float,
    k: int,
    q_tile: int = 128,
    seg_group: int = 32,
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
    u = jnp.where(support_valid, prio, -BIG)[None, :]            # [1, N]
    supT = support.T                                             # [3, N]

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
            pl.BlockSpec((3, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,) * 8,
        out_shape=(out_sd, out_sd, out_sd, out_sdb,
                   out_sd, out_sd, out_sd, out_sdb),
    )(qpad, supT, u)
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
