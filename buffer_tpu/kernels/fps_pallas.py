"""Farthest point sampling as a single Pallas TPU kernel.

The pure-XLA FPS (ops/sampling.py) runs num_samples sequential fori_loop
steps, each a full HBM round-trip over the [N] min-distance array.  Here
the entire state lives in VMEM for the whole kernel ([3, N] coordinates +
[8, N/8] running min-distances ≈ 0.5 MB for N = 30k), so the 1500-step
sequential chain never touches HBM.

The selected point's coordinates are extracted without dynamic lane
indexing via the one-hot reduction trick (sum(x * (iota == idx))), keeping
every step a plain VPU map-reduce.

Same contract as ops.sampling.farthest_point_sample: ineligible points are
pinned below zero so they are never selected; ties/failures degrade exactly
like the XLA version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e10
LANES = 128
SUBLANES = 8


def _fps_kernel(num_samples, pts_ref, elig_ref, out_ref, mind_ref):
    # pts_ref: [3, R, L]; elig_ref: [R, L] (1.0 eligible); out_ref: [S, 1]
    x = pts_ref[0]
    y = pts_ref[1]
    z = pts_ref[2]
    elig = elig_ref[...]
    R, L = elig.shape
    iota = (lax.broadcasted_iota(jnp.int32, (R, L), 0) * L
            + lax.broadcasted_iota(jnp.int32, (R, L), 1))

    mind_ref[...] = jnp.where(elig > 0, BIG, -1.0)

    def coords_of(idx):
        onehot = (iota == idx).astype(x.dtype)
        return (jnp.sum(x * onehot), jnp.sum(y * onehot), jnp.sum(z * onehot))

    # start from the first eligible point (argmax of a boolean mask ==
    # first True), mirroring the CUDA kernel's index-0 start on the
    # filtered array (models/BUFFER.py:266)
    first = jnp.argmax(elig + (-1e-6) * iota.astype(x.dtype)).astype(jnp.int32)
    out_ref[pl.ds(0, 1), :] = first.reshape(1, 1)

    def body(m, cur):
        cx, cy, cz = coords_of(cur)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        mind = jnp.minimum(mind_ref[...], jnp.where(elig > 0, d, -1.0))
        mind_ref[...] = mind
        nxt = jnp.argmax(mind).astype(jnp.int32)
        out_ref[pl.ds(m, 1), :] = nxt.reshape(1, 1)
        return nxt

    lax.fori_loop(1, num_samples, body, first)


def fps_pallas(points: jnp.ndarray, eligible: jnp.ndarray,
               num_samples: int) -> jnp.ndarray:
    """points: [N, 3]; eligible: [N] bool -> idx [num_samples] int32."""
    N = points.shape[0]
    block = SUBLANES * LANES
    pad = (-N) % block
    P = N + pad
    R = P // LANES
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pts_t = jnp.moveaxis(pts.reshape(R, LANES, 3), -1, 0)       # [3, R, L]
    elig = jnp.pad(eligible.astype(points.dtype), (0, pad)).reshape(R, LANES)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples),
        out_shape=jax.ShapeDtypeStruct((num_samples, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, LANES), points.dtype)],
    )(pts_t, elig)
    return out[:, 0]


def _fps_kernel_batched(num_samples, B, x_ref, y_ref, z_ref, elig_ref,
                        out_ref, mind_ref):
    """FPS over B independent clouds in ONE kernel body: the per-iteration
    serial chain (coord extraction -> distance update -> argmax) of each
    cloud is independent, so batching the fields interleaves the chains —
    roughly half the wall-clock at B=2 vs the vmapped single-cloud kernel,
    which lowers to B sequential grid steps.

    Clouds are folded into the ROW dim (rows [b*R, (b+1)*R) = cloud b; the
    2-D refs + transient 3-D reshapes are the shapes Mosaic handles well —
    a 4-D [B, 3, R, L] block form SIGABRTed the compiler).

    x/y/z/elig_ref [B*R, L]; out_ref [S, B]; mind_ref scratch [B*R, L]."""
    x = x_ref[...]
    y = y_ref[...]
    z = z_ref[...]
    elig = elig_ref[...]
    BR, L = elig.shape
    R = BR // B
    # per-cloud local flat index of each slot
    iota = (lax.broadcasted_iota(jnp.int32, (R, L), 0) * L
            + lax.broadcasted_iota(jnp.int32, (R, L), 1))
    iotaB = jnp.broadcast_to(iota[None], (B, R, L)).reshape(BR, L)

    mind_ref[...] = jnp.where(elig > 0, BIG, -1.0)

    def red2(f, fn):
        """two chained single-axis reduces (a fused (1,2)-axis reduce and
        rank-1 results both trip Mosaic layout checks): [B,R,L] -> [B,1]."""
        return fn(fn(f, 1), 1, keepdims=True)

    def argmax2(f):
        """first (lowest-local-index) argmax per cloud: [B*R, L] -> [B, 1]."""
        f3 = f.reshape(B, R, L)
        m = red2(f3, jnp.max)                            # [B, 1]
        hit = f3 == m[:, :, None]
        w = jnp.where(hit, iota[None], jnp.int32(1 << 30))
        return red2(w, jnp.min).astype(jnp.int32)

    def bcast(v):
        """[B, 1] -> [B*R, L] per-cloud broadcast."""
        return jnp.broadcast_to(v[:, :, None], (B, R, L)).reshape(BR, L)

    first = argmax2(elig)
    out_ref[pl.ds(0, 1), :] = jnp.transpose(first, (1, 0))

    def body(m, cur):
        onehot = (iotaB == bcast(cur)).astype(x.dtype)

        def csum(t):
            return bcast(red2(t.reshape(B, R, L), jnp.sum))

        cx = csum(x * onehot)
        cy = csum(y * onehot)
        cz = csum(z * onehot)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        mind = jnp.minimum(mind_ref[...], jnp.where(elig > 0, d, -1.0))
        mind_ref[...] = mind
        nxt = argmax2(mind)
        out_ref[pl.ds(m, 1), :] = jnp.transpose(nxt, (1, 0))
        return nxt

    lax.fori_loop(1, num_samples, body, first)


def fps_pallas_batched(points: jnp.ndarray, eligible: jnp.ndarray,
                       num_samples: int) -> jnp.ndarray:
    """points: [B, N, 3]; eligible: [B, N] bool -> idx [B, num_samples]."""
    B, N, _ = points.shape
    block = SUBLANES * LANES
    pad = (-N) % block
    P = N + pad
    R = P // LANES
    pts = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
    grids = pts.reshape(B * R, LANES, 3)
    elig = jnp.pad(eligible.astype(points.dtype),
                   ((0, 0), (0, pad))).reshape(B * R, LANES)

    out = pl.pallas_call(
        functools.partial(_fps_kernel_batched, num_samples, B),
        out_shape=jax.ShapeDtypeStruct((num_samples, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B * R, LANES), points.dtype)],
    )(grids[..., 0], grids[..., 1], grids[..., 2], elig)
    return out.T
