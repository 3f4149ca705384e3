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
