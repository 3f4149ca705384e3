"""Voxel-grid subsampling (barycenter semantics), device and host versions.

TPU-native replacement for the reference's C++ hash-grid subsampler
(``cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp:5-103``:
voxel key from ``floor((p - floor(min/dl)*dl)/dl)``, output = per-voxel
barycenter) and for Open3D's ``voxel_down_sample`` (same barycenter
semantics, used in the datasets, ``ThreeDMatch/dataset.py:93,125``).

The device version produces a *fixed-size padded* point array plus validity
mask: sort by voxel key, segment-mean, compact.  Everything is jit-safe.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def voxel_subsample(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    voxel_size: float,
    out_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Barycenter voxel downsampling on device.

    points: [N, 3]; valid: [N] bool; returns (out [out_size, 3], mask
    [out_size] bool).  If the cloud has more occupied voxels than
    ``out_size`` the extra voxels are dropped (the reference likewise caps
    cloud sizes, ThreeDMatch/config.py:14).
    """
    N = points.shape[0]
    big = jnp.asarray(1e9, points.dtype)
    pts_masked = jnp.where(valid[:, None], points, big)
    origin = jnp.floor(jnp.min(pts_masked, axis=0) / voxel_size) * voxel_size
    coords = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    # grid extents from the valid maximum (reference grid_subsampling.cpp:28-30)
    maxc = jnp.max(jnp.where(valid[:, None], coords, -1), axis=0)
    nx = maxc[0] + 1
    ny = maxc[1] + 1
    key = coords[:, 0] + nx * coords[:, 1] + nx * ny * coords[:, 2]
    key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)

    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = points[order]
    valid_s = valid[order]

    starts = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    )
    seg = jnp.cumsum(starts.astype(jnp.int32)) - 1  # [N] segment ids, sorted
    overflow = seg >= out_size
    seg_c = jnp.where(valid_s & ~overflow, seg, out_size)  # dump to scratch row

    w = (valid_s & ~overflow).astype(points.dtype)
    sums = jax.ops.segment_sum(pts_s * w[:, None], seg_c, num_segments=out_size + 1)
    cnts = jax.ops.segment_sum(w, seg_c, num_segments=out_size + 1)
    out = sums[:out_size] / jnp.maximum(cnts[:out_size, None], 1.0)
    mask = cnts[:out_size] > 0
    out = jnp.where(mask[:, None], out, 0.0)
    return out, mask


def voxel_subsample_np(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Host (numpy) barycenter voxel downsampling — exact reference
    semantics for dataset preprocessing (grid_subsampling.cpp:5-103)."""
    if len(points) == 0:
        return points
    origin = np.floor(points.min(axis=0) / voxel_size) * voxel_size
    coords = np.floor((points - origin) / voxel_size).astype(np.int64)
    nx = coords[:, 0].max() + 1
    ny = coords[:, 1].max() + 1
    key = coords[:, 0] + nx * coords[:, 1] + nx * ny * coords[:, 2]
    uniq, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    sums = np.zeros((len(uniq), 3), dtype=np.float64)
    np.add.at(sums, inv, points)
    return (sums / cnt[:, None]).astype(points.dtype)
