"""Farthest point sampling, jit-native.

Replaces ``pointnet2_ops.furthest_point_sample`` (CUDA; used at
``models/BUFFER.py:266-267`` to pick 1500 keypoints from the
detection-thresholded cloud).  The reference first boolean-filters points by
detector score (``models/BUFFER.py:256-259``) — a dynamic shape — so here the
threshold is folded into the FPS *eligibility mask* instead: ineligible
points can never be selected (their min-distance is pinned below zero),
which yields the same selected set with static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def farthest_point_sample(
    points: jnp.ndarray,
    eligible: jnp.ndarray,
    num_samples: int,
    method: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FPS over the eligible subset.

    points: [N, 3]; eligible: [N] bool; returns (idx [num_samples] int32,
    valid [num_samples] bool).  Starts from the first eligible point (the
    CUDA kernel starts from index 0 of its filtered array).  If fewer than
    ``num_samples`` points are eligible, the remaining slots repeat
    already-selected points and are marked invalid.

    ``method='auto'`` uses the all-in-VMEM Pallas kernel on TPU
    (buffer_tpu.kernels.fps_pallas) and the XLA fori_loop elsewhere.
    """
    N = points.shape[0]
    n_eligible = jnp.sum(eligible.astype(jnp.int32))
    valid_out = jnp.arange(num_samples) < n_eligible
    if method == "auto":
        import jax as _jax
        method = "pallas" if _jax.default_backend() == "tpu" else "xla"
    if method == "pallas":
        from buffer_tpu.kernels.fps_pallas import fps_pallas
        return fps_pallas(points, eligible, num_samples), valid_out
    first = jnp.argmax(eligible).astype(jnp.int32)

    # min squared distance to the selected set; ineligible points sit at -1
    # so argmax never picks them while any eligible point has dist >= 0.
    init_mind = jnp.where(eligible, jnp.asarray(1e10, points.dtype), -1.0)

    def body(i, carry):
        mind, idxs = carry
        last = idxs[i - 1]
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        mind = jnp.minimum(mind, jnp.where(eligible, d, -1.0))
        nxt = jnp.argmax(mind).astype(jnp.int32)
        return mind, idxs.at[i].set(nxt)

    idxs0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first)
    _, idxs = lax.fori_loop(1, num_samples, body, (init_mind, idxs0))
    return idxs, valid_out


def farthest_point_sample_batched(
    points: jnp.ndarray,
    eligible: jnp.ndarray,
    num_samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`farthest_point_sample` over a leading cloud axis.

    points [B, N, 3]; eligible [B, N] -> (idx [B, S], valid [B, S]).
    On TPU the B clouds run INSIDE one Pallas kernel body (batched
    fields), interleaving the per-iteration serial chains — ~2x faster at
    B=2 than the vmapped single-cloud kernel, which lowers to B
    sequential grid steps.  Elsewhere it is exactly the vmapped XLA path.
    """
    import jax as _jax
    n_eligible = jnp.sum(eligible.astype(jnp.int32), axis=1)
    valid_out = jnp.arange(num_samples)[None, :] < n_eligible[:, None]
    if _jax.default_backend() == "tpu":
        from buffer_tpu.kernels.fps_pallas import fps_pallas_batched
        return fps_pallas_batched(points, eligible, num_samples), valid_out
    idx, _ = _jax.vmap(
        lambda p, e: farthest_point_sample(p, e, num_samples))(
            points, eligible)
    return idx, valid_out
