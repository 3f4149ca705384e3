"""On-device neighbor search primitives (static shapes, jit-safe).

TPU-native replacements for the reference's irregular neighbor machinery:

* ``cpp_wrappers/cpp_neighbors`` KD-tree radius search (distance-sorted,
  shadow index = N; ``neighbors.cpp:211-332``)  ->  :func:`radius_knn`
  (chunked MXU distance matrix + running top-k merge).
* ``knn_cuda`` exact 1-NN (``models/BUFFER.py:347-374``)  ->  :func:`nearest`.
* ``pointnet2_ops.ball_query`` "first-k points within radius of a shuffled
  cloud" (= a uniform random k-subset of the ball;
  ``models/patch_embedder.py:100``, ``utils/common.py:442``)  ->
  :func:`ball_sample` (random priorities + top-k).

All functions take a validity mask for padded support points and return
index arrays plus boolean masks instead of ragged lists.  Distances are
computed as ``|q|^2 - 2 q.s + |s|^2`` so the inner product rides the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BIG = 1e9


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances [..., M, N] between a [..., M, D] and
    b [..., N, D]; the cross term is a matmul (MXU)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.matmul(a, jnp.swapaxes(b, -1, -2),
                       precision=lax.Precision.HIGH)
    d2 = a2 - 2.0 * cross + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d2, 0.0)


def _pad_rows(x: jnp.ndarray, multiple: int, fill) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    padding = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, padding, constant_values=fill)


def _default_method() -> str:
    import jax
    from buffer_tpu.utils import flags
    if flags.EXACT_F32:
        return "exact"
    return "approx" if jax.default_backend() == "tpu" else "exact"


def radius_knn(
    query: jnp.ndarray,
    support: jnp.ndarray,
    support_valid: jnp.ndarray,
    k: int,
    radius: Optional[float] = None,
    chunk: int = 4096,
    query_chunk: int = 4096,
    method: str = "auto",
    recall_target: float = 0.95,
    band: Optional[int] = None,
    query_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k-nearest (optionally radius-limited) neighbors.

    query: [Q, 3]; support: [S, 3]; support_valid: [S] bool.
    Returns (sqdist [Q, k], idx [Q, k] int32, valid [Q, k] bool), sorted by
    ascending distance.  ``valid`` is False for slots beyond the in-radius
    count — the shadow-neighbor analog of the reference's ``index == S``
    (models/point_learner.py:328-339).

    Two implementations:

    * ``exact``  — scan over support chunks with a running best-k via
      ``lax.top_k`` (sort-based; slow on TPU, exact everywhere — the CPU
      test default);
    * ``approx`` — per query chunk, one full [Qc, S] masked distance row
      and a single ``lax.approx_max_k`` (the TPU's hardware-accelerated
      partial-reduce top-k; ``aggregate_to_topk`` makes the returned k
      exact-sorted among candidates).  Misses a true neighbor with
      probability ~(1 - recall_target); neighbor sets feed mean-pools, so
      this perturbs activations negligibly while being ~50x faster.

    ``auto`` selects approx on TPU, exact elsewhere.  With ``band`` set
    and Morton-ordered inputs, only the rank window is searched
    (:func:`radius_knn_banded`); ignored when the window would not be
    smaller than the support.
    """
    if band is not None and jax.default_backend() == "tpu" and query_valid is not None:
        # Use the Pallas kernel even when the band covers the whole
        # support (small pyramid levels): full grid coverage makes it an
        # EXACT search, and its top-2-per-segment candidates + small sort
        # beat the unbanded [Q, S] score field + 1024-candidate
        # approx_max_k aggregate (~0.9 ms at the level-2 shape).
        from buffer_tpu.kernels.geom_pallas import (
            banded_knn_tpu, banded_tpu_supported, banded_win_rows)
        S = support.shape[0]
        if banded_tpu_supported(S):
            wr, covers = banded_win_rows(S, band)
            # 2*band >= S promises a FULL search (config.py knn_band
            # contract): only honor it on the Pallas path when its rank
            # window actually spans the grid; otherwise fall through to
            # the unbanded exact/approx search below.
            if 2 * band < S or covers:
                return banded_knn_tpu(query, support, support_valid,
                                      query_valid, k, radius, band=band,
                                      win_rows=wr)
    if band is not None and 2 * band < support.shape[0]:
        return radius_knn_banded(query, support, support_valid, k, radius,
                                 band, recall_target=recall_target,
                                 query_valid=query_valid)
    if method == "auto":
        method = _default_method()
    if method == "approx":
        return _radius_knn_approx(query, support, support_valid, k, radius,
                                  query_chunk, recall_target)
    Q = query.shape[0]
    support = _pad_rows(support, chunk, 0.0)
    support_valid = _pad_rows(support_valid, chunk, False)
    S = support.shape[0]
    n_chunks = S // chunk
    r2 = None if radius is None else float(radius) ** 2

    def one_query_chunk(qc: jnp.ndarray):
        Qc = qc.shape[0]
        init_d = jnp.full((Qc, k), BIG, dtype=query.dtype)
        init_i = jnp.zeros((Qc, k), dtype=jnp.int32)

        def body(carry, ci):
            best_d, best_i = carry
            sl = lax.dynamic_slice_in_dim(support, ci * chunk, chunk, axis=0)
            vl = lax.dynamic_slice_in_dim(support_valid, ci * chunk, chunk, axis=0)
            d2 = pairwise_sqdist(qc, sl)
            bad = ~vl[None, :]
            if r2 is not None:
                bad = bad | (d2 > r2)
            d2 = jnp.where(bad, BIG, d2)
            idx = ci * chunk + lax.broadcasted_iota(jnp.int32, (Qc, chunk), 1)
            cand_d = jnp.concatenate([best_d, d2], axis=1)
            cand_i = jnp.concatenate([best_i, idx], axis=1)
            neg_top, pos = lax.top_k(-cand_d, k)
            new_d = -neg_top
            new_i = jnp.take_along_axis(cand_i, pos, axis=1)
            return (new_d, new_i), None

        (best_d, best_i), _ = lax.scan(body, (init_d, init_i), jnp.arange(n_chunks))
        return best_d, best_i, best_d < BIG

    if Q <= query_chunk:
        return one_query_chunk(query)

    qpad = _pad_rows(query, query_chunk, 0.0)
    blocks = qpad.reshape(-1, query_chunk, 3)
    d, i, v = lax.map(one_query_chunk, blocks)
    flat = lambda x: x.reshape(-1, k)[:Q]
    return flat(d), flat(i), flat(v)


def _radius_knn_approx(query, support, support_valid, k, radius,
                       query_chunk, recall_target):
    Q = query.shape[0]
    r2 = None if radius is None else float(radius) ** 2
    s2 = jnp.sum(support * support, axis=-1)

    def one_chunk(qc):
        d2 = (jnp.sum(qc * qc, axis=-1, keepdims=True)
              - 2.0 * jnp.matmul(qc, support.T,
                                 precision=lax.Precision.HIGH)
              + s2[None, :])
        bad = ~support_valid[None, :]
        if r2 is not None:
            bad = bad | (d2 > r2)
        # the [Q, S] score field is the dominant HBM traffic of the whole
        # pyramid build; bf16 halves it (the elementwise epilogue + convert
        # fuse into the matmul, so only bf16 ever hits HBM).  Selection
        # order and returned distances jitter by bf16's ~0.4% relative —
        # callers only threshold the distances (radius masks), and neighbor
        # sets feed mean-pools, so this is in the same noise class as the
        # 0.95 recall target.
        score = jnp.where(bad, jnp.bfloat16(-BIG), -d2.astype(jnp.bfloat16))
        vals, idx = lax.approx_max_k(score, k, recall_target=recall_target)
        d = jnp.maximum(-vals.astype(jnp.float32), 0.0)
        return d, idx.astype(jnp.int32), vals > jnp.bfloat16(-BIG / 2)

    if Q <= query_chunk:
        return one_chunk(query)
    qpad = _pad_rows(query, query_chunk, 0.0)
    blocks = qpad.reshape(-1, query_chunk, 3)
    d, i, v = lax.map(one_chunk, blocks)
    flat = lambda x: x.reshape(-1, k)[:Q]
    return flat(d), flat(i), flat(v)


def _band_starts(Q, S, qb, win, q_valid=None, s_valid=None):
    """Window start (support row) per query block: the query's rank scaled
    to the support's rank range, clipped so the window stays in bounds.

    Ranks must be scaled by the VALID counts, not the padded sizes — both
    arrays are Morton-sorted with padding at the end, and cross-level
    searches (pools, upsamples) have different valid fractions."""
    centers = jnp.arange(0, Q, qb, dtype=jnp.float32) + qb / 2
    if q_valid is not None and s_valid is not None:
        qn = jnp.maximum(jnp.sum(q_valid.astype(jnp.float32)), 1.0)
        sn = jnp.maximum(jnp.sum(s_valid.astype(jnp.float32)), 1.0)
        ratio = sn / qn
    else:
        ratio = S / Q
    starts = jnp.clip(jnp.round(centers * ratio - win / 2),
                      0, max(S - win, 0))
    # align to 256 so the window slices lower as true dynamic slices (an
    # arbitrary offset turns them into row gathers)
    starts = (starts / 256.0).astype(jnp.int32) * 256
    return starts


def radius_knn_banded(
    query: jnp.ndarray,
    support: jnp.ndarray,
    support_valid: jnp.ndarray,
    k: int,
    radius: Optional[float],
    band: int,
    query_block: int = 1024,
    recall_target: float = 0.95,
    query_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rank-banded radius-kNN for Morton-ordered clouds.

    Both arrays must be sorted along the same space-filling curve (the
    host does this in data/preprocess.morton_sort).  Each 256-query block
    searches only the ``2*band`` support rows around its rank-scaled
    center; measured on 3DMatch-scale surface clouds, a ±3072 window
    holds ~99% of the true radius-34-NN — the same noise class as the
    0.95-recall approx_max_k that consumes the scores, at ~5x less HBM
    traffic than the full [Q, S] field.

    (TPU dispatch to the Pallas kernel happens in :func:`radius_knn`;
    this function is the XLA fallback.)"""
    Q = query.shape[0]
    S = support.shape[0]
    win = 2 * band
    r2 = None if radius is None else float(radius) ** 2
    qb = query_block
    Qp = _round_up_rows(Q, qb)
    qpad = _pad_rows(query, qb, 0.0)
    starts = _band_starts(Qp, S, qb, win, query_valid, support_valid)

    sv = support_valid
    s2_full = jnp.sum(support * support, axis=-1)

    def one_block(inp):
        qc, w0 = inp
        sl = lax.dynamic_slice_in_dim(support, w0, win, axis=0)
        vl = lax.dynamic_slice_in_dim(sv, w0, win, axis=0)
        s2 = lax.dynamic_slice_in_dim(s2_full, w0, win, axis=0)
        d2 = (jnp.sum(qc * qc, axis=-1, keepdims=True)
              - 2.0 * jnp.matmul(qc, sl.T, precision=lax.Precision.HIGH)
              + s2[None, :])
        bad = ~vl[None, :]
        if r2 is not None:
            bad = bad | (d2 > r2)
        score = jnp.where(bad, jnp.bfloat16(-BIG), -d2.astype(jnp.bfloat16))
        vals, idx = lax.approx_max_k(score, k, recall_target=recall_target)
        d = jnp.maximum(-vals.astype(jnp.float32), 0.0)
        return d, (idx + w0).astype(jnp.int32), vals > jnp.bfloat16(-BIG / 2)

    blocks = qpad.reshape(-1, qb, 3)
    d, i, v = lax.map(one_block, (blocks, starts))
    flat = lambda x: x.reshape(-1, k)[:Q]
    return flat(d), flat(i), flat(v)


def _round_up_rows(n: int, m: int) -> int:
    return -(-n // m) * m


def _spread3(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x to bit positions 0,3,6,...,27
    (standard Morton magic numbers)."""
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_codes(pts: jnp.ndarray, valid: jnp.ndarray, lo: jnp.ndarray,
                 span: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """On-device Z-order codes over a given bounding box (the jit analog
    of data/preprocess.morton_sort, same bit order: code bit 3b+d from
    bit b of dim d).  Invalid rows get the maximal code so they sort to
    the end.  Callers quantizing TWO clouds onto a COMMON curve must pass
    the joint lo/span."""
    q = jnp.clip((pts - lo) / span * (2 ** bits - 1), 0.0,
                 2 ** bits - 1).astype(jnp.uint32)
    code = (_spread3(q[..., 0]) | (_spread3(q[..., 1]) << 1)
            | (_spread3(q[..., 2]) << 2))
    return jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))


def nearest_common_morton(query, q_valid, support, s_valid, band,
                          chunk=8192):
    """1-NN where query and support are NOT pre-sorted on a common curve
    (e.g. gt-warped source vs target in train-time match mining): sorts
    both on a joint-bbox Morton curve ON DEVICE, runs the banded 1-NN on
    the sorted arrays, and maps results back to the original row order.
    Exact within the +-band rank window; a miss only overestimates the
    distance (callers thresholding d2 just lose that candidate).

    Returns (d2 [Q], idx [Q] int32 into the ORIGINAL support order)."""
    bigq = jnp.where(q_valid[:, None], query, BIG)
    bigs = jnp.where(s_valid[:, None], support, BIG)
    smallq = jnp.where(q_valid[:, None], query, -BIG)
    smalls = jnp.where(s_valid[:, None], support, -BIG)
    lo = jnp.minimum(jnp.min(bigq, axis=0), jnp.min(bigs, axis=0))
    hi = jnp.maximum(jnp.max(smallq, axis=0), jnp.max(smalls, axis=0))
    span = jnp.maximum(hi - lo, 1e-9)
    cq = morton_codes(query, q_valid, lo, span)
    cs = morton_codes(support, s_valid, lo, span)
    pq = jnp.argsort(cq).astype(jnp.int32)
    ps = jnp.argsort(cs).astype(jnp.int32)
    qs, qm = query[pq], q_valid[pq]
    ss, sm = support[ps], s_valid[ps]
    d2s, nns = nearest(qs, ss, sm, chunk=chunk, band=band, query_valid=qm)
    nn_orig = ps[nns]                       # sorted support rank -> original
    inv = jnp.argsort(pq).astype(jnp.int32)  # original row -> sorted rank
    return d2s[inv], nn_orig[inv]


def nearest_banded(
    query: jnp.ndarray,
    support: jnp.ndarray,
    support_valid: jnp.ndarray,
    band: int,
    query_block: int = 512,
    query_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rank-banded exact-in-window 1-NN for Morton-ordered clouds.

    query_block=512 is measured-optimal at the level-0-upsample shape
    (30720 queries, 12288 support): 4096-query blocks looked like they
    should amortize the 60 sequential step launches, but the [4096, win]
    f32 distance field they materialize made the stage 4.5 -> 9.9 ms on
    the depth-1 timeline.  Small tiles stay cache-resident; don't "fix"
    the step count again without a trace.  The window grows by the
    support ranks a block spans, so per-query coverage stays at +-band
    regardless of block size."""
    Q = query.shape[0]
    S = support.shape[0]
    qb = query_block
    span = -(-qb * S // Q)            # support ranks spanned by one block
    win = min(_round_up_rows(2 * band + span, 256), S)
    Qp = _round_up_rows(Q, qb)
    qpad = _pad_rows(query, qb, 0.0)
    starts = _band_starts(Qp, S, qb, win, query_valid, support_valid)
    s2_full = jnp.sum(support * support, axis=-1)

    def one_block(inp):
        qc, w0 = inp
        sl = lax.dynamic_slice_in_dim(support, w0, win, axis=0)
        vl = lax.dynamic_slice_in_dim(support_valid, w0, win, axis=0)
        s2 = lax.dynamic_slice_in_dim(s2_full, w0, win, axis=0)
        d2 = (jnp.sum(qc * qc, axis=-1, keepdims=True)
              - 2.0 * jnp.matmul(qc, sl.T, precision=lax.Precision.HIGH)
              + s2[None, :])
        d2 = jnp.where(vl[None, :], d2, BIG)
        loc = jnp.argmin(d2, axis=1)
        dmin = jnp.take_along_axis(d2, loc[:, None], axis=1)[:, 0]
        return jnp.maximum(dmin, 0.0), (loc + w0).astype(jnp.int32)

    blocks = qpad.reshape(-1, qb, 3)
    d, i = lax.map(one_block, (blocks, starts))
    return d.reshape(-1)[:Q], i.reshape(-1)[:Q]


def nearest(
    query: jnp.ndarray,
    support: jnp.ndarray,
    support_valid: jnp.ndarray,
    chunk: int = 8192,
    method: str = "auto",
    band: Optional[int] = None,
    query_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact 1-NN: (sqdist [Q], idx [Q] int32).  Replaces KNN_CUDA(k=1)
    (models/BUFFER.py:335-359) and nanoflann nearest lookups.

    On TPU dispatches to the fused Pallas kernel (kernels/geom_pallas.py):
    the distance tiles never leave VMEM (~10x faster than the chunked-XLA
    argmin below, whose [Q, chunk] tiles round-trip HBM).  3-D queries
    only; descriptor-space 1-NN keeps the XLA path.  With ``band`` set
    (Morton-ordered inputs) only the rank window is searched."""
    if band is not None and 2 * band < support.shape[0]:
        if (jax.default_backend() == "tpu" and query.ndim == 2
                and query.shape[-1] == 3 and query_valid is not None):
            from buffer_tpu.kernels.geom_pallas import (
                banded_nn1_tpu, banded_tpu_supported)
            if banded_tpu_supported(support.shape[0]):
                return banded_nn1_tpu(query, support, support_valid,
                                      query_valid)
        return nearest_banded(query, support, support_valid, band,
                              query_valid=query_valid)
    if (method == "auto" and query.ndim == 2 and query.shape[-1] == 3
            and jax.default_backend() == "tpu"):
        from buffer_tpu.kernels.geom_pallas import nearest_tpu
        return nearest_tpu(query, support, support_valid)
    support = _pad_rows(support, chunk, 0.0)
    support_valid = _pad_rows(support_valid, chunk, False)
    S = support.shape[0]
    n_chunks = S // chunk
    Q = query.shape[0]

    init = (jnp.full((Q,), BIG, dtype=query.dtype), jnp.zeros((Q,), jnp.int32))

    def body(carry, ci):
        best_d, best_i = carry
        sl = lax.dynamic_slice_in_dim(support, ci * chunk, chunk, axis=0)
        vl = lax.dynamic_slice_in_dim(support_valid, ci * chunk, chunk, axis=0)
        d2 = pairwise_sqdist(query, sl)
        d2 = jnp.where(vl[None, :], d2, BIG)
        loc = jnp.argmin(d2, axis=1)
        dmin = jnp.take_along_axis(d2, loc[:, None], axis=1)[:, 0]
        better = dmin < best_d
        return (jnp.where(better, dmin, best_d),
                jnp.where(better, (ci * chunk + loc).astype(jnp.int32), best_i)), None

    (best_d, best_i), _ = lax.scan(body, init, jnp.arange(n_chunks))
    return best_d, best_i


def ball_sample(
    key: jax.Array,
    query: jnp.ndarray,
    support: jnp.ndarray,
    support_valid: jnp.ndarray,
    radius: float,
    k: int,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform random k-subset of the radius ball around each query.

    Reproduces the *distribution* of pointnet2's ``ball_query`` on a
    shuffled cloud ("first k found in index order" over randomly ordered
    points = uniform random subset; the reference shuffles immediately
    before querying, models/patch_embedder.py:97).

    Returns (idx [Q, k] int32, valid [Q, k] bool).  Uses
    ``lax.approx_max_k`` over random priorities — a TPU-accelerated
    hardware top-k; approximation only perturbs *which* random subset is
    selected, which is statistically immaterial.
    """
    S = support.shape[0]
    d2 = pairwise_sqdist(query, support)
    in_ball = (d2 <= radius * radius) & support_valid[None, :]
    prio = jax.random.uniform(key, (S,), dtype=jnp.float32)
    score = jnp.where(in_ball, prio[None, :], -BIG)
    # top-2-per-segment stratified sampling, no top-k sort at all: the best
    # and second-best random-priority candidate in each of k/2 contiguous
    # segments (the support order is random, so segments are random
    # subsets).  Two pure max-reduces over the distance field vs. the
    # 2048-candidate row sort of a two-stage top-k: 11.8 -> 3.0 ms at
    # [1500 x 65536].  Retention for balls smaller than k is ~89% of the
    # ball (vs ~94% for the two-stage form — both approximate the
    # reference's ``first k of a shuffled cloud`` uniform subset).
    NS = k // 2
    if k % 2 != 0 or S % NS != 0:
        score = lax.optimization_barrier(score)
        vals, idx = lax.approx_max_k(score, k, recall_target=recall_target)
        return idx.astype(jnp.int32), vals > -BIG / 2
    L = S // NS
    seg = score.reshape(-1, NS, L)
    base = (jnp.arange(NS, dtype=jnp.int32) * L)[None, :]
    a1 = jnp.argmax(seg, axis=-1)                     # [Q, NS]
    v1 = jnp.take_along_axis(seg, a1[..., None], axis=-1)[..., 0]
    hit = lax.broadcasted_iota(jnp.int32, seg.shape, 2) == a1[..., None]
    seg2 = jnp.where(hit, -BIG, seg)
    a2 = jnp.argmax(seg2, axis=-1)
    v2 = jnp.take_along_axis(seg2, a2[..., None], axis=-1)[..., 0]
    idx = jnp.concatenate([base + a1.astype(jnp.int32),
                           base + a2.astype(jnp.int32)], axis=1)
    vv = jnp.concatenate([v1, v2], axis=1)
    return idx, vv > -BIG / 2


def ball_sample_chunked(
    key: jax.Array,
    query: jnp.ndarray,
    support: jnp.ndarray,
    support_valid: jnp.ndarray,
    radius: float,
    k: int,
    chunk: int = 16384,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Memory-bounded :func:`ball_sample` for large support clouds.

    Scans support chunks keeping the running top-k priorities.  Valid
    candidates always carry priority in (0, 1] and invalid -BIG, so merging
    by priority preserves the uniform-subset semantics.
    """
    Q = query.shape[0]
    support = _pad_rows(support, chunk, 0.0)
    support_valid = _pad_rows(support_valid, chunk, False)
    S = support.shape[0]
    n_chunks = S // chunk
    r2 = radius * radius

    init = (jnp.full((Q, k), -BIG, dtype=jnp.float32),
            jnp.zeros((Q, k), dtype=jnp.int32))
    keys = jax.random.split(key, n_chunks)

    def body(carry, inp):
        ci, kc = inp
        best_p, best_i = carry
        sl = lax.dynamic_slice_in_dim(support, ci * chunk, chunk, axis=0)
        vl = lax.dynamic_slice_in_dim(support_valid, ci * chunk, chunk, axis=0)
        d2 = pairwise_sqdist(query, sl)
        ok = (d2 <= r2) & vl[None, :]
        prio = jax.random.uniform(kc, (chunk,), dtype=jnp.float32)
        score = jnp.where(ok, prio[None, :], -BIG)
        idx = ci * chunk + lax.broadcasted_iota(jnp.int32, (Q, chunk), 1)
        cand_p = jnp.concatenate([best_p, score], axis=1)
        cand_i = jnp.concatenate([best_i, idx], axis=1)
        top_p, pos = lax.top_k(cand_p, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (top_p, top_i), None

    (best_p, best_i), _ = lax.scan(body, init, (jnp.arange(n_chunks), keys))
    return best_i, best_p > -BIG / 2


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [N, D] gathered by idx [...]-shaped int array -> [..., D].
    Replaces pointnet2 ``gather_operation``/``grouping_operation``."""
    return jnp.take(points, idx, axis=0)


def gather_rows(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather: arr [B, N, D], idx [B, ...] -> [B, ..., D].

    One flat-indexed ``jnp.take`` over the [B*N, D] view with per-batch
    offsets folded into the indices — XLA lowers this ~2.4x faster on TPU
    than the batched (vmapped) gather form."""
    B, N = arr.shape[0], arr.shape[1]
    flat = arr.reshape(B * N, arr.shape[-1])
    off = (jnp.arange(B, dtype=idx.dtype) * N).reshape(
        (B,) + (1,) * (idx.ndim - 1))
    # multi-dim index operand: the gather then WRITES the final
    # [B, ..., D] tiled layout directly; taking with flattened indices
    # left a [rows, D] intermediate whose retiling reshape cost
    # ~0.7 ms/pair per level-1/2 conv gather
    return jnp.take(flat, idx + off, axis=0)


def gather_rows_planes(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """:func:`gather_rows` with the feature dim moved to the FRONT
    (component planes): arr [B, N, D], idx [B, ...] -> [D, B, ...].

    XLA fuses the transpose into the gather fusion (measured neutral on
    the gather itself), so the natural row-major [rows, D] output — whose
    last-dim tile padding is ~40x at D=3 (128-lane tiles) — is never
    materialized in HBM, and downstream plane consumers skip their
    relayout copy (~0.8 ms at the level-0 neighborhood shape)."""
    return jnp.moveaxis(gather_rows(arr, idx), -1, 0)


# ---------------------------------------------------------------------------
# bf16 bit-packed row gathers (TPU fast path) with CORRECT gradients.
#
# TPU row gathers pay per-lane tile granularity, so halving the lane count by
# packing bf16 pairs into f32 lanes cuts gather traffic ~45%.  But
# ``lax.bitcast_convert_type`` has a silently-ZERO gradient, so the raw
# pack/gather/unpack composite would kill every gradient flowing through
# gathered features (training would break while loss stays finite).  These
# wrappers pin the backward pass to the exact fp32 gather's VJP (gathers are
# linear, so the scatter-add cotangent is exact; the bf16 value rounding gets
# the standard straight-through treatment, same as any mixed-precision cast).
# ---------------------------------------------------------------------------


def _pack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """[..., C] (C even) -> [..., C//2] f32 lanes holding bf16 pairs."""
    C = x.shape[-1]
    xb = x.astype(jnp.bfloat16)
    return lax.bitcast_convert_type(
        xb.reshape(*xb.shape[:-1], C // 2, 2), jnp.float32)


def _unpack_pairs(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """[..., C//2] f32 lanes -> [..., C] of ``dtype``."""
    u = lax.bitcast_convert_type(x, jnp.bfloat16)
    return u.reshape(*u.shape[:-2], u.shape[-2] * 2).astype(dtype)


def _grb_impl(arr, idx):
    return _unpack_pairs(gather_rows(_pack_pairs(arr), idx), arr.dtype)


@functools.lru_cache(maxsize=None)
def _grb_op(shape, dtype):
    """custom_vjp op specialized to arr's (shape, dtype) — shape/dtype must
    be static in the bwd rule, and custom_vjp residuals only carry arrays."""

    @jax.custom_vjp
    def op(arr, idx):
        return _grb_impl(arr, idx)

    def fwd(arr, idx):
        return _grb_impl(arr, idx), idx

    def bwd(idx, ct):
        _, vjp = jax.vjp(lambda a: gather_rows(a, idx),
                         jnp.zeros(shape, dtype))
        (darr,) = vjp(ct.astype(dtype))
        return darr, np.zeros(idx.shape, dtype=jax.dtypes.float0)

    op.defvjp(fwd, bwd)
    return op


def gather_rows_bf16(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """:func:`gather_rows` with bf16 pair-packed rows (arr [B,N,C], C even).
    Values are bf16-rounded; gradients are the exact gather VJP."""
    return _grb_op(arr.shape, jnp.dtype(arr.dtype).name)(arr, idx)


def _gcf_ref(s_pts, s_feat, idx):
    """Exact-fp32 reference for the fused coord+feature shadow gather:
    8 zero pad rows appended, so idx == Ns lands on zeros."""
    packed = jnp.concatenate([s_pts, s_feat], axis=-1)
    packed = jnp.concatenate([packed, jnp.zeros_like(packed[:, :8])], axis=1)
    g = gather_rows(packed, idx)
    return g[..., :3], g[..., 3:]


def _gcf_impl(s_pts, s_feat, idx):
    packed = jnp.concatenate([s_pts, _pack_pairs(s_feat)], axis=-1)
    packed = jnp.concatenate([packed, jnp.zeros_like(packed[:, :8])], axis=1)
    g = gather_rows(packed, idx)
    return g[..., :3], _unpack_pairs(g[..., 3:], s_feat.dtype)


@functools.lru_cache(maxsize=None)
def _gcf_op(ps, pd, fs, fd):
    @jax.custom_vjp
    def op(s_pts, s_feat, idx):
        return _gcf_impl(s_pts, s_feat, idx)

    def fwd(s_pts, s_feat, idx):
        return _gcf_impl(s_pts, s_feat, idx), idx

    def bwd(idx, cts):
        ct_xyz, ct_f = cts
        _, vjp = jax.vjp(lambda p, f: _gcf_ref(p, f, idx),
                         jnp.zeros(ps, pd), jnp.zeros(fs, fd))
        dp, df = vjp((ct_xyz.astype(pd), ct_f.astype(fd)))
        return dp, df, np.zeros(idx.shape, dtype=jax.dtypes.float0)

    op.defvjp(fwd, bwd)
    return op


def gather_coord_feat_bf16(s_pts, s_feat, idx):
    """One fused shadow-row gather of fp32 coords + bf16 pair-packed
    features: s_pts [B,Ns,3], s_feat [B,Ns,C] (C even), idx [B,Nq,K] with
    shadow slots already redirected to Ns.  Returns
    (nbr_xyz [B,Nq,K,3] exact fp32, nbr_f [B,Nq,K,C] bf16-rounded).
    Gradients are the exact gather VJP (see module comment)."""
    return _gcf_op(s_pts.shape, jnp.dtype(s_pts.dtype).name,
                   s_feat.shape, jnp.dtype(s_feat.dtype).name)(
        s_pts, s_feat, idx)
