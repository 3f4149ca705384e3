"""Host-side preprocessing: raw clouds -> static padded PairInputs.

The analog of the reference's dataset __getitem__ + collate
(``ThreeDMatch/dataset.py:80-162``, ``ThreeDMatch/dataloader.py:115-245``),
minus everything we moved on-device (normals, neighbor tables, pyramid).
What remains host-side is cheap: double voxel downsampling, random
shuffles/augmentation, point-count caps, and zero-padding to the static
plan.  A C++ fast path for the voxel grid is used when the native library
is built (buffer_tpu/kernels); numpy otherwise.
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import numpy as np

from buffer_tpu.config import Config
from buffer_tpu.kernels.host import voxel_subsample_host


def morton_sort(pts: np.ndarray, bits: int = 10) -> np.ndarray:
    """Order points along a Z-order (Morton) curve.

    Spatially close points land close in index order, so the on-device
    neighbor search only scans a rank window (ops/neighbors.py banded
    path) instead of the full O(N^2) distance field.  Point order carries
    no semantics downstream (FPS/sampling are order-randomized anyway)."""
    if len(pts) == 0:
        return pts
    lo = pts.min(axis=0)
    span = pts.max(axis=0) - lo + 1e-9
    q = ((pts - lo) / span * (2 ** bits - 1)).astype(np.uint32)
    code = np.zeros(len(pts), np.uint64)
    for b in range(bits):
        for d in range(3):
            code |= ((q[:, d] >> b) & 1).astype(np.uint64) << np.uint64(3 * b + d)
    return pts[np.argsort(code, kind="stable")]


def pad_cloud(pts: np.ndarray, n: int, rs: Optional[np.random.RandomState] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Cap (random subset, like max_numPts handling in
    ThreeDMatch/dataset.py:134-140) and zero-pad to n with a mask.

    The subset indices are SORTED so capping preserves the input order —
    the pyramid levels arrive Morton-sorted and the banded kNN scans rank
    windows of that order (a shuffled subset would silently break its
    recall).  Raw clouds stay effectively shuffled: their input order is
    already random."""
    if len(pts) > n:
        rs = rs or np.random
        idx = np.sort(rs.choice(len(pts), n, replace=False))
        pts = pts[idx]
    out = np.zeros((n, 3), np.float32)
    out[: len(pts)] = pts
    mask = np.zeros((n,), bool)
    mask[: len(pts)] = True
    return out, mask


def prepare_pair(
    cfg: Config,
    src_raw: np.ndarray,
    tgt_raw: np.ndarray,
    rs: Optional[np.random.RandomState] = None,
    already_downsampled: bool = False,
):
    """Build the arrays for :class:`PairInputs` from two raw clouds.

    If ``already_downsampled`` is False, applies the first voxel
    downsampling (cfg.data.downsample) to produce the 'raw' clouds the
    patch embedder samples from, then the second (voxel_size_0) for the
    point-learner clouds — exactly the reference's two-stage scheme
    (ThreeDMatch/dataset.py:93,125)."""
    import jax.numpy as jnp
    from buffer_tpu.pipeline.registration import PairInputs

    rs = rs or np.random.RandomState(0)
    st = cfg.static

    def stage(pts):
        fds = pts if already_downsampled else voxel_subsample_host(
            pts, cfg.data.downsample)
        rs.shuffle(fds)
        sds = voxel_subsample_host(fds, cfg.data.voxel_size_0)
        rs.shuffle(sds)
        if len(sds) > cfg.data.max_numPts:
            sds = sds[rs.choice(len(sds), cfg.data.max_numPts, replace=False)]
        return fds.astype(np.float32), sds.astype(np.float32)

    s_fds, s_sds = stage(src_raw)
    t_fds, t_sds = stage(tgt_raw)
    # loud (once per size class) instead of silent when a real cloud
    # overflows the static plan — pad_cloud random-subsamples the excess,
    # which is a quality cliff the operator should know about (e.g. KITTI
    # scans at downsample=0.05 can exceed raw_points)
    def check_cap(name, arr, cap):
        if len(arr) > cap:
            warnings.warn(
                f"cloud with {len(arr)} points exceeds static plan "
                f"{name}={cap}; randomly subsampling (consider a larger "
                "static bucket)", RuntimeWarning)

    for name, arr, cap in (("raw_points", s_fds, st.raw_points),
                           ("raw_points", t_fds, st.raw_points),
                           ("points_l0", s_sds, st.points_l0),
                           ("points_l0", t_sds, st.points_l0)):
        check_cap(name, arr, cap)
    # Morton-order the point-learner clouds so the on-device neighbor
    # search can run rank-banded (raw clouds stay shuffled: the ball
    # sampler's segment statistics rely on random order)
    s_sds = morton_sort(s_sds)
    t_sds = morton_sort(t_sds)
    r0, m0 = pad_cloud(s_fds, st.raw_points, rs)
    r1, m1 = pad_cloud(t_fds, st.raw_points, rs)
    s0, n0 = pad_cloud(s_sds, st.points_l0, rs)
    s1, n1 = pad_cloud(t_sds, st.points_l0, rs)

    # deterministic pyramid levels via the native grid subsampler (kills a
    # pathologically slow 30k-element device sort; see pipeline/pyramid.py)
    def levels(sds):
        l1 = morton_sort(voxel_subsample_host(sds, 2 * cfg.data.voxel_size_0))
        l2 = morton_sort(voxel_subsample_host(l1, 4 * cfg.data.voxel_size_0))
        check_cap("points_l1", l1, st.points_l1)
        check_cap("points_l2", l2, st.points_l2)
        return l1, l2
    sl1, sl2 = levels(s_sds)
    tl1, tl2 = levels(t_sds)
    a0, am0 = pad_cloud(sl1, st.points_l1, rs)
    a1, am1 = pad_cloud(tl1, st.points_l1, rs)
    b0, bm0 = pad_cloud(sl2, st.points_l2, rs)
    b1, bm1 = pad_cloud(tl2, st.points_l2, rs)

    return PairInputs(
        raw=jnp.asarray(np.stack([r0, r1])),
        raw_mask=jnp.asarray(np.stack([m0, m1])),
        sds=jnp.asarray(np.stack([s0, s1])),
        sds_mask=jnp.asarray(np.stack([n0, n1])),
        lvl1=jnp.asarray(np.stack([a0, a1])),
        lvl1_mask=jnp.asarray(np.stack([am0, am1])),
        lvl2=jnp.asarray(np.stack([b0, b1])),
        lvl2_mask=jnp.asarray(np.stack([bm0, bm1])),
    )
