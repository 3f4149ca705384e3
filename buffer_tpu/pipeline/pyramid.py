"""On-device construction of the static conv pyramid.

TPU-native replacement for the reference's host-side collate
(``ThreeDMatch/dataloader.py:115-245``): per level, radius-limited neighbor
tables (C++ KD-tree there; chunked MXU distance + top-k here), barycenter
grid subsampling for the next level, pooling tables, and nearest-coarse
upsample indices.  Radii follow the reference exactly: level radius
``r_l = voxel_size_0 * conv_radius * 2^l``, subsampling cell ``2^l * 2 *
voxel_size_0``, upsample search radius ``2 * r_l``
(ThreeDMatch/dataloader.py:142,187-201,222).

Everything is jit-safe with static shapes from ``cfg.static``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from buffer_tpu.config import Config
from buffer_tpu.models.point_learner import Pyramid
from buffer_tpu.ops.neighbors import radius_knn, nearest
from buffer_tpu.ops.normals import normals_from_neighbors, normals_from_offsets
from buffer_tpu.ops.subsample import voxel_subsample


def _use_offsets_path() -> bool:
    """TPU: one shared coordinate gather for normals + level-0 conv
    offsets.  A function so tests can force the branch on CPU."""
    return jax.default_backend() == "tpu"


def build_pyramid_and_normals(cfg: Config, points: jnp.ndarray,
                              masks: jnp.ndarray, levels=None) -> Pyramid:
    """Fused pyramid + input-normal construction.

    The level-0 conv neighbor list and the kNN for PCA normals query the
    same 30k x 30k distance field; one unrestricted kNN pass with
    k = max(normal_knn, cap_0) serves both (results sorted ascending, so
    the conv list is the radius-masked prefix).  On TPU one shared
    coordinate gather also serves both the normals PCA and the level-0
    conv's centered offsets (they were two separate [2M]-row gathers).
    """
    st = cfg.static
    r0 = cfg.data.voxel_size_0 * cfg.point.conv_radius
    k0 = max(st.normal_knn, st.neighbor_caps[0])

    band = st.knn_band or None
    kc = st.neighbor_caps[0]

    def per_cloud(pts0, m0):
        return radius_knn(pts0, pts0, m0, k=k0, radius=None,
                          chunk=st.knn_chunk, query_chunk=st.knn_chunk,
                          band=band, query_valid=m0)

    d2, idx, v = jax.vmap(per_cloud)(points, masks)
    if _use_offsets_path():
        # ONE batched flat coordinate gather serves both the normals PCA
        # and the level-0 conv's centered offsets (eqv): previously these
        # were two separate [2M]-row gathers (+ layout copies), the
        # dominant cost of the pyramid stage.  Covariance is translation-
        # invariant, so offset-mean centering is exact.
        #
        # Negative result (r2): moving the top-k selection itself into the
        # banded kNN kernel (34 min+knockout steps over the [16, 512]
        # packed candidates, replacing the XLA approx_max_k sort) measured
        # 87 -> 151 ms/pair — the extraction chain is fully serial on tiny
        # vectors and the VPU crawls through ~500 dependent lane-reduce
        # ops per tile.  XLA's batched sort is the better tool there.
        from buffer_tpu.ops.neighbors import gather_rows_planes
        idxc = jnp.minimum(idx, points.shape[1] - 1)
        # offsets stay f32: a bf16 experiment (r2) saved 0.8 ms but the
        # normals noise cost ~4% of mutual matches (593 -> 567) — the
        # covariance eigenvector is the one offsets consumer that is NOT
        # bf16-bound (the eqv path casts to bf16 later on its own).
        # COMPONENT-PLANES layout [3, B, N, k]: the transpose fuses into
        # the gather, so the 630 MB tile-padded [2M, 3] row-major output
        # (and the ~1.2 ms of relayout copies every consumer paid to read
        # it) never exists.
        off = (gather_rows_planes(points, idxc)
               - jnp.moveaxis(points, -1, 0)[:, :, :, None])
        normals = normals_from_offsets(points, masks,
                                       off[..., : st.normal_knn],
                                       v[..., : st.normal_knn])
        l0_off = off[..., :kc]
    else:
        # batched flat-gather normals (outside the vmap: the vmapped gather
        # form is ~2.4x slower on TPU); kept as the CPU path so the golden
        # detector snapshots and torch-oracle parity see unchanged rounding
        normals = normals_from_neighbors(points, masks,
                                         idx[..., : st.normal_knn],
                                         v[..., : st.normal_knn])
        l0_off = None
    idx0 = idx[..., :kc]
    valid0 = v[..., :kc] & (d2[..., :kc] <= r0 * r0) & masks[..., None]
    pyr = _build_pyramid(cfg, points, masks, normals, l0=(idx0, valid0),
                         levels=levels)
    if l0_off is not None:
        pyr = pyr._replace(
            l0_off=jnp.where(valid0[None], l0_off, 0.0))
    return pyr


def build_pyramid(cfg: Config, points: jnp.ndarray, masks: jnp.ndarray,
                  features: jnp.ndarray, levels=None) -> Pyramid:
    return _build_pyramid(cfg, points, masks, features, l0=None,
                          levels=levels)


def _build_pyramid(cfg: Config, points: jnp.ndarray, masks: jnp.ndarray,
                   features: jnp.ndarray, l0=None, levels=None) -> Pyramid:
    """points: [B, N0, 3]; masks: [B, N0]; features: [B, N0, 3] normals.

    Returns a 3-level :class:`Pyramid` (the reference architecture has two
    strided blocks, models/point_learner.py:4-14)."""
    st = cfg.static
    r0 = cfg.data.voxel_size_0 * cfg.point.conv_radius
    sizes = (st.points_l0, st.points_l1, st.points_l2)
    kn = st.neighbor_caps
    kp = st.pool_caps
    chunk = st.knn_chunk
    band = st.knn_band or None

    def per_cloud(pts0, m0, l0_idx=None, l0_valid=None, lv=None):
        if lv is not None:
            pts = [pts0, lv[0], lv[2]]
            msk = [m0, lv[1], lv[3]]
        else:
            pts, msk = [pts0], [m0]
            for lvl in range(2):
                dl = (2 ** (lvl + 1)) * cfg.data.voxel_size_0
                p, m = voxel_subsample(pts[lvl], msk[lvl], dl, sizes[lvl + 1])
                pts.append(p)
                msk.append(m)

        neighbors, neighbor_valid = [], []
        for lvl in range(3):
            if lvl == 0 and l0_idx is not None:
                neighbors.append(l0_idx)
                neighbor_valid.append(l0_valid)
                continue
            r = r0 * (2 ** lvl)
            _, idx, v = radius_knn(pts[lvl], pts[lvl], msk[lvl], k=kn[lvl],
                                   radius=r, chunk=chunk, query_chunk=chunk,
                                   band=band, query_valid=msk[lvl])
            # padded query rows must not contribute
            v = v & msk[lvl][:, None]
            neighbors.append(idx)
            neighbor_valid.append(v)

        pools, pool_valid, ups, up_valid = [], [], [], []
        for lvl in range(2):
            r = r0 * (2 ** lvl)
            _, pidx, pv = radius_knn(pts[lvl + 1], pts[lvl], msk[lvl],
                                     k=kp[lvl], radius=r, chunk=chunk,
                                     query_chunk=chunk, band=band,
                                     query_valid=msk[lvl + 1])
            pools.append(pidx)
            pool_valid.append(pv & msk[lvl + 1][:, None])
            d2, uidx = nearest(pts[lvl], pts[lvl + 1], msk[lvl + 1],
                               chunk=chunk, band=band, query_valid=msk[lvl])
            uv = (d2 <= (2.0 * r) ** 2) & msk[lvl]
            ups.append(uidx)
            up_valid.append(uv)
        return (tuple(pts), tuple(msk), tuple(neighbors), tuple(neighbor_valid),
                tuple(pools), tuple(pool_valid), tuple(ups), tuple(up_valid))

    if l0 is not None and levels is not None:
        out = jax.vmap(lambda p, m, i, v, a, b, c, d: per_cloud(
            p, m, i, v, (a, b, c, d)))(points, masks, l0[0], l0[1], *levels)
    elif l0 is not None:
        out = jax.vmap(per_cloud)(points, masks, l0[0], l0[1])
    elif levels is not None:
        out = jax.vmap(lambda p, m, a, b, c, d: per_cloud(
            p, m, None, None, (a, b, c, d)))(points, masks, *levels)
    else:
        out = jax.vmap(per_cloud)(points, masks)
    return Pyramid(*out, features=features)
