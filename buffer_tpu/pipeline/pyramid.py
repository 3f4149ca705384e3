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
from buffer_tpu.ops.subsample import voxel_subsample


def build_pyramid(cfg: Config, points: jnp.ndarray, masks: jnp.ndarray,
                  features: jnp.ndarray) -> Pyramid:
    """points: [B, N0, 3]; masks: [B, N0]; features: [B, N0, 3] normals.

    Returns a 3-level :class:`Pyramid` (the reference architecture has two
    strided blocks, models/point_learner.py:4-14)."""
    st = cfg.static
    r0 = cfg.data.voxel_size_0 * cfg.point.conv_radius
    sizes = (st.points_l0, st.points_l1, st.points_l2)
    kn = st.neighbor_caps
    kp = st.pool_caps
    chunk = st.knn_chunk

    def per_cloud(pts0, m0):
        pts, msk = [pts0], [m0]
        for lvl in range(2):
            dl = (2 ** (lvl + 1)) * cfg.data.voxel_size_0
            p, m = voxel_subsample(pts[lvl], msk[lvl], dl, sizes[lvl + 1])
            pts.append(p)
            msk.append(m)

        neighbors, neighbor_valid = [], []
        for lvl in range(3):
            r = r0 * (2 ** lvl)
            _, idx, v = radius_knn(pts[lvl], pts[lvl], msk[lvl], k=kn[lvl],
                                   radius=r, chunk=chunk, query_chunk=chunk)
            # padded query rows must not contribute
            v = v & msk[lvl][:, None]
            neighbors.append(idx)
            neighbor_valid.append(v)

        pools, pool_valid, ups, up_valid = [], [], [], []
        for lvl in range(2):
            r = r0 * (2 ** lvl)
            _, pidx, pv = radius_knn(pts[lvl + 1], pts[lvl], msk[lvl],
                                     k=kp[lvl], radius=r, chunk=chunk,
                                     query_chunk=chunk)
            pools.append(pidx)
            pool_valid.append(pv & msk[lvl + 1][:, None])
            d2, uidx = nearest(pts[lvl], pts[lvl + 1], msk[lvl + 1], chunk=chunk)
            uv = (d2 <= (2.0 * r) ** 2) & msk[lvl]
            ups.append(uidx)
            up_valid.append(uv)
        return (tuple(pts), tuple(msk), tuple(neighbors), tuple(neighbor_valid),
                tuple(pools), tuple(pool_valid), tuple(ups), tuple(up_valid))

    out = jax.vmap(per_cloud)(points, masks)
    return Pyramid(*out, features=features)
