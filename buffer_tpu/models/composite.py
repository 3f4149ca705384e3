"""Composite BUFFER model: the four learned stages plus initialization.

Mirrors ``buffer`` (models/BUFFER.py:69-79): attributes named Ref / Desc /
Keypt / Inlier so the per-stage checkpoint filter-and-merge semantics
(ThreeDMatch/train.py:37-47) carry over to the variables dict keyed the
same way.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from buffer_tpu.config import Config
from buffer_tpu.models.point_learner import EFCNN, DetNet, Pyramid
from buffer_tpu.models.patch_embedder import MiniSpinNet
from buffer_tpu.models.heads import CostVolume


class BufferModel:
    """Module container + init.  Stateless: parameters travel separately as
    ``{'Ref': {'params', 'batch_stats'}, 'Desc': …, 'Keypt': …, 'Inlier': …}``."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        fd = cfg.point.first_feats_dim // 3
        self.Ref = EFCNN(first_dim=fd, scale=cfg.test.scale)
        self.Keypt = DetNet(first_dim=fd)
        self.Desc = MiniSpinNet(cfg.patch.rad_n, cfg.patch.azi_n, cfg.patch.ele_n)
        self.Inlier = CostVolume(cfg.patch.azi_n)

    # ------------------------------------------------------------------
    def _dummy_pyramid(self) -> Pyramid:
        """Tiny static pyramid for shape-driven initialization."""
        B, n = 2, (16, 8, 4)
        k = 4
        pts = tuple(jnp.zeros((B, ni, 3)) for ni in n)
        msk = tuple(jnp.ones((B, ni), bool) for ni in n)
        nbr = tuple(jnp.zeros((B, ni, k), jnp.int32) for ni in n)
        nbv = tuple(jnp.ones((B, ni, k), bool) for ni in n)
        pool = tuple(jnp.zeros((B, n[i + 1], k), jnp.int32) for i in range(2))
        poolv = tuple(jnp.ones((B, n[i + 1], k), bool) for i in range(2))
        ups = tuple(jnp.zeros((B, n[i], ), jnp.int32) for i in range(2))
        upsv = tuple(jnp.ones((B, n[i], ), bool) for i in range(2))
        feat = jnp.zeros((B, n[0], 3))
        return Pyramid(pts, msk, nbr, nbv, pool, poolv, ups, upsv, feat)

    def init(self, key: jax.Array) -> Dict[str, dict]:
        kr, kk, kd, ki = jax.random.split(key, 4)
        pyr = self._dummy_pyramid()
        p = self.cfg.patch
        ref_vars = self.Ref.init(kr, pyr)
        _, _, branch = self.Ref.apply(ref_vars, pyr)
        keypt_vars = self.Keypt.init(kk, pyr, branch)
        A = p.rad_n * p.ele_n * p.azi_n
        desc_vars = self.Desc.init(kd, jnp.zeros((2, A, p.voxel_sample, 3)))
        band = p.ele_n - 2
        inlier_vars = self.Inlier.init(
            ki, jnp.zeros((2, band, p.azi_n, 32)), jnp.zeros((2, band, p.azi_n, 32)))

        def split(v):
            return {"params": v["params"],
                    "batch_stats": v.get("batch_stats", {})}

        return {"Ref": split(ref_vars), "Keypt": split(keypt_vars),
                "Desc": split(desc_vars), "Inlier": split(inlier_vars)}
