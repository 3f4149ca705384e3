"""Equivariant matching and SO(2) cost-volume heads.

Reimplements ``EquiMatch`` (models/BUFFER.py:15-34) and ``CostVolume``
(models/BUFFER.py:37-66).  The reference's cyclic index table
``row i = roll(arange(azi_n), i)`` is exactly ``jnp.roll(x, i, azimuth)``;
the 20 rolls are stacked statically.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from buffer_tpu.nn.cylindrical import CostNet


def _azimuth_rolls(des: jnp.ndarray, azi_n: int) -> jnp.ndarray:
    """des [M, ele, azi, C] -> [M, azi_n(shift), ele, azi, C] with
    shift i = jnp.roll(des, i, azimuth axis)."""
    return jnp.stack([jnp.roll(des, i, axis=2) for i in range(azi_n)], axis=1)


def equi_match(des1: jnp.ndarray, des2: jnp.ndarray, azi_n: int) -> jnp.ndarray:
    """Correlation of all azimuth shifts of des1 against des2
    (models/BUFFER.py:26-34).  des*: [M, ele, azi, C]; returns [M, azi_n]."""
    rolled = _azimuth_rolls(des1, azi_n)
    return jnp.einsum("mnkac,mkac->mn", rolled, des2)


class CostVolume(nn.Module):
    """Soft SO(2) azimuth regression (models/BUFFER.py:37-66): roll des1
    over all shifts, subtract des2, aggregate with the 3D CostNet, softmax
    soft-argmax over the azi_n bins.  Inputs use the reduced elevation band
    [1 : ele_n-1] (models/BUFFER.py:221-222)."""

    azi_n: int = 20

    @nn.compact
    def __call__(self, des1: jnp.ndarray, des2: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """des*: [M, ele_band, azi, C].  Returns continuous bin index [M].

        The [M, azi_n, ele, azi, C] roll-subtract volume is never built:
        CostNet's first conv is factored through its circulant structure
        (nn/cylindrical.CostNet._first_from_equis — exact, same params)."""
        logits = CostNet(self.azi_n, name="conv")(
            equis=(des1, des2), train=train)                      # [M,20]
        prob = nn.softmax(logits, axis=-1)
        return jnp.sum(prob * jnp.arange(self.azi_n, dtype=prob.dtype), axis=-1)
