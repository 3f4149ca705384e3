"""Gradient-safe numerics.

``jnp.linalg.norm`` (and bare ``sqrt(sum(x^2))``) has a NaN gradient at
exactly zero — and zero vectors are structural in this framework (shadow
neighbor slots, padded rows have zero features by design, mirroring the
reference's zero-fill shadow semantics).  torch defines the subgradient of
``norm`` at 0 as 0, so the reference trains fine; these helpers reproduce
that: value ``max(|x|, eps)``-style, gradient 0 at 0.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False,
              eps: float = 1e-12) -> jnp.ndarray:
    """L2 norm with zero gradient at zero (value >= eps)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def safe_normalize(x: jnp.ndarray, axis=-1, eps: float = 1e-8) -> jnp.ndarray:
    """x / max(|x|, eps) with safe gradients (zero vectors stay zero)."""
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)
