"""Small numeric helpers shared across ops and models."""
from __future__ import annotations

import jax.numpy as jnp


def safe_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize along the last axis with finite gradients at x = 0.

    ``x / (|x| + eps)`` has a NaN gradient at exactly zero (d|x|/dx is
    0/0); ``x / sqrt(|x|^2 + eps)`` does not.  Zero vectors map to zero.
    """
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(sq + eps)
