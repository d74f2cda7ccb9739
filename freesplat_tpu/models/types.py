"""Core model data contracts (pytrees)."""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Gaussians(NamedTuple):
    """The encoder -> decoder Gaussian contract.

    Mirrors the reference's ``src/model/types.py:7-12`` with one TPU-native
    addition: a validity ``mask`` instead of dynamic-length compaction
    (masked Gaussians have zero opacity and are skipped by the rasterizer).

    means:       (*batch, g, 3)
    covariances: (*batch, g, 3, 3)
    harmonics:   (*batch, g, 3, d_sh)
    opacities:   (*batch, g)
    mask:        (*batch, g) bool or None (= all valid)
    """

    means: jnp.ndarray
    covariances: jnp.ndarray
    harmonics: jnp.ndarray
    opacities: jnp.ndarray
    mask: Optional[jnp.ndarray] = None

    def masked_opacities(self) -> jnp.ndarray:
        if self.mask is None:
            return self.opacities
        return jnp.where(self.mask, self.opacities, 0.0)
