"""Gather-based bilinear sampling (the TPU equivalent of F.grid_sample).

Replaces the reference's ``F.grid_sample(..., mode='bilinear',
padding_mode='zeros', align_corners=False)`` calls (plane-sweep warp at
``cost_volume.py:538-549``, epipolar sampler, MVDepthLoss).  Coordinates
are in *pixel* units with pixel centers at half-integers (the convention
produced by the reference's BackprojectDepth/Project3D pipeline); a pixel
coordinate p samples array position p - 0.5.
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(
    features: jnp.ndarray,  # (..., h, w, c)
    coords: jnp.ndarray,  # (..., n, 2) pixel xy, centers at half-integers
) -> jnp.ndarray:
    """Sample with zero padding outside. Returns (..., n, c)."""
    h, w, c = features.shape[-3:]
    x = coords[..., 0] - 0.5
    y = coords[..., 1] - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi, weight):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        flat = features.reshape(*features.shape[:-3], h * w, c)
        idx = yi_c * w + xi_c
        vals = jnp.take_along_axis(flat, idx[..., None], axis=-2)
        return vals * (weight * inside)[..., None]

    out = (
        tap(x0i, y0i, (1 - wx) * (1 - wy))
        + tap(x0i + 1, y0i, wx * (1 - wy))
        + tap(x0i, y0i + 1, (1 - wx) * wy)
        + tap(x0i + 1, y0i + 1, wx * wy)
    )
    return out
