"""Gather-based bilinear sampling (the TPU equivalent of F.grid_sample).

Replaces the reference's ``F.grid_sample(..., mode='bilinear',
padding_mode='zeros', align_corners=False)`` calls (plane-sweep warp at
``cost_volume.py:538-549``, epipolar sampler, MVDepthLoss).  Coordinates
are in *pixel* units with pixel centers at half-integers (the convention
produced by the reference's BackprojectDepth/Project3D pipeline); a pixel
coordinate p samples array position p - 0.5.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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

    batch_shape = features.shape[:-3]
    nb = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    flat = features.reshape(nb * h * w, c)
    boff = (h * w) * jnp.arange(nb, dtype=jnp.int32)

    def tap(xi, yi, weight):
        # One flat 2-D take per tap: XLA's TPU gather is row-count-bound,
        # and the flat form is measurably faster than batched
        # take_along_axis (see bilinear_sample_packed).
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        idx = yi_c * w + xi_c
        row = idx.reshape(nb, -1) + boff[:, None]
        vals = jnp.take(flat, row.reshape(-1), axis=0, mode="clip")
        vals = vals.reshape(*idx.shape, c)
        return vals * (weight * inside)[..., None]

    out = (
        tap(x0i, y0i, (1 - wx) * (1 - wy))
        + tap(x0i + 1, y0i, wx * (1 - wy))
        + tap(x0i, y0i + 1, (1 - wx) * wy)
        + tap(x0i + 1, y0i + 1, wx * wy)
    )
    return out


def pack_quad(features: jnp.ndarray) -> jnp.ndarray:
    """(..., h, w, c) -> (..., h+1, w+1, 4c): channel blocks hold the
    (y, x), (y, x+1), (y+1, x), (y+1, x+1) neighborhood of each *padded*
    pixel (one zero row/col prepended so quads anchored at -1 exist).

    One row-gather of the packed map fetches all four bilinear taps —
    TPU gathers are row-rate-bound, so this is ~4x fewer gathers than
    per-tap sampling.  Edge neighbors wrap; ``bilinear_sample_packed``
    masks their weights so wrapped values never contribute.
    """
    pad = [(0, 0)] * (features.ndim - 3) + [(1, 0), (1, 0), (0, 0)]
    fp = jnp.pad(features, pad)
    fx = jnp.roll(fp, -1, axis=-2)
    fy = jnp.roll(fp, -1, axis=-3)
    fxy = jnp.roll(fx, -1, axis=-3)
    return jnp.concatenate([fp, fx, fy, fxy], axis=-1)


def bilinear_sample_packed(
    packed: jnp.ndarray,  # (..., h, w, 4c) from pack_quad
    coords: jnp.ndarray,  # (..., n, 2) pixel xy, centers at half-integers
) -> jnp.ndarray:
    """Equivalent to ``bilinear_sample`` on the unpacked features, with a
    single row-gather per sample. Returns (..., n, c).

    TPU notes (round-2 measurements, honest device_get-fenced timing):
    XLA's gather is row-count-bound (~10 ns/row regardless of row width or
    dtype), so the quad packing — one row per sample instead of four — is
    the dominant optimization.  Two further findings baked in here:
    merging all leading batch dims into the row dimension and using one
    2-D ``jnp.take`` is ~1.6x faster than a batched ``take_along_axis``,
    and ``mode="clip"`` avoids a separate full-size bounds-check/select
    pass over the gathered output (~15%).  ``optimization_barrier`` hints
    were measured to be no-ops around this pattern and are gone.
    """
    hp, wp, c4 = packed.shape[-3:]  # padded dims: h+1, w+1
    h, w = hp - 1, wp - 1
    c = c4 // 4
    x = coords[..., 0] - 0.5
    y = coords[..., 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    in0x = (x0i >= 0) & (x0i < w)
    in1x = (x0i + 1 >= 0) & (x0i + 1 < w)
    in0y = (y0i >= 0) & (y0i < h)
    in1y = (y0i + 1 >= 0) & (y0i + 1 < h)
    w00 = (1 - wx) * (1 - wy) * (in0x & in0y)
    w10 = wx * (1 - wy) * (in1x & in0y)
    w01 = (1 - wx) * wy * (in0x & in1y)
    w11 = wx * wy * (in1x & in1y)

    # Quad anchors live at padded coords (y0+1, x0+1).
    idx = (
        jnp.clip(y0i + 1, 0, hp - 1) * wp + jnp.clip(x0i + 1, 0, wp - 1)
    )
    batch_shape = packed.shape[:-3]
    nb = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    flat = packed.reshape(nb * hp * wp, c4)
    idx_flat = idx.reshape(nb, -1)
    row = idx_flat + (hp * wp) * jnp.arange(nb, dtype=jnp.int32)[:, None]
    vals = jnp.take(flat, row.reshape(-1), axis=0, mode="clip")
    vals = vals.reshape(*idx.shape, c4)  # (..., n, 4c)
    return (
        vals[..., 0:c] * w00[..., None]
        + vals[..., c : 2 * c] * w10[..., None]
        + vals[..., 2 * c : 3 * c] * w01[..., None]
        + vals[..., 3 * c : 4 * c] * w11[..., None]
    )
