"""Pure-jnp reference rasterizer: per-pixel full evaluation (no tiling).

Slow (O(N * H * W) memory) but exact and natively differentiable — the
golden model for the Pallas tile rasterizer, and the interpret-mode
fallback.  Reproduces the CUDA rasterizer's compositing semantics including
the 1/255 alpha cut, the 0.99 alpha clamp, and the T < 1e-4 early
termination (which also affects the background term).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rendering import (
    ALPHA_MAX,
    ALPHA_MIN,
    Screen,
    TILE,
    TRANSMITTANCE_EPS,
    preprocess_gaussians,
)


def composite_reference(
    screen: Screen,
    image_shape: tuple[int, int],
    background: jnp.ndarray,  # (3,)
    tile_cull: int | None = TILE,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite preprocessed Gaussians over the full image.

    Returns (color (h, w, 3), depth (h, w), alpha (h, w)).  Depth is the
    *unnormalized* accumulated expected view-space z (like the w-depth CUDA
    fork); divide by alpha for normalized expected depth.
    """
    h, w = image_shape
    n = screen.means2d.shape[0]

    # Sort by depth (front to back); push culled Gaussians to the back.
    order = jnp.argsort(jnp.where(screen.mask, screen.depths, jnp.inf))
    mean2d = screen.means2d[order]
    conic = screen.conics[order]
    color = screen.colors[order]
    opac = screen.opacities[order]
    depth = screen.depths[order]
    mask = screen.mask[order]

    ys = jnp.arange(h, dtype=mean2d.dtype)
    xs = jnp.arange(w, dtype=mean2d.dtype)
    px, py = jnp.meshgrid(xs, ys)  # (h, w)

    dx = px[None] - mean2d[:, 0, None, None]  # (n, h, w)
    dy = py[None] - mean2d[:, 1, None, None]
    power = -0.5 * (
        conic[:, 0, None, None] * dx * dx + conic[:, 2, None, None] * dy * dy
    ) - conic[:, 1, None, None] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opac[:, None, None] * jnp.exp(power))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    skip = (alpha < ALPHA_MIN) | ~mask[:, None, None]

    if tile_cull is not None:
        # Mirror the tile rasterizer (and the CUDA spec): a Gaussian only
        # touches pixels whose tile lies inside its 3-sigma radius rect.
        radius = screen.radii[order]
        tw = -(-w // tile_cull)
        th = -(-h // tile_cull)
        gx0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_cull), 0, tw)
        gy0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_cull), 0, th)
        gx1 = jnp.clip(
            jnp.floor((mean2d[:, 0] + radius + tile_cull - 1) / tile_cull), 0, tw
        )
        gy1 = jnp.clip(
            jnp.floor((mean2d[:, 1] + radius + tile_cull - 1) / tile_cull), 0, th
        )
        ptx = jnp.floor(px / tile_cull)  # (h, w)
        pty = jnp.floor(py / tile_cull)
        inside = (
            (ptx[None] >= gx0[:, None, None])
            & (ptx[None] < gx1[:, None, None])
            & (pty[None] >= gy0[:, None, None])
            & (pty[None] < gy1[:, None, None])
        )
        skip = skip | ~inside
    eff_alpha = jnp.where(skip, 0.0, alpha)

    # Exclusive running transmittance T_g = prod_{j<g} (1 - a_j).
    log_one_minus = jnp.log1p(-eff_alpha)
    log_t = jnp.concatenate(
        [jnp.zeros_like(log_one_minus[:1]), jnp.cumsum(log_one_minus, axis=0)[:-1]],
        axis=0,
    )
    t_excl = jnp.exp(log_t)

    # CUDA early termination: a gaussian whose blend would push T below 1e-4
    # is itself skipped and stops the pixel.  test is +inf for skipped ones.
    test = jnp.where(skip, jnp.inf, t_excl * (1.0 - eff_alpha))
    alive = jnp.cumprod((test >= TRANSMITTANCE_EPS).astype(mean2d.dtype), axis=0)

    weight = eff_alpha * t_excl * alive  # (n, h, w)
    # HIGHEST: on TPU, default-precision f32 einsum routes through the MXU
    # at reduced precision; the golden model must be exact.
    out_color = jnp.einsum(
        "nhw,nc->hwc", weight, color, precision=jax.lax.Precision.HIGHEST
    )
    out_depth = jnp.einsum(
        "nhw,n->hw", weight, depth, precision=jax.lax.Precision.HIGHEST
    )
    t_final = jnp.exp(jnp.sum(jnp.log1p(-eff_alpha * alive), axis=0))
    out_color = out_color + t_final[..., None] * background
    return out_color, out_depth, 1.0 - t_final


def render_reference(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    harmonics: jnp.ndarray,
    opacities: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_shape: tuple[int, int],
    background: jnp.ndarray,
    sh_degree: int,
    tile_cull: int | None = TILE,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render one view. Returns (color (h, w, 3), depth (h, w), alpha (h, w))."""
    screen = preprocess_gaussians(
        means, covariances, harmonics, opacities, extrinsics, intrinsics,
        image_shape, sh_degree,
    )
    return composite_reference(screen, image_shape, background, tile_cull=tile_cull)
