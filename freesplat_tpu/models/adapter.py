"""GaussianAdapter: raw network features -> Gaussian parameters.

Behavioral parity target: ``src/model/encoder/common/gaussian_adapter.py``.
Pure functions (no parameters).  Two operations:

- ``unproject_depth``: per-pixel depth map -> world-space 3D means (the
  reference's ``Create_from_depth_map.project`` path, ``:19-95`` — which,
  stripped of its numpy scaffolding, is just K^-1 unprojection + c2w).
- ``build_gaussians``: raw head output -> scales / rotations / world
  covariances / masked SH.  In the PTF path the reference does NOT rotate
  harmonics to world space (``:191-192``); we reproduce that.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..ops.gaussians import build_covariance, matmul3
from ..ops.mathutil import safe_normalize


@dataclass(frozen=True)
class GaussianAdapterCfg:
    gaussian_scale_min: float = 0.5
    gaussian_scale_max: float = 15.0
    sh_degree: int = 2

    @property
    def d_sh(self) -> int:
        return (self.sh_degree + 1) ** 2

    @property
    def d_in(self) -> int:
        """Raw feature width consumed by build_gaussians (scales+rot+sh)."""
        return 7 + 3 * self.d_sh


def sh_mask(cfg: GaussianAdapterCfg) -> jnp.ndarray:
    """Bias SH toward the DC component at init (reference ``:127-133``)."""
    mask = jnp.ones((cfg.d_sh,), jnp.float32)
    for degree in range(1, cfg.sh_degree + 1):
        mask = mask.at[degree**2 : (degree + 1) ** 2].set(0.1 * 0.25**degree)
    return mask


def unproject_depth(
    depths: jnp.ndarray,  # (..., h, w)
    intrinsics: jnp.ndarray,  # (..., 3, 3) normalized
    extrinsics: jnp.ndarray,  # (..., 4, 4) c2w
    image_shape: tuple[int, int],
) -> jnp.ndarray:
    """Per-pixel world-space 3D points: (..., h, w, 3).

    Pixel coordinates are INTEGER (corner) convention, matching the
    reference's ``Create_from_depth_map`` grid (``torch.range(0, h-1)``,
    ``gaussian_adapter.py:36``) — NOT the +0.5 center convention its
    ``sample_image_grid`` uses elsewhere.  The PTF reprojection round()
    and any converted reference checkpoint depend on this half-pixel
    choice, so parity requires reproducing it.
    """
    h, w = image_shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    # Pixel-unit intrinsics from normalized.
    fx = intrinsics[..., 0, 0] * w
    fy = intrinsics[..., 1, 1] * h
    cx = intrinsics[..., 0, 2] * w
    cy = intrinsics[..., 1, 2] * h
    x = (xs - cx[..., None, None]) / fx[..., None, None] * depths
    y = (ys - cy[..., None, None]) / fy[..., None, None] * depths
    cam = jnp.stack([x, y, depths], axis=-1)  # (..., h, w, 3)
    rot = extrinsics[..., :3, :3]
    t = extrinsics[..., :3, 3]
    return (
        jnp.einsum("...ij,...hwj->...hwi", rot, cam) + t[..., None, None, :]
    )


def scale_multiplier(
    intrinsics: jnp.ndarray, image_shape: tuple[int, int], multiplier: float = 0.1
) -> jnp.ndarray:
    """Pixel-size scale factor (reference ``get_scale_multiplier``)."""
    h, w = image_shape
    pixel_size = jnp.array([1.0 / w, 1.0 / h], jnp.float32)
    k2 = intrinsics[..., :2, :2]
    inv = jnp.linalg.inv(k2)
    xy = multiplier * jnp.einsum("...ij,j->...i", inv, pixel_size)
    return jnp.sum(xy, axis=-1)


def build_gaussians(
    cfg: GaussianAdapterCfg,
    raw: jnp.ndarray,  # (..., 7 + 3*d_sh)
    depths: jnp.ndarray,  # (...,)
    c2w_rotations: jnp.ndarray,  # (..., 3, 3)
    intrinsics: jnp.ndarray,  # (3, 3) normalized (current view)
    image_shape: tuple[int, int],
    eps: float = 1e-8,
) -> dict[str, jnp.ndarray]:
    """Raw features -> {scales, rotations, covariances, harmonics}.

    Harmonics stay in the head's frame (no world rotation — PTF path).
    """
    scales_raw = raw[..., 0:3]
    rot_raw = raw[..., 3:7]
    sh = raw[..., 7:]

    s_min, s_max = cfg.gaussian_scale_min, cfg.gaussian_scale_max
    scales = s_min + (s_max - s_min) * jnp.asarray(
        1.0 / (1.0 + jnp.exp(-scales_raw))
    )
    mult = scale_multiplier(intrinsics, image_shape)
    scales = scales * depths[..., None] * mult

    rotations = safe_normalize(rot_raw)  # finite grad at the zero quat

    sh = sh.reshape(*sh.shape[:-1], 3, cfg.d_sh) * sh_mask(cfg)

    cov = build_covariance(scales, rotations)
    # Elementwise 3x3 products — see ops/gaussians.matmul3 (tiny batched
    # matmuls pad to MXU tiles and OOM at whole-scene sizes).
    cov = matmul3(matmul3(c2w_rotations, cov),
                  jnp.swapaxes(c2w_rotations, -1, -2))
    return {
        "scales": scales,
        "rotations": rotations,
        "covariances": cov,
        "harmonics": sh,
    }
