"""Shared rasterization preprocessing (pure jnp, autodiff-friendly).

Implements the per-Gaussian screen-space setup of the 3D Gaussian splatting
rasterizer: world -> camera -> NDC -> pixel projection, EWA 3x3 -> 2x2
covariance with the 0.3 px low-pass dilation, conic/radius computation, and
SH -> color evaluation.  The math reproduces the behavioral spec of the
external CUDA extension used by the reference
(``diff-gaussian-rasterization-w-depth``; conventions documented at
``/root/reference/src/model/decoder/cuda_splatting.py:17-44``):

- view matrix = inverse(c2w extrinsics), OpenCV axes
- projection maps Z to (0, 1), Z-flipped vs OpenGL
- pixel = ((ndc + 1) * size - 1) / 2
- frustum cull at view-space z <= 0.2
- cov2d = J W Sigma W^T J^T + 0.3 * I (EWA with clamped Jacobian)
- alpha = min(0.99, opacity * exp(-0.5 d^T conic d)), cut at 1/255
- color = max(SH(dir) + 0.5, 0)

All of this is plain jnp so XLA fuses it and JAX autodiff provides exact
gradients; only the per-tile compositing lives in Pallas.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.projection import get_fov, homogenize_points
from .mathutil import safe_normalize
from .sh import eval_sh

# CUDA rasterizer constants.
TILE = 16  # pixels per rasterizer tile side (binning granularity; CUDA uses 16)
NEAR_CULL_Z = 0.2
DILATION = 0.3
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
TRANSMITTANCE_EPS = 1e-4


def get_projection_matrix(
    near: jnp.ndarray, far: jnp.ndarray, fov_x: jnp.ndarray, fov_y: jnp.ndarray
) -> jnp.ndarray:
    """Perspective projection with Z in (0, 1), Z-flipped vs OpenGL.

    Matches ``get_projection_matrix`` in the reference decoder
    (``cuda_splatting.py:17-44``). All args broadcastable; returns (..., 4, 4).
    """
    tan_fov_x = jnp.tan(0.5 * fov_x)
    tan_fov_y = jnp.tan(0.5 * fov_y)
    top = tan_fov_y * near
    right = tan_fov_x * near

    shape = jnp.broadcast_shapes(near.shape, far.shape, fov_x.shape, fov_y.shape)
    zeros = jnp.zeros(shape, dtype=jnp.result_type(near, far, fov_x, fov_y))
    ones = jnp.ones_like(zeros)

    r00 = 2 * near / (2 * right)
    r11 = 2 * near / (2 * top)
    r22 = far / (far - near)
    r23 = -(far * near) / (far - near)
    rows = [
        [r00, zeros, zeros, zeros],
        [zeros, r11, zeros, zeros],
        [zeros, zeros, r22, r23],
        [zeros, zeros, ones, zeros],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


class Screen(NamedTuple):
    """Per-Gaussian screen-space quantities for one view.

    means2d: (n, 2) pixel coordinates
    conics: (n, 3) inverse 2x2 covariance (a, b, c) for [[a, b], [b, c]]
    colors: (n, 3) RGB after SH evaluation (+0.5, clamped at 0)
    opacities: (n,)
    depths: (n,) view-space z
    radii: (n,) float 3-sigma screen radius (0 for culled)
    mask: (n,) bool — in frustum, non-degenerate, visible
    """

    means2d: jnp.ndarray
    conics: jnp.ndarray
    colors: jnp.ndarray
    opacities: jnp.ndarray
    depths: jnp.ndarray
    radii: jnp.ndarray
    mask: jnp.ndarray


def preprocess_gaussians(
    means: jnp.ndarray,  # (n, 3) world
    covariances: jnp.ndarray,  # (n, 3, 3) world
    harmonics: jnp.ndarray,  # (n, 3, d_sh)
    opacities: jnp.ndarray,  # (n,)
    extrinsics: jnp.ndarray,  # (4, 4) c2w
    intrinsics: jnp.ndarray,  # (3, 3) normalized
    image_shape: tuple[int, int],
    sh_degree: int,
    eps: float = 1e-7,
) -> Screen:
    h, w = image_shape
    dtype = means.dtype

    fov = get_fov(intrinsics[None])[0]
    fov_x, fov_y = fov[0], fov[1]
    tan_fov_x = jnp.tan(0.5 * fov_x)
    tan_fov_y = jnp.tan(0.5 * fov_y)
    focal_x = w / (2.0 * tan_fov_x)
    focal_y = h / (2.0 * tan_fov_y)

    w2c = jnp.linalg.inv(extrinsics)
    cam_pts = jnp.einsum("ij,nj->ni", w2c, homogenize_points(means))[:, :3]
    depths = cam_pts[:, 2]
    in_front = depths > NEAR_CULL_Z
    # Culled Gaussians are masked out downstream, but their intermediate
    # values must stay finite: 0-cotangent * inf = NaN in the backward.
    z_safe = jnp.where(in_front, depths, 1.0)

    # Full projection to pixel coordinates.  near/far only affect the z row of
    # the projection matrix, which the rasterizer never reads back — use fixed
    # values for the xy part (they cancel).
    near = jnp.asarray(0.01, dtype)
    far = jnp.asarray(100.0, dtype)
    proj = get_projection_matrix(near, far, fov_x, fov_y)
    full_proj = proj @ w2c
    p_hom = jnp.einsum("ij,nj->ni", full_proj, homogenize_points(means))
    p_w = 1.0 / jnp.where(in_front, p_hom[:, 3] + eps, 1.0)
    ndc = p_hom[:, :2] * p_w[:, None]
    means2d = jnp.stack(
        [((ndc[:, 0] + 1.0) * w - 1.0) * 0.5, ((ndc[:, 1] + 1.0) * h - 1.0) * 0.5],
        axis=-1,
    )

    # EWA: J W Sigma W^T J^T with the CUDA clamping of the tangent-plane coords.
    lim_x = 1.3 * tan_fov_x
    lim_y = 1.3 * tan_fov_y
    tz = z_safe
    tx = jnp.clip(cam_pts[:, 0] / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(cam_pts[:, 1] / tz, -lim_y, lim_y) * tz
    # Row vectors of J @ W_rot, written elementwise: XLA lowers per-element
    # (n, 2, 3) @ (n, 3, 3) batched matmuls poorly on TPU, while these fused
    # elementwise forms are pure VPU work.
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)
    rot = w2c[:3, :3]
    # jw row 0 = j00 * R[0, :] + j02 * R[2, :]; row 1 = j11*R[1,:] + j12*R[2,:]
    jw0 = j00[:, None] * rot[0][None, :] + j02[:, None] * rot[2][None, :]
    jw1 = j11[:, None] * rot[1][None, :] + j12[:, None] * rot[2][None, :]
    # cov2d entries jw_i . Sigma . jw_j, written elementwise: batched
    # (n, 3, 3) @ (n, 3) dots pad each tiny matrix to an MXU tile on TPU.
    c00 = covariances[:, 0, 0]
    c01 = covariances[:, 0, 1]
    c02 = covariances[:, 0, 2]
    c11 = covariances[:, 1, 1]
    c12 = covariances[:, 1, 2]
    c22 = covariances[:, 2, 2]

    def quad(u, v):
        return (
            u[:, 0] * (c00 * v[:, 0] + c01 * v[:, 1] + c02 * v[:, 2])
            + u[:, 1] * (c01 * v[:, 0] + c11 * v[:, 1] + c12 * v[:, 2])
            + u[:, 2] * (c02 * v[:, 0] + c12 * v[:, 1] + c22 * v[:, 2])
        )

    a = quad(jw0, jw0) + DILATION
    b = quad(jw0, jw1)
    c = quad(jw1, jw1) + DILATION

    det = a * c - b * b
    nondegenerate = det > 0.0
    det_safe = jnp.where(nondegenerate, det, 1.0)
    conics = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    # Opacity-aware splat radius (exactness-preserving): every pixel
    # beyond sqrt(2 ln(op / ALPHA_MIN)) standard deviations has
    # alpha = op * exp(-q/2) < ALPHA_MIN and is zeroed by the compositing
    # alpha cut anyway, so tiles outside that radius can be skipped with
    # IDENTICAL output.  Capped at the CUDA spec's 3 sigma (for op near 1
    # the exact bound is 3.33 sigma — the CUDA rasterizer *drops* the
    # 3..3.33 sigma shell, and parity requires dropping it too).  For
    # op <= ALPHA_MIN the radius is 0: such Gaussians can never pass the
    # alpha cut at any pixel.
    # stop_gradient: sqrt(0) at op <= ALPHA_MIN would turn the (always
    # zero — ceil) radius cotangent into 0 * inf = NaN.
    k_sigma = jax.lax.stop_gradient(
        jnp.minimum(
            3.0,
            jnp.sqrt(2.0 * jnp.maximum(jnp.log(
                jnp.maximum(opacities, 1e-12) / ALPHA_MIN), 0.0)),
        )
    )
    radii = jnp.ceil(k_sigma * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # SH -> RGB from the direction campos -> gaussian.
    campos = extrinsics[:3, 3]
    dirs = safe_normalize(means - campos)
    colors = jnp.maximum(eval_sh(harmonics, dirs, sh_degree) + 0.5, 0.0)

    mask = in_front & nondegenerate & (radii > 0)
    radii = jnp.where(mask, radii, 0.0)
    return Screen(
        means2d=means2d,
        conics=conics,
        colors=colors,
        opacities=opacities,
        depths=depths,
        radii=radii,
        mask=mask,
    )
