"""Auxiliary depth losses (reference ``src/loss/losses.py``).

Not used by the reference's published runtime configs, but part of its
loss inventory: multi-scale gradient loss, Eigen scale-invariant loss,
normals loss, and a multi-view depth-consistency loss.  Pure jnp; images
are (b, h, w) depth maps / (b, h, w, 3) normals.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _blur_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 binomial blur + stride-2 downsample (kornia blur_pool2d analog).

    x: (b, h, w)."""
    k = jnp.asarray([1.0, 2.0, 1.0])
    kernel = (k[:, None] * k[None, :]) / 16.0
    # Reflect-pad like kornia's blur_pool2d (zero padding would darken
    # borders and break the constant-preservation property).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="reflect")[..., None]
    out = jax.lax.conv_general_dilated(
        xp, kernel[..., None, None], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[..., 0]


def pyrdown(x: jnp.ndarray, num_scales: int = 4) -> list[jnp.ndarray]:
    """Blur-pool pyramid (sr_utils/generic_utils.py pyrdown)."""
    out = [x]
    for _ in range(num_scales - 1):
        out.append(_blur_pool2(out[-1]))
    return out


def _spatial_gradient(x: jnp.ndarray) -> jnp.ndarray:
    """Sobel x/y gradients, (b, h, w) -> (b, 2, h, w) (kornia convention,
    normalized Sobel)."""
    sx = jnp.asarray(
        [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]
    ) / 8.0
    sy = sx.T
    x4 = x[..., None]

    def conv(kern):
        return jax.lax.conv_general_dilated(
            x4, kern[..., None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[..., 0]

    return jnp.stack([conv(sx), conv(sy)], axis=1)


def ms_gradient_loss(
    depth_gt: jnp.ndarray, depth_pred: jnp.ndarray, num_scales: int = 4
) -> jnp.ndarray:
    """Multi-scale depth gradient L1 (MSGradientLoss).  Non-finite gt
    gradients are masked out."""
    total = jnp.asarray(0.0, depth_gt.dtype)
    for gt_s, pred_s in zip(
        pyrdown(depth_gt, num_scales), pyrdown(depth_pred, num_scales)
    ):
        g_gt = _spatial_gradient(gt_s)
        g_pr = _spatial_gradient(pred_s)
        mask = jnp.all(jnp.isfinite(g_gt), axis=1, keepdims=True)
        err = jnp.abs(jnp.where(mask, g_pr - jnp.nan_to_num(g_gt), 0.0))
        denom = jnp.maximum(jnp.sum(mask) * 2, 1)
        total = total + jnp.sum(err) / denom
    return total


def scale_invariant_loss(
    log_depth_gt: jnp.ndarray,
    log_depth_pred: jnp.ndarray,
    si_lambda: float = 0.85,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Eigen scale-invariant log-depth loss (ScaleInvariantLoss)."""
    diff = log_depth_gt - log_depth_pred
    if mask is not None:
        n = jnp.maximum(jnp.sum(mask), 1)
        diff = jnp.where(mask, diff, 0.0)
        mean_sq = jnp.sum(diff**2) / n
        mean = jnp.sum(diff) / n
    else:
        mean_sq = jnp.mean(diff**2)
        mean = jnp.mean(diff)
    return jnp.sqrt(jnp.maximum(mean_sq - si_lambda * mean**2, 1e-12))


def normals_loss(
    normals_gt: jnp.ndarray, normals_pred: jnp.ndarray
) -> jnp.ndarray:
    """0.5 * (1 - cos similarity), masked at non-finite entries.

    normals: (b, h, w, 3)."""
    mask = jnp.all(
        jnp.isfinite(normals_gt) & jnp.isfinite(normals_pred), axis=-1
    )
    gt = jnp.where(mask[..., None], jnp.nan_to_num(normals_gt), 1.0)
    pr = jnp.where(mask[..., None], jnp.nan_to_num(normals_pred), 1.0)
    dot = 0.5 * (1.0 - jnp.sum(gt * pr, axis=-1))
    return jnp.sum(jnp.where(mask, dot, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def depth_to_normals(
    depth: jnp.ndarray,  # (b, h, w)
    intrinsics: jnp.ndarray,  # (3, 3) pixel units
) -> jnp.ndarray:
    """Normals from a depth map via cross products of backprojected
    neighbors (sr_utils NormalGenerator analog, without the blur).
    Returns (b, h, w, 3)."""
    b, h, w = depth.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) + 0.5,
        jnp.arange(w, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x = (xs - cx) / fx * depth
    y = (ys - cy) / fy * depth
    pts = jnp.stack([x, y, depth], axis=-1)  # (b, h, w, 3)
    dx = jnp.roll(pts, -1, axis=2) - pts
    dy = jnp.roll(pts, -1, axis=1) - pts
    n = jnp.cross(dy, dx)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.maximum(norm, 1e-8)


def mv_depth_loss(
    cur_depth: jnp.ndarray,  # (b, h, w) predicted depth in current view
    src_depth: jnp.ndarray,  # (b, h, w) predicted depth in source view
    cur_extrinsics: jnp.ndarray,  # (b, 4, 4) c2w
    src_extrinsics: jnp.ndarray,  # (b, 4, 4) c2w
    intrinsics: jnp.ndarray,  # (3, 3) pixel units (shared)
) -> jnp.ndarray:
    """Multi-view depth consistency (MVDepthLoss): backproject current
    depth, project into the source view, compare against the source
    depth sampled there (L1 on log depth, masked to non-occluded points)."""
    b, h, w = cur_depth.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) + 0.5,
        jnp.arange(w, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x = (xs[None] - cx) / fx * cur_depth
    y = (ys[None] - cy) / fy * cur_depth
    cam = jnp.stack([x, y, cur_depth, jnp.ones_like(cur_depth)], axis=-1)
    src_T_cur = jnp.linalg.inv(src_extrinsics) @ cur_extrinsics  # (b, 4, 4)
    src_pts = jnp.einsum("bij,bhwj->bhwi", src_T_cur, cam)[..., :3]
    z = src_pts[..., 2]
    u = src_pts[..., 0] / jnp.where(z > 0, z, 1.0) * fx + cx
    v = src_pts[..., 1] / jnp.where(z > 0, z, 1.0) * fy + cy
    ui = jnp.clip(jnp.round(u - 0.5).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(v - 0.5).astype(jnp.int32), 0, h - 1)
    flat = src_depth.reshape(b, h * w)
    sampled = jnp.take_along_axis(
        flat, (vi * w + ui).reshape(b, h * w), axis=1
    ).reshape(b, h, w)
    in_bounds = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 0)
    not_occluded = z < 1.05 * sampled
    mask = in_bounds & not_occluded & (sampled > 0)
    err = jnp.abs(
        jnp.log(jnp.maximum(z, 1e-6)) - jnp.log(jnp.maximum(sampled, 1e-6))
    )
    return jnp.sum(jnp.where(mask, err, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
