"""Auxiliary rendering modes: orthographic projections and depth-as-color.

Parity targets: ``render_cuda_orthographic`` (reference
``cuda_splatting.py:135-229`` — fake orthographic camera by pushing the
camera back with a tiny FoV; used by the 3D validation visualizations,
``visualization/validation_in_3d.py``) and ``render_depth_cuda``
(``:235-278`` — render per-Gaussian camera-space z as a DC color in
depth / disparity / relative-disparity / log modes).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..geometry.projection import homogenize_points
from ..ops.rasterizer_ref import render_reference
from ..ops.rasterizer import rasterize
from .types import Gaussians


def depth_to_relative_disparity(
    depth: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray
) -> jnp.ndarray:
    """Disparity remapped so near -> 0 and far -> 1 (reference
    ``encoder/epipolar/conversions.py``)."""
    disp_near = 1.0 / near
    disp_far = 1.0 / far
    return (1.0 / depth - disp_near) / (disp_far - disp_near)


def render_orthographic(
    gaussians: Gaussians,
    extrinsics: jnp.ndarray,  # (4, 4)
    width: float,
    height: float,
    near: float,
    far: float,
    image_shape: tuple[int, int],
    background: jnp.ndarray,
    sh_degree: int,
    fov_degrees: float = 0.1,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Approximate orthographic render: move the camera far back and use a
    tiny FoV so rays are near-parallel (the reference's trick)."""
    fov_x = math.radians(fov_degrees)
    tan_fov_x = math.tan(0.5 * fov_x)
    distance_to_near = (0.5 * width) / tan_fov_x
    tan_fov_y = 0.5 * height / distance_to_near

    # Normalized intrinsics with these FoVs: fx = 0.5 / tan(fov/2).
    intrinsics = jnp.array(
        [
            [0.5 / tan_fov_x, 0.0, 0.5],
            [0.0, 0.5 / tan_fov_y, 0.5],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    move_back = jnp.eye(4).at[2, 3].set(-distance_to_near)
    extrinsics = extrinsics @ move_back

    render = rasterize if use_pallas else render_reference
    color, _, _ = render(
        gaussians.means,
        gaussians.covariances,
        gaussians.harmonics,
        gaussians.masked_opacities(),
        extrinsics,
        intrinsics,
        image_shape,
        background,
        sh_degree,
    )
    return color


def render_projections(
    gaussians: Gaussians,
    resolution: int = 256,
    margin: float = 0.1,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Three axis-aligned orthographic projections of one scene's
    Gaussians — the reference's 3D validation visualization
    (``visualization/validation_in_3d.py:25-89``: equal AABB + margin,
    camera looking down each axis, fov_degrees=10).  Returns
    (3, resolution, resolution, 3)."""
    from ..utils.camera_viz import compute_equal_aabb_with_margin
    import numpy as np

    means = np.asarray(gaussians.means)
    scene_min, scene_max = compute_equal_aabb_with_margin(
        means.min(axis=0), means.max(axis=0), margin
    )
    center = 0.5 * (scene_min + scene_max)

    views = []
    for look_axis in range(3):
        right_axis = (look_axis + 1) % 3
        down_axis = (look_axis + 2) % 3
        extr = jnp.zeros((4, 4), jnp.float32)
        extr = extr.at[right_axis, 0].set(1.0)
        extr = extr.at[down_axis, 1].set(1.0)
        extr = extr.at[look_axis, 2].set(1.0)
        extr = extr.at[right_axis, 3].set(center[right_axis])
        extr = extr.at[down_axis, 3].set(center[down_axis])
        extr = extr.at[look_axis, 3].set(scene_min[look_axis])
        extr = extr.at[3, 3].set(1.0)
        extent = scene_max - scene_min
        views.append(
            render_orthographic(
                gaussians,
                extr,
                float(extent[right_axis]),
                float(extent[down_axis]),
                0.0,
                float(extent[look_axis]),
                (resolution, resolution),
                jnp.zeros(3),
                sh_degree=0,
                fov_degrees=10.0,
                use_pallas=use_pallas,
            )
        )
    return jnp.stack(views)


def render_depth(
    gaussians: Gaussians,
    extrinsics: jnp.ndarray,  # (4, 4)
    intrinsics: jnp.ndarray,  # (3, 3) normalized
    near: jnp.ndarray,
    far: jnp.ndarray,
    image_shape: tuple[int, int],
    mode: str = "depth",  # depth | disparity | relative_disparity | log
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Render camera-space z as a DC-only color (render_depth_cuda)."""
    w2c = jnp.linalg.inv(extrinsics)
    cam = jnp.einsum(
        "ij,nj->ni", w2c, homogenize_points(gaussians.means)
    )[:, 2]
    fake = cam
    if mode == "disparity":
        fake = 1.0 / jnp.maximum(cam, 1e-8)
    elif mode == "relative_disparity":
        fake = depth_to_relative_disparity(jnp.maximum(cam, 1e-8), near, far)
    elif mode == "log":
        fake = jnp.log(jnp.clip(cam, near, far))

    # DC-only SH that evaluates exactly to ``fake`` (inverse of the +0.5
    # offset and the C0 basis factor).
    c0 = 0.28209479177387814
    dc = (fake - 0.5) / c0
    harmonics = jnp.repeat(dc[:, None, None], 3, axis=1)  # (g, 3, 1)

    render = rasterize if use_pallas else render_reference
    color, _, _ = render(
        gaussians.means,
        gaussians.covariances,
        harmonics,
        gaussians.masked_opacities(),
        extrinsics,
        intrinsics,
        image_shape,
        jnp.zeros(3),
        0,
    )
    return jnp.mean(color, axis=-1)
