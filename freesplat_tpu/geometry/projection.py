"""Camera projection math (pure jnp, OpenCV conventions).

Conventions (matching the reference semantics in
``/root/reference/src/geometry/projection.py``):

- Extrinsics are 4x4 **camera-to-world** (c2w) matrices in OpenCV axes
  (+x right, +y down, +z forward).
- Intrinsics are 3x3 and **normalized** by image size: row 0 is divided by
  width, row 1 by height.  Pixel centers sit at ``(i + 0.5) / size``.
- ``sample_image_grid`` returns (x, y) coordinates in (0, 1).

Everything here is shape-polymorphic over leading batch dims and fully
differentiable; there is no data-dependent control flow so it jits cleanly.
"""
from __future__ import annotations

import jax.numpy as jnp

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def homogenize_points(points: jnp.ndarray) -> jnp.ndarray:
    """(..., d) xyz -> (..., d+1) xyz1."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: jnp.ndarray) -> jnp.ndarray:
    """(..., d) xyz -> (..., d+1) xyz0."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(homogeneous: jnp.ndarray, transformation: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform: ``T @ p`` with broadcasting over batch dims."""
    return jnp.einsum("...ij,...j->...i", transformation, homogeneous)


def transform_cam2world(homogeneous: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(homogeneous, extrinsics)


def transform_world2cam(homogeneous: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(homogeneous, jnp.linalg.inv(extrinsics))


def project_camera_space(
    points: jnp.ndarray,
    intrinsics: jnp.ndarray,
    epsilon: float = _F32_EPS,
    infinity: float = 1e8,
) -> jnp.ndarray:
    """Perspective-divide then apply intrinsics. Returns (..., d-1) coords."""
    points = points / (points[..., -1:] + epsilon)
    points = jnp.nan_to_num(points, posinf=infinity, neginf=-infinity)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points)
    return points[..., :-1]


def project(
    points: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    epsilon: float = _F32_EPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World points -> normalized image coords + in-front-of-camera mask."""
    points = homogenize_points(points)
    points = transform_world2cam(points, extrinsics)[..., :-1]
    in_front = points[..., -1] >= 0
    return project_camera_space(points, intrinsics, epsilon=epsilon), in_front


def unproject(
    coordinates: jnp.ndarray,
    z: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """Unproject normalized 2D coords at depth ``z`` into camera space."""
    coordinates = homogenize_points(coordinates)
    ray_directions = jnp.einsum(
        "...ij,...j->...i", jnp.linalg.inv(intrinsics), coordinates
    )
    return ray_directions * z[..., None]


def get_world_rays(
    coordinates: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel (origin, unit direction) in world space."""
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = homogenize_vectors(directions)
    directions = transform_cam2world(directions, extrinsics)[..., :-1]
    origins = jnp.broadcast_to(extrinsics[..., :-1, -1], directions.shape)
    return origins, directions


def sample_image_grid(shape: tuple[int, ...]) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized (0, 1) xy coordinates + integer ij indices for an image.

    Returns ``(coordinates[*shape, d] float xy-order, indices[*shape, d] int
    ij-order)`` with pixel centers at ``(i + 0.5) / size``.
    """
    indices = [jnp.arange(length) for length in shape]
    stacked_indices = jnp.stack(jnp.meshgrid(*indices, indexing="ij"), axis=-1)
    coordinates = [(idx + 0.5) / length for idx, length in zip(indices, shape)]
    coordinates = list(reversed(coordinates))
    coordinates = jnp.stack(jnp.meshgrid(*coordinates, indexing="xy"), axis=-1)
    return coordinates, stacked_indices


def get_fov(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Horizontal/vertical FoV (radians) from normalized intrinsics: (..., 2)."""
    intrinsics_inv = jnp.linalg.inv(intrinsics)

    def process(vector):
        v = jnp.asarray(vector, dtype=intrinsics.dtype)
        v = jnp.einsum("...ij,j->...i", intrinsics_inv, v)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    left = process([0.0, 0.5, 1.0])
    right = process([1.0, 0.5, 1.0])
    top = process([0.5, 0.0, 1.0])
    bottom = process([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.clip(jnp.sum(left * right, axis=-1), -1.0, 1.0))
    fov_y = jnp.arccos(jnp.clip(jnp.sum(top * bottom, axis=-1), -1.0, 1.0))
    return jnp.stack([fov_x, fov_y], axis=-1)


def intersect_rays(
    origins_x: jnp.ndarray,
    directions_x: jnp.ndarray,
    origins_y: jnp.ndarray,
    directions_y: jnp.ndarray,
    eps: float = 1e-5,
    inf: float = 1e10,
) -> jnp.ndarray:
    """Least-squares intersection of ray pairs; parallel rays -> ``inf``.

    Unlike the reference (which boolean-compacts parallel pairs), this is a
    fully masked static-shape implementation suitable for jit.
    """
    shape = jnp.broadcast_shapes(
        origins_x.shape, directions_x.shape, origins_y.shape, directions_y.shape
    )
    ox = jnp.broadcast_to(origins_x, shape)
    dx = jnp.broadcast_to(directions_x, shape)
    oy = jnp.broadcast_to(origins_y, shape)
    dy = jnp.broadcast_to(directions_y, shape)

    parallel = jnp.sum(dx * dy, axis=-1) > 1 - eps

    origins = jnp.stack([ox, oy], axis=0)
    directions = jnp.stack([dx, dy], axis=0)

    n = jnp.einsum("r...i,r...j->r...ij", directions, directions)
    n = n - jnp.eye(3, dtype=origins.dtype)
    lhs = jnp.sum(n, axis=0)
    rhs = jnp.einsum("r...ij,r...j->r...i", n, origins)
    rhs = jnp.sum(rhs, axis=0)

    # Regularize singular (parallel) systems so lstsq-by-pinv stays finite;
    # the mask overwrites those entries with inf below.
    reg = jnp.where(parallel[..., None, None], jnp.eye(3, dtype=lhs.dtype), 0.0)
    solution = jnp.einsum("...ij,...j->...i", jnp.linalg.pinv(lhs + reg), rhs)
    return jnp.where(parallel[..., None], jnp.full_like(solution, inf), solution)
