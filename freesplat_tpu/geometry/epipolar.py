"""Epipolar geometry: ray-segment projection onto other views.

Parity target: ``src/geometry/epipolar_lines.py`` (project_rays,
lift_to_3d, get_depth) — used by the evaluation-index generator's view-
overlap computation and the (optional) epipolar visualizations.  Fully
masked/static-shape jnp (the reference uses boolean fancy-indexing).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .projection import (
    get_world_rays,
    homogenize_points,
    homogenize_vectors,
    intersect_rays,
    project_camera_space,
)


class PointProjection(NamedTuple):
    t: jnp.ndarray
    xy: jnp.ndarray
    valid: jnp.ndarray


class RaySegmentProjection(NamedTuple):
    t_min: jnp.ndarray
    t_max: jnp.ndarray
    xy_min: jnp.ndarray
    xy_max: jnp.ndarray
    overlaps_image: jnp.ndarray


def _is_in_bounds(xy: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    return jnp.all(xy >= -epsilon, axis=-1) & jnp.all(xy <= 1 + epsilon, axis=-1)


def _is_in_front(xyz: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    return xyz[..., -1] > -epsilon


def _is_positive_t(t: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    return t > -epsilon


def _intersect_image_coordinate(
    intrinsics, origins, directions, dim: int, coordinate_value: float
) -> PointProjection:
    """Intersection of the projected ray with a horizontal/vertical frame
    line (reference ``:56-105``)."""
    other = 1 - dim
    fs = intrinsics[..., dim, dim]
    fo = intrinsics[..., other, other]
    cs = intrinsics[..., dim, 2]
    co = intrinsics[..., other, 2]
    o_s = origins[..., dim]
    oo = origins[..., other]
    ds = directions[..., dim]
    do = directions[..., other]
    oz = origins[..., 2]
    dz = directions[..., 2]
    c = (coordinate_value - cs) / fs

    t = (c * oz - o_s) / (ds - c * dz)
    coord_other = co + (fo * (oo * (c * dz - ds) + do * (o_s - c * oz))) / (
        dz * o_s - ds * oz
    )
    coord_same = jnp.full_like(coord_other, coordinate_value)
    parts = [coord_same]
    parts.insert(other, coord_other)
    xy = jnp.stack(parts, axis=-1)
    xyz = origins + t[..., None] * directions
    valid = _is_in_bounds(xy) & _is_in_front(xyz) & _is_positive_t(t)
    # NaN/inf guards: invalid anyway when degenerate.
    valid = valid & jnp.isfinite(t)
    return PointProjection(jnp.nan_to_num(t), jnp.nan_to_num(xy), valid)


def _compare_projections(projections, reduction: str) -> PointProjection:
    t = jnp.stack([p.t for p in projections])
    xy = jnp.stack([p.xy for p in projections])
    valid = jnp.stack([p.valid for p in projections])
    worst = jnp.inf if reduction == "min" else -jnp.inf
    t_masked = jnp.where(valid, t, worst)
    sel = jnp.argmin(t_masked, 0) if reduction == "min" else jnp.argmax(t_masked, 0)
    take = lambda arr: jnp.take_along_axis(
        arr.reshape(arr.shape[0], -1), sel.reshape(1, -1), axis=0
    ).reshape(sel.shape)
    xy_sel = jnp.stack(
        [take(xy[..., 0]), take(xy[..., 1])], axis=-1
    )
    return PointProjection(take(t_masked), xy_sel, take(valid.astype(jnp.int32)) > 0)


def _point_projection(xyz, t, intrinsics) -> PointProjection:
    xy = project_camera_space(xyz, intrinsics)
    valid = _is_in_bounds(xy) & _is_in_front(xyz) & _is_positive_t(t)
    return PointProjection(t, xy, valid)


def project_rays(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    near: jnp.ndarray | None = None,
    far: jnp.ndarray | None = None,
    epsilon: float = 1e-6,
) -> RaySegmentProjection:
    """Project world-space rays into another camera as image segments."""
    w2c = jnp.linalg.inv(extrinsics)
    o = jnp.einsum("...ij,...j->...i", w2c, homogenize_points(origins))[..., :3]
    d = jnp.einsum("...ij,...j->...i", w2c, homogenize_vectors(directions))[..., :3]

    frame = [
        _intersect_image_coordinate(intrinsics, o, d, 0, 0.0),
        _intersect_image_coordinate(intrinsics, o, d, 0, 1.0),
        _intersect_image_coordinate(intrinsics, o, d, 1, 0.0),
        _intersect_image_coordinate(intrinsics, o, d, 1, 1.0),
    ]
    fmin = _compare_projections(frame, "min")
    fmax = _compare_projections(frame, "max")

    if near is None:
        o_proj = o
        at_camera = jnp.linalg.norm(o, axis=-1) < epsilon
        depth_zero = o[..., -1] < epsilon
        o_proj = jnp.where(at_camera[..., None], d, o_proj)
        p0 = _point_projection(o_proj, jnp.zeros_like(fmin.t), intrinsics)
        p0 = p0._replace(valid=p0.valid & ~(depth_zero & ~at_camera))
    else:
        t_near = jnp.broadcast_to(near, fmin.t.shape)
        p0 = _point_projection(o + t_near[..., None] * d, t_near, intrinsics)

    if far is None:
        p1 = _point_projection(d, jnp.full_like(fmax.t, jnp.inf), intrinsics)
    else:
        t_far = jnp.broadcast_to(far, fmax.t.shape)
        p1 = _point_projection(o + t_far[..., None] * d, t_far, intrinsics)

    # Select endpoint per ray: the segment endpoint projection when valid,
    # otherwise the frame intersection.
    t_min = jnp.where(p0.valid, p0.t, fmin.t)
    xy_min = jnp.where(p0.valid[..., None], p0.xy, fmin.xy)
    min_valid = jnp.where(p0.valid, p0.valid, fmin.valid)
    t_max = jnp.where(p1.valid, p1.t, fmax.t)
    xy_max = jnp.where(p1.valid[..., None], p1.xy, fmax.xy)
    max_valid = jnp.where(p1.valid, p1.valid, fmax.valid)
    return RaySegmentProjection(
        t_min=t_min,
        t_max=t_max,
        xy_min=xy_min,
        xy_max=xy_max,
        overlaps_image=min_valid & max_valid,
    )


def lift_to_3d(origins, directions, xy, extrinsics, intrinsics) -> jnp.ndarray:
    """3D points on the epipolar segment corresponding to image xy."""
    xy_origins, xy_directions = get_world_rays(xy, extrinsics, intrinsics)
    return intersect_rays(origins, directions, xy_origins, xy_directions)


def get_depth(origins, directions, xy, extrinsics, intrinsics) -> jnp.ndarray:
    xyz = lift_to_3d(origins, directions, xy, extrinsics, intrinsics)
    return jnp.linalg.norm(xyz - origins, axis=-1)
