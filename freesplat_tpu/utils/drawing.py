"""Vector-graphics drawing onto images (reference ``src/visualization/
drawing/``: lines.py, points.py, cameras.py, coordinate_conversion.py,
rendering.py — the visualizer the repo uses for epipolar lines, projected
points, and camera-frustum diagrams).

TPU-native redesign: the reference evaluates a binary inside/outside mask
per (primitive, sample) and refines jagged pixels with MSAA passes
(``rendering.py:render_over_image``).  Here each primitive is an exact
signed-distance field and coverage is a 1-px smoothstep of the distance —
one fused elementwise pass over (pixels, primitives), no multi-pass MSAA,
no data-dependent refinement (XLA-friendly static shapes).  Compositing
matches the reference: the highest-index primitive covering a pixel wins
(``lines.py:72-79`` argmax arrangement), alpha-blended over the image.

Images are (h, w, 3) float in [0, 1] (NHWC — channel-last throughout this
repo, vs the reference's (3, h, w)).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _conversions(shape, x_range=None, y_range=None):
    """World->pixel mapping (reference coordinate_conversion.py:19-44);
    defaults make world == pixel coordinates."""
    h, w = shape
    x0, x1 = (0.0, float(w)) if x_range is None else map(float, x_range)
    y0, y1 = (0.0, float(h)) if y_range is None else map(float, y_range)
    minima = jnp.asarray([x0, y0], jnp.float32)
    scale = jnp.asarray([w / (x1 - x0), h / (y1 - y0)], jnp.float32)

    def world_to_pixel(xy):
        return (jnp.asarray(xy, jnp.float32) - minima) * scale

    return world_to_pixel


def _sample_grid(shape):
    h, w = shape
    x = jnp.arange(w, dtype=jnp.float32) + 0.5
    y = jnp.arange(h, dtype=jnp.float32) + 0.5
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([xx, yy], axis=-1).reshape(-1, 2)  # (hw, 2)


def _composite(image, dist, color, feather: float = 1.0):
    """Blend primitives over the image from per-pixel signed distances.

    dist: (hw, n) signed distance to each primitive's boundary (<= 0
    inside); color: (n, 3).  Highest-index covering primitive wins.
    """
    h, w, _ = image.shape
    n = dist.shape[1]
    cov = jnp.clip(0.5 - dist / feather, 0.0, 1.0)  # (hw, n) coverage
    inside = cov > 0.0
    order = jnp.where(inside, jnp.arange(n, dtype=jnp.int32)[None, :], -1)
    top = jnp.argmax(order, axis=1)  # (hw,)
    top_color = jnp.asarray(color, jnp.float32)[top]  # (hw, 3)
    alpha = jnp.max(cov, axis=1, keepdims=True)  # (hw, 1)
    flat = image.reshape(-1, 3)
    out = flat * (1.0 - alpha) + top_color * alpha
    return out.reshape(h, w, 3)


def _broadcast_rows(n, *arrays):
    out = []
    for a, width in arrays:
        a = jnp.asarray(a, jnp.float32)
        a = jnp.atleast_1d(a)
        if width and a.ndim == 1:
            a = a[None, :]
        target = (n, width) if width else (n,)
        out.append(jnp.broadcast_to(a, target))
    return out


def draw_points(
    image,
    points,
    color=(1.0, 1.0, 1.0),
    radius=1.0,
    inner_radius=0.0,
    x_range=None,
    y_range=None,
):
    """Discs / rings (reference points.py:13-60)."""
    image = jnp.asarray(image, jnp.float32)
    points = jnp.atleast_2d(jnp.asarray(points, jnp.float32))
    n = points.shape[0]
    (color,), (radius, inner) = (
        _broadcast_rows(n, (color, 3)),
        _broadcast_rows(n, (radius, 0), (inner_radius, 0)),
    )
    to_pix = _conversions(image.shape[:2], x_range, y_range)
    points = to_pix(points)
    xy = _sample_grid(image.shape[:2])
    d = jnp.linalg.norm(xy[:, None] - points[None], axis=-1)  # (hw, n)
    dist = jnp.maximum(d - radius[None], inner[None] - d)  # ring SDF
    return _composite(image, dist, color)


def draw_lines(
    image,
    start,
    end,
    color=(1.0, 1.0, 1.0),
    width=1.0,
    cap: str = "round",
    x_range=None,
    y_range=None,
):
    """Line segments with butt/round/square caps (reference lines.py:14-81)."""
    image = jnp.asarray(image, jnp.float32)
    start = jnp.atleast_2d(jnp.asarray(start, jnp.float32))
    end = jnp.atleast_2d(jnp.asarray(end, jnp.float32))
    n = max(start.shape[0], end.shape[0])
    start = jnp.broadcast_to(start, (n, 2))
    end = jnp.broadcast_to(end, (n, 2))
    (color,), (width,) = _broadcast_rows(n, (color, 3)), _broadcast_rows(
        n, (width, 0)
    )
    to_pix = _conversions(image.shape[:2], x_range, y_range)
    start, end = to_pix(start), to_pix(end)

    xy = _sample_grid(image.shape[:2])  # (hw, 2)
    delta = end - start  # (n, 2)
    norm = jnp.linalg.norm(delta, axis=-1)  # (n,)
    u = delta / jnp.maximum(norm, 1e-8)[:, None]
    rel = xy[:, None] - start[None]  # (hw, n, 2)
    par = jnp.sum(rel * u[None], axis=-1)  # (hw, n) along-line coordinate
    if cap == "round":
        # Distance to the segment: the stadium SDF.
        t = jnp.clip(par, 0.0, norm[None])
        closest = start[None] + t[..., None] * u[None]
        dist = jnp.linalg.norm(xy[:, None] - closest, axis=-1) - 0.5 * width[None]
    else:
        # Rectangle: perpendicular excess and along-line excess ("butt"
        # ends at the endpoints, "square" extends by half the width —
        # reference lines.py:52-57).
        extra = 0.5 * width[None] if cap == "square" else 0.0
        perp = rel - par[..., None] * u[None]
        d_perp = jnp.linalg.norm(perp, axis=-1) - 0.5 * width[None]
        d_par = jnp.maximum(-extra - par, par - norm[None] - extra)
        dist = jnp.maximum(d_perp, d_par)
    return _composite(image, dist, color)


def _unproject_frustum_corners(extrinsics, intrinsics, depth):
    """(b, 4, 3) world-space frustum corners at ``depth`` (reference
    cameras.py:112-132): image corners unprojected through K^-1."""
    corners = jnp.asarray(
        [[0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [1.0, 1.0, 1.0], [0.0, 1.0, 1.0]],
        jnp.float32,
    )  # normalized image corners, CCW
    inv_k = jnp.linalg.inv(intrinsics)  # (b, 3, 3) normalized intrinsics
    rays = jnp.einsum("bij,cj->bci", inv_k, corners)
    cam = rays * jnp.asarray(depth, jnp.float32).reshape(-1, 1, 1)
    cam_h = jnp.concatenate([cam, jnp.ones_like(cam[..., :1])], axis=-1)
    return jnp.einsum("bij,bcj->bci", extrinsics, cam_h)[..., :3]


def draw_cameras(
    resolution: int,
    extrinsics,
    intrinsics,
    color,
    near=None,
    far=None,
    margin: float = 0.1,
    frustum_scale: float = 0.05,
):
    """Three axis-aligned orthographic projections of camera frusta
    (reference cameras.py:14-109).  Returns (3, res, res, 3): projections
    along x, y, z."""
    extrinsics = jnp.asarray(extrinsics, jnp.float32)
    intrinsics = jnp.asarray(intrinsics, jnp.float32)
    color = jnp.broadcast_to(
        jnp.asarray(color, jnp.float32).reshape(-1, 3),
        (extrinsics.shape[0], 3),
    )

    origins = extrinsics[:, :3, 3]
    pts = [origins]
    span_guess = jnp.maximum(
        jnp.max(origins, axis=0) - jnp.min(origins, axis=0), 1e-3
    ).max()
    corner_depth = span_guess * frustum_scale
    frustum = _unproject_frustum_corners(extrinsics, intrinsics, corner_depth)
    pts.append(frustum.reshape(-1, 3))
    if near is not None:
        pts.append(
            _unproject_frustum_corners(extrinsics, intrinsics, near).reshape(-1, 3)
        )
    if far is not None:
        pts.append(
            _unproject_frustum_corners(extrinsics, intrinsics, far).reshape(-1, 3)
        )
    cloud = jnp.concatenate(pts)
    minima, maxima = jnp.min(cloud, axis=0), jnp.max(cloud, axis=0)
    # Equal AABB with margin (reference compute_equal_aabb_with_margin).
    center = 0.5 * (minima + maxima)
    half = jnp.max(maxima - minima) * (0.5 + margin)
    minima, maxima = center - half, center + half

    views = []
    b = extrinsics.shape[0]
    for axis in range(3):
        ax_x, ax_y = (axis + 1) % 3, (axis + 2) % 3

        def project(p):
            return jnp.stack([p[..., ax_x], p[..., ax_y]], axis=-1)

        ranges = dict(
            x_range=(float(minima[ax_x]), float(maxima[ax_x])),
            y_range=(float(minima[ax_y]), float(maxima[ax_y])),
        )
        image = jnp.zeros((resolution, resolution, 3), jnp.float32)
        for corners, shade in (
            (near is not None and _unproject_frustum_corners(
                extrinsics, intrinsics, near), 0.25),
            (far is not None and _unproject_frustum_corners(
                extrinsics, intrinsics, far), 0.25),
        ):
            if corners is False:
                continue
            pc = project(corners)
            image = draw_lines(
                image,
                pc.reshape(-1, 2),
                jnp.roll(pc, 1, axis=1).reshape(-1, 2),
                color=(shade, shade, shade),
                width=2.0,
                **ranges,
            )
        # Frustum wireframe: corner ring + spokes to the origin, per camera.
        pf = project(frustum)  # (b, 4, 2)
        po = project(origins)  # (b, 2)
        ring_color = jnp.repeat(color, 4, axis=0)
        image = draw_lines(
            image,
            pf.reshape(-1, 2),
            jnp.roll(pf, 1, axis=1).reshape(-1, 2),
            color=ring_color,
            width=2.0,
            **ranges,
        )
        image = draw_lines(
            image,
            jnp.repeat(po, 4, axis=0),
            pf.reshape(-1, 2),
            color=ring_color,
            width=2.0,
            **ranges,
        )
        views.append(np.asarray(image))
    return np.stack(views)
