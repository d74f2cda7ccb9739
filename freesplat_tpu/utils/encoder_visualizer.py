"""Encoder visualization summaries (reference
``src/model/encoder/visualization/encoder_visualizer_epipolar.py:177-275``:
``visualize_depth`` and ``visualize_gaussians``) adapted to this repo's
encoder outputs: per-pixel Gaussians in NHWC with a validity mask instead
of ragged per-view lists.

Pure host-side numpy/matplotlib composition on top of the layout +
colormap utilities; returns (h, w, 3) float images for the LocalLogger.
"""
from __future__ import annotations

import numpy as np

from .visualization import (
    add_border,
    add_label,
    apply_color_map,
    hcat,
    vcat,
)


def visualize_depth(
    context: dict, depth: np.ndarray
) -> np.ndarray:
    """Relative-depth + relative-disparity turbo panels per view.

    context: dict with near/far (b, v); depth: (b, v, h, w) predicted.
    Uses scene 0 (the reference samples a random batch element; eval here
    is b=1 anyway).
    """
    depth = np.asarray(depth)[0]
    near = float(np.asarray(context["near"]).flat[0])
    far = float(np.asarray(context["far"]).flat[0])
    rel_depth = np.clip((depth - near) / (far - near), 0.0, 1.0)
    rel_disp = np.clip(
        1.0 - (1.0 / np.maximum(depth, 1e-6) - 1.0 / far)
        / (1.0 / near - 1.0 / far),
        0.0,
        1.0,
    )
    depth_row = hcat(*[apply_color_map(d, "turbo") for d in rel_depth])
    disp_row = hcat(*[apply_color_map(d, "turbo") for d in rel_disp])
    return add_border(
        hcat(
            add_label(depth_row, "Depth"),
            add_label(disp_row, "Disparity"),
        )
    )


def visualize_gaussians(
    context_images: np.ndarray,  # (b, v, h, w, 3)
    opacities: np.ndarray,  # (b, g) with g = v*h*w (pre-fusion order)
    covariances: np.ndarray,  # (b, g, 3, 3)
    colors: np.ndarray,  # (b, g, 3) DC colors
) -> np.ndarray:
    """Context / opacity / color / covariance-determinant panels
    (reference :243-275), per-pixel Gaussians reshaped back to view grids."""
    imgs = np.asarray(context_images)[0]
    v, h, w, _ = imgs.shape
    op = np.asarray(opacities)[0].reshape(v, h, w)
    col = np.asarray(colors)[0].reshape(v, h, w, 3)
    det = np.linalg.det(np.asarray(covariances)[0].astype(np.float64))
    det = (det / max(det.max(), 1e-30)).reshape(v, h, w)

    def gray(x):
        return np.repeat(np.clip(x, 0.0, 1.0)[..., None], 3, axis=-1)

    return add_border(
        hcat(
            add_label(vcat(*list(imgs)), "Context"),
            add_label(vcat(*[gray(o) for o in op]), "Opacities"),
            add_label(
                vcat(*[np.clip(c * o[..., None], 0, 1)
                       for c, o in zip(col, op)]),
                "Colors",
            ),
            add_label(vcat(*[np.clip(c, 0, 1) for c in col]), "Colors (Raw)"),
            add_label(
                vcat(*[apply_color_map(d, "inferno") for d in det]),
                "Determinant",
            ),
        )
    )


def visualize_epipolar_samples(
    context: dict,
    num_rays: int = 8,
    num_samples: int = 24,
    seed: int = 0,
) -> np.ndarray:
    """Ray-view / sample-view epipolar panel (reference
    ``encoder_visualizer_epipolar.py:348-437``): a handful of pixels in a
    chosen view are marked with distinct colors; in a paired view their
    epipolar lines are drawn in black with the evenly spaced sample
    points overlaid, bucket-alternating segment shading included.

    The reference picks the (view, other-view, rays) triple with
    ``randrange``/``np.random``; validation dumps want reproducibility,
    so a seeded generator replaces that.  Runs the legacy
    ``EpipolarSampler`` on the fly — sampling is geometry-only and cheap
    at visualization cadence.
    """
    import jax.numpy as jnp

    from ..models.epipolar_sampler import EpipolarSampler
    from .drawing import draw_lines, draw_points
    from .visualization import get_distinct_color

    images = np.asarray(context["image"])
    b, v, h, w, _ = images.shape
    sampler = EpipolarSampler(num_views=v, num_samples=num_samples)
    sampling = sampler(
        jnp.asarray(images),
        jnp.asarray(context["extrinsics"]),
        jnp.asarray(context["intrinsics"]),
        jnp.asarray(context["near"]),
        jnp.asarray(context["far"]),
    )

    rng = np.random.default_rng(seed)
    rb = int(rng.integers(b))
    rv = int(rng.integers(v))
    ov = sampling.xy_sample.shape[2]
    rov = int(rng.integers(ov))
    r = sampling.xy_ray.shape[2]
    # Prefer rays whose epipolar segment actually overlaps the other
    # view (the reference draws invalid rays as zero-length stubs).
    valid = np.asarray(sampling.valid[rb, :, rov])[rv]
    pool = np.flatnonzero(valid)
    if pool.size == 0:
        pool = np.arange(r)
    rr = rng.choice(pool, size=min(num_rays, pool.size), replace=False)
    colors = [get_distinct_color(i) for i in range(len(rr))]

    rng01 = dict(x_range=(0, 1), y_range=(0, 1))
    ray_view = draw_points(
        images[rb, rv], np.asarray(sampling.xy_ray[rb, rv, rr]),
        (0.0, 0.0, 0.0), radius=4, **rng01,
    )
    ray_view = draw_points(
        ray_view, np.asarray(sampling.xy_ray[rb, rv, rr]), colors,
        radius=3, **rng01,
    )

    other = int(np.asarray(sampler.index_v)[rv, rov])
    near_pts = np.asarray(sampling.xy_sample_near[rb, rv, rov, rr])
    far_pts = np.asarray(sampling.xy_sample_far[rb, rv, rov, rr])
    samples = np.asarray(sampling.xy_sample[rb, rv, rov, rr])
    s = samples.shape[1]

    # Black epipolar line per ray, then alternating black/white bucket
    # segments, then the colored sample dots (reference :384-433).
    sample_view = draw_lines(
        images[rb, other], near_pts[:, 0], far_pts[:, -1],
        (0.0, 0.0, 0.0), width=5, cap="butt", **rng01,
    )
    bucket = np.tile([0.0, 1.0], (s + 1) // 2)[:s]
    seg_colors = np.repeat(bucket, 3).reshape(s, 3)[None].repeat(
        len(rr), axis=0
    ).reshape(-1, 3)
    sample_view = draw_lines(
        sample_view, near_pts.reshape(-1, 2), far_pts.reshape(-1, 2),
        seg_colors, width=3, cap="butt", **rng01,
    )
    sample_view = draw_points(
        sample_view, samples.reshape(-1, 2), (0.0, 0.0, 0.0), radius=4,
        **rng01,
    )
    dot_colors = np.asarray(
        [colors[i // s] for i in range(len(rr) * s)], np.float32
    )
    sample_view = draw_points(
        sample_view, samples.reshape(-1, 2), dot_colors, radius=3, **rng01,
    )

    return add_border(
        hcat(
            add_label(np.asarray(ray_view), "Ray View"),
            add_label(np.asarray(sample_view), "Sample View"),
        )
    )
