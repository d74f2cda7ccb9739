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
