"""Encoder visualization summaries (reference
encoder_visualizer_epipolar.py:177-275 analogs)."""
import numpy as np

from freesplat_tpu.utils.encoder_visualizer import (
    visualize_depth,
    visualize_gaussians,
)


def test_visualize_depth_panels():
    rng = np.random.default_rng(0)
    context = {
        "near": np.full((1, 2), 0.5, np.float32),
        "far": np.full((1, 2), 15.0, np.float32),
    }
    depth = rng.uniform(0.5, 15.0, size=(1, 2, 16, 24)).astype(np.float32)
    panel = visualize_depth(context, depth)
    assert panel.ndim == 3 and panel.shape[-1] == 3
    assert np.isfinite(panel).all()
    assert panel.max() <= 1.0 + 1e-6 and panel.min() >= 0.0


def test_visualize_gaussians_panels():
    rng = np.random.default_rng(1)
    v, h, w = 2, 8, 12
    g = v * h * w
    imgs = rng.uniform(size=(1, v, h, w, 3)).astype(np.float32)
    op = rng.uniform(size=(1, g)).astype(np.float32)
    cov = np.tile(np.eye(3, dtype=np.float32) * 0.01, (1, g, 1, 1))
    col = rng.uniform(size=(1, g, 3)).astype(np.float32)
    panel = visualize_gaussians(imgs, op, cov, col)
    assert panel.ndim == 3 and panel.shape[-1] == 3
    assert np.isfinite(panel).all()
    # Five labeled columns: wider than a single view column.
    assert panel.shape[1] > 5 * w
