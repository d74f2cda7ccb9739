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


def test_visualize_epipolar_samples_panel(tmp_path):
    """Epipolar ray/sample panel (reference
    encoder_visualizer_epipolar.py:348-437): deterministic under a seed,
    draws on both views, and marks pixels (differs from the plain image)."""
    from freesplat_tpu.utils.encoder_visualizer import (
        visualize_epipolar_samples,
    )

    rng = np.random.default_rng(2)
    v, h, w = 3, 48, 64
    extr = np.tile(np.eye(4, dtype=np.float32), (1, v, 1, 1))
    for i in range(v):
        extr[0, i, 0, 3] = 0.3 * i
    intr = np.tile(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (1, v, 1, 1),
    )
    context = {
        "image": rng.uniform(size=(1, v, h, w, 3)).astype(np.float32),
        "extrinsics": extr,
        "intrinsics": intr,
        "near": np.full((1, v), 0.5, np.float32),
        "far": np.full((1, v), 15.0, np.float32),
    }
    panel = visualize_epipolar_samples(context, num_rays=4, num_samples=8,
                                       seed=3)
    assert panel.ndim == 3 and panel.shape[-1] == 3
    assert np.isfinite(panel).all()
    again = visualize_epipolar_samples(context, num_rays=4, num_samples=8,
                                       seed=3)
    np.testing.assert_array_equal(panel, again)
    # the drawing actually changed pixels vs a panel of the raw images
    assert panel.std() > 0 and panel.shape[1] > 2 * w
