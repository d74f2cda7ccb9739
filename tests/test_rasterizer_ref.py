"""Tests for the pure-jnp reference rasterizer against analytic cases.

These match the behavioral spec of the CUDA rasterizer (alpha cut 1/255,
alpha clamp 0.99, early termination at T < 1e-4, EWA 0.3 dilation).
"""
import jax
import jax.numpy as jnp
import numpy as np

from freesplat_tpu.ops.gaussians import build_covariance
from freesplat_tpu.ops.rendering import preprocess_gaussians
from freesplat_tpu.ops.rasterizer_ref import render_reference

H, W = 32, 48


def make_camera(fx=1.0, fy=1.0):
    intr = jnp.array([[fx, 0, 0.5], [0, fy, 0.5], [0, 0, 1]], dtype=jnp.float32)
    extr = jnp.eye(4, dtype=jnp.float32)
    return extr, intr


def single_gaussian(z=3.0, scale=0.15, opacity=0.9, color=(1.0, 0.2, 0.1)):
    means = jnp.array([[0.0, 0.0, z]], dtype=jnp.float32)
    cov = build_covariance(
        jnp.array([[scale, scale, scale]]), jnp.array([[0.0, 0.0, 0.0, 1.0]])
    )
    sh0 = (jnp.array([color], dtype=jnp.float32) - 0.5) / 0.28209479177387814
    harmonics = sh0[..., None]  # (1, 3, 1) DC only
    opac = jnp.array([opacity], dtype=jnp.float32)
    return means, cov, harmonics, opac


def test_preprocess_center_projection():
    extr, intr = make_camera()
    means, cov, harm, opac = single_gaussian()
    scr = preprocess_gaussians(means, cov, harm, opac, extr, intr, (H, W), 0)
    # Center of image in the CUDA pixel convention: ((0+1)*W-1)/2
    np.testing.assert_allclose(
        np.asarray(scr.means2d[0]), [(W - 1) / 2, (H - 1) / 2], atol=1e-4
    )
    assert float(scr.depths[0]) == 3.0
    assert bool(scr.mask[0])
    assert float(scr.radii[0]) > 0


def test_preprocess_culls_behind_camera():
    extr, intr = make_camera()
    means, cov, harm, opac = single_gaussian(z=-1.0)
    scr = preprocess_gaussians(means, cov, harm, opac, extr, intr, (H, W), 0)
    assert not bool(scr.mask[0])
    assert float(scr.radii[0]) == 0.0


def test_render_single_gaussian_peak_and_falloff():
    extr, intr = make_camera()
    means, cov, harm, opac = single_gaussian(color=(0.9, 0.1, 0.3), opacity=0.8)
    bg = jnp.zeros(3)
    color, depth, alpha = render_reference(
        means, cov, harm, opac, extr, intr, (H, W), bg, 0
    )
    c = np.asarray(color)
    a = np.asarray(alpha)
    cy, cx = H // 2, W // 2
    # Peak at center, close to opacity * color.
    assert a[cy, cx] > 0.75
    np.testing.assert_allclose(
        c[cy, cx], a[cy, cx] * np.array([0.9, 0.1, 0.3]), atol=2e-2
    )
    # Monotonic falloff away from the center.
    assert a[cy, cx] > a[cy, cx + 5] > a[cy, cx + 10]
    # Depth accumulates expected z (normalized by alpha = 3).
    np.testing.assert_allclose(
        np.asarray(depth)[cy, cx] / a[cy, cx], 3.0, atol=1e-3
    )


def test_render_background():
    extr, intr = make_camera()
    means, cov, harm, opac = single_gaussian(opacity=0.5)
    bg = jnp.array([0.2, 0.4, 0.6])
    color, _, alpha = render_reference(
        means, cov, harm, opac, extr, intr, (H, W), bg, 0
    )
    # A corner pixel is pure background.
    np.testing.assert_allclose(np.asarray(color)[0, 0], [0.2, 0.4, 0.6], atol=1e-3)
    assert float(alpha[0, 0]) < 1e-3


def test_render_depth_ordering():
    """A front red Gaussian occludes a back blue one regardless of input order."""
    extr, intr = make_camera()
    m1, c1, h1, o1 = single_gaussian(z=2.0, opacity=0.95, color=(1, 0, 0))
    m2, c2, h2, o2 = single_gaussian(z=6.0, opacity=0.95, color=(0, 0, 1))
    bg = jnp.zeros(3)

    def render(order):
        idx = list(order)
        means = jnp.concatenate([m1, m2])[jnp.array(idx)]
        covs = jnp.concatenate([c1, c2])[jnp.array(idx)]
        harm = jnp.concatenate([h1, h2])[jnp.array(idx)]
        opac = jnp.concatenate([o1, o2])[jnp.array(idx)]
        return render_reference(means, covs, harm, opac, extr, intr, (H, W), bg, 0)

    color_a, _, _ = render([0, 1])
    color_b, _, _ = render([1, 0])
    np.testing.assert_allclose(np.asarray(color_a), np.asarray(color_b), atol=1e-6)
    cy, cx = H // 2, W // 2
    c = np.asarray(color_a)[cy, cx]
    assert c[0] > 0.85  # red dominates
    assert c[2] < 0.1


def test_render_gradients_finite_and_nonzero():
    extr, intr = make_camera()
    means, cov, harm, opac = single_gaussian()
    bg = jnp.zeros(3)

    def loss(means, cov, harm, opac):
        color, _, _ = render_reference(
            means, cov, harm, opac, extr, intr, (H, W), bg, 0
        )
        return jnp.sum(color**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, cov, harm, opac)
    for g in grads:
        arr = np.asarray(g)
        assert np.all(np.isfinite(arr))
        assert np.abs(arr).max() > 0


def test_render_opacity_gradient_direction():
    """Increasing opacity should increase rendered intensity at the peak."""
    extr, intr = make_camera()
    means, cov, harm, _ = single_gaussian(color=(1.0, 1.0, 1.0))
    bg = jnp.zeros(3)

    def peak(opac):
        color, _, _ = render_reference(
            means, cov, harm, opac, extr, intr, (H, W), bg, 0
        )
        return color[H // 2, W // 2, 0]

    g = jax.grad(lambda o: peak(o))(jnp.array([0.5], dtype=jnp.float32))
    assert float(g[0]) > 0


def test_render_many_random_gaussians_finite():
    rng = np.random.default_rng(0)
    n = 200
    extr, intr = make_camera()
    means = jnp.asarray(
        rng.uniform([-2, -2, 1.0], [2, 2, 8.0], size=(n, 3)), dtype=jnp.float32
    )
    scales = jnp.asarray(rng.uniform(0.02, 0.3, size=(n, 3)), dtype=jnp.float32)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    cov = build_covariance(scales, jnp.asarray(quats, dtype=jnp.float32))
    harm = jnp.asarray(rng.normal(size=(n, 3, 4)) * 0.3, dtype=jnp.float32)
    opac = jnp.asarray(rng.uniform(0.1, 1.0, size=n), dtype=jnp.float32)
    bg = jnp.array([1.0, 1.0, 1.0])
    color, depth, alpha = render_reference(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1
    )
    assert np.all(np.isfinite(np.asarray(color)))
    assert np.all(np.isfinite(np.asarray(depth)))
    assert 0 <= float(alpha.min()) and float(alpha.max()) <= 1.0 + 1e-5
