"""Parity tests: Pallas tile rasterizer vs the jnp reference rasterizer.

Runs in Pallas interpret mode on CPU (the same kernel code path compiles
for TPU); checks forward renders and input gradients allclose.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesplat_tpu.ops.gaussians import build_covariance
from freesplat_tpu.ops.rasterizer import rasterize
from freesplat_tpu.ops.rasterizer_ref import render_reference

H, W = 64, 96  # 2 x 3 tiles


def make_scene(n=150, seed=0, z_range=(1.0, 8.0), spread=2.0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        rng.uniform(
            [-spread, -spread, z_range[0]], [spread, spread, z_range[1]], size=(n, 3)
        ),
        dtype=jnp.float32,
    )
    scales = jnp.asarray(rng.uniform(0.03, 0.35, size=(n, 3)), dtype=jnp.float32)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    cov = build_covariance(scales, jnp.asarray(quats, dtype=jnp.float32))
    harm = jnp.asarray(rng.normal(size=(n, 3, 4)) * 0.4, dtype=jnp.float32)
    opac = jnp.asarray(rng.uniform(0.1, 1.0, size=n), dtype=jnp.float32)
    extr = jnp.eye(4, dtype=jnp.float32)
    intr = jnp.array([[1.1, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], dtype=jnp.float32)
    return means, cov, harm, opac, extr, intr


def test_forward_fuzz_degenerate_scenes():
    """Seeded fuzz over stressing regimes: grazing depths near the z
    cull, extreme anisotropy, near-opaque walls, tiny scenes — forward
    parity with the golden model must hold in all of them."""
    bg = jnp.array([0.3, 0.1, 0.6])
    regimes = [
        dict(n=40, seed=11, z_range=(0.21, 0.5), spread=0.5),  # near cull
        dict(n=60, seed=12, z_range=(1.0, 1.05), spread=3.0),  # depth ties
        dict(n=5, seed=13, z_range=(2.0, 3.0), spread=0.1),    # tiny overlap
        dict(n=200, seed=14, z_range=(0.5, 40.0), spread=6.0), # huge range
    ]
    for kw in regimes:
        means, cov, harm, opac, extr, intr = make_scene(**kw)
        if kw["seed"] == 12:
            # Near-opaque overlapping wall: exercises early termination.
            opac = jnp.full_like(opac, 0.98)
        ref = render_reference(means, cov, harm, opac, extr, intr, (H, W), bg, 1)
        *pal, stats = rasterize(
            means, cov, harm, opac, extr, intr, (H, W), bg, 1,
            capacity=64 * means.shape[0], return_stats=True,
        )
        assert int(stats["dropped"]) == 0, kw  # capacity sized for parity
        for name, a, b in zip("color depth alpha".split(), pal, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5,
                err_msg=f"{kw} {name}",
            )


def test_anisotropic_gaussians_match():
    """Extreme elongated covariances (100:1 axis ratio) stress the EWA
    projection, radius estimate, and tile binning equally in both paths."""
    rng = np.random.default_rng(21)
    n = 50
    means = jnp.asarray(
        rng.uniform([-2, -2, 2.0], [2, 2, 6.0], size=(n, 3)), jnp.float32
    )
    scales = np.full((n, 3), 0.005, np.float32)
    scales[:, 0] = 0.5  # 100:1 needles
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    cov = build_covariance(jnp.asarray(scales), jnp.asarray(quats, jnp.float32))
    harm = jnp.asarray(rng.normal(size=(n, 3, 4)) * 0.4, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 1.0, size=n), jnp.float32)
    extr = jnp.eye(4, dtype=jnp.float32)
    intr = jnp.array([[1.1, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], jnp.float32)
    bg = jnp.zeros(3)
    ref = render_reference(means, cov, harm, opac, extr, intr, (H, W), bg, 1)
    *pal, stats = rasterize(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1,
        capacity=64 * n, return_stats=True,
    )
    assert int(stats["dropped"]) == 0  # needles span many tiles
    for name, a, b in zip("color depth alpha".split(), pal, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name
        )


@pytest.mark.tpu_lane
@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_reference(seed):
    means, cov, harm, opac, extr, intr = make_scene(seed=seed)
    bg = jnp.array([0.1, 0.2, 0.3])
    ref_c, ref_d, ref_a = render_reference(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1
    )
    pal_c, pal_d, pal_a = rasterize(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1
    )
    np.testing.assert_allclose(np.asarray(pal_c), np.asarray(ref_c), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pal_d), np.asarray(ref_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pal_a), np.asarray(ref_a), atol=2e-5)


def test_forward_dense_overlap():
    """Many overlapping gaussians on one spot: exercises early termination."""
    means, cov, harm, opac, extr, intr = make_scene(
        n=300, seed=2, z_range=(2.0, 4.0), spread=0.3
    )
    opac = jnp.full_like(opac, 0.95)
    bg = jnp.zeros(3)
    ref_c, ref_d, _ = render_reference(means, cov, harm, opac, extr, intr, (H, W), bg, 1)
    # Large splats cover many 16px tiles; give the instance buffer headroom
    # (the golden model never drops, so a clamped buffer would diverge).
    pal_c, pal_d, _ = rasterize(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1, capacity=64 * 300
    )
    np.testing.assert_allclose(np.asarray(pal_c), np.asarray(ref_c), atol=5e-5)
    np.testing.assert_allclose(np.asarray(pal_d), np.asarray(ref_d), atol=5e-4)


@pytest.mark.tpu_lane
def test_gradients_match_reference():
    means, cov, harm, opac, extr, intr = make_scene(n=80, seed=3)
    bg = jnp.array([0.3, 0.1, 0.0])
    rng = np.random.default_rng(9)
    target = jnp.asarray(rng.uniform(size=(H, W, 3)), dtype=jnp.float32)

    def loss(render_fn, m, c, h, o):
        color, depth, alpha = render_fn(m, c, h, o, extr, intr, (H, W), bg, 1)
        return jnp.mean((color - target) ** 2) + 1e-3 * jnp.mean(depth) + 1e-3 * jnp.mean(alpha)

    g_ref = jax.grad(lambda *a: loss(render_reference, *a), argnums=(0, 1, 2, 3))(
        means, cov, harm, opac
    )
    g_pal = jax.grad(lambda *a: loss(rasterize, *a), argnums=(0, 1, 2, 3))(
        means, cov, harm, opac
    )
    names = ["means", "cov", "harmonics", "opacities"]
    for name, a, b in zip(names, g_pal, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, atol=2e-4, err_msg=f"grad mismatch: {name}"
        )


def test_empty_tiles_and_culled():
    """Gaussians behind the camera and empty tiles produce background."""
    means, cov, harm, opac, extr, intr = make_scene(n=20, seed=4)
    means = means - jnp.array([0.0, 0.0, 30.0])  # all behind camera
    bg = jnp.array([0.5, 0.6, 0.7])
    color, depth, alpha = rasterize(means, cov, harm, opac, extr, intr, (H, W), bg, 1)
    np.testing.assert_allclose(
        np.asarray(color), np.broadcast_to(np.array([0.5, 0.6, 0.7]), (H, W, 3)),
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), 0.0, atol=1e-6)


def test_capacity_clamp_no_crash():
    """Tiny instance capacity drops instances but never corrupts output."""
    means, cov, harm, opac, extr, intr = make_scene(n=100, seed=5)
    bg = jnp.zeros(3)
    color, _, _ = rasterize(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1, capacity=64
    )
    assert np.all(np.isfinite(np.asarray(color)))


def test_capacity_overflow_is_reported():
    """Truncation is *accounted*, not silent (SURVEY §7 hard part 2)."""
    means, cov, harm, opac, extr, intr = make_scene(n=100, seed=5)
    bg = jnp.zeros(3)
    # Ample capacity: no drops.
    *_, stats = rasterize(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1,
        capacity=16 * 100, return_stats=True,
    )
    assert int(stats["dropped"]) == 0
    assert int(stats["num_instances"]) > 0
    # Starved capacity: the shortfall is reported exactly.
    *_, stats64 = rasterize(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1,
        capacity=64, return_stats=True,
    )
    total = int(stats64["num_instances"])
    expect = max(total - 128, 0)  # capacity rounds up to the 128 chunk
    assert int(stats64["dropped"]) == expect
    assert expect > 0


@pytest.mark.tpu_lane
def test_nonsquare_image_with_partial_tiles():
    """Image size not divisible by the tile size."""
    means, cov, harm, opac, extr, intr = make_scene(n=60, seed=6)
    bg = jnp.array([0.2, 0.2, 0.2])
    shape = (50, 70)
    ref_c, _, _ = render_reference(means, cov, harm, opac, extr, intr, shape, bg, 1)
    pal_c, _, _ = rasterize(means, cov, harm, opac, extr, intr, shape, bg, 1)
    np.testing.assert_allclose(np.asarray(pal_c), np.asarray(ref_c), atol=2e-5)
