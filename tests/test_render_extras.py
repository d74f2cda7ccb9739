"""Tests for orthographic + depth rendering modes and the metric computer."""
import numpy as np
import jax.numpy as jnp
from PIL import Image

from freesplat_tpu.models.render_extras import (
    depth_to_relative_disparity,
    render_depth,
    render_orthographic,
)
from freesplat_tpu.models.types import Gaussians
from freesplat_tpu.ops.gaussians import build_covariance


def make_gaussians(n=50, seed=0, z=(2.0, 6.0)):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        rng.uniform([-1, -1, z[0]], [1, 1, z[1]], size=(n, 3)), jnp.float32
    )
    cov = build_covariance(
        jnp.full((n, 3), 0.15), jnp.tile(jnp.array([0, 0, 0, 1.0]), (n, 1))
    )
    harm = jnp.asarray(rng.normal(size=(n, 3, 1)) * 0.5, jnp.float32)
    opac = jnp.full((n,), 0.9)
    return Gaussians(means, cov, harm, opac)


def test_relative_disparity_endpoints():
    near, far = jnp.asarray(1.0), jnp.asarray(10.0)
    assert float(depth_to_relative_disparity(near, near, far)) == 0.0
    assert float(depth_to_relative_disparity(far, near, far)) == 1.0


def test_orthographic_render():
    g = make_gaussians()
    img = render_orthographic(
        g, jnp.eye(4), width=3.0, height=3.0, near=0.1, far=20.0,
        image_shape=(32, 32), background=jnp.array([0.3, 0.3, 0.3]),
        sh_degree=0, use_pallas=False,
    )
    arr = np.asarray(img)
    assert arr.shape == (32, 32, 3)
    assert np.isfinite(arr).all()
    # Something rendered (not pure background everywhere).
    assert np.abs(arr - 0.3).max() > 0.05


def test_render_projections():
    """3 axis-aligned orthographic views of the scene, all finite, with
    signal in each (reference validation_in_3d.py render_projections)."""
    from freesplat_tpu.models.render_extras import render_projections

    g = make_gaussians(n=120)
    proj = np.asarray(render_projections(g, resolution=64, use_pallas=False))
    assert proj.shape == (3, 64, 64, 3)
    assert np.isfinite(proj).all()
    for i in range(3):
        assert proj[i].std() > 1e-3  # each axis view actually sees the cloud


def test_render_depth_modes():
    g = make_gaussians()
    extr = jnp.eye(4)
    intr = jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32)
    for mode in ("depth", "disparity", "relative_disparity", "log"):
        d = render_depth(
            g, extr, intr, jnp.asarray(0.5), jnp.asarray(15.0), (32, 32),
            mode=mode, use_pallas=False,
        )
        arr = np.asarray(d)
        assert arr.shape == (32, 32)
        assert np.isfinite(arr).all()
    # depth mode: center values within the z range of the cloud.
    d = np.asarray(
        render_depth(
            g, extr, intr, jnp.asarray(0.5), jnp.asarray(15.0), (32, 32),
            use_pallas=False,
        )
    )
    covered = d > 0.5
    assert covered.any()
    assert d[covered].max() < 7.0


def test_metric_computer(tmp_path):
    from freesplat_tpu.evaluation.metric_computer import (
        MethodCfg,
        MetricComputerCfg,
        run_metric_computer,
    )

    rng = np.random.default_rng(0)
    for method, noise in (("ours", 0.02), ("baseline", 0.2)):
        scene_dir = tmp_path / method / "scene_a" / "color"
        scene_dir.mkdir(parents=True)
        for i in range(3):
            gt = rng.uniform(size=(16, 16, 3))
            pred = np.clip(gt + rng.normal(size=gt.shape) * noise, 0, 1)
            Image.fromarray((gt * 255).astype(np.uint8)).save(
                scene_dir / f"{i:04}_gt.png"
            )
            Image.fromarray((pred * 255).astype(np.uint8)).save(
                scene_dir / f"{i:04}.png"
            )
    table = run_metric_computer(
        MetricComputerCfg(
            methods=(
                MethodCfg("ours", "ours", str(tmp_path)),
                MethodCfg("baseline", "baseline", str(tmp_path)),
            ),
            output_path=str(tmp_path / "out"),
        )
    )
    assert table["ours"]["psnr"] > table["baseline"]["psnr"]
    assert (tmp_path / "out" / "metrics.json").exists()
