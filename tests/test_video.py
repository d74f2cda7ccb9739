"""Trajectory video rendering test (jnp reference rasterizer path)."""
import numpy as np
import jax.numpy as jnp

from freesplat_tpu.evaluation.video import (
    render_video_interpolation,
    render_video_wobble,
)
from freesplat_tpu.models.decoder import DecoderCfg
from freesplat_tpu.models.types import Gaussians
from freesplat_tpu.ops.gaussians import build_covariance


def make_batched_gaussians(n=40, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        rng.uniform([-1, -1, 2], [1, 1, 6], size=(n, 3)), jnp.float32
    )
    cov = build_covariance(
        jnp.full((n, 3), 0.2), jnp.tile(jnp.array([0, 0, 0, 1.0]), (n, 1))
    )
    harm = jnp.asarray(rng.normal(size=(n, 3, 1)) * 0.5, jnp.float32)
    opac = jnp.full((n,), 0.9)
    return Gaussians(means[None], cov[None], harm[None], opac[None])


def test_wobble_and_interpolation_videos(tmp_path):
    g = make_batched_gaussians()
    extr = jnp.stack([jnp.eye(4), jnp.eye(4).at[0, 3].set(0.4)])
    intr = jnp.tile(
        jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32),
        (2, 1, 1),
    )
    cfg = DecoderCfg(sh_degree=0, use_reference_rasterizer=True)
    frames = render_video_wobble(
        cfg, g, extr, intr, 0.5, 15.0, (24, 32),
        tmp_path / "wobble.gif", num_frames=4,
    )
    assert frames.shape == (4, 24, 32, 3)
    assert np.isfinite(frames).all()
    assert (tmp_path / "wobble.gif").exists()

    frames2 = render_video_interpolation(
        cfg, g, extr, intr, 0.5, 15.0, (24, 32),
        tmp_path / "interp.gif", num_frames=4,
    )
    assert frames2.shape == (4, 24, 32, 3)
    # Endpoint frames differ (cameras moved).
    assert np.abs(frames2[0] - frames2[-1]).max() > 0.01
