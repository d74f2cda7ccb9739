"""Trajectory video rendering (reference ``model_wrapper.py:654-819``:
wobble + context-interpolation videos logged during validation/test).
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..models.decoder import DecoderCfg, render_views
from ..models.types import Gaussians
from ..utils.camera_trajectory import (
    generate_wobble,
    interpolate_extrinsics,
    interpolate_intrinsics,
)
from ..utils.visualization import save_video


def render_trajectory(
    decoder_cfg: DecoderCfg,
    gaussians: Gaussians,  # batched (1, g, ...)
    extrinsics: jnp.ndarray,  # (t, 4, 4)
    intrinsics: jnp.ndarray,  # (t, 3, 3)
    near: float,
    far: float,
    image_shape: tuple[int, int],
    chunk: int = 10,
) -> np.ndarray:
    """Render a camera path -> (t, h, w, 3) frames."""
    t = extrinsics.shape[0]
    frames = []
    for s in range(0, t, chunk):
        sl = slice(s, min(s + chunk, t))
        nv = extrinsics[sl].shape[0]
        out = render_views(
            decoder_cfg,
            gaussians,
            extrinsics[None, sl],
            intrinsics[None, sl],
            jnp.full((1, nv), near),
            jnp.full((1, nv), far),
            image_shape,
        )
        frames.append(np.asarray(out.color[0]))
    return np.concatenate(frames)


def render_video_wobble(
    decoder_cfg: DecoderCfg,
    gaussians: Gaussians,
    context_extrinsics: jnp.ndarray,  # (v, 4, 4)
    context_intrinsics: jnp.ndarray,  # (v, 3, 3)
    near: float,
    far: float,
    image_shape: tuple[int, int],
    path: str | Path,
    num_frames: int = 30,
) -> np.ndarray:
    """Circular wobble around the first context pose (mw:666-703)."""
    delta = (
        jnp.linalg.norm(
            context_extrinsics[0, :3, 3] - context_extrinsics[-1, :3, 3]
        )
        + 1e-3
    )
    t = jnp.linspace(0.0, 1.0, num_frames)
    extr = generate_wobble(context_extrinsics[0], delta * 0.25, t)
    intr = jnp.tile(context_intrinsics[0][None], (num_frames, 1, 1))
    frames = render_trajectory(
        decoder_cfg, gaussians, extr, intr, near, far, image_shape
    )
    save_video(list(frames), path)
    return frames


def render_video_interpolation(
    decoder_cfg: DecoderCfg,
    gaussians: Gaussians,
    context_extrinsics: jnp.ndarray,  # (v, 4, 4)
    context_intrinsics: jnp.ndarray,
    near: float,
    far: float,
    image_shape: tuple[int, int],
    path: str | Path,
    num_frames: int = 30,
) -> np.ndarray:
    """Smooth path from the first to the last context view (mw:705-747)."""
    t = np.linspace(0.0, 1.0, num_frames)
    extr = jnp.asarray(
        interpolate_extrinsics(
            np.asarray(context_extrinsics[0]),
            np.asarray(context_extrinsics[-1]),
            t,
        )
    )
    intr = interpolate_intrinsics(
        context_intrinsics[0], context_intrinsics[-1], jnp.asarray(t)
    )
    frames = render_trajectory(
        decoder_cfg, gaussians, extr, intr, near, far, image_shape
    )
    save_video(list(frames), path)
    return frames
