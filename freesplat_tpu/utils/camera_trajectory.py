"""Camera trajectory generation for validation/video rendering.

Parity targets: ``src/visualization/camera_trajectory/wobble.py`` (image-
plane circular wobble), ``interpolation.py`` (pose slerp + intrinsics
lerp), ``spin.py`` (orbit).  Pure jnp/numpy.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation, Slerp


def generate_wobble_transformation(
    radius: jnp.ndarray,  # (*batch,)
    t: jnp.ndarray,  # (time,)
    num_rotations: int = 1,
    scale_radius_with_t: bool = True,
) -> jnp.ndarray:
    """(*batch, time, 4, 4) image-plane circular offsets."""
    radius = jnp.asarray(radius)[..., None]
    if scale_radius_with_t:
        radius = radius * t
    tx = jnp.sin(2 * jnp.pi * num_rotations * t) * radius
    ty = -jnp.cos(2 * jnp.pi * num_rotations * t) * radius
    eye = jnp.broadcast_to(jnp.eye(4), (*tx.shape, 4, 4))
    tf = eye.at[..., 0, 3].set(tx).at[..., 1, 3].set(ty)
    return tf


def generate_wobble(
    extrinsics: jnp.ndarray,  # (*batch, 4, 4)
    radius: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    tf = generate_wobble_transformation(radius, t)
    return jnp.einsum("...ij,...tjk->...tik", extrinsics, tf)


def interpolate_intrinsics(
    initial: jnp.ndarray, final: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """(3, 3) pair -> (time, 3, 3) linear interpolation."""
    t = jnp.asarray(t)[:, None, None]
    return initial[None] + (final[None] - initial[None]) * t


def interpolate_extrinsics(
    initial: np.ndarray, final: np.ndarray, t: np.ndarray
) -> np.ndarray:
    """(4, 4) c2w pair -> (time, 4, 4): rotation slerp + translation lerp.

    Host-side (scipy Slerp), like the reference's R-based interpolation.
    """
    initial = np.asarray(initial)
    final = np.asarray(final)
    t = np.asarray(t)
    rots = Rotation.from_matrix(np.stack([initial[:3, :3], final[:3, :3]]))
    slerp = Slerp([0.0, 1.0], rots)
    r_interp = slerp(np.clip(t, 0.0, 1.0)).as_matrix()
    trans = initial[:3, 3][None] + (final[:3, 3] - initial[:3, 3])[None] * t[:, None]
    out = np.tile(np.eye(4, dtype=np.float32), (len(t), 1, 1))
    out[:, :3, :3] = r_interp
    out[:, :3, 3] = trans
    return out


def generate_spin(
    num_frames: int,
    elevation_deg: float,
    radius: float,
) -> np.ndarray:
    """(time, 4, 4) c2w orbit around the origin (spin.py equivalent)."""
    t = np.linspace(0, 2 * np.pi, num_frames, endpoint=False)
    elev = np.deg2rad(elevation_deg)
    eye = np.stack(
        [
            radius * np.cos(elev) * np.sin(t),
            -radius * np.sin(elev) * np.ones_like(t),
            -radius * np.cos(elev) * np.cos(t),
        ],
        axis=-1,
    )
    out = []
    for pos in eye:
        fwd = -pos / np.linalg.norm(pos)  # look at origin (OpenCV +z fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        e = np.eye(4, dtype=np.float32)
        e[:3, 0] = right
        e[:3, 1] = down
        e[:3, 2] = fwd
        e[:3, 3] = pos
        out.append(e)
    return np.stack(out)
