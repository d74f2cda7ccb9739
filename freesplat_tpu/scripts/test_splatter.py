"""Rasterizer smoke script: render an analytic Gaussian on a spin path.

Parity target: ``src/scripts/test_splatter.py:21-101`` — the reference's
manual golden test for projection + SH conventions: one anisotropic
Gaussian with known SH coefficients rendered along an orbit, frames
written to disk for visual inspection.

Run: ``python -m freesplat_tpu.scripts.test_splatter [out_dir]``
"""
from __future__ import annotations

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..models.types import Gaussians
from ..ops.gaussians import build_covariance
from ..ops.rasterizer_ref import render_reference
from ..utils.camera_trajectory import generate_spin
from ..utils.visualization import save_video


def main(out_dir: str = "outputs/test_splatter", num_frames: int = 24) -> None:
    # One anisotropic Gaussian at the origin with a strong degree-1 SH
    # (view-dependent color) — exactly the reference's analytic probe.
    means = jnp.zeros((1, 3))
    cov = build_covariance(
        jnp.array([[0.8, 0.3, 0.3]]),
        jnp.array([[0.0, 0.0, 0.38268343, 0.92387953]]),  # 45 deg about z
    )
    d_sh = 4
    harmonics = jnp.zeros((1, 3, d_sh))
    harmonics = harmonics.at[0, 0, 0].set(1.0)  # red DC
    harmonics = harmonics.at[0, 1, 3].set(1.5)  # green varies with -x dir
    harmonics = harmonics.at[0, 2, 1].set(1.5)  # blue varies with -y dir
    opac = jnp.array([0.9])
    g = Gaussians(means, cov, harmonics, opac)

    intr = jnp.array([[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], jnp.float32)
    traj = generate_spin(num_frames, elevation_deg=15.0, radius=4.0)

    frames = []
    for extr in traj:
        color, _, _ = render_reference(
            g.means, g.covariances, g.harmonics, g.opacities,
            jnp.asarray(extr), intr, (128, 128), jnp.zeros(3), 1,
        )
        frames.append(np.asarray(jnp.clip(color, 0, 1)))

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    for i, f in enumerate(frames):
        Image.fromarray((f * 255).astype(np.uint8)).save(out / f"{i:03}.png")
    save_video(frames, out / "spin.gif", fps=12)
    print(f"wrote {len(frames)} frames + spin.gif to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
