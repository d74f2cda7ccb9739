"""Epipolar line sampler (legacy pixelSplat stack, visualizer-only).

Behavioral parity target: ``src/model/encoder/epipolar/epipolar_sampler.py``
— for every (view, other-view) pair, cast a pixel-grid of rays from the
first view, project each ray into the other view as an image-space segment
(clipped by near/far and the frame), place ``num_samples`` evenly spaced
samples along the segment (at fractional depths (s + 0.5)/S, ``:80-88``),
and bilinearly sample the other view's feature map there.  Rays whose
segment misses the frame are zeroed and flagged invalid (``:111-112``).

Marked "exclude from core build, keep as optional" in SURVEY §2.2 — no
runtime caller in FreeSplat; provided for visualization / pixelSplat-style
extensions.  Pure function of its inputs (no parameters), so it is a plain
class rather than a flax module.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..geometry.epipolar import project_rays
from ..geometry.pairings import (
    generate_heterogeneous_index,
    generate_heterogeneous_index_transpose,
)
from ..geometry.projection import get_world_rays, sample_image_grid
from ..ops.grid_sample import bilinear_sample


class EpipolarSampling(NamedTuple):
    features: jnp.ndarray  # (b, v, ov, r, s, c)
    valid: jnp.ndarray  # (b, v, ov, r) bool
    xy_ray: jnp.ndarray  # (b, v, r, 2) normalized xy of the casting pixel
    xy_sample: jnp.ndarray  # (b, v, ov, r, s, 2)
    xy_sample_near: jnp.ndarray  # (b, v, ov, r, s, 2)
    xy_sample_far: jnp.ndarray  # (b, v, ov, r, s, 2)
    origins: jnp.ndarray  # (b, v, r, 3)
    directions: jnp.ndarray  # (b, v, r, 3)


class EpipolarSampler:
    """Samples features along epipolar lines in paired views."""

    def __init__(self, num_views: int, num_samples: int):
        self.num_samples = num_samples
        _, index_v = generate_heterogeneous_index(num_views)
        t_v, t_ov = generate_heterogeneous_index_transpose(num_views)
        self.index_v = jnp.asarray(index_v)
        self.transpose_v = jnp.asarray(t_v)
        self.transpose_ov = jnp.asarray(t_ov)

    def collect(self, target: jnp.ndarray) -> jnp.ndarray:
        """(b, v, ...) -> (b, v, ov, ...): each view's paired other-views."""
        return target[:, self.index_v]

    def transpose(self, x: jnp.ndarray) -> jnp.ndarray:
        """Swap ray-casting view for sampled view on (b, v, ov, ...)."""
        return x[:, self.transpose_v, self.transpose_ov]

    def __call__(
        self,
        images: jnp.ndarray,  # (b, v, h, w, c) NHWC
        extrinsics: jnp.ndarray,  # (b, v, 4, 4)
        intrinsics: jnp.ndarray,  # (b, v, 3, 3) normalized
        near: jnp.ndarray,  # (b, v)
        far: jnp.ndarray,  # (b, v)
    ) -> EpipolarSampling:
        b, v, h, w, c = images.shape
        s = self.num_samples

        # Pixel-grid rays in world space.
        xy, _ = sample_image_grid((h, w))
        xy = xy.reshape(-1, 2)  # (r, 2)
        origins, directions = get_world_rays(
            xy, extrinsics[:, :, None], intrinsics[:, :, None]
        )  # (b, v, r, 3)

        proj = project_rays(
            origins[:, :, None],  # (b, v, 1, r, 3)
            directions[:, :, None],
            self.collect(extrinsics)[:, :, :, None],  # (b, v, ov, 1, 4, 4)
            self.collect(intrinsics)[:, :, :, None],
            near[:, :, None, None],
            far[:, :, None, None],
        )

        # Evenly spaced fractions along each ray's visible segment.
        frac = ((jnp.arange(s) + 0.5) / s)[:, None]  # (s, 1)
        ok = proj.overlaps_image[..., None]  # (b, v, ov, r, 1)
        xy_min = jnp.nan_to_num(proj.xy_min, posinf=0.0, neginf=0.0) * ok
        xy_max = jnp.nan_to_num(proj.xy_max, posinf=0.0, neginf=0.0) * ok
        span = xy_max[..., None, :] - xy_min[..., None, :]
        xy_sample = xy_min[..., None, :] + frac * span  # (b, v, ov, r, s, 2)

        # Sample the *other* view's features: transpose so the view axis is
        # the sampled view, gather, transpose back.
        samples_xy = self.transpose(xy_sample)
        pix = samples_xy * jnp.array([w, h], samples_xy.dtype)
        ov = pix.shape[2]
        sampled = bilinear_sample(
            images.reshape(b * v, h, w, c),
            pix.reshape(b * v, ov * pix.shape[3] * s, 2),
        ).reshape(b, v, ov, -1, s, c)
        sampled = self.transpose(sampled)
        sampled = sampled * ok[..., None]

        half = 0.5 / s
        return EpipolarSampling(
            features=sampled,
            valid=proj.overlaps_image,
            xy_ray=jnp.broadcast_to(xy, (b, v, h * w, 2)),
            xy_sample=xy_sample,
            xy_sample_near=xy_min[..., None, :] + (frac - half) * span,
            xy_sample_far=xy_min[..., None, :] + (frac + half) * span,
            origins=origins,
            directions=directions,
        )
