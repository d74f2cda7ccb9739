"""Decoder: Gaussians -> rendered target views.

Behavioral parity target: ``DecoderSplattingCUDA`` + ``render_cuda``
(reference ``src/model/decoder/decoder_splatting_cuda.py:20-99``,
``cuda_splatting.py:47-132``): per-view rendering with the scale-invariant
1/near rescaling trick, dataset background color, and the reference's
``depth / 2`` output convention (kept behind ``depth_mode='ref_compat'``;
the default 'depth' mode returns alpha-normalized expected depth, which is
the principled version of the same quantity).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.rasterizer import rasterize
from ..ops.rasterizer_ref import render_reference
from .types import Gaussians


@dataclass(frozen=True)
class DecoderCfg:
    background_color: tuple[float, float, float] = (0.0, 0.0, 0.0)
    scale_invariant: bool = True
    sh_degree: int = 2
    depth_mode: str = "depth"  # 'depth' | 'ref_compat' | 'raw'
    use_reference_rasterizer: bool = False  # jnp golden path (slow)
    # Static instance budget = capacity_factor * num_gaussians (32k floor).
    # 3.0 suits per-pixel train/test scenes; WHOLE-SCENE fused sets
    # (~5.9M Gaussians) need far less per view — each target frustum sees
    # a fraction of the scene, measured peak 0.58x at 30 views — and every
    # capacity-proportional XLA stage (sort/gather/scatter) pays for the
    # static size: 1560 -> 553 ms/view going 3.0 -> 1.0 (PERFORMANCE.md
    # ROUND 5).  Fractional factors are the point of the float type;
    # overrides via test.render_capacity_factor.  Drops are always
    # reported (``DecoderOutput.dropped``), so an undersized budget is
    # loud, not silent.
    capacity_factor: float = 3.0


class DecoderOutput(NamedTuple):
    color: jnp.ndarray  # (b, v, h, w, 3)
    depth: jnp.ndarray  # (b, v, h, w)
    alpha: jnp.ndarray  # (b, v, h, w)
    # (b, v) int32 rasterizer instances silently truncated (capacity /
    # MAX_CHUNKS overflow).  Zero in normal operation; callers should warn
    # and raise ``capacity_factor`` when nonzero.
    dropped: jnp.ndarray | None = None


def render_view(
    cfg: DecoderCfg,
    gaussians: Gaussians,  # unbatched: (g, ...)
    extrinsics: jnp.ndarray,  # (4, 4)
    intrinsics: jnp.ndarray,  # (3, 3) normalized
    near: jnp.ndarray,  # ()
    far: jnp.ndarray,  # ()
    image_shape: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    means = gaussians.means
    covs = gaussians.covariances
    opac = gaussians.masked_opacities()
    background = jnp.asarray(cfg.background_color, jnp.float32)

    if cfg.scale_invariant:
        # Rescale the scene by 1/near so numerics stay in a good range
        # (reference cuda_splatting.py:64-70).
        s = 1.0 / near
        extrinsics = extrinsics.at[:3, 3].multiply(s)
        means = means * s
        covs = covs * (s * s)

    render = render_reference if cfg.use_reference_rasterizer else rasterize
    kwargs = {}
    if not cfg.use_reference_rasterizer:
        # Same 32k floor as rasterize()'s default: small scenes with big
        # splats need absolute headroom, production per-pixel scenes are
        # bounded by the factor (drops are reported either way).
        kwargs["capacity"] = max(
            int(cfg.capacity_factor * means.shape[0]), 32768
        )
        kwargs["return_stats"] = True
    out = render(
        means, covs, gaussians.harmonics, opac, extrinsics, intrinsics,
        image_shape, background, cfg.sh_degree, **kwargs,
    )
    color, depth_acc, alpha = out[:3]
    dropped = (
        out[3]["dropped"] if len(out) > 3 else jnp.zeros((), jnp.int32)
    )
    if cfg.scale_invariant:
        depth_acc = depth_acc * near  # undo the rescale on view-space z

    if cfg.depth_mode == "ref_compat":
        depth = depth_acc / 2.0  # reference decoder_splatting_cuda.py:61-62
    elif cfg.depth_mode == "depth":
        depth = depth_acc / jnp.maximum(alpha, 1e-6)
    else:
        depth = depth_acc
    return color, depth, alpha, dropped


def render_views(
    cfg: DecoderCfg,
    gaussians: Gaussians,  # (b, g, ...)
    extrinsics: jnp.ndarray,  # (b, v, 4, 4)
    intrinsics: jnp.ndarray,  # (b, v, 3, 3)
    near: jnp.ndarray,  # (b, v)
    far: jnp.ndarray,  # (b, v)
    image_shape: tuple[int, int],
) -> DecoderOutput:
    """Render every (batch, view) pair through ONE ``lax.map`` over the
    flattened (b*v) list — a single kernel trace regardless of batch or
    view count (the reference loops in python per view,
    ``cuda_splatting.py:92``; round 1 additionally unrolled the batch).
    At b == 1 the per-scene Gaussian fetch inside the map body indexes a
    static 0 and is free; at b > 1 it is one dynamic-slice per view."""
    b, v = extrinsics.shape[:2]

    if b == 1:
        g = jax.tree_util.tree_map(lambda x: x[0], gaussians)

        def one_view(args):
            e, k, n, f = args
            return render_view(cfg, g, e, k, n, f, image_shape)

        out = jax.lax.map(
            one_view,
            (extrinsics[0], intrinsics[0], near[0], far[0]),
        )
    else:
        scene_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), v)

        def one_view(args):
            e, k, n, f, bi = args
            g = jax.tree_util.tree_map(lambda x: x[bi], gaussians)
            return render_view(cfg, g, e, k, n, f, image_shape)

        out = jax.lax.map(
            one_view,
            (
                extrinsics.reshape(b * v, 4, 4),
                intrinsics.reshape(b * v, 3, 3),
                near.reshape(b * v),
                far.reshape(b * v),
                scene_ids,
            ),
        )
    color, depth, alpha, dropped = jax.tree_util.tree_map(
        lambda x: x.reshape(b, v, *x.shape[1:]), out
    )
    return DecoderOutput(color=color, depth=depth, alpha=alpha, dropped=dropped)
