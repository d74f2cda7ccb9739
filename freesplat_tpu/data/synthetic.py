"""Synthetic scene generator: random Gaussian-splat rooms rendered with the
reference rasterizer.  Used for unit tests, benchmarks, and overfit-one-
scene training when no real dataset is mounted (this offline environment
ships no ScanNet/Replica/RE10K data).

Scenes are consistent across views — the same Gaussian cloud rendered from
every camera — so multi-view depth estimation and PTF have real signal.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.gaussians import build_covariance
from ..ops.rasterizer_ref import render_reference


@dataclass(frozen=True)
class SyntheticCfg:
    num_gaussians: int = 4000
    image_shape: tuple[int, int] = (64, 64)
    num_context: int = 2
    num_target: int = 2
    near: float = 0.5
    far: float = 15.0
    seed: int = 0
    # > 0: pre-render this many camera rings once and cycle through them
    # (the dense golden-model render is O(n·pixels) — at 384x512 it costs
    # multiples of the train step, so overfit runs should cache).
    cache_batches: int = 0
    # Fresh Gaussian cloud per batch (seeded by (seed, scene_id) so
    # train/eval streams with different seeds are disjoint scene sets) —
    # the generalization-training mode.  Default keeps the historical
    # behavior: ONE cloud, fresh camera rings per batch.
    vary_scene: bool = False
    # "reference": dense golden-model render (exact, slow — O(n·pixels)
    # memory; fine for tests/small shapes).  "tile": the production Pallas
    # rasterizer with a generous capacity, all views in one jitted
    # lax.map dispatch — ~10x faster ground-truth generation for
    # generalization training streams (forward parity vs the golden model
    # is covered by tests/test_rasterizer_pallas.py).
    renderer: str = "reference"


def _random_scene(rng: np.random.Generator, n: int):
    means = rng.uniform([-3, -3, 1.5], [3, 3, 9.0], size=(n, 3))
    scales = rng.uniform(0.05, 0.25, size=(n, 3))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    cov = build_covariance(
        jnp.asarray(scales, jnp.float32), jnp.asarray(quats, jnp.float32)
    )
    harm = rng.normal(size=(n, 3, 1)) * 0.8
    opac = rng.uniform(0.5, 1.0, size=n)
    return (
        jnp.asarray(means, jnp.float32),
        cov,
        jnp.asarray(harm, jnp.float32),
        jnp.asarray(opac, jnp.float32),
    )


def _camera_ring(rng: np.random.Generator, num: int):
    """Small-baseline forward-facing camera chain (ScanNet-like motion)."""
    extr = []
    base = np.eye(4, dtype=np.float32)
    for i in range(num):
        e = base.copy()
        e[0, 3] = 0.25 * i + rng.normal() * 0.02
        e[1, 3] = rng.normal() * 0.02
        theta = 0.05 * i
        c, s = np.cos(theta), np.sin(theta)
        e[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        extr.append(e)
    return np.stack(extr)


def synthetic_batches(cfg: SyntheticCfg) -> Iterator[dict]:
    """Infinite iterator of single-scene batches (b=1)."""
    rng = np.random.default_rng(cfg.seed)
    h, w = cfg.image_shape
    intr = np.array(
        [[1.07, 0, 0.5], [0, 1.42, 0.5], [0, 0, 1]], dtype=np.float32
    )
    scene0 = _random_scene(rng, cfg.num_gaussians)
    bg = jnp.zeros(3)

    # Scene tensors are arguments (not closure constants) so vary_scene
    # streams compile the render exactly once; all views render in ONE
    # jitted dispatch (lax.map keeps memory at the 1-view footprint).
    def render_one(e, means, cov, harm, opac):
        if cfg.renderer == "tile":
            from ..ops.rasterizer import rasterize

            color, depth, alpha = rasterize(
                means, cov, harm, opac, e, jnp.asarray(intr), (h, w), bg, 0,
                capacity=max(16 * cfg.num_gaussians, 65536),
            )
        else:
            color, depth, alpha = render_reference(
                means, cov, harm, opac, e, jnp.asarray(intr), (h, w), bg, 0
            )
        return jnp.clip(color, 0.0, 1.0), depth / jnp.maximum(alpha, 1e-6)

    @jax.jit
    def render_all(extrs, means, cov, harm, opac):
        return jax.lax.map(
            lambda e: render_one(e, means, cov, harm, opac), extrs
        )

    def make_batch(scene_id: int) -> dict:
        if cfg.vary_scene:
            scene = _random_scene(
                np.random.default_rng([cfg.seed, scene_id]), cfg.num_gaussians
            )
        else:
            scene = scene0
        v_total = cfg.num_context + cfg.num_target
        extr = _camera_ring(rng, v_total)
        colors, depths = render_all(jnp.asarray(extr), *scene)
        colors = np.asarray(colors)
        depths = np.asarray(depths)
        # Targets INTERPOLATE between the contexts (the reference's
        # bounded sampler places targets strictly between the context
        # views, view_sampler_bounded.py) — contexts are the trajectory
        # endpoints, targets the interior views.  Extrapolated targets
        # see scene regions no context ray covers (per-pixel Gaussians
        # cannot render them), which caps achievable PSNR.
        order = np.arange(v_total)
        # Contexts evenly spaced over the trajectory (endpoints included),
        # targets the remaining interior views — the bounded-sampler
        # protocol generalized to any context count (for num_context == 2
        # this is exactly the old endpoints + interior split).
        ctx = np.unique(
            np.round(np.linspace(0, v_total - 1, cfg.num_context)).astype(int)
        )
        tgt = np.setdiff1d(order, ctx)[: cfg.num_target]

        def views(sel):
            idx = np.arange(v_total)[sel]
            return {
                "extrinsics": jnp.asarray(extr[sel])[None],
                "intrinsics": jnp.asarray(np.tile(intr, (len(idx), 1, 1)))[None],
                "image": jnp.asarray(colors[sel])[None],
                "near": jnp.full((1, len(idx)), cfg.near, jnp.float32),
                "far": jnp.full((1, len(idx)), cfg.far, jnp.float32),
                "index": jnp.asarray(idx)[None],
                "depth": jnp.asarray(depths[sel])[None],
            }

        return {
            "context": views(ctx),
            "target": views(tgt),
            "scene": [f"synthetic_{scene_id}"],
        }

    if cfg.cache_batches > 0:
        cached = [make_batch(i) for i in range(cfg.cache_batches)]
        i = 0
        while True:
            yield cached[i % len(cached)]
            i += 1
    else:
        scene_id = 0
        while True:
            yield make_batch(scene_id)
            scene_id += 1
