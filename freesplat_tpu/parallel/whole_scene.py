"""Explicit whole-scene multi-chip pipeline: view-sharded encoder trunk
-> sharded PTF -> Gaussian head.

The GSPMD path (``make_view_sharded_encode``) lets XLA partition the
WHOLE encoder including the fuse; this module instead composes the
hand-written pieces so the collectives are exactly the designed ones
(SURVEY §2.5 / §5): the per-view trunk runs view-sharded, PTF runs with
the slot buffer sharded (``sharded_ptf``: one pmin + one psum per
view), and the Gaussian head is replicated HW-bounded math.

Single-scene (b=1) whole-scene encoding; the view count must divide the
mesh axis.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.adapter import build_gaussians
from ..models.encoder import EncoderFreeSplat
from ..models.networks import GRU
from ..models.types import Gaussians
from .sharded_ptf import fuse_views_sharded


def encode_whole_scene(
    encoder: EncoderFreeSplat,
    variables: dict,
    context: dict[str, Any],
    mesh: Mesh,
    axis: str = "data",
) -> dict[str, Any]:
    """Returns the same result dict surface as ``encoder.apply`` (minus
    the per-scale depth extras) with every stage explicitly sharded."""
    cfg = encoder.cfg
    b, v = context["image"].shape[:2]
    h, w = context["image"].shape[2:4]
    assert b == 1, "whole-scene pipeline is single-scene (b=1)"

    # 1. Per-view trunk, view axis sharded over the mesh.
    trunk = EncoderFreeSplat(dataclasses.replace(cfg, trunk_only=True))
    view_sharded = NamedSharding(mesh, P(None, axis))
    replicated = NamedSharding(mesh, P())
    trunk_apply = jax.jit(
        trunk.apply, in_shardings=(replicated, view_sharded)
    )
    t = trunk_apply(variables, context)

    # 2. Sharded PTF over the same mesh.
    gru = GRU(hidden_channel=cfg.d_feature)
    gru_params = {"params": variables["params"]["fuse"]["gru"]}

    def gru_apply(inp, hid, in_emb, hid_emb):
        return gru.apply(gru_params, inp, hid, in_emb, hid_emb)

    state = fuse_views_sharded(
        t["feat_v"][0], t["coords_v"][0], t["dens_v"][0], t["wt_v"][0],
        t["depth_v"][0], context["extrinsics"][0], context["intrinsics"][0],
        (h, w), gru_apply, mesh=mesh, axis=axis,
    )

    # 3. Gaussian head (the _FuseScene tail, replicated): to_gaussians
    # Dense + adapter.  Parity target: models/encoder.py::_FuseScene.
    dk = variables["params"]["fuse"]["to_gaussians"]
    raw = jnp.maximum(state.feat, 0.0) @ dk["kernel"] + dk["bias"]
    opacities = jax.nn.sigmoid(raw[..., 0])
    params = build_gaussians(
        cfg.adapter,
        raw[..., 2:],
        state.depth,
        state.extrinsics[:, :3, :3],
        context["intrinsics"][0, 0],
        (h, w),
    )
    gaussians = Gaussians(
        means=state.coords[None],
        covariances=params["covariances"][None],
        harmonics=params["harmonics"][None],
        opacities=jnp.where(state.valid, opacities, 0.0)[None],
        mask=state.valid[None],
    )
    num_valid = jnp.sum(gaussians.mask, axis=-1)
    return {
        "gaussians": gaussians,
        "visualizations": {
            "scales": params["scales"][None],
            "rotations": params["rotations"][None],
        },
        "num_gaussians": num_valid,
        "gs_ratio": num_valid / (v * h * w),
        "depth_s-1": t["depth_s-1"],
        "densities": t["densities"],
        "depth_weights": t["depth_weights"],
    }


def render_whole_scene(
    dec_cfg,
    gaussians: Gaussians,  # unbatched (g, ...) or batched with b=1
    extrinsics: jnp.ndarray,  # (v, 4, 4)
    intrinsics: jnp.ndarray,  # (v, 3, 3)
    near: jnp.ndarray,  # (v,)
    far: jnp.ndarray,  # (v,)
    image_shape: tuple[int, int],
    mesh: Mesh,
    axis: str = "data",
):
    """Render target views with the Gaussian set sharded over the mesh
    (``sharded_render``: screen-param all-gather + per-device tile-column
    slabs).  Matches ``models.decoder.render_view`` semantics (1/near
    scale-invariant rescale, background color, masked opacities).
    Returns (color (v, h, w, 3), depth (v, h, w), alpha (v, h, w))."""
    from ..parallel.sharded_render import rasterize_sharded

    if gaussians.means.ndim == 3:  # batched b=1
        gaussians = jax.tree_util.tree_map(lambda x: x[0], gaussians)
    shard = NamedSharding(mesh, P(axis))
    means = jax.device_put(gaussians.means, shard)
    covs = jax.device_put(gaussians.covariances, shard)
    harm = jax.device_put(gaussians.harmonics, shard)
    opac = jax.device_put(gaussians.masked_opacities(), shard)
    background = jnp.asarray(dec_cfg.background_color, jnp.float32)
    render_mesh = Mesh(mesh.devices, ("shard",))

    colors, depth_accs, alphas = [], [], []
    for vi in range(extrinsics.shape[0]):
        e, k = extrinsics[vi], intrinsics[vi]
        m, c = means, covs
        if dec_cfg.scale_invariant:
            s = 1.0 / near[vi]
            e = e.at[:3, 3].multiply(s)
            m = m * s
            c = c * (s * s)
        color, depth_acc, alpha = rasterize_sharded(
            m, c, harm, opac, e, k, image_shape, background,
            dec_cfg.sh_degree, mesh=render_mesh,
            capacity=max(int(dec_cfg.capacity_factor * means.shape[0]), 32768),
        )
        if dec_cfg.scale_invariant:
            depth_acc = depth_acc * near[vi]
        colors.append(color)
        depth_accs.append(depth_acc)
        alphas.append(alpha)
    color = jnp.stack(colors)
    depth_acc = jnp.stack(depth_accs)
    alpha = jnp.stack(alphas)
    if dec_cfg.depth_mode == "ref_compat":
        depth = depth_acc / 2.0
    elif dec_cfg.depth_mode == "depth":
        depth = depth_acc / jnp.maximum(alpha, 1e-6)
    else:
        depth = depth_acc
    return color, depth, alpha
