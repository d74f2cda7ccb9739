"""FreeSplat encoder: posed context images -> fused 3D Gaussians.

Behavioral parity target: ``EncoderFreeSplat``
(reference ``src/model/encoder/encoder_freesplat.py:101-522``):
backbone -> plane-sweep cost volume (nearest-k source views for long
sequences) -> CVEncoder -> dense-grid DepthDecoder -> per-pixel Gaussians
-> PTF cross-view fusion -> GaussianAdapter.

TPU-native differences:
- NHWC everywhere; batch and view dims are vmapped/folded, not looped.
- PTF uses the static-buffer redesign (``ptf.py``); the returned Gaussians
  are a fixed-capacity set with a validity mask instead of a python list
  of ragged tensors.
- Source-view selection for > num_views contexts uses the same
  pose-distance top-k (``:40-60, 237-248``) but computed in one shot.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .adapter import (
    GaussianAdapterCfg,
    build_gaussians,
    unproject_depth,
)
from .backbone import EfficientNetV2S
from .cost_volume import CostVolume
from .networks import CVEncoder, DepthDecoder, GRU, positional_encoding
from .ptf import fuse_views
from .types import Gaussians


@dataclass(frozen=True)
class EncoderFreeSplatCfg:
    num_depth_candidates: int = 128
    num_views: int = 2  # max source views + 1 for the cost volume
    log_planes: bool = True
    d_feature: int = 64
    num_surfaces: int = 1
    near: float = 0.5
    far: float = 15.0
    matching_dim: int = 48
    adapter: GaussianAdapterCfg = field(default_factory=GaussianAdapterCfg)
    train_bn: bool = True  # reference forces BN train mode every forward
    compute_dtype: str = "float32"  # "bfloat16" halves conv time on MXU
    # Apply-time switch: return per-view trunk outputs without the PTF
    # fuse / Gaussian head (explicit sharded-pipeline composition point).
    trunk_only: bool = False


@dataclass
class OpacityMappingCfg:
    initial: float = 0.0
    final: float = 0.0
    warm_up: int = 1


def map_pdf_to_opacity(
    pdf: jnp.ndarray, global_step: int, cfg: OpacityMappingCfg | None = None
) -> jnp.ndarray:
    """Probability density -> opacity with a warm-up-scheduled exponent.

    Parity: ``EncoderFreeSplat.map_pdf_to_opacity``
    (reference ``encoder_freesplat.py:181-194``).  Dead code in the
    reference's runtime path (opacities come from sigmoid densities), kept
    for API completeness.  At exponent 1 (the default cfg) this is the
    identity on pdf.
    """
    cfg = cfg or OpacityMappingCfg()
    x = cfg.initial + min(global_step / cfg.warm_up, 1.0) * (
        cfg.final - cfg.initial
    )
    exponent = 2.0**x
    return 0.5 * (1.0 - (1.0 - pdf) ** exponent + pdf ** (1.0 / exponent))


def pose_distance_matrix(extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Combined translation + rotation-angle distance (reference ``:40-60``)."""
    t = extrinsics[..., :3, 3]
    r = extrinsics[..., :3, :3]
    tdist = jnp.linalg.norm(t[:, None] - t[None, :], axis=-1)
    rrel = jnp.swapaxes(r[:, None], -1, -2) @ r[None, :]
    trace = jnp.trace(rrel, axis1=-2, axis2=-1)
    angle = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
    return tdist + angle


def select_source_views(extrinsics: jnp.ndarray, num_src: int) -> jnp.ndarray:
    """(v, v) pose distances -> (v, num_src) nearest other-view indices."""
    v = extrinsics.shape[0]
    dist = pose_distance_matrix(extrinsics)
    dist = dist + jnp.eye(v) * 1e9  # exclude self
    _, idx = jax.lax.top_k(-dist, num_src)
    return idx


def sweep_geometry(
    extr: jnp.ndarray,  # (v, 4, 4) c2w
    intr: jnp.ndarray,  # (v, 3, 3) normalized
    num_views: int,
    match_hw: tuple[int, int],
):
    """Per-scene plane-sweep source geometry: nearest-k source indices,
    cur->src transforms, matching-resolution pixel intrinsics (4x4) of
    the sources, and inverse intrinsics of the current views.

    Module-level (not a closure) so host-chunked whole-scene encodes can
    compute it ONCE over the full trajectory and feed per-chunk slices
    to ``stage="trunk_chunk"`` (reference nearest-k semantics:
    encoder_freesplat.py:237-248)."""
    v = extr.shape[0]
    mh, mw = match_hw
    num_src = min(num_views, v) - 1
    if v > num_views:
        src_idx = select_source_views(extr, num_src)  # (v, num_src)
    else:
        allv = jnp.arange(v)
        src_idx = jnp.stack(
            [jnp.concatenate([allv[:i], allv[i + 1 :]]) for i in range(v)]
        )
    # Matching-resolution pixel intrinsics.
    k_pix = intr.at[:, 0].multiply(mw).at[:, 1].multiply(mh)
    k44 = jnp.tile(jnp.eye(4), (v, 1, 1)).at[:, :3, :3].set(k_pix)
    w2c = jnp.linalg.inv(extr)
    # src_T_cur[j, s] : cur-cam j -> src-cam src_idx[j, s]
    src_T_cur = jnp.einsum("vsij,vjk->vsik", w2c[src_idx], extr)
    return src_idx, src_T_cur, k44[src_idx], jnp.linalg.inv(k44)


class _FuseScene(nn.Module):
    """Per-scene PTF fusion + Gaussian head (vmapped over batch).

    Split out so the batch dimension goes through ``nn.vmap`` (one traced
    program regardless of batch size) instead of a python loop that makes
    XLA compile ``b`` copies of the PTF graph.
    """

    cfg: EncoderFreeSplatCfg
    image_shape: tuple[int, int]

    @nn.compact
    def __call__(self, feat, coords, dens, wt, depth, extr, intr):
        cfg = self.cfg
        gru = GRU(hidden_channel=cfg.d_feature, name="gru")
        if self.is_initializing():
            # Materialize GRU params outside lax.scan: fuse_views runs the
            # GRU inside a scan body for >4 views, where flax cannot
            # *create* variables (reuse is fine).
            zf = jnp.zeros((1, cfg.d_feature), feat.dtype)
            ze = positional_encoding(jnp.zeros((1, 2), feat.dtype), 6)
            gru(zf, zf, ze, ze)

        def gru_apply(inp, hid, in_emb, hid_emb):
            return gru(inp, hid, in_emb, hid_emb)

        state = fuse_views(
            feat, coords, dens, wt, depth, extr, intr, self.image_shape,
            gru_apply,
        )
        to_gaussians = nn.Dense(
            cfg.num_surfaces * (2 + cfg.adapter.d_in), name="to_gaussians"
        )
        raw = to_gaussians(nn.relu(state.feat))
        opacities = jax.nn.sigmoid(raw[..., 0])
        params = build_gaussians(
            cfg.adapter,
            raw[..., 2:],
            state.depth,
            state.extrinsics[:, :3, :3],
            intr[0],
            self.image_shape,
        )
        gaussians = Gaussians(
            means=state.coords,
            covariances=params["covariances"],
            harmonics=params["harmonics"],
            opacities=jnp.where(state.valid, opacities, 0.0),
            mask=state.valid,
        )
        return gaussians, params["scales"], params["rotations"]


class EncoderFreeSplat(nn.Module):
    cfg: EncoderFreeSplatCfg = EncoderFreeSplatCfg()

    @nn.compact
    def __call__(
        self, context: dict[str, Any], stage: str = "full"
    ) -> dict[str, Any]:
        """context: image (b, v, h, w, 3) in [0, 1]; intrinsics (b, v, 3, 3)
        normalized; extrinsics (b, v, 4, 4) c2w; near/far (b, v).

        Returns dict with 'gaussians' (batched masked Gaussians),
        depth maps per scale, num_gaussians, gs_ratio.

        ``stage`` (host-chunked whole-scene composition points; see
        ``evaluation/harness.py::make_chunked_encode``):
        - "full": the normal path.
        - "match": return only {"match": (b, v, mh, mw, matching_dim)} —
          the plane-sweep matching features, so a host loop can compute
          them for ALL views before trunk-chunking.
        - "trunk_chunk": context additionally carries "match_src"
          (b, v, num_src, mh, mw, c), "src_T_cur", "src_K", "cur_invK"
          (precomputed by ``sweep_geometry`` with GLOBAL nearest-k over
          the whole trajectory); skip in-graph source selection and
          return the trunk_only output dict for just these views.
        """
        cfg = self.cfg
        # Accept host-loader numpy arrays when called eagerly (e.g. init).
        context = {
            k: jnp.asarray(x) if isinstance(x, (np.ndarray, jnp.ndarray)) else x
            for k, x in context.items()
        }
        images = context["image"]
        b, v, h, w, _ = images.shape
        if h % 32 or w % 32:
            raise ValueError(
                f"image shape ({h}, {w}) must be divisible by 32: the "
                "backbone has 5 stride-2 stages and the dense-grid decoder "
                "re-upsamples them (reference trains at 384x512)"
            )
        hw = h * w
        adapter_cfg = cfg.adapter

        dtype = jnp.dtype(cfg.compute_dtype)
        flat = images.reshape(b * v, h, w, 3)
        feats = EfficientNetV2S(
            train_bn=cfg.train_bn, compute_dtype=dtype, name="backbone"
        )(flat)
        # Project matching features to the matching dim (stride-4 scale).
        match_feats = feats[1]
        if match_feats.shape[-1] != cfg.matching_dim:
            match_feats = nn.Conv(
                cfg.matching_dim, (1, 1), dtype=dtype, name="match_proj"
            )(match_feats)
        mh, mw = match_feats.shape[1:3]
        match_bv = match_feats.reshape(b, v, mh, mw, -1)
        if stage == "match":
            return {"match": match_bv}

        if stage == "trunk_chunk":
            match_src = context["match_src"]
            src_T_cur = context["src_T_cur"]
            src_K = context["src_K"]
            cur_invK = context["cur_invK"]
        else:
            num_src = min(cfg.num_views, v) - 1
            src_idx, src_T_cur, src_K, cur_invK = jax.vmap(
                functools.partial(
                    sweep_geometry, num_views=cfg.num_views, match_hw=(mh, mw)
                )
            )(context["extrinsics"], context["intrinsics"])
            match_src = jnp.take_along_axis(
                match_bv[:, :, None],
                src_idx[..., None, None, None].astype(jnp.int32),
                axis=1,
            )  # (b, v, num_src, mh, mw, c)

        cv_vmapped = nn.vmap(
            CostVolume,
            in_axes=(0, 0, 0, 0, 0, 0, 0),
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )(num_depth_bins=cfg.num_depth_candidates, dtype=dtype,
          name="cost_volume")
        cost_volume = cv_vmapped(
            match_bv,
            match_src,
            src_T_cur,
            src_K,
            cur_invK,
            context["near"][:, 0],
            context["far"][:, 0],
        ).reshape(b * v, mh, mw, -1)  # (b*v, mh, mw, D)

        cv_feats = CVEncoder(dtype=dtype, name="cv_encoder")(
            cost_volume, feats[1:]
        )
        dec_in = [feats[0]] + cv_feats
        outputs = DepthDecoder(
            num_output_channels=1 + cfg.d_feature,
            near=cfg.near,
            far=cfg.far,
            num_samples=cfg.num_depth_candidates,
            log_planes=cfg.log_planes,
            dtype=dtype,
            name="depth_decoder",
        )(dec_in)

        # Full-res per-pixel Gaussian ingredients (f32 from here on: PTF,
        # adapter, and the rasterizer all run in full precision).
        skip = nn.Conv(cfg.d_feature, (7, 7), padding=3, name="hr_skip")(flat)
        skip = nn.relu(skip)
        gauss_feats = outputs["output_s-1"][..., 1:] + skip  # (b*v, h, w, C)
        densities = jax.nn.sigmoid(outputs["output_s-1"][..., :1])
        depths = outputs["depth_s-1"][..., 0]  # (b*v, h, w)
        weights = outputs["depth_weights"]  # (b*v, h, w, 1)

        means = unproject_depth(
            depths.reshape(b, v, h, w),
            context["intrinsics"],
            context["extrinsics"],
            (h, w),
        )  # (b, v, h, w, 3)

        feat_v = gauss_feats.reshape(b, v, hw, cfg.d_feature)
        dens_v = densities.reshape(b, v, hw, 1)
        wt_v = weights.reshape(b, v, hw, 1)
        depth_v = depths.reshape(b, v, hw)
        coords_v = means.reshape(b, v, hw, 3)

        if cfg.trunk_only or stage == "trunk_chunk":
            # Per-view ingredients WITHOUT the PTF fuse + Gaussian head —
            # the composition point for explicitly sharded whole-scene
            # pipelines (parallel/whole_scene.py: view-sharded trunk ->
            # fuse_views_sharded -> head).  Init with the FULL config so
            # the fuse parameters exist; apply-time trunk_only simply
            # never references them.
            return {
                "feat_v": feat_v,
                "coords_v": coords_v,
                "dens_v": dens_v,
                "wt_v": wt_v,
                "depth_v": depth_v,
                "depth_s-1": depths.reshape(b, v, h, w),
                "densities": densities.reshape(b, v, h, w),
                "depth_weights": weights.reshape(b, v, h, w),
                # Multi-scale depths (reference encoder_freesplat.py:340):
                # sharded whole-scene pipelines need these for the depth
                # losses, and the backward-parity golden exercises the
                # lower-scale conv_depth heads through them.
                **{
                    f"depth_s{s}": outputs[f"depth_s{s}"].reshape(
                        b, v, *outputs[f"depth_s{s}"].shape[1:3]
                    )
                    for s in range(4)
                },
            }

        # PTF fusion + Gaussian head, vmapped over batch (shared params).
        fuse = nn.vmap(
            _FuseScene,
            in_axes=(0, 0, 0, 0, 0, 0, 0),
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )(cfg=cfg, image_shape=(h, w), name="fuse")
        gaussians, scales_v, rotations_v = fuse(
            feat_v, coords_v, dens_v, wt_v, depth_v,
            context["extrinsics"], context["intrinsics"],
        )
        num_valid = jnp.sum(gaussians.mask, axis=-1)
        # Visualization dump (reference encoder_freesplat.py:393-405).
        visualizations = {"scales": scales_v, "rotations": rotations_v}

        results: dict[str, Any] = {
            "gaussians": gaussians,
            "visualizations": visualizations,
            "num_gaussians": num_valid,
            "gs_ratio": num_valid / (v * hw),
            "depth_s-1": depths.reshape(b, v, h, w),
            "densities": densities.reshape(b, v, h, w),
            "depth_weights": weights.reshape(b, v, h, w),
        }
        for s in range(4):
            d_s = outputs[f"depth_s{s}"]
            results[f"depth_s{s}"] = d_s.reshape(b, v, *d_s.shape[1:3])
        return results
