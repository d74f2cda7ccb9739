"""Plane-sweep cost volume (vectorized multi-view stereo matching).

Behavioral parity target: ``AVGFeatureVolumeManager.build_cost_volume``
(reference ``src/model/encoder/modules/cost_volume.py:429-619``) — but the
reference's per-plane python loop of D=128 grid_sample calls is replaced
with a fully vectorized sweep: all D plane projections are a single batched
einsum, the warp is one gather-based bilinear sample over (V, D) at once
(chunked over D to bound memory), and the per-plane MLP runs over the whole
volume in one shot.  XLA fuses the projective math into the gathers.

Depth planes are linear in *inverse* depth between near and far
(``cost_volume.py:98-134``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from typing import Any

from flax import linen as nn

from ..ops.grid_sample import bilinear_sample_packed, pack_quad
from .layers import MLP


def inverse_depth_planes(
    num_planes: int, min_depth: jnp.ndarray, max_depth: jnp.ndarray
) -> jnp.ndarray:
    """(D,) plane depths, linear in inverse depth from min to max."""
    t = jnp.linspace(0.0, 1.0, num_planes)
    inv = 1.0 / min_depth + (1.0 / max_depth - 1.0 / min_depth) * t
    return 1.0 / inv


class CostVolume(nn.Module):
    """Average-fusion feature volume with a per-(pixel, plane) MLP head.

    __call__ args (NHWC, matching-resolution = input/4):
      cur_feats:  (b, h, w, c) current-view matching features
      src_feats:  (b, v, h, w, c) source-view matching features
      src_T_cur:  (b, v, 4, 4) current-cam -> source-cam transforms
      src_K:      (b, v, 4, 4) source intrinsics (pixel units at h, w)
      cur_invK:   (b, 4, 4) inverse current intrinsics (pixel units)
      min/max_depth: scalars (or (b,))
    Returns: (b, h, w, D) feature volume.
    """

    num_depth_bins: int = 64
    mlp_channels: tuple[int, ...] = (32, 32, 1)
    plane_chunk: int = 16
    dtype: Any = None
    # "avg_mlp": AVGFeatureVolumeManager (warped-feature average + per-plane
    # MLP head) — FreeSplat's runtime path.  "cosine": the base
    # CostVolumeManager variant (reference cost_volume.py:235-341) — the
    # volume is the view-averaged masked cosine similarity, no MLP.
    similarity: str = "avg_mlp"

    @nn.compact
    def __call__(
        self, cur_feats, src_feats, src_T_cur, src_K, cur_invK,
        min_depth, max_depth, eps: float = 1e-8,
    ):
        b, h, w, c = cur_feats.shape
        v = src_feats.shape[1]
        d = self.num_depth_bins
        # Whole-scene scaling: the chunk's gathered-row tensor is
        # (b*v*chunk*n, 4c) and must stay ~1 GB regardless of view count
        # (30-view FVT at plane_chunk=16 would materialize 24 GB and OOM
        # a 16 GB chip).  Chunking over planes is numerically neutral.
        budget_rows = 1_500_000
        plane_chunk = max(
            1, min(self.plane_chunk, budget_rows // max(b * v * h * w, 1))
        )

        depths = inverse_depth_planes(
            d, jnp.asarray(min_depth), jnp.asarray(max_depth)
        )  # (d,)

        # Pixel rays: centers at half-integers (reference BackprojectDepth,
        # sr_utils/geometry_utils.py:22-59).
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32) + 0.5,
            jnp.arange(w, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1).reshape(-1, 3)
        rays = jnp.einsum("bij,nj->bni", cur_invK[:, :3, :3], pix)  # (b, n, 3)

        # Projection matrices: P = K @ src_T_cur (b, v, 3, 4).
        proj = jnp.einsum("bvij,bvjk->bvik", src_K, src_T_cur)[:, :, :3]

        cosine = self.similarity == "cosine"
        if cosine:
            # Normalize once up front; the warp is linear so warped vectors
            # are renormalized post-sample below.
            cur_feats = cur_feats / (
                jnp.linalg.norm(cur_feats, axis=-1, keepdims=True) + 1e-8
            )

        # Pack 2x2 neighborhoods so the warp needs one row-gather per
        # sample (TPU gathers are row-rate-bound; this is the plane-sweep
        # hot loop).
        src_packed = pack_quad(src_feats.reshape(b * v, h, w, c))

        # The per-(pixel, plane) MLP head runs INSIDE the chunk body so the
        # (b, d, n, c+1) MLP input never materializes ((30 views, D=128)
        # would be 9.2 GB).  Row-wise MLP: chunking is numerically neutral.
        # Materialize its params eagerly (lax.map bodies cannot CREATE
        # flax variables, only reuse them).
        mlp = None
        if not cosine:
            mlp = MLP(self.mlp_channels, disable_final_activation=True,
                      dtype=self.dtype, name="mlp")
            if self.is_initializing():
                mlp(jnp.zeros((1, c + 1), cur_feats.dtype))

        def sweep_chunk(depth_chunk):
            # depth_chunk: (dc,)
            cam = rays[:, None] * depth_chunk[None, :, None, None]  # (b,dc,n,3)
            cam_h = jnp.concatenate([cam, jnp.ones_like(cam[..., :1])], -1)
            p = jnp.einsum("bvij,bdnj->bvdni", proj, cam_h)  # (b,v,dc,n,3)
            z = p[..., 2:3]
            # Kornia-style guarded divide (sr_utils Project3D:78-89).
            scale = jnp.where(jnp.abs(z) > eps, 1.0 / (z + eps), 1.0)
            # The sample coordinates depend only on camera geometry and the
            # fixed depth planes — never on trainable parameters — so sever
            # them from autodiff: without this the VJP of the bilinear
            # weight multiply saves the 2.4 GB gathered-row tensor as a
            # residual (memory, not time — the honest r3 re-profile holds
            # at fwd 40 ms / fwd+bwd 136 ms; the backward's 3.1M-row
            # scatter-add is the floor, and the fused-Pallas alternative is
            # closed as infeasible on this toolchain: docs/PERFORMANCE.md
            # "Fused plane-sweep kernel").
            uv = jax.lax.stop_gradient(p[..., :2] * scale)
            dc = uv.shape[2]
            n = uv.shape[3]
            warped = bilinear_sample_packed(
                src_packed,
                uv.reshape(b * v, dc * n, 2),
            ).reshape(b, v, dc, n, c)
            mask = (z > 0).astype(warped.dtype)
            if cosine:
                warped = warped / (
                    jnp.linalg.norm(warped, axis=-1, keepdims=True) + 1e-8
                )
            dot = jnp.sum(warped * cur_feats.reshape(b, 1, 1, -1, c), axis=-1)
            dot = dot * mask[..., 0]  # (b, v, dc, n)
            nonzero = (dot != 0).astype(warped.dtype)
            denom = jnp.sum(nonzero, axis=1) + 1e-8  # (b, dc, n)
            dot_avg = jnp.sum(dot, axis=1) / denom
            if cosine:
                return dot_avg  # (b, dc, n)
            feat_avg = (
                jnp.sum(warped * nonzero[..., None], axis=1) / denom[..., None]
            )  # (b, dc, n, c)
            combined = jnp.concatenate(
                [feat_avg, dot_avg[..., None]], axis=-1
            )
            return mlp(combined)[..., 0]  # (b, dc, n)

        # lax.map over plane chunks: one traced chunk body instead of an
        # unrolled graph (compile time), same numerics.
        n_chunks = -(-d // plane_chunk)
        pad = n_chunks * plane_chunk - d
        depths_padded = jnp.concatenate(
            [depths, jnp.full((pad,), depths[-1])]
        ) if pad else depths
        chunked = jax.lax.map(
            sweep_chunk, depths_padded.reshape(n_chunks, plane_chunk)
        )  # (n_chunks, b, chunk, n)
        volume = jnp.moveaxis(chunked, 0, 1).reshape(
            b, n_chunks * plane_chunk, -1
        )[:, :d]
        return volume.transpose(0, 2, 1).reshape(b, h, w, d).astype(jnp.float32)
