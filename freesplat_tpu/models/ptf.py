"""Pixel-wise Triplet Fusion (PTF), redesigned with static shapes.

Behavioral parity target: ``EncoderFreeSplat.fuse_gaussians``
(reference ``encoder_freesplat.py:431-522``) — a sequential cross-view
merge: project the global Gaussian set into each new view, z-buffer to one
winner per pixel, match pixels whose predicted depth agrees with the
projected depth (|dz| < max(5% d, 0.1)), fuse matched pairs' latent
features with a GRU and density-weighted averages, and append unmatched
pixels as new Gaussians.

The reference implementation boolean-compacts tensors every view (dynamic
shapes).  This redesign is XLA-native:

- The global set lives in a fixed buffer of V*H*W slots with a validity
  mask; view i's pixels own slots [i*HW, (i+1)*HW).
- "Remove + re-append fused" becomes an in-place overwrite of the winning
  slot; a merged-away pixel's own slot simply stays invalid.
- The z-buffer is a ``segment_min`` over slots; the winner map is a
  scatter; all per-view work (GRU included) is bounded by HW, not V*HW.
- Views are processed in a python loop over the static view count (each
  iteration is identical-shape compute; XLA sees a fixed-depth chain).

The GRU is applied through a passed-in closure so this module stays purely
functional over parameters.
"""
from __future__ import annotations

import functools as _functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .networks import positional_encoding


class PTFState(NamedTuple):
    """Global Gaussian buffer; G = num_views * H * W slots."""

    feat: jnp.ndarray  # (G, C) latent features
    coords: jnp.ndarray  # (G, 3) world positions
    density: jnp.ndarray  # (G, 1) accumulated densities
    weight: jnp.ndarray  # (G, 1) accumulated depth-confidence weights
    depth: jnp.ndarray  # (G,) fused depth (current-view metric)
    extrinsics: jnp.ndarray  # (G, 4, 4) density-weighted c2w average
    valid: jnp.ndarray  # (G,) bool


def _project_to_view(
    coords: jnp.ndarray,  # (G, 3) world
    extrinsic: jnp.ndarray,  # (4, 4) c2w of the view
    intrinsic: jnp.ndarray,  # (3, 3) normalized
    image_shape: tuple[int, int],
):
    """Returns (pixel_index (G,), depth (G,), in_bounds (G,))."""
    h, w = image_shape
    w2c = jnp.linalg.inv(extrinsic)
    cam = jnp.einsum("ij,gj->gi", w2c[:3, :3], coords) + w2c[:3, 3]
    z = cam[:, 2]
    fx, fy = intrinsic[0, 0] * w, intrinsic[1, 1] * h
    cx, cy = intrinsic[0, 2] * w, intrinsic[1, 2] * h
    u = cam[:, 0] / z * fx + cx
    v = cam[:, 1] / z * fy + cy
    # Reference rounds to nearest integer pixel (encoder_freesplat.py:460).
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_bounds = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) & (z > 0)
    pix = jnp.where(in_bounds, vi * w + ui, h * w)  # sentinel h*w
    return pix, z, in_bounds


def fuse_views(
    feats: jnp.ndarray,  # (V, HW, C) per-view latent features
    coords: jnp.ndarray,  # (V, HW, 3) per-pixel world means
    densities: jnp.ndarray,  # (V, HW, 1)
    weights: jnp.ndarray,  # (V, HW, 1) depth confidence
    depths: jnp.ndarray,  # (V, HW) predicted depths
    extrinsics: jnp.ndarray,  # (V, 4, 4)
    intrinsics: jnp.ndarray,  # (V, 3, 3) normalized
    image_shape: tuple[int, int],
    gru_apply: Callable[..., jnp.ndarray],
    depth_thres: float = 0.1,
    pe_freqs: int = 6,
    use_scan: bool | None = None,
) -> PTFState:
    """Run PTF over all views; returns the fused global buffer.

    ``use_scan``: process views with ``lax.scan`` (one traced body) instead
    of an unrolled python loop.  Defaults to scan for >4 views — the FVT
    whole-scene setting runs up to ~30 views, where an unrolled graph
    multiplies compile time ~Vx for no runtime benefit.
    """
    v, hw, c = feats.shape
    g = v * hw
    if use_scan is None:
        use_scan = v > 4

    # The scan carry is the PACKED buffer itself, (g, c+22) columns
    # [feat c | density 1 | weight 1 | coords 3 | depth 1 | extr 16],
    # plus the validity mask.  The earlier design carried PTFState fields
    # and concatenated/re-sliced a packed copy every view — at 30 views
    # x 384x512 (g = 5.9M, 2 GB per copy) the repacking defeated XLA's
    # scan-carry aliasing and the whole-scene fuse planned ~23 GB of HBM.
    def pack_view(feat_i, density_i, weight_i, coords_i, depth_i, extr16):
        return jnp.concatenate(
            [feat_i, density_i, weight_i, coords_i, depth_i[:, None], extr16],
            axis=-1,
        )

    width = c + 22
    packed = jnp.zeros((g, width), feats.dtype)
    packed = jax.lax.dynamic_update_slice(
        packed,
        pack_view(
            feats[0], densities[0], weights[0], coords[0], depths[0],
            jnp.broadcast_to(extrinsics[0].reshape(1, 16), (hw, 16)),
        ),
        (0, 0),
    )
    valid = jnp.zeros((g,), bool).at[:hw].set(True)

    if not use_scan:
        for i in range(1, v):
            packed, valid = _fuse_one_view(
                packed, valid, c, i, hw,
                feats[i], coords[i], densities[i], weights[i], depths[i],
                extrinsics[i], intrinsics[i], image_shape,
                gru_apply, depth_thres, pe_freqs,
            )
    else:
        def body(carry, xs):
            packed, valid = carry
            i, feat_i, coords_i, density_i, weight_i, depth_i, extr_i, intr_i = xs
            return _fuse_one_view(
                packed, valid, c, i, hw,
                feat_i, coords_i, density_i, weight_i, depth_i,
                extr_i, intr_i, image_shape,
                gru_apply, depth_thres, pe_freqs,
            ), None

        xs = (
            jnp.arange(1, v, dtype=jnp.int32),
            feats[1:], coords[1:], densities[1:], weights[1:], depths[1:],
            extrinsics[1:], intrinsics[1:],
        )
        (packed, valid), _ = jax.lax.scan(body, (packed, valid), xs)

    return PTFState(
        feat=packed[:, :c],
        density=packed[:, c : c + 1],
        weight=packed[:, c + 1 : c + 2],
        coords=packed[:, c + 2 : c + 5],
        depth=packed[:, c + 5],
        extrinsics=packed[:, c + 6 : c + 22].reshape(g, 4, 4),
        valid=valid,
    )


def _pack_width(c: int) -> int:
    return c + 22


@_functools.lru_cache(maxsize=32)
def _segment_fn(
    gru_apply, image_shape, hw: int, c: int, depth_thres: float,
    pe_freqs: int,
):
    """Jitted scan over a view range at a FIXED buffer size (the size is
    baked in via the packed argument's shape).  Cached per gru_apply
    closure so repeated whole-scene encodes reuse the compiled graphs."""
    import jax as _jax

    def run(packed, valid, xs):
        def body(carry, x):
            pk, vd = carry
            (i, feat_i, coords_i, density_i, weight_i, depth_i, extr_i,
             intr_i) = x
            return _fuse_one_view(
                pk, vd, c, i, hw,
                feat_i, coords_i, density_i, weight_i, depth_i,
                extr_i, intr_i, image_shape,
                gru_apply, depth_thres, pe_freqs,
            ), None

        (packed, valid), _ = _jax.lax.scan(body, (packed, valid), xs)
        return packed, valid

    return _jax.jit(run, donate_argnums=(0, 1))


def fuse_views_bucketed(
    feats: jnp.ndarray,  # (V, HW, C)
    coords: jnp.ndarray,
    densities: jnp.ndarray,
    weights: jnp.ndarray,
    depths: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_shape: tuple[int, int],
    gru_apply: Callable[..., jnp.ndarray],
    depth_thres: float = 0.1,
    pe_freqs: int = 6,
    buckets: tuple[int, ...] | None = None,
) -> PTFState:
    """``fuse_views`` with a GROWING slot buffer (host-side bucket driver).

    The scan version does full-buffer work for every view although at
    view i only (i+1)*HW slots can be valid — at 30 views the early
    iterations waste ~2x of the projection / z-buffer / winner-scatter
    cost (VERDICT r4 weak #3).  This driver processes the view sequence
    in 2-3 jit-compiled buffer sizes (default ceil(V/4) -> ceil(V/2) ->
    V), growing the packed carry between segments; each segment's scan is
    donated its buffer so growth costs one concat-copy, not a copy per
    view.

    Bit-parity with ``fuse_views``: invalid tail slots never project
    (``proj_ok = in_bounds & valid``), never win the z-buffer, and are
    never scattered into, so a smaller buffer containing the same valid
    prefix computes identical fusion decisions (pinned by
    tests/test_ptf_bucketed.py, including vs the reference torch code via
    the existing parity suite's fuse path).

    NOT for use inside an outer jit: this is the host-loop composition
    point (evaluation/harness.make_chunked_encode phase C1).  In-graph
    callers keep ``fuse_views``.
    """
    v, hw, c = feats.shape
    if buckets is None:
        buckets = (max(2, -(-v // 4)), max(2, -(-v // 2)), v)
    buckets = tuple(sorted({min(b, v) for b in buckets if b >= 1} | {v}))
    width = _pack_width(c)

    seg = _segment_fn(
        gru_apply, tuple(image_shape), hw, c, float(depth_thres),
        int(pe_freqs),
    )

    g0 = buckets[0] * hw
    packed = jnp.zeros((g0, width), feats.dtype)
    packed = jax.lax.dynamic_update_slice(
        packed,
        jnp.concatenate(
            [
                feats[0], densities[0], weights[0], coords[0],
                depths[0][:, None],
                jnp.broadcast_to(extrinsics[0].reshape(1, 16), (hw, 16)),
            ],
            axis=-1,
        ),
        (0, 0),
    )
    valid = jnp.zeros((g0,), bool).at[:hw].set(True)

    start = 1
    for bv in buckets:
        gk = bv * hw
        if packed.shape[0] < gk:
            packed = jnp.concatenate(
                [packed,
                 jnp.zeros((gk - packed.shape[0], width), packed.dtype)]
            )
            valid = jnp.concatenate(
                [valid, jnp.zeros((gk - valid.shape[0],), bool)]
            )
        if bv <= start:
            continue
        xs = (
            jnp.arange(start, bv, dtype=jnp.int32),
            feats[start:bv], coords[start:bv], densities[start:bv],
            weights[start:bv], depths[start:bv], extrinsics[start:bv],
            intrinsics[start:bv],
        )
        packed, valid = seg(packed, valid, xs)
        start = bv

    g = v * hw
    return PTFState(
        feat=packed[:, :c],
        density=packed[:, c : c + 1],
        weight=packed[:, c + 1 : c + 2],
        coords=packed[:, c + 2 : c + 5],
        depth=packed[:, c + 5],
        extrinsics=packed[:, c + 6 : c + 22].reshape(g, 4, 4),
        valid=valid,
    )


def _fuse_one_view(
    packed: jnp.ndarray, valid: jnp.ndarray, c: int, i, hw: int,
    feat_i, coords_i, density_i, weight_i, depth_i,
    extrinsic_i, intrinsic_i, image_shape,
    gru_apply, depth_thres, pe_freqs,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    g = packed.shape[0]

    pix, z, in_bounds = _project_to_view(
        packed[:, c + 2 : c + 5], extrinsic_i, intrinsic_i, image_shape
    )
    proj_ok = in_bounds & valid
    seg = jnp.where(proj_ok, pix, hw)

    # Z-buffer: nearest projecting slot per pixel (reference's
    # scatter_reduce amin, :462-466).
    zmin = jax.ops.segment_min(
        jnp.where(proj_ok, z, jnp.inf), seg, num_segments=hw + 1
    )[:hw]

    # Winner slot per pixel (exact-equality tie like the reference).
    is_winner = proj_ok & (z == zmin[jnp.clip(pix, 0, hw - 1)])
    winner = jnp.full((hw,), g, jnp.int32)  # sentinel g
    winner = winner.at[jnp.where(is_winner, pix, hw)].set(
        jnp.arange(g, dtype=jnp.int32), mode="drop"
    )
    has_winner = winner < g

    # Depth-consistency match (|zbuf - pred| < max(5% pred, thres)).
    zbuf = jnp.where(jnp.isfinite(zmin), zmin, 1e4)
    fusion_mask = jnp.abs(zbuf - depth_i) < jnp.maximum(
        depth_i * 0.05, depth_thres
    )
    matched = fusion_mask & has_winner  # (HW,) pixels that merge

    # Gather the matched global slots' data (safe index for unmatched).
    # One packed row-gather; rows beat per-field scalar gathers.  No
    # optimization_barrier on the table: the packed buffer is the scan
    # carry (already materialized, XLA cannot fuse through it), and a
    # barrier here forces an extra live 2 GB copy per iteration at
    # whole-scene sizes (part of the 25 GB HBM plan this refactor fixed).
    wsafe = jnp.where(matched, winner, 0)
    gathered = packed[wsafe]
    g_feat = gathered[:, :c]
    g_density = gathered[:, c : c + 1]
    g_weight = gathered[:, c + 1 : c + 2]
    g_coords = gathered[:, c + 2 : c + 5]
    g_depth = gathered[:, c + 5]
    g_extr = gathered[:, c + 6 : c + 22].reshape(-1, 4, 4)

    # GRU latent fusion (reference :484-506): input = view pixel feature,
    # hidden = global feature; embeddings are PE of (density, weight) pairs.
    in_emb = positional_encoding(
        jnp.concatenate([g_density, weight_i], axis=-1), pe_freqs
    )
    hid_emb = positional_encoding(
        jnp.concatenate([density_i, g_weight], axis=-1), pe_freqs
    )
    fused_feat = gru_apply(feat_i, g_feat, in_emb, hid_emb)

    w0 = g_density  # (HW, 1)
    w1 = density_i
    denom = w0 + w1
    fused_coords = (g_coords * w0 + coords_i * w1) / denom
    fused_density = g_density + density_i
    fused_weight = g_weight + weight_i
    fused_extr = (g_extr * w0[..., None] + extrinsic_i[None] * w1[..., None]) / (
        denom[..., None]
    )
    fused_depth = (g_depth * w0[:, 0] + depth_i * w1[:, 0]) / denom[:, 0]

    # Scatter fused values back into the winning slots — ONE packed
    # row-scatter in the same (c+22)-wide layout as the gather above
    # (TPU scatters are row-rate-bound like gathers: six per-field
    # scatters of HW rows cost ~6x one packed scatter).
    widx = jnp.where(matched, winner, g)  # sentinel drops
    fused_packed = jnp.concatenate(
        [
            fused_feat,
            fused_density,
            fused_weight,
            fused_coords,
            fused_depth[:, None],
            fused_extr.reshape(-1, 16),
        ],
        axis=-1,
    )
    packed = packed.at[widx].set(fused_packed, mode="drop")

    # Unmerged pixels of view i claim their own slots (reference's append,
    # :508-519 — unmatched = pixels outside fusion_mask).  Written with
    # dynamic_update_slice so ``i`` may be a lax.scan tracer.
    new = ~fusion_mask  # (HW,)
    start = i * hw
    own_packed = jnp.where(
        new[:, None],
        jnp.concatenate(
            [
                feat_i,
                density_i,
                weight_i,
                coords_i,
                depth_i[:, None],
                jnp.broadcast_to(extrinsic_i.reshape(1, 16), (hw, 16)),
            ],
            axis=-1,
        ),
        0.0,
    )
    packed = jax.lax.dynamic_update_slice(packed, own_packed, (start, 0))

    valid = jax.lax.dynamic_update_slice(valid, new, (start,))
    return packed, valid
