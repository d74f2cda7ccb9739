"""Sharded Pixel-wise Triplet Fusion: the global Gaussian slot buffer
split over a device mesh (SURVEY §2.5 / §5: "PTF is the serialization
point — design it as a ring/scan over view shards, and shard the global
Gaussian set").

Each device owns the slot blocks of ``views_per_device`` views
(``g_local = views_per_device * HW`` slots).  Fusing view ``i`` is a
sequential step, but ALL per-slot work is local:

1. every device projects ITS slots into view i and z-buffers locally
   (``segment_min`` over g_local rows);
2. one ``pmin`` merges the per-pixel z-buffers over the mesh, and a
   second ``pmin`` over device ids breaks winner ties deterministically
   toward the lowest-ranked device;
3. the winning rows are assembled with one ``psum`` of an (HW, C+22)
   contribution (zeros on losing devices) — the only data exchanged;
4. the GRU fuse runs replicated (HW-bounded math), and each device
   scatters the fused rows into its own winning slots;
5. view i's owner device claims the unmatched pixels in its own block.

Per-view cost: O(g_local) local work + two (HW,) ``pmin`` and one
(HW, C+22) ``psum`` over ICI — the slot buffer never moves.

Numerics match ``models.ptf.fuse_views`` except winner TIE-BREAKING
among exactly-equal depths (both are within the reference's
nondeterministic-scatter spec, encoder_freesplat.py:462-466).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.networks import positional_encoding
from ..models.ptf import PTFState, _project_to_view


def fuse_views_sharded(
    feats: jnp.ndarray,  # (V, HW, C) replicated per-view inputs
    coords: jnp.ndarray,  # (V, HW, 3)
    densities: jnp.ndarray,  # (V, HW, 1)
    weights: jnp.ndarray,  # (V, HW, 1)
    depths: jnp.ndarray,  # (V, HW)
    extrinsics: jnp.ndarray,  # (V, 4, 4)
    intrinsics: jnp.ndarray,  # (V, 3, 3)
    image_shape: tuple[int, int],
    gru_apply,
    mesh: Mesh,
    axis: str = "shard",
    depth_thres: float = 0.1,
    pe_freqs: int = 6,
) -> PTFState:
    """Run PTF with the slot buffer sharded over ``mesh[axis]``; returns
    the standard (gathered) PTFState.  V must divide the axis size."""
    v, hw, c = feats.shape
    n_dev = mesh.shape[axis]
    assert v % n_dev == 0, f"views {v} must divide mesh axis {n_dev}"
    vpd = v // n_dev
    g_local = vpd * hw
    width = c + 22

    def shard_body(feats_r, coords_r, dens_r, wts_r, depths_r, extr_r, intr_r):
        dev = jax.lax.axis_index(axis)

        def pack(feat, dens, wt, crd, dpt, ext):
            return jnp.concatenate(
                [feat, dens, wt, crd, dpt[:, None], ext.reshape(-1, 16)],
                axis=-1,
            )

        def unpack(p):
            return (
                p[:, :c], p[:, c : c + 1], p[:, c + 1 : c + 2],
                p[:, c + 2 : c + 5], p[:, c + 5],
                p[:, c + 6 : c + 22].reshape(-1, 4, 4),
            )

        # Local slot buffer: views [dev*vpd, (dev+1)*vpd).  Initialize
        # with view 0 in its owner's block, everything else invalid.
        packed = jnp.zeros((g_local, width), feats_r.dtype)
        valid = jnp.zeros((g_local,), bool)
        own0 = pack(
            feats_r[0], dens_r[0], wts_r[0], coords_r[0], depths_r[0],
            jnp.broadcast_to(extr_r[0], (hw, 4, 4)),
        )
        is_owner0 = dev == 0
        packed = jax.lax.dynamic_update_slice(
            packed,
            jnp.where(is_owner0, own0, packed[:hw]),
            (0, 0),
        )
        valid = jax.lax.dynamic_update_slice(
            valid, jnp.where(is_owner0, jnp.ones((hw,), bool), valid[:hw]), (0,)
        )

        def body(carry, xs):
            packed, valid = carry
            (i, feat_i, coords_i, density_i, weight_i, depth_i,
             extr_i, intr_i) = xs

            crd = packed[:, c + 2 : c + 5]
            pix, z, in_bounds = _project_to_view(
                crd, extr_i, intr_i, image_shape
            )
            proj_ok = in_bounds & valid
            seg = jnp.where(proj_ok, pix, hw)
            zmin_l = jax.ops.segment_min(
                jnp.where(proj_ok, z, jnp.inf), seg, num_segments=hw + 1
            )[:hw]
            zmin = jax.lax.pmin(zmin_l, axis)  # (hw,) global z-buffer

            # Local winner among slots that tie the GLOBAL minimum.
            is_winner = proj_ok & (z == zmin[jnp.clip(pix, 0, hw - 1)])
            winner_l = jnp.full((hw,), g_local, jnp.int32)
            winner_l = winner_l.at[jnp.where(is_winner, pix, hw)].set(
                jnp.arange(g_local, dtype=jnp.int32), mode="drop"
            )
            has_local = winner_l < g_local
            # Cross-device tie-break: lowest device id with a local winner.
            dev_win = jax.lax.pmin(
                jnp.where(has_local, dev, n_dev).astype(jnp.int32), axis
            )
            i_win = has_local & (dev_win == dev)

            zbuf = jnp.where(jnp.isfinite(zmin), zmin, 1e4)
            fusion_mask = jnp.abs(zbuf - depth_i) < jnp.maximum(
                depth_i * 0.05, depth_thres
            )
            matched = fusion_mask & (dev_win < n_dev)
            mine = matched & i_win

            # Winning rows -> every device, via one psum'd contribution.
            wsafe = jnp.where(mine, winner_l, 0)
            contrib = jnp.where(mine[:, None], packed[wsafe], 0.0)
            gathered = jax.lax.psum(contrib, axis)  # (hw, width)
            g_feat, g_density, g_weight, g_coords, g_depth, g_extr = (
                unpack(gathered)
            )

            in_emb = positional_encoding(
                jnp.concatenate([g_density, weight_i], axis=-1), pe_freqs
            )
            hid_emb = positional_encoding(
                jnp.concatenate([density_i, g_weight], axis=-1), pe_freqs
            )
            fused_feat = gru_apply(feat_i, g_feat, in_emb, hid_emb)

            w0, w1 = g_density, density_i
            denom = w0 + w1
            fused_packed = pack(
                fused_feat,
                g_density + density_i,
                g_weight + weight_i,
                (g_coords * w0 + coords_i * w1) / denom,
                (g_depth * w0[:, 0] + depth_i * w1[:, 0]) / denom[:, 0],
                (g_extr * w0[..., None] + extr_i[None] * w1[..., None])
                / denom[..., None],
            )
            widx = jnp.where(mine, winner_l, g_local)  # sentinel drops
            packed = packed.at[widx].set(fused_packed, mode="drop")

            # Unmatched pixels claim view i's own block on its owner.
            new = ~fusion_mask
            own_packed = jnp.where(
                new[:, None],
                pack(
                    feat_i, density_i, weight_i, coords_i, depth_i,
                    jnp.broadcast_to(extr_i[None], (hw, 4, 4)),
                ),
                0.0,
            )
            local_view = i - dev * vpd
            is_owner = (local_view >= 0) & (local_view < vpd)
            start = jnp.clip(local_view, 0, vpd - 1) * hw
            cur_block = jax.lax.dynamic_slice(
                packed, (start, 0), (hw, width)
            )
            packed = jax.lax.dynamic_update_slice(
                packed,
                jnp.where(is_owner, own_packed, cur_block),
                (start, 0),
            )
            cur_valid = jax.lax.dynamic_slice(valid, (start,), (hw,))
            valid = jax.lax.dynamic_update_slice(
                valid, jnp.where(is_owner, new, cur_valid), (start,)
            )
            return (packed, valid), None

        xs = (
            jnp.arange(1, v, dtype=jnp.int32),
            feats_r[1:], coords_r[1:], dens_r[1:], wts_r[1:], depths_r[1:],
            extr_r[1:], intr_r[1:],
        )
        (packed, valid), _ = jax.lax.scan(body, (packed, valid), xs)
        # Gather the full buffer on every device (g = n_dev * g_local,
        # in device/view order = global view order).
        packed_g = jax.lax.all_gather(packed, axis).reshape(-1, width)
        valid_g = jax.lax.all_gather(valid, axis).reshape(-1)
        return packed_g, valid_g

    fn = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    packed, valid = fn(
        feats, coords, densities, weights, depths, extrinsics, intrinsics
    )
    return PTFState(
        feat=packed[:, :c],
        density=packed[:, c : c + 1],
        weight=packed[:, c + 1 : c + 2],
        coords=packed[:, c + 2 : c + 5],
        depth=packed[:, c + 5],
        extrinsics=packed[:, c + 6 : c + 22].reshape(-1, 4, 4),
        valid=valid,
    )
