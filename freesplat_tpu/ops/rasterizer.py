"""TPU-native differentiable Gaussian rasterizer (Pallas).

This is the production replacement for the reference's external CUDA
extension ``diff-gaussian-rasterization-w-depth`` (see
``/root/reference/src/model/decoder/cuda_splatting.py:100-127`` for the
behavioral contract).  It is *not* a port of the CUDA kernels — the design
is rebuilt around the TPU execution model:

1.  **Preprocessing** (``ops/rendering.py``) is plain jnp: XLA fuses the
    projection/EWA/SH math and JAX autodiff provides its gradients.
2.  **Binning** is vectorized jnp under ``stop_gradient``: per-Gaussian
    tile-bbox counts -> exclusive cumsum -> slot-to-gaussian decoding via
    ``searchsorted`` -> stable ``lax.sort`` by (tile, depth).  Tile ranges
    are padded to 128-instance alignment so kernel DMAs are lane-aligned.
    Static instance capacity; no dynamic shapes anywhere.
3.  **Compositing** is a Pallas kernel with a grid over 16x16 pixel tiles.
    Instance data is a transposed SoA array (``INST_ROWS`` = 16 rows x
    capacity: 10 data rows — mx my ca cb cc op r g b depth — plus 6
    alignment-pad rows) so each chunk DMA is a (16, 128) block.  Mosaic
    requires HBM memref slices to be 8-aligned along the sublane dim
    (hardware-verified: a 10-row dynamic-offset slice straddles the
    (8, 128) tiling and fails to compile), hence the pad to the next
    multiple of 8.  In-kernel arrays put the
    256 tile pixels on sublanes and the 128 chunk instances on lanes; the
    classically sequential front-to-back alpha blend becomes
    ``cumsum(log(1 - alpha))`` along lanes, computed with a triangular-ones
    matmul on the MXU — no scalar loop, no transposes anywhere.
4.  **Backward** is a second Pallas kernel walking chunks in reverse with
    a suffix-dot-product carry, resuming from the forward's saved stop
    state (final unmasked log transmittance + stop chunk, output channels
    5-6) so it never re-walks chunks forward and inherits the forward's
    early termination.  Because every sorted instance belongs to exactly
    one tile, per-instance gradients need no atomics; the
    instance->gaussian reduction is the autodiff transpose of the gather
    that built the instance array.

Numerics match the CUDA rasterizer spec: alpha cut at 1/255, clamp at
0.99, per-pixel termination when transmittance would drop below 1e-4
(including its effect on the background term).  Termination uses two
transmittance streams: an unmasked monotone one driving the threshold
test (sticky by construction) and a composited-only one for the output.
One deliberate difference vs CUDA: the gradient of the 0.99 alpha clamp
is the true subgradient (zero when clamped) rather than pass-through.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rendering import Screen, TILE, preprocess_gaussians

P = TILE * TILE  # pixels per tile = 256
CHUNK = 128  # instances blended per inner step (lane width)
LOG_TERM = math.log(1e-4)
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
# SoA rows: mx my ca cb cc op r g b depth (+6 pad).  10 rows carry data,
# but Mosaic requires HBM memref slices along the sublane dim to be
# 8-aligned (hardware-verified: a (10, 128) slice of the instance array
# fails to compile with "Slice shape along dimension 0 must be aligned
# to tiling (8)"), so the array is padded to the next multiple of 8.
INST_ROWS = 16
MAX_CHUNKS = 128  # per-tile instance cap = MAX_CHUNKS * CHUNK = 16384
# In-kernel MXU dot precision.  HIGHEST (exact fp32 contract) measured
# IDENTICAL in time to DEFAULT at the bench shape (r3 hardware A/B:
# 94.5 vs 93.4 ms fwd) — the kernels are VPU/dispatch-bound, not
# MXU-bound — so exactness is free.  Mosaic supports only DEFAULT and
# HIGHEST in-kernel (lowering.py:_dot_general_lowering_rule).
DOT_PRECISION = jax.lax.Precision.HIGHEST


class TileBinning(NamedTuple):
    sorted_ids: jnp.ndarray  # (acapacity,) int32 gaussian index per aligned slot
    slot_valid: jnp.ndarray  # (acapacity,) bool
    tile_start: jnp.ndarray  # (num_tiles,) int32 aligned first slot of tile
    tile_count: jnp.ndarray  # (num_tiles,) int32 real instances in tile
    num_instances: jnp.ndarray  # () int32 total instances (pre-clamp)
    # () int32 instances silently not rendered: capacity overflow (instances
    # past the static slot budget) + per-tile MAX_CHUNKS clamp.  SURVEY §7
    # hard part (2): overflow must be *reported*, not swallowed.
    dropped: jnp.ndarray


def _tile_grid(image_shape: tuple[int, int]) -> tuple[int, int]:
    h, w = image_shape
    return -(-h // TILE), -(-w // TILE)


def aligned_capacity(capacity: int, image_shape: tuple[int, int]) -> int:
    th, tw = _tile_grid(image_shape)
    capacity = -(-capacity // CHUNK) * CHUNK
    return capacity + CHUNK * th * tw  # worst-case per-tile alignment padding


def bin_gaussians(
    screen: Screen,
    image_shape: tuple[int, int],
    capacity: int,
    num_local_cols: int | None = None,
    col_offset: jnp.ndarray | int = 0,
) -> TileBinning:
    """Assign Gaussians to tiles, sorted by (tile, depth). Non-differentiable.

    ``capacity`` bounds the raw instance count; each tile's slot range is
    additionally padded to a CHUNK multiple so the kernel's DMAs stay
    lane-aligned (use ``aligned_capacity`` for the returned array length).

    ``num_local_cols``/``col_offset`` restrict binning to a slab of tile
    columns [col_offset, col_offset + num_local_cols) — the tile-sharded
    multi-chip path where each device rasterizes its own column slab.
    Tile indices in the result are row-major over (th, num_local_cols).
    """
    th, tw = _tile_grid(image_shape)
    if num_local_cols is None:
        num_local_cols = tw
    col_offset = jnp.asarray(col_offset, jnp.int32)
    num_tiles = th * num_local_cols
    acap = aligned_capacity(capacity, (image_shape[0], num_local_cols * TILE))

    mx = jax.lax.stop_gradient(screen.means2d[:, 0])
    my = jax.lax.stop_gradient(screen.means2d[:, 1])
    r = jax.lax.stop_gradient(screen.radii)
    depth = jax.lax.stop_gradient(screen.depths)
    ok = screen.mask & (r > 0)

    # CUDA getRect: rect_min = clamp(floor((p - r)/B)), rect_max =
    # clamp(floor((p + r + B - 1)/B)) — exclusive upper bound.
    x0 = jnp.clip(
        jnp.floor((mx - r) / TILE).astype(jnp.int32) - col_offset,
        0, num_local_cols,
    )
    y0 = jnp.clip(jnp.floor((my - r) / TILE), 0, th).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.floor((mx + r + TILE - 1) / TILE).astype(jnp.int32) - col_offset,
        0, num_local_cols,
    )
    y1 = jnp.clip(jnp.floor((my + r + TILE - 1) / TILE), 0, th).astype(jnp.int32)
    span_x = x1 - x0
    span_y = y1 - y0
    count = jnp.where(ok, span_x * span_y, 0).astype(jnp.int32)

    cum = jnp.cumsum(count)
    total = cum[-1]
    offsets = cum - count  # exclusive

    slots = jnp.arange(capacity, dtype=jnp.int32)
    # Run-length decode: gid[s] = #{i : cum[i] <= s} — scatter a marker at
    # each range boundary and prefix-sum.  O(capacity), no sort/search
    # (searchsorted with 786k queries costs a full sort on TPU).
    marker = jnp.zeros(capacity, jnp.int32).at[cum[:-1]].add(
        1, mode="drop"
    )
    gid = jnp.cumsum(marker)
    gid = jnp.minimum(gid, count.shape[0] - 1)
    valid = slots < total
    # One packed row-gather behind fusion barriers: XLA scalarizes gathers
    # it fuses with surrounding elementwise work (measured 2.7x slower);
    # standalone gathers hit the fast path.  All packed values are small
    # integers/f32, exact in float32.
    conics = jax.lax.stop_gradient(screen.conics)
    opac = jax.lax.stop_gradient(screen.opacities)
    # Per-instance exact ellipse-tile test threshold: a Gaussian's alpha
    # exceeds ALPHA_MIN only where its conic quadratic q(d) <= thresh =
    # 2 ln(op / ALPHA_MIN); tiles whose rect lies entirely outside that
    # level set are zero contributions (the kernel's per-pixel alpha cut
    # deletes them) and can be pruned with IDENTICAL output.
    thresh = 2.0 * jnp.log(jnp.maximum(opac, 1e-12) / (1.0 / 255.0))
    packed = jnp.stack(
        [
            offsets.astype(jnp.float32),
            x0.astype(jnp.float32),
            y0.astype(jnp.float32),
            jnp.maximum(span_x, 1).astype(jnp.float32),
            depth,
            mx,
            my,
            conics[:, 0],
            conics[:, 1],
            conics[:, 2],
            thresh,
        ],
        axis=-1,
    )
    packed, gid_b = jax.lax.optimization_barrier((packed, gid))
    gathered = jax.lax.optimization_barrier(packed[gid_b])
    offs_g = gathered[:, 0].astype(jnp.int32)
    x0_g = gathered[:, 1].astype(jnp.int32)
    y0_g = gathered[:, 2].astype(jnp.int32)
    sw = gathered[:, 3]
    depth_g = gathered[:, 4]
    local = slots - offs_g
    # Integer div/mod with a dynamic divisor has no TPU hardware path (XLA
    # emits a bit-serial loop); exact float32 division runs on the VPU.
    lq = jnp.floor(local.astype(jnp.float32) / sw).astype(jnp.int32)
    ty = y0_g + lq
    tx = x0_g + (local - lq * sw.astype(jnp.int32))

    # Exact ellipse-rect intersection: min of the (convex) conic quadratic
    # over the tile's pixel rect, via the clamped stationary point on each
    # edge (exact for a 1-D convex quadratic), 0 if the mean is inside.
    # Prune the instance when even that minimum exceeds the alpha-cut
    # threshold — at the bench distribution this removes ~a quarter of
    # the bbox-rect instances the kernel would otherwise walk.
    mxg = gathered[:, 5]
    myg = gathered[:, 6]
    ca_g = jnp.maximum(gathered[:, 7], 1e-12)
    cb_g = gathered[:, 8]
    cc_g = jnp.maximum(gathered[:, 9], 1e-12)
    thr_g = gathered[:, 10]
    rx0 = (col_offset + tx).astype(jnp.float32) * TILE - mxg
    ry0 = ty.astype(jnp.float32) * TILE - myg
    rx1 = rx0 + (TILE - 1)
    ry1 = ry0 + (TILE - 1)

    def qval(dx, dy):
        return ca_g * dx * dx + 2.0 * cb_g * dx * dy + cc_g * dy * dy

    def edge_x(dx):  # min over dy in [ry0, ry1] at fixed dx
        return qval(dx, jnp.clip(-cb_g * dx / cc_g, ry0, ry1))

    def edge_y(dy):
        return qval(jnp.clip(-cb_g * dy / ca_g, rx0, rx1), dy)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(rx0), edge_x(rx1)),
        jnp.minimum(edge_y(ry0), edge_y(ry1)),
    )
    inside = (rx0 <= 0) & (rx1 >= 0) & (ry0 <= 0) & (ry1 >= 0)
    keep = inside | (qmin <= thr_g)

    tile = jnp.where(
        valid & keep, ty * num_local_cols + tx, num_tiles
    ).astype(jnp.int32)
    inst_depth = jnp.where(valid & keep, depth_g, jnp.inf).astype(jnp.float32)

    sorted_tile, _, sorted_gid = jax.lax.sort(
        (tile, inst_depth, gid), num_keys=2, is_stable=True
    )
    # Few queries (num_tiles + 1) -> binary search is cheap here.
    edges = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    raw_start = edges[:-1]
    tile_count = edges[1:] - edges[:-1]

    # Aligned layout: each tile's range padded up to a CHUNK multiple.
    acount = -(-tile_count // CHUNK) * CHUNK
    astart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(acount)[:-1].astype(jnp.int32)]
    )

    # Gather raw sorted slots into the aligned layout (owner via the same
    # run-length decode: marker at each tile's aligned start).
    aslots = jnp.arange(acap, dtype=jnp.int32)
    owner_marker = jnp.zeros(acap, jnp.int32).at[astart[1:]].add(1, mode="drop")
    owner = jnp.clip(
        jnp.cumsum(owner_marker), 0, num_tiles - 1
    ).astype(jnp.int32)
    small = jnp.stack(
        [
            astart.astype(jnp.float32),
            tile_count.astype(jnp.float32),
            raw_start.astype(jnp.float32),
        ],
        axis=-1,
    )
    small, owner_b = jax.lax.optimization_barrier((small, owner))
    og = jax.lax.optimization_barrier(small[owner_b])
    alocal = aslots - og[:, 0].astype(jnp.int32)
    avalid = (alocal >= 0) & (alocal < og[:, 1].astype(jnp.int32))
    src = jnp.clip(og[:, 2].astype(jnp.int32) + alocal, 0, capacity - 1)
    sg_b, src_b = jax.lax.optimization_barrier((sorted_gid, src))
    aligned_ids = jnp.where(
        avalid, jax.lax.optimization_barrier(sg_b[src_b]), 0
    )

    cap_dropped = jnp.maximum(total - capacity, 0)
    clamp_dropped = jnp.sum(jnp.maximum(tile_count - MAX_CHUNKS * CHUNK, 0))
    return TileBinning(
        sorted_ids=aligned_ids,
        slot_valid=avalid,
        tile_start=astart,
        tile_count=tile_count,
        num_instances=total,
        dropped=(cap_dropped + clamp_dropped).astype(jnp.int32),
    )


def build_instance_rows(screen: Screen, binning: TileBinning) -> jnp.ndarray:
    """Gather the transposed SoA instance array (INST_ROWS, acapacity).

    Differentiable w.r.t. the screen quantities (the autodiff transpose of
    this gather performs the instance->gaussian gradient reduction).
    Row order: mx, my, conic_a, conic_b, conic_c, opacity, r, g, b, depth.
    Invalid slots are zeroed (opacity 0 => no contribution).
    """
    packed = jnp.concatenate(
        [
            screen.means2d,
            screen.conics,
            screen.opacities[:, None],
            screen.colors,
            screen.depths[:, None],
        ],
        axis=-1,
    ).astype(jnp.float32)  # (n, 10) — a single row-gather beats 10 scalar ones
    packed, ids = jax.lax.optimization_barrier((packed, binning.sorted_ids))
    rows = jnp.swapaxes(
        jax.lax.optimization_barrier(packed[ids]), 0, 1
    )  # (10, acap)
    rows = jnp.where(binning.slot_valid[None, :], rows, 0.0)
    rows = jnp.pad(rows, ((0, INST_ROWS - rows.shape[0]), (0, 0)))
    return rows


def _pixel_coords(tile_id, tw_local, col_off):
    """Per-tile pixel coordinates as (P, 1) f32 columns (pixels on sublanes).

    ``tile_id`` is row-major over a (th, tw_local) LOCAL tile grid whose
    first column sits at absolute tile column ``col_off`` (tile-sharded
    multi-chip rendering renders a column slab per device)."""
    tx = col_off + tile_id % tw_local
    ty = tile_id // tw_local
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * TILE + pix % TILE).astype(jnp.float32)
    py = (ty * TILE + pix // TILE).astype(jnp.float32)
    return px, py


def _lane_cumsum(x):
    """Inclusive cumsum along the lane (instance) axis of (P, CHUNK).

    Triangular-ones matmul on the MXU: although a roll-based doubling scan
    needs fewer raw ops, the matmul overlaps with VPU work in the kernel
    pipeline while the scan serializes on the VPU (measured ~6% slower
    end-to-end), so the MXU form wins.
    """
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=DOT_PRECISION,
    )


def _chunk_alphas(data, px, py, base, cnt):
    """Shared per-chunk math.  data: (INST_ROWS, CHUNK) VMEM block.

    Returns per-(pixel, instance) arrays of shape (P, CHUNK).
    """
    mx, my = data[0:1, :], data[1:2, :]
    ca, cb, cc = data[2:3, :], data[3:4, :], data[4:5, :]
    op = data[5:6, :]
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    in_range = idx < cnt

    dx = px - mx  # (P, CHUNK)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha_u = op * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, alpha_u)
    dead = (power > 0.0) | (alpha < ALPHA_MIN) | jnp.logical_not(in_range)
    alpha = jnp.where(dead, 0.0, alpha)
    l1m = jnp.log1p(-alpha)
    cum_incl = _lane_cumsum(l1m)
    return dx, dy, power, alpha_u, alpha, l1m, cum_incl, dead


def _forward_kernel(start_ref, cnt_ref, tw_ref, inst_hbm, out_ref, chunk_vmem, sem):
    t = pl.program_id(0)
    start = start_ref[t]
    cnt = jnp.minimum(cnt_ref[t], MAX_CHUNKS * CHUNK)
    n_chunks = pl.cdiv(cnt, CHUNK)
    px, py = _pixel_coords(t, tw_ref[0], tw_ref[1])

    def dma(c, slot):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(pl.multiple_of(start + c * CHUNK, CHUNK), CHUNK)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    # Two transmittance streams: ``log_t_all`` accumulates every blended
    # alpha (monotone -> the CUDA termination test, sticky by construction);
    # ``log_t_eff`` accumulates only *composited* alphas (the actual output
    # transmittance — a terminated pixel keeps its pre-termination T).
    # DMA is double-buffered: chunk c+1 streams in while c composites.
    def body(carry):
        c, log_t_all, log_t_eff, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1, 1 - slot).start()

        dma(c, slot).wait()
        data = chunk_vmem[slot]
        _, _, _, _, alpha, l1m, cum_incl, _ = _chunk_alphas(
            data, px, py, c * CHUNK, cnt
        )
        t_incl = jnp.exp(log_t_all + cum_incl)
        alive = t_incl >= 1e-4
        w = jnp.where(alive, alpha * jnp.exp(log_t_all + cum_incl - l1m), 0.0)
        cols = data[6:10, :]  # r g b depth (4, CHUNK)
        acc = acc + jax.lax.dot_general(
            w, cols, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=DOT_PRECISION
        )  # (P, 4)
        log_t_all = log_t_all + jnp.sum(l1m, axis=1, keepdims=True)
        log_t_eff = log_t_eff + jnp.sum(
            jnp.where(alive, l1m, 0.0), axis=1, keepdims=True
        )
        return c + 1, log_t_all, log_t_eff, acc

    def cond(carry):
        c, log_t_all, _, _ = carry
        return jnp.logical_and(c < n_chunks, jnp.max(log_t_all) > LOG_TERM)

    init = (
        jnp.int32(0),
        jnp.zeros((P, 1), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),
        jnp.zeros((P, 4), jnp.float32),
    )
    c_stop, log_t_all, log_t_eff, acc = jax.lax.while_loop(cond, body, init)

    # Early termination leaves the prefetched chunk's DMA in flight.
    @pl.when(c_stop < n_chunks)
    def _():
        dma(c_stop, jax.lax.rem(c_stop, 2)).wait()

    out_ref[0, :, 0:4] = acc
    out_ref[0, :, 4:5] = log_t_eff
    # Backward residuals: the unmasked log transmittance after the last
    # composited chunk and the stop-chunk index.  The backward kernel
    # resumes its reverse walk from exactly this state instead of
    # re-walking every chunk forward to recompute it (and chunks past
    # c_stop have identically zero gradient: every pixel's unmasked T is
    # already below the termination threshold).
    out_ref[0, :, 5:6] = log_t_all
    out_ref[0, :, 6:7] = jnp.full((P, 1), c_stop.astype(jnp.float32))
    out_ref[0, :, 7:8] = jnp.zeros((P, 1), jnp.float32)


def _backward_kernel(
    start_ref, cnt_ref, tw_ref, cstop_ref, inst_hbm, fwd_ref, cot_ref,
    dinst_hbm, chunk_vmem, dchunk_vmem, in_sem, out_sem,
):
    t = pl.program_id(0)
    start = start_ref[t]
    cnt = jnp.minimum(cnt_ref[t], MAX_CHUNKS * CHUNK)
    n_chunks = pl.cdiv(cnt, CHUNK)
    px, py = _pixel_coords(t, tw_ref[0], tw_ref[1])

    gvec = cot_ref[0, :, 0:4]  # dL/d[r,g,b,depth] (P, 4)
    g_logt = cot_ref[0, :, 4:5]  # dL/dlogT (P, 1)

    # Moment basis for the per-instance gradient reductions: every one of
    # the six sublane sums (dop, dmx, dmy, dca, dcb, dcc) is a polynomial
    # moment of dpow against pixel coordinates, so a single
    # (6, P) x (P, CHUNK) MXU dot replaces six VPU reductions plus their
    # elementwise products (measured: the reductions were the gap between
    # the 19 ms backward kernel and its ~9 ms VPU floor).  TILE-LOCAL
    # coordinates keep the moment magnitudes ~16 so the recombination
    # (T1 - mx_loc * T0, ...) does not cancel catastrophically in f32.
    # Built PRE-TRANSPOSED as (8, P): contracting dim 0 of a narrow (P, 6)
    # operand made Mosaic re-lay it out inside every loop iteration
    # (measured: backward 90 ms -> 770 ms at the bench shape).  As (8, P)
    # — 8 sublanes (one native tile row), P on lanes — the dot below is a
    # clean (8, 256) x (256, CHUNK) MXU matmul.  Rows 6-7 are zero pad.
    pixr = jax.lax.broadcasted_iota(jnp.int32, (8, P), 1)
    plx = (pixr % TILE).astype(jnp.float32)  # px - tile_x0, in [0, TILE)
    ply = (pixr // TILE).astype(jnp.float32)  # py - tile_y0
    sel = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
    moment_u = jnp.where(
        sel == 0, 1.0,
        jnp.where(
            sel == 1, plx,
            jnp.where(
                sel == 2, ply,
                jnp.where(
                    sel == 3, plx * plx,
                    jnp.where(sel == 4, ply * ply,
                              jnp.where(sel == 5, plx * ply, 0.0)),
                ),
            ),
        ),
    )  # (8, P) constant per tile
    tile_x0 = ((tw_ref[1] + t % tw_ref[0]) * TILE).astype(jnp.float32)
    tile_y0 = (t // tw_ref[0] * TILE).astype(jnp.float32)

    def in_dma(c, slot):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(pl.multiple_of(start + c * CHUNK, CHUNK), CHUNK)],
            chunk_vmem.at[slot],
            in_sem.at[slot],
        )

    # Reverse walk from the forward's stop chunk.  The forward saved the
    # unmasked log transmittance after its last composited chunk (channel
    # 5) and the stop-chunk index (prefetched per tile), so no forward
    # recompute walk is needed, and chunks past the stop have identically
    # zero gradient (every pixel's unmasked T is below the termination
    # threshold there) — the wrapper zeroes their dinst slots.  Carry the
    # suffix-dot accumulator and the log transmittance at the END of the
    # current chunk; the chunk-start value is recovered by subtracting
    # the chunk's own sum (the log-space analog of the CUDA backward's
    # division-based recompute).
    n_loop = jnp.minimum(cstop_ref[t], n_chunks)
    log_t_final = fwd_ref[0, :, 5:6]

    @pl.when(n_loop > 0)
    def _():
        in_dma(n_loop - 1, jax.lax.rem(n_loop - 1, 2)).start()

    def bwd_body(i, carry):
        sdot, log_t_end = carry
        c = n_loop - 1 - i
        slot = jax.lax.rem(c, 2)

        @pl.when(c - 1 >= 0)
        def _():
            in_dma(c - 1, 1 - slot).start()

        in_dma(c, slot).wait()
        data = chunk_vmem[slot]
        dx, dy, power, alpha_u, alpha, l1m, cum_incl, dead = _chunk_alphas(
            data, px, py, c * CHUNK, cnt
        )
        log_t0 = log_t_end - jnp.sum(l1m, axis=1, keepdims=True)
        ca, cb, cc = data[2:3, :], data[3:4, :], data[4:5, :]
        cols = data[6:10, :]  # (4, CHUNK)

        t_incl = jnp.exp(log_t0 + cum_incl)
        alive = t_incl >= 1e-4
        t_excl = jnp.exp(log_t0 + cum_incl - l1m)
        w = jnp.where(alive, alpha * t_excl, 0.0)  # (P, CHUNK)

        # Per-instance color/depth cotangent: (4, CHUNK) = gvec^T . w.
        dcols = jax.lax.dot_general(
            gvec, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=DOT_PRECISION
        )
        # g . c_i per pixel: (P, CHUNK) = gvec . cols.
        cdotg = jax.lax.dot_general(
            gvec, cols, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=DOT_PRECISION
        )
        q = w * cdotg
        # Strict suffix over instances = row total - inclusive cumsum.
        suffix = jnp.sum(q, axis=1, keepdims=True) - _lane_cumsum(q)
        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        contrib = jnp.logical_and(alive, jnp.logical_not(dead))
        dalpha = jnp.where(
            contrib,
            cdotg * t_excl - (suffix + sdot + g_logt) / one_minus,
            0.0,
        )
        unclamped = alpha_u <= ALPHA_MAX
        dpow = jnp.where(unclamped, dalpha * alpha_u, 0.0)
        # Six polynomial moments of dpow in ONE MXU dot (see moment_u
        # above): T_k = sum_p dpow[p, i] * u_k[p], u = [1, x, y, x^2,
        # y^2, xy] in tile-local pixel coordinates.  All per-instance
        # gradient sums are lane-wise recombinations of these:
        #   sum dpow*dx = T1 - mxl*T0      (dx = x - mxl)
        #   sum dpow*dx*dx = T3 - 2 mxl T1 + mxl^2 T0, etc.
        # and dop = sum(dalpha * exp(power)) = sum(dpow) / op (op is
        # constant along pixels; dpow is zero wherever dalpha is).
        moments = jax.lax.dot_general(
            moment_u, dpow, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=DOT_PRECISION,
        )  # (8, CHUNK); rows 6-7 are zero (pad rows of moment_u)
        t0, t1, t2 = moments[0:1], moments[1:2], moments[2:3]
        t3, t4, t5 = moments[3:4], moments[4:5], moments[5:6]
        op = data[5:6, :]
        mxl = data[0:1, :] - tile_x0  # mean in tile-local coords
        myl = data[1:2, :] - tile_y0
        s1 = t1 - mxl * t0
        s2 = t2 - myl * t0
        dop = jnp.where(op > 0.0, t0 / jnp.where(op > 0.0, op, 1.0), 0.0)
        dmx = ca * s1 + cb * s2
        dmy = cc * s2 + cb * s1
        dca = -0.5 * (t3 - 2.0 * mxl * t1 + mxl * mxl * t0)
        dcb = -(t5 - mxl * t2 - myl * t1 + mxl * myl * t0)
        dcc = -0.5 * (t4 - 2.0 * myl * t2 + myl * myl * t0)

        def out_dma(cc, oslot):
            return pltpu.make_async_copy(
                dchunk_vmem.at[oslot],
                dinst_hbm.at[:, pl.ds(pl.multiple_of(start + cc * CHUNK, CHUNK), CHUNK)],
                out_sem.at[oslot],
            )

        # Wait for the write started two iterations ago before reusing
        # this output buffer.
        @pl.when(i >= 2)
        def _():
            out_dma(c + 2, slot).wait()

        dchunk_vmem[slot, 0:1, :] = dmx
        dchunk_vmem[slot, 1:2, :] = dmy
        dchunk_vmem[slot, 2:3, :] = dca
        dchunk_vmem[slot, 3:4, :] = dcb
        dchunk_vmem[slot, 4:5, :] = dcc
        dchunk_vmem[slot, 5:6, :] = dop
        dchunk_vmem[slot, 6:10, :] = dcols
        if INST_ROWS > 10:  # zero the DMA-alignment pad rows
            dchunk_vmem[slot, 10:INST_ROWS, :] = jnp.zeros(
                (INST_ROWS - 10, CHUNK), jnp.float32
            )
        out_dma(c, slot).start()
        return sdot + jnp.sum(q, axis=1, keepdims=True), log_t0

    jax.lax.fori_loop(
        0, n_loop, bwd_body,
        (jnp.zeros((P, 1), jnp.float32), log_t_final),
    )

    # Drain the last (up to two) in-flight output writes.
    @pl.when(n_loop > 0)
    def _():
        pltpu.make_async_copy(
            dchunk_vmem.at[0],
            dinst_hbm.at[:, pl.ds(pl.multiple_of(start, CHUNK), CHUNK)],
            out_sem.at[0],
        ).wait()

    @pl.when(n_loop > 1)
    def _():
        pltpu.make_async_copy(
            dchunk_vmem.at[1],
            dinst_hbm.at[:, pl.ds(pl.multiple_of(start + CHUNK, CHUNK), CHUNK)],
            out_sem.at[1],
        ).wait()


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rasterize_tiles(inst, tile_start, tile_count, tw_arr, num_tiles):
    return _rasterize_tiles_fwd_impl(inst, tile_start, tile_count, tw_arr, num_tiles)


def _rasterize_tiles_fwd_impl(inst, tile_start, tile_count, tw_arr, num_tiles):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, INST_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _forward_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, P, 8), jnp.float32),
        interpret=_use_interpret(),
    )(tile_start, tile_count, tw_arr, inst)


def _rasterize_tiles_fwd(inst, tile_start, tile_count, tw_arr, num_tiles):
    out = _rasterize_tiles_fwd_impl(inst, tile_start, tile_count, tw_arr, num_tiles)
    return out, (inst, tile_start, tile_count, tw_arr, out)


def _rasterize_tiles_bwd(num_tiles, residuals, cot):
    inst, tile_start, tile_count, tw_arr, fwd_out = residuals
    # Per-tile stop chunk saved by the forward (channel 6, replicated over
    # the tile's pixels) — the backward resumes its reverse walk there.
    c_stop = jax.lax.stop_gradient(fwd_out[:, 0, 6]).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, INST_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, INST_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dinst = pl.pallas_call(
        _backward_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(inst.shape, jnp.float32),
        interpret=_use_interpret(),
    )(tile_start, tile_count, tw_arr, c_stop, inst, fwd_out, cot)
    # Aligned slots never written by any tile program (per-tile alignment
    # padding beyond the chunk-rounded count, the MAX_CHUNKS clamp, and
    # chunks past the forward's stop chunk) keep undefined values — zero
    # them.
    acap = inst.shape[1]
    slots = jnp.arange(acap, dtype=jnp.int32)
    owner_marker = jnp.zeros(acap, jnp.int32).at[tile_start[1:]].add(
        1, mode="drop"
    )
    owner = jnp.clip(jnp.cumsum(owner_marker), 0, num_tiles - 1)
    local = slots - tile_start[owner]
    written = jnp.minimum(
        jnp.minimum(
            -(-jnp.minimum(tile_count, MAX_CHUNKS * CHUNK) // CHUNK) * CHUNK,
            MAX_CHUNKS * CHUNK,
        ),
        c_stop * CHUNK,
    )
    covered = (local >= 0) & (local < written[owner])
    dinst = jnp.where(covered[None, :], dinst, 0.0)
    return dinst, None, None, None


_rasterize_tiles.defvjp(_rasterize_tiles_fwd, _rasterize_tiles_bwd)


def rasterize(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    harmonics: jnp.ndarray,
    opacities: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_shape: tuple[int, int],
    background: jnp.ndarray,
    sh_degree: int,
    capacity: int | None = None,
    return_stats: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """Render one view with the Pallas tile rasterizer.

    Same contract as ``rasterizer_ref.render_reference``: returns
    (color (h, w, 3), accumulated depth (h, w), alpha (h, w)).  Depth is
    the unnormalized expected view-space z.  ``capacity`` is the static
    tile-instance budget (default max(3*n, 32768)).  With ``return_stats``
    a fourth
    element is appended: {"dropped": () int32, "num_instances": () int32}
    — instances silently truncated by the capacity / MAX_CHUNKS clamps
    (callers should log/warn when nonzero and raise ``capacity``).

    Default capacity is 3*n: every XLA-side stage around the kernel (the
    (tile, depth) sort, the instance-row gather, and its scatter-add
    transpose in the backward) scales with the STATIC capacity, not the
    actual instance count — 8*n measured 370 ms fwd+bwd where 2*n
    measures 98 ms at the bench shape (docs/PERFORMANCE.md r3).  Drops
    are *reported*, never silent, so an undersized budget is visible.
    """
    h, w = image_shape
    n = means.shape[0]
    if capacity is None:
        # 3*n for production scenes (per-pixel Gaussians: instances/gaussian
        # ~2-3 at 16px tiles); floor of 32k slots so small dense scenes
        # (tests, demos: few gaussians with huge splats) never drop.
        capacity = max(3 * n, 32768)
    capacity = -(-capacity // CHUNK) * CHUNK

    screen = preprocess_gaussians(
        means, covariances, harmonics, opacities, extrinsics, intrinsics,
        image_shape, sh_degree,
    )
    binning = bin_gaussians(screen, image_shape, capacity)
    inst = build_instance_rows(screen, binning)

    th, tw = _tile_grid(image_shape)
    tw_arr = jnp.array([tw, 0], jnp.int32)
    out = _rasterize_tiles(
        inst, binning.tile_start, binning.tile_count, tw_arr, th * tw
    )

    # (num_tiles, P, 8) -> (h, w, channels)
    img = out.reshape(th, tw, TILE, TILE, 8)
    img = img.transpose(0, 2, 1, 3, 4).reshape(th * TILE, tw * TILE, 8)
    img = img[:h, :w]
    color = img[..., 0:3]
    depth = img[..., 3]
    log_t = img[..., 4]
    t_final = jnp.exp(log_t)
    color = color + t_final[..., None] * background
    if return_stats:
        stats = {
            "dropped": binning.dropped,
            "num_instances": binning.num_instances,
        }
        return color, depth, 1.0 - t_final, stats
    return color, depth, 1.0 - t_final
