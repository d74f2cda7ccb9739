"""Training runtime: jitted train step + host loop + checkpointing.

The TPU-native replacement for the reference's PyTorch-Lightning
``ModelWrapper`` (``src/model/model_wrapper.py``): one jitted
``train_step`` (encoder -> render -> loss -> grad -> optax update), a
plain host loop with step tracking (the reference needed a shared-memory
StepTracker to reach dataloader workers; here sampling happens in the
host loop so the step is just a value), and orbax checkpointing with
non-strict partial restore.
"""
from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core as flax_core

from ..models.decoder import DecoderCfg, render_views
from ..models.encoder import EncoderFreeSplat, EncoderFreeSplatCfg
from .losses import LossCfg, total_loss
from .metrics import compute_psnr
from .schedule import OptimizerCfg, make_optimizer


@dataclass(frozen=True)
class TrainCfg:
    encoder: EncoderFreeSplatCfg = field(default_factory=EncoderFreeSplatCfg)
    decoder: DecoderCfg = field(default_factory=DecoderCfg)
    loss: LossCfg = field(default_factory=LossCfg)
    optimizer: OptimizerCfg = field(default_factory=OptimizerCfg)
    log_every: int = 10


class TrainState(flax_core.FrozenDict):
    pass


def init_state(cfg: TrainCfg, rng: jax.Array, example_batch: dict) -> dict:
    encoder = EncoderFreeSplat(cfg.encoder)
    # Flax init runs the forward EAGERLY (no XLA memory planning): at
    # whole-scene shapes (30 views x 384x512) the unplanned intermediates
    # exceed HBM.  Every parameter shape is resolution- and view-count-
    # independent (convs / per-pixel MLPs / GRU), so init on a miniature
    # context — views capped at num_views (same source-selection branch
    # arity), 64x64 pixels — and apply at full size.
    real = example_batch["context"]
    b_v = real["image"].shape[:2]
    v_mini = min(b_v[1], cfg.encoder.num_views)
    hm = wm = 64
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, v_mini, 1, 1))
    extr = extr.at[:, :, 0, 3].set(
        jnp.linspace(0.0, 0.1, v_mini)[None]
    )  # distinct poses: keep nearest-k ordering well defined
    context = {
        "image": jnp.zeros((1, v_mini, hm, wm, 3), jnp.float32),
        "intrinsics": jnp.tile(
            jnp.asarray(
                [[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32
            ),
            (1, v_mini, 1, 1),
        ),
        "extrinsics": extr,
        "near": jnp.full((1, v_mini), float(np.asarray(real["near"]).flat[0])),
        "far": jnp.full((1, v_mini), float(np.asarray(real["far"]).flat[0])),
    }
    variables = encoder.init(rng, context)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg.optimizer)
    opt_state = tx.init(params)
    return {
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": opt_state,
        "step": jnp.zeros((), jnp.int32),
    }


def make_train_step(
    cfg: TrainCfg, lpips_params: Any = None, mesh: Any = None
) -> Callable[[dict, dict], tuple[dict, dict]]:
    """Jitted train step.  With ``mesh`` (a 1-D ``("data",)`` mesh) the
    step is partitioned SPMD: batch sharded on its leading axis, state
    replicated, gradient psum inserted by XLA — the product path behind
    ``__graft_entry__.dryrun_multichip`` and multi-chip ``fit``.  A mesh
    of size 1 compiles to the identical single-chip program."""
    encoder = EncoderFreeSplat(cfg.encoder)
    tx = make_optimizer(cfg.optimizer)

    def loss_fn(params, batch_stats, batch, step):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if batch_stats else []
        results, updates = encoder.apply(
            variables, batch["context"], mutable=mutable
        )
        target = batch["target"]
        h, w = target["image"].shape[2:4]
        output = render_views(
            cfg.decoder,
            results["gaussians"],
            target["extrinsics"],
            target["intrinsics"],
            target["near"],
            target["far"],
            (h, w),
        )
        depth_ctx = None
        dc = cfg.loss.depth
        if dc is not None and (
            dc.ms_gradient_weight
            or dc.scale_invariant_weight
            or dc.normals_weight
            or dc.mv_consistency_weight
        ):
            depth_ctx = {
                "rendered_depth": output.depth,
                "gt_depth": target.get("depth"),
                "intrinsics": target["intrinsics"],
                "enc_depth": results.get("depth_s-1"),
                "ctx_extrinsics": batch["context"]["extrinsics"],
                "ctx_intrinsics": batch["context"]["intrinsics"],
            }
        loss, parts = total_loss(
            cfg.loss, output.color, target["image"], step, lpips_params,
            depth_ctx=depth_ctx,
        )
        new_stats = updates.get("batch_stats", batch_stats) if mutable else batch_stats
        aux = {
            "loss_parts": parts,
            "psnr": compute_psnr(
                target["image"].reshape(-1, h, w, 3),
                output.color.reshape(-1, h, w, 3),
            ).mean(),
            "gs_ratio": jnp.mean(results["gs_ratio"]),
            "num_gaussians": jnp.mean(
                results["num_gaussians"].astype(jnp.float32)
            ),
            # Rasterizer truncation counter (SURVEY §7 hard part 2): total
            # instances silently dropped by capacity / MAX_CHUNKS clamps
            # across all rendered views.  Nonzero => raise capacity_factor.
            "dropped_instances": jnp.sum(output.dropped),
            "batch_stats": new_stats,
        }
        return loss, aux

    jit_kwargs: dict = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        jit_kwargs = dict(
            in_shardings=(rep, data),
            out_shardings=(rep, rep),
        )

    @functools.partial(jax.jit, **jit_kwargs)
    def train_step(state: dict, batch: dict):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], state["batch_stats"], batch, state["step"]
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "batch_stats": aux["batch_stats"],
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        metrics = {
            "loss": loss,
            "psnr": aux["psnr"],
            "gs_ratio": aux["gs_ratio"],
            "num_gaussians": aux["num_gaussians"],
            "dropped_instances": aux["dropped_instances"],
            **{f"loss_{k}": v for k, v in aux["loss_parts"].items()},
        }
        return new_state, metrics

    return train_step


def fit(
    cfg: TrainCfg,
    state: dict,
    batches: Iterator[dict],
    max_steps: int,
    lpips_params: Any = None,
    log_fn: Callable[[int, dict], None] | None = None,
    checkpoint_fn: Callable[[int, dict], None] | None = None,
    checkpoint_every: int = 10_000,
    val_fn: Callable[[int, dict], None] | None = None,
    val_every: int = 5_000,
    mesh: Any = None,
) -> dict:
    """Host training loop (the Lightning-fit equivalent).

    With ``mesh``, every batch is sharded over the mesh's data axis and
    the state replicated before stepping (SPMD data parallelism; the
    global batch's leading dim must divide by the mesh size)."""
    train_step = make_train_step(cfg, lpips_params, mesh=mesh)
    if mesh is not None:
        from ..parallel.distributed import replicate_state, shard_batch

        state = replicate_state(mesh, state)

    # The host tracks the step itself: fetching state["step"] (or any
    # metric) from the device each iteration would block the dispatch
    # loop on the in-flight update and serialize host and device.
    # Metrics are logged one interval LATE — by the time the next log
    # point arrives the values are already on the host side of the
    # pipeline, so the fetch is (nearly) free.
    step = int(state["step"])
    pending: tuple[int, dict, float] | None = None  # (step, refs, t_done)

    def emit(entry):
        p_step, refs, dt = entry
        vals = {k: float(v) for k, v in refs.items()}
        vals["steps_per_s"] = cfg.log_every / max(dt, 1e-9)
        if vals.get("dropped_instances", 0) > 0:
            print(
                f"WARNING step {p_step}: rasterizer dropped "
                f"{int(vals['dropped_instances'])} instances "
                "(capacity/MAX_CHUNKS overflow) — raise "
                "decoder.capacity_factor",
                flush=True,
            )
        log_fn(p_step, vals)

    t0 = time.time()
    for batch in batches:
        if step >= max_steps:
            break
        # Strip host-only fields (scene names, fvs split) before jit.
        array_batch = {
            k: {
                kk: vv
                for kk, vv in v.items()
                if kk not in ("test_fvs",)
            }
            for k, v in batch.items()
            if k in ("context", "target")
        }
        if mesh is not None:
            array_batch = shard_batch(mesh, array_batch)
        state, metrics = train_step(state, array_batch)
        if log_fn is not None and step % cfg.log_every == 0:
            if pending is not None:
                emit(pending)
            pending = (step, metrics, time.time() - t0)
            t0 = time.time()
        elif pending is not None and step - pending[0] >= 64:
            # Backpressure: don't let the host run more than ~64 steps
            # (and their queued batches) ahead of the device.
            emit(pending)
            pending = None
        sync = (
            (checkpoint_fn is not None and step % checkpoint_every == 0)
            or (val_fn is not None and step % val_every == 0)
        ) and step > 0
        if sync and pending is not None:
            emit(pending)  # keep log order ahead of val/ckpt output
            pending = None
        if checkpoint_fn is not None and step > 0 and step % checkpoint_every == 0:
            checkpoint_fn(step, state)
        if val_fn is not None and step > 0 and step % val_every == 0:
            val_fn(step, state)
        step += 1
    if pending is not None and log_fn is not None:
        emit(pending)
    return state
