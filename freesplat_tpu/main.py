"""CLI entry point (reference ``src/main.py``).

Usage mirrors the reference's Hydra surface:

  python -m freesplat_tpu.main +experiment=scannet/2views
  python -m freesplat_tpu.main +experiment=scannet/2views mode=test \
      checkpointing.load=outputs/checkpoints dataset.roots=[datasets/scannet]

With no dataset on disk, ``dataset.name=synthetic`` trains against the
built-in synthetic Gaussian scenes (useful for smoke runs).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import numpy as np

from .config.config import RootCfg, load_config
from .data.data_module import DataLoaderStageCfg, DataModule
from .data.scannet import DatasetScannet, DatasetScannetCfg
from .data.synthetic import SyntheticCfg, synthetic_batches
from .data.view_samplers import (
    ViewSamplerBounded,
    ViewSamplerBoundedCfg,
    ViewSamplerEvaluation,
    ViewSamplerEvaluationCfg,
)
from .training.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from .training.trainer import TrainCfg, fit, init_state
from .utils.benchmarker import Benchmarker


def make_view_sampler(cfg: RootCfg, stage: str):
    if stage == "test" or cfg.dataset.view_sampler == "evaluation":
        return ViewSamplerEvaluation(
            ViewSamplerEvaluationCfg(index_path=cfg.dataset.evaluation_index_path)
        )
    return ViewSamplerBounded(
        ViewSamplerBoundedCfg(
            num_context_views=cfg.dataset.num_context_views,
            random=cfg.dataset.fvt_random_contexts,
        ),
        stage=stage,
        is_overfitting=cfg.dataset.overfit_to_scene is not None,
        seed=cfg.data_loader.seed,
    )


def make_data_module(cfg: RootCfg, step_fn=None) -> DataModule:
    """Stage-aware loaders routed by ``dataset.name`` (reference
    ``data_module.py`` + the DATASETS registry in ``dataset/__init__.py``)."""

    def factory(stage: str):
        if cfg.dataset.name == "re10k":
            from .data.re10k import DatasetRE10k, DatasetRE10kCfg

            return DatasetRE10k(
                DatasetRE10kCfg(
                    roots=tuple(cfg.dataset.roots),
                    image_shape=cfg.dataset.image_shape,
                    near=cfg.dataset.near,
                    far=cfg.dataset.far,
                ),
                stage,
                make_view_sampler(cfg, stage),
                seed=cfg.data_loader.seed,
            )
        # scannet + replica share the directory-per-scene loader; replica
        # adds the unconditional test-suffix strip + depth intrinsics
        # (data/replica.py).
        cls = DatasetScannet
        if cfg.dataset.name == "replica":
            from .data.replica import DatasetReplica

            cls = DatasetReplica
        return cls(
            DatasetScannetCfg(
                roots=tuple(cfg.dataset.roots),
                image_shape=cfg.dataset.image_shape,
                near=cfg.dataset.near,
                far=cfg.dataset.far,
                load_depth=cfg.dataset.load_depth,
                overfit_to_scene=cfg.dataset.overfit_to_scene,
            ),
            stage,
            make_view_sampler(cfg, stage),
        )

    return DataModule(
        factory,
        DataLoaderStageCfg(
            batch_size=cfg.data_loader.batch_size, seed=cfg.data_loader.seed
        ),
        step_fn=step_fn,
    )


def make_batches(cfg: RootCfg, stage: str, step_fn=None):
    if cfg.dataset.name == "synthetic":
        # Multi-host: offset the generator seed per process so each host
        # streams distinct scenes.
        return synthetic_batches(
            SyntheticCfg(
                image_shape=cfg.dataset.image_shape,
                num_context=cfg.dataset.num_context_views,
                num_target=cfg.dataset.synthetic_num_targets,
                seed=cfg.data_loader.seed + jax.process_index(),
                cache_batches=cfg.dataset.synthetic_cache_batches,
                vary_scene=cfg.dataset.synthetic_vary_scene,
                renderer=cfg.dataset.synthetic_renderer,
            )
        )
    dm = make_data_module(cfg, step_fn=step_fn)
    if stage == "train":
        return dm.train_batches()
    if stage == "val":
        return dm.val_batches()
    return dm.test_batches()


def train(cfg: RootCfg) -> None:
    from .parallel.distributed import make_mesh, maybe_initialize_distributed

    if maybe_initialize_distributed():
        print(
            f"jax.distributed: process {jax.process_index()}/"
            f"{jax.process_count()}", flush=True,
        )
    mesh = make_mesh(cfg.trainer.devices)
    n_dev = mesh.devices.size
    n_proc = jax.process_count()
    # data_loader.batch_size is PER PROCESS; the global batch is
    # batch_size * process_count and must divide the global mesh.
    global_batch = cfg.data_loader.batch_size * n_proc
    if global_batch % n_dev:
        if n_proc > 1:
            # Shrinking the mesh would strand other processes' devices —
            # a misconfigured multi-host launch must fail loudly.
            raise ValueError(
                f"global batch {global_batch} (= {cfg.data_loader.batch_size}"
                f" per process x {n_proc} processes) does not divide the "
                f"{n_dev}-device mesh"
            )
        # Single process: shrink to the largest device count the batch
        # divides by (devices="auto" with batch_size=1 should train on
        # one device, not crash).
        fit_dev = max(
            d for d in range(1, n_dev + 1)
            if cfg.data_loader.batch_size % d == 0
        )
        print(
            f"note: batch_size={cfg.data_loader.batch_size} not divisible "
            f"by {n_dev} devices; using a {fit_dev}-device mesh",
            flush=True,
        )
        mesh = make_mesh(fit_dev)
        n_dev = fit_dev
    train_cfg = TrainCfg(
        encoder=cfg.encoder,
        decoder=cfg.decoder,
        loss=cfg.loss,
        optimizer=cfg.optimizer,
        log_every=cfg.trainer.log_every,
    )
    current_step = {"value": 0}
    batches = make_batches(cfg, "train", step_fn=lambda: current_step["value"])
    first = next(batches)
    init_example = jax.tree_util.tree_map(
        lambda x: x[:1] if hasattr(x, "ndim") and x.ndim > 0 else x,
        {k: v for k, v in first.items() if k in ("context", "target")},
    )
    state = init_state(train_cfg, jax.random.PRNGKey(cfg.seed), init_example)

    ckpt_dir = cfg.checkpointing.output_dir
    if cfg.checkpointing.load is not None:
        step = latest_step(cfg.checkpointing.load)
        if step is not None:
            state = restore_checkpoint(
                cfg.checkpointing.load, step, state,
                strict=cfg.checkpointing.strict,
            )
            print(f"restored checkpoint step {step}")

    logger = None
    try:
        from .utils.logger import LocalLogger

        logger = LocalLogger()
    except Exception:
        pass

    def log_fn(step, metrics):
        parts = " ".join(f"{k}={v:.5g}" for k, v in metrics.items())
        print(f"train step {step}: {parts}", flush=True)
        if logger is not None:
            logger.log_scalars(step, metrics)

    val_batches = {"it": None}

    def val_fn(step, state):
        from .training.validation import validation_step

        if val_batches["it"] is None:
            val_batches["it"] = make_batches(cfg, "val")
        batch = next(val_batches["it"])
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        metrics = validation_step(
            cfg.encoder, cfg.decoder, variables, batch, step,
            save_video=cfg.trainer.val_save_video,
            save_projections=cfg.trainer.val_save_projections,
        )
        print(f"val step {step}: psnr={metrics['psnr']:.2f}", flush=True)

    def checkpoint_fn(step, state):
        save_checkpoint(ckpt_dir, step, state)

    def batch_stream():
        # Curriculum freshness: the bounded sampler reads step_fn at DRAW
        # time and ``fit`` consumes exactly one batch per step, so the step
        # must be set BEFORE each draw (an after-the-fact bump samples
        # batch i with step i-1).  ``first`` was drawn at step 0 for shape
        # init; a checkpoint-resumed run discards it and re-draws so the
        # sampler sees the restored step, not the step-0 view-distance
        # curriculum.  Reference semantics: StepTracker shared-memory step,
        # src/misc/step_tracker.py + view_sampler_bounded.py:29-61.
        step = int(state["step"])
        current_step["value"] = step
        yield first if step == 0 else next(batches)
        while True:
            step += 1
            current_step["value"] = step
            batch = next(batches, None)
            if batch is None:
                return
            yield batch

    fit(
        train_cfg,
        state,
        batch_stream(),
        lpips_params=_load_lpips(cfg),
        max_steps=cfg.trainer.max_steps,
        log_fn=log_fn,
        checkpoint_fn=checkpoint_fn,
        checkpoint_every=cfg.checkpointing.every_n_train_steps,
        val_fn=val_fn,
        val_every=cfg.trainer.val_check_interval,
        mesh=mesh,
    )


def _load_lpips(cfg: RootCfg):
    """Converted LPIPS-VGG weights, or None (reference downloads them via
    the ``lpips`` package, loss_lpips.py:33; this image ships none, so the
    loss/metric falls back to MSE-only with a warning)."""
    lp = cfg.loss.lpips
    if lp is None or lp.weight == 0:
        return None
    if lp.weights_path is None:
        print(
            "note: loss.lpips.weights_path not set — LPIPS term disabled "
            "(no pretrained VGG weights bundled)", flush=True,
        )
        return None
    from .training.lpips import load_lpips_params

    return load_lpips_params(lp.weights_path)


def test(cfg: RootCfg) -> None:
    from .evaluation.harness import run_test

    run_test(cfg, lpips_params=_load_lpips(cfg))


def main(argv: list[str] | None = None) -> None:
    # Persistent compilation cache BEFORE the first jit: the big model
    # graphs take minutes to compile (remotely on the tunneled TPU);
    # cache hits across processes are instant.
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(argv if argv is not None else sys.argv[1:])
    np.random.seed(cfg.seed)
    if cfg.mode == "train":
        train(cfg)
    elif cfg.mode == "test":
        test(cfg)
    else:
        raise ValueError(f"unknown mode {cfg.mode}")


if __name__ == "__main__":
    main()
