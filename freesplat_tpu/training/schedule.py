"""Optimizer + LR schedule (reference ``model_wrapper.py:821-846``).

The reference uses Adam(lr) with either OneCycleLR (cosine anneal, pct
start = warm_up/max_steps) or a linear warm-up; grad clipping comes from
the trainer config (0.01 for ScanNet).
"""
from __future__ import annotations

from dataclasses import dataclass

import optax


@dataclass(frozen=True)
class OptimizerCfg:
    lr: float = 1e-4
    warm_up_steps: int = 100
    cosine_lr: bool = True
    max_steps: int = 300_001
    gradient_clip_val: float = 0.01


def make_schedule(cfg: OptimizerCfg) -> optax.Schedule:
    if cfg.cosine_lr:
        # OneCycleLR(cos): warm up to peak lr then cosine anneal to ~0.
        return optax.cosine_onecycle_schedule(
            transition_steps=cfg.max_steps,
            peak_value=cfg.lr,
            pct_start=max(cfg.warm_up_steps, 1) / max(cfg.max_steps, 1),
            div_factor=25.0,
            final_div_factor=1e4,
        )
    warm = optax.linear_schedule(
        init_value=cfg.lr / max(cfg.warm_up_steps, 1),
        end_value=cfg.lr,
        transition_steps=cfg.warm_up_steps,
    )
    return optax.join_schedules(
        [warm, optax.constant_schedule(cfg.lr)], [cfg.warm_up_steps]
    )


def make_optimizer(cfg: OptimizerCfg) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.adam(make_schedule(cfg)),
    )
