"""Training losses: MSE + LPIPS (reference ``src/loss/``).

The reference's loss registry maps config-wrapper dataclasses to Loss
modules (``loss/__init__.py:5-14``); here each loss is a pure function of
(prediction, batch, step) plus an optional parameter pytree (LPIPS), and
``total_loss`` composes them per config.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax.numpy as jnp

from .lpips import LPIPS


@dataclass(frozen=True)
class LossMseCfg:
    weight: float = 1.0


@dataclass(frozen=True)
class LossLpipsCfg:
    weight: float = 0.05
    apply_after_step: int = 0
    # Path to converted LPIPS-VGG parameters (.npz from
    # scripts/convert_weights.py, or a torch ``lpips`` state dict readable
    # by utils/torch_convert.convert_lpips_vgg).  None disables the LPIPS
    # term (this image ships no pretrained VGG weights; the reference
    # hard-downloads them via the ``lpips`` package, loss_lpips.py:33).
    weights_path: Optional[str] = None


@dataclass(frozen=True)
class LossCfg:
    mse: Optional[LossMseCfg] = LossMseCfg()
    lpips: Optional[LossLpipsCfg] = LossLpipsCfg()


def mse_loss(cfg: LossMseCfg, pred_color: jnp.ndarray, target: jnp.ndarray):
    """Reference ``loss_mse.py:22-33``."""
    return cfg.weight * jnp.mean((pred_color - target) ** 2)


_lpips_module = LPIPS()


def lpips_loss(
    cfg: LossLpipsCfg,
    lpips_params: Any,
    pred_color: jnp.ndarray,  # (b, v, h, w, 3)
    target: jnp.ndarray,
    global_step: jnp.ndarray,
):
    """Reference ``loss_lpips.py:27-55`` (weight 0.05, optional delay)."""
    b, v = pred_color.shape[:2]
    flat_p = pred_color.reshape(b * v, *pred_color.shape[2:])
    flat_t = target.reshape(flat_p.shape)
    value = _lpips_module.apply(lpips_params, flat_p, flat_t).mean()
    gate = (global_step >= cfg.apply_after_step).astype(value.dtype)
    return cfg.weight * value * gate


def total_loss(
    cfg: LossCfg,
    pred_color: jnp.ndarray,  # (b, v, h, w, 3)
    target: jnp.ndarray,
    global_step: jnp.ndarray,
    lpips_params: Any = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    parts: dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0, jnp.float32)
    if cfg.mse is not None:
        parts["mse"] = mse_loss(cfg.mse, pred_color, target)
        total = total + parts["mse"]
    if cfg.lpips is not None and lpips_params is not None:
        parts["lpips"] = lpips_loss(
            cfg.lpips, lpips_params, pred_color, target, global_step
        )
        total = total + parts["lpips"]
    return total, parts
