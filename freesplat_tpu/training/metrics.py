"""Evaluation metrics in pure jnp: PSNR, SSIM, depth metrics.

Parity targets: ``src/evaluation/metrics.py`` (PSNR ``:11-19``, SSIM via
skimage ``:36-52`` with win_size=11, gaussian_weights=True, data_range=1)
and ``src/model/model_wrapper.py:90-110`` (depth metrics on rendered vs
sensor depth, masked at gt > 0.5).  Images here are NHWC in [0, 1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_psnr(ground_truth: jnp.ndarray, predicted: jnp.ndarray) -> jnp.ndarray:
    """(b, h, w, c) pairs -> (b,) PSNR in dB (inputs clipped to [0, 1])."""
    gt = jnp.clip(ground_truth, 0.0, 1.0)
    pr = jnp.clip(predicted, 0.0, 1.0)
    mse = jnp.mean((gt - pr) ** 2, axis=(-1, -2, -3))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def _gaussian_kernel(win_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    offs = np.arange(win_size) - (win_size - 1) / 2.0
    k = np.exp(-0.5 * (offs / sigma) ** 2)
    k = k / k.sum()
    return jnp.asarray(np.outer(k, k), jnp.float32)


def compute_ssim(
    ground_truth: jnp.ndarray,
    predicted: jnp.ndarray,
    win_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """(b, h, w, c) -> (b,) mean SSIM, matching skimage's
    ``structural_similarity(win_size=11, gaussian_weights=True)`` (which is
    the Wang et al. configuration with 'valid'-mode windows)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = _gaussian_kernel(win_size, sigma)[..., None, None]  # (k, k, 1, 1)

    def filt(x):
        # x: (b, h, w, c) -> per-channel valid convolution.
        b, h, w, c = x.shape
        xc = x.transpose(0, 3, 1, 2).reshape(b * c, h, w, 1)
        out = jax.lax.conv_general_dilated(
            xc, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            # f32 convs hit the MXU at bf16 precision by default; the
            # variance terms (mu_xx - mu_x^2) cancel catastrophically for
            # near-identical images, driving SSIM above 1 (r3 hardware
            # finding: harness reported 1.08 where the true value was
            # 0.995).  HIGHEST keeps the window sums exact.
            precision=jax.lax.Precision.HIGHEST,
        )
        oh, ow = out.shape[1:3]
        return out.reshape(b, c, oh, ow).transpose(0, 2, 3, 1)

    gt = jnp.clip(ground_truth, 0.0, 1.0)
    pr = jnp.clip(predicted, 0.0, 1.0)
    mu_x = filt(gt)
    mu_y = filt(pr)
    mu_xx = filt(gt * gt)
    mu_yy = filt(pr * pr)
    mu_xy = filt(gt * pr)
    # skimage uses unbiased covariances: cov_norm = n / (n - 1).
    n = win_size * win_size
    cov_norm = n / (n - 1.0)
    vx = cov_norm * (mu_xx - mu_x * mu_x)
    vy = cov_norm * (mu_yy - mu_y * mu_y)
    vxy = cov_norm * (mu_xy - mu_x * mu_y)
    a1 = 2 * mu_x * mu_y + c1
    a2 = 2 * vxy + c2
    b1 = mu_x * mu_x + mu_y * mu_y + c1
    b2 = vx + vy + c2
    ssim_map = (a1 * a2) / (b1 * b2)
    # skimage crops a (win_size-1)//2 border AFTER the valid conv already
    # shrank by that amount, so the valid map is exactly what's averaged.
    return jnp.mean(ssim_map, axis=(-1, -2, -3))


def depth_metrics(
    gt_depth: jnp.ndarray,  # (..., h, w) sensor depth (0 = invalid)
    pred_depth: jnp.ndarray,  # (..., h, w)
    min_valid: float = 0.5,
) -> dict[str, jnp.ndarray]:
    """abs_diff / abs_rel / delta<1.25 / delta<1.1, masked at gt > 0.5."""
    gt = gt_depth.reshape(-1, gt_depth.shape[-2] * gt_depth.shape[-1])
    pr = pred_depth.reshape(gt.shape)
    mask = gt > min_valid
    cnt = jnp.maximum(jnp.sum(mask, axis=1), 1)

    def masked_mean(x):
        return jnp.sum(jnp.where(mask, x, 0.0), axis=1) / cnt

    pr_safe = jnp.where(mask & (pr > 0), pr, 1.0)
    gt_safe = jnp.where(mask, gt, 1.0)
    abs_diff = masked_mean(jnp.abs(gt_safe - pr_safe)).mean()
    abs_rel = masked_mean(jnp.abs(gt_safe - pr_safe) / gt_safe).mean()
    thresh = jnp.maximum(gt_safe / pr_safe, pr_safe / gt_safe)
    delta_25 = masked_mean((thresh < 1.25).astype(jnp.float32)).mean()
    delta_10 = masked_mean((thresh < 1.10).astype(jnp.float32)).mean()
    return {
        "abs_diff": abs_diff,
        "abs_rel": abs_rel,
        "delta_25": delta_25,
        "delta_10": delta_10,
    }
