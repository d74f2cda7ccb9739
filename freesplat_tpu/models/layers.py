"""Basic conv building blocks (Flax linen, NHWC).

Semantics match the reference's ``src/model/encoder/modules/layers.py``:
``BasicBlock`` is a two-conv residual block with LeakyReLU(0.2), identity
norm (so biased convs), and a 1x1/3x3 projection shortcut when shape
changes.  Layout is NHWC throughout — the TPU-native choice (the reference
is NCHW torch).
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn


def leaky_relu_02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class BasicBlock(nn.Module):
    """Residual block: conv3x3 -> lrelu -> conv3x3 (+ projection) -> lrelu.

    Reference: ``layers.py:24-80`` (norm_layer=Identity => bias=True).
    ``dtype``: compute dtype (params stay f32).
    """

    features: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                      use_bias=True, dtype=self.dtype, name="conv1")(x)
        out = leaky_relu_02(out)
        out = nn.Conv(self.features, (3, 3), strides=1, padding=1,
                      use_bias=True, dtype=self.dtype, name="conv2")(out)
        if x.shape[-1] != self.features or self.stride != 1:
            kernel = (1, 1) if self.stride == 1 else (3, 3)
            pad = 0 if self.stride == 1 else 1
            identity = nn.Conv(self.features, kernel, strides=self.stride,
                               padding=pad, use_bias=True, dtype=self.dtype,
                               name="downsample")(x)
        return leaky_relu_02(out + identity)


class MLP(nn.Module):
    """Linear stack with LeakyReLU; reference ``networks.py:218-236``."""

    channels: tuple[int, ...]
    disable_final_activation: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, dtype=self.dtype, name=f"dense_{i}")(x)
            last = i == len(self.channels) - 1
            if not (last and self.disable_final_activation):
                x = nn.leaky_relu(x, negative_slope=0.01)
        return x


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2, align_corners=False (reference sr_utils upsample)."""
    n, h, w, c = x.shape
    return _interpolate_bilinear(x, 2 * h, 2 * w, align_corners=False)


def _interpolate_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool
) -> jnp.ndarray:
    """NHWC bilinear resize matching torch's interpolate semantics."""
    n, h, w, c = x.shape
    dtype = x.dtype
    if align_corners and out_h > 1 and out_w > 1:
        ys = jnp.linspace(0.0, h - 1.0, out_h, dtype=jnp.float32)
        xs = jnp.linspace(0.0, w - 1.0, out_w, dtype=jnp.float32)
    else:
        ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
        xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)

    top = x[:, y0i][:, :, x0i] * (1 - wx)[None, None, :, None] + \
        x[:, y0i][:, :, x1i] * wx[None, None, :, None]
    bot = x[:, y1i][:, :, x0i] * (1 - wx)[None, None, :, None] + \
        x[:, y1i][:, :, x1i] * wx[None, None, :, None]
    out = top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
    return out.astype(dtype)


def interpolate_bilinear(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    return _interpolate_bilinear(x, out_hw[0], out_hw[1], align_corners)
