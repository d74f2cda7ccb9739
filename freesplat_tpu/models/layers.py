"""Basic conv building blocks (Flax linen, NHWC).

Semantics match the reference's ``src/model/encoder/modules/layers.py``:
``BasicBlock`` is a two-conv residual block with LeakyReLU(0.2), identity
norm (so biased convs), and a 1x1/3x3 projection shortcut when shape
changes.  Layout is NHWC throughout — the TPU-native choice (the reference
is NCHW torch).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
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
    """Bilinear x2, align_corners=False (reference sr_utils upsample).

    Exact-2x align_corners=False interpolation is a fixed two-phase
    stencil: out[2i] = 0.25*x[i-1] + 0.75*x[i], out[2i+1] = 0.75*x[i] +
    0.25*x[i+1] (edges clamped).  Written as shifted adds + an
    interleaving reshape — dense VPU work XLA fuses — instead of the
    general gather-based resize (TPU gathers along spatial axes of a
    4-D tensor are the slow path; the decoder grid calls this ~10x per
    forward).  Matches ``_interpolate_bilinear`` bit-for-bit in tests.
    """
    n, h, w, c = x.shape

    def interleave2(a, b, axis):
        stacked = jnp.stack([a, b], axis=axis + 1)
        shape = list(a.shape)
        shape[axis] *= 2
        return stacked.reshape(shape)

    xm = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)  # x[i-1], clamped
    xp = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)  # x[i+1], clamped
    x = interleave2(0.25 * xm + 0.75 * x, 0.75 * x + 0.25 * xp, axis=1)
    xm = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
    xp = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    return interleave2(0.25 * xm + 0.75 * x, 0.75 * x + 0.25 * xp, axis=2)


def _resize_matrix(src: int, dst: int, align_corners: bool) -> np.ndarray:
    """(dst, src) two-tap bilinear interpolation matrix (torch semantics)."""
    if align_corners and dst > 1:
        pos = np.linspace(0.0, src - 1.0, dst, dtype=np.float64)
    else:
        pos = (np.arange(dst, dtype=np.float64) + 0.5) * (src / dst) - 0.5
    p0 = np.clip(np.floor(pos), 0, src - 1)
    p1 = np.clip(p0 + 1, 0, src - 1)
    t = np.clip(pos - p0, 0.0, 1.0)
    m = np.zeros((dst, src), np.float32)
    rows = np.arange(dst)
    m[rows, p0.astype(np.int64)] += (1.0 - t).astype(np.float32)
    m[rows, p1.astype(np.int64)] += t.astype(np.float32)
    return m


def _interpolate_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool
) -> jnp.ndarray:
    """NHWC bilinear resize matching torch's interpolate semantics.

    Separable: two dense two-tap matmuls (trace-time numpy weights) —
    MXU work instead of spatial-axis gathers, which XLA lowers poorly on
    TPU.  HIGHEST precision keeps the convex 2-tap sums at f32 accuracy.
    """
    n, h, w, c = x.shape
    dtype = x.dtype
    ry = jnp.asarray(_resize_matrix(h, out_h, align_corners))
    rx = jnp.asarray(_resize_matrix(w, out_w, align_corners))
    xf = x.astype(jnp.float32)
    out = jnp.einsum(
        "oh,nhwc->nowc", ry, xf, precision=jax.lax.Precision.HIGHEST
    )
    out = jnp.einsum(
        "pw,nowc->nopc", rx, out, precision=jax.lax.Precision.HIGHEST
    )
    return out.astype(dtype)


def interpolate_bilinear(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    return _interpolate_bilinear(x, out_hw[0], out_hw[1], align_corners)
