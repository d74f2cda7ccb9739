"""Encoder sub-networks: CVEncoder, DepthDecoder (dense grid), GRU.

Behavioral parity targets (reference file:line):
- CVEncoder:    ``src/model/encoder/modules/networks.py:157-185``
- DepthDecoder: ``src/model/encoder/modules/networks.py:19-154``
- GRU:          ``src/model/encoder/modules/networks.py:188-214``

All modules are Flax linen with NHWC feature maps.  The reference's
DepthDecoder builds its HRNet-like dense grid by mutating python lists;
here the grid is expressed directly over (scale i, column j) nodes with
inputs right=(i, j-1), diag=(i+1, j-1), up=(i+1, j) — the same dataflow.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BasicBlock, interpolate_bilinear, upsample2x


class DoubleBasicBlock(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = BasicBlock(self.features, dtype=self.dtype, name="block0")(x)
        return BasicBlock(self.features, dtype=self.dtype, name="block1")(x)


class CVEncoder(nn.Module):
    """Fuses the cost volume with image features over 4 scales.

    Block i: ds_conv (stride 2 except first) -> concat backbone feature
    scale i -> 2 residual blocks.  Returns the 4 fused scales.
    """

    num_ch_outs: tuple[int, ...] = (64, 128, 256, 384)
    dtype: Any = None

    @nn.compact
    def __call__(self, cost_volume, img_feats):
        x = cost_volume
        if self.dtype is not None:
            x = x.astype(self.dtype)
        outputs = []
        for i, ch in enumerate(self.num_ch_outs):
            x = BasicBlock(ch, stride=1 if i == 0 else 2, dtype=self.dtype,
                           name=f"ds_conv_{i}")(x)
            x = jnp.concatenate(
                [x, img_feats[i].astype(x.dtype)], axis=-1
            )
            x = BasicBlock(ch, dtype=self.dtype, name=f"conv_{i}a")(x)
            x = BasicBlock(ch, dtype=self.dtype, name=f"conv_{i}b")(x)
            outputs.append(x)
        return outputs


class DepthDecoder(nn.Module):
    """Dense-grid decoder -> per-scale depth distributions + feature maps.

    Outputs a dict with, per scale i in 0..3 (strides 2, 4, 8, 16):
      output_s{i}: (n, h_i, w_i, 1 + 64) raw head output
      depth_s{i}, log_depth_s{i}: (n, h_i, w_i, 1) expected (log-)depth
    plus full-resolution:
      depth_s-1: (n, H, W, 1) (x2 bilinear upsample of scale 0, align
        corners — ``networks.py:139-147``)
      output_s-1: (n, H, W, 65) via conv_last(upsample(output_s0))
      depth_weights: (n, H, W, 1) max softmax prob of scale 0, upsampled
    """

    num_output_channels: int = 65
    near: float = 0.5
    far: float = 15.0
    num_samples: int = 64
    log_planes: bool = True
    num_ch_dec: tuple[int, ...] = (64, 64, 128, 256)
    max_depth: int = 4
    dtype: Any = None

    def depth_candidates(self) -> jnp.ndarray:
        if self.log_planes:
            return (
                math.log(self.near)
                + jnp.linspace(0.0, 1.0, self.num_samples)
                * math.log(self.far / self.near)
            )
        # Linear in inverse depth from 1/near to 1/far.
        return (1.0 / self.near) + jnp.linspace(0.0, 1.0, self.num_samples) * (
            1.0 / self.far - 1.0 / self.near
        )

    @nn.compact
    def __call__(self, input_features) -> dict[str, jnp.ndarray]:
        md = self.max_depth
        # node[(i, j)] = feature at scale i after column j; column 0 = input.
        node: dict[tuple[int, int], jnp.ndarray] = {
            (i, 0): (f.astype(self.dtype) if self.dtype is not None else f)
            for i, f in enumerate(input_features)
        }
        head_out: dict[int, jnp.ndarray] = {}
        for j in range(1, md + 1):
            for i in range(md - j, -1, -1):
                ch = self.num_ch_dec[i]
                inputs = [
                    BasicBlock(ch, dtype=self.dtype, name=f"right_conv_{i}{j - 1}")(node[(i, j - 1)]),
                    upsample2x(
                        BasicBlock(ch, dtype=self.dtype, name=f"diag_conv_{i + 1}{j - 1}")(
                            node[(i + 1, j - 1)]
                        )
                    ),
                ]
                if i + j != md:
                    inputs.append(
                        upsample2x(
                            BasicBlock(ch, dtype=self.dtype, name=f"up_conv_{i + 1}{j}")(
                                node[(i + 1, j)]
                            )
                        )
                    )
                x = DoubleBasicBlock(ch, dtype=self.dtype, name=f"in_conv_{i}{j}")(
                    jnp.concatenate(inputs, axis=-1)
                )
                node[(i, j)] = x
                # Head (defined once per scale, applied to the last column
                # that reaches this scale — same as the reference's dict
                # overwrite pattern).
                if i + j == md:
                    h = x
                    if i != 0:
                        h = BasicBlock(ch, dtype=self.dtype, name=f"output_pre_{i}")(h)
                    head_out[i] = nn.Conv(
                        self.num_output_channels, (1, 1), dtype=self.dtype,
                        name=f"output_{i}"
                    )(h)

        outputs: dict[str, jnp.ndarray] = {}
        candidates = self.depth_candidates()  # (D,)
        coarse_disps = None
        depth_planes0 = None
        for i in range(md - 1, -1, -1):
            outputs[f"output_s{i}"] = head_out[i]
            planes = BasicBlock(self.num_samples, dtype=self.dtype, name=f"conv_depth_{i}a")(
                head_out[i]
            )
            planes = nn.Conv(self.num_samples, (1, 1), dtype=self.dtype, name=f"conv_depth_{i}b")(
                planes
            )
            planes = jax.nn.softmax(planes.astype(jnp.float32), axis=-1)  # f32 (n, h, w, D)
            disps = jnp.sum(planes * candidates, axis=-1, keepdims=True)
            if self.log_planes:
                outputs[f"depth_s{i}"] = jnp.exp(disps)
            else:
                outputs[f"depth_s{i}"] = 1.0 / disps
            outputs[f"log_depth_s{i}"] = disps
            if i == 0:
                coarse_disps = disps
                depth_planes0 = planes

        n, h0, w0, _ = coarse_disps.shape
        fine = interpolate_bilinear(
            coarse_disps, (2 * h0, 2 * w0), align_corners=True
        )
        outputs["depth_s-1"] = (
            jnp.exp(fine) if self.log_planes else 1.0 / fine
        )
        up0 = upsample2x(head_out[0])
        x = BasicBlock(128, dtype=self.dtype, name="conv_last_a")(up0)
        outputs["output_s-1"] = nn.Conv(
            self.num_output_channels, (1, 1), dtype=self.dtype,
            name="conv_last_b"
        )(x).astype(jnp.float32)
        outputs["depth_weights"] = jnp.max(
            interpolate_bilinear(
                depth_planes0, (2 * h0, 2 * w0), align_corners=True
            ),
            axis=-1,
            keepdims=True,
        )
        return outputs


class GRU(nn.Module):
    """Gated latent fusion of overlapping Gaussians' features.

    r/z gates see (hidden+emb, input+emb); candidate sees (r*hidden,
    input+emb).  Reference ``networks.py:188-214``.
    """

    hidden_channel: int = 64

    @nn.compact
    def __call__(self, input_feat, hidden_feat, input_weights_emb, hidden_weights_emb):
        def mlp(name, x):
            h = nn.Dense(self.hidden_channel, name=f"{name}_0")(x)
            h = nn.relu(h)
            return nn.Dense(self.hidden_channel, name=f"{name}_1")(h)

        input_1 = jnp.concatenate([input_feat, input_weights_emb], axis=-1)
        hidden_1 = jnp.concatenate([hidden_feat, hidden_weights_emb], axis=-1)
        concat = jnp.concatenate([hidden_1, input_1], axis=-1)
        r = jax.nn.sigmoid(mlp("mlp_r", concat))
        z = jax.nn.sigmoid(mlp("mlp_z", concat))
        update = jnp.concatenate([r * hidden_feat, input_1], axis=-1)
        q = jnp.tanh(mlp("mlp_n", update))
        return (1.0 - z) * hidden_feat + z * q


def positional_encoding(positions: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """(... , D) -> (..., 2*D*freqs) sin/cos interleaved.

    Reference ``encoder_freesplat.py:62-77`` (ori=False path).
    """
    freq_bands = 2.0 ** jnp.arange(freqs, dtype=positions.dtype)
    pts = (positions[..., None] * freq_bands).reshape(
        *positions.shape[:-1], freqs * positions.shape[-1]
    )
    return jnp.stack([jnp.sin(pts), jnp.cos(pts)], axis=-1).reshape(
        *pts.shape[:-1], pts.shape[-1] * 2
    )
