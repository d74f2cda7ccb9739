"""EfficientNetV2-S feature backbone (Flax linen, NHWC).

Re-implementation of the architecture the reference instantiates via timm
(``tf_efficientnetv2_s_in21ft1k``, ``features_only=True`` — reference
``encoder_freesplat.py:116-122``).  Returns 5 feature maps at strides
2/4/8/16/32 with channels (24, 48, 64, 160, 256), matching
``backbone.feature_info.channels()``.

Pretrained timm weights are not bundled (no network access in this
environment); ``freesplat_tpu/utils/torch_convert.py`` converts a timm
checkpoint into this module's parameter tree when one is available.
Training from scratch works out of the box.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

# (block_type, kernel, stride, expand, out_ch, num_blocks, se_ratio)
EFFNETV2_S_CONFIG = (
    ("fused", 3, 1, 1, 24, 2, 0.0),
    ("fused", 3, 2, 4, 48, 4, 0.0),
    ("fused", 3, 2, 4, 64, 4, 0.0),
    ("mbconv", 3, 2, 4, 128, 6, 0.25),
    ("mbconv", 3, 1, 6, 160, 9, 0.25),
    ("mbconv", 3, 2, 6, 256, 15, 0.25),
)
STEM_CH = 24
# Stages after which a feature map is emitted (stride boundaries):
# stride 2 after stage 0, 4 after 1, 8 after 2, 16 after 4, 32 after 5.
FEATURE_STAGES = (0, 1, 2, 4, 5)
FEATURE_CHANNELS = (24, 48, 64, 160, 256)


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class BNAct(nn.Module):
    use_running_average: bool
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-3,
            dtype=x.dtype,
            name="bn",
        )(x)
        return nn.silu(x) if self.act else x


class FusedMBConv(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    train_bn: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inp = x
        mid = x.shape[-1] * self.expand
        ura = not self.train_bn
        if self.expand != 1:
            x = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                        padding="SAME", use_bias=False, dtype=self.dtype, name="conv_exp")(x)
            x = BNAct(ura, name="bn1")(x)
            x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pwl")(x)
            x = BNAct(ura, act=False, name="bn2")(x)
        else:
            x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                        strides=self.stride, padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv")(x)
            x = BNAct(ura, name="bn1")(x)
        if self.stride == 1 and inp.shape[-1] == self.out_ch:
            x = x + inp
        return x


class MBConv(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float
    train_bn: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inp = x
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        ura = not self.train_bn
        x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pw")(x)
        x = BNAct(ura, name="bn1")(x)
        x = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                    padding="SAME", feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="conv_dw")(x)
        x = BNAct(ura, name="bn2")(x)
        if self.se_ratio > 0:
            x = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pwl")(x)
        x = BNAct(ura, act=False, name="bn3")(x)
        if self.stride == 1 and in_ch == self.out_ch:
            x = x + inp
        return x


class EfficientNetV2S(nn.Module):
    """features_only EfficientNetV2-S: NHWC in, 5 NHWC feature maps out.

    ``train_bn``: update batch statistics (the reference forces BN layers
    into train mode on every forward — ``encoder_freesplat.py:80-82,216``).
    ``compute_dtype``: activation dtype (bf16 doubles MXU conv throughput;
    params stay f32).
    """

    train_bn: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        ura = not self.train_bn
        x = x.astype(self.compute_dtype)
        x = nn.Conv(STEM_CH, (3, 3), strides=2, padding="SAME", use_bias=False,
                    dtype=self.compute_dtype, name="conv_stem")(x)
        x = BNAct(ura, name="bn_stem")(x)
        features = []
        for si, (btype, k, s, e, ch, n, se) in enumerate(EFFNETV2_S_CONFIG):
            for bi in range(n):
                stride = s if bi == 0 else 1
                name = f"stage{si}_block{bi}"
                if btype == "fused":
                    x = FusedMBConv(ch, k, stride, e, self.train_bn,
                                    dtype=self.compute_dtype, name=name)(x)
                else:
                    x = MBConv(ch, k, stride, e, se, self.train_bn,
                               dtype=self.compute_dtype, name=name)(x)
            if si in FEATURE_STAGES:
                features.append(x)
        return features
